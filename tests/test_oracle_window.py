"""Driver-window hygiene tests.

The driver scores only the first 50 ``queries()`` entries against its
DuckDB oracle. Round 3 curated that window to cover the core reference
algebra + the LLM-pipeline flagships; twelve previously-scored (and
driver-green in round 2) queries were rotated out. Per ADVICE.md, those
must stay oracle-backed HERE so a regression in a de-scoped query is
still detectable — this file replays the driver's exact compare (row
count + column names + order-insensitive canonical values) for each.
"""

import math

import duckdb
import pytest

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"

ROTATED_OUT = [
    "argmax_customer_per_nation",
    "ntile_order_quartiles",
    "above_nation_avg_customers",
    "percentrank_top_decile",
    "big_orders",
    "nation_order_statuses",
    "shipping_volume",
    "rollup_grouping_id",
    "waiting_suppliers",
    "top_supplier",
    "parts_from_nation_suppliers",
    "late_orders_by_priority",
]

FLAGSHIPS = [
    "minhash_near_dups",
    "decontaminate_corpus",
    "dedup_clusters",
    "tf_idf_top_terms",
    "similarity_topk",
    "embedding_near_dups",
    "image_metadata",
    "chunk_documents",
    "pack_sequences",
    "pagerank_interactions",
]

CORE_OPERATORS = [
    "scan_nation",
    "select_lineitem",
    "project_disc_price",
    "union_nation_keys",
    "intersect_nation_keys",
    "difference_nation_keys",
    "product_region_nation",
    "join_orders_customer_nation",
    "singleton",
    "empty",
    "semi_join",
    "anti_join",
    "view_over_select",
    "incremental_view",
]


def _canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.12g}"
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    return v


def _canon_rows(rows):
    return sorted((tuple(_canon(v) for v in r) for r in rows), key=repr)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def test_window_contains_core_and_flagships():
    """Structural guard: a future registry edit must not push the core
    operators, the LLM flagships, or the event-time queries back out of
    the driver's scored window."""
    window = list(entry.queries())[:50]
    for name in CORE_OPERATORS + FLAGSHIPS + [
        "user_sessions",
        "range_join_sessions",
        "event_gap_stats",
        "rolling_hour_value",
        "latest_event_per_user",
    ]:
        assert name in window, f"{name} fell out of the driver's 50-query window"


@pytest.mark.parametrize("name", ROTATED_OUT)
def test_rotated_out_query_matches_oracle(spark, duck, name):
    qs = entry.queries()
    oracles = entry.oracle_sql()
    sdf = qs[name](spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    res = duck.execute(oracles[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(sdf.columns) == sorted(dcols)
    assert len(srows) == len(drows)
    # driver compares values column-name-sorted; replicate that
    sidx = [sdf.columns.index(c) for c in sorted(sdf.columns)]
    didx = [dcols.index(c) for c in sorted(dcols)]
    assert _canon_rows([tuple(r[i] for i in sidx) for r in srows]) == _canon_rows(
        [tuple(r[i] for i in didx) for r in drows]
    )
