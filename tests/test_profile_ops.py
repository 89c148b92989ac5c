"""Tests for the data-quality probes (heavy hitters, KS drift, column
profile) against in-test Python reference computations."""

import math
import random

import pytest
from pyspark.sql import functions as F

from codd_spark.operators.aggregates import heavy_hitters
from codd_spark.operators.profile import data_profile, ks_statistic


def _ks_reference(sample_a, sample_b):
    """Textbook two-sample KS on merged support points."""
    xs = sorted(set(sample_a) | set(sample_b))
    na, nb = len(sample_a), len(sample_b)
    best = 0.0
    for x in xs:
        fa = sum(1 for v in sample_a if v <= x) / na if na else 0.0
        fb = sum(1 for v in sample_b if v <= x) / nb if nb else 0.0
        best = max(best, abs(fa - fb))
    return best


def test_heavy_hitters_exact(spark):
    rng = random.Random(3)
    # zipf-ish: value i appears ~ 3000/i times; ties and a long tail
    rows = []
    for i in range(1, 200):
        rows += [(f"v{i}",)] * (3000 // i)
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, "item STRING").repartition(8)
    n = len(rows)
    k = 40
    got = {(r.item, r.cnt, r.frac) for r in heavy_hitters(df, "item", k=k).collect()}
    from collections import Counter

    counts = Counter(r[0] for r in rows)
    want = {
        (item, c, round(c / n, 6)) for item, c in counts.items() if c * k > n
    }
    assert got == want and len(want) >= 5

    # single-partition input: pigeonhole still exact
    got1 = {(r.item, r.cnt) for r in heavy_hitters(df.coalesce(1), "item", k=k).collect()}
    assert got1 == {(i, c) for i, c, _ in want}
    with pytest.raises(ValueError, match="k"):
        heavy_hitters(df, "item", k=1)


def test_ks_statistic_matches_reference(spark):
    rng = random.Random(7)
    # group g1: same distribution (ks ~ small); g2: shifted (ks large);
    # integer values force ties across and within samples
    rows = []
    samples = {}
    for grp, shift in (("g1", 0.0), ("g2", 2.0)):
        a = [round(rng.gauss(0, 1), 1) for _ in range(150)]
        b = [round(rng.gauss(shift, 1), 1) for _ in range(120)]
        samples[grp] = (a, b)
        rows += [(grp, float(v), False) for v in a]
        rows += [(grp, float(v), True) for v in b]
    rows.append(("g1", None, True))  # NULL must be dropped
    df = spark.createDataFrame(rows, "grp STRING, v DOUBLE, is_b BOOLEAN")
    got = {r.grp: (r.n_a, r.n_b, r.ks) for r in ks_statistic(df, "v", "is_b", group_col="grp").collect()}
    for grp, (a, b) in samples.items():
        na, nb, ks = got[grp]
        assert (na, nb) == (len(a), len(b))
        assert ks == pytest.approx(round(_ks_reference(a, b), 6), abs=1e-9)
    assert got["g2"][2] > 0.5 > got["g1"][2]

    # ungrouped form
    a, b = samples["g2"]
    flat = spark.createDataFrame(
        [(float(v), False) for v in a] + [(float(v), True) for v in b],
        "v DOUBLE, is_b BOOLEAN",
    )
    [row] = ks_statistic(flat, "v", "is_b").collect()
    assert row.ks == pytest.approx(round(_ks_reference(a, b), 6), abs=1e-9)


def test_ks_one_sided_degenerate(spark):
    df = spark.createDataFrame(
        [("g", 1.0, False), ("g", 2.0, False)], "grp STRING, v DOUBLE, is_b BOOLEAN"
    )
    [row] = ks_statistic(df, "v", "is_b", group_col="grp").collect()
    assert (row.n_a, row.n_b, row.ks) == (2, 0, 1.0)


def test_data_profile(spark):
    df = spark.createDataFrame(
        [(1, "a", 2.5), (2, "b", None), (3, None, 0.5), (3, "a", 7.0)],
        "k LONG, s STRING, x DOUBLE",
    )
    prof = {r.column: r for r in data_profile(df).collect()}
    assert set(prof) == {"k", "s", "x"}
    assert (prof["k"].n_rows, prof["k"].n_null, prof["k"].n_distinct) == (4, 0, 3)
    assert (prof["k"].min_str, prof["k"].max_str) == ("1", "3")
    assert (prof["s"].n_null, prof["s"].n_distinct) == (1, 2)
    assert (prof["x"].n_null, prof["x"].min_str, prof["x"].max_str) == (1, "0.5", "7.0")

    sub = {r.column for r in data_profile(df, ["s"]).collect()}
    assert sub == {"s"}
    with pytest.raises(ValueError, match="columns"):
        data_profile(df, [])


def test_cusum_changepoint_finds_planted_shift(spark):
    import datetime

    rng = random.Random(41)
    rows = []
    base = datetime.datetime(2024, 5, 1)
    for key, (mu1, mu2, shift_at) in {"a": (0.0, 5.0, 60), "b": (10.0, 10.0, None)}.items():
        for i in range(120):
            mu = mu1 if (shift_at is None or i < shift_at) else mu2
            rows.append((key, base + datetime.timedelta(minutes=i), rng.gauss(mu, 0.5), i))
    df = spark.createDataFrame(rows, "k STRING, ts TIMESTAMP_NTZ, v DOUBLE, i LONG")

    from codd_spark.operators.profile import cusum_changepoint

    got = {r.k: r for r in cusum_changepoint(df, "ts", "v", key_col="k", tiebreak_col="i").collect()}
    assert got["a"].n == 120 and got["b"].n == 120

    # python reference: argmax |S_i - (i/n) S_n| over the same order
    def ref(series):
        s, best, best_i = 0.0, -1.0, None
        tot = sum(v for _, v in series)
        n = len(series)
        for i, (ts, v) in enumerate(series, start=1):
            s += v
            d = abs(s - i / n * tot)
            if d > best:
                best, best_i = d, ts
        return best, best_i

    for key in ("a", "b"):
        series = sorted((r[1], r[2]) for r in rows if r[0] == key)
        want_stat, want_ts = ref(series)
        assert got[key].cusum_stat == pytest.approx(round(want_stat, 6), abs=1e-6)
        assert got[key].change_ts == int(want_ts.replace(tzinfo=datetime.timezone.utc).timestamp())
    # the planted shift for key a is detected within a few steps of minute 60
    shift_epoch = int(
        (datetime.datetime(2024, 5, 1) + datetime.timedelta(minutes=60))
        .replace(tzinfo=datetime.timezone.utc).timestamp()
    )
    assert abs(got["a"].change_ts - shift_epoch) <= 5 * 60


def test_drift_series_day_over_day(spark):
    import datetime

    from codd_spark.operators.profile import drift_series

    rng = random.Random(53)
    base = datetime.datetime(2024, 6, 1)
    rows = []
    day_vals = {}
    # key "m": day 0,1 same distribution; day 2 shifted
    for d, mu in ((0, 0.0), (1, 0.0), (2, 4.0)):
        vals = [round(rng.gauss(mu, 1), 2) for _ in range(80)]
        day_vals[d] = vals
        rows += [
            ("m", base + datetime.timedelta(days=d, minutes=i), float(v))
            for i, v in enumerate(vals)
        ]
    df = spark.createDataFrame(rows, "k STRING, ts TIMESTAMP_NTZ, v DOUBLE")
    out = {r.bucket_epoch: r for r in drift_series(df, "ts", "v", key_col="k").collect()}
    assert len(out) == 2  # day1 vs day0, day2 vs day1 (day0 has no prev)
    epochs = sorted(out)
    d1, d2 = out[epochs[0]], out[epochs[1]]
    assert (d1.n_prev, d1.n_cur) == (80, 80)
    assert d1.ks == pytest.approx(round(_ks_reference(day_vals[0], day_vals[1]), 6), abs=1e-9)
    assert d2.ks == pytest.approx(round(_ks_reference(day_vals[1], day_vals[2]), 6), abs=1e-9)
    assert d2.ks > 0.8 > d1.ks  # the planted day-2 shift is flagged


def test_key_skew_stats(spark):
    from codd_spark.operators.profile import key_skew

    # 4 keys with counts 1, 1, 2, 6 (n=10)
    rows = [("a",), ("b",), ("c",), ("c",)] + [("d",)] * 6
    df = spark.createDataFrame(rows, "k STRING")
    [r] = key_skew(df, ["k"]).collect()
    assert (r.n_rows, r.n_keys) == (10, 4)
    assert r.top1_share == pytest.approx(0.6)
    assert r.top10_share == pytest.approx(1.0)  # <10 keys: everything
    # gini closed form: counts ascending [1,1,2,6], ranks 1..4
    sic = 1 * 1 + 2 * 1 + 3 * 2 + 4 * 6
    gini = 2 * sic / (4 * 10) - 5 / 4
    assert r.gini == pytest.approx(round(gini, 6))

    uniform = spark.createDataFrame([(f"k{i}",) for i in range(100)], "k STRING")
    [u] = key_skew(uniform, ["k"]).collect()
    assert u.gini == pytest.approx(0.0, abs=1e-9)  # perfectly uniform
    with pytest.raises(ValueError, match="key_cols"):
        key_skew(df, [])


def test_quantile_bins_equal_depth(spark):
    from codd_spark.operators.profile import quantile_bins

    rng = random.Random(61)
    rows = [(i, round(rng.uniform(0, 1000), 3)) for i in range(1000)]
    df = spark.createDataFrame(rows, "id LONG, x DOUBLE").repartition(8)
    out = {r.bin: r for r in quantile_bins(df, "x", "id", n_bins=10).collect()}
    assert set(out) == set(range(10))
    assert all(out[b].n == 100 for b in out)
    # bins tile the sorted order: each bin's lo > previous bin's hi
    ordered = [out[b] for b in range(10)]
    for prev, cur in zip(ordered, ordered[1:]):
        assert cur.lo >= prev.hi
    # reference: sorted values chunked
    svals = sorted(v for _, v in rows)
    for b in range(10):
        assert out[b].lo == pytest.approx(svals[b * 100])
        assert out[b].hi == pytest.approx(svals[b * 100 + 99])


def test_sketch_rollup_union_lossless_and_bounded(spark):
    """HLL sketch rollups: (a) unioning per-day sketches must agree with
    a single global sketch to well within the error bound (datasketches
    mode transitions make them near- but not bit-identical); (b) the
    estimate tracks exact distinct within the configured error regime."""
    import datetime

    from codd_spark.operators.aggregates import sketch_rollup, sketch_union
    from pyspark.sql import functions as F

    rng = random.Random(71)
    base = datetime.datetime(2024, 7, 1)
    rows = []
    for i in range(4000):
        rows.append(
            (
                base + datetime.timedelta(hours=rng.randint(0, 24 * 14)),
                "seg%d" % (i % 2),
                rng.randint(0, 1500),
            )
        )
    df = spark.createDataFrame(rows, "ts TIMESTAMP_NTZ, seg STRING, uid LONG")

    daily = sketch_rollup(df, ["seg"], "uid", ts_col="ts", unit="day")
    assert daily.count() <= 2 * 15
    merged = {r.seg: r for r in sketch_union(daily, ["seg"]).collect()}

    direct = {
        r.seg: r
        for r in sketch_union(sketch_rollup(df, ["seg"], "uid"), ["seg"]).collect()
    }
    exact = {
        r.seg: (r.d, r.n)
        for r in df.groupBy("seg").agg(
            F.countDistinct("uid").alias("d"), F.count("*").alias("n")
        ).collect()
    }
    for seg in exact:
        rel = abs(merged[seg].n_distinct_est - direct[seg].n_distinct_est) / max(
            direct[seg].n_distinct_est, 1
        )
        assert rel < 0.02  # near-lossless union
        assert merged[seg].n_rows == exact[seg][1]
        d = exact[seg][0]
        assert abs(merged[seg].n_distinct_est - d) / d < 0.1  # lg_k=12 ~1.6% rsd


def test_join_cardinality_exact(spark):
    from codd_spark.operators.profile import join_cardinality

    left = spark.createDataFrame(
        [(k,) for k in [1, 1, 1, 2, 2, 3, 9]], "k LONG"
    )
    right = spark.createDataFrame(
        [(k,) for k in [1, 1, 2, 4, 4, 4]], "k LONG"
    )
    [r] = join_cardinality(left, right, ["k"]).collect()
    # key 1: 3*2=6, key 2: 2*1=2 -> 8 rows; max single key 6
    assert (r.n_left, r.n_right, r.n_matching_keys, r.n_out, r.max_key_out) == (
        7, 6, 2, 8, 6,
    )
    assert r.n_out == left.join(right, "k").count()
    # disjoint keys: zero out, no nulls
    [z] = join_cardinality(left, spark.createDataFrame([(77,)], "k LONG"), ["k"]).collect()
    assert (z.n_matching_keys, z.n_out, z.max_key_out) == (0, 0, 0)
    with pytest.raises(ValueError, match="key_cols"):
        join_cardinality(left, right, [])


def test_validate_rules(spark):
    from codd_spark.operators.profile import validate_rules

    df = spark.createDataFrame(
        [(1, 10.0, "O"), (2, -5.0, "F"), (3, None, "X"), (4, 2.0, "O")],
        "id LONG, price DOUBLE, status STRING",
    )
    out = {
        r.rule: (r.n_rows, r.n_violations, r.violation_frac)
        for r in validate_rules(
            df,
            {
                "price_nonneg": "price >= 0",
                "status_domain": "status IN ('O','F','P')",
                "id_positive": "id > 0",
            },
        ).collect()
    }
    # NULL price is a violation (unknown is not a pass)
    assert out["price_nonneg"] == (4, 2, 0.5)
    assert out["status_domain"] == (4, 1, 0.25)
    assert out["id_positive"] == (4, 0, 0.0)
    with pytest.raises(ValueError, match="rules"):
        validate_rules(df, {})
