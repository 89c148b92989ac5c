"""Record linkage / entity resolution: blocked candidate generation +
multi-attribute similarity scoring (a Fellegi-Sunter-style linear score).

Exact-key joins can't match records that disagree in formatting
("J. Smith, 42 Oak St." vs "John Smith, 42 Oak Street"), and full
pairwise comparison is O(n^2). The standard industrial shape is
block -> compare -> score: a cheap blocking key bounds the candidate
pairs, each attribute contributes a typed similarity (exact / edit /
token-set), and a weighted sum yields the match score. Everything here
is JVM expressions (levenshtein, array_intersect) — no Python in the
pair loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from codd_spark.functions.text import tokens

METHODS = ("exact", "levenshtein", "jaccard")


def attribute_similarity(method: str, a: Column, b: Column) -> Column:
    """Similarity in [0,1] for one attribute pair.

    - ``exact``: 1.0 on non-null equality, else 0.0.
    - ``levenshtein``: 1 - dist/max(len) (1.0 when both empty); NULL on
      either side scores 0.0.
    - ``jaccard``: whitespace-token set Jaccard; NULL scores 0.0.
    """
    if method == "exact":
        return F.when(a.isNotNull() & a.eqNullSafe(b), F.lit(1.0)).otherwise(F.lit(0.0))
    if method == "levenshtein":
        ml = F.greatest(F.length(a), F.length(b))
        return (
            F.when(a.isNull() | b.isNull(), F.lit(0.0))
            .when(ml == 0, F.lit(1.0))
            .otherwise(F.lit(1.0) - F.levenshtein(a, b).cast("double") / ml)
        )
    if method == "jaccard":
        ta, tb = F.array_distinct(tokens(a)), F.array_distinct(tokens(b))
        inter = F.size(F.array_intersect(ta, tb))
        union = F.size(F.array_union(ta, tb))
        return (
            F.when(a.isNull() | b.isNull(), F.lit(0.0))
            .when(union == 0, F.lit(0.0))
            .otherwise(inter.cast("double") / union)
        )
    raise ValueError(f"method must be one of {METHODS}, got {method!r}")


def record_linkage(
    df: DataFrame,
    id_col: str,
    *,
    block_on: str | Column,
    attrs: list[tuple[str, str, float]],
    threshold: float = 0.5,
) -> DataFrame:
    """Self-linkage: candidate pairs sharing a blocking key, scored by
    ``sum(w_i * sim_i) / sum(w_i)`` over ``attrs`` = [(column, method,
    weight), ...]. Output: (id_a, id_b, sim_<col>..., score), score and
    sims rounded to 6, filtered to score >= threshold, id_a < id_b.

    100-TB design: the only join is an equi-join on the blocking key
    (pinned shuffle — block skew is the knob the CALLER controls by
    choosing the key; a phone prefix or sorted-neighborhood key bounds
    block sizes, and multiple passes with different keys union their
    candidates). Similarities are per-pair column expressions inside
    whole-stage codegen."""
    if not attrs:
        raise ValueError("attrs must be non-empty")
    total_w = sum(w for _, _, w in attrs)
    if total_w <= 0:
        raise ValueError("weights must sum to a positive value")
    blk = F.col(block_on) if isinstance(block_on, str) else block_on
    cols = [c for c, _, _ in attrs]
    side = df.select(F.col(id_col).alias("id"), blk.alias("__blk"), *cols)
    a = side.select(
        F.col("id").alias("id_a"),
        "__blk",
        *[F.col(c).alias(f"__a_{c}") for c in cols],
    )
    b = side.select(
        F.col("id").alias("id_b"),
        "__blk",
        *[F.col(c).alias(f"__b_{c}") for c in cols],
    )
    pairs = a.hint("shuffle_merge").join(b, "__blk").filter(F.col("id_a") < F.col("id_b"))
    sims = {
        c: attribute_similarity(m, F.col(f"__a_{c}"), F.col(f"__b_{c}"))
        for c, m, _ in attrs
    }
    score = sum((w / total_w) * sims[c] for c, _, w in attrs)
    out = pairs.select(
        "id_a",
        "id_b",
        *[F.round(sims[c], 6).alias(f"sim_{c}") for c in cols],
        F.round(score, 6).alias("score"),
    )
    return out.filter(F.col("score") >= threshold)


def global_rank(df: DataFrame, order_cols: list[str], *, out_col: str = "rank") -> DataFrame:
    """Contiguous 1-based global rank by ``order_cols`` WITHOUT a
    single-task global window: range-repartition on the order key, rank
    within each partition, then add broadcast per-partition offsets
    (a #partitions-row aggregate). The order must be total (append a
    unique id as the last column) or ranks are nondeterministic.

    This is the scalable form of ``row_number() OVER (ORDER BY ...)`` —
    the naive global window serializes the whole table through one task;
    here every stage is partition-parallel and the only small data is
    one row per partition."""
    from pyspark.sql.window import Window

    parallelism = df.sparkSession.sparkContext.defaultParallelism
    order = [F.col(c) for c in order_cols]
    parted = df.repartitionByRange(parallelism, *order).withColumn(
        "__pid", F.spark_partition_id()
    )
    sizes = parted.groupBy("__pid").agg(F.count("*").alias("__n"))
    w_off = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offsets = sizes.select(
        "__pid", (F.sum("__n").over(w_off) - F.col("__n")).alias("__off")
    )
    w_local = Window.partitionBy("__pid").orderBy(*order)
    return (
        parted.withColumn("__r", F.row_number().over(w_local))
        .join(F.broadcast(offsets), "__pid")
        .withColumn(out_col, F.col("__r") + F.col("__off"))
        .drop("__pid", "__r", "__off")
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    id_col: str,
    sort_key: str,
    *,
    window: int = 5,
) -> DataFrame:
    """Sorted-neighborhood blocking (the OTHER standard linkage blocking):
    rank all records globally by (sort_key, id) and pair every two
    records within rank distance < ``window``. Catches matches a
    hash-blocking key splits apart, at a guaranteed candidate budget of
    (window-1) * n pairs. Output: (id_a, id_b, gap) where gap is the
    rank distance and id_a is the lower-RANKED record's id.

    Plan: scalable global rank (see ``global_rank`` — no single-task
    window), then the neighborhood join is an equi-join of rank against
    rank+delta for delta in 1..window-1 (a (window-1)-row explode, no
    range join, no self cross join). Compose with ``record_linkage``-
    style scoring by joining attributes back on the ids."""
    if window < 2:
        raise ValueError("window must be >= 2")
    ranked = global_rank(
        df.select(F.col(id_col).alias("id"), F.col(sort_key).alias("__k")),
        ["__k", "id"],
    ).select("id", "rank")
    a = ranked.select(
        F.col("id").alias("id_a"),
        F.col("rank").alias("rank_a"),
        F.explode(
            F.array(*[F.lit(d) for d in range(1, window)])
        ).alias("gap"),
    ).withColumn("rank_b", F.col("rank_a") + F.col("gap"))
    b = ranked.select(F.col("id").alias("id_b"), F.col("rank").alias("rank_b"))
    return (
        a.join(b, "rank_b")
        .select("id_a", "id_b", "gap")
    )
