"""Incremental AGGREGATE views — insert-only partial-state maintenance.

The reference's IVM covers the monotone set algebra (σ/π/⋈/∪/∩); it has
no aggregation at all (SURVEY.md §2.2). This module extends the same
insert-only regime to the aggregates a pipeline actually materializes
(per-group COUNT/SUM/MIN/MAX, with AVG derived at read): state is a
per-group partial-aggregate DataFrame, and each insert merges
``agg(Δ)`` into it — cost O(Δ) plus one groups-keyed exchange,
independent of how much history the view has absorbed. This is exactly
Structured Streaming's stateful-aggregation update rule, re-expressed as
a batch-driveable object (same math, caller-controlled batches, no
streaming runtime needed), and the same partial-merge shape Spark itself
uses below every shuffle (partial_sum/partial_count before the
exchange).

COUNT/SUM merge by addition, MIN/MAX by re-min/re-max, and DISTINCT
counts by HLL sketch union (``distinct_cols``) — all commutative
monoids, which is what makes the merge order-independent and
retry-safe. Sketched distincts are exact while the per-group
cardinality stays inside the sketch's sparse mode (< ~2^lg_k values)
and ~1.04/sqrt(2^lg_k) relative beyond; exact medians remain on the
full-recompute path (Database views). Sums run in exact DECIMAL so
merge order can never change the answer.

Lineage across many inserts is cut with localCheckpoint every
_CHECKPOINT_EVERY merges (the same bound the set-IVM instances use).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row, SparkSession, functions as F

_CHECKPOINT_EVERY = 8

_SUM_DECIMAL = "decimal(38,6)"


class IncrementalAggregateView:
    """Per-group incremental aggregate over an insert-only stream of
    batches.

    ``keys``: grouping columns. ``sum_cols``: columns to COUNT/SUM (sums
    are exact decimal). ``minmax_cols``: columns to MIN/MAX. Read the
    current state with ``df()`` (adds ``avg_<c>`` for each sum column)
    or ``rows()`` for canonical sorted output.
    """

    def __init__(
        self,
        spark: SparkSession,
        keys: list[str],
        *,
        sum_cols: tuple[str, ...] = (),
        minmax_cols: tuple[str, ...] = (),
        distinct_cols: tuple[str, ...] = (),
        lg_k: int = 12,
    ):
        self.spark = spark
        self.keys = list(keys)
        self.sum_cols = tuple(sum_cols)
        self.minmax_cols = tuple(minmax_cols)
        self.distinct_cols = tuple(distinct_cols)
        self.lg_k = lg_k
        self._state: DataFrame | None = None
        self._merges = 0

    # -- the monoid -------------------------------------------------------
    def _partial(self, df: DataFrame) -> DataFrame:
        aggs = [F.count("*").alias("cnt")]
        for c in self.sum_cols:
            aggs.append(F.sum(F.col(c).cast(_SUM_DECIMAL)).alias(f"sum_{c}"))
        for c in self.minmax_cols:
            aggs.append(F.min(c).alias(f"min_{c}"))
            aggs.append(F.max(c).alias(f"max_{c}"))
        for c in self.distinct_cols:
            aggs.append(F.hll_sketch_agg(F.col(c), F.lit(self.lg_k)).alias(f"sk_{c}"))
        return df.groupBy(*self.keys).agg(*aggs)

    def _merge(self, a: DataFrame, b: DataFrame) -> DataFrame:
        aggs = [F.sum("cnt").alias("cnt")]
        for c in self.sum_cols:
            aggs.append(F.sum(f"sum_{c}").alias(f"sum_{c}"))
        for c in self.minmax_cols:
            aggs.append(F.min(f"min_{c}").alias(f"min_{c}"))
            aggs.append(F.max(f"max_{c}").alias(f"max_{c}"))
        for c in self.distinct_cols:
            aggs.append(F.hll_union_agg(F.col(f"sk_{c}")).alias(f"sk_{c}"))
        return a.unionByName(b).groupBy(*self.keys).agg(*aggs)

    # -- api --------------------------------------------------------------
    def insert(self, df: DataFrame) -> None:
        """Fold one batch into the view: agg(Δ) merged into state — O(Δ)
        work + one groups-keyed exchange, regardless of history size."""
        delta = self._partial(df)
        self._state = delta if self._state is None else self._merge(self._state, delta)
        self._merges += 1
        if self._merges % _CHECKPOINT_EVERY == 0:
            self._state = self._state.localCheckpoint(eager=False)

    def df(self) -> DataFrame:
        if self._state is None:
            raise ValueError("no batches inserted yet")
        out = self._state
        for c in self.sum_cols:
            out = out.withColumn(
                f"avg_{c}",
                (F.col(f"sum_{c}").cast("double") / F.col("cnt")),
            )
        for c in self.distinct_cols:
            out = out.withColumn(
                f"n_distinct_{c}", F.hll_sketch_estimate(F.col(f"sk_{c}"))
            ).drop(f"sk_{c}")
        return out

    def rows(self) -> list[Row]:
        out = self.df()
        return out.orderBy(*out.columns).collect()
