"""SparkSession bootstrap tuned for this engine.

Defaults are sized for local[N] testing but chosen to scale: AQE on (runtime
shuffle-partition coalescing + skew-join splitting), Arrow on (fast
Pandas-UDF boundary), UTC session timezone (deterministic timestamp
semantics against external oracles).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "codd-spark",
    cpus: str | int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or get) a SparkSession with engine defaults.

    ``cpus`` defaults to ``$SPARK_GRAFT_CPUS`` or ``*``. Shuffle partitions
    default to 2x the core count (AQE coalesces down at runtime); on a real
    cluster this should be sized so each task's shuffle input stays in the
    low hundreds of MB.
    """
    if cpus is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if shuffle_partitions is None:
        try:
            shuffle_partitions = max(32, 2 * int(cpus))
        except (TypeError, ValueError):
            shuffle_partitions = 64

    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # let AQE coalesce INSIDE cached plans (off by default): the
        # engine's multi-consumer caches (shingle projections, guarded
        # bucket tables) otherwise materialize at the static
        # shuffle-partition count and EVERY cache consumer pays that many
        # tasks per scan — profiled r13: a 150-doc arrival batch ran
        # 64-task stages with ~100 ms of total CPU, ~10 s of pure task
        # churn per add_batch. Scale-adaptive by construction (AQE sizes
        # cached partitions from actual bytes at any scale); results are
        # partitioning-independent.
        .config(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
            "true",
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.warehouse.dir", os.environ.get("SPARK_WAREHOUSE_DIR", "/tmp/codd-spark-warehouse"))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
