"""Sources: file readers + testdata catalog loader.

The reference is in-memory only (no formats/sinks; SURVEY.md §2.2), so this
module is pure engine extension. Readers go through ``spark.read`` so the
DataSource V2 machinery gives vectorized scans, predicate pushdown, column
pruning and partition pruning for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table (parquet).

    The ``events.ts`` column has arrived in three physical shapes across
    testdata generations, and every downstream operator assumes a plain
    session-zoned TIMESTAMP (so ``F.unix_micros(ts)`` is legal):

    - parquet ``timestamp[ns]``: Spark's vectorized reader rejects nanos,
      so read as raw nanos (legacy conf, runtime-settable) and truncate to
      microsecond precision with integer division.
    - parquet ``timestamp[us]`` without UTC flag: Spark 4 reads this as
      TIMESTAMP_NTZ; cast to TIMESTAMP. The session timezone is pinned to
      UTC (codd_spark/session.py), so the wall-clock field values map to
      identical epoch micros and oracle hashes are unchanged.
    - parquet ``timestamp[us]`` with UTC flag: already TIMESTAMP, no-op.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F

        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        dtype = dict(df.dtypes).get("ts")
        if dtype == "bigint":
            # integer `div`, NOT `/`: float division of epoch-nanos
            # (~1.7e18, beyond double's 2^53 exact range) silently loses
            # microseconds and diverges from engines that truncate exactly
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif dtype == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_testdata(spark: SparkSession, sf_dir: str, database=None) -> dict[str, DataFrame]:
    """Load all testdata tables; optionally register them in a Database
    and as temp views (for spark.sql use)."""
    out: dict[str, DataFrame] = {}
    for name in TESTDATA_TABLES:
        df = read_table(spark, sf_dir, name)
        out[name] = df
        df.createOrReplaceTempView(name)
        if database is not None:
            database.register(name, df, replace=True)
    return out


def read_csv(spark: SparkSession, path: str, schema=None, **options) -> DataFrame:
    opts = {"header": "true", **options}
    reader = spark.read.options(**opts)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_json(spark: SparkSession, path: str, schema=None, **options) -> DataFrame:
    reader = spark.read.options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_orc(spark: SparkSession, path: str, **options) -> DataFrame:
    """ORC scan — same DataSource V2 path as parquet (vectorized,
    predicate pushdown, column pruning)."""
    return spark.read.options(**options).orc(path)


def read_text(
    spark: SparkSession, path: str, whole_file: bool = False, **options
) -> DataFrame:
    """Raw-text corpus ingestion: one row per line (default) or per file
    (``whole_file=True`` — the usual shape for one-document-per-file
    corpora feeding the text/dedup operators). Returns a single ``value``
    string column; pair with ``input_file_name()`` for a document id."""
    return spark.read.options(**options).text(path, wholetext=whole_file)
