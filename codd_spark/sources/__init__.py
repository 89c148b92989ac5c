from codd_spark.sources.readers import TESTDATA_TABLES, load_testdata, read_table
from codd_spark.sources.sinks import write_parquet

__all__ = ["TESTDATA_TABLES", "load_testdata", "read_table", "write_parquet"]
