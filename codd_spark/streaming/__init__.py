from codd_spark.streaming.incremental import IncrementalDatabase

__all__ = ["IncrementalDatabase"]
