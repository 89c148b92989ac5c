"""Python-extension function surface: Arrow-batched UDAF and UDTF.

The reference's closures cover scalar predicates/mappers/keys; the two
remaining custom-function shapes a complete engine needs are custom
AGGREGATES (UDAF) and table functions (UDTF). Both stay on the Arrow
path:

- ``weighted_mean()`` — a pandas grouped-aggregate UDF (Series ->
  scalar). Spark runs it per group AFTER its own hash partitioning
  shuffles the group's rows together; the Python cost is one vectorized
  pass per group, not per row.
- ``sentence_splitter()`` — a Spark 4 Python UDTF (one input row ->
  many typed output rows), the lateral-join shape for exploding
  documents into sub-records where a Column expression can't express
  the generator logic.

Both are factories (the decorators resolve DDL type strings against the
active SparkSession, so they can't run at import time). They are
deliberately simple reference implementations: the point is the wiring
(types, registration, lateral usage) that user-defined versions drop
into.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf, udtf


def weighted_mean():
    """Grouped-aggregate pandas UDF: sum(v*w)/sum(w) per group
    (0.0 for all-zero weights). Use inside ``groupBy().agg(...)``."""

    @pandas_udf("double")
    def _weighted_mean(v: pd.Series, w: pd.Series) -> float:
        den = float(w.sum())
        if den == 0.0:
            return 0.0
        return float((v * w).sum() / den)

    return _weighted_mean


def sentence_splitter():
    """Python UDTF class splitting text on the literal '. ' separator ->
    (idx, sentence) rows. Register and use laterally:

        spark.udtf.register("sentence_split", sentence_splitter())
        spark.sql("SELECT d.doc_id, s.* FROM docs d, "
                  "LATERAL sentence_split(d.text) s")
    """

    @udtf(returnType="idx: int, sentence: string")
    class SentenceSplitter:
        def eval(self, text: str):
            for i, seg in enumerate((text or "").split(". ")):
                yield i, seg

    return SentenceSplitter
