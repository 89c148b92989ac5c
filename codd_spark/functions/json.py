"""Semi-structured (JSON) column helpers.

Schema-on-read for string columns carrying JSON payloads (the `events.props`
shape). Two tiers, both JVM-side:

- ``json_scalar`` — `get_json_object` path lookup, for one-off extraction.
- ``with_json_fields`` — `from_json` with an explicit DDL schema, which
  parses the document ONCE per row and exposes every declared field as a
  typed top-level column. At 100 TB the single-parse form is the one you
  want: N `get_json_object` calls re-parse the document N times, while
  `from_json` amortizes the parse across all extracted fields and lets
  Catalyst prune unreferenced struct fields.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def json_scalar(col: Column | str, path: str, dtype: str = "string") -> Column:
    """Extract one scalar at a JSONPath (``$.k`` style), cast to `dtype`."""
    c = F.col(col) if isinstance(col, str) else col
    return F.get_json_object(c, path).cast(dtype)


def with_json_fields(
    df: DataFrame,
    json_col: str,
    schema_ddl: str,
    prefix: str = "",
    drop: bool = False,
) -> DataFrame:
    """Parse `json_col` with a DDL schema (e.g. ``"k BIGINT, tag STRING"``)
    and lift every declared field to a typed column ``prefix + name``.
    Malformed documents yield NULL fields (PERMISSIVE semantics), never a
    task failure — at corpus scale a poison row must not kill the stage.
    """
    parsed = F.from_json(F.col(json_col), schema_ddl)
    out = df.withColumn("__parsed__", parsed)
    names = [f.split()[0] for f in schema_ddl.split(",")]
    for name in names:
        out = out.withColumn(prefix + name, F.col("__parsed__")[name])
    out = out.drop("__parsed__")
    if drop:
        out = out.drop(json_col)
    return out
