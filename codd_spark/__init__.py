"""codd_spark — a PySpark-native analytics engine with the query surface of
salmans/codd (a typed in-memory relational-algebra library with incremental
materialized views), re-expressed Spark-first, plus the large-scale
data-pipeline operators (dedup, similarity search, text analysis, multimodal
columns) that a 100 TB training-data pipeline needs.

Reference parity map (file:line cites are into the read-only reference repo):
- Database / catalog      -> codd_spark.database.Database
  (reference: core/src/database.rs:162-266)
- Expression algebra      -> codd_spark.plans.ast  (core/src/expression.rs:35-45)
- Evaluation              -> codd_spark.plans.compile (core/src/database/evaluate.rs)
- Views (materialized)    -> Database.store_view (core/src/expression/view.rs:48-96)
- Incremental maintenance -> codd_spark.streaming.incremental
  (core/src/database/instance.rs:97-298)

Design: every operator is declared through the DataFrame API so Catalyst
performs pushdown/pruning/join-selection; set semantics are enforced once at
evaluation boundaries instead of per node (equivalent for this algebra, and
saves one shuffle per operator).
"""

from codd_spark.errors import (
    CoddError,
    InstanceExistsError,
    InstanceNotFoundError,
    SchemaMismatchError,
    UnsupportedExpressionError,
)
from codd_spark.database import Database, ViewRef
from codd_spark.plans.ast import (
    Difference,
    Empty,
    Expression,
    Full,
    Intersect,
    Join,
    Product,
    Project,
    Relation,
    Select,
    Singleton,
    Union,
    ViewScan,
    Visitor,
    walk,
)
from codd_spark.session import get_spark

__all__ = [
    "CoddError",
    "Database",
    "Difference",
    "Empty",
    "Expression",
    "Full",
    "InstanceExistsError",
    "InstanceNotFoundError",
    "SchemaMismatchError",
    "Intersect",
    "Join",
    "Product",
    "Project",
    "Relation",
    "Select",
    "Singleton",
    "Union",
    "UnsupportedExpressionError",
    "ViewRef",
    "ViewScan",
    "Visitor",
    "get_spark",
    "walk",
]

__version__ = "0.1.0"
