"""Engine error types.

Mirrors the reference error enum (reference: core/src/lib.rs:20-33 —
``UnsupportedExpression``, ``InstanceNotFound``, ``InstanceExists``) with
Python exceptions.
"""


class CoddError(Exception):
    """Base class for all codd_spark errors."""


class UnsupportedExpressionError(CoddError):
    """The expression cannot be evaluated (e.g. ``Full``; reference
    core/src/lib.rs:22-24) or cannot back a view (``Difference``; reference
    core/src/database/validate.rs:21-48)."""


class InstanceNotFoundError(CoddError):
    """No relation/view with this name exists in the database
    (reference: core/src/lib.rs:26-28)."""


class InstanceExistsError(CoddError):
    """A relation with this name already exists
    (reference: core/src/lib.rs:30-32)."""


class SchemaMismatchError(CoddError):
    """An inserted batch does not match the relation's schema. The
    reference's ``insert`` is statically typed (core/src/database.rs:203
    takes tuples of the relation's exact type), so a mis-bound insert
    cannot compile there; this is the runtime equivalent for the
    DataFrame path, raised before any rows are appended."""
