"""Driver-faithful result comparison (dtype-exact).

The driver's correctness gate converts BOTH result sides to pandas
before hashing, which makes pandas' dtype coercions part of the
contract.  Three rounds of CORRECTNESS_r*.json evidence pin the model:

- DuckDB ``.df()`` maps HUGEINT *and* DECIMAL to float64, so an oracle
  window ``SUM`` over BIGINT arrives as ``5.0`` while Spark's LongType
  arrives as ``5`` — and the driver hashes those DIFFERENTLY
  (round-3 ``pack_sequences``: rows/schema green, hash red).
- Spark DECIMAL results (collected as ``decimal.Decimal``) hash EQUAL
  to the oracle's float64 (every decimal aggregate query is green), so
  the driver normalizes decimal-vs-float numerically, not via raw
  ``str()`` (``Decimal('38273.10')`` must match ``38273.1``).
- Round-1 ``split_train_val_test`` red: int-vs-string never matches.

The canon below encodes exactly that: every cell becomes a
(kind, normalized-string) pair where *kind* separates int / float /
bool / string / temporal / bytes / null, and Decimal is folded into
the float kind via a 12-significant-digit format.  ``5`` → ("i","5"),
``5.0`` → ("f","5"): dtype drift can no longer pass locally while
failing the driver.

Used by tools/check_oracle.py and tests/test_oracle_window.py.
"""

from __future__ import annotations

import datetime as _dt
import math
import numbers
from decimal import Decimal

try:  # numpy is baked in, but keep the module importable without it
    import numpy as _np

    _NP_NDARRAY = (_np.ndarray,)
except Exception:  # pragma: no cover
    _np = None
    _NP_NDARRAY = ()


def canon_cell(v):
    """Canonicalize one result cell to a (kind, string) pair (nested for
    arrays/structs).  Kinds: NULL b i f s t d y a m."""
    if v is None:
        return ("NULL",)
    # pandas NaT / NA scalars
    tname = type(v).__name__
    if tname in ("NaTType", "NAType"):
        return ("NULL",)
    if isinstance(v, bool) or tname == "bool_":
        return ("b", str(bool(v)))
    if isinstance(v, numbers.Integral):
        return ("i", str(int(v)))
    if isinstance(v, Decimal):
        if v.is_nan():
            return ("f", "NaN")
        return ("f", f"{float(v):.12g}")
    if isinstance(v, numbers.Real):  # float, np.float64, np.float32
        fv = float(v)
        if math.isnan(fv):
            return ("f", "NaN")
        if math.isinf(fv):
            return ("f", "Infinity" if fv > 0 else "-Infinity")
        return ("f", f"{fv:.12g}")
    if isinstance(v, str):
        return ("s", v)
    if isinstance(v, _dt.datetime) or tname == "Timestamp":
        # str() renders both datetime.datetime and pd.Timestamp as
        # "YYYY-MM-DD HH:MM:SS[.ffffff]" — trim a trailing all-zero
        # fraction so datetime64[us] and datetime.datetime agree
        s = str(v)
        if "." in s:
            s = s.rstrip("0").rstrip(".")
        return ("t", s)
    if isinstance(v, _dt.date):
        return ("d", str(v))
    if isinstance(v, (bytes, bytearray, memoryview)):
        return ("y", bytes(v).hex())
    if isinstance(v, dict):
        return ("m", tuple(sorted((str(k), canon_cell(x)) for k, x in v.items())))
    if hasattr(v, "asDict"):  # pyspark Row (struct)
        return ("m", tuple(sorted((str(k), canon_cell(x)) for k, x in v.asDict().items())))
    if isinstance(v, (list, tuple) + _NP_NDARRAY):
        return ("a", tuple(canon_cell(x) for x in v))
    return ("s", str(v))


def canon_rows(cols, rows):
    """Column-name-sorted, order-insensitive canonical row list.

    ``cols`` is the column-name list matching each row tuple's order.
    """
    idx = [cols.index(c) for c in sorted(cols)]
    return sorted((tuple(canon_cell(r[i]) for i in idx) for r in rows), key=repr)


def fetch_spark(df):
    """Collect a Spark DataFrame to (cols, row-tuples) *via pandas* —
    the driver's path.  This matters: a nullable LongType column becomes
    float64 (None -> NaN) in pandas on BOTH sides, so e.g. the r3-green
    ``asof_join_events`` (NULLs from the left as-of join) only matches
    its oracle when the Spark side takes the same coercion."""
    pdf = df.toPandas()
    cols = list(pdf.columns)
    rows = [tuple(t) for t in pdf.itertuples(index=False, name=None)]
    return cols, rows


def fetch_duck(con, sql):
    """Run oracle SQL through DuckDB *via pandas* — the driver's path —
    so HUGEINT/DECIMAL land as float64 exactly like they do in the gate."""
    pdf = con.execute(sql).df()
    cols = list(pdf.columns)
    rows = [tuple(t) for t in pdf.itertuples(index=False, name=None)]
    return cols, rows


def compare(scols, srows, dcols, drows):
    """Return a list of problem strings (empty = driver-green)."""
    problems = []
    if len(srows) != len(drows):
        problems.append(f"rowcount {len(srows)} vs {len(drows)}")
    if sorted(scols) != sorted(dcols):
        problems.append(f"cols {sorted(scols)} vs {sorted(dcols)}")
    if problems:
        return problems
    sc = canon_rows(scols, srows)
    dc = canon_rows(dcols, drows)
    if sc != dc:
        diffs = [(a, b) for a, b in zip(sc, dc) if a != b][:3]
        problems.append(f"values differ (dtype-exact), first diffs: {diffs}")
    return problems
