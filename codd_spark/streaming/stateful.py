"""Custom stateful streaming operators via applyInPandasWithState.

The batch library has `operators/timeseries.py resample` (densify to a
fixed grid + forward fill) and `operators/cdc.py scd2_history` (change
stream -> type-2 validity intervals). Both are WINDOW-over-full-history
shapes, which a stream cannot replay per micro-batch — but both have a
natural incremental form where a small per-key state (last closed
bucket / current open version) is enough to emit each output row exactly
once. That is precisely the applyInPandasWithState contract: explicit
GroupState per key, append-mode emission of rows the stream will never
revise.

Emission discipline (both operators): a unit of output is emitted when a
LATER event for the key proves it closed — a resample bucket closes when
a row in a later bucket arrives; an SCD2 version closes when the
attributes change. The trailing open unit (each key's last bucket / the
current version) stays in state and is never emitted; batch-equivalence
is therefore "streamed output == batch output minus each key's trailing
row", which the tests pin across chunked replays of the same events.

Rows that arrive for an already-closed unit (bucket <= the last emitted
bucket) are LATE and dropped — the stream analogue of a watermark
violation; the batch operator, which sees all data at once, has no such
rows by construction.

Scale: state is O(1) per key (a handful of scalars — no windows, no
buffered history); group traffic per micro-batch is the key's own
arrivals. The Python-side work is a per-key fold over a few rows, Arrow-
batched by the engine; there is no per-row JVM<->Python round trip.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampNTZType,
)

_UNIT_MICROS = {
    "minute": 60 * 1_000_000,
    "hour": 3600 * 1_000_000,
    "day": 86_400 * 1_000_000,
    "week": 7 * 86_400 * 1_000_000,
}


def _floor_micros(ts: pd.Series, unit: str) -> pd.Series:
    """Bucket start in epoch micros, matching Spark date_trunc: weeks are
    ISO (Monday-start), not epoch-aligned 7-day blocks."""
    if unit == "week":
        floored = ts.dt.floor("D") - pd.to_timedelta(ts.dt.dayofweek, unit="D")
    else:
        floored = ts.dt.floor({"minute": "min", "hour": "h", "day": "D"}[unit])
    return floored.astype("int64") // 1_000


def streaming_resample(
    sdf: DataFrame,
    ts_col: str,
    value_col: str,
    *,
    key_col: str,
    unit: str = "hour",
) -> DataFrame:
    """Streaming counterpart of ``operators.timeseries.resample``: emits
    one row per (key, bucket) — observed buckets with their last-in-bucket
    value (ties on ts broken by the larger value, the batch discipline),
    gap buckets forward-filled with ``is_gap=true`` — as each bucket is
    closed by the arrival of a later one. Append output mode.

    State per key: (last emitted bucket, its carried value) + the open
    pending bucket's (bucket, value, n, last ts). Output schema:
    (key, bucket, n_events, value, is_gap).
    """
    if unit not in _UNIT_MICROS:
        raise ValueError(f"unit must be one of {sorted(_UNIT_MICROS)}, got {unit!r}")
    step = _UNIT_MICROS[unit]
    key_field = sdf.schema[key_col]

    out_schema = StructType(
        [
            StructField(key_col, key_field.dataType),
            StructField("bucket", TimestampNTZType()),
            StructField("n_events", LongType()),
            StructField("value", DoubleType()),
            StructField("is_gap", BooleanType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("lb", LongType()),  # last emitted bucket (micros); -1 = none
            StructField("lv", DoubleType()),  # carried value at lb
            StructField("pb", LongType()),  # pending (open) bucket
            StructField("pv", DoubleType()),  # pending last-in-bucket value
            StructField("pn", LongType()),  # pending event count
            StructField("pts", LongType()),  # pending last event ts (micros)
        ]
    )

    def update(key, pdfs, state: GroupState):
        lb, lv, pb, pv, pn, pts = (
            state.get if state.exists else (-1, None, None, None, 0, -1)
        )
        batch = pd.concat(list(pdfs), ignore_index=True)
        if len(batch):
            b = pd.DataFrame(
                {
                    "bkt": _floor_micros(batch[ts_col], unit),
                    "ts": batch[ts_col].astype("int64") // 1_000,
                    "v": batch[value_col].astype("float64"),
                }
            )
            # drop late rows: bucket already emitted (or gap-filled past)
            b = b[b["bkt"] > lb]
        else:
            b = pd.DataFrame(columns=["bkt", "ts", "v"])

        obs: dict[int, tuple[int, int, float]] = {}  # bkt -> (n, last_ts, last_v)
        if pb is not None:
            obs[pb] = (pn, pts, pv)
        if len(b):
            # last-in-bucket by max (ts, value): the batch max_by discipline
            b = b.sort_values(["bkt", "ts", "v"], kind="stable")
            for bkt, grp in b.groupby("bkt", sort=True):
                n0, t0, v0 = obs.get(bkt, (0, -1, None))
                last = grp.iloc[-1]
                n = n0 + len(grp)
                if (int(last["ts"]), float(last["v"])) >= (t0, v0 if v0 is not None else float("-inf")):
                    obs[bkt] = (n, int(last["ts"]), float(last["v"]))
                else:
                    obs[bkt] = (n, t0, v0)

        if obs:
            maxb = max(obs)
            out_rows = []
            start = lb + step if lb >= 0 else min(obs)
            carry = lv
            for bkt in range(start, maxb, step):
                if bkt in obs:
                    n, _, v = obs[bkt]
                    out_rows.append((bkt, n, v, False))
                    carry = v
                else:
                    out_rows.append((bkt, 0, carry, True))
            if out_rows:
                # carry == the last emitted row's effective value (gap rows
                # re-emit it, observed rows overwrite it)
                lb, lv = out_rows[-1][0], carry
            pn, pts, pv = obs[maxb]
            pb = maxb
            state.update((lb, lv, pb, pv, pn, pts))
            if out_rows:
                yield pd.DataFrame(
                    {
                        key_col: [key[0]] * len(out_rows),
                        "bucket": [pd.Timestamp(r[0] * 1_000, unit="ns") for r in out_rows],
                        "n_events": [r[1] for r in out_rows],
                        "value": [r[2] for r in out_rows],
                        "is_gap": [r[3] for r in out_rows],
                    }
                )
        else:
            state.update((lb, lv, pb, pv, pn, pts))

    return sdf.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_scd2(
    sdf: DataFrame,
    key_col: str,
    attr_cols: list[str],
    ts_col: str,
    *,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Streaming counterpart of ``operators.cdc.scd2_history``: emits each
    CLOSED type-2 version (key, attrs, valid_from, valid_to, version) the
    moment a changed attribute state supersedes it. The open current
    version lives only in state (batch's ``is_current`` row), so the
    emitted stream equals the batch history filtered to
    ``valid_to IS NOT NULL`` — pinned by the chunked-replay test.

    Re-crawls with unchanged attributes collapse (no new version), the
    batch discipline. Rows must arrive per key in nondecreasing
    (ts, tiebreak) order across micro-batches; regressions are dropped as
    late. Attribute equality is Python tuple equality (NULL-safe:
    None == None holds)."""
    if not attr_cols:
        raise ValueError("attr_cols must be non-empty")
    ties = list(tiebreak_cols or [])
    key_field = sdf.schema[key_col]
    attr_fields = [sdf.schema[c] for c in attr_cols]

    out_schema = StructType(
        [
            StructField(key_col, key_field.dataType),
            *[StructField(f.name, f.dataType) for f in attr_fields],
            StructField("valid_from", TimestampNTZType()),
            StructField("valid_to", TimestampNTZType()),
            StructField("version", LongType()),
        ]
    )
    # state: open version = (version no, valid_from micros, attr values...)
    state_schema = StructType(
        [
            StructField("version", LongType()),
            StructField("vf", LongType()),
            *[StructField(f"a{i}", f.dataType) for i, f in enumerate(attr_fields)],
        ]
    )

    def update(key, pdfs, state: GroupState):
        if state.exists:
            st = state.get
            version, vf, cur = st[0], st[1], tuple(st[2:])
        else:
            version, vf, cur = 0, -1, None
        batch = pd.concat(list(pdfs), ignore_index=True)
        if not len(batch):
            return
        batch = batch.sort_values([ts_col, *ties], kind="stable")
        closed = []
        for _, row in batch.iterrows():
            ts = int(pd.Timestamp(row[ts_col]).value) // 1_000
            if ts < vf:
                continue  # late: precedes the open version
            attrs = tuple(None if pd.isna(row[c]) else row[c] for c in attr_cols)
            if cur is None:
                version, vf, cur = 1, ts, attrs
            elif attrs != cur:
                closed.append((cur, vf, ts, version))
                version, vf, cur = version + 1, ts, attrs
        state.update((version, vf, *(cur if cur is not None else (None,) * len(attr_cols))))
        if closed:
            yield pd.DataFrame(
                {
                    key_col: [key[0]] * len(closed),
                    **{
                        c: [row[0][i] for row in closed]
                        for i, c in enumerate(attr_cols)
                    },
                    "valid_from": [pd.Timestamp(r[1] * 1_000, unit="ns") for r in closed],
                    "valid_to": [pd.Timestamp(r[2] * 1_000, unit="ns") for r in closed],
                    "version": [r[3] for r in closed],
                }
            )

    return sdf.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_drift(
    sdf: DataFrame,
    ts_col: str,
    value_col: str,
    *,
    key_col: str,
    unit: str = "day",
) -> DataFrame:
    """Streaming counterpart of ``operators.profile.drift_series``: per
    key, when a time bucket is closed by the arrival of a later one, emit
    the exact two-sample KS statistic against the PREVIOUS adjacent
    closed bucket — (key, bucket_epoch, n_prev, n_cur, ks), append mode.
    Non-adjacent buckets (a silent gap) emit nothing, the batch
    operator's contract.

    State per key: the previous closed bucket's value sample and the open
    bucket's accumulating sample (two double arrays). That is O(bucket
    row count) state — the exact-KS price; cap ingestion upstream or
    widen the unit if buckets are unbounded. Late rows (bucket older
    than the open one) are dropped."""
    if unit not in _UNIT_MICROS:
        raise ValueError(f"unit must be one of {sorted(_UNIT_MICROS)}, got {unit!r}")
    step = _UNIT_MICROS[unit]
    key_field = sdf.schema[key_col]

    out_schema = StructType(
        [
            StructField(key_col, key_field.dataType),
            StructField("bucket_epoch", LongType()),
            StructField("n_prev", LongType()),
            StructField("n_cur", LongType()),
            StructField("ks", DoubleType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("pb", LongType()),  # previous closed bucket (micros); -1 none
            StructField("pv", ArrayType(DoubleType())),
            StructField("ob", LongType()),  # open bucket; -1 none
            StructField("ov", ArrayType(DoubleType())),
        ]
    )

    def ks(a, b):
        import decimal

        xs = sorted(set(a) | set(b))
        na, nb = len(a), len(b)
        sa, sb = sorted(a), sorted(b)
        best = 0.0
        ia = ib = 0
        for x in xs:
            while ia < na and sa[ia] <= x:
                ia += 1
            while ib < nb and sb[ib] <= x:
                ib += 1
            fa = ia / na if na else 0.0
            fb = ib / nb if nb else 0.0
            best = max(best, abs(fa - fb))
        # HALF_UP to match Spark's round() (python round is banker's)
        return float(
            decimal.Decimal(repr(best)).quantize(
                decimal.Decimal("0.000001"), rounding=decimal.ROUND_HALF_UP
            )
        )

    def update(key, pdfs, state: GroupState):
        pb, pv, ob, ov = state.get if state.exists else (-1, [], -1, [])
        pv, ov = list(pv or []), list(ov or [])
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch[batch[value_col].notna()]
        out = []
        if len(batch):
            b = pd.DataFrame(
                {
                    "bkt": _floor_micros(batch[ts_col], unit),
                    "v": batch[value_col].astype("float64"),
                }
            ).sort_values("bkt", kind="stable")
            b = b[b["bkt"] >= ob] if ob >= 0 else b
            for bkt, grp in b.groupby("bkt", sort=True):
                vals = grp["v"].tolist()
                if ob < 0:
                    ob, ov = int(bkt), vals
                elif bkt == ob:
                    ov.extend(vals)
                else:
                    # close ob: compare against adjacent previous closed
                    if pb >= 0 and ob == pb + step:
                        out.append((ob, len(pv), len(ov), ks(pv, ov)))
                    pb, pv = ob, ov
                    ob, ov = int(bkt), vals
        state.update((pb, pv, ob, ov))
        if out:
            yield pd.DataFrame(
                {
                    key_col: [key[0]] * len(out),
                    "bucket_epoch": [r[0] // 1_000_000 for r in out],
                    "n_prev": [r[1] for r in out],
                    "n_cur": [r[2] for r in out],
                    "ks": [r[3] for r in out],
                }
            )

    return sdf.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
