"""Custom stateful streaming operator: gap-based sessionization.

Streaming twin of the batch ``event_sessions`` query (window-sum over
``gap > 30 min`` markers): per user, consecutive events closer than
the gap belong to one session; a larger gap CLOSES the session, which
is emitted with the same aggregate shape the batch query produces
(n_events, first_event, rounded value sum). The still-open session
lives in the state store (checkpointed, sharded by the group hash,
RocksDB-backed on a real cluster) until a later event closes it.

Timeout flushing is OPT-IN (``timeout_ms``): a processing-time
timeout emits a quiet user's open session, but it also keeps an
``availableNow`` drain alive spinning "cleaning up state" batches
until the clock fires — so the bounded-drain tests (and any batch
backfill) run with NoTimeout, and a 24/7 deployment enables it (or
uses an event-time timeout against the watermark).

Semantics notes (pinned by tests/test_stateful_stream.py):
- events are folded in (ts, event_id) order WITHIN each micro-batch;
  cross-batch reordering is the watermark's job upstream — the same
  contract the built-in ``session_window`` has in update mode.
- session numbering matches the batch query: a user's first session
  is 1, incremented per close.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (DoubleType, LongType, StructField,
                               StructType)

SESSION_OUT_SCHEMA = StructType([
    StructField("user_id", LongType(), False),
    StructField("session_no", LongType(), False),
    StructField("n_events", LongType(), False),
    StructField("first_event", LongType(), False),
    StructField("session_value", DoubleType(), False),
])

_STATE_SCHEMA = StructType([
    StructField("session_no", LongType(), False),
    StructField("last_us", LongType(), False),
    StructField("n_events", LongType(), False),
    StructField("first_event", LongType(), False),
    StructField("value_sum", DoubleType(), False),
])

GAP_US = 1_800_000_000  # 30 minutes, microseconds (same as batch)


def _round_half_up(v: float, scale: int = 2) -> float:
    """Match Spark's F.round on DOUBLE (the batch sessionizer's
    ``F.round(F.sum("value"), 2)``): Spark rounds the shortest decimal
    repr of the double with HALF_UP — Python's builtin round() is
    banker's (HALF_EVEN) and diverges on exact .xx5 boundaries."""
    import decimal
    q = decimal.Decimal(1).scaleb(-scale)
    return float(decimal.Decimal(repr(v)).quantize(
        q, rounding=decimal.ROUND_HALF_UP))


def _make_sessionize_fn(timeout_ms: int):
    def fn(key, batches, state: GroupState):
        import pandas as pd
        (user_id,) = key
        user_id = int(user_id)
        closed = []

        if timeout_ms and state.hasTimedOut:   # quiet user: flush open
            sno, last, n, first, vs = state.get
            closed.append((user_id, sno, n, first, _round_half_up(vs)))
            state.remove()
            return iter((pd.DataFrame(
                closed, columns=[f.name for f in SESSION_OUT_SCHEMA]),))

        rows = [b for b in batches if len(b)]
        cur = (state.get if state.exists else None)
        if rows:
            df = pd.concat(rows, ignore_index=True) \
                .sort_values(["ts", "event_id"])
            for ts, eid, val in zip(df["ts"], df["event_id"],
                                    df["value"]):
                us = pd.Timestamp(ts).value // 1000
                if cur is None:
                    cur = (1, us, 1, int(eid), float(val))
                else:
                    sno, last, n, first, vs = cur
                    if us - last > GAP_US:
                        closed.append((user_id, sno, n, first,
                                       _round_half_up(vs)))
                        cur = (sno + 1, us, 1, int(eid), float(val))
                    else:
                        cur = (sno, us, n + 1, first, vs + float(val))
        if cur is not None:
            state.update(cur)
            if timeout_ms:
                state.setTimeoutDuration(timeout_ms)
        if not closed:
            return iter(())
        return iter((pd.DataFrame(
            closed, columns=[f.name for f in SESSION_OUT_SCHEMA]),))
    return fn


def sessionize_stream(events: DataFrame, timeout_ms: int = 0) -> DataFrame:
    """(user_id, event_id, ts, value) stream -> closed sessions
    (plus timeout-flushed open sessions when ``timeout_ms`` > 0),
    matching the batch sessionizer."""
    timeout = (GroupStateTimeout.ProcessingTimeTimeout if timeout_ms
               else GroupStateTimeout.NoTimeout)
    return (events.select("user_id", "event_id", "ts", "value")
            .groupBy("user_id")
            .applyInPandasWithState(
                _make_sessionize_fn(timeout_ms), SESSION_OUT_SCHEMA,
                _STATE_SCHEMA, "append", timeout))
