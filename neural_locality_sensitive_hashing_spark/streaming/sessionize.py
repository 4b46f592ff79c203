"""Streaming gap-based sessionization — the custom STATEFUL operator
(`applyInPandasWithState`) counterpart of the batch `user_sessions` query.

Per user_id, events accumulate into an open session held in operator
state (session_start, last_ts, n_events, sum_value); an event arriving
more than `gap_sec` after the previous one CLOSES the open session (the
closed session is emitted downstream) and opens a new one. Open sessions
survive across micro-batches in Spark's state store, so the operator is
incremental: each batch touches only the groups that received events —
the streaming analogue of the batch query's single user_id exchange.

Idle-session flush: with a watermark (`watermark_delay`) the operator
registers an EVENT-TIME TIMEOUT at ``last_ts + gap_sec`` for every open
session. Once the watermark passes that point no event can legally extend
the session (later events would, by definition of the gap, start a NEW
session; earlier ones are beyond the watermark and dropped), so the state
store fires the timeout, the open session is emitted, and its state is
removed — state size stays bounded by the number of genuinely-active
users, and the stream's cumulative output converges to the batch query's
FULL output (closed + final sessions), not batch-minus-open.

Equivalence contract (tests/test_sessionize_stream.py): over any split of
a time-ordered event log into micro-batches, the emitted sessions are
exactly the batch sessionization's sessions — every session whose
``last_ts + gap_sec`` the watermark has passed, plus closed-by-arrival
sessions; with NoTimeout (watermark_delay=None) the final open session
per user stays in state, as before.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events bigint, sum_value double"
)
# `s` is the running value sum in INTEGER MICRO-UNITS (value * 1e6 per
# event, rounded once at ingestion): integer addition is associative and
# commutative, so the emitted sum is bit-stable against arrival order
# inside a micro-batch — matching the batch query's decimal(18,6) sum
# contract, where float64 accumulation could flip the last ulp at the
# round(4) boundary depending on shuffle order.
#
# CHECKPOINT COMPATIBILITY (deliberate break): `s` changed double->bigint
# with the micro-unit semantics. A stream checkpointed under the old
# float-state schema CANNOT resume on this version — Spark's state-schema
# check (spark.sql.streaming.stateStore.stateSchemaCheck, default on)
# rejects it LOUDLY with StateSchemaNotCompatible. That is the intended
# behavior: the old state holds float VALUE sums, so any silent
# reinterpretation as micro-units would corrupt every open session's sum.
# Restart such streams from a fresh checkpoint (the parquet-store dedup
# state is unaffected; only the in-flight open-session operator state is
# dropped, and closed sessions were already emitted downstream).
STATE_SCHEMA = "start double, last double, n bigint, s bigint"
_COLS = ["user_id", "session_start", "session_end", "n_events", "sum_value"]


def _micro(v: float) -> int:
    """value -> integer micro-units with HALF-AWAY-FROM-ZERO rounding —
    the same tie rule as the batch query's decimal(18,6) cast. Python's
    round() is banker's (half-to-even), so a value landing exactly on a
    half-microunit (e.g. 0.0000005) would convert differently there and
    the streamed sum could diverge from the batch sum by 1e-6 pre-round(4)."""
    return int(math.floor(abs(v) * 1e6 + 0.5)) * (-1 if v < 0 else 1)


def _emit(rows: list[tuple]) -> pd.DataFrame:
    out = pd.DataFrame(rows, columns=_COLS)
    out["session_start"] = pd.to_datetime(out["session_start"], unit="s")
    out["session_end"] = pd.to_datetime(out["session_end"], unit="s")
    # micro-units -> value, rounded to the contract's 4 decimals
    out["sum_value"] = (out["sum_value"] / 1e6).round(4)
    return out


def make_sessionizer(gap_sec: int = 1800, event_time_timeout: bool = False):
    """(key, batches, state) function for applyInPandasWithState."""

    def sessionize(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if event_time_timeout and state.hasTimedOut:
            # watermark passed last_ts + gap: the open session can never be
            # extended — flush it and drop the group's state entirely.
            start, last, n, s = state.get
            state.remove()
            yield _emit([(user_id, start, last, n, s)])
            return
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts", "event_id"])
        if state.exists:
            start, last, n, s = state.get
        else:
            start = None
            last = n = s = None
        closed: list[tuple] = []
        for ts, value in zip(rows["ts"], rows["value"]):
            t = ts.timestamp()
            if start is None:
                start, last, n, s = t, t, 0, 0
            elif t - last > gap_sec:
                closed.append((user_id, start, last, n, s))
                start, last, n, s = t, t, 0, 0
            n += 1
            s += _micro(float(value))
            last = max(last, t)
        state.update((float(start), float(last), int(n), int(s)))
        if event_time_timeout:
            # fire once the watermark passes the gap horizon; Spark rejects
            # timestamps at-or-before the current watermark, so clamp just
            # above it (the session is then flushed on the next trigger).
            horizon_ms = int((last + gap_sec) * 1000) + 1
            wm_ms = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max(horizon_ms, wm_ms + 1))
        if closed:
            yield _emit(closed)

    return sessionize


def sessionize_stream(
    events: DataFrame,
    gap_sec: int = 1800,
    watermark_delay: str | None = None,
) -> DataFrame:
    """Streaming (user_id, ts, event_id, value) -> session rows.

    ``watermark_delay`` (e.g. ``"0 seconds"``, ``"10 minutes"``) enables
    the event-time-timeout flush of idle sessions described in the module
    docstring; ``None`` keeps the original closed-by-arrival-only
    behaviour (NoTimeout). Works on a streaming OR batch DataFrame (the
    stateful operator is only meaningful on streams; batch runs treat the
    whole input as one batch and emit every closed session)."""
    if watermark_delay is not None:
        events = events.withWatermark("ts", watermark_delay)
        timeout = GroupStateTimeout.EventTimeTimeout
    else:
        timeout = GroupStateTimeout.NoTimeout
    return events.groupBy("user_id").applyInPandasWithState(
        make_sessionizer(gap_sec, event_time_timeout=watermark_delay is not None),
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )
