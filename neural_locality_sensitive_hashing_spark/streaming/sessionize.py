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

from collections.abc import Iterator
from decimal import ROUND_HALF_UP, Decimal

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
# CHECKPOINT COMPATIBILITY (deliberate breaks): `s` changed double->bigint
# with the micro-unit semantics, and `start`/`last` later changed
# double (epoch seconds) -> bigint (epoch MICROSECONDS): float64 epoch
# seconds have an ulp of ~0.24 us at 2024 epochs, so a microsecond-
# granularity event time round-tripped through float could emit a
# session_start/end one microsecond off the batch query's min/max(ts) —
# fatal for the exact-equality oracle lane. A stream checkpointed under
# an old state schema CANNOT resume on this version — Spark's state-schema
# check (spark.sql.streaming.stateStore.stateSchemaCheck, default on)
# rejects it LOUDLY with StateSchemaNotCompatible. That is the intended
# behavior: silent reinterpretation of old float state would corrupt every
# open session. Restart such streams from a fresh checkpoint (the
# parquet-store dedup state is unaffected; only the in-flight open-session
# operator state is dropped, and closed sessions were already emitted
# downstream).
STATE_SCHEMA = "start bigint, last bigint, n bigint, s bigint"
_COLS = ["user_id", "session_start", "session_end", "n_events", "sum_value"]


def _micro(v: float) -> int:
    """value -> integer micro-units, reproducing the batch query's
    double -> decimal(18,6) cast EXACTLY: Spark (like DuckDB) parses the
    double's SHORTEST decimal representation (Python ``repr`` == Java
    ``Double.toString`` up to format) and scales with HALF_UP
    (= half away from zero). Doing float arithmetic here instead
    (``floor(abs(v)*1e6 + 0.5)``) diverges on 7-fractional-digit values
    whose double sits just below the decimal tie — e.g. 0.1234565 reprs
    as '0.1234565' so the cast yields 123457, while the double itself is
    0.12345649999... and floors to 123456."""
    return int(
        Decimal(repr(v)).scaleb(6).to_integral_value(rounding=ROUND_HALF_UP)
    )


def _emit(rows: list[tuple]) -> pd.DataFrame:
    out = pd.DataFrame(rows, columns=_COLS)
    # session_start/session_end arrive as int64 epoch microseconds —
    # exact; no float in the timestamp path
    out["session_start"] = pd.to_datetime(out["session_start"], unit="us")
    out["session_end"] = pd.to_datetime(out["session_end"], unit="us")
    # micro-units -> value, rounded to the contract's 4 decimals with the
    # batch query's exact semantics: round(decimal, 4) is HALF_UP in both
    # Spark and DuckDB, while pandas' float .round(4) is half-to-even —
    # a micro sum landing on a half-unit boundary (x.00005) would diverge.
    # Decimal(s).scaleb(-6) is exact (s is an integer), quantize matches
    # the engines' tie rule, float() is the same nearest-double cast both
    # engines apply to the rounded decimal.
    q4 = Decimal("0.0001")
    out["sum_value"] = [
        float(Decimal(int(s)).scaleb(-6).quantize(q4, rounding=ROUND_HALF_UP))
        for s in out["sum_value"]
    ]
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
            t = ts.value // 1000  # pandas ns ticks -> exact epoch micros
            # the gap is measured on SECOND-TRUNCATED event times — the
            # batch query's contract (`unix_timestamp` in Spark and
            # `date_diff('second', ...)` in the oracle both truncate to
            # the second), so two events 1800.4 wall-seconds apart that
            # straddle <= 1800 whole-second boundaries stay in ONE
            # session in both tiers. Emitted start/end keep full micros.
            if start is None:
                start, last, n, s = t, t, 0, 0
            elif t // 1_000_000 - last // 1_000_000 > gap_sec:
                closed.append((user_id, start, last, n, s))
                start, last, n, s = t, t, 0, 0
            n += 1
            s += _micro(float(value))
            last = max(last, t)
        state.update((int(start), int(last), int(n), int(s)))
        if event_time_timeout:
            # fire once the watermark can no longer admit an extending
            # event: extension requires floor_sec(T) <= floor_sec(last)
            # + gap, i.e. T < (floor_sec(last) + gap + 1) seconds. Spark
            # rejects timestamps at-or-before the current watermark, so
            # clamp just above it (flushed on the next trigger then).
            horizon_ms = (last // 1_000_000 + gap_sec + 1) * 1000
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
