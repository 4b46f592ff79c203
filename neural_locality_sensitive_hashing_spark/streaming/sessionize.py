"""Streaming gap-based sessionization — the custom STATEFUL operator
(`applyInPandasWithState`) counterpart of the batch `user_sessions` query.

Per user_id, events accumulate into an open session held in operator
state (session_start, last_ts, n_events, sum_value); an event arriving
more than `gap_sec` after the previous one CLOSES the open session (the
closed session is emitted downstream) and opens a new one. Open sessions
survive across micro-batches in Spark's state store, so the operator is
incremental: each batch touches only the groups that received events —
the streaming analogue of the batch query's single user_id exchange.

Equivalence contract (tests/test_sessionize_stream.py): over any split of
a time-ordered event log into micro-batches, the emitted CLOSED sessions
are exactly the batch sessionization's sessions minus each user's final
(still-open) one.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events bigint, sum_value double"
)
STATE_SCHEMA = "start double, last double, n bigint, s double"


def make_sessionizer(gap_sec: int = 1800):
    """(key, batches, state) function for applyInPandasWithState."""

    def sessionize(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
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
                start, last, n, s = t, t, 0, 0.0
            elif t - last > gap_sec:
                closed.append((user_id, start, last, n, s))
                start, last, n, s = t, t, 0, 0.0
            n += 1
            s += float(value)
            last = max(last, t)
        state.update((float(start), float(last), int(n), float(s)))
        if closed:
            out = pd.DataFrame(
                closed,
                columns=["user_id", "session_start", "session_end", "n_events", "sum_value"],
            )
            out["session_start"] = pd.to_datetime(out["session_start"], unit="s")
            out["session_end"] = pd.to_datetime(out["session_end"], unit="s")
            out["sum_value"] = out["sum_value"].round(4)
            yield out

    return sessionize


def sessionize_stream(events: DataFrame, gap_sec: int = 1800) -> DataFrame:
    """Streaming (user_id, ts, event_id, value) -> closed-session rows.

    Works on a streaming OR batch DataFrame (the stateful operator is only
    meaningful on streams; batch runs treat the whole input as one batch
    and emit every closed session)."""
    return events.groupBy("user_id").applyInPandasWithState(
        make_sessionizer(gap_sec),
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
