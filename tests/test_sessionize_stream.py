"""Streaming stateful sessionization == batch sessionization (closed
sessions), with state carrying open sessions across micro-batches."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from neural_locality_sensitive_hashing_spark.streaming.sessionize import (
    sessionize_stream,
)

GAP = 600  # 10 min


def _batch_sessions(pdf: pd.DataFrame) -> set[tuple]:
    """Reference sessionization in pandas (closed + open)."""
    out = []
    for uid, g in pdf.sort_values(["user_id", "ts", "event_id"]).groupby("user_id"):
        start = last = None
        n, s = 0, 0.0
        for r in g.itertuples():
            t = r.ts.timestamp()
            if start is None:
                start, last, n, s = t, t, 0, 0.0
            elif t - last > GAP:
                out.append((uid, start, last, n, round(s, 4)))
                start, last, n, s = t, t, 0, 0.0
            n += 1
            s += r.value
            last = t
        out.append((uid, start, last, n, round(s, 4)))  # final open session
    return set(out)


def _gen_events(n_users: int = 15, n_events: int = 600, seed: int = 3) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    base = pd.Timestamp("2024-01-01")
    rows = []
    t = 0.0
    for i in range(n_events):
        # bursty arrivals: mostly short gaps, occasional >GAP jumps
        t += float(rng.choice([5.0, 30.0, 90.0, 1500.0], p=[0.5, 0.3, 0.15, 0.05]))
        rows.append(
            (
                i,
                base + pd.Timedelta(seconds=t + rng.integers(0, 3)),
                int(rng.integers(0, n_users)),
                round(float(rng.random() * 10), 2),
            )
        )
    return pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "value"])


def test_streaming_sessions_match_batch(spark, tmp_path):
    pdf = _gen_events()
    # split time-ordered into 3 micro-batch files (open sessions must
    # survive across them in the state store)
    input_dir = str(tmp_path / "incoming")
    os.makedirs(input_dir)
    pdf = pdf.sort_values("ts").reset_index(drop=True)
    cut1, cut2 = len(pdf) // 3, 2 * len(pdf) // 3
    for i, part in enumerate([pdf[:cut1], pdf[cut1:cut2], pdf[cut2:]]):
        spark.createDataFrame(part).coalesce(1).write.parquet(f"{input_dir}/b{i}.parquet")

    stream = (
        spark.readStream.schema("event_id long, ts timestamp, user_id long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{input_dir}/*")
    )
    q = (
        sessionize_stream(stream, gap_sec=GAP)
        .writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = {
        (r.user_id, r.session_start.timestamp(), r.session_end.timestamp(),
         r.n_events, round(r.sum_value, 4))
        for r in spark.sql("SELECT * FROM sessions_out").collect()
    }
    ref = _batch_sessions(pdf)
    # the stream emits CLOSED sessions; each user's final open session
    # stays in state — so got == ref minus the per-user latest session
    open_sessions = {
        max((t for t in ref if t[0] == uid), key=lambda t: t[1])
        for uid in {t[0] for t in ref}
    }
    closed_ref = ref - open_sessions
    assert got == closed_ref, (
        f"missing={list(closed_ref - got)[:3]} extra={list(got - closed_ref)[:3]}"
    )
    assert len(got) > 20  # the fixture really exercises multi-session users


def test_watermark_flushes_idle_sessions(spark, tmp_path):
    """With a watermark + event-time timeout, every session is emitted once
    the watermark passes last_ts + gap — the stream's cumulative output
    equals the FULL batch sessionization (closed + final sessions), not
    batch-minus-open."""
    pdf = _gen_events()
    input_dir = str(tmp_path / "incoming")
    os.makedirs(input_dir)
    pdf = pdf.sort_values("ts").reset_index(drop=True)
    cut1, cut2 = len(pdf) // 3, 2 * len(pdf) // 3
    for i, part in enumerate([pdf[:cut1], pdf[cut1:cut2], pdf[cut2:]]):
        spark.createDataFrame(part).coalesce(1).write.parquet(f"{input_dir}/b{i}.parquet")
    # sentinel batch: one far-future event from a user id outside the
    # fixture advances the watermark beyond every real last_ts + gap (the
    # watermark is computed from the PREVIOUS batch's max event time, so
    # the flush needs one more trigger after the last real data)
    sentinel_uid = 10_000
    sentinel = pd.DataFrame(
        [(99_999, pdf["ts"].max() + pd.Timedelta(seconds=10 * GAP), sentinel_uid, 0.0)],
        columns=["event_id", "ts", "user_id", "value"],
    )
    spark.createDataFrame(sentinel).coalesce(1).write.parquet(f"{input_dir}/b3.parquet")

    stream = (
        spark.readStream.schema("event_id long, ts timestamp, user_id long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{input_dir}/*")
    )
    q = (
        sessionize_stream(stream, gap_sec=GAP, watermark_delay="0 seconds")
        .writeStream.format("memory")
        .queryName("sessions_flush")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = {
        (r.user_id, r.session_start.timestamp(), r.session_end.timestamp(),
         r.n_events, round(r.sum_value, 4))
        for r in spark.sql("SELECT * FROM sessions_flush").collect()
    }
    ref = _batch_sessions(pdf)  # full: closed AND each user's final session
    assert got == ref, (
        f"missing={list(ref - got)[:3]} extra={list(got - ref)[:3]}"
    )
    # only the sentinel's own open session may remain unflushed
    assert not any(uid == sentinel_uid for uid, *_ in got)


def test_session_sums_bitstable_across_batch_splits(spark, tmp_path):
    """sum_value accumulates in INTEGER MICRO-UNITS in state, so the emitted
    sums are bit-identical no matter how arrivals are split into
    micro-batches or ordered within a batch — the float64-accumulation bug
    class (last-ulp drift by addition order at the round(4) boundary) that
    was fixed in the batch user_sessions oracle. 6-decimal values stress
    exactly the precision float64 partial sums would wobble at."""
    rng = np.random.default_rng(17)
    base = pd.Timestamp("2024-01-01")
    rows = []
    t = 0.0
    for i in range(400):
        t += float(rng.choice([5.0, 40.0, 1500.0], p=[0.65, 0.3, 0.05]))
        rows.append(
            (i, base + pd.Timedelta(seconds=t), int(rng.integers(0, 8)),
             round(float(rng.random() * 10), 6))
        )
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "value"])

    def run(n_splits: int, shuffle_seed: int, name: str) -> dict[tuple, float]:
        input_dir = str(tmp_path / f"in_{name}")
        os.makedirs(input_dir)
        cuts = [len(pdf) * k // n_splits for k in range(n_splits + 1)]
        for bi in range(n_splits):
            part = pdf[cuts[bi] : cuts[bi + 1]].sample(
                frac=1.0, random_state=shuffle_seed + bi  # scramble in-batch order
            )
            spark.createDataFrame(part).coalesce(1).write.parquet(
                f"{input_dir}/b{bi}.parquet"
            )
        stream = (
            spark.readStream.schema(
                "event_id long, ts timestamp, user_id long, value double"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{input_dir}/*")
        )
        q = (
            sessionize_stream(stream, gap_sec=GAP)
            .writeStream.format("memory")
            .queryName(f"sess_{name}")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {
            (r.user_id, r.session_start.timestamp(), r.session_end.timestamp(),
             r.n_events): r.sum_value
            for r in spark.sql(f"SELECT * FROM sess_{name}").collect()
        }

    a = run(3, 100, "a")
    b = run(7, 200, "b")
    assert a.keys() == b.keys() and len(a) > 10
    for k in a:
        # bit-exact, not approx: integer state makes order irrelevant
        assert repr(a[k]) == repr(b[k]), (k, a[k], b[k])
    # and both match an exact integer-micro-unit reference
    exact: dict[tuple, float] = {}
    for uid, g in pdf.sort_values(["user_id", "ts", "event_id"]).groupby("user_id"):
        start = last = None
        n, s = 0, 0
        for r in g.itertuples():
            tt = r.ts.timestamp()
            if start is None:
                start, last, n, s = tt, tt, 0, 0
            elif tt - last > GAP:
                exact[(uid, start, last, n)] = round(s / 1e6, 4)
                start, last, n, s = tt, tt, 0, 0
            n += 1
            s += int(round(r.value * 1e6))
            last = tt
    for k, v in a.items():
        if k in exact:  # closed sessions (open ones stay in state)
            assert repr(v) == repr(exact[k]), (k, v, exact[k])


def test_micro_unit_rounding_half_away_from_zero():
    """The exact half-microunit boundary (0.0000005) must round AWAY from
    zero like the batch decimal(18,6) cast — Python round() is banker's
    and would send it to 0."""
    from neural_locality_sensitive_hashing_spark.streaming.sessionize import _micro

    assert _micro(0.0000005) == 1
    assert _micro(-0.0000005) == -1
    assert _micro(1.0000005) == 1000001
    assert _micro(2.5e-6) == 3  # 2.5 micro-units -> 3 (half away)
    assert _micro(-2.5e-6) == -3
    assert _micro(0.0) == 0
    assert _micro(1.25) == 1250000


def test_micro_matches_spark_decimal_cast_shortest_repr():
    """_micro must reproduce Spark's double->decimal(18,6) cast, which
    rounds the double's SHORTEST decimal representation HALF_UP — not the
    double's exact binary value. 0.1234565's double sits just BELOW the
    decimal tie (0.12345649999...), so float arithmetic floors to 123456
    while the cast (and _micro) must yield 123457."""
    from neural_locality_sensitive_hashing_spark.streaming.sessionize import _micro

    assert _micro(0.1234565) == 123457
    assert _micro(-0.1234565) == -123457
    # and a value whose double sits just ABOVE its 7-digit literal's tie
    # still rounds by its shortest repr, not the literal
    assert _micro(0.1234575) == 123458  # repr '0.1234575' -> HALF_UP
    assert _micro(1e-7) == 0  # repr '1e-07' -> 0.1 micro-units -> 0
