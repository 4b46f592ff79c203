"""WET source parse throughput -> BENCH/wet_raw.json.

Benches sources/warc.py::read_wet — the zero-shuffle conversion-record
parse — over a deterministic synthetic WET corpus (same text generator
class as the WARC benches: Zipf-ish token pages), with the record count
asserted against construction truth every trial. Conditions labeled;
3 trials, median + min, per BENCH/BASELINE.md discipline.

Set BENCH_WET_STREAM=1 to also bench the continuous-ingestion flavour
(read_wet_stream -> foreachBatch upsert into the latest-crawl store,
fresh store per trial, full Trigger.AvailableNow drain timed, final
store row count asserted) — the N33 stream's throughput counterpart to
warc_stream_raw.json; BENCH_WET_STREAM_FPT sets maxFilesPerTrigger
(default 1, one archive per micro-batch) and BENCH_WET_OUT overrides
the output file name.

    python tools/bench_wet.py [n_records] [n_archives]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    n_records = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_archives = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    trials = int(os.environ.get("BENCH_WET_TRIALS", "3"))
    master = os.environ.get("BENCH_WET_MASTER", "local[32]")

    import numpy as np

    from neural_locality_sensitive_hashing_spark import spark_session
    from neural_locality_sensitive_hashing_spark.sources.warc import (
        encode_wet,
        read_wet,
    )

    corpus_dir = f"/tmp/nlsh_bench_wet_{n_records}_{n_archives}"
    if not os.path.isdir(corpus_dir) or len(os.listdir(corpus_dir)) != n_archives:
        os.makedirs(corpus_dir, exist_ok=True)
        for stale in os.listdir(corpus_dir):
            os.unlink(os.path.join(corpus_dir, stale))
        from datetime import datetime, timedelta

        rng = np.random.default_rng(101)
        words = np.array([f"w{i:04d}" for i in range(8000)])
        per = n_records // n_archives
        t0g = time.monotonic()
        base = datetime(2024, 6, 1)
        total = 0
        for a in range(n_archives):
            n_a = per + (1 if a < n_records % n_archives else 0)
            recs = [
                {
                    "url": f"https://site{a}.example/p/{i}",
                    "date": base + timedelta(seconds=total + i),
                    "text": " ".join(
                        rng.choice(words, size=int(rng.integers(80, 400)))
                    ),
                }
                for i in range(n_a)
            ]
            with open(
                os.path.join(corpus_dir, f"crawl-{a:05d}.wet.gz"), "wb"
            ) as f:
                f.write(encode_wet(recs, id_offset=total))
            total += n_a
        print(
            f"# generated {total} records / {n_archives} archives "
            f"in {time.monotonic() - t0g:.1f}s",
            file=sys.stderr,
        )

    arc_mb = sum(
        os.path.getsize(os.path.join(corpus_dir, f))
        for f in os.listdir(corpus_dir)
    ) / 2**20

    spark = spark_session("bench_wet", master=master, shuffle_partitions=None)
    spark.sparkContext.setLogLevel("ERROR")

    stages = {"parse": lambda: read_wet(spark, corpus_dir).count()}
    if os.environ.get("BENCH_WET_STREAM") == "1":
        import tempfile

        from neural_locality_sensitive_hashing_spark.streaming.recrawl_stream import (
            run_incremental_recrawl_wet,
        )

        def stream_ingest() -> int:
            # fresh store per trial: the full drain is the unit under test
            with tempfile.TemporaryDirectory(prefix="wet_stream_state_") as state:
                sink = run_incremental_recrawl_wet(
                    spark,
                    corpus_dir,
                    state,
                    max_files_per_trigger=int(
                        os.environ.get("BENCH_WET_STREAM_FPT", "1")
                    ),
                )
                return sink.latest_crawls().count()

        stages["stream_ingest"] = stream_ingest

    out = {
        "n_records": n_records,
        "n_archives": n_archives,
        "archive_mb": round(arc_mb, 1),
        "master": master,
        "trials": trials,
        "stages": {},
    }
    for name, fn in stages.items():
        walls, counts = [], set()
        for t in range(trials):
            t0 = time.monotonic()
            counts.add(fn())
            walls.append(round(time.monotonic() - t0, 2))
            print(f"# {name} trial {t}: {walls[-1]}s", file=sys.stderr)
        assert len(counts) == 1, f"{name}: nondeterministic count {counts}"
        n = counts.pop()
        # construction truth: every URL is unique, so BOTH the parse and
        # the drained latest-crawl store must hold exactly n_records rows
        assert n == n_records, f"{name} lost rows: {n} != {n_records}"
        med = statistics.median(walls)
        out["stages"][name] = {
            "rows": n,
            "walls": walls,
            "median_wall": med,
            "median_rec_per_s": round(n_records / med, 1),
            "min_rec_per_s": round(n_records / min(walls), 1),
        }
    # back-compat top-level figures = the parse stage (the r8 series)
    out.update(
        {k: v for k, v in out["stages"]["parse"].items() if k != "rows"}
    )
    out_name = os.environ.get("BENCH_WET_OUT", "wet_raw.json")
    with open(os.path.join(REPO, "BENCH", out_name), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
