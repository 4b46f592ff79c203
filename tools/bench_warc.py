"""WARC-source throughput -> BENCH/<out>.json.

Measures the raw-input end of the pipeline on synthetic Common-Crawl-
layout archives (one gzip member per record):

  * parse    — binaryFile -> mapInPandas record parse, count of pages
  * first_tier — warc_pages narrowed to (crawl_id, url, warc_ts, text)
                 -> latest_crawl_per_url -> count (the production N30 ->
                 N19 shape; lang_id is pruned by the narrow, and html is
                 deliberately kept out of the window exchange)
  * stream_ingest (BENCH_WARC_STREAM=1) — the N31 continuous-ingestion
                 path: read_warc_stream -> foreachBatch upsert into the
                 latest-crawl store (fresh store per trial), full drain
                 timed, final store row count asserted against
                 construction truth

Protocol matches BENCH/BASELINE.md discipline: deterministic input,
3 trials per stage, median + min reported, conditions labeled. Archives
are built once (construction-time truth: n_files x n_records known) and
the row counts are asserted every trial, not assumed.

Set BENCH_WARC_CACHE=<dir> to build the archives ONCE and reuse them
across parallelism levels (the >=1M-record scaling runs would otherwise
spend minutes regenerating identical input per level); the cache is
keyed on (n_files, per_file, seed) and rebuilt on mismatch.

    python tools/bench_warc.py [n_files] [records_per_file]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time
from datetime import datetime, timedelta

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WORDS = (
    "the of and to in a is that for it with as on be at by this had not "
    "are but from or have an they which one you were all her she there "
    "would their we him been has when who will more no if out so said "
    "what up its about into than them can only other new some could time"
).split()


def build_archives(out_dir: str, n_files: int, per_file: int, seed: int = 7) -> int:
    from neural_locality_sensitive_hashing_spark.sources.warc import encode_warc

    rng = np.random.default_rng(seed)
    t0 = datetime(2024, 1, 1)
    total_records = 0
    n_pages = 0
    for f in range(n_files):
        recs = []
        for i in range(per_file):
            doc_id = f * per_file + i
            body = " ".join(rng.choice(WORDS, size=int(rng.integers(80, 300))))
            url = f"https://site{doc_id % 997}.com/p/{doc_id}"
            html = b"<html><main>" + body.encode() + b"</main></html>"
            recs.append(
                {"url": url, "date": t0 + timedelta(minutes=doc_id % 50000),
                 "html": html}
            )
            n_pages += 1
            # ~12% of pages are RE-crawled under a tracking-param variant
            # a day later — the first tier must collapse these
            if rng.random() < 0.12:
                recs.append(
                    {
                        "url": url + "?utm_source=x",
                        "date": t0 + timedelta(days=1, minutes=doc_id % 50000),
                        "html": html,
                    }
                )
        with open(os.path.join(out_dir, f"part{f:04d}.warc.gz"), "wb") as fh:
            fh.write(encode_warc(recs))
        total_records += len(recs)
    return total_records, n_pages


def ensure_archives(
    cache_dir: str, n_files: int, per_file: int, seed: int = 7
) -> tuple[int, int]:
    """Idempotent build of the synthetic archives under ``cache_dir``:
    reuse when the (n_files, per_file, seed) key matches the recorded
    meta, rebuild from scratch otherwise."""
    os.makedirs(cache_dir, exist_ok=True)
    meta_path = os.path.join(cache_dir, "meta.json")
    key = {"n_files": n_files, "per_file": per_file, "seed": seed}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        if all(meta.get(k) == v for k, v in key.items()):
            return meta["records"], meta["pages"]
    for stale in os.listdir(cache_dir):
        if stale.endswith(".warc.gz"):
            os.unlink(os.path.join(cache_dir, stale))
    total, n_pages = build_archives(cache_dir, n_files, per_file, seed)
    with open(meta_path, "w") as f:
        json.dump({**key, "records": total, "pages": n_pages}, f)
    return total, n_pages


def main() -> None:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    per_file = int(sys.argv[2]) if len(sys.argv) > 2 else 6250
    trials = int(os.environ.get("BENCH_WARC_TRIALS", "3"))
    # two-parallelism-level evidence for the zero-shuffle read: run once
    # with local[8] and once with local[32] (same archives, same seed)
    master = os.environ.get("BENCH_WARC_MASTER", "local[32]")
    out_name = os.environ.get("BENCH_WARC_OUT", "warc_raw.json")

    from neural_locality_sensitive_hashing_spark import spark_session
    from neural_locality_sensitive_hashing_spark.operators.recrawl import (
        latest_crawl_per_url,
    )
    from neural_locality_sensitive_hashing_spark.sources.warc import (
        read_warc,
        warc_pages,
    )

    import contextlib

    cache = os.environ.get("BENCH_WARC_CACHE")
    ctx = (
        contextlib.nullcontext(cache)
        if cache
        else tempfile.TemporaryDirectory(prefix="warc_bench_")
    )
    with ctx as d:
        t = time.monotonic()
        if cache:
            total, n_pages = ensure_archives(d, n_files, per_file)
        else:
            total, n_pages = build_archives(d, n_files, per_file)
        gen_s = time.monotonic() - t
        arc_mb = sum(
            os.path.getsize(os.path.join(d, f)) for f in os.listdir(d)
        ) / 1e6

        # shuffle_partitions=None -> session.py derives it from the
        # master (handles local[N], local[*], cluster masters) — no
        # second copy of that parsing here
        spark = spark_session("bench_warc", master=master, shuffle_partitions=None)
        arcs = os.path.join(d, "part*.warc.gz")  # never meta.json
        stages = {
            "parse": lambda: read_warc(spark, arcs).count(),
            # production shape: narrow BEFORE the window (run_dedup_job
            # measured that shuffling the html payload doubles this
            # stage) and tie-break on the content-derived crawl_id
            "first_tier": lambda: latest_crawl_per_url(
                warc_pages(spark, arcs).select(
                    "crawl_id", "url", "warc_ts", "text"
                ),
                id_col="crawl_id",
            ).count(),
        }
        if os.environ.get("BENCH_WARC_STREAM") == "1":
            from neural_locality_sensitive_hashing_spark.streaming.recrawl_stream import (
                run_incremental_recrawl_warc,
            )

            def stream_ingest() -> int:
                # fresh store per trial: the drain is the unit under test
                with tempfile.TemporaryDirectory(
                    prefix="warc_stream_state_"
                ) as state:
                    sink = run_incremental_recrawl_warc(
                        spark,
                        arcs,
                        state,
                        max_files_per_trigger=int(
                            os.environ.get("BENCH_WARC_STREAM_FPT", "1")
                        ),
                    )
                    return sink.latest_crawls().count()

            stages["stream_ingest"] = stream_ingest
        out = {
            "n_files": n_files,
            "records": total,
            "pages": n_pages,
            "archive_mb": round(arc_mb, 1),
            "gen_s": round(gen_s, 1),
            "master": master,
            "trials": trials,
            "stages": {},
        }
        for name, fn in stages.items():
            walls, counts = [], set()
            for _ in range(trials):
                t = time.monotonic()
                counts.add(fn())
                walls.append(round(time.monotonic() - t, 2))
            assert len(counts) == 1, f"{name}: nondeterministic count {counts}"
            count = counts.pop()
            if name == "parse":
                assert count == total, f"parse lost rows: {count} != {total}"
            else:
                # construction truth: the tier must collapse every recrawl
                # variant onto its base page, nothing more, nothing less
                assert count == n_pages, f"{name}: {count} != {n_pages}"
            med = statistics.median(walls)
            out["stages"][name] = {
                "rows": count,
                "walls": walls,
                "median_wall": med,
                "median_rows_per_s": round(total / med, 1),
                "min_rows_per_s": round(total / min(walls), 1),
            }
        spark.stop()

    with open(os.path.join(REPO, "BENCH", out_name), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
