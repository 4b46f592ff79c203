"""Two-parallelism-level scaling evidence (BENCH/BASELINE.md protocol).

The north rule's N vs 4N executor criterion cannot use a real multi-node
cluster in this sandbox; per the driver instruction it is evidenced by
running the IDENTICAL spark-submit job on the IDENTICAL input at two
parallelism levels (fresh JVMs each) and reporting throughput at both plus
efficiency = throughput(4N) / (4 * throughput(N)).

Methodology (round-3 hardening): EQUAL trial counts on both sides of every
recorded pair; median AND min reported (min = least-interfered run on this
noisy shared VM, median = the typical run); multiple (N, 4N) pairs in one
invocation. Writes BENCH/BASELINE.md.

Round-9 hardening: trials are INTERLEAVED — each trial index runs BOTH
levels back-to-back (lo,hi / hi,lo / lo,hi ... alternating order), instead
of each level as a contiguous block, so every lo wall has a hi neighbour
from the same host-noise window and the per-trial paired efficiencies
(lo_wall / (factor * hi_wall)) cancel the ±40-70%% between-window swings
this shared VM shows. The pooled min/median statistics are unchanged in
meaning (same walls, same counts); `paired_effs` is the new
window-cancelling statistic.

Env knobs:
  BENCH_SCALING_MODE       executors (default) | threads
  BENCH_SCALING_TRIALS     trials per level (default 3, same both sides)
  BENCH_SCALING_PAIRS      e.g. "1x1,4x1;1x2,4x2" (workers x cores pairs)
  BENCH_SCALING_DOCS       corpus size (default 1000000)
  BENCH_SCALING_EVENTLOG   1 = capture shuffle bytes on one trial per level
                           (tools/shuffle_bytes.py over the event log)

    python tools/bench_scaling.py [n_docs] [extra run_dedup_job args...]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TRIALS = int(os.environ.get("BENCH_SCALING_TRIALS", "3"))
MODE = os.environ.get("BENCH_SCALING_MODE", "executors")
MEM_PER_EXECUTOR_MB = int(os.environ.get("BENCH_SCALING_EXEC_MB", "6144"))
EVENTLOG = os.environ.get("BENCH_SCALING_EVENTLOG", "") == "1"


def _master(workers: int, cores: int) -> str:
    if MODE == "executors":
        return f"local-cluster[{workers},{cores},{MEM_PER_EXECUTOR_MB}]"
    return f"local[{workers * cores}]"


def run_trial(
    workers: int, cores: int, pages: str, zip_path: str, extra: list[str],
    t: int, capture_eventlog: bool,
) -> tuple[dict, dict | None]:
    """ONE spark-submit of the identical job at (workers x cores); returns
    (job report, optional shuffle-byte capture). This sandbox is a shared
    VM with bursty noisy-neighbor CPU steal (observed 4x swings between
    identical runs), which is why callers interleave these across levels."""
    from neural_locality_sensitive_hashing_spark.session import _tmpfs_scratch

    os.environ.setdefault("SPARK_GRAFT_TMPFS", "1")
    scratch = _tmpfs_scratch() or "/tmp"
    master = _master(workers, cores)
    total_cores = workers * cores
    out_json = f"/tmp/nlsh_scale_{MODE}_{workers}x{cores}_{t}.json"
    cmd = [
        "spark-submit",
        "--master", master,
        "--driver-memory", "8g",
        "--conf", f"spark.local.dir={scratch}",
    ]
    evdir = None
    if capture_eventlog:
        evdir = f"/tmp/nlsh_evlog_{workers}x{cores}"
        subprocess.run(["rm", "-rf", evdir], check=False)
        os.makedirs(evdir, exist_ok=True)
        cmd += [
            "--conf", "spark.eventLog.enabled=true",
            "--conf", f"spark.eventLog.dir={evdir}",
            "--conf", "spark.eventLog.compress=false",
        ]
    cmd += [
        "--py-files", zip_path,
        os.path.join(REPO, "tools", "run_dedup_job.py"),
        "--pages", pages,
        "--shuffle-partitions", str(4 * total_cores),
        "--json-out", out_json,
        *extra,
    ]
    print(f"# running {master} trial {t} ...", file=sys.stderr)
    t0 = time.time()
    subprocess.run(cmd, check=True, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    with open(out_json) as f:
        rep = json.load(f)
    rep["submit_wall_sec"] = round(time.time() - t0, 1)
    bytes_rep = None
    if evdir:
        try:
            from tools.shuffle_bytes import _event_files, sum_events

            tot = {"shuffle_write_bytes": 0, "shuffle_read_bytes": 0}
            for p in _event_files(evdir):
                s = sum_events(p)
                for k in tot:
                    tot[k] += s[k]
            bytes_rep = {k: round(v / 1e9, 3) for k, v in tot.items()}
        except Exception as e:  # noqa: BLE001 — evidence, not gating
            print(f"# event-log parse failed: {e}", file=sys.stderr)
    return rep, bytes_rep


def summarize_level(
    workers: int, cores: int, reps: list[dict], bytes_rep: dict | None
) -> dict:
    walls = sorted(r["wall_sec"] for r in reps)
    best = min(reps, key=lambda r: r["wall_sec"])
    docs = best["docs"]
    med_wall = statistics.median(walls)
    return {
        "master": _master(workers, cores),
        "total_cores": workers * cores,
        "walls": walls,
        "min_wall": walls[0],
        "median_wall": med_wall,
        "min_dps": round(docs / walls[0], 1),
        "median_dps": round(docs / med_wall, 1),
        "docs": docs,
        "clusters": best["clusters"],
        "dup_pairs": best["dup_pairs"],
        "candidate_pairs": best["candidate_pairs"],
        "shuffle_gb": bytes_rep,
    }


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else int(
        os.environ.get("BENCH_SCALING_DOCS", "1000000")
    )
    extra = sys.argv[2:]

    sys.path.insert(0, REPO)
    from neural_locality_sensitive_hashing_spark.datagen import write_pages_dataset

    pages, _ = write_pages_dataset(f"/tmp/nlsh_bench_webtext_{n_docs}", n_docs, seed=42)

    zip_path = "/tmp/nlsh_spark_pkg.zip"
    subprocess.run(
        ["zip", "-qr", zip_path, "neural_locality_sensitive_hashing_spark"],
        cwd=REPO, check=True,
    )

    pairs_spec = os.environ.get("BENCH_SCALING_PAIRS", "1x1,4x1;1x2,4x2")
    results = []
    for pair in pairs_spec.split(";"):
        lo_s, hi_s = pair.split(",")
        lo_w, lo_c = (int(x) for x in lo_s.split("x"))
        hi_w, hi_c = (int(x) for x in hi_s.split("x"))
        assert hi_w * hi_c == 4 * lo_w * lo_c, f"need 4x the cores: {pair}"
        # interleave: trial t runs BOTH levels back-to-back, order
        # alternating (lo,hi / hi,lo / ...) so neither level
        # systematically lands later in a drifting window; paired_effs
        # is the per-window efficiency, immune to between-window swings
        lo_reps: list[dict] = []
        hi_reps: list[dict] = []
        lo_bytes = hi_bytes = None
        paired_effs: list[float] = []
        for t in range(TRIALS):
            sides = [("lo", lo_w, lo_c), ("hi", hi_w, hi_c)]
            if t % 2 == 1:
                sides.reverse()
            for side, w, c in sides:
                rep, brep = run_trial(
                    w, c, pages, zip_path, extra, t,
                    capture_eventlog=EVENTLOG and t == 0,
                )
                if side == "lo":
                    lo_reps.append(rep)
                    lo_bytes = brep or lo_bytes
                else:
                    hi_reps.append(rep)
                    hi_bytes = brep or hi_bytes
            eff_t = round(
                lo_reps[-1]["wall_sec"] / (4.0 * hi_reps[-1]["wall_sec"]), 3
            )
            paired_effs.append(eff_t)
            print(
                f"# pair {pair} trial {t}: lo {lo_reps[-1]['wall_sec']}s, "
                f"hi {hi_reps[-1]['wall_sec']}s, paired eff {eff_t}",
                file=sys.stderr,
            )
        lo = summarize_level(lo_w, lo_c, lo_reps, lo_bytes)
        hi = summarize_level(hi_w, hi_c, hi_reps, hi_bytes)
        clusters = {r["clusters"] for r in lo_reps + hi_reps}
        assert len(clusters) == 1, f"cluster invariant broken: {clusters}"
        results.append(
            {
                "pair": pair,
                "lo": lo,
                "hi": hi,
                "eff_min": round(hi["min_dps"] / (4.0 * lo["min_dps"]), 3),
                "eff_median": round(hi["median_dps"] / (4.0 * lo["median_dps"]), 3),
                "paired_effs": paired_effs,
                "eff_paired_median": round(statistics.median(paired_effs), 3),
            }
        )
        print(json.dumps(results[-1]), file=sys.stderr)

    out = {
        "mode": MODE,
        "docs": n_docs,
        "trials_per_level": TRIALS,
        "interleaved": True,
        "job_args": extra,
        "pairs": results,
    }
    with open(os.path.join(REPO, "BENCH", "scaling_raw.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
