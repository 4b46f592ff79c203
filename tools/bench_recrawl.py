"""Recrawl-tier throughput at the headline scale (VERDICT r6 Next #5).

Solo bench: a 1M-doc corpus augmented with 30% recrawl rows (same page
re-fetched under a trivially-different URL with a newer warc_ts —
datagen.augment_with_recrawls) is pushed through the spark-submit dedup
job three ways, TRIALS runs each, medians + mins reported:

  recrawl+dedup   --recrawl-dedup --fast on the 1.3M-row corpus: the
                  canonicalize + newest-crawl window runs as the
                  pre-stage, content dedup sees 1M survivors
  dedup-only      --fast on the SAME 1.3M-row corpus: what skipping the
                  tier costs (content dedup shingles 30% more rows and
                  carries the recrawls as exact-dup pairs)
  plain-1M        --fast on the un-augmented 1M corpus: the round-6
                  flagship reference point

Cross-check: recrawl+dedup's cluster count must EQUAL plain-1M's (the
tier restores exactly the base text multiset — asserted, not assumed).

    python tools/bench_recrawl.py [n_docs]    # writes BENCH/recrawl_raw.json

Env: BENCH_RECRAWL_TRIALS (default 3).
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TRIALS = int(os.environ.get("BENCH_RECRAWL_TRIALS", "3"))


def run_job(pages: str, zip_path: str, extra: list[str], tag: str) -> dict:
    from neural_locality_sensitive_hashing_spark.session import _tmpfs_scratch

    os.environ.setdefault("SPARK_GRAFT_TMPFS", "1")
    scratch = _tmpfs_scratch() or "/tmp"
    reps = []
    for t in range(TRIALS):
        out_json = f"/tmp/nlsh_recrawl_bench_{tag}_{t}.json"
        cmd = [
            "spark-submit",
            "--master", "local[32]",
            "--driver-memory", "8g",
            "--conf", f"spark.local.dir={scratch}",
            "--py-files", zip_path,
            os.path.join(REPO, "tools", "run_dedup_job.py"),
            "--pages", pages,
            "--shuffle-partitions", "128",
            "--json-out", out_json,
            "--fast",
            *extra,
        ]
        print(f"# {tag} trial {t} ...", file=sys.stderr)
        t0 = time.time()
        subprocess.run(cmd, check=True, stdout=subprocess.DEVNULL,
                       stderr=subprocess.DEVNULL)
        with open(out_json) as f:
            rep = json.load(f)
        rep["submit_wall_sec"] = round(time.time() - t0, 1)
        reps.append(rep)
    walls = sorted(r["wall_sec"] for r in reps)
    docs = reps[0]["docs"]
    med = statistics.median(walls)
    return {
        "tag": tag,
        "input_rows": docs,
        "walls": walls,
        "min_wall": walls[0],
        "median_wall": med,
        "min_rps": round(docs / walls[0], 1),
        "median_rps": round(docs / med, 1),
        "clusters": reps[0]["clusters"],
    }


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    sys.path.insert(0, REPO)
    from neural_locality_sensitive_hashing_spark.datagen import (
        write_pages_dataset,
        write_recrawled_pages_dataset,
    )

    plain, _ = write_pages_dataset(f"/tmp/nlsh_bench_webtext_{n_docs}", n_docs, seed=42)
    recrawled, _ = write_recrawled_pages_dataset(
        f"/tmp/nlsh_bench_recrawl_{n_docs}", n_docs, seed=42, recrawl_rate=0.3
    )
    zip_path = "/tmp/nlsh_spark_pkg.zip"
    subprocess.run(
        ["zip", "-qr", zip_path, "neural_locality_sensitive_hashing_spark"],
        cwd=REPO, check=True,
    )

    results = [
        run_job(recrawled, zip_path, ["--recrawl-dedup"], "recrawl_dedup"),
        run_job(recrawled, zip_path, [], "dedup_only"),
        run_job(plain, zip_path, [], "plain"),
    ]
    by_tag = {r["tag"]: r for r in results}
    assert by_tag["recrawl_dedup"]["clusters"] == by_tag["plain"]["clusters"], (
        "recrawl tier changed the dedup answer: "
        f"{by_tag['recrawl_dedup']['clusters']} vs {by_tag['plain']['clusters']}"
    )
    out = {
        "n_docs": n_docs,
        "recrawl_rate": 0.3,
        "trials": TRIALS,
        "results": results,
        "clusters_invariant": by_tag["plain"]["clusters"],
    }
    with open(os.path.join(REPO, "BENCH", "recrawl_raw.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
