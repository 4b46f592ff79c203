"""Sum shuffle/input/output bytes from a Spark event log.

Evidence tool for BENCH/BASELINE.md: run a job with
    --conf spark.eventLog.enabled=true --conf spark.eventLog.dir=<dir> \
    --conf spark.eventLog.compress=false
then    python tools/shuffle_bytes.py <dir-or-file>
(compress=false because the sandbox python has no zstd codec; on a real
cluster leave compression on and decompress before parsing)
prints one JSON line with total shuffle write/read, input and spill bytes
summed over all SparkListenerTaskEnd events — the byte-movement ground
truth behind the scaling-efficiency analysis (which exchanges shrink when
the verify payload changes, what the bandwidth ceiling actually carries).
"""

from __future__ import annotations

import json
import os
import sys


def sum_events(path: str) -> dict[str, int]:
    tot = {
        "shuffle_write_bytes": 0,
        "shuffle_read_bytes": 0,
        "input_bytes": 0,
        "output_bytes": 0,
        "memory_spill_bytes": 0,
        "disk_spill_bytes": 0,
        "tasks": 0,
    }
    with open(path) as f:
        for line in f:
            if '"SparkListenerTaskEnd"' not in line:
                continue
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            m = ev.get("Task Metrics")
            if not m:
                continue
            tot["tasks"] += 1
            sw = m.get("Shuffle Write Metrics", {})
            sr = m.get("Shuffle Read Metrics", {})
            tot["shuffle_write_bytes"] += sw.get("Shuffle Bytes Written", 0)
            tot["shuffle_read_bytes"] += sr.get("Remote Bytes Read", 0) + sr.get(
                "Local Bytes Read", 0
            )
            tot["input_bytes"] += m.get("Input Metrics", {}).get("Bytes Read", 0)
            tot["output_bytes"] += m.get("Output Metrics", {}).get("Bytes Written", 0)
            tot["memory_spill_bytes"] += m.get("Memory Bytes Spilled", 0)
            tot["disk_spill_bytes"] += m.get("Disk Bytes Spilled", 0)
    return tot


def _event_files(target: str) -> list[str]:
    """Plain v1 log files AND Spark 4 rolling v2 directories
    (eventlog_v2_<app>/events_* files)."""
    if os.path.isfile(target):
        return [target]
    out: list[str] = []
    for root, _, files in os.walk(target):
        for f in sorted(files):
            if f.startswith(".") or f.endswith(".inprogress") or f == "appstatus":
                continue
            if f.startswith("appstatus_"):
                continue
            out.append(os.path.join(root, f))
    return out


def main() -> None:
    target = sys.argv[1]
    files = _event_files(target)
    out = {}
    for p in files:
        t = sum_events(p)
        t["gb_shuffle_write"] = round(t["shuffle_write_bytes"] / 1e9, 3)
        t["gb_shuffle_read"] = round(t["shuffle_read_bytes"] / 1e9, 3)
        out[os.path.basename(p)] = t
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
