"""Pool two (or more) same-protocol scaling sessions into the headline
record (BENCH/scaling_raw.json).

The BENCH/BASELINE.md protocol (round 6 onward) quotes scaling efficiency
over EQUAL trial counts per level POOLED ACROSS SESSIONS, because
single-session windows on this shared VM carry ±40% block noise (see the
noise-floor A/B in BENCH/BASELINE.md). This tool makes that pooling a
recorded, repeatable step instead of an ad-hoc notebook computation:

    python tools/pool_scaling.py BENCH/scaling_raw_r7_sessionA.json \
                                 BENCH/scaling_raw_r7_sessionB.json

Writes BENCH/scaling_raw.json with all walls pooled, min/median
efficiency over the pooled sets, and asserts the cluster-count invariant
agrees across every session (determinism gate, not just a perf record).
"""

from __future__ import annotations

import json
import os
import statistics
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _pool_pair(
    session_paths: list[str], sessions: list[dict], idx: int
) -> dict:
    """Pool pair position `idx` across sessions: all walls concatenated,
    min/median efficiency over the pooled sets, determinism invariant
    re-asserted per level per session."""
    lo_walls: list[float] = []
    hi_walls: list[float] = []
    paired_effs: list[float] = []
    docs = None
    clusters = None
    pair_label = None
    for p, d in zip(session_paths, sessions):
        pair = d["pairs"][idx]
        if pair_label is None:
            pair_label = pair["pair"]
        assert pair["pair"] == pair_label, (
            f"{p}: pair[{idx}] {pair['pair']!r} != {pair_label!r}"
        )
        lo, hi = pair["lo"], pair["hi"]
        assert len(lo["walls"]) == len(hi["walls"]), f"{p}: unequal trial counts"
        lo_walls += lo["walls"]
        hi_walls += hi["walls"]
        # round-9 interleaved sessions carry per-window paired
        # efficiencies; pool them too (all sessions or none)
        paired_effs += pair.get("paired_effs", [])
        if docs is None:
            docs, clusters = lo["docs"], lo["clusters"]
        # determinism invariant: identical answer at every level, every session
        for level in (lo, hi):
            assert level["docs"] == docs, f"{p}: docs mismatch"
            assert level["clusters"] == clusters, (
                f"{p}: cluster invariant broken ({level['clusters']} != {clusters})"
            )

    lo_walls.sort()
    hi_walls.sort()
    # scaling factor from the pair label itself ("1x1,4x1" -> 4), not a
    # hardcoded 4: pooling a non-4x pair must not silently compute
    # efficiency against the wrong ideal
    lo_spec, hi_spec = pair_label.split(",")
    cores = lambda s: int(s.split("x")[0]) * int(s.split("x")[1])  # noqa: E731
    factor = cores(hi_spec) / cores(lo_spec)
    dps = lambda w: docs / w  # noqa: E731
    return {
        "docs": docs,
        "trials_per_level": len(lo_walls),
        "pair": pair_label,
        "lo_walls": lo_walls,
        "hi_walls": hi_walls,
        "eff_min": round(dps(min(hi_walls)) / (factor * dps(min(lo_walls))), 3),
        "eff_median": round(
            dps(statistics.median(hi_walls))
            / (factor * dps(statistics.median(lo_walls))),
            3,
        ),
        "paired_effs": sorted(paired_effs),
        "eff_paired_median": (
            round(statistics.median(paired_effs), 3) if paired_effs else None
        ),
        "clusters": clusters,
    }


def main() -> None:
    session_paths = sys.argv[1:]
    if len(session_paths) < 2:
        raise SystemExit(__doc__)

    sessions = []
    for p in session_paths:
        with open(p) as f:
            sessions.append(json.load(f))

    # headline pair = the first recorded pair in every session; sessions
    # that also ran extra diagnostic pairs (e.g. the 1x2,4x2 bandwidth
    # pair) get those pooled too when EVERY session carries them
    headline = _pool_pair(session_paths, sessions, 0)
    n_common = min(len(d["pairs"]) for d in sessions)
    extra = [_pool_pair(session_paths, sessions, i) for i in range(1, n_common)]

    out = {
        "mode": "executors",
        "sessions": [os.path.basename(p) for p in session_paths],
        **headline,
        "extra_pairs": extra,
    }
    with open(os.path.join(REPO, "BENCH", "scaling_raw.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
