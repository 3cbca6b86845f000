"""Aggregate the gather-tier scaling campaign samples
(BENCH/gather_scaling_runs.jsonl, one JSON line per leg, written by
tools/_scaling_worker.py with SPARK_GRAFT_TIER=gather) into
BENCH/gather_scaling.json with the same three estimators as the
headline campaign: min-based (headline), per-interleaved-pair, and
phase-min composition."""

from __future__ import annotations

import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PHASES = ("pr_build", "pr_steps", "wcc_build", "wcc_steps")


def phase_split(r: dict) -> dict:
    return {
        "pr_build": round(r["pr_sec"] - r["pr_iter_sec"], 2),
        "pr_steps": r["pr_iter_sec"],
        "wcc_build": round(r["wcc_sec"] - r["wcc_iter_sec"], 2),
        "wcc_steps": r["wcc_iter_sec"],
    }


def main():
    with open(os.path.join(REPO, "BENCH", "gather_scaling_runs.jsonl")) as f:
        legs = [json.loads(line) for line in f if line.strip()]
    by_cpus: dict[int, list[dict]] = {}
    for leg in legs:
        by_cpus.setdefault(leg["cpus"], []).append(leg)
    (n_small, small), (n_big, big) = sorted(by_cpus.items())
    assert n_big == 4 * n_small, (n_small, n_big)
    totals = {
        c: [round(r["pr_sec"] + r["wcc_sec"], 2) for r in rs]
        for c, rs in by_cpus.items()
    }
    t_n, t_4n = min(totals[n_small]), min(totals[n_big])
    pairs = [
        round(a / (4.0 * b), 3) for a, b in zip(totals[n_small], totals[n_big])
    ]
    ph_n = [phase_split(r) for r in small]
    ph_4n = [phase_split(r) for r in big]
    phase_min_n = {p: min(r[p] for r in ph_n) for p in PHASES}
    phase_min_4n = {p: min(r[p] for r in ph_4n) for p in PHASES}
    eff = t_n / (4.0 * t_4n)
    summary = {
        "metric": "PageRank+WCC scaling efficiency, N to 4N cores (gather tier)",
        "tier": "gather",
        "n_cores": n_small,
        "n4_cores": n_big,
        "edges": small[0]["edges"],
        "vertices": small[0]["vertices"],
        "t_n_sec": t_n,
        "t_4n_sec": t_4n,
        "edges_per_sec_n": round(small[0]["edges"] / t_n),
        "edges_per_sec_4n": round(big[0]["edges"] / t_4n),
        "efficiency": round(eff, 3),
        "pass": eff >= 0.8,
        "per_pair": pairs,
        "per_pair_median": sorted(pairs)[len(pairs) // 2],
        "efficiency_phase_min": round(
            sum(phase_min_n.values()) / (4.0 * sum(phase_min_4n.values())), 3
        ),
        "phase_min_n": phase_min_n,
        "phase_min_4n": phase_min_4n,
        "all_runs_n": totals[n_small],
        "all_runs_4n": totals[n_big],
        "pinned": True,
        "parts": 12,
        "replicate": 64,
    }
    with open(os.path.join(REPO, "BENCH", "gather_scaling.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
