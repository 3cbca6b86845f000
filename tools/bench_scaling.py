"""Scaling-efficiency evidence for the north rule's two-cluster-size
criterion: run the identical PageRank+WCC job at N and 4N local cores
on the same input and report throughput at both plus
efficiency = T_N / (4 * T_4N).

The sandbox has no multi-node cluster (BASELINE.md "sandbox substitute"
row): two parallelism levels on one box stand in for two cluster
sizes. To keep the measurement compute-bound rather than
overhead-bound (a 1000-executor cluster iterating a 10^12-edge table
is compute-bound), the sf0.1 co-occurrence graph is replicated
REPLICATE times with disjoint id ranges — deterministic, no external
data, identical convergence trajectory per copy.

Writes BENCH/BASELINE.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RUNNER = os.path.join(REPO, "tools", "_scaling_worker.py")


def run_one(cpus: int, sf_dir: str, replicate: int, repeats: int = 2) -> dict:
    """Best-of-N fresh-JVM runs (the sandbox host is noisy; min is the
    standard noise-robust estimator for wall-clock benchmarks)."""
    best = None
    runs = []
    for _ in range(repeats):
        env = dict(os.environ)
        env.update(
            SPARK_GRAFT_SF_DIR=sf_dir,
            SPARK_GRAFT_CPUS=str(cpus),
            SPARK_GRAFT_REPLICATE=str(replicate),
        )
        out = subprocess.run(
            [sys.executable, RUNNER], env=env, capture_output=True, text=True, cwd=REPO
        )
        if out.returncode != 0:
            raise RuntimeError(f"worker failed (cpus={cpus}):\n{out.stderr[-3000:]}")
        r = json.loads(out.stdout.strip().splitlines()[-1])
        runs.append(round(r["pr_sec"] + r["wcc_sec"], 2))
        if best is None or r["pr_sec"] + r["wcc_sec"] < best["pr_sec"] + best["wcc_sec"]:
            best = r
    best["all_runs_sec"] = runs
    return best


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    replicate = int(os.environ.get("SPARK_GRAFT_REPLICATE", "8"))
    n_small = int(os.environ.get("SPARK_GRAFT_N", "8"))
    n_big = 4 * n_small

    repeats = int(os.environ.get("SPARK_GRAFT_REPEATS", "2"))
    res_small = run_one(n_small, sf_dir, replicate, repeats)
    res_big = run_one(n_big, sf_dir, replicate, repeats)

    t_small = res_small["pr_sec"] + res_small["wcc_sec"]
    t_big = res_big["pr_sec"] + res_big["wcc_sec"]
    efficiency = t_small / (4.0 * t_big)
    summary = {
        "metric": "PageRank+WCC scaling efficiency, N to 4N cores",
        "n_cores": n_small,
        "n4_cores": n_big,
        "edges": res_small["edges"],
        "t_n_sec": round(t_small, 2),
        "t_4n_sec": round(t_big, 2),
        "edges_per_sec_n": round(res_small["edges"] / t_small),
        "edges_per_sec_4n": round(res_big["edges"] / t_big),
        "efficiency": round(efficiency, 3),
        "pass": efficiency >= 0.8,
        "detail": {"n": res_small, "4n": res_big},
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(render_md(summary, sf_dir, replicate))
    print(json.dumps(summary))
    return summary


def render_md(s: dict, sf_dir: str, replicate: int) -> str:
    d_n, d_4n = s["detail"]["n"], s["detail"]["4n"]
    return f"""# BENCH/BASELINE — scaling-efficiency evidence (north rule)

The north rule's two-cluster-size criterion (throughput scaling
efficiency >= 0.8 from N to 4N executors) cannot use a real cluster in
this sandbox; per the driver instruction it is evidenced by running the
identical job at two local parallelism levels on the same input.

- input: co-occurrence edge table from `{sf_dir}` replicated
  x{replicate} with disjoint id ranges -> {s["edges"]:,} edges
  ({d_n["vertices"]:,} vertices), deterministic (seeded testdata only)
- job: PageRank (Giraph semantics, eps=0.001, d=0.85) to convergence
  ({d_n["pr_iters"]} iterations) + WCC max-label propagation to fixed
  point ({d_n["wcc_iters"]} iterations); identical code path both runs
  (`tools/_scaling_worker.py`), `spark.sql.shuffle.partitions` = cores

| cores | PageRank s | WCC s | total s | edges/s to convergence |
|---|---|---|---|---|
| N = {s["n_cores"]} | {d_n["pr_sec"]:.1f} | {d_n["wcc_sec"]:.1f} | {s["t_n_sec"]} | {s["edges_per_sec_n"]:,} |
| 4N = {s["n4_cores"]} | {d_4n["pr_sec"]:.1f} | {d_4n["wcc_sec"]:.1f} | {s["t_4n_sec"]} | {s["edges_per_sec_4n"]:,} |

**Scaling efficiency = T_N / (4 * T_4N) = {s["efficiency"]}**
(threshold 0.8: {"PASS" if s["pass"] else "FAIL"})

Per-iteration supersteps are one shuffle join + one partial-aggregated
groupBy; state localCheckpoints each superstep (lineage truncation).
Regenerate with: `python tools/bench_scaling.py`.
"""


if __name__ == "__main__":
    main()
