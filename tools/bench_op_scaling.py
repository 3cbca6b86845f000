"""Per-operator scaling probes for the heavy round-2 extension ops
(VERDICT r2 item 5): link_prediction's wedge join and the custom
sessionization fold, run at two parallelism levels (N and 4N local
cores, fresh JVM per leg, optional taskset pinning) on the same
deterministic input — the same two-cluster-size evidence shape as the
headline PR+WCC bench (tools/bench_scaling.py), sized so one leg is
minutes, not tens of minutes.

Usage: python tools/bench_op_scaling.py            # driver, all ops
env: SPARK_GRAFT_PIN=1 (taskset), SPARK_GRAFT_N (default 1),
SPARK_GRAFT_OP_REPEATS (default 2), SPARK_GRAFT_SF_DIR.

Writes BENCH/op_scaling.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OPS = (
    "link_prediction",
    "sessionize_capped",
    "node2vec_walks",
    "closeness",
    "ktruss",
    "hits",
    "tfidf_top_terms",
    "neighbor_sample",
    "kcore",
    # round-5 additions: the two §2.3 pipelines previously unprobed
    "louvain",
    "hbse",
    # work-dominated twins of the two gather-tier latency probes: the
    # unreplicated sf0.1 readings measure the tier's per-superstep
    # fixed cost (disclosed in BENCH/BASELINE.md), these x8 disjoint
    # replicas grow kernel work 8x at the same fixed cost — the regime
    # a 100 TB input actually runs in
    "kcore_x8",
    "hits_x8",
    "louvain_x8",
    "hbse_x8",
)


def _worker(op: str, cpus: int) -> None:
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from distributed_graph_analytics_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        f"dga-op-scaling-{op}-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")
    if op == "link_prediction":
        from __spark_entry__ import load_edges
        from distributed_graph_analytics_spark.operators.link_prediction import (
            common_neighbor_scores,
        )

        edges = load_edges(spark, sf_dir).persist(StorageLevel.MEMORY_AND_DISK)
        n_in = edges.count()
        t0 = time.time()
        # min_common=16: the driver-query configuration (the wedge join
        # dominates regardless of the post-aggregation threshold)
        n_out = common_neighbor_scores(edges, min_common=16).count()
        sec = time.time() - t0
    elif op == "sessionize_capped":
        from distributed_graph_analytics_spark.streaming.sessions import (
            batch_sessionize_custom,
        )

        # events replicated x8 with disjoint user ranges — deterministic
        # scale-up, same trick as the headline bench's edge replicate
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        rep = F.explode(
            F.sequence(F.lit(0).cast("long"), F.lit(7).cast("long"))
        ).alias("rep")
        ev = ev.select("user_id", "ts", "value", rep).select(
            (F.col("user_id") + F.col("rep") * F.lit(10_000_000)).alias(
                "user_id"
            ),
            "ts",
            "value",
        ).persist(StorageLevel.MEMORY_AND_DISK)
        n_in = ev.count()
        t0 = time.time()
        n_out = batch_sessionize_custom(
            ev, gap="12 hours", max_duration="2 days"
        ).count()
        sec = time.time() - t0
    elif op == "node2vec_walks":
        from __spark_entry__ import load_edges
        from distributed_graph_analytics_spark.operators.walks import (
            node2vec_walks,
        )

        edges = load_edges(spark, sf_dir).persist(StorageLevel.MEMORY_AND_DISK)
        n_in = edges.count()
        t0 = time.time()
        # driver-query configuration; the per-step candidate explode +
        # membership join dominates
        n_out = node2vec_walks(edges, walk_length=4, p=2, q=3).count()
        sec = time.time() - t0
    elif op == "closeness":
        from __spark_entry__ import load_edges
        from distributed_graph_analytics_spark.operators.closeness import (
            closeness_centrality,
        )

        edges = load_edges(spark, sf_dir).persist(StorageLevel.MEMORY_AND_DISK)
        n_in = edges.count()
        t0 = time.time()
        n_out = closeness_centrality(edges, num_pivots=8).count()
        sec = time.time() - t0
    elif op == "ktruss":
        from __spark_entry__ import load_edges
        from distributed_graph_analytics_spark.operators.truss import k_truss

        edges = load_edges(spark, sf_dir).persist(StorageLevel.MEMORY_AND_DISK)
        n_in = edges.count()
        t0 = time.time()
        # driver-query configuration (k=8, 6 peels); round 1's full
        # degree-ordered wedge enumeration dominates, later rounds are
        # incremental (cost tracks the dropped-edge set)
        n_out = k_truss(edges, k=8, rounds=6).count()
        sec = time.time() - t0
    elif op == "hits":
        from __spark_entry__ import load_edges
        from distributed_graph_analytics_spark.operators.hits import hits

        edges = load_edges(spark, sf_dir).persist(StorageLevel.MEMORY_AND_DISK)
        n_in = edges.count()
        t0 = time.time()
        n_out = hits(edges, iterations=10).count()
        sec = time.time() - t0
    elif op == "tfidf_top_terms":
        from distributed_graph_analytics_spark.functions.text import (
            tfidf_top_terms,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        # replicated x8 with disjoint doc ids — deterministic scale-up
        rep = F.explode(
            F.sequence(F.lit(0).cast("long"), F.lit(7).cast("long"))
        ).alias("rep")
        docs = docs.select("doc_id", "text", rep).select(
            (F.col("doc_id") + F.col("rep") * F.lit(10_000_000)).alias(
                "doc_id"
            ),
            "text",
        ).persist(StorageLevel.MEMORY_AND_DISK)
        n_in = docs.count()
        t0 = time.time()
        n_out = tfidf_top_terms(docs, k=5).count()
        sec = time.time() - t0
    elif op == "neighbor_sample":
        from __spark_entry__ import load_edges
        from distributed_graph_analytics_spark.operators.sampling import (
            neighbor_sample,
        )

        edges = load_edges(spark, sf_dir).persist(StorageLevel.MEMORY_AND_DISK)
        n_in = edges.count()
        seeds = (
            edges.select(F.col("src").alias("id")).distinct().limit(2000)
        )
        t0 = time.time()
        n_out = neighbor_sample(
            edges, seeds, fanouts=[8, 4], seed=42
        ).count()
        sec = time.time() - t0
    elif op in ("kcore", "kcore_x8"):
        from distributed_graph_analytics_spark.operators.kcore import (
            core_numbers,
        )
        from tools._scaling_worker import replicated_edges

        rep = 8 if op.endswith("_x8") else 1
        edges = replicated_edges(spark, sf_dir, rep).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        n_in = edges.count()
        t0 = time.time()
        # auto = gather tier at sf0.1 (round-4 kernel); 38 supersteps
        res, _ = core_numbers(edges, edges_canonical=True)
        n_out = res.count()
        sec = time.time() - t0
    elif op == "hits_x8":
        from distributed_graph_analytics_spark.operators.hits import hits
        from tools._scaling_worker import replicated_edges

        edges = replicated_edges(spark, sf_dir, 8).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        n_in = edges.count()
        t0 = time.time()
        n_out = hits(edges, iterations=10).count()
        sec = time.time() - t0
    elif op in ("louvain", "louvain_x8"):
        from distributed_graph_analytics_spark.operators.louvain import louvain
        from tools._scaling_worker import replicated_edges

        rep = 8 if op.endswith("_x8") else 1
        edges = replicated_edges(spark, sf_dir, rep).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        n_in = edges.count()
        t0 = time.time()
        # the driver-query configuration (reference CLI defaults):
        # multi-level to Q-halt; level-0 move cycles dominate
        res = louvain(edges, min_progress=2000, progress_counter=1)
        n_out = res.final.count()
        sec = time.time() - t0
    elif op in ("hbse", "hbse_x8"):
        from distributed_graph_analytics_spark.operators.hbse import hbse
        from tools._scaling_worker import replicated_edges

        rep = 8 if op.endswith("_x8") else 1
        edges = replicated_edges(spark, sf_dir, rep).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        n_in = edges.count()
        t0 = time.time()
        # driver-query configuration: one deterministic 64-pivot batch
        # (budget-capped approximation); per-pivot Brandes dominates
        btwn, _top, _ = hbse(
            edges, k=10, pivot_batch_size=64, pivot_budget=64
        )
        n_out = btwn.count()
        sec = time.time() - t0
    else:
        raise ValueError(op)
    print(
        json.dumps(
            {
                "op": op,
                "cpus": cpus,
                "rows_in": n_in,
                "rows_out": n_out,
                "sec": round(sec, 2),
            }
        )
    )
    spark.stop()


def run_leg(op: str, cpus: int) -> dict:
    pin = os.environ.get("SPARK_GRAFT_PIN", "0") == "1"
    # SPARK_GRAFT_PIN_BASE offsets the pinned core range so op probes
    # can run beside another pinned experiment (e.g. the headline
    # campaign on cores 0-3) without sharing cores; DRAM stays shared
    # (both probe legs interleave in the same regime, so the ratio is
    # still like-for-like)
    base = int(os.environ.get("SPARK_GRAFT_PIN_BASE", "0"))
    cmd = [sys.executable, os.path.abspath(__file__), "--worker", op, str(cpus)]
    if pin:
        cmd = ["taskset", "-c", f"{base}-{base + cpus - 1}"] + cmd
    out = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO)
    if out.returncode != 0:
        raise RuntimeError(f"worker failed ({op}, {cpus}):\n{out.stderr[-2000:]}")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> dict:
    n_small = int(os.environ.get("SPARK_GRAFT_N", "1"))
    n_big = 4 * n_small
    repeats = int(os.environ.get("SPARK_GRAFT_OP_REPEATS", "2"))
    # subset via SPARK_GRAFT_OPS=a,b — prior ops' recorded results are
    # preserved (merged from the existing JSON), so probing new ops
    # never discards committed evidence
    ops = tuple(
        o for o in os.environ.get("SPARK_GRAFT_OPS", ",".join(OPS)).split(",")
        if o
    )
    results: dict[str, dict] = {}
    try:
        with open(os.path.join(REPO, "BENCH", "op_scaling.json")) as f:
            results.update(json.load(f).get("ops", {}))
    except (FileNotFoundError, json.JSONDecodeError):
        pass
    for op in ops:
        legs: dict[int, list] = {n_small: [], n_big: []}
        detail = {}
        for _ in range(repeats):
            # interleaved legs, same noise regime (see bench_scaling.py)
            for cpus in (n_small, n_big):
                r = run_leg(op, cpus)
                legs[cpus].append(r["sec"])
                detail[cpus] = r
                print(json.dumps({"op": op, "leg_done": cpus,
                                  "sec": r["sec"]}),
                      file=sys.stderr, flush=True)
        t_n, t_4n = min(legs[n_small]), min(legs[n_big])
        results[op] = {
            "rows_in": detail[n_small]["rows_in"],
            "rows_out": detail[n_small]["rows_out"],
            "t_n_sec": t_n,
            "t_4n_sec": t_4n,
            "all_runs_n": legs[n_small],
            "all_runs_4n": legs[n_big],
            "efficiency": round(t_n / (4.0 * t_4n), 3),
        }
    summary = {
        "metric": "per-operator scaling efficiency, N to 4N cores",
        "n_cores": n_small,
        "n4_cores": n_big,
        "pinned": os.environ.get("SPARK_GRAFT_PIN", "0") == "1",
        "ops": results,
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "op_scaling.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        _worker(sys.argv[2], int(sys.argv[3]))
    else:
        main()
