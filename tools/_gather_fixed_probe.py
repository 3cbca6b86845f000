"""Probe: decompose the gather tier's per-superstep and build fixed
costs at one core count (the exploratory v3 pair measured ~1.15 s/iter
of PR fixed cost and ~40 s of build fixed cost at 4 cores — this probe
finds which component owns them).

Phases timed (all within one JVM, same graph):
  build.ids        distinct + driver sort (GatherGraph.build)
  build.in_adj     encode+bucket+exchange+merge+localCheckpoint
  build.out_deg    bincount pass
  iter.df          6 supersteps through the DataFrame mapInArrow path,
                   decomposed into [broadcast, job+toPandas, merge]
  iter.dummy       6 supersteps against a 1-chunk dummy adjacency with
                   the SAME broadcast vector: pure per-job overhead
                   (Catalyst planning + scheduling + broadcast ship)
  iter.rdd         6 supersteps over a cached Python RDD of the same
                   blobs via mapPartitions (no Catalyst, no Arrow
                   bridge) — the candidate fixed-cost fix

Run pinned:  taskset -c 0-3 SPARK_GRAFT_CPUS=4 python tools/_gather_fixed_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from pyspark import StorageLevel


def main():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "4"))
    replicate = int(os.environ.get("SPARK_GRAFT_REPLICATE", "64"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    mult = int(os.environ.get("SPARK_GRAFT_PART_MULT", "3"))
    iters = int(os.environ.get("PROBE_ITERS", "6"))

    from distributed_graph_analytics_spark.session import get_spark
    from distributed_graph_analytics_spark.plans import gather as G
    from tools._scaling_worker import replicated_edges

    n_part = mult * cpus
    spark = get_spark(
        f"gather-fixed-probe-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=n_part,
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    edges = replicated_edges(spark, sf_dir, replicate).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    n_edges = edges.count()
    report = {"cpus": cpus, "edges": n_edges, "n_part": n_part}

    t0 = time.time()
    g = G.GatherGraph.build(edges)
    report["build_ids_sec"] = round(time.time() - t0, 2)
    report["vertices"] = g.n

    t0 = time.time()
    in_adj = g.in_adjacency(n_part)
    report["build_in_adj_sec"] = round(time.time() - t0, 2)

    t0 = time.time()
    out_deg = g.out_degree(n_part)
    report["build_out_deg_sec"] = round(time.time() - t0, 2)

    inv_deg = np.where(out_deg > 0, 1.0 / np.maximum(out_deg, 1.0), 0.0)
    n = g.n
    rank = np.full(n, 1.0 / n, dtype=np.float64)

    # --- DataFrame path, decomposed ---
    df_iters = []
    for _ in range(iters):
        t0 = time.time()
        w = rank * inv_deg
        w_bc = sc.broadcast(w)
        t1 = time.time()
        with G.arrow_batch(spark, G.BLOB_BATCH_ROWS):
            pdf = in_adj.mapInArrow(
                G._sum_reduce(w_bc, np.float64), "kb binary, rb binary"
            ).toPandas()
        t2 = time.time()
        msg = np.zeros(n, dtype=np.float64)
        for kb, rb in zip(pdf["kb"], pdf["rb"]):
            np.add.at(
                msg, np.frombuffer(kb, dtype=np.int32), np.frombuffer(rb, dtype=np.float64)
            )
        t3 = time.time()
        w_bc.destroy()
        df_iters.append(
            [round(t1 - t0, 3), round(t2 - t1, 3), round(t3 - t2, 3), round(time.time() - t3, 3)]
        )
    report["df_iter_bc_job_merge_destroy"] = df_iters

    # --- dummy adjacency (1 chunk): pure per-job overhead ---
    dummy_k = np.zeros(8, dtype=np.int32).tobytes()
    dummy_v = np.zeros(8, dtype=np.int32).tobytes()
    dummy = spark.createDataFrame([(dummy_k, dummy_v)], "kb binary, vb binary")
    dummy = dummy.localCheckpoint(eager=True)
    dummy_iters = []
    for _ in range(iters):
        t0 = time.time()
        w_bc = sc.broadcast(rank * inv_deg)
        t1 = time.time()
        with G.arrow_batch(spark, G.BLOB_BATCH_ROWS):
            dummy.mapInArrow(
                G._sum_reduce(w_bc, np.float64), "kb binary, rb binary"
            ).toPandas()
        t2 = time.time()
        w_bc.destroy()
        dummy_iters.append([round(t1 - t0, 3), round(t2 - t1, 3)])
    report["dummy_iter_bc_job"] = dummy_iters

    # --- RDD path: cached blob tuples, mapPartitions kernel ---
    t0 = time.time()
    blob_rdd = in_adj.rdd.map(lambda r: (bytes(r[0]), bytes(r[1]))).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    n_rows = blob_rdd.count()
    report["rdd_materialize_sec"] = round(time.time() - t0, 2)
    report["rdd_rows"] = n_rows

    def rdd_kernel(w_bc):
        def fn(it):
            w = w_bc.value
            ks, vs = [], []
            for kb, vb in it:
                ks.append(np.frombuffer(kb, dtype=np.int32))
                vs.append(np.frombuffer(vb, dtype=np.int32))
            if not ks:
                return
            k = np.concatenate(ks) if len(ks) > 1 else ks[0]
            v = np.concatenate(vs) if len(vs) > 1 else vs[0]
            starts = np.flatnonzero(k[1:] != k[:-1]) + 1
            starts = np.concatenate((np.zeros(1, dtype=np.int64), starts))
            out = np.add.reduceat(w[v], starts)
            yield (k[starts].tobytes(), out.tobytes())

        return fn

    rdd_iters = []
    for _ in range(iters):
        t0 = time.time()
        w_bc = sc.broadcast(rank * inv_deg)
        t1 = time.time()
        parts = blob_rdd.mapPartitions(rdd_kernel(w_bc)).collect()
        t2 = time.time()
        msg = np.zeros(n, dtype=np.float64)
        for kb, rb in parts:
            np.add.at(
                msg, np.frombuffer(kb, dtype=np.int32), np.frombuffer(rb, dtype=np.float64)
            )
        t3 = time.time()
        w_bc.destroy()
        rdd_iters.append(
            [round(t1 - t0, 3), round(t2 - t1, 3), round(t3 - t2, 3)]
        )
    report["rdd_iter_bc_job_merge"] = rdd_iters

    print(json.dumps(report), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
