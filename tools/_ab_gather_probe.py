"""Probe: broadcast-gather superstep kernel vs the recorded shuffle-join
kernel, at the x64 evidence scale.

The candidate kernel is the north star's *broadcast* arm taken to its
vectorized conclusion (the MLlib gradient-descent shape): the O(|V|)
vertex-state vector is broadcast each superstep, the O(|E|) in-adjacency
stays partitioned and is streamed through a mapInArrow numpy gather
(zero per-superstep shuffle), and the O(|V|) partial sums come back to
the driver through one Arrow collect. Applicable when 8*|V| bytes fit a
broadcast (tier-gated); the shuffle-join kernel remains the large-|V|
tier.

Run pinned, one core count per process, like the scaling worker:
  taskset -c 0-3 python tools/_ab_gather_probe.py   (SPARK_GRAFT_CPUS=4)
  taskset -c 0   python tools/_ab_gather_probe.py   (SPARK_GRAFT_CPUS=1)

Prints one JSON line: build seconds, per-iteration gather seconds for
PR (6 iters) and WCC (4 iters), plus JVM GC-time deltas per phase.
Compare against BENCH/scaling_result.json phase records (fresh-JVM
campaign legs: 4-core pr_steps 8.5 s/iter, wcc_steps 16.8 s/iter;
1-core 27 / 42.5 s/iter).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
from pyspark import StorageLevel
from pyspark.sql import functions as F


def gc_millis(spark) -> int:
    beans = (
        spark.sparkContext._jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
    )
    total = 0
    it = beans.iterator()
    while it.hasNext():
        total += it.next().getCollectionTime()
    return int(total)


def main():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "4"))
    replicate = int(os.environ.get("SPARK_GRAFT_REPLICATE", "64"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    mult = int(os.environ.get("SPARK_GRAFT_PART_MULT", "3"))
    pr_iters = int(os.environ.get("AB_PR_ITERS", "6"))
    wcc_iters = int(os.environ.get("AB_WCC_ITERS", "4"))

    from distributed_graph_analytics_spark.session import get_spark
    from distributed_graph_analytics_spark.plans.iteration import aqe_off, hash_agg_pack
    from tools._scaling_worker import replicated_edges

    n_part = mult * cpus
    spark = get_spark(
        f"gather-probe-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=n_part,
        extra_conf={"spark.sql.execution.arrow.maxRecordsPerBatch": "32768"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    edges = replicated_edges(spark, sf_dir, replicate).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    n_edges = edges.count()
    report = {"cpus": cpus, "edges": n_edges}

    # ---- build: dense id dictionary + int32 packed in-adjacency ----
    gc0, t0 = gc_millis(spark), time.time()
    ids = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    # dense numbering without a global sort: zipWithIndex = one count
    # job + one map — scale-shaped (no single-partition window)
    dict_df = (
        ids.rdd.map(lambda r: r[0])
        .zipWithIndex()
        .toDF(["id", "cid"])
        .select("id", F.col("cid").cast("int").alias("cid"))
    )
    dict_df = dict_df.persist(StorageLevel.MEMORY_AND_DISK)
    n = dict_df.count()
    sdict = dict_df.select(F.col("id").alias("src"), F.col("cid").alias("scid"))
    ddict = dict_df.select(F.col("id").alias("dst"), F.col("cid").alias("dcid"))
    edges_c = (
        edges.join(F.broadcast(sdict), "src")
        .join(F.broadcast(ddict), "dst")
        .select("scid", "dcid")
    )
    in_adj = (
        edges_c.repartition(n_part, "dcid")
        .groupBy("dcid")
        .agg(F.collect_list("scid").alias("srcs"))
    )
    with aqe_off(spark), hash_agg_pack(spark):
        in_adj = in_adj.localCheckpoint(eager=True)
    # out-degree vector + original-id vector, one small collect each
    deg_pdf = edges_c.groupBy("scid").count().toPandas()
    out_deg = np.zeros(n, dtype=np.float64)
    out_deg[deg_pdf["scid"].to_numpy()] = deg_pdf["count"].to_numpy()
    ids_pdf = dict_df.toPandas()
    orig_id = np.zeros(n, dtype=np.int64)
    orig_id[ids_pdf["cid"].to_numpy()] = ids_pdf["id"].to_numpy()
    report["pr_build_sec"] = round(time.time() - t0, 2)
    report["pr_build_gc_ms"] = gc_millis(spark) - gc0
    report["vertices"] = int(n)

    # ---- PR gather iterations ----
    def pr_gather(w_bc):
        def fn(batches):
            w = w_bc.value
            for batch in batches:
                dst = batch.column(0)
                srcs = batch.column(1)
                flat = srcs.flatten().to_numpy(zero_copy_only=False)
                lengths = pa.compute.list_value_length(srcs).to_numpy(
                    zero_copy_only=False
                )
                starts = np.zeros(len(lengths), dtype=np.int64)
                np.cumsum(lengths[:-1], out=starts[1:])
                vals = w[flat]
                if len(vals):
                    sums = np.add.reduceat(vals, np.minimum(starts, len(vals) - 1))
                    sums[lengths == 0] = 0.0
                else:
                    sums = np.zeros(len(lengths), dtype=np.float64)
                yield pa.RecordBatch.from_arrays(
                    [dst, pa.array(sums, type=pa.float64())], ["dcid", "s"]
                )

        return fn

    damping, n_f = 0.85, float(n)
    teleport = (1.0 - damping) / n_f
    rank = np.full(n, 1.0 / n_f)
    inv_deg = np.where(out_deg > 0, 1.0 / np.maximum(out_deg, 1.0), 0.0)
    gc0 = gc_millis(spark)
    pr_secs = []
    for i in range(pr_iters):
        t0 = time.time()
        w_bc = sc.broadcast(rank * inv_deg)
        msg_pdf = in_adj.mapInArrow(pr_gather(w_bc), "dcid int, s double").toPandas()
        msg = np.zeros(n, dtype=np.float64)
        np.add.at(msg, msg_pdf["dcid"].to_numpy(), msg_pdf["s"].to_numpy())
        new_rank = teleport + damping * msg
        max_delta = float(np.max(np.abs(new_rank - rank) / rank))
        rank = new_rank
        w_bc.destroy()
        pr_secs.append(round(time.time() - t0, 2))
    report["pr_iter_secs"] = pr_secs
    report["pr_gc_ms"] = gc_millis(spark) - gc0
    report["pr_max_delta_last"] = max_delta
    report["pr_rank_sample"] = float(rank[:5].sum())

    # ---- WCC build: symmetric int32 packed adjacency ----
    gc0, t0 = gc_millis(spark), time.time()
    sym = edges_c.select(F.col("scid").alias("v"), F.col("dcid").alias("u")).union(
        edges_c.select(F.col("dcid").alias("v"), F.col("scid").alias("u"))
    )
    sym_adj = (
        sym.repartition(n_part, "v").groupBy("v").agg(F.collect_list("u").alias("srcs"))
    )
    with aqe_off(spark), hash_agg_pack(spark):
        sym_adj = sym_adj.localCheckpoint(eager=True)
    report["wcc_build_sec"] = round(time.time() - t0, 2)
    report["wcc_build_gc_ms"] = gc_millis(spark) - gc0

    def wcc_gather(w_bc):
        def fn(batches):
            w = w_bc.value
            for batch in batches:
                v = batch.column(0)
                srcs = batch.column(1)
                flat = srcs.flatten().to_numpy(zero_copy_only=False)
                lengths = pa.compute.list_value_length(srcs).to_numpy(
                    zero_copy_only=False
                )
                starts = np.zeros(len(lengths), dtype=np.int64)
                np.cumsum(lengths[:-1], out=starts[1:])
                vals = w[flat]
                if len(vals):
                    cand = np.maximum.reduceat(vals, np.minimum(starts, len(vals) - 1))
                    cand[lengths == 0] = np.iinfo(np.int64).min
                else:
                    cand = np.full(len(lengths), np.iinfo(np.int64).min)
                yield pa.RecordBatch.from_arrays(
                    [v, pa.array(cand, type=pa.int64())], ["v", "cand"]
                )

        return fn

    labels = orig_id.copy()
    gc0 = gc_millis(spark)
    wcc_secs, changed_hist = [], []
    for i in range(wcc_iters):
        t0 = time.time()
        w_bc = sc.broadcast(labels)
        cand_pdf = sym_adj.mapInArrow(wcc_gather(w_bc), "v int, cand long").toPandas()
        cand = np.full(n, np.iinfo(np.int64).min, dtype=np.int64)
        np.maximum.at(cand, cand_pdf["v"].to_numpy(), cand_pdf["cand"].to_numpy())
        new_labels = np.maximum(labels, cand)
        changed = int(np.count_nonzero(new_labels != labels))
        labels = new_labels
        w_bc.destroy()
        wcc_secs.append(round(time.time() - t0, 2))
        changed_hist.append(changed)
    report["wcc_iter_secs"] = wcc_secs
    report["wcc_gc_ms"] = gc_millis(spark) - gc0
    report["wcc_changed_hist"] = changed_hist
    report["wcc_components"] = int(np.unique(labels).size)

    print(json.dumps(report), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
