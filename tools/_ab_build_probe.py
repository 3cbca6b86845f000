"""Within-JVM A/B probe for the adjacency BUILD phase (the scaling gap
per BENCH/BASELINE.md round-2 decomposition: WCC supersteps scale 0.96,
builds 0.55-0.67).

Variants, alternated in one JVM (cross-JVM wall clock is meaningless on
this host — 3.4x noise):

  v0  current build: repartition(n_part, key) -> groupBy(key)
      collect_list -> chunk-slice -> localCheckpoint(aqe_off);
      objectHashAggregate fallbackThreshold at its 128-key default, so
      the pack degrades to SORT-based aggregation (sorts rows/p per
      partition).
  v1  v0 + fallbackThreshold raised so the pack stays hash-based.
  v2  groupBy-driven exchange (no explicit repartition): map-side
      PARTIAL collect_list packs per-input-partition arrays, the
      shuffle moves packed partial buffers (~8B/neighbor) instead of
      flat 32B rows, final merge concatenates. Threshold raised.

Prints per-run seconds and the localCheckpoint'ed outputPartitioning
(must stay hashpartitioning(key, n_part) for the superstep no-exchange
invariant).

Usage: SPARK_GRAFT_CPUS=4 SPARK_GRAFT_REPLICATE=32 python tools/_ab_build_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark import StorageLevel
from pyspark.sql import functions as F

THRESHOLD_KEY = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "4"))
    replicate = int(os.environ.get("SPARK_GRAFT_REPLICATE", "32"))
    rounds = int(os.environ.get("AB_ROUNDS", "2"))
    shape = os.environ.get("AB_SHAPE", "both")  # pr | wcc | both
    variants = os.environ.get("AB_VARIANTS", "v0,v1,v2").split(",")

    from distributed_graph_analytics_spark.session import get_spark
    from distributed_graph_analytics_spark.operators.pagerank import _chunked
    from distributed_graph_analytics_spark.plans.iteration import aqe_off
    from _scaling_worker import replicated_edges

    spark = get_spark(
        f"ab-build-{cpus}", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")
    n_part = cpus
    default_threshold = spark.conf.get(THRESHOLD_KEY)
    print(f"default {THRESHOLD_KEY} = {default_threshold}", flush=True)

    edges = replicated_edges(spark, sf_dir, replicate).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    print(f"edges = {edges.count():,}", flush=True)

    def flat(sym: bool):
        if not sym:
            return edges.select("src", "dst"), "src", "dst"
        return (
            edges.select(F.col("src").alias("v"), F.col("dst").alias("u")).union(
                edges.select(F.col("dst").alias("v"), F.col("src").alias("u"))
            ),
            "v",
            "u",
        )

    def build(variant: str, sym: bool):
        rows, key, val = flat(sym)
        if variant != "v0":
            spark.conf.set(THRESHOLD_KEY, str(1 << 22))
        else:
            spark.conf.set(THRESHOLD_KEY, default_threshold)
        if variant in ("v0", "v1"):
            rows = rows.repartition(n_part, key)
        packed = (
            rows.groupBy(key)
            .agg(F.collect_list(val).alias("all_vals"))
            .select(key, F.explode(_chunked("all_vals")).alias("vals"))
        )
        t0 = time.time()
        with aqe_off(spark):
            out = packed.localCheckpoint(eager=True)
        sec = time.time() - t0
        part = out._jdf.queryExecution().executedPlan().outputPartitioning()
        n_rows = out.count()
        spark.conf.set(THRESHOLD_KEY, default_threshold)
        return sec, n_rows, str(part), out

    shapes = {"pr": [False], "wcc": [True], "both": [False, True]}[shape]
    for sym in shapes:
        label = "wcc-sym" if sym else "pr-out"
        for rnd in range(rounds):
            for variant in variants:
                sec, n_rows, part, out = build(variant, sym)
                print(
                    f"{label} {variant}#{rnd}: {sec:.1f}s rows={n_rows:,} "
                    f"partitioning={part[:80]}",
                    flush=True,
                )
                # free the checkpoint blocks before the next run
                out._jdf.rdd().unpersist(False)
                spark._jvm.System.gc()
    spark.stop()


if __name__ == "__main__":
    main()
