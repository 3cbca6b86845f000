"""Within-JVM A/B probe: compact_ids (int-packed neighbor arrays) vs
the default long arrays on the REAL build paths
(wcc.build_sym_adjacency / pagerank.build_out_adjacency), at the
scaling-evidence replicate (x64 = 76.5M edges) where the 4-core leg is
DRAM-bandwidth-bound. Round 2 probed this at 38M edges and read
within-noise; this is the x64 data point that decides whether a
round-4 kernel campaign (compact_ids default ON, fresh accumulated
samples) is worth its cost.

Variants alternate in ONE JVM (cross-JVM wall clock is meaningless on
this host). Measures the localCheckpoint-materialized build, the same
quantity the scaling decomposition calls pr_build/wcc_build.

Usage: SPARK_GRAFT_CPUS=4 SPARK_GRAFT_REPLICATE=64 AB_ROUNDS=2 \
       [taskset -c 0-3] python tools/_ab_compact_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark import StorageLevel


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "4"))
    replicate = int(os.environ.get("SPARK_GRAFT_REPLICATE", "64"))
    rounds = int(os.environ.get("AB_ROUNDS", "2"))
    shapes = {"pr": ("pr",), "wcc": ("wcc",), "both": ("pr", "wcc")}[
        os.environ.get("AB_SHAPE", "both")
    ]

    from _scaling_worker import replicated_edges

    from distributed_graph_analytics_spark.operators.pagerank import (
        build_out_adjacency,
    )
    from distributed_graph_analytics_spark.operators.wcc import build_sym_adjacency
    from distributed_graph_analytics_spark.plans.iteration import (
        aqe_off,
        hash_agg_pack,
    )
    from distributed_graph_analytics_spark.session import get_spark

    spark = get_spark(
        f"ab-compact-{cpus}", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")
    edges = replicated_edges(spark, sf_dir, replicate).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    print(f"edges = {edges.count():,}  cpus={cpus}", flush=True)

    def build(shape: str, compact: bool):
        if shape == "wcc":
            packed = build_sym_adjacency(
                edges, cpus, edges_canonical=True, compact_ids=compact
            )
        else:
            packed = build_out_adjacency(edges, cpus, compact_ids=compact)
        t0 = time.time()
        with aqe_off(spark), hash_agg_pack(spark):
            out = packed.localCheckpoint(eager=True)
        sec = time.time() - t0
        n = out.count()
        return sec, n, out

    for shape in shapes:
        for rnd in range(rounds):
            for compact in (False, True):
                sec, n, out = build(shape, compact)
                print(
                    f"{shape}_build compact={int(compact)}#{rnd}: "
                    f"{sec:.1f}s rows={n:,}",
                    flush=True,
                )
                out._jdf.rdd().unpersist(False)
                spark._jvm.System.gc()
    spark.stop()


if __name__ == "__main__":
    main()
