"""Within-JVM probe: PR/WCC superstep seconds vs shuffle-partition count.

Hypothesis (round-2 leads, PR supersteps scale 0.64 vs WCC 0.96): with
`spark.sql.shuffle.partitions = cores`, each map-side partial-agg task
carries a hash map of ~|V| entries (~30 MB at 640k vertices) — L3-cache
resident when one task runs (the 1-core leg), but c concurrent copies
thrash the shared L3 at c cores. A FIXED partition count (independent
of cores) keeps per-task agg maps cache-sized at both legs, the way a
real job keeps its partitioning as executors scale.

Runs pagerank(max_iterations=K) at several num_partitions values in one
JVM (alternated) and prints per-iteration seconds.

Usage: SPARK_GRAFT_CPUS=4 SPARK_GRAFT_REPLICATE=32 AB_PARTS=4,16,4,16 \
       python tools/_ab_superstep_probe.py
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
    replicate = int(os.environ.get("SPARK_GRAFT_REPLICATE", "32"))
    parts = [int(p) for p in os.environ.get("AB_PARTS", "4,16,4,16").split(",")]
    iters = int(os.environ.get("AB_ITERS", "6"))
    algo = os.environ.get("AB_ALGO", "pr")  # pr | wcc

    from distributed_graph_analytics_spark.session import get_spark
    from distributed_graph_analytics_spark.operators.pagerank import pagerank
    from distributed_graph_analytics_spark.operators.wcc import (
        weakly_connected_components,
    )
    from _scaling_worker import replicated_edges

    spark = get_spark(
        f"ab-superstep-{cpus}", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")

    edges = replicated_edges(spark, sf_dir, replicate).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    print(f"edges = {edges.count():,}", flush=True)

    for n_part in parts:
        t0 = time.time()
        if algo == "pr":
            res, stats = pagerank(
                edges, max_iterations=iters, epsilon=0.0, num_partitions=n_part
            )
        else:
            res, stats = weakly_connected_components(
                edges, max_iterations=iters, num_partitions=n_part,
                edges_canonical=True,
            )
        total = time.time() - t0
        secs = [h["sec"] for h in stats.history]
        build = total - sum(secs)
        print(
            f"{algo} n_part={n_part}: build={build:.1f}s "
            f"iters={[round(s, 2) for s in secs]} "
            f"steady={sum(secs[1:]) / max(1, len(secs) - 1):.2f}s/iter",
            flush=True,
        )
        spark._jvm.System.gc()
    spark.stop()


if __name__ == "__main__":
    main()
