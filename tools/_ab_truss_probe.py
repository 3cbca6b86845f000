"""Within-JVM probe for the incremental k-truss peel (VERDICT r3
"What's wrong #2" done-criterion): per-round wall time + dropped-edge
count on one co-occurrence input. Round 1 pays the full degree-ordered
wedge enumeration; rounds 2+ must track the (shrinking) dropped-edge
set, not re-pay the full enumeration.

Usage: python tools/_ab_truss_probe.py  [env SPARK_GRAFT_SF_DIR,
SPARK_GRAFT_CPUS (default 8), SPARK_GRAFT_TRUSS_K (default 8)]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark import StorageLevel


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    k = int(os.environ.get("SPARK_GRAFT_TRUSS_K", "8"))

    from distributed_graph_analytics_spark.session import get_spark
    from distributed_graph_analytics_spark.operators.truss import k_truss
    from __spark_entry__ import load_edges

    spark = get_spark(
        f"dga-truss-probe-{cpus}", master=f"local[{cpus}]",
        shuffle_partitions=3 * cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")
    edges = load_edges(spark, sf_dir).persist(StorageLevel.MEMORY_AND_DISK)
    n_in = edges.count()
    stats: list = []
    t0 = time.time()
    n_out = k_truss(edges, k=k, rounds=6, _round_stats=stats).count()
    total = round(time.time() - t0, 2)
    print(json.dumps({
        "sf_dir": sf_dir, "cpus": cpus, "k": k, "edges_in": n_in,
        "edges_out": n_out, "total_sec": total, "rounds": stats,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
