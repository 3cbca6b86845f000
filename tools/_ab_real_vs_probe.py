"""Within-one-JVM comparison: real operators.pagerank() vs the inline
probe superstep at the same scale/cores — separates code-path effects
from the host's time-varying performance."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark import StorageLevel
from pyspark.sql import functions as F


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "4"))
    replicate = int(os.environ.get("SPARK_GRAFT_REPLICATE", "32"))

    from distributed_graph_analytics_spark.session import get_spark
    from distributed_graph_analytics_spark.operators.pagerank import pagerank
    from _scaling_worker import replicated_edges

    parts = int(os.environ.get("AB_PARTS", str(cpus)))
    spark = get_spark(f"ab-real-{cpus}", master=f"local[{cpus}]", shuffle_partitions=parts)
    spark.sparkContext.setLogLevel("ERROR")

    edges = replicated_edges(spark, sf_dir, replicate).persist(StorageLevel.MEMORY_AND_DISK)
    edges.count()

    for rnd in range(2):
        t0 = time.time()
        ranks, st = pagerank(edges, max_iterations=6)
        ranks.count()
        wall = time.time() - t0
        iters = [h["sec"] for h in st.history]
        print(
            f"real#{rnd}: wall={wall:.1f}s iters={iters} "
            f"(sum={sum(iters):.1f}, build={wall - sum(iters):.1f})",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
