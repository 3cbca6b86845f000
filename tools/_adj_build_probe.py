"""Decompose the PageRank adjacency-build cost (the lazy first-superstep
materialization): times each sub-plan and prints the physical plan of
the full build."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark import StorageLevel
from pyspark.sql import functions as F


def t(label, df, action="count"):
    t0 = time.time()
    n = df.count() if action == "count" else df.write.format("noop").mode("overwrite").save()
    print(f"{label}: {time.time() - t0:.1f}s (rows={n})", flush=True)
    return n


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "4"))
    replicate = int(os.environ.get("SPARK_GRAFT_REPLICATE", "32"))

    from distributed_graph_analytics_spark.session import get_spark
    from distributed_graph_analytics_spark.operators.pagerank import ADJ_CHUNK
    from _scaling_worker import replicated_edges

    spark = get_spark(f"adj-probe-{cpus}", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    n_part = cpus

    edges = replicated_edges(spark, sf_dir, replicate).persist(StorageLevel.MEMORY_AND_DISK)
    t("edges persist+count", edges)
    t("edges recount (cached)", edges)

    e_parted = edges.select("src", "dst").repartition(n_part, "src")
    out_deg = e_parted.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    t("out_deg", out_deg)

    joined = e_parted.join(out_deg.hint("shuffle_hash"), "src")
    t("join only", joined)

    adj = (
        joined.withColumn(
            "chunk",
            F.pmod(
                F.xxhash64("dst"),
                F.greatest((F.col("out_deg") / F.lit(ADJ_CHUNK)).cast("long") + 1, F.lit(1)),
            ),
        )
        .groupBy("src", "chunk", "out_deg")
        .agg(F.collect_list("dst").alias("dsts"))
        .select("src", "dsts", (F.lit(1.0) / F.col("out_deg")).alias("inv_deg"))
    )
    t("adj groupBy collect_list (no repartition/persist)", adj)
    adj2 = adj.repartition(n_part, "src").persist(StorageLevel.MEMORY_AND_DISK)
    t("adj repartition+persist", adj2)
    t("adj recount (cached)", adj2)
    adj2.explain("formatted")
    spark.stop()


if __name__ == "__main__":
    main()
