"""Substrate-ceiling microbenchmark (BENCH/BASELINE.md decomposition):
1-core vs 4-core efficiency of a pure sequential scan+sum over a cached
400M-row table — no shuffle, no join, fixed 8 partitions. On a single
box this bounds ANY job's N->4N efficiency from above; the recorded
graph job's gap below this number is the random-access (hash-agg /
hash-join / shared-GC) penalty that a real multi-node cluster does not
share. Prints one JSON line."""

from __future__ import annotations

import json
import time

from pyspark import StorageLevel
from pyspark.sql import functions as F


def main():
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from distributed_graph_analytics_spark.session import get_spark

    res = {}
    for cores in (1, 4):
        spark = get_spark(
            f"membw{cores}",
            master=f"local[{cores}]",
            shuffle_partitions=8,
            extra_conf={"spark.driver.memory": "24g"},
        )
        spark.sparkContext.setLogLevel("ERROR")
        df = (
            spark.range(0, 400_000_000, 1, 8)
            .select(F.col("id"), (F.col("id") * 3 + 1).alias("x"))
            .persist(StorageLevel.MEMORY_ONLY)
        )
        df.count()
        df.agg(F.sum(F.col("id").bitwiseXOR(F.col("x")))).first()  # warm
        t0 = time.time()
        for _ in range(3):
            df.agg(F.sum(F.col("id").bitwiseXOR(F.col("x")))).first()
        res[cores] = (time.time() - t0) / 3
        spark.stop()
    out = {
        "metric": "pure sequential scan+sum, 1 vs 4 cores (substrate ceiling)",
        "sec_1core": round(res[1], 2),
        "sec_4core": round(res[4], 2),
        "efficiency_1_to_4": round(res[1] / (4 * res[4]), 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
