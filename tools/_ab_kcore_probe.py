"""Within-JVM kcore frontier probe (VERDICT r2 item 2 'done' check):
per-superstep wall seconds vs the dirty-receiver count
(stats.history[i]['recomputed']) on a real testdata graph, one JVM —
shows superstep cost TRACKS the shrinking frontier instead of staying
flat at the 2|E| full-explode cost of the round-2 kernel.

Usage: [taskset -c ...] python tools/_ab_kcore_probe.py [sf_dir] [cpus]
Prints one JSON line: per-superstep (recomputed, sec) plus a
front/back-half summary (mean sec over supersteps where the frontier
is >50% of vertices vs <10%).
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> dict:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    from __spark_entry__ import load_edges
    from distributed_graph_analytics_spark.operators.kcore import core_numbers
    from distributed_graph_analytics_spark.session import get_spark

    spark = get_spark(
        "kcore-frontier-probe", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")
    edges = load_edges(spark, sf_dir)
    cores, stats = core_numbers(edges, edges_canonical=True)
    n_vertices = cores.count()

    steps = [
        {"i": i + 1, "recomputed": h["recomputed"], "sec": h["sec"]}
        for i, h in enumerate(stats.history)
    ]
    big = [s["sec"] for s in steps if s["recomputed"] > 0.5 * n_vertices]
    small = [s["sec"] for s in steps if s["recomputed"] < 0.1 * n_vertices]
    result = {
        "sf_dir": sf_dir,
        "cpus": cpus,
        "vertices": n_vertices,
        "iterations": stats.iterations,
        "steps": steps,
        "mean_sec_frontier_gt50pct": round(sum(big) / len(big), 3) if big else None,
        "mean_sec_frontier_lt10pct": round(sum(small) / len(small), 3)
        if small
        else None,
    }
    spark.stop()
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
