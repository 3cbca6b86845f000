"""One instrumented PageRank (or WCC) run for scaling diagnosis
(invoked pinned via taskset). Prints one JSON line with wall time plus
aggregate executor metrics from the Spark status REST API, so the
N->4N efficiency loss can be split into
  - task-time inflation (contention: memory bandwidth, LLC, GC), and
  - idle time (sum(cores*wall) - sum(task time): scheduling gaps,
    stage tails / stragglers, driver-serial work).

Env: PROF_CPUS, PROF_REPLICATE, PROF_PARTS (shuffle partitions;
default = cpus), PROF_OP (pr|wcc), SPARK_GRAFT_SF_DIR.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark import StorageLevel
from pyspark.sql import functions as F


def rest(url):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("PROF_CPUS", "4"))
    replicate = int(os.environ.get("PROF_REPLICATE", "8"))
    parts = int(os.environ.get("PROF_PARTS", str(cpus)))
    op = os.environ.get("PROF_OP", "pr")

    from distributed_graph_analytics_spark.session import get_spark
    from tools._scaling_worker import replicated_edges

    extra = {"spark.ui.enabled": "true"}
    for kv in os.environ.get("PROF_CONF", "").split(";"):
        if "=" in kv:
            k, v = kv.split("=", 1)
            extra[k] = v
    spark = get_spark(
        f"prof-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=parts,
        extra_conf=extra,
    )
    spark.sparkContext.setLogLevel("ERROR")

    edges = replicated_edges(spark, sf_dir, replicate).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    n_edges = edges.count()

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    def snapshot():
        stages = rest(f"{ui}/api/v1/applications/{app_id}/stages?status=complete")
        tot = {
            "executorRunTime_s": 0.0,
            "executorCpuTime_s": 0.0,
            "jvmGcTime_s": 0.0,
            "shuffleWriteBytes": 0,
            "shuffleReadBytes": 0,
            "executorDeserializeTime_s": 0.0,
            "resultSerializationTime_s": 0.0,
            "num_stages": len(stages),
            "num_tasks": 0,
        }
        for s in stages:
            tot["executorRunTime_s"] += s.get("executorRunTime", 0) / 1e3
            tot["executorCpuTime_s"] += s.get("executorCpuTime", 0) / 1e9
            tot["jvmGcTime_s"] += s.get("jvmGcTime", 0) / 1e3
            tot["shuffleWriteBytes"] += s.get("shuffleWriteBytes", 0)
            tot["shuffleReadBytes"] += s.get("shuffleReadBytes", 0)
            tot["executorDeserializeTime_s"] += (
                s.get("executorDeserializeTime", 0) / 1e3
            )
            tot["resultSerializationTime_s"] += (
                s.get("resultSerializationTime", 0) / 1e3
            )
            tot["num_tasks"] += s.get("numCompleteTasks", 0)
        return tot

    def stage_dump():
        stages = rest(f"{ui}/api/v1/applications/{app_id}/stages?status=complete")
        return {
            s["stageId"]: {
                "name": s.get("name", "")[:60],
                "run_s": round(s.get("executorRunTime", 0) / 1e3, 2),
                "cpu_s": round(s.get("executorCpuTime", 0) / 1e9, 2),
                "gc_s": round(s.get("jvmGcTime", 0) / 1e3, 2),
                "tasks": s.get("numCompleteTasks", 0),
                "in_b": s.get("inputBytes", 0),
                "sw_b": s.get("shuffleWriteBytes", 0),
                "sr_b": s.get("shuffleReadBytes", 0),
            }
            for s in stages
        }

    before = snapshot()
    before_ids = set(stage_dump())
    t0 = time.time()
    if op == "pr":
        from distributed_graph_analytics_spark.operators.pagerank import pagerank

        out, stats = pagerank(edges)
    else:
        from distributed_graph_analytics_spark.operators.wcc import (
            weakly_connected_components,
        )

        out, stats = weakly_connected_components(edges, edges_canonical=True)
    out.count()
    wall = time.time() - t0

    after = snapshot()
    dump_path = os.environ.get("PROF_STAGE_DUMP")
    if dump_path:
        sd = {k: v for k, v in stage_dump().items() if k not in before_ids}
        with open(dump_path, "w") as f:
            json.dump(sd, f, indent=1)
    tot = {}
    for k, v in after.items():
        if k == "num_stages":
            tot[k] = v - before[k]
        else:
            tot[k] = round(v - before[k], 2) if isinstance(v, float) else v - before[k]

    print(
        json.dumps(
            {
                "op": op,
                "cpus": cpus,
                "parts": parts,
                "edges": n_edges,
                "wall_s": round(wall, 2),
                "iters": stats.iterations,
                "core_seconds": round(wall * cpus, 1),
                "idle_s": round(wall * cpus - tot["executorRunTime_s"], 1),
                **tot,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
