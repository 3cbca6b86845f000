"""Leaf Compression — iterative pruning of out-degree ≤ 1 vertices.

Semantics match the reference's GraphX core
(dga-graphx LeafCompressionCore.scala:36-47): attach out-degree
(parallel edges count separately — the graph is NOT pre-merged), drop
vertices with out-degree ∈ {0, 1} and edges whose source has
out-degree ∈ {0, 1} or whose endpoint was dropped, recurse until the
vertex count reaches a fixed point.

Spark-first design: the relation SHRINKS every iteration, so each pass
is a groupBy(src).count + two semi-joins over an ever-smaller edge
table; localCheckpoint truncates lineage so iteration k doesn't replay
k-1 prunes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark import StorageLevel

from distributed_graph_analytics_spark.plans.iteration import IterationStats, truncate
from distributed_graph_analytics_spark.sources.edges import vertices_of

import time


def leaf_compression(
    edges: DataFrame, max_iterations: int = 100
) -> tuple[DataFrame, DataFrame, IterationStats]:
    """Returns (surviving_vertices(id), surviving_edges(src,dst,weight), stats)."""
    t0 = time.time()
    stats = IterationStats()
    cur_edges = truncate(edges)
    cur_vertices = vertices_of(cur_edges).persist(StorageLevel.MEMORY_AND_DISK)
    n_vertices = cur_vertices.count()
    for i in range(1, max_iterations + 1):
        out_deg = cur_edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
        # vpred: out-degree not in {0,1}; vertices absent from out_deg have 0
        keep = (
            cur_vertices.join(out_deg, cur_vertices["id"] == out_deg["src"], "left_outer")
            .where(F.coalesce("deg", F.lit(0)) > 1)
            .select("id")
        )
        # subgraph: both endpoints must survive (epred src-degree filter is
        # implied by the src semi-join, since kept vertices have deg > 1)
        new_edges = cur_edges.join(
            keep.withColumnRenamed("id", "src"), "src", "left_semi"
        ).join(keep.withColumnRenamed("id", "dst"), "dst", "left_semi")
        # stats-safe truncation per pass (see plans.iteration.truncate)
        new_edges = truncate(new_edges.select(*cur_edges.columns))
        new_vertices = keep.persist(StorageLevel.MEMORY_AND_DISK)
        new_count = new_vertices.count()
        stats.iterations = i
        stats.history.append({"vertices": new_count})
        changed = new_count != n_vertices
        cur_edges.unpersist()
        cur_vertices.unpersist()
        cur_edges, cur_vertices, n_vertices = new_edges, new_vertices, new_count
        if not changed:
            stats.converged = True
            break
    stats.wall_seconds = time.time() - t0
    return cur_vertices, cur_edges, stats
