"""Neighboring Communities — WCC ⋈ Louvain composition.

Reference: AbstractNeighboringCommunityRunner.scala:47-62 — run WCC and
Louvain on the same graph, attach (component, community) to every
vertex, then flag each edge whose endpoints sit in different
communities (sink format S14:
``src:community,dst:community,component,crossCommunityFlag``).

Here: two operator calls + two joins + one boolean projection. The
Louvain side uses the folded multi-level assignment, matching
NeighboringCommunityLouvainRunner.scala:30-44 which composes each
level's labels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from distributed_graph_analytics_spark.operators.louvain import louvain
from distributed_graph_analytics_spark.operators.wcc import (
    weakly_connected_components,
)


def neighboring_communities(
    edges: DataFrame,
    min_progress: int = 2000,
    progress_counter: int = 1,
) -> DataFrame:
    """Returns one row per edge:
    (src, src_community, dst, dst_community, component, cross_community).
    """
    components, _ = weakly_connected_components(edges)
    communities = louvain(edges, min_progress, progress_counter).final

    src_side = communities.select(
        F.col("id").alias("src"), F.col("community").alias("src_community")
    )
    dst_side = communities.select(
        F.col("id").alias("dst"), F.col("community").alias("dst_community")
    )
    comp_side = components.select(
        F.col("id").alias("src"), F.col("component")
    )
    return (
        edges.select("src", "dst")
        .join(src_side, "src")
        .join(dst_side, "dst")
        .join(comp_side, "src")
        .select(
            "src",
            "src_community",
            "dst",
            "dst_community",
            "component",
            (F.col("src_community") != F.col("dst_community")).alias(
                "cross_community"
            ),
        )
    )
