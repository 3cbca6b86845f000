"""Connected components via alternating large-star / small-star.

The round-efficient scale path for HIGH-DIAMETER graphs: label
propagation (operators/wcc.py — the reference's own algorithm,
WeaklyConnectionComponentsCore.scala:31-56) needs O(diameter)
supersteps, which on a 10^12-edge web/road-shaped graph can be
hundreds; the alternating star algorithm (Kiveris, Lattanzi, Mirrokni,
Rastogi, Vassilvitskii — "Connected Components in MapReduce and
Beyond", SoCC'14) converges in O(log² n) rounds regardless of
diameter, hooking low-id roots directly to every reachable vertex.
This is also the algorithm GraphFrames' connectedComponents() runs.

Output CONTRACT matches weakly_connected_components exactly —
``(id LONG, component LONG)`` with ``component`` = MAX vertex id in
the component (reference fixture semantics) — so the two kernels are
interchangeable and share the driver oracle; ``min_label=True`` flips
to the GraphX min-id labeling. Internally the algorithm is min-rooted
(the paper's form); the requested labeling is applied by one final
per-component aggregate.

Per round (all DataFrame ops, no Python in the loop):

- large-star: every vertex u sends its minimum incident id
  ``m = min(u, min Γ(u))`` to every LARGER neighbor → one groupBy +
  one join over the symmetric view;
- small-star: on the big→small orientation, every vertex hooks its
  smaller neighbors (and itself) to its minimum smaller neighbor →
  one groupBy + one join over |E| rows;
- dedup keeps the edge set from re-growing (star rewires converge to
  ≤ one parent pair per non-root vertex);
- convergence = (count, order-free xxhash64 checksum) fixed point —
  two scalars in the same materialize pass, no driver data.

At 100 TB each round shuffles on the same hash(u) key, so AQE reuses
the exchange layout; rounds are O(log² n) ≈ 25-30 at 10^12 vertices,
each strictly cheaper than one label-prop superstep's full-frontier
cost on a comparable topology.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from distributed_graph_analytics_spark.plans.iteration import (
    IterationStats,
    materialize,
)


def _large_star(e: DataFrame) -> DataFrame:
    """(u, v) symmetric view in, rewired pairs out: every neighbor
    v > u is hooked to m(u) = min(u, min Γ(u))."""
    mins = e.groupBy("u").agg(F.least(F.first("u"), F.min("v")).alias("m"))
    return (
        e.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(p: DataFrame) -> DataFrame:
    """Parent pairs (u, v) with v < u in; every small neighbor and u
    itself hook to m(u) = min of u's smaller neighbors."""
    mins = p.groupBy("u").agg(F.min("v").alias("m"))
    hooked = (
        p.join(mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .unionByName(mins.select("u", F.col("m").alias("v")))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    return hooked


def star_components(
    edges: DataFrame,
    max_iterations: int = 100,
    min_label: bool = False,
) -> tuple[DataFrame, IterationStats]:
    """Returns (components(id LONG, component LONG), stats); label
    semantics identical to operators/wcc.py (max id per component, or
    min with ``min_label=True``)."""
    stats = IterationStats()
    stats.kernel = "star"
    import time

    t0 = time.time()
    # canonical big→small parent pairs; self-loops vanish here but the
    # vertex set below still includes their endpoints (wcc parity)
    vertices = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    p = (
        edges.select(
            F.greatest("src", "dst").alias("u"), F.least("src", "dst").alias("v")
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    p, m = materialize(
        p, {"cnt": F.count(F.lit(1)), "chk": F.sum(F.xxhash64("u", "v").cast("decimal(38,0)"))}
    )
    prev = (m["cnt"], m["chk"])
    for i in range(1, max_iterations + 1):
        sym = p.unionByName(p.select(F.col("v").alias("u"), F.col("u").alias("v")))
        # large-star emits (v, m) with v > u ≥ m, so its output is
        # already big→small oriented — small-star's input invariant
        big = _large_star(sym)
        p, m = materialize(
            _small_star(big),
            {"cnt": F.count(F.lit(1)), "chk": F.sum(F.xxhash64("u", "v").cast("decimal(38,0)"))},
        )
        cur = (m["cnt"], m["chk"])
        stats.iterations = i
        stats.history.append({"round": i, "pairs": m["cnt"]})
        if cur == prev:
            stats.converged = True
            break
        prev = cur
    # p is now a star set: (child, root) with root = component min.
    labels_min = vertices.join(
        p.select(F.col("u").alias("id"), F.col("v").alias("root")), "id", "left"
    ).select("id", F.coalesce("root", "id").alias("root"))
    if min_label:
        out = labels_min.select("id", F.col("root").alias("component"))
    else:
        relabel = labels_min.groupBy("root").agg(F.max("id").alias("component"))
        out = labels_min.join(relabel, "root").select("id", "component")
    stats.wall_seconds = time.time() - t0
    return out, stats
