"""K-hop neighbor sampling — the graph-side training-data operator.

GNN training (GraphSAGE / PinSAGE-style) consumes per-seed sampled
neighborhoods: from each seed, keep at most ``fanouts[0]`` neighbors,
then at most ``fanouts[1]`` neighbors of those, etc. At 10^12 edges the
full neighborhood explosion is unrunnable; fanout sampling bounds the
frontier to ``|seeds| · Π fanouts`` rows regardless of graph size.

Spark-first design, one round per hop:

- candidate expansion = frontier ⋈ adjacency on the node id — the
  frontier is hash-partitioned on the join key, the big edge side
  shuffles once per level (or zero times if the edge table is bucketed
  by src, the 100 TB deployment layout);
- per-(seed, node) fanout cap = ``row_number`` over a deterministic
  hash ordering → Spark's rank-limit pushdown (WindowGroupLimit)
  truncates to the fanout BEFORE the window shuffle, so a 10M-degree
  hub contributes fanout rows, not 10M, past its map side;
- determinism: the order hash is ``hash(dst, seed?, level)`` with the
  same two families as functions/dedup._hash64 — "xxhash64" (fast,
  production) or "sha2" (reproducible in DuckDB → the driver oracle
  replays the identical sample).

No per-row Python anywhere; the sample is a pure column-expression
plan end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from distributed_graph_analytics_spark.functions.dedup import _hash64


def neighbor_sample(
    edges: DataFrame,
    seeds: DataFrame,
    fanouts: tuple[int, ...] = (10, 5),
    seed: int = 42,
    directed: bool = False,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Returns (seed LONG, level INT, src LONG, dst LONG): the sampled
    adjacency per seed per hop.

    ``seeds`` is a one-column DataFrame of seed vertex ids (column name
    free — the first column is used). ``directed=False`` samples over
    the symmetric view (both directions), the GraphSAGE default;
    ``directed=True`` follows out-edges only. A node reached at two
    levels is expanded at its first reach only (per-seed frontier
    dedup) — sampling without replacement per (seed, node): at most
    ``fanout`` DISTINCT neighbors, chosen by hash order.
    """
    seed_col = seeds.columns[0]
    adj = edges.select("src", "dst")
    if not directed:
        adj = adj.unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    adj = adj.where(F.col("src") != F.col("dst")).distinct()

    frontier = seeds.select(
        F.col(seed_col).cast("long").alias("seed"),
        F.col(seed_col).cast("long").alias("node"),
    ).distinct()
    visited = frontier  # (seed, node) already expanded or scheduled
    levels = []
    for level, fanout in enumerate(fanouts, start=1):
        cand = frontier.join(
            adj, frontier["node"] == adj["src"], "inner"
        ).select("seed", "node", "dst")
        w = Window.partitionBy("seed", "node").orderBy(
            _hash64(
                F.col("dst"), F.lit(seed), F.lit(level), family=hash_family
            ),
            F.col("dst"),  # total order under hash ties
        )
        sampled = (
            cand.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= fanout)
            .select(
                "seed",
                F.lit(level).cast("int").alias("level"),
                F.col("node").alias("src"),
                "dst",
            )
        )
        levels.append(sampled)
        frontier = (
            sampled.select("seed", F.col("dst").alias("node"))
            .distinct()
            .join(visited, ["seed", "node"], "left_anti")
        )
        visited = visited.unionByName(frontier)
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out
