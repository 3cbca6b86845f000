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


def _dense_index(verts: DataFrame) -> tuple[DataFrame, int]:
    """(id, idx 0..n-1) by ascending id, plus n — the distributed
    two-phase dense rank of sources/edges.dense_string_ids (range
    partition by id, rank within partition, add per-partition offsets;
    only P counts reach the driver), NOT a single global-sort window.
    The mapping equals ``row_number() OVER (ORDER BY id) - 1`` exactly,
    which is what the DuckDB oracle runs."""
    spark = verts.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    parted = verts.repartitionByRange(n_part, "id").withColumn(
        "_pid", F.spark_partition_id()
    )
    parted = parted.persist()
    counts = sorted(
        parted.groupBy("_pid").count().collect(), key=lambda r: r["_pid"]
    )
    offsets, acc = {}, 0
    for row in counts:
        offsets[row["_pid"]] = acc
        acc += row["count"]
    offset_df = F.broadcast(
        spark.createDataFrame(
            [(p, o) for p, o in offsets.items()], "_pid int, _offset long"
        )
    )
    w = Window.partitionBy("_pid").orderBy("id")
    idx = (
        parted.withColumn("_local", F.row_number().over(w) - 1)
        .join(offset_df, "_pid")
        .select("id", (F.col("_local") + F.col("_offset")).alias("idx"))
    )
    return idx, acc


def negative_edge_sample(
    edges: DataFrame,
    num_per_src: int = 5,
    oversample: int = 3,
    seed: int = 42,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Per-source negative sampling for contrastive / link-prediction
    training: for every vertex, up to ``num_per_src`` destinations that
    are NOT neighbors (and not the vertex itself), drawn uniformly from
    the vertex set by deterministic hash.

    Returns (src LONG, dst LONG, k INT) with k the per-source draw
    rank. Mechanics, all shuffle-bounded column expressions:

    - a dense index over the vertex set (``row_number`` by id — at
      10^12 vertices this is the same zip-ranked dictionary the
      string-id ingest builds, one sort-shuffle, built once and
      reusable);
    - ``num_per_src × oversample`` candidate draws per source via
      ``hash(src, draw, seed) mod |V|``, mapped to vertex ids through
      the index (hash-partitioned equi-join, no broadcast needed at
      scale);
    - rejection = one left-anti join against the symmetric edge view
      (collisions with real neighbors or self), then the first
      ``num_per_src`` survivors by draw order.

    Oversampling covers rejection losses; a source adjacent to almost
    the whole graph can still under-deliver (documented, standard for
    uniform negative sampling — raise ``oversample`` for dense
    graphs). ``hash_family="sha2"`` makes the draw reproducible in
    the DuckDB oracle.
    """
    sym = (
        edges.select("src", "dst")
        .unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
    )
    verts = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    idx, n_v = _dense_index(verts)
    draws = verts.select(
        F.col("id").alias("src"),
        F.explode(
            F.sequence(F.lit(0), F.lit(num_per_src * oversample - 1))
        ).alias("draw"),
    )
    cand = draws.select(
        "src",
        "draw",
        F.pmod(
            _hash64(
                F.col("src"), F.col("draw"), F.lit(seed), family=hash_family
            ),
            F.lit(n_v),
        ).alias("idx"),
    ).join(idx, "idx").select("src", "draw", F.col("id").alias("dst"))
    survivors = (
        cand.where(F.col("src") != F.col("dst"))
        .join(sym, ["src", "dst"], "left_anti")
        # a hash can repeat a dst for the same src: keep the first draw
        .withColumn(
            "_dup",
            F.row_number().over(
                Window.partitionBy("src", "dst").orderBy("draw")
            ),
        )
        .where(F.col("_dup") == 1)
    )
    wk = Window.partitionBy("src").orderBy("draw")
    return (
        survivors.withColumn("k", F.row_number().over(wk))
        .where(F.col("k") <= num_per_src)
        .select("src", "dst", F.col("k").cast("int").alias("k"))
    )
