"""Deterministic random walks — the graph-embedding input primitive
(DeepWalk/node2vec-style corpora; engine extension, no reference
analog).

One walker starts at every vertex and takes ``walk_length`` steps over
the symmetrized graph. Neighbor choice is a seeded hash, not an RNG:
``idx = H(walk_id, step, seed) mod deg(cur)`` over the neighbor list
sorted by id — so walks are exactly reproducible across runs,
partitionings, AND engines (the DuckDB oracle replays them bit-for-bit
with the sha2 hash family), while remaining uniform per step in the
hash's randomness.

Scale shape: the sorted neighbor lists are packed ONCE into chunked
CSR-style array rows keyed by (v, chunk) — a walker reads ONE array
element per step (element_at), never exploding the adjacency; hubs are
sliced to ADJ_CHUNK so no row is unbounded. Each step is two
hash-joins on the walker frontier (|V| rows): degree lookup → chunk
lookup. All column expressions, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark import StorageLevel

from distributed_graph_analytics_spark.functions.dedup import _hash64
from distributed_graph_analytics_spark.operators.pagerank import ADJ_CHUNK
from distributed_graph_analytics_spark.plans.iteration import hash_agg_pack
from distributed_graph_analytics_spark.sources.edges import canonicalize_edges


def _pack_sorted_adjacency(sym: DataFrame, n_part: int) -> DataFrame:
    """Chunked CSR-style adjacency: id-sorted neighbor arrays split
    into ADJ_CHUNK slices keyed (v, chunk) so position ``idx`` is
    addressed via (v, idx // ADJ_CHUNK) + element_at(idx % ADJ_CHUNK+1)
    and no row is hub-unbounded. Returns (v, deg, chunk, nbrs),
    persisted and materialized under the scoped hash-agg raise."""
    packed = (
        sym.repartition(n_part, "v")
        .groupBy("v")
        .agg(F.sort_array(F.collect_list("nb")).alias("all_nbs"))
        .select(
            "v",
            F.size("all_nbs").alias("deg"),
            F.posexplode(
                F.transform(
                    F.sequence(
                        F.lit(0),
                        ((F.size("all_nbs") - F.lit(1)) / F.lit(ADJ_CHUNK)).cast(
                            "int"
                        ),
                    ),
                    lambda i: F.slice(
                        F.col("all_nbs"), i * F.lit(ADJ_CHUNK) + F.lit(1), ADJ_CHUNK
                    ),
                )
            ).alias("chunk", "nbrs"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # force the pack job under the scoped ObjectHashAggregate raise
    # (plans.iteration.hash_agg_pack): the collect_list pack would
    # otherwise fall back to sort-based aggregation at 128 keys —
    # the config must be set when the job RUNS, and persist is lazy
    with hash_agg_pack(sym.sparkSession):
        packed.count()
    return packed


def random_walks(
    edges: DataFrame,
    walk_length: int = 4,
    seed: int = 42,
    hash_family: str = "xxhash64",
    num_partitions: int | None = None,
) -> DataFrame:
    """Returns (walk_id LONG, step INT, vertex LONG) with one walk per
    vertex, steps 0..walk_length (step 0 = the start vertex)."""
    spark = edges.sparkSession
    n_part = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    if "weight" not in edges.columns:
        edges = edges.withColumn("weight", F.lit(1).cast("long"))
    canon = canonicalize_edges(edges).select("src", "dst")
    sym = canon.select(F.col("src").alias("v"), F.col("dst").alias("nb")).union(
        canon.select(F.col("dst").alias("v"), F.col("src").alias("nb"))
    )
    packed = _pack_sorted_adjacency(sym, n_part)
    degs = packed.select("v", "deg").distinct()

    walkers = packed.select(F.col("v").alias("walk_id")).distinct().select(
        "walk_id", F.col("walk_id").alias("cur")
    )
    out = walkers.select(
        "walk_id", F.lit(0).alias("step"), F.col("cur").alias("vertex")
    )
    for t in range(1, walk_length + 1):
        h = _hash64(
            F.col("walk_id"), F.lit(t), F.lit(seed), family=hash_family
        )
        idx = F.pmod(h, F.col("deg"))
        hop = (
            walkers.join(degs, walkers["cur"] == degs["v"])
            .select(
                "walk_id",
                "cur",
                idx.alias("idx"),
            )
            .join(
                packed.select("v", "chunk", "nbrs"),
                (F.col("cur") == F.col("v"))
                & ((F.col("idx") / ADJ_CHUNK).cast("int") == F.col("chunk")),
            )
            .select(
                "walk_id",
                F.element_at(
                    "nbrs", (F.pmod(F.col("idx"), F.lit(ADJ_CHUNK)) + 1).cast("int")
                ).alias("cur"),
            )
        )
        # persist each frontier: the output union references every
        # step's walkers, and without this each union branch would
        # recompute the whole chain of prior hops (O(L²) joins)
        walkers = hop.persist(StorageLevel.MEMORY_AND_DISK)
        out = out.unionByName(
            walkers.select(
                "walk_id", F.lit(t).alias("step"), F.col("cur").alias("vertex")
            )
        )
    return out


def node2vec_walks(
    edges: DataFrame,
    walk_length: int = 4,
    p: int = 1,
    q: int = 1,
    seed: int = 42,
    hash_family: str = "xxhash64",
    num_partitions: int | None = None,
) -> DataFrame:
    """Second-order biased walks (node2vec, Grover & Leskovec KDD'16)
    with INTEGER return/in-out parameters, deterministic and exactly
    replayable in SQL.

    node2vec's unnormalized transition weights from (prev, cur) to a
    neighbor x of cur are 1/p (x == prev), 1 (x adjacent to prev) and
    1/q (otherwise). Scaling by p·q makes them the integers
    (q, p·q, p), so the cumulative-weight draw is exact integer
    arithmetic: r = H(walk_id, step, seed) mod ΣW selects the candidate
    whose cumulative interval (in id-sorted order) contains r. p=q=1
    degenerates to the uniform first-order walk.

    Scale shape: per step the frontier explodes to its neighbor
    candidates from the chunked pack (rows bounded per task by
    ADJ_CHUNK), membership vs prev's neighborhood is one shuffle join
    on (prev, x), and the weighted draw is TWO bounded windows —
    per-(walker, chunk) cumulative (≤ ADJ_CHUNK rows per window) plus
    a per-walker window over chunk subtotals (≤ deg/ADJ_CHUNK rows) —
    never a per-walker sort over an unbounded hub neighborhood. All
    column expressions, no Python.

    Returns (walk_id LONG, step INT, vertex LONG), one walk per vertex,
    steps 0..walk_length.
    """
    if p < 1 or q < 1:
        raise ValueError("p and q must be positive integers")
    spark = edges.sparkSession
    n_part = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    if "weight" not in edges.columns:
        edges = edges.withColumn("weight", F.lit(1).cast("long"))
    canon = canonicalize_edges(edges).select("src", "dst")
    sym = canon.select(F.col("src").alias("v"), F.col("dst").alias("nb")).union(
        canon.select(F.col("dst").alias("v"), F.col("src").alias("nb"))
    )
    packed = _pack_sorted_adjacency(sym, n_part)
    degs = packed.select("v", "deg").distinct()
    nbr_set = packed.select(
        F.col("v").alias("_t"), F.explode("nbrs").alias("_x"), F.lit(1).alias("is_nb")
    )

    # step 1: uniform (no prev yet) — identical draw to random_walks
    starts = packed.select(F.col("v").alias("walk_id")).distinct()
    h1 = _hash64(F.col("walk_id"), F.lit(1), F.lit(seed), family=hash_family)
    frontier = (
        starts.join(degs, starts["walk_id"] == degs["v"])
        .select("walk_id", F.pmod(h1, F.col("deg")).alias("idx"))
        .join(
            packed.select("v", "chunk", "nbrs"),
            (F.col("walk_id") == F.col("v"))
            & ((F.col("idx") / ADJ_CHUNK).cast("int") == F.col("chunk")),
        )
        .select(
            "walk_id",
            F.col("walk_id").alias("prev"),
            F.element_at(
                "nbrs", (F.pmod(F.col("idx"), F.lit(ADJ_CHUNK)) + 1).cast("int")
            ).alias("cur"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    out = starts.select(
        "walk_id", F.lit(0).alias("step"), F.col("walk_id").alias("vertex")
    ).unionByName(
        frontier.select("walk_id", F.lit(1).alias("step"), F.col("cur").alias("vertex"))
    )

    for t in range(2, walk_length + 1):
        cand = (
            frontier.join(packed.select("v", "chunk", "nbrs"), F.col("cur") == F.col("v"))
            .select(
                "walk_id",
                "prev",
                "cur",
                "chunk",
                F.posexplode("nbrs").alias("pic", "x"),
            )
            .join(
                nbr_set,
                (F.col("prev") == F.col("_t")) & (F.col("x") == F.col("_x")),
                "left_outer",
            )
            .select(
                "walk_id",
                "prev",
                "cur",
                "chunk",
                "pic",
                "x",
                F.when(F.col("x") == F.col("prev"), F.lit(q))
                .when(F.col("is_nb").isNotNull(), F.lit(p * q))
                .otherwise(F.lit(p))
                .cast("long")
                .alias("wt"),
            )
        )
        in_chunk = Window.partitionBy("walk_id", "chunk").orderBy("pic").rowsBetween(
            Window.unboundedPreceding, -1
        )
        cand = cand.withColumn("cum_in", F.coalesce(F.sum("wt").over(in_chunk), F.lit(0)))
        chunk_tot = cand.groupBy("walk_id", "chunk").agg(F.sum("wt").alias("cw"))
        over_chunks = Window.partitionBy("walk_id").orderBy("chunk").rowsBetween(
            Window.unboundedPreceding, -1
        )
        offs = chunk_tot.select(
            "walk_id",
            "chunk",
            F.coalesce(F.sum("cw").over(over_chunks), F.lit(0)).alias("off"),
            F.sum("cw").over(Window.partitionBy("walk_id")).alias("W"),
        )
        h = _hash64(F.col("walk_id"), F.lit(t), F.lit(seed), family=hash_family)
        hop = (
            cand.join(offs, ["walk_id", "chunk"])
            .withColumn("r", F.pmod(h, F.col("W")))
            .where(
                (F.col("off") + F.col("cum_in") <= F.col("r"))
                & (F.col("r") < F.col("off") + F.col("cum_in") + F.col("wt"))
            )
            .select("walk_id", F.col("cur").alias("prev"), F.col("x").alias("cur"))
        )
        frontier = hop.persist(StorageLevel.MEMORY_AND_DISK)
        out = out.unionByName(
            frontier.select(
                "walk_id", F.lit(t).alias("step"), F.col("cur").alias("vertex")
            )
        )
    return out
