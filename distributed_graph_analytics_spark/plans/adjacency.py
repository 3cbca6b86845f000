"""Shared packed-adjacency artifact for the shuffle kernel tier.

A pipeline that runs several analytics over one edge table (the
benchmark job runs PageRank then WCC to convergence on the same input;
neighboring-communities composes WCC and Louvain) re-derives the same
CSR-style packed adjacency per operator when each builds its own.
This module shares it across operators the way ``plans/gather.py``'s
``GatherGraph`` shares the gather tier's blob adjacency (its
``out_adjacency`` derives from the in-adjacency blobs via
``_swap_bucket_fn`` — "the second direction never re-reads the raw
edges"):

- :meth:`ShuffleGraph.out_adjacency` — ``operators.pagerank.
  build_out_adjacency``'s ``(src, dsts ARRAY, inv_deg)`` rows,
  checkpointed under ``aqe_off``/``hash_agg_pack`` with the concrete
  hash(src) layout (BENCH/BASELINE.md "Plan work" items 1-3);
- :meth:`ShuffleGraph.in_adjacency` — the REVERSE pack ``(v, us
  ARRAY)`` keyed by the receiver, derived from the out-adjacency's own
  checkpointed array rows: explode back to |E| flat ``(v=dst, u=src)``
  rows, ONE hash(v) exchange, one pack. Against a standalone symmetric
  build (``operators.wcc.build_sym_adjacency``: a 2|E|-row union
  exchanged and packed in one go) the pipeline's second build moves
  half the flat rows and packs half the values, because the out half
  is already packed and checkpointed;
- :meth:`ShuffleGraph.vertices` / :attr:`ShuffleGraph.n` — the vertex
  set computed once (adjacency senders ∪ one pruned dst scan, covering
  dangling vertices) and shared by every operator's
  broadcast-or-shuffle decisions.

WCC over a ShuffleGraph joins the frontier against the two packs and
unions the exploded messages — the same candidate-label multiset as
the single symmetric pack (each edge contributes its endpoints' labels
in both directions exactly once), so labels and the per-iteration
changed-count trajectory are identical (pinned by
tests/test_shared_adjacency.py).

The reference's analogue is graph reuse across analytics in one
driver: dga-graphx DGARunner.scala:96-130 loads ONE
``initialGraph`` and hands it to whichever analytic runs; the
neighboring-communities runner reuses it for both WCC and Louvain
(AbstractNeighboringCommunityRunner.scala:47-62).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark import StorageLevel

from distributed_graph_analytics_spark.plans.iteration import aqe_off, hash_agg_pack


class ShuffleGraph:
    """Lazily built, checkpoint-materialized adjacency packs over one
    edge table, shared across shuffle-tier operators. The caller keeps
    ownership: pass one instance to several operators, then
    :meth:`release`. Each pack is built at most once, inside whichever
    operator first asks for it (so pipeline timing attributes the build
    to the stage that triggered it)."""

    def __init__(
        self,
        edges: DataFrame,
        num_partitions: int | None = None,
        compact_ids: bool = False,
    ):
        self.edges = edges
        spark = edges.sparkSession
        self.n_part = num_partitions or int(
            spark.conf.get("spark.sql.shuffle.partitions")
        )
        self.compact_ids = compact_ids
        self._out: DataFrame | None = None
        self._in: DataFrame | None = None
        self._vertices: DataFrame | None = None
        self._n: int | None = None

    def out_adjacency(self) -> DataFrame:
        """(src LONG, dsts ARRAY, inv_deg DOUBLE), checkpointed with
        hash(src, n_part) partitioning — PageRank's join side."""
        if self._out is None:
            from distributed_graph_analytics_spark.operators.pagerank import (
                build_out_adjacency,
            )

            spark = self.edges.sparkSession
            adj = build_out_adjacency(
                self.edges, self.n_part, compact_ids=self.compact_ids
            )
            with aqe_off(spark), hash_agg_pack(spark):
                self._out = adj.localCheckpoint(eager=True)
        return self._out

    def in_adjacency(self) -> DataFrame:
        """(v LONG, us ARRAY), checkpointed with hash(v, n_part)
        partitioning — the reverse direction, derived from the packed
        out-adjacency instead of the raw edge table (|E| flat rows
        through the exchange instead of 2|E|; the explode scan reads
        the compact checkpointed array rows)."""
        if self._in is None:
            from distributed_graph_analytics_spark.operators.pagerank import (
                _chunked,
                _int_packable,
            )

            spark = self.edges.sparkSession
            out = self.out_adjacency()
            # key column back to LONG (public id contract + the state
            # join key the supersteps partition on); neighbor ids
            # follow the pack's compact_ids setting. The cast is added
            # ONLY when the packed ids are int: a redundant
            # long->long cast+alias gets stripped by the optimizer
            # (SimplifyCasts + RemoveRedundantAliases), leaving the
            # checkpoint's captured hash(v) partitioning pointing at
            # the pre-alias exprId — a silent partitioning loss that
            # re-exchanges the pack in every superstep join
            # (tests/test_shared_adjacency.py pins the layout).
            if self.compact_ids:
                flat = out.select(
                    F.explode("dsts").alias("vi"), F.col("src").alias("u")
                ).select(F.col("vi").cast("long").alias("v"), "u")
            else:
                flat = out.select(
                    F.explode("dsts").alias("v"), F.col("src").alias("u")
                )
            u_col = _int_packable(F.col("u")) if self.compact_ids else F.col("u")
            pack = (
                flat.repartition(self.n_part, "v")
                .groupBy("v")
                .agg(F.collect_list(u_col).alias("all_us"))
                .select("v", F.explode(_chunked("all_us")).alias("us"))
            )
            with aqe_off(spark), hash_agg_pack(spark):
                self._in = pack.localCheckpoint(eager=True)
        return self._in

    def vertices(self) -> DataFrame:
        """(id LONG) distinct vertex set, persisted; derived from the
        two packs' KEY columns instead of a |E|-row dst scan: the out
        pack's src column covers every vertex with out-edges and the
        in pack's v column covers every vertex with in-edges (dangling
        included), so the union of two ~|V|-row key scans is the exact
        vertex set. The standalone (non-shared) kernels pay a
        distinct over |E| dst rows here; in the pipeline both packs
        exist anyway, so the distinct shrinks from O(|E|) to O(|V|)
        rows — at the x64 evidence input that removes a 76.5M-row
        exchange+aggregate (the worst-scaling shape of the old
        pr_build phase) from the build entirely.

        When the in pack does NOT already exist (an out-only consumer,
        e.g. PageRank alone over a ShuffleGraph), the receiver side
        falls back to one |E|-row dst scan of the raw edge table
        instead of forcing the full in-pack build (explode + exchange
        + collect_list pack + checkpoint) — the pack-derived path is a
        freebie only when both packs exist anyway."""
        if self._vertices is None:
            out = self.out_adjacency()
            if self._in is not None:
                recv = self._in.select(F.col("v").alias("id"))
            else:
                recv = self.edges.select(F.col("dst").alias("id"))
            self._vertices = (
                out.select(F.col("src").alias("id"))
                .unionByName(recv)
                .distinct()
                .persist(StorageLevel.MEMORY_AND_DISK)
            )
            self._n = self._vertices.count()
        return self._vertices

    @property
    def n(self) -> int:
        if self._n is None:
            self.vertices()
        return self._n

    def release(self) -> None:
        """Drop references; localCheckpoint blocks are freed by the
        ContextCleaner after the next periodic GC."""
        if self._vertices is not None:
            self._vertices.unpersist()
        self._out = self._in = self._vertices = None
        self._n = None
