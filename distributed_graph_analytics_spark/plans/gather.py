"""Broadcast-gather superstep tier: vectorized per-vertex kernels over a
partitioned adjacency, with the O(|V|) state vector broadcast per
superstep.

The north star prescribes "a broadcast-or-shuffle hash join of messages
against a partitioned vertex-state DataFrame with vectorized
pandas/Arrow UDFs for per-vertex update kernels". This module is the
*broadcast* arm taken to its vectorized conclusion — the same shape as
MLlib's gradient loops (driver-held coefficient vector, broadcast each
iteration, partial aggregates streamed back):

- the O(|E|) half (the packed adjacency) stays distributed,
  hash-partitioned and checkpointed exactly like the shuffle tier;
- the O(|V|) half (one float64/int64 per vertex) is broadcast as a raw
  numpy vector — ~8 bytes/vertex, NOT a per-row HashedRelation (the
  per-superstep broadcast that plans/join_strategy.py measured at
  ~5 s/iteration rebuilt a driver-side hash relation of Rows; a pickled
  10 MB ndarray ships in ~10s of ms);
- each superstep is ONE shuffle-free stage: mapInArrow streams the
  adjacency's list arrays as Arrow buffers, a numpy ``reduceat`` gather
  computes every vertex's message reduction vectorized (no per-row
  Python), and the O(|V|) partial results return through one Arrow
  collect. Message reduction that the shuffle tier does in a
  groupBy+exchange costs zero exchanges here.

Tier boundary (the 100 TB honesty): the broadcast vector costs
8·|V| bytes on every executor, so the tier is capped at
``SPARK_GRAFT_GATHER_MAX_V`` vertices (default 2^25 ≈ 33.5M → 256 MB —
comfortably inside one executor, far below what a 10^12-edge /
10^9-vertex graph would need). Above the cap, ``strategy="auto"``
falls back to the shuffle-join kernels in operators/pagerank.py and
operators/wcc.py, whose plan shape is pinned by
tests/test_adjacency_plan.py. Both tiers produce identical results
(pinned by tests/test_gather_tier.py).

Dense ids: gather indexes numpy vectors, so vertex ids are dictionary-
encoded once per job to [0, |V|) — ``zipWithIndex`` (one count job +
one map, no global sort), then the dictionary is broadcast-or-shuffle
joined onto the edges. This is the same distributed-dictionary
discipline as the string-id ingest path (sources/edges.py S2).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from distributed_graph_analytics_spark.plans.iteration import (
    aqe_off,
    hash_agg_pack,
)

#: broadcast-vector cap: 2^25 vertices = 256 MB of float64 per executor
DEFAULT_MAX_GATHER_VERTICES = 1 << 25

#: above this the id dictionary joins as a shuffle-hash join instead of
#: a broadcast (the dictionary is ~20 bytes/vertex driver-side)
DICT_BROADCAST_MAX = 8_000_000


def max_gather_vertices() -> int:
    return int(
        os.environ.get("SPARK_GRAFT_GATHER_MAX_V", str(DEFAULT_MAX_GATHER_VERTICES))
    )


@dataclass
class GatherGraph:
    """Dense-id view of an edge table: the distributed half of the tier.

    ``dict_df``: (id LONG, cid INT) persisted; ``edges_c``: (scid, dcid)
    INT pairs (not materialized — consumed once per pack); ``n``: |V|;
    ``orig_id``: numpy int64, cid → original id.
    """

    dict_df: DataFrame
    edges_c: DataFrame
    n: int
    orig_id: np.ndarray

    @classmethod
    def build(cls, edges: DataFrame) -> "GatherGraph":
        ids = (
            edges.select(F.col("src").alias("id"))
            .unionByName(edges.select(F.col("dst").alias("id")))
            .distinct()
        )
        # dense numbering without a global sort: one count job + one map
        # (explicit schema: toDF's sampling inference dies on empty RDDs)
        spark = edges.sparkSession
        dict_df = (
            spark.createDataFrame(
                ids.rdd.map(lambda r: r[0]).zipWithIndex(), "id long, cid long"
            )
            .select("id", F.col("cid").cast("int").alias("cid"))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        n = dict_df.count()
        sdict = dict_df.select(F.col("id").alias("src"), F.col("cid").alias("scid"))
        ddict = dict_df.select(F.col("id").alias("dst"), F.col("cid").alias("dcid"))
        if n <= DICT_BROADCAST_MAX:
            sdict, ddict = F.broadcast(sdict), F.broadcast(ddict)
        else:
            sdict, ddict = sdict.hint("shuffle_hash"), ddict.hint("shuffle_hash")
        edges_c = (
            edges.join(sdict, "src").join(ddict, "dst").select("scid", "dcid")
        )
        ids_pdf = dict_df.toPandas()
        orig_id = np.zeros(n, dtype=np.int64)
        orig_id[ids_pdf["cid"].to_numpy()] = ids_pdf["id"].to_numpy()
        return cls(dict_df=dict_df, edges_c=edges_c, n=n, orig_id=orig_id)

    def cid_of(self, ids: np.ndarray) -> np.ndarray:
        """Original id → cid, driver-side (checkpoint resume path)."""
        order = np.argsort(self.orig_id, kind="stable")
        pos = np.searchsorted(self.orig_id[order], ids)
        return order[pos].astype(np.int64)

    def release(self) -> None:
        self.dict_df.unpersist()


def pack_adjacency(
    pairs: DataFrame, key: str, val: str, n_part: int, chunk: int
) -> DataFrame:
    """(key INT, vals ARRAY<INT>) packed + localCheckpoint'ed, same
    layout discipline as the shuffle tier's CSR builds: one flat-row
    exchange, pack groupBy clusters on it, hub rows sliced to ``chunk``
    AFTER the pack (partial chunk sums merge driver-side via
    ``np.add.at``/``np.maximum.at``), raw-row materialization under
    aqe_off + hash_agg_pack (see operators/pagerank.build_out_adjacency
    for each choice's measurement)."""
    spark = pairs.sparkSession
    packed = (
        pairs.repartition(n_part, key)
        .groupBy(key)
        .agg(F.collect_list(val).alias("all_vals"))
        .select(
            key,
            F.explode(
                F.transform(
                    F.sequence(
                        F.lit(0),
                        ((F.size("all_vals") - F.lit(1)) / F.lit(chunk)).cast("int"),
                    ),
                    lambda i: F.slice(
                        F.col("all_vals"), i * F.lit(chunk) + F.lit(1), chunk
                    ),
                )
            ).alias("vals"),
        )
    )
    with aqe_off(spark), hash_agg_pack(spark):
        return packed.localCheckpoint(eager=True)


def _segment_reduce(reducer, fill):
    """Build a mapInArrow fn: per adjacency row, reduce the broadcast
    vector over the row's neighbor list — ``reducer.reduceat`` over the
    Arrow list buffers (flat values + offsets), fully vectorized."""

    def make(w_bc, out_type):
        def fn(batches):
            w = w_bc.value
            for batch in batches:
                keys = batch.column(0)
                lists = batch.column(1)
                flat = lists.flatten().to_numpy(zero_copy_only=False)
                lengths = pa.compute.list_value_length(lists).to_numpy(
                    zero_copy_only=False
                )
                starts = np.zeros(len(lengths), dtype=np.int64)
                if len(lengths) > 1:
                    np.cumsum(lengths[:-1], out=starts[1:])
                vals = w[flat]
                if len(vals):
                    # reduceat quirk: an empty segment (starts[i] ==
                    # starts[i+1]) yields vals[starts[i]], and a start at
                    # len(vals) is out of bounds — clamp, then overwrite
                    # empties with the reducer's identity. Packed rows
                    # never have empty lists; this guards sliced hubs.
                    out = reducer.reduceat(vals, np.minimum(starts, len(vals) - 1))
                    out[lengths == 0] = fill
                else:
                    out = np.full(len(lengths), fill, dtype=vals.dtype)
                yield pa.RecordBatch.from_arrays(
                    [keys, pa.array(out, type=out_type)], ["k", "r"]
                )

        return fn

    return make


_sum_reduce = _segment_reduce(np.add, 0.0)
_max_reduce = _segment_reduce(np.maximum, np.iinfo(np.int64).min)
_min_reduce = _segment_reduce(np.minimum, np.iinfo(np.int64).max)


def gather_sum(adj: DataFrame, key: str, w: np.ndarray, n: int) -> np.ndarray:
    """One shuffle-free superstep: Σ w[neighbor] per vertex → float64[n]."""
    sc = adj.sparkSession.sparkContext
    w_bc = sc.broadcast(w)
    try:
        pdf = adj.mapInArrow(
            _sum_reduce(w_bc, pa.float64()), f"{key} int, r double"
        ).toPandas()
    finally:
        w_bc.destroy()
    out = np.zeros(n, dtype=np.float64)
    np.add.at(out, pdf[key].to_numpy(), pdf["r"].to_numpy())
    return out


def gather_extreme(
    adj: DataFrame, key: str, w: np.ndarray, n: int, minimum: bool = False
) -> np.ndarray:
    """max (or min) of w[neighbor] per vertex → int64[n]; vertices with
    no adjacency row keep the reducer's identity value."""
    sc = adj.sparkSession.sparkContext
    reducer, fill, ufunc = (
        (_min_reduce, np.iinfo(np.int64).max, np.minimum)
        if minimum
        else (_max_reduce, np.iinfo(np.int64).min, np.maximum)
    )
    w_bc = sc.broadcast(w)
    try:
        pdf = adj.mapInArrow(reducer(w_bc, pa.int64()), f"{key} int, r long").toPandas()
    finally:
        w_bc.destroy()
    out = np.full(n, fill, dtype=np.int64)
    ufunc.at(out, pdf[key].to_numpy(), pdf["r"].to_numpy())
    return out


def vector_to_df(
    spark, orig_id: np.ndarray, values: np.ndarray, name: str, dtype: str
) -> DataFrame:
    """(id LONG, <name> <dtype>) DataFrame from driver vectors — the
    tier's exit back to the public DataFrame contract (Arrow-batched;
    bounded by the tier cap, so ≤ a few hundred MB)."""
    import pandas as pd

    pdf = pd.DataFrame({"id": orig_id, name: values})
    return spark.createDataFrame(pdf, schema=f"id long, {name} {dtype}")
