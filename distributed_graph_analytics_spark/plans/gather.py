"""Broadcast-gather superstep tier: vectorized per-vertex kernels over a
partitioned flat-sorted adjacency, with the O(|V|) state vector
broadcast per superstep.

The north star prescribes "a broadcast-or-shuffle hash join of messages
against a partitioned vertex-state DataFrame with vectorized
pandas/Arrow UDFs for per-vertex update kernels". This module is the
*broadcast* arm taken to its vectorized conclusion — the same shape as
MLlib's gradient loops (driver-held coefficient vector, broadcast each
iteration, partial aggregates streamed back):

- the O(|E|) half stays distributed as FLAT ``(k int32, v int32)`` edge
  rows, hash-partitioned by k and sorted within each partition — a
  CSR layout without materialized arrays. The v1 design packed
  ``collect_list`` array rows; its ObjectHashAggregate held every
  group's growing array in a per-task hash map, and the pack dominated
  the whole job (measured at 76.5M edges / pinned cores:
  pr_build 206s/68.6s with 10-21%% of it GC — tools/_ab_gather_probe.py).
  The flat build replaces that with one exchange + a numpy argsort in
  the same Arrow pass that dictionary-encodes the ids: no JVM
  aggregation, no array allocation churn;
- the O(|V|) half (one float64/int64 per vertex) is broadcast as a raw
  numpy vector — ~8 bytes/vertex, NOT a per-row HashedRelation (the
  per-superstep broadcast that plans/join_strategy.py measured at
  ~5 s/iteration rebuilt a driver-side hash relation of Rows; a pickled
  10 MB ndarray ships in ~10s of ms);
- each superstep is ONE shuffle-free stage: mapInArrow streams the
  sorted edge rows, ``reduceat`` over the run boundaries computes every
  vertex's message reduction vectorized (no per-row Python), and ~|V|
  partial results return through one Arrow collect (each key lives in
  exactly one partition — the build's one exchange bought that — so the
  only extra partials are per-Arrow-batch run splits, merged driver-side
  by ``np.add.at``/``np.maximum.at``). Message reduction that the
  shuffle tier does in a groupBy+exchange costs zero exchanges here.

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
encoded once per job to [0, |V|): per-partition ``np.unique`` partials
stream back through one Arrow collect, the driver merges them into ONE
sorted vector, and ``np.searchsorted`` against its broadcast does the
encode inside the same pass that sorts the adjacency — the whole
dictionary costs zero JVM shuffles (the v1 ``distinct``+``zipWithIndex``
route paid a 2|E| exchange plus two Python-pickled RDD passes). The
driver-side merge is bounded by the tier cap (≤ 256 MB of ids per
partition partial).
"""

from __future__ import annotations

import os
from contextlib import contextmanager
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: broadcast-vector cap: 2^25 vertices = 256 MB of float64 per executor
DEFAULT_MAX_GATHER_VERTICES = 1 << 25

#: Arrow rows per batch for gather passes. The session default (10k)
#: would hand the numpy kernels crumbs — per-batch overhead dominates
#: and every batch boundary splits a run into an extra driver-merged
#: partial. 2M rows = 16 MB of int32 pairs per batch.
GATHER_BATCH_ROWS = 1 << 21

#: output slice size for the build pass (bounds a single RecordBatch)
_EMIT_ROWS = 1 << 22


def max_gather_vertices() -> int:
    return int(
        os.environ.get("SPARK_GRAFT_GATHER_MAX_V", str(DEFAULT_MAX_GATHER_VERTICES))
    )


@contextmanager
def arrow_batch(spark, rows: int):
    """Scoped spark.sql.execution.arrow.maxRecordsPerBatch (read at
    execution time, so it must wrap the ACTION, not the plan build)."""
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    prev = spark.conf.get(key)
    spark.conf.set(key, str(rows))
    try:
        yield
    finally:
        spark.conf.set(key, prev)


def _col_np(batch, i):
    return batch.column(i).to_numpy(zero_copy_only=False)


def _uniq_fn(batches):
    """Per-partition distinct ids (src ∪ dst), one sorted partial out."""
    parts = []
    for batch in batches:
        parts.append(
            np.unique(np.concatenate([_col_np(batch, 0), _col_np(batch, 1)]))
        )
    if parts:
        u = np.unique(np.concatenate(parts)) if len(parts) > 1 else parts[0]
        yield pa.RecordBatch.from_arrays([pa.array(u, type=pa.int64())], ["id"])


def _encode_sort_fn(uniq_bc, key_is_dst: bool):
    """Build-pass kernel: dictionary-encode (searchsorted against the
    broadcast sorted id vector) and sort the whole partition by the key
    column, emitting flat (k, v) int32 rows. Buffers the partition —
    per-batch sorting would leave each key's run split across ~#batches
    chunks and multiply every superstep's returned partials by that
    factor."""

    def fn(batches):
        uniq = uniq_bc.value
        ks, vs = [], []
        for batch in batches:
            src = np.searchsorted(uniq, _col_np(batch, 0)).astype(np.int32)
            dst = np.searchsorted(uniq, _col_np(batch, 1)).astype(np.int32)
            ks.append(dst if key_is_dst else src)
            vs.append(src if key_is_dst else dst)
        if not ks:
            return
        k = np.concatenate(ks) if len(ks) > 1 else ks[0]
        v = np.concatenate(vs) if len(vs) > 1 else vs[0]
        order = np.argsort(k, kind="stable")
        k, v = k[order], v[order]
        for lo in range(0, len(k), _EMIT_ROWS):
            sl = slice(lo, lo + _EMIT_ROWS)
            yield pa.RecordBatch.from_arrays(
                [pa.array(k[sl], type=pa.int32()), pa.array(v[sl], type=pa.int32())],
                ["k", "v"],
            )

    return fn


def _deg_fn(n: int):
    """Out-degree partials over the in-adjacency: bincount the v column
    (the sender) per partition, emit the nonzero (k, c) pairs."""

    def fn(batches):
        acc = np.zeros(n, dtype=np.int64)
        got = False
        for batch in batches:
            got = True
            acc += np.bincount(_col_np(batch, 1), minlength=n)
        if got:
            nz = np.flatnonzero(acc)
            yield pa.RecordBatch.from_arrays(
                [pa.array(nz.astype(np.int32), type=pa.int32()),
                 pa.array(acc[nz], type=pa.int64())],
                ["k", "c"],
            )

    return fn


@dataclass
class GatherGraph:
    """Dense-id view of an edge table: the distributed half of the tier.

    ``uniq``: sorted distinct original ids (int64) — cid IS the rank in
    this vector, so ``orig_id`` is ``uniq`` itself and ``cid_of`` is a
    searchsorted. Adjacency tables build lazily and are shared when one
    ``GatherGraph`` serves several operators over the same edges (the
    scaling worker runs PageRank then WCC on one graph: the dictionary
    and the in-adjacency are built once).
    """

    edges: DataFrame
    uniq: np.ndarray
    n: int
    _in_adj: DataFrame | None = field(default=None, repr=False)
    _out_adj: DataFrame | None = field(default=None, repr=False)
    _deg: np.ndarray | None = field(default=None, repr=False)

    @classmethod
    def build(cls, edges: DataFrame) -> "GatherGraph":
        spark = edges.sparkSession
        pairs = edges.select("src", "dst")
        with arrow_batch(spark, GATHER_BATCH_ROWS):
            pdf = pairs.mapInArrow(_uniq_fn, "id long").toPandas()
        ids = pdf["id"].to_numpy()
        uniq = np.unique(ids) if len(ids) else ids.astype(np.int64)
        return cls(edges=edges, uniq=uniq, n=len(uniq))

    @property
    def orig_id(self) -> np.ndarray:
        return self.uniq

    def cid_of(self, ids: np.ndarray) -> np.ndarray:
        """Original id → cid, driver-side (checkpoint resume path)."""
        return np.searchsorted(self.uniq, ids).astype(np.int64)

    def _build_adj(self, key_is_dst: bool, n_part: int) -> DataFrame:
        spark = self.edges.sparkSession
        sc = spark.sparkContext
        uniq_bc = sc.broadcast(self.uniq)
        try:
            part_key = "dst" if key_is_dst else "src"
            adj = (
                self.edges.select("src", "dst")
                .repartition(n_part, part_key)
                .mapInArrow(_encode_sort_fn(uniq_bc, key_is_dst), "k int, v int")
            )
            with arrow_batch(spark, GATHER_BATCH_ROWS):
                return adj.localCheckpoint(eager=True)
        finally:
            # blocks referencing the broadcast are materialized by the
            # eager checkpoint; the driver copy can go
            uniq_bc.destroy()

    def in_adjacency(self, n_part: int) -> DataFrame:
        """(k=receiver, v=sender), each k in exactly one partition,
        partition sorted by k. PageRank gathers Σ w[v] per k here."""
        if self._in_adj is None:
            self._in_adj = self._build_adj(key_is_dst=True, n_part=n_part)
        return self._in_adj

    def out_adjacency(self, n_part: int) -> DataFrame:
        if self._out_adj is None:
            self._out_adj = self._build_adj(key_is_dst=False, n_part=n_part)
        return self._out_adj

    def sym_adjacency(self, n_part: int) -> DataFrame:
        """Both directions as one DataFrame: a narrow union of the two
        sorted tables (partitions stay intact, so per-partition
        sortedness — all reduceat needs — survives). Parallel edges are
        NOT deduped: max/min merges absorb duplicates bit-identically,
        so WCC's defensive ``distinct`` is unnecessary in this tier."""
        return self.in_adjacency(n_part).union(self.out_adjacency(n_part))

    def out_degree(self, n_part: int) -> np.ndarray:
        """float64[n] out-degrees, from one bincount pass over the
        cached in-adjacency (no JVM aggregation)."""
        if self._deg is None:
            spark = self.edges.sparkSession
            adj = self.in_adjacency(n_part)
            with arrow_batch(spark, GATHER_BATCH_ROWS):
                pdf = adj.mapInArrow(_deg_fn(self.n), "k int, c long").toPandas()
            deg = np.zeros(self.n, dtype=np.float64)
            np.add.at(deg, pdf["k"].to_numpy(), pdf["c"].to_numpy())
            self._deg = deg
        return self._deg

    def release(self) -> None:
        """Drop references; localCheckpoint blocks are freed by the
        ContextCleaner after the next periodic GC."""
        self._in_adj = self._out_adj = None
        self._deg = None


def _segment_reduce(reducer, fill):
    """Build a mapInArrow fn: reduce the broadcast vector over each run
    of equal keys in the sorted flat rows — ``reducer.reduceat`` at the
    run boundaries, fully vectorized. Runs split across Arrow batches
    yield one partial per batch; the callers merge partials with the
    same ufunc driver-side."""

    def make(w_bc, out_type):
        def fn(batches):
            w = w_bc.value
            for batch in batches:
                keys = _col_np(batch, 0)
                if len(keys) == 0:
                    continue
                starts = np.flatnonzero(keys[1:] != keys[:-1]) + 1
                starts = np.concatenate((np.zeros(1, dtype=np.int64), starts))
                out = reducer.reduceat(w[_col_np(batch, 1)], starts)
                yield pa.RecordBatch.from_arrays(
                    [pa.array(keys[starts]), pa.array(out, type=out_type)],
                    ["k", "r"],
                )

        return fn

    return make


_sum_reduce = _segment_reduce(np.add, 0.0)
_max_reduce = _segment_reduce(np.maximum, np.iinfo(np.int64).min)
_min_reduce = _segment_reduce(np.minimum, np.iinfo(np.int64).max)


def gather_sum(adj: DataFrame, w: np.ndarray, n: int) -> np.ndarray:
    """One shuffle-free superstep: Σ w[v] per k → float64[n]."""
    spark = adj.sparkSession
    w_bc = spark.sparkContext.broadcast(w)
    try:
        with arrow_batch(spark, GATHER_BATCH_ROWS):
            pdf = adj.mapInArrow(_sum_reduce(w_bc, pa.float64()), "k int, r double").toPandas()
    finally:
        w_bc.destroy()
    out = np.zeros(n, dtype=np.float64)
    np.add.at(out, pdf["k"].to_numpy(), pdf["r"].to_numpy())
    return out


def gather_extreme(
    adj: DataFrame, w: np.ndarray, n: int, minimum: bool = False
) -> np.ndarray:
    """max (or min) of w[v] per k → int64[n]; vertices with no adjacency
    row keep the reducer's identity value."""
    spark = adj.sparkSession
    reducer, fill, ufunc = (
        (_min_reduce, np.iinfo(np.int64).max, np.minimum)
        if minimum
        else (_max_reduce, np.iinfo(np.int64).min, np.maximum)
    )
    w_bc = spark.sparkContext.broadcast(w)
    try:
        with arrow_batch(spark, GATHER_BATCH_ROWS):
            pdf = adj.mapInArrow(reducer(w_bc, pa.int64()), "k int, r long").toPandas()
    finally:
        w_bc.destroy()
    out = np.full(n, fill, dtype=np.int64)
    ufunc.at(out, pdf["k"].to_numpy(), pdf["r"].to_numpy())
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
