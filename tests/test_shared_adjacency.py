"""ShuffleGraph (plans/adjacency.py) — the shuffle tier's shared
packed-adjacency artifact.

Pins (a) the derived IN pack's contents and layout, (b) bit-identical
results AND identical iteration trajectories for PageRank/WCC run over
a shared ShuffleGraph vs standalone, (c) the two-pack superstep plan
shape (no exchange on either packed side, one message-aggregation
exchange), mirroring tests/test_adjacency_plan.py for the single-pack
kernel.
"""

import re

import pytest
from pyspark.sql import functions as F

from distributed_graph_analytics_spark.operators.pagerank import pagerank
from distributed_graph_analytics_spark.operators.wcc import (
    weakly_connected_components,
)
from distributed_graph_analytics_spark.plans.adjacency import ShuffleGraph
from distributed_graph_analytics_spark.plans.iteration import aqe_off
from distributed_graph_analytics_spark.plans.join_strategy import maybe_broadcast


@pytest.fixture(scope="module")
def edges(spark):
    # two components, a dangling vertex (9 has only in-edges), a
    # parallel-ish structure across directions
    return spark.createDataFrame(
        [(1, 2, 1.0), (1, 3, 1.0), (2, 3, 1.0), (3, 4, 1.0), (4, 1, 1.0),
         (5, 6, 1.0), (6, 7, 1.0), (7, 5, 1.0), (5, 9, 1.0)],
        "src long, dst long, weight double",
    )


def test_in_adjacency_contents(edges):
    g = ShuffleGraph(edges, num_partitions=2)
    rows = {r["v"]: sorted(r["us"]) for r in g.in_adjacency().collect()}
    # receivers keyed by v, neighbor lists = in-neighbors
    assert rows == {
        2: [1], 3: [1, 2], 4: [3], 1: [4], 6: [5], 7: [6], 5: [7], 9: [5],
    }
    g.release()


def test_vertices_cover_dangling(edges):
    g = ShuffleGraph(edges, num_partitions=2)
    ids = {r["id"] for r in g.vertices().collect()}
    assert ids == {1, 2, 3, 4, 5, 6, 7, 9}
    assert g.n == 8
    g.release()


def test_wcc_shared_matches_standalone(edges):
    base, base_stats = weakly_connected_components(edges, strategy="shuffle")
    g = ShuffleGraph(edges)
    shared, shared_stats = weakly_connected_components(edges, shuffle_graph=g)
    a = sorted(map(tuple, base.collect()))
    b = sorted(map(tuple, shared.collect()))
    assert a == b
    # identical iteration trajectory: same changed-count per superstep
    assert [h["changed"] for h in base_stats.history] == [
        h["changed"] for h in shared_stats.history
    ]
    g.release()


def test_wcc_shared_min_label(edges):
    base = weakly_connected_components(edges, strategy="shuffle", min_label=True)[0]
    g = ShuffleGraph(edges)
    shared = weakly_connected_components(edges, shuffle_graph=g, min_label=True)[0]
    assert sorted(map(tuple, base.collect())) == sorted(map(tuple, shared.collect()))
    g.release()


def test_pagerank_shared_bit_identical(edges):
    base = pagerank(edges, strategy="shuffle", epsilon=0.0, max_iterations=5)[0]
    g = ShuffleGraph(edges)
    shared = pagerank(edges, shuffle_graph=g, epsilon=0.0, max_iterations=5)[0]
    a = {r["id"]: r["rank"] for r in base.collect()}
    b = {r["id"]: r["rank"] for r in shared.collect()}
    assert a.keys() == b.keys()
    for k in a:  # same plan, same float op order -> bit identical
        assert a[k] == b[k], k
    g.release()


def test_pipeline_reuses_one_out_pack(edges):
    """PR then WCC over one ShuffleGraph must build the out pack once:
    the instance the second operator sees is the SAME checkpointed
    DataFrame object, and the vertex count job runs once."""
    g = ShuffleGraph(edges)
    pagerank(edges, shuffle_graph=g, epsilon=0.0, max_iterations=2)
    out_after_pr = g._out
    verts_after_pr = g._vertices
    assert out_after_pr is not None and verts_after_pr is not None
    weakly_connected_components(edges, shuffle_graph=g)
    assert g._out is out_after_pr
    assert g._vertices is verts_after_pr
    g.release()


def test_shared_compact_ids_bit_identical(edges):
    base = weakly_connected_components(edges, strategy="shuffle")[0]
    g = ShuffleGraph(edges, compact_ids=True)
    shared = weakly_connected_components(edges, shuffle_graph=g)[0]
    assert sorted(map(tuple, base.collect())) == sorted(map(tuple, shared.collect()))
    assert dict(shared.dtypes)["id"] == "bigint"
    g.release()


def test_in_adjacency_checkpoint_keeps_partitioning(spark, edges):
    """The captured hash(v) layout must reference the LogicalRDD's OWN
    output attribute: a redundant cast/alias in the derivation gets
    optimizer-stripped, leaving the partitioning on a stale exprId —
    syntactically present but useless to every downstream join (the
    original bug this test pinned down)."""
    g = ShuffleGraph(edges, num_partitions=4)
    plan = g.in_adjacency()._jdf.queryExecution().executedPlan()
    part = str(plan.outputPartitioning())
    m = re.search(r"hashpartitioning\(v#(\d+)L?, 4\)", part)
    assert m, part
    out_ids = re.findall(r"#(\d+)", plan.output().toString())
    assert m.group(1) in out_ids, (part, out_ids)
    g.release()


def test_in_adjacency_compact_checkpoint_keeps_partitioning(spark, edges):
    g = ShuffleGraph(edges, num_partitions=4, compact_ids=True)
    plan = g.in_adjacency()._jdf.queryExecution().executedPlan()
    part = str(plan.outputPartitioning())
    m = re.search(r"hashpartitioning\(v#(\d+)L?, 4\)", part)
    assert m, part
    out_ids = re.findall(r"#(\d+)", plan.output().toString())
    assert m.group(1) in out_ids, (part, out_ids)
    g.release()


def test_two_pack_superstep_single_exchange(spark):
    """The shared-graph WCC superstep: the OUT view (alias src->v) and
    the IN pack both keep their checkpointed hash layouts, the frontier
    (a projection of the hash(id) state) is already clustered on v, so
    the whole message computation adds exactly ONE exchange — the merge
    aggregation — and no packed array row ever moves."""
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    e = spark.range(1000).select(
        (F.col("id") % 97).alias("src"), (F.col("id") % 31 + 3).alias("dst")
    )
    g = ShuffleGraph(e, num_partitions=n_part)
    nbr_tables = [
        g.out_adjacency().select(F.col("src").alias("v"), F.col("dsts").alias("us")),
        g.in_adjacency(),
    ]
    with aqe_off(spark):
        # component must not be a bare alias of id: the checkpoint's
        # alias-aware partitioning would normalize to hash(component)
        # and hide the layout from the id-keyed joins — real superstep
        # states come out of a join keyed on id (plans hash(id))
        state = (
            g.vertices()
            .select("id", (F.col("id") + F.lit(1)).alias("component"))
            .repartition(n_part, "id")
            .localCheckpoint(eager=True)
        )
    n = 200_000  # force the shuffle_hash (non-broadcast) path
    frontier = state.select(F.col("id").alias("v"), "component")
    parts = [
        t.join(maybe_broadcast(frontier, n), "v").select(
            F.explode("us").alias("_nb"), F.col("component").alias("cand")
        )
        for t in nbr_tables
    ]
    msgs = (
        parts[0]
        .unionByName(parts[1])
        .select(F.col("_nb").cast("long").alias("id"), "cand")
        .groupBy("id")
        .agg(F.max("cand").alias("cand"))
    )
    new_state = state.join(maybe_broadcast(msgs, n), "id", "left_outer").select(
        "id", F.greatest("component", "cand").alias("component")
    )
    with aqe_off(spark):
        plan = new_state._jdf.queryExecution().executedPlan().toString()
    exchanges = [
        ln.strip()
        for ln in plan.splitlines()
        if "Exchange" in ln and "Reused" not in ln
    ]
    assert len(exchanges) == 1, exchanges
    for ln in exchanges:
        assert "us" not in ln.split("[")[0] and "dsts" not in ln, ln
    g.release()
