"""Plan-shape invariants for the packed CSR-style adjacency builds.

The scaling work (BENCH/BASELINE.md) showed that shuffling or
columnar-encoding the PACKED array rows dominates the whole job, so
these tests pin the physical properties that keep the packing cheap:

1. exactly one Exchange below the packing aggregate, and it moves the
   FLAT rows (the explicit repartition on src/v) — never the arrays;
2. the packing aggregate's output partitioning is the superstep join
   key, so the per-iteration join adds no exchange on the packed side;
3. localCheckpoint preserves that partitioning into the LogicalRDD the
   supersteps actually join against.
"""

import re

import pytest
from pyspark.sql import functions as F

from distributed_graph_analytics_spark.operators.pagerank import build_out_adjacency
from distributed_graph_analytics_spark.operators.wcc import build_sym_adjacency
from distributed_graph_analytics_spark.plans.iteration import aqe_off


@pytest.fixture(scope="module")
def edges(spark):
    return spark.createDataFrame(
        [(1, 2, 1.0), (1, 3, 1.0), (2, 3, 1.0), (3, 4, 1.0), (4, 1, 1.0)],
        "src long, dst long, weight double",
    )


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_out_adjacency_single_flat_exchange(edges):
    adj = build_out_adjacency(edges, n_part=4)
    plan = _executed_plan(adj)
    # every Exchange in the aggregate's subtree must be over flat
    # (src,dst)-shaped rows: none may carry an array column
    exchanges = [ln for ln in plan.splitlines() if "Exchange" in ln and "Reused" not in ln]
    assert exchanges, "expected the explicit flat repartition Exchange"
    for ln in exchanges:
        assert "dsts" not in ln, f"array rows being shuffled: {ln}"
    # the packing aggregate runs directly on the join output — no
    # exchange between the ObjectHashAggregate pair (partial+final)
    agg_idx = [i for i, ln in enumerate(plan.splitlines()) if "ObjectHashAggregate" in ln]
    assert len(agg_idx) >= 2, plan
    between = plan.splitlines()[agg_idx[0] + 1 : agg_idx[1]]
    assert not any("Exchange" in ln for ln in between), (
        "exchange between partial and final packing aggregate:\n" + "\n".join(between)
    )


def test_out_adjacency_checkpoint_keeps_partitioning(spark, edges):
    # under AQE the checkpoint's LogicalRDD degrades to
    # UnknownPartitioning (AdaptiveSparkPlanExec hides the concrete
    # layout), which silently re-shuffles the arrays every superstep —
    # the aqe_off wrapper is what preserves it (plans.iteration.aqe_off)
    with aqe_off(spark):
        adj = build_out_adjacency(edges, n_part=4).localCheckpoint(eager=True)
    part = str(adj._jdf.queryExecution().executedPlan().outputPartitioning())
    assert re.search(r"hashpartitioning\(src#\d+L?, 4\)", part), part


def test_sym_adjacency_checkpoint_keeps_partitioning(spark, edges):
    with aqe_off(spark):
        nbrs = build_sym_adjacency(
            edges, n_part=4, edges_canonical=True
        ).localCheckpoint(eager=True)
    part = str(nbrs._jdf.queryExecution().executedPlan().outputPartitioning())
    assert re.search(r"hashpartitioning\(v#\d+L?, 4\)", part), part


def test_superstep_join_no_exchange_on_checkpointed_adj(spark, edges):
    """The per-superstep join against the checkpointed adjacency must
    exchange ONLY the state side."""
    from pyspark.sql import functions as F

    with aqe_off(spark):
        adj = build_out_adjacency(edges, n_part=4).localCheckpoint(eager=True)
        state = spark.createDataFrame(
            [(1, 0.25), (2, 0.25)], "id long, rank double"
        ).hint("shuffle_hash")
        plan = _executed_plan(adj.join(state, adj["src"] == state["id"]))
    exchanges = [
        ln.strip() for ln in plan.splitlines() if "Exchange" in ln and "Reused" not in ln
    ]
    assert len(exchanges) == 1, exchanges
    assert "id#" in exchanges[0], exchanges[0]


def test_out_adjacency_contents(edges):
    rows = {
        r["src"]: (sorted(r["dsts"]), r["inv_deg"])
        for r in build_out_adjacency(edges, n_part=2).collect()
    }
    assert rows[1] == ([2, 3], 0.5)
    assert rows[2] == ([3], 1.0)
    assert rows[3] == ([4], 1.0)
    assert rows[4] == ([1], 1.0)


def test_chunked_splits_hub_arrays(spark, monkeypatch):
    """Above ADJ_CHUNK the packed row must split into bounded slices
    that together preserve the neighbor multiset (position-salted)."""
    import importlib

    pr_mod = importlib.import_module(
        "distributed_graph_analytics_spark.operators.pagerank"
    )
    monkeypatch.setattr(pr_mod, "ADJ_CHUNK", 4)
    hub_edges = spark.createDataFrame(
        [(100, d, 1.0) for d in range(1, 12)] + [(2, 100, 1.0)],
        "src long, dst long, weight double",
    )
    adj = pr_mod.build_out_adjacency(hub_edges, n_part=2)
    rows = adj.collect()
    hub_rows = [r for r in rows if r["src"] == 100]
    assert sorted(len(r["dsts"]) for r in hub_rows) == [3, 4, 4]
    assert sorted(d for r in hub_rows for d in r["dsts"]) == list(range(1, 12))
    # inv_deg reflects the FULL degree on every chunk row
    assert all(abs(r["inv_deg"] - 1.0 / 11) < 1e-12 for r in hub_rows)


def test_pagerank_correct_with_split_hubs(spark, monkeypatch):
    """PageRank ranks must be identical whether or not hub rows split."""
    import importlib

    pr_mod = importlib.import_module(
        "distributed_graph_analytics_spark.operators.pagerank"
    )
    edges = spark.createDataFrame(
        [(100, d, 1.0) for d in range(1, 12)]
        + [(d, 100, 1.0) for d in range(1, 12)],
        "src long, dst long, weight double",
    )
    baseline = {
        r["id"]: r["rank"]
        for r in pr_mod.pagerank(edges, max_iterations=5)[0].collect()
    }
    monkeypatch.setattr(pr_mod, "ADJ_CHUNK", 4)
    split = {
        r["id"]: r["rank"]
        for r in pr_mod.pagerank(edges, max_iterations=5)[0].collect()
    }
    assert baseline.keys() == split.keys()
    for k in baseline:
        assert abs(baseline[k] - split[k]) < 1e-12, k


def test_sym_adjacency_contents(edges):
    rows = {
        r["v"]: sorted(r["us"])
        for r in build_sym_adjacency(edges, n_part=2, edges_canonical=True).collect()
    }
    assert rows[1] == [2, 3, 4]
    assert rows[2] == [1, 3]
    assert rows[3] == [1, 2, 4]
    assert rows[4] == [1, 3]


def test_full_superstep_single_exchange(spark):
    """End-to-end superstep plan invariant: with the adjacency AND the
    state both checkpointed under aqe_off carrying concrete hash
    layouts, one PageRank superstep contains exactly ONE exchange — the
    intrinsic message aggregation (explode -> groupBy id). The
    adjacency-state join and the state-contribs join are co-partitioned."""
    from distributed_graph_analytics_spark.plans.join_strategy import maybe_broadcast

    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    edges = spark.range(1000).select(
        (F.col("id") % 97).alias("src"), (F.col("id") % 31 + 3).alias("dst")
    )
    with aqe_off(spark):
        adj = build_out_adjacency(edges, n_part).localCheckpoint(eager=True)
        state = (
            spark.range(100)
            .select(F.col("id"), F.lit(0.01).alias("rank"))
            .repartition(n_part, "id")
            .localCheckpoint(eager=True)
        )
    n = 200_000  # force the shuffle_hash (non-broadcast) path
    bstate = maybe_broadcast(state, n)
    contribs = (
        adj.join(bstate, adj["src"] == bstate["id"])
        .select(
            F.explode("dsts").alias("id"),
            (F.col("rank") * F.col("inv_deg")).alias("c"),
        )
        .groupBy("id")
        .agg(F.sum("c").alias("msg_sum"))
    )
    new_state = (
        state.withColumnRenamed("rank", "old_rank")
        .join(maybe_broadcast(contribs, n), "id", "left_outer")
        .select("id", F.coalesce("msg_sum", F.lit(0.0)).alias("rank"))
    )
    with aqe_off(spark):
        plan = _executed_plan(new_state)
    exchanges = [
        ln.strip()
        for ln in plan.splitlines()
        if "Exchange" in ln and "Reused" not in ln
    ]
    assert len(exchanges) == 1, exchanges


def test_kcore_superstep_plan_shape(spark):
    """kcore's frontier superstep: every exchange carries
    frontier-proportional rows (4 total: dirty-distinct, value-pull
    rekey, histogram agg, per-receiver window over DISTINCT-VALUE
    rows), and there is NO row_number/full-width sort over raw message
    rows — the skew-safe h-index comes from the capped-value histogram
    (operators/kcore.py), so a hub's superstep cost is one combinable
    hash aggregate, not a 10M-row per-receiver sort."""
    from pyspark.sql import Window

    from distributed_graph_analytics_spark.operators.wcc import (
        build_sym_adjacency,
    )
    from distributed_graph_analytics_spark.plans.join_strategy import (
        maybe_broadcast,
    )

    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    e = spark.range(1000).select(
        (F.col("id") % 97).alias("src"), (F.col("id") % 31 + 3).alias("dst")
    )
    with aqe_off(spark):
        nbrs = build_sym_adjacency(e, n_part).localCheckpoint(eager=True)
        state = (
            nbrs.select(F.col("v").alias("id"))
            .distinct()
            .select(
                "id",
                F.lit(5).cast("long").alias("core"),
                F.lit(True).alias("changed"),
            )
            .repartition(n_part, "id")
            .localCheckpoint(eager=True)
        )
    n = 200_000  # force the shuffle_hash path
    # mirror of core_numbers' step (operators/kcore.py)
    changed_senders = state.where("changed").select(F.col("id").alias("v"))
    dirty = (
        nbrs.join(maybe_broadcast(changed_senders, n), "v")
        .select(F.explode("us").alias("id"))
        .distinct()
    )
    pulls = (
        dirty.join(state.select("id", F.col("core").alias("cur")), "id")
        .select(F.col("id").alias("v"), "cur")
        .join(nbrs, "v")
        .select(F.col("v").alias("id"), "cur", F.explode("us").alias("u"))
    )
    vals = pulls.join(
        state.select(F.col("id").alias("u"), F.col("core").alias("nval")), "u"
    )
    hist = (
        vals.select("id", F.least("nval", "cur").alias("cv"))
        .groupBy("id", "cv")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w_cum = (
        Window.partitionBy("id")
        .orderBy(F.desc("cv"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    h = (
        hist.withColumn("cum", F.sum("cnt").over(w_cum))
        .select("id", F.least("cv", "cum").alias("hc"))
        .groupBy("id")
        .agg(F.max("hc").alias("h"))
    )
    new_state = state.join(maybe_broadcast(h, n), "id", "left_outer").select(
        "id", F.least("core", F.coalesce("h", F.col("core"))).alias("core")
    )
    with aqe_off(spark):
        plan = _executed_plan(new_state)
    exchanges = [
        ln.strip()
        for ln in plan.splitlines()
        if "Exchange" in ln and "Reused" not in ln
    ]
    assert len(exchanges) == 4, exchanges
    # the round-2 weak spot: a per-receiver row_number sort over raw
    # message rows. The only Sort allowed is the window's, and its
    # input is the (id, value)-collapsed histogram aggregate.
    assert "row_number" not in plan.lower()
    sort_lines = [ln for ln in plan.splitlines() if "Sort " in ln]
    assert len(sort_lines) <= 1, sort_lines


def test_sssp_superstep_single_exchange(spark):
    """sssp's relax superstep: one exchange (candidate re-key to the
    receiver); the min-combine groupBy and the full-outer state join
    reuse it."""
    from distributed_graph_analytics_spark.operators.sssp import (
        _packed_weighted,
    )
    from distributed_graph_analytics_spark.plans.join_strategy import (
        maybe_broadcast,
    )

    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    e = spark.range(1000).select(
        (F.col("id") % 97).alias("src"),
        (F.col("id") % 31 + 3).alias("dst"),
        F.lit(1).cast("long").alias("w"),
    )
    sym = e.select(F.col("src").alias("v"), F.col("dst").alias("nb"), "w")
    with aqe_off(spark):
        nbrs = _packed_weighted(sym, n_part).localCheckpoint(eager=True)
        state = (
            nbrs.select(F.col("v").alias("id"))
            .distinct()
            .select("id", F.lit(3).cast("long").alias("dist"))
            .repartition(n_part, "id")
            .localCheckpoint(eager=True)
        )
    n = 200_000
    frontier = state
    cands = (
        nbrs.join(maybe_broadcast(frontier, n), nbrs["v"] == frontier["id"])
        .select(F.explode("nbs").alias("e"), F.col("dist").alias("d0"))
        .select(
            F.col("e.nb").alias("id"), (F.col("d0") + F.col("e.w")).alias("cand")
        )
        .groupBy("id")
        .agg(F.min("cand").alias("cand"))
    )
    new_state = state.join(maybe_broadcast(cands, n), "id", "full_outer").select(
        "id", F.least("dist", F.coalesce("cand", "dist")).alias("dist")
    )
    with aqe_off(spark):
        plan = _executed_plan(new_state)
    exchanges = [
        ln.strip()
        for ln in plan.splitlines()
        if "Exchange" in ln and "Reused" not in ln
    ]
    assert len(exchanges) == 1, exchanges


def test_compact_ids_bit_identical(spark):
    """compact_ids packs int arrays; results must be bit-identical to
    the long packing (probed within-JVM at 38M edges / 4 cores: build
    time within noise — kept opt-in, not a default)."""
    from distributed_graph_analytics_spark.operators.pagerank import pagerank
    from distributed_graph_analytics_spark.operators.wcc import (
        weakly_connected_components,
    )

    e = spark.range(500).select(
        (F.col("id") % 83).alias("src"), (F.col("id") % 29 + 2).alias("dst")
    )
    for fn in (
        lambda c: weakly_connected_components(e, compact_ids=c)[0],
        lambda c: pagerank(e, epsilon=0.0, max_iterations=5, compact_ids=c)[0],
    ):
        a = sorted(map(tuple, fn(False).collect()))
        b = sorted(map(tuple, fn(True).collect()))
        assert a == b
        # output schema contract stays LONG ids
        assert dict(fn(True).dtypes)["id"] == "bigint"


def test_compact_ids_rejects_out_of_range(spark):
    """compact_ids packs neighbor ids as int; an id past 2^31-1 must
    ERROR at build time, not silently wrap into corrupt scores
    (non-ANSI cast semantics would wrap without the guard)."""
    import pytest as _pytest

    from distributed_graph_analytics_spark.operators.pagerank import (
        build_out_adjacency,
    )

    big = spark.createDataFrame(
        [(1, 2), (2, (1 << 31) + 7)], ["src", "dst"]
    )
    with _pytest.raises(Exception, match="compact_ids requires"):
        build_out_adjacency(big, 4, compact_ids=True).collect()
    # in-range ids still pack fine
    ok = spark.createDataFrame([(1, 2), (2, (1 << 31) - 1)], ["src", "dst"])
    packed = build_out_adjacency(ok, 4, compact_ids=True).collect()
    assert {r["src"] for r in packed} == {1, 2}
