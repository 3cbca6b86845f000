import math

import pytest

from tests.conftest import edges_df
from tests import fixture_graphs as G
from tests.oracles import pagerank_oracle

from distributed_graph_analytics_spark.operators.pagerank import pagerank


def run_pr(spark, edge_list):
    ranks, stats = pagerank(edges_df(spark, edge_list))
    return {r["id"]: r["rank"] for r in ranks.collect()}, stats


ALL_GRAPHS = [
    G.PR_EQUAL3,
    G.PR_STAR_IN,
    G.PR_CYCLE,
    G.PR_STAR_OUT_G,
    G.PR_STAR_IN_G,
    G.TWO_CLIQUES_BRIDGED,
    G.WCC_BIG,
]


@pytest.mark.parametrize("edge_list", ALL_GRAPHS)
def test_pagerank_allclose_oracle(spark, edge_list):
    got, stats = run_pr(spark, edge_list)
    want = pagerank_oracle(edge_list)
    assert set(got) == set(want)
    for v in want:
        assert math.isclose(got[v], want[v], rel_tol=1e-6, abs_tol=1e-9), (
            v, got[v], want[v])


def test_pagerank_orderings(spark):
    # reference assertions: in-star center ranks highest, others equal
    got, _ = run_pr(spark, G.PR_STAR_IN)
    assert all(got[1] > got[v] for v in (2, 3, 4, 5, 6))
    others = [got[v] for v in (2, 3, 4, 5, 6)]
    assert max(others) - min(others) < 1e-12
    # equal-3: vertices 1,2,3 tie (PageRankCoreTest.scala:39)
    got, _ = run_pr(spark, G.PR_EQUAL3)
    assert math.isclose(got[1], got[2], rel_tol=1e-9)
    assert math.isclose(got[2], got[3], rel_tol=1e-9)
    # cycle: all equal
    got, _ = run_pr(spark, G.PR_CYCLE)
    assert max(got.values()) - min(got.values()) < 1e-12
    # giraph out-star: center has lowest rank
    got, _ = run_pr(spark, G.PR_STAR_OUT_G)
    assert all(got[1] < got[v] for v in range(2, 9))


# ---- GraphX delta-push variant (PageRankCore.runPageRank) ----

from distributed_graph_analytics_spark.operators.pagerank import (  # noqa: E402
    pagerank_delta_push,
)


def delta_push_oracle(edge_list, delta=0.001, damping=0.85):
    """Pure-Python twin of the GraphX Pregel delta formulation
    (PageRankCore.scala:33-72): same initial message, vertex program,
    send gate, and active-set semantics."""
    from collections import defaultdict

    out = defaultdict(list)
    verts = set()
    for e in edge_list:
        out[e[0]].append(e[1])
        verts |= {e[0], e[1]}
    n = len(verts)
    rank = {v: 1.0 / n for v in verts}
    dlt = {}
    for v in verts:  # superstep 0: initial message 1/N to everyone
        rank[v] += damping * (1.0 / n)
        dlt[v] = damping * (1.0 / n)
    active = set(verts)
    while True:
        msgs = defaultdict(float)
        for v in active:
            if dlt[v] > delta and out[v]:
                od = len(out[v])
                for w in out[v]:
                    msgs[w] += dlt[v] / od
        if not msgs:
            return rank
        for w, s in msgs.items():
            rank[w] += damping * s
            dlt[w] = damping * s
        active = set(msgs)


@pytest.mark.parametrize(
    "edge_list",
    [G.PR_EQUAL3, G.PR_STAR_IN, G.PR_CYCLE, G.PR_STAR_OUT_G],
    ids=["equal3", "star_in", "cycle", "star_out"],
)
def test_delta_push_matches_pregel_twin(spark, edge_list):
    ranks, stats = pagerank_delta_push(edges_df(spark, edge_list))
    got = {r["id"]: r["rank"] for r in ranks.collect()}
    want = delta_push_oracle(edge_list)
    assert stats.converged
    assert set(got) == set(want)
    for v in got:
        assert math.isclose(got[v], want[v], rel_tol=1e-9, abs_tol=1e-12), (
            v, got[v], want[v])


def test_empty_and_degenerate_graphs(spark):
    empty = spark.createDataFrame([], "src long, dst long, weight long")
    for op in (pagerank, pagerank_delta_push):
        ranks, stats = op(empty)
        assert ranks.count() == 0
        assert stats.converged
    loop_edge = spark.createDataFrame([(1, 1, 1)], "src long, dst long, weight long")
    ranks, _ = pagerank(loop_edge)
    assert ranks.count() == 1


from distributed_graph_analytics_spark.operators.pagerank import (  # noqa: E402
    personalized_pagerank,
)
from tests.oracles import ppr_oracle  # noqa: E402


@pytest.mark.parametrize("edge_list", [G.PR_CYCLE, G.TWO_CLIQUES_BRIDGED])
def test_ppr_matches_python_twin(spark, edge_list):
    srcs = sorted({int(e[0]) for e in edge_list})[:2]
    edges = edges_df(spark, edge_list)
    got_df, stats = personalized_pagerank(
        edges, spark.createDataFrame([(s,) for s in srcs], ["id"])
    )
    got = {r["id"]: r["rank"] for r in got_df.collect()}
    want = ppr_oracle(edge_list, srcs)
    assert set(got) == set(want)
    for v in want:
        assert math.isclose(got[v], want[v], rel_tol=1e-9, abs_tol=1e-12), (
            v, got[v], want[v])
    assert stats.converged
    # teleport mass localizes: every source outranks the global minimum,
    # and total mass never exceeds 1 (dangling mass only leaks out)
    assert sum(got.values()) <= 1.0 + 1e-9
    assert min(got[s] for s in srcs) > min(got.values())


def test_ppr_requires_sources(spark):
    edges = edges_df(spark, G.PR_CYCLE)
    with pytest.raises(ValueError, match="non-empty source set"):
        personalized_pagerank(edges, edges.select("src").alias("id").where("src < 0").selectExpr("src as id"))
