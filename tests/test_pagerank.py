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
