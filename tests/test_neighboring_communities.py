from tests.conftest import edges_df
from tests import fixture_graphs as G

from distributed_graph_analytics_spark.operators.neighboring_communities import (
    neighboring_communities,
)
from tests.test_louvain import EXAMPLE9


def test_example9_cross_community_edges(spark):
    # level-0 communities are {1..5}→4 and {6..9}→8 (README golden);
    # the single bridge edge 1-6 is the only cross-community edge
    out = neighboring_communities(edges_df(spark, EXAMPLE9)).collect()
    assert len(out) == len(EXAMPLE9)
    cross = [(r["src"], r["dst"]) for r in out if r["cross_community"]]
    assert cross == [(1, 6)]
    # single weakly-connected component labeled by the max id (9)
    assert {r["component"] for r in out} == {9}


def test_disjoint_components_no_cross(spark):
    edges = G.TRI_CYCLE + [(10, 11), (11, 12), (12, 10)]
    out = neighboring_communities(edges_df(spark, edges)).collect()
    assert all(not r["cross_community"] for r in out)
    comps = {r["component"] for r in out}
    assert comps == {3, 12}
