import pytest

from tests.conftest import edges_df
from tests import fixture_graphs as G
from tests.oracles import wcc_oracle

from distributed_graph_analytics_spark.operators.wcc import (
    weakly_connected_components,
)


def run_wcc(spark, edge_list):
    comp, stats = weakly_connected_components(edges_df(spark, edge_list))
    return {r["id"]: r["component"] for r in comp.collect()}, stats


@pytest.mark.parametrize(
    "edge_list,expect",
    [
        (G.WCC_CHAIN, G.WCC_CHAIN_EXPECT),
        (G.WCC_TWO, G.WCC_TWO_EXPECT),
        (G.WCC_MULTI, G.WCC_MULTI_EXPECT),
    ],
)
def test_wcc_exact_labels(spark, edge_list, expect):
    got, stats = run_wcc(spark, edge_list)
    assert got == expect
    assert stats.converged


def test_wcc_big_component_sizes(spark):
    got, _ = run_wcc(spark, G.WCC_BIG)
    sizes = {}
    for comp in got.values():
        sizes[comp] = sizes.get(comp, 0) + 1
    assert sizes == G.WCC_BIG_EXPECT_SIZES
    # cross-check every label against the union-find oracle
    assert got == wcc_oracle(G.WCC_BIG)


def test_wcc_matches_oracle_on_cliques(spark):
    got, _ = run_wcc(spark, G.TWO_CLIQUES_BRIDGED)
    assert got == wcc_oracle(G.TWO_CLIQUES_BRIDGED)


def min_expect(expect):
    """Min-label twin of a max-label expectation: same partition of
    vertices into components, labeled by the LOWEST member id."""
    groups = {}
    for v, comp in expect.items():
        groups.setdefault(comp, []).append(v)
    return {v: min(vs) for vs in groups.values() for v in vs}


@pytest.mark.parametrize(
    "edge_list,expect",
    [
        (G.WCC_CHAIN, G.WCC_CHAIN_EXPECT),
        (G.WCC_TWO, G.WCC_TWO_EXPECT),
        (G.WCC_MULTI, G.WCC_MULTI_EXPECT),
    ],
)
def test_wcc_min_label_exact(spark, edge_list, expect):
    """min_label=True — GraphX Graph.connectedComponents() semantics
    (the reference's wccGraphX analytic, DGARunner.scala:96-117):
    components labeled by the LOWEST vertex id, exactly."""
    comp, stats = weakly_connected_components(
        edges_df(spark, edge_list), min_label=True
    )
    got = {r["id"]: r["component"] for r in comp.collect()}
    assert got == min_expect(expect)
    assert stats.converged


def test_wcc_min_label_matches_oracle_on_big(spark):
    comp, _ = weakly_connected_components(
        edges_df(spark, G.WCC_BIG), min_label=True
    )
    got = {r["id"]: r["component"] for r in comp.collect()}
    assert got == min_expect(wcc_oracle(G.WCC_BIG))
