import pytest

from tests.conftest import edges_df
from tests import fixture_graphs as G

from distributed_graph_analytics_spark.operators.star_components import (
    star_components,
)
from distributed_graph_analytics_spark.operators.wcc import (
    weakly_connected_components,
)


def labels(df):
    return {r["id"]: r["component"] for r in df.collect()}


@pytest.mark.parametrize(
    "edge_list,expect",
    [
        (G.WCC_CHAIN, G.WCC_CHAIN_EXPECT),
        (G.WCC_TWO, G.WCC_TWO_EXPECT),
        (G.WCC_MULTI, G.WCC_MULTI_EXPECT),
    ],
)
def test_star_exact_labels(spark, edge_list, expect):
    comp, stats = star_components(edges_df(spark, edge_list))
    assert labels(comp) == expect
    assert stats.converged


def test_star_matches_wcc_on_big_fixture(spark):
    e = edges_df(spark, G.WCC_BIG)
    got, _ = star_components(e)
    want, _ = weakly_connected_components(e)
    assert labels(got) == labels(want)


def test_star_min_label_matches_wcc_min_label(spark):
    e = edges_df(spark, G.WCC_MULTI)
    got, _ = star_components(e, min_label=True)
    want, _ = weakly_connected_components(e, min_label=True)
    assert labels(got) == labels(want)


def test_star_high_diameter_beats_label_prop_rounds(spark):
    """The point of the algorithm: a 60-vertex path has diameter 59 —
    label propagation needs ~60 supersteps, the star alternation
    converges in O(log² n) (single digits here)."""
    path = [(i, i + 1) for i in range(1, 60)]
    e = edges_df(spark, path)
    got, stats = star_components(e)
    assert labels(got) == {v: 60 for v in range(1, 61)}
    assert stats.converged
    _, wcc_stats = weakly_connected_components(e)
    assert stats.iterations < wcc_stats.iterations
    assert stats.iterations <= 10


def test_star_degenerate_inputs(spark):
    # self-loop only: vertex is its own component
    e = edges_df(spark, [(5, 5)])
    got, stats = star_components(e)
    assert labels(got) == {5: 5}
    assert stats.converged
    # empty edge frame
    empty = edges_df(spark, [])
    got, stats = star_components(empty)
    assert got.count() == 0 and stats.converged
    # duplicate + reverse-duplicate edges collapse
    e = edges_df(spark, [(1, 2), (2, 1), (1, 2)])
    got, _ = star_components(e)
    assert labels(got) == {1: 2, 2: 2}


def test_star_matches_wcc_on_testdata(spark):
    import __spark_entry__ as mod

    e = mod.load_edges(spark, "/root/testdata/sf0.001")
    got, stats = star_components(e)
    want, _ = weakly_connected_components(e, edges_canonical=True)
    assert labels(got) == labels(want)
    assert stats.converged


def test_star_matches_wcc_property_random_graphs(spark):
    """Property test: on seeded random graphs of varied shape (sparse,
    dense, many components, hub-heavy), the star kernel's labels equal
    label propagation's — both max- and min-label contracts."""
    from hypothesis import given, settings, strategies as st

    edge = st.tuples(
        st.integers(min_value=1, max_value=24),
        st.integers(min_value=1, max_value=24),
    )

    @settings(max_examples=12, deadline=None, derandomize=True)
    @given(st.lists(edge, min_size=1, max_size=40))
    def check(edge_list):
        e = edges_df(spark, edge_list)
        got, _ = star_components(e)
        want, _ = weakly_connected_components(e)
        assert labels(got) == labels(want)
        got_min, _ = star_components(e, min_label=True)
        want_min, _ = weakly_connected_components(e, min_label=True)
        assert labels(got_min) == labels(want_min)

    check()
