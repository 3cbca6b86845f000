from tests.conftest import edges_df
from tests import fixture_graphs as G

from distributed_graph_analytics_spark.operators.lpa import label_propagation


def run_lpa(spark, edge_list, **kw):
    labels, stats = label_propagation(edges_df(spark, edge_list), **kw)
    return {r["id"]: r["label"] for r in labels.collect()}, stats


def test_two_cliques_get_two_labels(spark):
    got, _ = run_lpa(spark, G.TWO_CLIQUES_BRIDGED, max_iterations=10)
    labels_a = {got[v] for v in range(1, 6)}
    labels_b = {got[v] for v in range(10, 15)}
    assert len(labels_a) == 1
    assert len(labels_b) == 1
    assert labels_a != labels_b


def test_deterministic(spark):
    a, _ = run_lpa(spark, G.TWO_CLIQUES_BRIDGED, max_iterations=5)
    b, _ = run_lpa(spark, G.TWO_CLIQUES_BRIDGED, max_iterations=5)
    assert a == b


def test_isolated_edge_pair_converges(spark):
    got, stats = run_lpa(spark, [(1, 2)], max_iterations=10)
    # 1 and 2 vote for each other's label; tie-break by larger label
    assert got[1] == got[2] == 2 or set(got.values()) == {1, 2}
    assert stats.iterations <= 10
