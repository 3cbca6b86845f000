"""Degenerate inputs (empty / single-edge / self-loop-only) through the
extension operators — no crashes, sensible outputs."""

from distributed_graph_analytics_spark.operators.kcore import core_numbers
from distributed_graph_analytics_spark.operators.link_prediction import (
    common_neighbor_scores,
)
from distributed_graph_analytics_spark.operators.sssp import sssp
from distributed_graph_analytics_spark.operators.walks import random_walks


def _df(spark, rows):
    return spark.createDataFrame(rows, "src long, dst long, weight long")


def test_empty_graph(spark):
    empty = _df(spark, [])
    assert core_numbers(empty)[0].collect() == []
    assert random_walks(empty, walk_length=2).collect() == []
    assert common_neighbor_scores(empty, min_common=1).collect() == []
    # sssp: the source alone at distance 0
    assert [(r["id"], r["dist"]) for r in sssp(empty, 1)[0].collect()] == [(1, 0)]


def test_single_edge(spark):
    single = _df(spark, [(1, 2, 1)])
    assert {
        (r["id"], r["core"]) for r in core_numbers(single)[0].collect()
    } == {(1, 1), (2, 1)}
    # a 2-step walk from each endpoint bounces deterministically
    walks = random_walks(single, walk_length=2).collect()
    assert len(walks) == 6
    assert common_neighbor_scores(single, min_common=1).collect() == []
    assert {
        (r["id"], r["dist"]) for r in sssp(single, 1)[0].collect()
    } == {(1, 0), (2, 1)}


def test_self_loop_only(spark):
    loop = _df(spark, [(5, 5, 1)])
    # canonicalize drops self-loops -> walks/linkpred see no graph
    assert random_walks(loop, walk_length=2).collect() == []
    assert common_neighbor_scores(loop, min_common=1).collect() == []
