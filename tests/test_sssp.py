"""Weighted SSSP: Dijkstra twin, unreachable handling, oracle-round
bound pin."""

import collections
import heapq

from distributed_graph_analytics_spark.operators.sssp import sssp


def dijkstra(pairs_w, src):
    adj = collections.defaultdict(list)
    for u, v, w in pairs_w:
        adj[u].append((v, w))
        adj[v].append((u, w))
    dist = {src: 0}
    pq = [(0, src)]
    while pq:
        d, v = heapq.heappop(pq)
        if d > dist.get(v, 1 << 60):
            continue
        for nb, w in adj[v]:
            nd = d + w
            if nd < dist.get(nb, 1 << 60):
                dist[nb] = nd
                heapq.heappush(pq, (nd, nb))
    return dist


def test_weighted_fixture_prefers_cheap_two_hop(spark):
    # direct 1-3 costs 10; 1-2-3 costs 2 — BF must take the long way
    df = spark.createDataFrame(
        [(1, 3, 10), (1, 2, 1), (2, 3, 1), (3, 4, 5)],
        ["src", "dst", "weight"],
    )
    got, stats = sssp(df, 1)
    g = {r["id"]: r["dist"] for r in got.collect()}
    assert g == {1: 0, 2: 1, 3: 2, 4: 7}
    assert stats.converged


def test_unreachable_component_absent(spark):
    df = spark.createDataFrame(
        [(1, 2, 1), (10, 11, 1)], ["src", "dst", "weight"]
    )
    got, _ = sssp(df, 1)
    g = {r["id"]: r["dist"] for r in got.collect()}
    assert g == {1: 0, 2: 1}


def test_testdata_matches_dijkstra_and_round_bound(spark):
    from __spark_entry__ import load_edges

    e = load_edges(spark, "/root/testdata/sf0.001")
    pw = [
        (r["src"], r["dst"], r["weight"])
        for r in e.select("src", "dst", "weight").collect()
    ]
    got_df, stats = sssp(e, 0)
    got = {r["id"]: r["dist"] for r in got_df.collect()}
    assert got == dijkstra(pw, 0)
    # the driver oracle unrolls 6 Bellman-Ford rounds; relaxation is
    # idempotent at the fixed point, so exactness needs convergence
    # within 6 rounds — pin the bound
    assert stats.iterations <= 6
