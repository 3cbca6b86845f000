"""k-truss: brute-force twin, known fixtures, fixed-round contract."""

import itertools


def _truss_twin(pairs, k, rounds=100):
    edges = {tuple(sorted(e)) for e in pairs if e[0] != e[1]}
    for _ in range(rounds):
        tris = [
            t
            for t in itertools.combinations(sorted({v for e in edges for v in e}), 3)
            if {(t[0], t[1]), (t[0], t[2]), (t[1], t[2])} <= edges
        ]
        sup = {e: 0 for e in edges}
        for a, b, c in tris:
            for e in ((a, b), (a, c), (b, c)):
                sup[e] += 1
        nxt = {e for e in edges if sup[e] >= k - 2}
        if nxt == edges:
            break
        edges = nxt
    return edges


def test_ktruss_clique_survives_bridge_dies(spark):
    from distributed_graph_analytics_spark.operators.truss import k_truss

    # two 4-cliques joined by one bridge edge: the 4-truss is the two
    # cliques (every clique edge sits in 2 triangles); the bridge (and
    # nothing else) is peeled
    c1 = [(a, b) for a, b in itertools.combinations([1, 2, 3, 4], 2)]
    c2 = [(a, b) for a, b in itertools.combinations([5, 6, 7, 8], 2)]
    pairs = c1 + c2 + [(4, 5)]
    df = spark.createDataFrame(
        [(u, v, 1) for u, v in pairs], "src long, dst long, weight long"
    )
    got = {(r["src"], r["dst"]) for r in k_truss(df, k=4, rounds=6).collect()}
    assert got == set(c1) | set(c2)
    assert got == _truss_twin(pairs, 4)


def test_ktruss_cascade_matches_twin(spark):
    from distributed_graph_analytics_spark.operators.truss import k_truss

    # triangle chain: peeling one edge cascades; twin runs to fixed point
    pairs = [(1, 2), (2, 3), (1, 3), (3, 4), (2, 4), (4, 5), (3, 5), (5, 6)]
    df = spark.createDataFrame(
        [(u, v, 1) for u, v in pairs], "src long, dst long, weight long"
    )
    got = {(r["src"], r["dst"]) for r in k_truss(df, k=3, rounds=8).collect()}
    assert got == _truss_twin(pairs, 3)


def test_ktruss_k2_keeps_everything(spark):
    from distributed_graph_analytics_spark.operators.truss import k_truss

    pairs = [(1, 2), (3, 4), (2, 3)]
    df = spark.createDataFrame(
        [(u, v, 1) for u, v in pairs], "src long, dst long, weight long"
    )
    got = {(r["src"], r["dst"]) for r in k_truss(df, k=2, rounds=3).collect()}
    assert got == set(pairs)


def test_ktruss_incremental_matches_full_per_round(spark):
    """The incremental support maintenance (round 2+ updates the
    standing support table by the triangles lost to dropped edges)
    must equal the full per-round recomputation at EVERY round — the
    fixed-round driver oracle depends on per-round equality, not just
    the fixed point."""
    from distributed_graph_analytics_spark.operators.truss import k_truss

    # cascade fixture: triangle chain + a clique tail so several rounds
    # drop a different, shrinking edge set
    pairs = [
        (1, 2), (2, 3), (1, 3), (3, 4), (2, 4), (4, 5), (3, 5), (5, 6),
        (6, 7), (6, 8), (7, 8), (7, 9), (8, 9), (9, 1),
    ]
    df = spark.createDataFrame(
        [(u, v, 1) for u, v in pairs], "src long, dst long, weight long"
    )
    for r in range(1, 6):
        got = {(x["src"], x["dst"]) for x in k_truss(df, k=3, rounds=r).collect()}
        assert got == _truss_twin(pairs, 3, rounds=r), f"round {r}"
