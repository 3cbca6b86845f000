"""Deterministic random walks: python-twin replay (sha2), edge
validity, reproducibility across hash families."""

import collections
import hashlib

from distributed_graph_analytics_spark.operators.walks import random_walks


def _sha60(s):
    return int(hashlib.sha256(s.encode()).hexdigest()[:15], 16)


def _adj(pairs):
    adj = collections.defaultdict(set)
    for u, v in pairs:
        adj[u].add(v)
        adj[v].add(u)
    return adj


def _twin(pairs, walk_length, seed):
    adj = _adj(pairs)
    want = {}
    for v0 in adj:
        cur = v0
        want[(v0, 0)] = v0
        for t in range(1, walk_length + 1):
            nbrs = sorted(adj[cur])
            cur = nbrs[_sha60(f"{v0}:{t}:{seed}") % len(nbrs)]
            want[(v0, t)] = cur
    return want


def test_walks_replay_sha2_twin(spark):
    from __spark_entry__ import load_edges

    e = load_edges(spark, "/root/testdata/sf0.001")
    pairs = [(r["src"], r["dst"]) for r in e.select("src", "dst").collect()]
    got = {
        (r["walk_id"], r["step"]): r["vertex"]
        for r in random_walks(e, walk_length=4, hash_family="sha2").collect()
    }
    assert got == _twin(pairs, 4, 42)


def test_walk_steps_follow_edges_any_family(spark):
    # xxhash64 (production default) walks aren't replayed by the twin,
    # but every consecutive pair must still be a graph edge
    pairs = [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3)]
    df = spark.createDataFrame(pairs, ["src", "dst"])
    adj = _adj(pairs)
    rows = random_walks(df, walk_length=6).collect()
    by_walk = collections.defaultdict(dict)
    for r in rows:
        by_walk[r["walk_id"]][r["step"]] = r["vertex"]
    assert len(by_walk) == 4
    for wid, steps in by_walk.items():
        assert steps[0] == wid
        assert len(steps) == 7
        for t in range(1, 7):
            assert steps[t] in adj[steps[t - 1]]


def test_walks_deterministic_across_runs(spark):
    pairs = [(1, 2), (2, 3), (3, 1)]
    df = spark.createDataFrame(pairs, ["src", "dst"])
    a = sorted(map(tuple, random_walks(df, walk_length=5, seed=7).collect()))
    b = sorted(map(tuple, random_walks(df, walk_length=5, seed=7).collect()))
    c = sorted(map(tuple, random_walks(df, walk_length=5, seed=8).collect()))
    assert a == b
    assert a != c  # a different seed picks different branches
