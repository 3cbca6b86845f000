"""Pin the measured data-dependent halts that three driver oracles
unroll to fixed counts ("pagerank", "louvain_level0",
"neighboring_communities" in __spark_entry__.oracle_sql()).

Those oracles are measured-determinism unrolls: valid exactly when the
to-convergence loop halts at the recorded iteration/cycle count for the
sf dir being graded. This module makes that validity condition a
TESTED invariant instead of a comment — if testdata or a kernel change
moves a halt, these fail loudly and the constants
(__spark_entry__._PR_CONV_ITERS_BY_SF / _LOUVAIN_LEVEL_CYCLES_SF001)
must be re-measured, not patched.

Margin checks: a halt is only robust if max_delta clears eps by a wide
factor on BOTH sides (a halt decided by a hair could flip under float
summation-order noise and silently invalidate the unroll).
"""

from __future__ import annotations

import pytest

from __spark_entry__ import (
    _LOUVAIN_LEVEL_CYCLES_BY_SF,
    _LOUVAIN_LEVEL_CYCLES_SF001,
    _PR_CONV_ITERS_BY_SF,
    load_edges,
)
from distributed_graph_analytics_spark.operators.louvain import louvain
from distributed_graph_analytics_spark.operators.pagerank import pagerank

EPS = 0.001
# weakest measured halt margin: sf0.1's deciding max_delta clears eps
# by 1.49x above (0.0014917) / 1.96x below (0.00051039) — still ~7
# orders beyond float summation-order noise
MARGIN = 1.4


@pytest.mark.parametrize("sf", sorted(_PR_CONV_ITERS_BY_SF))
def test_pagerank_halt_iteration_pinned_with_margin(spark, sf):
    """PageRank (Giraph semantics, eps=0.001) halts at exactly the
    recorded iteration for each keyed sf, and the deciding max_delta
    values clear eps by >= 1.5x on both sides."""
    ranks, stats = pagerank(load_edges(spark, f"/root/testdata/sf{sf}"))
    ranks.count()
    assert stats.converged
    assert stats.iterations == _PR_CONV_ITERS_BY_SF[sf], (
        f"sf{sf} halt moved: re-measure _PR_CONV_ITERS_BY_SF"
    )
    deltas = [m["max_delta"] for m in stats.history]
    assert deltas[-2] >= MARGIN * EPS, deltas[-4:]
    assert deltas[-1] <= EPS / MARGIN, deltas[-4:]


def test_louvain_cycle_counts_pinned_at_grading_sf(spark):
    """Multi-level Louvain (reference CLI defaults minProgress=2000,
    progressCounter=1) runs exactly the recorded per-level move-cycle
    counts at sf0.01 — the unroll the "louvain_level0" (level 0) and
    "neighboring_communities" (all levels) oracles depend on."""
    res = louvain(
        load_edges(spark, "/root/testdata/sf0.01"),
        min_progress=2000,
        progress_counter=1,
    )
    # LouvainLevel.cycles counts even/odd PASS PAIRS (count // 2,
    # operators/louvain.py:465); the oracle constants are individual
    # move cycles, so compare at 2x. The pairing also pins that no
    # level halted mid-pair (an odd count would floor here and the
    # driver-green level-0 state equality would break first).
    got = [2 * lv.cycles for lv in res.levels]
    assert got == _LOUVAIN_LEVEL_CYCLES_SF001, (
        f"louvain halt trajectory moved ({got}): re-measure "
        "_LOUVAIN_LEVEL_CYCLES_SF001"
    )


def test_louvain_cycle_counts_pinned_at_sf01(spark):
    """sf0.1's measured trajectory ([8, 4, 4, 4] — level 0 halts after
    cycle 8 there, not 4): pins _LOUVAIN_LEVEL_CYCLES_BY_SF["0.1"] so
    the documented why-sf0.1-differs stays true, and a testdata or
    kernel change that moves it fails loudly."""
    res = louvain(
        load_edges(spark, "/root/testdata/sf0.1"),
        min_progress=2000,
        progress_counter=1,
    )
    got = [2 * lv.cycles for lv in res.levels]
    assert got == _LOUVAIN_LEVEL_CYCLES_BY_SF["0.1"], (
        f"sf0.1 louvain trajectory moved ({got}): re-measure "
        "_LOUVAIN_LEVEL_CYCLES_BY_SF"
    )


def test_louvain_by_sf_map_consistent():
    assert _LOUVAIN_LEVEL_CYCLES_BY_SF["0.01"] == _LOUVAIN_LEVEL_CYCLES_SF001


def test_closeness_oracle_unroll_covers_measured_diameter(spark):
    """The closeness oracle's fixed BFS unroll depth must exceed the
    pivots' measured eccentricity with margin at every graded scale
    (ADVICE r3: the bound is dataset-dependent — make it a tested
    invariant). Measured: max hops 2 (sf0.001) / 3 (sf0.01) / 3
    (sf0.1) vs _CLOSENESS_ROUNDS = 12."""
    import collections

    from __spark_entry__ import (
        _CLOSENESS_PIVOTS,
        _CLOSENESS_ROUNDS,
        _WALK_SEED,
    )
    from tests.test_closeness import _sha60

    for sf in ("0.001", "0.01"):
        rows = (
            load_edges(spark, f"/root/testdata/sf{sf}")
            .select("src", "dst")
            .collect()
        )
        adj = collections.defaultdict(set)
        for u, v in rows:
            if u != v:
                adj[u].add(v)
                adj[v].add(u)
        pivots = sorted(
            adj, key=lambda x: (_sha60(f"{x}:{_WALK_SEED}"), x)
        )[:_CLOSENESS_PIVOTS]
        ecc = 0
        for p in pivots:
            d = {p: 0}
            frontier = [p]
            while frontier:
                nxt = []
                for u in frontier:
                    for w in adj[u]:
                        if w not in d:
                            d[w] = d[u] + 1
                            nxt.append(w)
                frontier = nxt
            ecc = max(ecc, max(d.values()))
        assert ecc + 4 <= _CLOSENESS_ROUNDS, (sf, ecc)
