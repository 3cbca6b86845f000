"""Reference fixture graphs, transcribed from FIXTURES.md (which cites
the reference test suites file:line). Edge lists are (src, dst) or
(src, dst, weight) tuples; expected outputs are the reference's own
golden assertions.
"""

# ---- WCC (WeaklyConnectedComponentsCoreTest.scala) ----
WCC_CHAIN = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)]
WCC_CHAIN_EXPECT = {v: 6 for v in range(1, 7)}

WCC_TWO = WCC_CHAIN + [(7, 8), (8, 9)]
WCC_TWO_EXPECT = {**{v: 6 for v in range(1, 7)}, **{v: 9 for v in (7, 8, 9)}}

WCC_MULTI = WCC_TWO + [(10, 11), (11, 12), (12, 10), (10, 13), (13, 14)]
WCC_MULTI_EXPECT = {
    **WCC_TWO_EXPECT,
    **{v: 14 for v in (10, 11, 12, 13, 14)},
}

# wcc_big: 23 edges, verbatim from WeaklyConnectedComponentsCoreTest.scala
# testBiggerGraph → components {880: 8 members, 900: 6, 14: 5, 435: 7}
WCC_BIG = [
    (1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (25, 6), (880, 25),
    (15, 24), (655, 24), (900, 655), (400, 15), (900, 33),
    (7, 8), (8, 9), (0, 198), (435, 44), (9, 0), (44, 8),
    (10, 11), (11, 12), (12, 10), (10, 13), (13, 14),
]
WCC_BIG_EXPECT_SIZES = {880: 8, 900: 6, 14: 5, 435: 7}

# ---- PageRank (PageRankCoreTest.scala / PageRankTest.java) ----
PR_EQUAL3 = [(1, 2), (1, 3), (1, 4), (1, 5), (2, 3), (2, 4), (2, 1), (2, 3), (3, 1), (3, 2)]
PR_STAR_IN = [(2, 1), (3, 1), (4, 1), (5, 1), (6, 1)]
PR_CYCLE = [(1, 2), (2, 1), (2, 3), (3, 2), (3, 1), (1, 3)]
PR_STAR_OUT_G = [(1, d) for d in range(2, 9)]
PR_STAR_IN_G = [(s, 1) for s in range(2, 9)]

# ---- Leaf compression (LeafCompressionCoreTest.scala) ----
LC_CHAIN = WCC_CHAIN
LC_CHAIN_EXPECT = set()
LC_CORE3 = PR_EQUAL3
LC_CORE3_EXPECT = {1, 2, 3}
# lc_core5: 23 edges, verbatim from LeafCompressionCoreTest.scala
# testLeafCompressionOnALargerGraph → survivors {1, 2, 3, 4, 5}
LC_CORE5 = [
    (1, 2), (1, 3), (1, 4), (1, 5), (1, 6), (2, 3), (2, 4), (2, 5),
    (3, 4), (3, 5), (4, 5), (6, 1), (6, 7), (6, 8), (6, 9), (7, 8),
    (7, 9), (8, 9), (9, 8), (9, 7), (5, 2), (5, 4), (4, 2),
]
LC_CORE5_EXPECT = {1, 2, 3, 4, 5}

# lc_multi: 34 edges, verbatim from LeafCompressionCoreTest.scala
# testLeafCompressionWithMultipleComponents → {880, 6, 25, 9, 8, 7, 10, 11, 12}
LC_MULTI = [
    (1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (25, 6), (880, 25), (25, 880),
    (880, 6), (6, 25), (6, 880),
    (15, 24), (655, 24), (900, 655), (400, 15), (900, 33),
    (7, 8), (8, 9), (0, 198), (435, 44), (9, 0), (44, 8), (7, 9), (8, 7),
    (9, 7), (9, 8),
    (10, 11), (11, 12), (12, 10), (10, 13), (13, 14), (11, 10), (10, 12), (12, 11),
]
LC_MULTI_EXPECT = {880, 6, 25, 9, 8, 7, 10, 11, 12}

# ---- Louvain (LouvainCoreTest.scala, weighted) ----
LOUVAIN_CHAIN = [(1, 2, 1), (2, 3, 1), (3, 4, 1), (4, 5, 1), (5, 6, 1)]
LOUVAIN_TWO_HUBS = LOUVAIN_CHAIN + [
    (10, 16, 1), (10, 11, 1), (10, 12, 1), (10, 13, 1), (10, 14, 1), (10, 15, 1)
]
# expected communities {1: 2 members, 4: 2, 5: 2, 10: 7}  (GraphX tie-breaks)

# ---- HBSE (HighBetweennessCoreTest.scala) ----
# Exact directed Brandes values. The reference's golden on this graph is
# {1: 2.0, 2: 1.0} (HighBetweennessCoreTest.scala:49-56) — an artifact of
# its Pregel message combiner dropping equal-distance messages that arrive
# in the same superstep (mergeMapMessage keeps only the strictly-smaller
# distance, HighBetweennessCore.scala:625-648), so when vertex 4 hears
# from preds 1 and 2 simultaneously (source 3), one predecessor is lost
# and σ undercounts, with the survivor decided by merge order. We compute
# exact Brandes instead (independently checkable: the pure-python oracle
# in test_hbse.py reproduces these); the reference's structural
# assertions (two positive vertices, 1 > 2 > rest) still hold.
HBSE_SMALL = PR_EQUAL3  # btwn: 1 → 2.5, 2 → 0.5, rest 0
HBSE_SMALL_EXPECT = {1: 2.5, 2: 0.5, 3: 0.0, 4: 0.0, 5: 0.0}
HBSE_STAR_OUT = [(1, d) for d in range(2, 7)]  # all 0
HBSE_BROKER = [(2, 1), (3, 1), (4, 1), (5, 1), (6, 1), (1, 7)]
HBSE_BROKER_EXPECT = {1: 5.0, 2: 0.0, 3: 0.0, 4: 0.0, 5: 0.0, 6: 0.0, 7: 0.0}

# ---- Triangles ----
TRI_CYCLE = [(1, 2), (2, 3), (3, 1)]
# two 5-cliques bridged at 6 (examples/small_edges.tsv shape)
CLIQUE_A = [(a, b) for a in range(1, 6) for b in range(a + 1, 6)]
CLIQUE_B = [(a, b) for a in range(10, 15) for b in range(a + 1, 15)]
TWO_CLIQUES_BRIDGED = CLIQUE_A + CLIQUE_B + [(5, 6), (6, 10)]
# each 5-clique has C(5,3)=10 triangles; bridge adds none
TWO_CLIQUES_TRIANGLES = 20

# ---- Giraph leaf compression (LeafCompressionComputationTest.java) ----
# testComputationGoodData:52-104 — 36 directed edges; golden: 5 surviving
# vertices {1..5}, each keeping its clique edges
LC_GIRAPH_GOOD = [
    (1, 2), (1, 3), (1, 4), (1, 5), (1, 6),
    (2, 3), (2, 4), (2, 5), (2, 1),
    (3, 4), (3, 5), (3, 20), (3, 1), (3, 2),
    (4, 5), (4, 1), (4, 2), (4, 3),
    (5, 1), (5, 2), (5, 3), (5, 4),
    (6, 1), (6, 8), (8, 6), (8, 10), (10, 8), (10, 12), (12, 10),
    (15, 17), (15, 19), (17, 15), (19, 15), (19, 20),
    (20, 3), (20, 19),
]
LC_GIRAPH_GOOD_EXPECT = {1, 2, 3, 4, 5}
#: absorbed-count goldens (hand-traced per the BSP protocol): vertex 1
#: absorbs the 12→10→8→6 chain, vertex 3 absorbs 17→15→19→20
LC_GIRAPH_GOOD_VALUES = {1: 4, 2: 0, 3: 4, 4: 0, 5: 0}

# testComputationUnconnectedGraph:132-152 — isolated pairs; golden: the
# three leaf sources are deleted, targets survive with value 1, no edges
LC_GIRAPH_PAIRS = [(1, 2), (4, 3), (28, 16)]
LC_GIRAPH_PAIRS_EXPECT = {2, 3, 16}
LC_GIRAPH_PAIRS_VALUES = {2: 1, 3: 1, 16: 1}

# testActualTextNodes:157-180 with ids Jack=1 Jill=2 Jane=3 Gregory=4
# Straxx=5 — golden: 4 survivors; Straxx keeps 0 edges; Jane keeps a
# DANGLING edge to deleted Gregory (the test only asserts presence)
LC_GIRAPH_TEXT = [
    (1, 2), (2, 1), (3, 2), (2, 3), (1, 3), (3, 1), (3, 4), (4, 5),
]
LC_GIRAPH_TEXT_EXPECT = {1, 2, 3, 5}
LC_GIRAPH_TEXT_EDGES = {(1, 2), (2, 1), (3, 2), (2, 3), (1, 3), (3, 1), (3, 4)}
