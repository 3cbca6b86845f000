"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship analytic (PageRank over the
repo co-occurrence edge table at sf0.001). ``queries()`` exposes each
implemented operator from SURVEY.md §2 as (spark, sf_dir) -> DataFrame;
``oracle_sql()`` holds the DuckDB-runnable ANSI-SQL twin for every
SQL-expressible operator. Iterative analytics are exposed twice where
useful: a fixed-iteration variant with an exactly-unrolled SQL oracle,
and the run-to-convergence variant checked by the pytest fixtures
(tests/ mirrors the reference's own golden assertions).

Column-name discipline: every computed column is aliased identically in
the Spark query and the SQL oracle (driver hash-compares sorted
columns).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from distributed_graph_analytics_spark.operators.leaf_compression import (  # noqa: E402
    leaf_compression,
)
from distributed_graph_analytics_spark.operators.lpa import label_propagation  # noqa: E402
from distributed_graph_analytics_spark.operators.pagerank import pagerank  # noqa: E402
from distributed_graph_analytics_spark.operators.triangle import (  # noqa: E402
    triangle_count_per_vertex,
)
from distributed_graph_analytics_spark.operators.wcc import (  # noqa: E402
    weakly_connected_components,
)
from distributed_graph_analytics_spark.sources.edges import (  # noqa: E402
    reverse_duplicate,
)
from distributed_graph_analytics_spark.sources.repo_table import (  # noqa: E402
    EDGE_BUILD_ORACLE_SQL,
    edges_from_repo_table,
    synthesize_repo_table,
)


# --------------------------------------------------------------------------
# shared: edge table from the synthesized repo table
# --------------------------------------------------------------------------

def load_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    return edges_from_repo_table(synthesize_repo_table(spark, sf_dir))


#: CTE prefix shared by every graph oracle: the co-occurrence edge build
#: (identical semantics to sources/repo_table.py) + the symmetric view.
#: (AS MATERIALIZED is a DuckDB hint — the oracle SQL only ever runs on
#: DuckDB, whose 1.x planner would otherwise inline multiply-referenced
#: CTEs, exploding the unrolled iteration chains.)
_EDGES_CTE = """
WITH repo_table AS (
    SELECT
        'repo_' || (l_orderkey % 100) AS repo,
        md5('commit_' || l_orderkey) AS commit,
        l_partkey AS file_id
    FROM lineitem
), inc AS MATERIALIZED (
    SELECT DISTINCT repo, commit, file_id FROM repo_table
), edges AS MATERIALIZED (
    SELECT a.file_id AS src, b.file_id AS dst, COUNT(*) AS weight
    FROM inc a
    JOIN inc b ON a.repo = b.repo AND a.commit = b.commit AND a.file_id < b.file_id
    GROUP BY 1, 2
), sym AS MATERIALIZED (
    SELECT src AS u, dst AS v, weight FROM edges
    UNION ALL
    SELECT dst AS u, src AS v, weight FROM edges
), vertices AS MATERIALIZED (
    SELECT DISTINCT u AS id FROM sym
)
"""


def _wcc_unrolled_sql(rounds: int) -> str:
    """Max-label propagation unrolled to a fixed round count — exact
    fixed point provided the graph diameter ≤ rounds (asserted by the
    run-to-convergence pytest path)."""
    ctes = ["l0 AS (SELECT id, id AS comp FROM vertices)"]
    for k in range(1, rounds + 1):
        ctes.append(
            f"""l{k} AS MATERIALIZED (
  SELECT v.id,
         greatest(v.comp, coalesce(m.cand, v.comp)) AS comp
  FROM l{k - 1} v
  LEFT JOIN (
      SELECT e.u AS id, max(l.comp) AS cand
      FROM sym e JOIN l{k - 1} l ON l.id = e.v
      GROUP BY e.u
  ) m ON m.id = v.id
)"""
        )
    return (
        _EDGES_CTE
        + ", "
        + ",\n".join(ctes)
        + f"\nSELECT id, comp AS component FROM l{rounds}"
    )


def _pagerank_unrolled_sql(iters: int, damping: float = 0.85) -> str:
    """Giraph-semantics PageRank unrolled to a fixed iteration count;
    ranks rounded to 9 decimals to absorb float summation-order noise
    between engines."""
    ctes = [
        """out_deg AS MATERIALIZED (SELECT src, COUNT(*) AS od FROM edges GROUP BY src),
n_v AS (SELECT COUNT(*) AS n FROM vertices),
r0 AS MATERIALIZED (SELECT id, (SELECT 1.0 / n FROM n_v) AS rank FROM vertices)"""
    ]
    for k in range(1, iters + 1):
        ctes.append(
            f"""r{k} AS MATERIALIZED (
  SELECT v.id,
         (SELECT (1 - {damping}) / n FROM n_v)
           + {damping} * coalesce(m.msg_sum, 0) AS rank
  FROM r{k - 1} v
  LEFT JOIN (
      SELECT e.dst AS id, sum(r.rank / d.od) AS msg_sum
      FROM edges e
      JOIN r{k - 1} r ON r.id = e.src
      JOIN out_deg d ON d.src = e.src
      GROUP BY e.dst
  ) m ON m.id = v.id
)"""
        )
    return (
        _EDGES_CTE
        + ", "
        + ",\n".join(ctes)
        + f"\nSELECT id, round(rank, 9) AS rank FROM r{iters}"
    )


def _leaf_compression_unrolled_sql(rounds: int) -> str:
    """Out-degree ≤ 1 pruning unrolled (reference LeafCompressionCore
    semantics: parallel edges count separately; prune until fixed
    point)."""
    ctes = [
        """e0 AS MATERIALIZED (
  SELECT u AS src, v AS dst FROM sym
), v0 AS MATERIALIZED (
  SELECT src AS id FROM e0 UNION SELECT dst FROM e0
)"""
    ]
    for k in range(1, rounds + 1):
        ctes.append(
            f"""k{k} AS MATERIALIZED (
  SELECT v.id FROM v{k - 1} v
  LEFT JOIN (SELECT src, COUNT(*) AS deg FROM e{k - 1} GROUP BY src) d
    ON d.src = v.id
  WHERE coalesce(d.deg, 0) > 1
), e{k} AS MATERIALIZED (
  SELECT e.* FROM e{k - 1} e
  WHERE e.src IN (SELECT id FROM k{k}) AND e.dst IN (SELECT id FROM k{k})
), v{k} AS MATERIALIZED (SELECT id FROM k{k})"""
        )
    return _EDGES_CTE + ", " + ",\n".join(ctes) + f"\nSELECT id FROM v{rounds}"


_PR_FIXED_ITERS = 10
_WCC_ROUNDS = 20
_LC_ROUNDS = 4


# --------------------------------------------------------------------------
# queries
# --------------------------------------------------------------------------

def _q_edge_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_edges(spark, sf_dir)


def _q_weighted_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    # G1 weighted degree (LouvainCore.scala:46-52): Σ weight, both directions
    e = load_edges(spark, sf_dir)
    return (
        e.select(F.col("src").alias("id"), "weight")
        .unionByName(e.select(F.col("dst").alias("id"), "weight"))
        .groupBy("id")
        .agg(F.sum("weight").alias("node_weight"))
    )


def _q_out_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    # G2 (PageRankCore.scala:40)
    return (
        load_edges(spark, sf_dir)
        .groupBy(F.col("src").alias("id"))
        .agg(F.count(F.lit(1)).alias("out_deg"))
    )


def _q_wcc(spark: SparkSession, sf_dir: str) -> DataFrame:
    comp, _ = weakly_connected_components(load_edges(spark, sf_dir))
    return comp.select("id", "component")


def _q_pagerank_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    ranks, _ = pagerank(
        load_edges(spark, sf_dir),
        epsilon=0.0,  # never converge early → exactly N iterations
        max_iterations=_PR_FIXED_ITERS,
    )
    return ranks.select("id", F.round("rank", 9).alias("rank"))


def _q_pagerank_converged(spark: SparkSession, sf_dir: str) -> DataFrame:
    ranks, _ = pagerank(load_edges(spark, sf_dir))
    return ranks.select("id", "rank")


def _q_leaf_compression(spark: SparkSession, sf_dir: str) -> DataFrame:
    # undirected semantics via reverse duplication (reference S3/G9):
    # on the canonical src<dst co-occurrence DAG, directed LC
    # degenerates (top ids have out-degree 0 → cascades ~70 rounds to an
    # empty graph); the undirected form is the meaningful one here and
    # the directed reference semantics stay covered by the fixture tests
    verts, _edges, _ = leaf_compression(reverse_duplicate(load_edges(spark, sf_dir)))
    return verts.select("id")


def _q_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return triangle_count_per_vertex(load_edges(spark, sf_dir)).select(
        "id", "triangles"
    )


def _q_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    labels, _ = label_propagation(load_edges(spark, sf_dir), max_iterations=5)
    return labels.select("id", "label")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: PageRank to convergence on the sf0.001 co-occurrence graph."""
    return _q_pagerank_converged(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "edge_build": _q_edge_build,
        "weighted_degree": _q_weighted_degree,
        "out_degree": _q_out_degree,
        "wcc": _q_wcc,
        "pagerank_fixed10": _q_pagerank_fixed,
        "pagerank": _q_pagerank_converged,
        "leaf_compression": _q_leaf_compression,
        "triangles": _q_triangles,
        "label_propagation": _q_label_propagation,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "edge_build": EDGE_BUILD_ORACLE_SQL,
        "weighted_degree": _EDGES_CTE
        + """
SELECT id, CAST(SUM(weight) AS BIGINT) AS node_weight
FROM (
    SELECT src AS id, weight FROM edges
    UNION ALL
    SELECT dst AS id, weight FROM edges
)
GROUP BY id
""",
        "out_degree": _EDGES_CTE + "SELECT src AS id, COUNT(*) AS out_deg FROM edges GROUP BY src",
        "wcc": _wcc_unrolled_sql(_WCC_ROUNDS),
        "pagerank_fixed10": _pagerank_unrolled_sql(_PR_FIXED_ITERS),
        "leaf_compression": _leaf_compression_unrolled_sql(_LC_ROUNDS),
        "triangles": _EDGES_CTE
        + """
, tri AS (
  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
  FROM edges e1
  JOIN edges e2 ON e2.src = e1.dst AND e1.src < e2.dst
  JOIN edges e3 ON e3.src = e1.src AND e3.dst = e2.dst
), corners AS (
  SELECT a AS id FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri
)
SELECT v.id, coalesce(t.triangles, 0) AS triangles
FROM vertices v
LEFT JOIN (SELECT id, COUNT(*) AS triangles FROM corners GROUP BY id) t
  ON t.id = v.id
""",
        # "pagerank" (to convergence) and "label_propagation": no SQL
        # oracle — convergence iteration counts are data-dependent;
        # correctness is pinned by tests/test_pagerank.py (allclose 1e-6
        # vs the Giraph-semantics oracle) and tests/test_lpa.py.
    }
