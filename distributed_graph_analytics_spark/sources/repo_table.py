"""Repo-table ingest: (repo, path, commit, lang, content) → edge table.

Per BASELINE.json ``input_hint``, the engine's primary input is an
Iceberg-style table of source-code repositories with columns
``(repo string, path string, commit string, lang string, content string)``.
Vertices are files (paths); two files are connected when they co-occur
in the same (repo, commit); edge weight = number of co-occurring
commits. This generalizes the reference's delimited edge list
(EdgeInputFormat.scala:40-49) to a relational ingest path, and the
per-row invariant ``sha256(content)`` is recorded on ingest.

At sandbox scale the repo table is synthesized deterministically from
the driver-provided TPC-H-ish tables (seed data, no external data):
each ``lineitem`` row becomes one (repo, path, commit) incidence, with
repo keyed by supplier, path keyed by part, and commit keyed by order.
The same derivation is expressible in ANSI SQL, which is what the
DuckDB oracle runs (see __spark_entry__.py).

At 100 TB the identical pipeline reads the real Iceberg table: the
groupBy/join chain below is all shuffle-partitioned on (repo, commit)
then (src, dst) — no driver-side state, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: languages cycled deterministically over part keys
_LANGS = ("py", "java", "scala", "go", "rs")


def synthesize_repo_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic repo-shaped table derived from the testdata.

    One row per lineitem: (repo, path, commit, lang, content). Popular
    parts become hub files (skew exercise); orders bucket into repos so
    each commit lives in exactly one repo.
    """
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_suppkey"
    )
    lang = F.element_at(
        F.array(*[F.lit(x) for x in _LANGS]),
        (F.col("l_partkey") % len(_LANGS) + 1).cast("int"),
    )
    return li.select(
        F.concat(F.lit("repo_"), F.col("l_orderkey") % 100).alias("repo"),
        F.concat(F.lit("src/f"), F.col("l_partkey"), F.lit("."), lang).alias("path"),
        F.md5(F.concat(F.lit("commit_"), F.col("l_orderkey"))).alias("commit"),
        lang.alias("lang"),
        F.concat(
            F.lit("content of part "), F.col("l_partkey"), F.lit(" order "), F.col("l_orderkey")
        ).alias("content"),
    )


REPO_TABLE_COLUMNS = ("repo", "path", "commit", "lang", "content")


def read_repo_table(spark: SparkSession, table: str) -> DataFrame:
    """Production ingest: read the repo table from the session catalog
    by name — `spark.read.table("iceberg_cat.db.repos")` once the
    Iceberg (or any V2) catalog is configured via
    ``spark.sql.catalog.*``; snapshot/time-travel selection rides the
    normal table options. Works identically against the sandbox's
    temp views, so tests exercise this exact path. Enforces the
    input_hint schema contract and prunes to it (column pruning
    reaches the scan — the 100 TB ``content`` column is read only
    because downstream hashes it)."""
    df = spark.read.table(table)
    missing = set(REPO_TABLE_COLUMNS) - set(df.columns)
    if missing:
        raise ValueError(
            f"repo table {table!r} is missing required columns "
            f"{sorted(missing)} (need {REPO_TABLE_COLUMNS})"
        )
    return df.select(*REPO_TABLE_COLUMNS)


def ingest_repo_table(repo_table: DataFrame) -> DataFrame:
    """Ingest pass: records sha256(content) per row (input_hint invariant)
    and extracts the numeric file id from the path.

    The file id doubles as the graph vertex id. For arbitrary paths use
    ``sources.edges.dense_string_ids``; here paths embed a stable key so
    the id is a pure column expression (stays in whole-stage codegen and
    the DuckDB oracle can reproduce it).
    """
    return repo_table.select(
        "repo",
        "path",
        "commit",
        "lang",
        F.sha2(F.col("content"), 256).alias("content_sha256"),
        F.regexp_extract(F.col("path"), r"f(\d+)\.", 1).cast("long").alias("file_id"),
    )


def edges_from_repo_table(repo_table: DataFrame) -> DataFrame:
    """Co-occurrence edge builder: files sharing a (repo, commit) are
    connected; weight = number of shared (repo, commit) groups.

    Plan shape (scale notes):
    - dedup incidence: shuffle on (repo, commit, file_id) — map-side
      combine shrinks it first;
    - self-join on (repo, commit) with src < dst: the join key is the
      group key, so co-partitioned after one shuffle; AQE skew-join
      splits giant commits;
    - final groupBy(src, dst) merges pair weights.
    """
    inc = (
        ingest_repo_table(repo_table)
        .select("repo", "commit", "file_id")
        .distinct()
    )
    a = inc.alias("a")
    b = inc.alias("b")
    pairs = a.join(
        b,
        (F.col("a.repo") == F.col("b.repo"))
        & (F.col("a.commit") == F.col("b.commit"))
        & (F.col("a.file_id") < F.col("b.file_id")),
    ).select(
        F.col("a.file_id").alias("src"), F.col("b.file_id").alias("dst")
    )
    return pairs.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("weight"))


#: ANSI SQL twin of synthesize→ingest→edge-build, runnable by DuckDB on
#: the same parquet views. Kept adjacent to the Spark code so they evolve
#: together; __spark_entry__.oracle_sql() re-exports it.
EDGE_BUILD_ORACLE_SQL = """
WITH repo_table AS (
    SELECT
        'repo_' || (l_orderkey % 100) AS repo,
        md5('commit_' || l_orderkey) AS commit,
        l_partkey AS file_id
    FROM lineitem
), inc AS MATERIALIZED (
    SELECT DISTINCT repo, commit, file_id FROM repo_table
)
SELECT a.file_id AS src, b.file_id AS dst, COUNT(*) AS weight
FROM inc a
JOIN inc b ON a.repo = b.repo AND a.commit = b.commit AND a.file_id < b.file_id
GROUP BY 1, 2
"""
