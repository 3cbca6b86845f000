"""Edge-table ingest: delimited edge lists → ``edges(src, dst, weight)``.

Semantics mirror the reference's input formats without copying their
row-at-a-time parsers:

- 2-column line → weight defaults to 1; 3-column line → weight parsed
  (reference: dga-graphx EdgeInputFormat.scala:40-49,
  dga-giraph RawEdge.java:47-56, DGALongEdgeValueInputFormat.java:33-74).
- configurable delimiter including ``\\x01``-style hex escapes
  (reference: DGAAbstractEdgeInputFormat.java:94-97).
- optional reverse-edge duplication for undirected ingestion
  (reference: DGAAbstractEdgeInputFormat.java:58-73).
- whitespace trimming around tokens (EdgeInputFormat.scala:42).
- string vertex ids → dense longs WITHOUT the reference's driver-side
  ``collectAsMap`` cliff (EdgeInputFormat.scala:57-86): the dictionary
  stays distributed and is applied with two shuffle joins.

Everything is pure DataFrame; the scans stay columnar and Catalyst
prunes/pushes down.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

EDGE_COLS = ("src", "dst", "weight")


def decode_delimiter(delimiter: str) -> str:
    r"""Decode hex escapes like ``\x01`` (Hive ^A) in a delimiter spec."""
    if "\\x" in delimiter or "\\u" in delimiter:
        return delimiter.encode("utf-8").decode("unicode_escape")
    return delimiter


def read_edge_list(
    spark: SparkSession,
    path: str,
    delimiter: str = ",",
    default_weight: int = 1,
    reverse: bool = False,
    ignore_third_column: bool = False,
) -> DataFrame:
    """Delimited text edge list → edges DataFrame with long ids.

    Lines with fewer than 2 tokens are rejected (ANSI cast error surfaces
    bad long ids, matching the reference's parse error behavior).
    """
    sep = decode_delimiter(delimiter)
    raw = spark.read.text(path).where(F.trim(F.col("value")) != "")
    parts = F.split(F.col("value"), F.lit(sep).cast("string"), -1)
    dst_token = F.when(
        F.size(parts) >= 2, F.trim(F.element_at(parts, 2))
    ).otherwise(
        F.raise_error(F.concat(F.lit("edge line needs >= 2 tokens: "), F.col("value")))
    )
    df = raw.select(
        F.trim(F.element_at(parts, 1)).cast("long").alias("src"),
        dst_token.cast("long").alias("dst"),
        F.when(
            F.size(parts) >= 3 if not ignore_third_column else F.lit(False),
            F.trim(F.element_at(parts, 3)).cast("long"),
        )
        .otherwise(F.lit(default_weight))
        .alias("weight"),
    )
    df = df.where(F.col("src").isNotNull() & F.col("dst").isNotNull())
    if reverse:
        df = reverse_duplicate(df)
    return df


def reverse_duplicate(edges: DataFrame) -> DataFrame:
    """Undirected ingestion: union of edges and their reverses.

    Reference: ReverseEdgeDuplicator wrapper
    (DGATextEdgeValueInputFormat.java:47-52).
    """
    return edges.unionByName(
        edges.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), F.col("weight")
        )
    )


def undirected_view(edges: DataFrame) -> DataFrame:
    """Symmetric (u, v, weight) neighbor view — each edge in both directions.

    The DataFrame analog of GraphX ``EdgeDirection.Either`` message flow.
    """
    return edges.select(
        F.col("src").alias("u"), F.col("dst").alias("v"), F.col("weight")
    ).unionByName(
        edges.select(
            F.col("dst").alias("u"), F.col("src").alias("v"), F.col("weight")
        )
    )


def vertices_of(edges: DataFrame) -> DataFrame:
    """Distinct vertex ids from the edge table.

    Reference: flatMap endpoints → reduceByKey → keys
    (EdgeInputFormat.scala:67-70); here explode + distinct, one shuffle.
    """
    return edges.select(
        F.explode(F.array(F.col("src"), F.col("dst"))).alias("id")
    ).distinct()


def merge_parallel_edges(edges: DataFrame) -> DataFrame:
    """Sum duplicate (src, dst) weights — GraphX ``groupEdges(_+_)``
    (LouvainCore.scala:58). One hash aggregate with map-side combine."""
    return edges.groupBy("src", "dst").agg(F.sum("weight").alias("weight"))


def canonicalize_edges(edges: DataFrame, drop_self_loops: bool = True) -> DataFrame:
    """Undirected canonical form: src < dst, parallel edges merged."""
    out = edges.select(
        F.least("src", "dst").alias("src"),
        F.greatest("src", "dst").alias("dst"),
        F.col("weight"),
    )
    if drop_self_loops:
        out = out.where(F.col("src") != F.col("dst"))
    return merge_parallel_edges(out)


def dense_string_ids(names: DataFrame, col: str = "name", num_partitions: int | None = None) -> DataFrame:
    """Distinct string names → dense, deterministic long ids (0..n-1), distributed.

    Replaces the reference's driver-side ``zipWithUniqueId + collectAsMap``
    (EdgeInputFormat.scala:75-79) — the scalability cliff SURVEY.md §7 bans.
    Two-phase dense rank: range-partition by name, rank within partition,
    add per-partition offsets (only P counts ever reach the driver).
    """
    spark = names.sparkSession
    distinct = names.select(F.col(col).alias("name")).where(F.col("name").isNotNull()).distinct()
    n_part = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    parted = distinct.repartitionByRange(n_part, "name").withColumn(
        "_pid", F.spark_partition_id()
    )
    parted = parted.persist()
    counts = parted.groupBy("_pid").count().collect()  # P rows, not |V|
    offsets = {}
    acc = 0
    for row in sorted(counts, key=lambda r: r["_pid"]):
        offsets[row["_pid"]] = acc
        acc += row["count"]
    offset_df = F.broadcast(
        spark.createDataFrame(
            [(pid, off) for pid, off in offsets.items()], "_pid int, _offset long"
        )
    )
    w = Window.partitionBy("_pid").orderBy("name")
    out = (
        parted.withColumn("_local", F.row_number().over(w) - 1)
        .join(offset_df, "_pid")
        .select(
            F.col("name"), (F.col("_local") + F.col("_offset")).alias("id")
        )
    )
    return out


def encode_string_edge_list(
    edges_str: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> tuple[DataFrame, DataFrame]:
    """String-id edge list → (long-id edges, dictionary DataFrame).

    Reference behavior (EdgeInputFormat.scala:57-86) minus the driver
    collect: the dictionary is joined distributively against both
    endpoints (two shuffle joins; dictionary side is broadcast by AQE
    when small).
    """
    names = edges_str.select(F.col(src_col).alias("name")).unionByName(
        edges_str.select(F.col(dst_col).alias("name"))
    )
    dictionary = dense_string_ids(names).persist()
    weight = (
        F.col("weight").cast("long")
        if "weight" in edges_str.columns
        else F.lit(1).cast("long")
    )
    enc = (
        edges_str.select(
            F.col(src_col).alias("src_name"),
            F.col(dst_col).alias("dst_name"),
            weight.alias("weight"),
        )
        .join(
            dictionary.select(
                F.col("name").alias("src_name"), F.col("id").alias("src")
            ),
            "src_name",
        )
        .join(
            dictionary.select(
                F.col("name").alias("dst_name"), F.col("id").alias("dst")
            ),
            "dst_name",
        )
        .select("src", "dst", "weight")
    )
    return enc, dictionary
