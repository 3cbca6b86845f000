"""Unit tests for plans.iteration.materialize — the fused
one-job-per-superstep primitive (compute + cache fill + lineage/stats
truncation + Observation metrics)."""

import pytest
from pyspark.sql import functions as F

from distributed_graph_analytics_spark.plans.iteration import materialize, truncate


def test_materialize_metrics_and_project(spark):
    df = spark.createDataFrame(
        [(1, 10.0, 12.0), (2, 20.0, 25.0), (3, 30.0, 30.0)],
        "id long, old double, new double",
    )
    out, m = materialize(
        df,
        metrics={
            "max_delta": F.max(F.abs(F.col("new") - F.col("old")) / F.col("old")),
            "n": F.count(F.lit(1)),
        },
        project=["id", "new"],
    )
    # metric sees all columns (old dropped only after observe)
    assert m["n"] == 3
    assert abs(m["max_delta"] - 0.25) < 1e-12
    # projection applied to the checkpointed result
    assert out.columns == ["id", "new"]
    assert {tuple(r) for r in out.collect()} == {(1, 12.0), (2, 25.0), (3, 30.0)}
    # lineage truncated: plan is a scan, not the original expressions
    assert "LogicalRDD" in out._jdf.queryExecution().logical().toString()


def test_materialize_no_metrics(spark):
    df = spark.range(5).select(F.col("id"), (F.col("id") * 2).alias("v"))
    out, m = materialize(df)
    assert m == {}
    assert out.count() == 5


def test_materialize_empty_frame_metric_is_none(spark):
    df = spark.createDataFrame([], "id long, changed boolean")
    out, m = materialize(
        df, metrics={"changed": F.sum(F.col("changed").cast("long"))}
    )
    # SUM over zero rows is NULL -> None; operators coalesce with `or 0`
    assert m["changed"] is None
    assert out.count() == 0


def test_truncate_stats_do_not_compound(spark):
    """The stats-compounding regression (BENCH/BASELINE.md 'What
    changed' #3): repeated join+truncate must keep sizeInBytes flat
    instead of multiplying each iteration."""
    state = spark.range(100).select(F.col("id"), F.lit(1.0).alias("x"))
    other = spark.range(100).select(F.col("id"), F.lit(2.0).alias("y"))
    digits = []
    for _ in range(4):
        state = truncate(
            state.join(other, "id").select(
                "id", (F.col("x") + F.col("y")).alias("x")
            )
        )
        stats = (
            state._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
        digits.append(len(str(stats)))
    assert max(digits) - min(digits) <= 1, digits


def test_materialize_preserves_hash_partitioning(spark):
    """The per-superstep state must keep its hash(id) layout through
    materialize (persist + observe + project + aqe_off localCheckpoint)
    so the NEXT superstep's joins need no exchange on the state side
    (the whole-loop invariant is pinned in test_adjacency_plan.py)."""
    df = (
        spark.range(100)
        .select("id", F.lit(1.0).alias("rank"), F.lit(2.0).alias("old"))
        .repartition(4, "id")
    )
    out, _ = materialize(
        df, metrics={"n": F.count(F.lit(1))}, project=["id", "rank"]
    )
    part = str(out._jdf.queryExecution().executedPlan().outputPartitioning())
    assert "hashpartitioning(id#" in part, part
    out2, _ = materialize(df)
    part2 = str(out2._jdf.queryExecution().executedPlan().outputPartitioning())
    assert "hashpartitioning(id#" in part2, part2


def test_hash_agg_pack_sets_and_restores_threshold(spark):
    from distributed_graph_analytics_spark.plans.iteration import hash_agg_pack

    key = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
    before = spark.conf.get(key)
    with hash_agg_pack(spark, threshold=123_456):
        assert spark.conf.get(key) == "123456"
        # a collect_list pack under the raised threshold stays correct
        df = spark.range(0, 1000).select(
            (F.col("id") % 100).alias("k"), F.col("id").alias("v")
        )
        packed = df.groupBy("k").agg(F.collect_list("v").alias("vs"))
        rows = {r.k: sorted(r.vs) for r in packed.collect()}
        assert len(rows) == 100
        assert rows[0] == list(range(0, 1000, 100))
    assert spark.conf.get(key) == before


def test_hash_agg_pack_restores_on_error(spark):
    from distributed_graph_analytics_spark.plans.iteration import hash_agg_pack

    key = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
    before = spark.conf.get(key)
    with pytest.raises(RuntimeError):
        with hash_agg_pack(spark):
            raise RuntimeError("boom")
    assert spark.conf.get(key) == before
