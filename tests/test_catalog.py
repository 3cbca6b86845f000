"""Iceberg-style snapshot table (sources/catalog.py): commits, time
travel, metadata-layer pruning soundness + selectivity, torn-commit
invisibility, schema contract."""

import json
import os

import pytest

from distributed_graph_analytics_spark.sources.catalog import SnapshotTable


def _docs(spark, n=200, tag="a"):
    return spark.range(n).selectExpr(
        "id",
        f"concat('{tag}_', cast(id as string)) AS name",
        "CASE WHEN id % 5 = 0 THEN 'py' WHEN id % 5 = 1 THEN 'java' "
        "WHEN id % 5 = 2 THEN 'scala' WHEN id % 5 = 3 THEN 'go' "
        "ELSE 'rs' END AS lang",
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_append_roundtrip(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    df = _docs(spark)
    t.commit(df, mode="append")
    assert _rows(t.read(spark)) == _rows(df)
    # append accumulates
    df2 = _docs(spark, tag="b").where("id < 50")
    t.commit(df2, mode="append")
    assert t.read(spark).count() == 250
    assert len(t.snapshots()) == 2


def test_overwrite_and_time_travel(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    s1 = t.commit(_docs(spark, n=100), mode="append")
    s2 = t.commit(_docs(spark, n=10, tag="new"), mode="overwrite")
    assert t.read(spark).count() == 10  # current = overwrite
    assert t.read(spark, snapshot_id=s1).count() == 100  # by id
    # as-of timestamp: between the two commits → first snapshot
    log = t.snapshots()
    assert [s["snapshot_id"] for s in log] == [s1, s2]
    mid = (log[0]["committed_at"] + log[1]["committed_at"]) / 2
    assert t.read(spark, as_of=mid).count() == 100
    with pytest.raises(ValueError):
        t.read(spark, as_of=log[0]["committed_at"] - 1)
    with pytest.raises(ValueError):
        t.read(spark, snapshot_id=123456)


def test_pruning_sound_and_selective(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    # cluster by lang → tight per-file bounds on the pruning column
    # (16 buckets: 5 langs rarely collide into fewer than 4 files)
    t.commit(
        _docs(spark, n=1000), mode="append", cluster_by=("lang",), num_files=16
    )
    full = _docs(spark, n=1000)
    for filters, sql in [
        ([("lang", "=", "py")], "lang = 'py'"),
        ([("id", "<", 100)], "id < 100"),
        ([("id", ">=", 990)], "id >= 990"),
        ([("lang", "=", "py"), ("id", "<=", 10)], "lang = 'py' AND id <= 10"),
    ]:
        got = t.read(spark, filters=filters)
        assert _rows(got) == _rows(full.where(sql)), filters
    # selectivity: the lang predicate must eliminate manifest entries
    kept, total = t.scan_files(filters=[("lang", "=", "py")])
    assert total >= 3 and kept < total
    # a no-op predicate keeps everything
    kept_all, _ = t.scan_files(filters=[("id", ">=", 0)])
    assert kept_all == total


def test_pruning_empty_result(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    t.commit(_docs(spark, n=50), mode="append")
    out = t.read(spark, filters=[("id", ">", 10_000)])
    assert out.count() == 0
    assert out.schema == _docs(spark, n=1).schema


def test_torn_commit_invisible(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    s1 = t.commit(_docs(spark, n=30), mode="append")
    # simulate a commit that died after writing manifest+metadata but
    # before flipping the version hint: the reader must keep serving s1
    meta_dir = str(tmp_path / "t" / "metadata")
    with open(os.path.join(meta_dir, "v1.metadata.json")) as f:
        v1 = json.load(f)
    torn = dict(v1, version=2, current_snapshot_id=999)
    with open(os.path.join(meta_dir, "v2.metadata.json"), "w") as f:
        json.dump(torn, f)
    assert t.read(spark).count() == 30
    assert t.snapshots()[-1]["snapshot_id"] == s1


def test_schema_contract(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    t.commit(_docs(spark, n=10), mode="append")
    with pytest.raises(ValueError, match="schema change"):
        t.commit(spark.range(5), mode="append")
    # fresh read from a never-committed table
    with pytest.raises(FileNotFoundError):
        SnapshotTable(str(tmp_path / "missing")).read(spark)


def test_checkpoint_manager_catalog_mode(spark, tmp_path):
    """catalog=True routes vertex-state checkpoints through the
    snapshot table: atomic commits, per-partition lineage intact, and
    try_resume_at reads the exact committed snapshot even after later
    iterations overwrite the table (time travel on the resume path)."""
    from distributed_graph_analytics_spark.plans.checkpoint import CheckpointManager

    cm = CheckpointManager(spark, str(tmp_path / "ckpt"), catalog=True)
    s1 = spark.createDataFrame([(1, 10.0), (2, 20.0)], "id long, rank double")
    s2 = spark.createDataFrame([(1, 11.0), (2, 19.0)], "id long, rank double")
    cm.save("pr", s1, iteration=1, metrics={"max_delta": 0.5})
    cm.save("pr", s2, iteration=2, metrics={"max_delta": 0.1})

    df, it = cm.try_resume("pr")
    assert it == 2 and _rows(df) == _rows(s2)
    old, manifest = cm.try_resume_at("pr", 1)
    assert _rows(old) == _rows(s1)
    assert manifest["metrics"]["max_delta"] == 0.5
    assert manifest["snapshot_id"] is not None
    assert sum(p["rows"] for p in manifest["partitions"]) == 2
    # the underlying table's snapshot log is the iteration history
    t = cm._table("pr")
    assert len(t.snapshots()) == 2


def test_repo_table_through_catalog(spark, tmp_path):
    """The input_hint ingest path over a cataloged repo table: commit
    the synthesized (repo,path,commit,lang,content) table, read one
    lang partition back with pruning, run the sha256 ingest pass."""
    from distributed_graph_analytics_spark.sources.repo_table import (
        ingest_repo_table,
        synthesize_repo_table,
    )

    repo = synthesize_repo_table(spark, "/root/testdata/sf0.001").limit(500)
    t = SnapshotTable(str(tmp_path / "repos"))
    t.commit(repo, mode="append", cluster_by=("lang",), num_files=16)
    scanned = t.read(spark, filters=[("lang", "=", "py")])
    ing = ingest_repo_table(scanned)
    rows = ing.select("lang", "content_sha256").collect()
    assert rows and all(r["lang"] == "py" and len(r["content_sha256"]) == 64 for r in rows)
    kept, total = t.scan_files(filters=[("lang", "=", "py")])
    assert kept < total
