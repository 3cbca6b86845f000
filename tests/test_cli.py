"""CLI dispatch + output-format parity end-to-end (S6-S14 surface)."""

import glob
import os

from distributed_graph_analytics_spark.cli import build_parser, run


def _write_edges(tmp_path):
    p = tmp_path / "edges.csv"
    p.write_text("1,2\n2,3\n3,1\n3,4\n")
    return str(p)


def _read_lines(out_dir):
    lines = []
    for part in glob.glob(os.path.join(out_dir, "part-*")):
        with open(part) as f:
            lines.extend(line.strip() for line in f if line.strip())
    return set(lines)


def test_cli_wcc_text_vertex_value(spark, tmp_path):
    inp = _write_edges(tmp_path)
    out = str(tmp_path / "wcc_out")
    args = build_parser().parse_args(
        ["wcc", "-i", inp, "-o", out, "--format", "text",
         "--output-delimiter", ":", "--write-vertex-value"]
    )
    assert run(args, spark) == 0
    # S7 sink: src:dst:srcComponent, all in the max-label component 4
    assert _read_lines(out) == {"1:2:4", "2:3:4", "3:1:4", "3:4:4"}


def test_cli_pr_vertex_sink_text(spark, tmp_path):
    inp = _write_edges(tmp_path)
    out = str(tmp_path / "pr_out")
    args = build_parser().parse_args(
        ["pr", "-i", inp, "-o", out, "--format", "text", "--output-delimiter", "\t"]
    )
    assert run(args, spark) == 0
    lines = _read_lines(out)
    assert len(lines) == 4
    for line in lines:
        vid, rank = line.split("\t")
        int(vid), float(rank)


def test_cli_lc_edge_sink_parquet(spark, tmp_path):
    # bidirectional triangle (out-degree 2 each) + pruned leaf 3->4
    p = tmp_path / "lc_edges.csv"
    p.write_text("1,2\n2,1\n2,3\n3,2\n3,1\n1,3\n3,4\n")
    out = str(tmp_path / "lc_out")
    args = build_parser().parse_args(["lc", "-i", str(p), "-o", out])
    assert run(args, spark) == 0
    got = {
        (r["src"], r["dst"]) for r in spark.read.parquet(out).collect()
    }
    assert got == {(1, 2), (2, 1), (2, 3), (3, 2), (3, 1), (1, 3)}


def test_cli_kcore_vertex_sink_parquet(spark, tmp_path):
    # edge list reads as DIRECTED edges 1->2,2->3,3->1,3->4; kcore
    # symmetrizes: triangle {1,2,3} cores 2, leaf 4 core 1
    inp = _write_edges(tmp_path)
    out = str(tmp_path / "kcore_out")
    args = build_parser().parse_args(["kcore", "-i", inp, "-o", out])
    assert run(args, spark) == 0
    got = {(r["id"], r["core"]) for r in spark.read.parquet(out).collect()}
    assert got == {(1, 2), (2, 2), (3, 2), (4, 1)}


def test_cli_new_analytics_dispatch(spark, tmp_path):
    inp = _write_edges(tmp_path)
    # sssp with explicit source; weighted input defaults weight=1
    out = str(tmp_path / "sssp_out")
    args = build_parser().parse_args(
        ["sssp", "-i", inp, "-o", out, "--source", "1"]
    )
    assert run(args, spark) == 0
    got = {(r["id"], r["dist"]) for r in spark.read.parquet(out).collect()}
    assert got == {(1, 0), (2, 1), (3, 1), (4, 2)}

    out2 = str(tmp_path / "gs_out")
    args = build_parser().parse_args(["graphStats", "-i", inp, "-o", out2])
    assert run(args, spark) == 0
    r = spark.read.parquet(out2).collect()[0]
    assert r["n_vertices"] == 4 and r["n_edges"] == 4

    out3 = str(tmp_path / "walks_out")
    args = build_parser().parse_args(
        ["randomWalks", "-i", inp, "-o", out3, "--walk-length", "2"]
    )
    assert run(args, spark) == 0
    assert spark.read.parquet(out3).count() == 4 * 3

    out4 = str(tmp_path / "lp_out")
    args = build_parser().parse_args(
        ["linkPrediction", "-i", inp, "-o", out4, "--min-common", "1"]
    )
    assert run(args, spark) == 0
    assert spark.read.parquet(out4).count() > 0


def test_pyfiles_zip_importable(tmp_path):
    import subprocess
    import sys
    import zipfile

    sys.path.insert(0, "/root/repo/tools")
    try:
        from make_pyfiles_zip import build
    finally:
        sys.path.pop(0)
    out = str(tmp_path / "dga.zip")
    names = build(out)
    assert any(n.endswith("cli.py") for n in names)
    assert all(n.endswith(".py") for n in names)
    with zipfile.ZipFile(out) as zf:
        assert "distributed_graph_analytics_spark/cli.py" in zf.namelist()
    # the archive alone must satisfy the package import (spark-submit
    # --py-files semantics: zip root on sys.path)
    code = (
        "import sys; sys.path.insert(0, sys.argv[1]); "
        "import distributed_graph_analytics_spark.cli as c; "
        "print(len(c.ANALYTICS))"
    )
    r = subprocess.run(
        [sys.executable, "-c", code, out],
        capture_output=True, text=True, cwd=str(tmp_path),
    )
    assert r.returncode == 0, r.stderr
    assert int(r.stdout.strip()) >= 13


def test_cli_graphx_variants_dispatch(spark, tmp_path):
    """wccGraphX (min-label connectedComponents semantics) and
    prGraphX (Pregel delta-push) — the reference's GraphX built-in
    dispatch lines (DGARunner.scala:96-117)."""
    inp = _write_edges(tmp_path)
    out = str(tmp_path / "wccgx_out")
    args = build_parser().parse_args(["wccGraphX", "-i", inp, "-o", out])
    assert run(args, spark) == 0
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 4  # one line per edge, S7 shape
    assert all(r["component"] == 1 for r in rows)  # LOWEST id labels

    out2 = str(tmp_path / "prgx_out")
    args = build_parser().parse_args(
        ["prGraphX", "-i", inp, "-o", out2, "--delta", "0.000001"]
    )
    assert run(args, spark) == 0
    ranks = {r["id"]: r["rank"] for r in spark.read.parquet(out2).collect()}
    assert set(ranks) == {1, 2, 3, 4}
    assert all(v > 0 for v in ranks.values())


def test_cli_pipeline_shared_graph(spark, tmp_path):
    """`pipeline` runs PR then WCC over ONE ShuffleGraph: ranks land in
    <output>_pr, the main output is WCC's S7 edge sink, and both match
    the standalone analytics exactly (sharing is plan-level only)."""
    inp = _write_edges(tmp_path)
    out = str(tmp_path / "pipe_out")
    args = build_parser().parse_args(["pipeline", "-i", inp, "-o", out])
    assert run(args, spark) == 0

    rows = spark.read.parquet(out).collect()
    assert len(rows) == 4 and all(r["component"] == 4 for r in rows)

    ranks = {r["id"]: r["rank"] for r in spark.read.parquet(out + "_pr").collect()}
    from distributed_graph_analytics_spark.operators.pagerank import pagerank
    from distributed_graph_analytics_spark.sources.edges import read_edge_list

    solo, _ = pagerank(read_edge_list(spark, inp, ","))
    solo_ranks = {r["id"]: r["rank"] for r in solo.collect()}
    assert set(ranks) == set(solo_ranks) == {1, 2, 3, 4}
    for vid, r in ranks.items():
        assert abs(r - solo_ranks[vid]) < 1e-12


def test_cli_wcc_star_dispatch(spark, tmp_path):
    """`wccStar` produces the same S7 edge sink as `wcc`."""
    inp = _write_edges(tmp_path)
    out = str(tmp_path / "star_out")
    args = build_parser().parse_args(
        ["wccStar", "-i", inp, "-o", out, "--format", "parquet"]
    )
    assert run(args, spark) == 0
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 4 and all(r["component"] == 4 for r in rows)
