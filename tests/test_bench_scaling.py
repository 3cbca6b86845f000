"""Unit tests for tools/bench_scaling.py sample accumulation (pure
Python — run_once is stubbed, no Spark session).

The scaling-evidence estimator is min-per-leg over interleaved
samples; accumulation across reruns must (a) keep the prior best when
new samples are slower, (b) adopt a new best when faster, (c) refuse
to mix samples from a different input, (d) stay off for a different
configuration or with SPARK_GRAFT_ACCUMULATE=0.
"""

from __future__ import annotations

import importlib.util
import json
import os

import pytest

_SPEC = importlib.util.spec_from_file_location(
    "bench_scaling",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "tools", "bench_scaling.py"),
)


def _load(monkeypatch, tmp_path, prior: dict | None):
    mod = importlib.util.module_from_spec(_SPEC)
    _SPEC.loader.exec_module(mod)
    monkeypatch.setattr(mod, "REPO", str(tmp_path))
    os.makedirs(tmp_path / "BENCH", exist_ok=True)
    if prior is not None:
        with open(tmp_path / "BENCH" / "scaling_result.json", "w") as f:
            json.dump(prior, f)
    return mod


def _run(cpus, pr_sec, wcc_sec, edges=1000):
    return {
        "cpus": cpus, "edges": edges, "vertices": 10,
        "pr_sec": pr_sec, "wcc_sec": wcc_sec,
        "pr_iters": 3, "wcc_iters": 2,
        "pr_iter_sec": round(pr_sec * 0.8, 3),
        "wcc_iter_sec": round(wcc_sec * 0.8, 3),
    }


def _prior(n=1, n4=4, replicate=8, sf_dir="/data/sf0.1", pinned=False,
           edges=1000):
    detail = {}
    for key, cpus, t in (("n", n, 100.0), ("4n", n4, 30.0)):
        rec = _run(cpus, t, t / 2, edges=edges)
        rec["all_runs_sec"] = [round(t * 1.5, 2), round(t * 1.5 / 2, 2)]
        rec["all_runs_phases"] = [
            {"pr_build": 1.0, "pr_steps": t, "wcc_build": 1.0,
             "wcc_steps": t / 2},
        ]
        detail[key] = rec
    return {
        "n_cores": n, "n4_cores": n4, "replicate": replicate,
        "sf_dir": sf_dir, "pinned": pinned, "edges": edges,
        "detail": detail,
    }


def test_prior_best_retained_when_new_samples_slower(monkeypatch, tmp_path):
    mod = _load(monkeypatch, tmp_path, _prior())
    monkeypatch.setattr(
        mod, "run_once",
        lambda cpus, sf, rep: _run(cpus, 500.0, 250.0),
    )
    small, big = mod.run_interleaved(1, 4, "/data/sf0.1", 8, 1)
    assert small["pr_sec"] == 100.0          # prior min survives
    assert len(small["all_runs_sec"]) == 2 + 1  # prior samples + new one


def test_new_best_adopted_when_faster(monkeypatch, tmp_path):
    mod = _load(monkeypatch, tmp_path, _prior())
    monkeypatch.setattr(
        mod, "run_once",
        lambda cpus, sf, rep: _run(cpus, 1.0, 0.5),
    )
    small, big = mod.run_interleaved(1, 4, "/data/sf0.1", 8, 1)
    assert small["pr_sec"] == 1.0
    assert big["pr_sec"] == 1.0


def test_edges_mismatch_raises(monkeypatch, tmp_path):
    mod = _load(monkeypatch, tmp_path, _prior(edges=1000))
    monkeypatch.setattr(
        mod, "run_once",
        lambda cpus, sf, rep: _run(cpus, 1.0, 0.5, edges=2000),
    )
    with pytest.raises(RuntimeError, match="edge count"):
        mod.run_interleaved(1, 4, "/data/sf0.1", 8, 1)


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(n_small=2, n_big=8),                 # different core pair
        dict(replicate=16),                       # different replicate
        dict(sf_dir="/data/sf0.01"),              # different input dir
    ],
)
def test_config_mismatch_starts_fresh(monkeypatch, tmp_path, kwargs):
    mod = _load(monkeypatch, tmp_path, _prior())
    n_small = kwargs.pop("n_small", 1)
    n_big = kwargs.pop("n_big", 4)
    replicate = kwargs.pop("replicate", 8)
    sf_dir = kwargs.pop("sf_dir", "/data/sf0.1")
    assert mod.load_prior(n_small, n_big, replicate, sf_dir) is None


def test_accumulate_env_off(monkeypatch, tmp_path):
    mod = _load(monkeypatch, tmp_path, _prior())
    monkeypatch.setenv("SPARK_GRAFT_ACCUMULATE", "0")
    assert mod.load_prior(1, 4, 8, "/data/sf0.1") is None


def test_legacy_prior_without_metadata_matches_by_fallback(
    monkeypatch, tmp_path
):
    p = _prior()
    del p["replicate"], p["sf_dir"]              # round-2 legacy file shape
    mod = _load(monkeypatch, tmp_path, p)
    assert mod.load_prior(1, 4, 999, "/anything") is not None
