"""Regression tests for the multi-level Louvain unroll that backs the
neighboring_communities DuckDB oracle (__spark_entry__.
_louvain_multilevel_ctes). Pure DuckDB at sf0.001 — no Spark session.

The oracle's validity rests on two properties verified here:
fixed-point invariance (appending levels or dropping the proven no-op
final level cannot change the folded mapping) and halt sensitivity
(a wrong per-level cycle count must change it — the unroll is not
vacuously insensitive to the thing it pins).
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"
RECORDED = entry._LOUVAIN_LEVEL_CYCLES_SF001


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{SF_DIR}/lineitem.parquet')"
    )
    return c


def _mapping(con, cycles):
    sql = (
        entry._EDGES_CTE
        + ", "
        + entry._louvain_multilevel_ctes(cycles)
        + f"\nSELECT id, community FROM map{len(cycles) - 1}"
    )
    return sorted(map(tuple, con.execute(sql).fetchall()))


def test_recorded_vector_reaches_fixed_point(con):
    ref = _mapping(con, RECORDED)
    assert len(ref) > 0
    # appending no-op levels past the fixed point is the identity
    assert _mapping(con, RECORDED + [2]) == ref
    # the final recorded level is itself a verified no-op
    assert _mapping(con, RECORDED[:-1]) == ref


def test_wrong_halts_diverge(con):
    ref = _mapping(con, RECORDED)
    # stopping the outer loop early misses merges
    assert _mapping(con, RECORDED[:2]) != ref
    # halting level 0 after its first even/odd pair misses moves
    assert _mapping(con, [2] + RECORDED[1:]) != ref


def test_mapping_is_total_and_folds_level0(con):
    ref = dict(_mapping(con, RECORDED))
    lvl0 = dict(_mapping(con, [RECORDED[0]]))
    # every original vertex keeps a label through the folds
    assert set(ref) == set(lvl0)
    # folding only merges: distinct communities can't increase
    assert len(set(ref.values())) <= len(set(lvl0.values()))
