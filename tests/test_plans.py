"""Physical-plan regression tests: the plan-shape claims in PLANS.md,
asserted so optimizations can't silently rot."""

import re

import pytest

import osm_spark.queries as Q

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = Q.SPARK_QUERIES[name](spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


def _count(plan: str, node: str) -> int:
    return len(re.findall(rf"\b{node}\b", plan))


def test_tile_assign_prunes_and_stays_jvm(spark):
    plan = _plan(spark, "tile_assign")
    assert "doc_id" in plan and "ReadSchema: struct<doc_id:bigint>" in plan
    for py_node in ("ArrowEvalPython", "MapInPandas", "BatchEvalPython"):
        assert py_node not in plan


def test_h3_assign_single_python_boundary(spark):
    plan = _plan(spark, "h3_assign")
    # exactly the encode+decode Arrow UDFs; no row-at-a-time Python
    assert _count(plan, "ArrowEvalPython") <= 2
    assert "BatchEvalPython" not in plan
    assert "ReadSchema: struct<doc_id:bigint>" in plan


def test_pip_wkb_zero_shuffle(spark):
    plan = _plan(spark, "pip_wkb")
    assert "Exchange hashpartitioning" not in plan
    assert _count(plan, "MapInPandas") == 1


def test_pip_cells_adaptive_broadcasts_covering(spark):
    plan = _plan(spark, "pip_cells_adaptive")
    assert "BroadcastHashJoin" in plan
    assert _count(plan, "MapInPandas") == 1


def test_simhash_neardup_no_per_band_recompute(spark):
    """The fixed plan: bands explode from one projection — the corpus
    scan must not multiply per band per join side (was 24 scans)."""
    plan = _plan(spark, "simhash_neardup")
    n_scans = _count(plan, "Scan parquet") + _count(plan, "FileScan")
    assert n_scans <= 8, plan[:2000]


def test_covering_adaptive_no_python(spark):
    plan = _plan(spark, "covering_adaptive")
    for py_node in ("ArrowEvalPython", "MapInPandas", "BatchEvalPython"):
        assert py_node not in plan
