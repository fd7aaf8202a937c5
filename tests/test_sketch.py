"""KMV sketch: bottom-k contents, exact-mode switch, estimator math."""

from __future__ import annotations

import hashlib
import sys

sys.path.insert(0, "/root/repo")

from osm_spark.text import sketch as sk


def _items(spark, rows):
    return spark.createDataFrame(rows, "grp string, item string")


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_sketch_keeps_k_smallest_distinct_digests(spark):
    rows = [("g", f"x{i}") for i in range(30)] + [("g", "x0")] * 5  # dups
    out = sk.kmv_sketch(_items(spark, rows), "grp", "item", k=4).collect()
    assert len(out) == 4
    expect = sorted(_md5(f"x{i}") for i in range(30))[:4]
    got = [r.dig for r in sorted(out, key=lambda r: r.rank)]
    assert got == expect


def test_exact_mode_when_under_k(spark):
    rows = [("g", f"v{i}") for i in range(5)]
    s = sk.kmv_sketch(_items(spark, rows), "grp", "item", k=16)
    est = sk.kmv_estimate(s, "grp", k=16).first()
    assert est.n_kept == 5 and est.est == 5


def test_estimator_formula_matches_python(spark):
    rows = [("g", f"w{i}") for i in range(100)]
    s = sk.kmv_sketch(_items(spark, rows), "grp", "item", k=8)
    est = sk.kmv_estimate(s, "grp", k=8).first()
    vk_dig = sorted(_md5(f"w{i}") for i in range(100))[7]
    vk = int(vk_dig[:15], 16)
    assert est.n_kept == 8
    assert est.est == 7 * ((1 << 60) // vk)
    # the estimate should be within ~3x of truth at k=8 (deterministic
    # fixture, so this is a fixed fact, not a flaky probability)
    assert 30 <= est.est <= 300


def test_salt_invisible_and_groups_independent(spark):
    rows = [(f"g{i % 3}", f"t{i}") for i in range(60)]
    a = {(r.grp, r.rank, r.dig) for r in
         sk.kmv_sketch(_items(spark, rows), "grp", "item", k=5, salt=1).collect()}
    b = {(r.grp, r.rank, r.dig) for r in
         sk.kmv_sketch(_items(spark, rows), "grp", "item", k=5, salt=64).collect()}
    assert a == b and len(a) == 15
