"""text/cms.py Count-Min sketch unit tests."""

from pyspark.sql import functions as F

from osm_spark.text import cms as C


def _tf(spark, rows):
    return spark.createDataFrame(rows, "token string, n long")


def test_cms_estimate_never_undercounts(spark):
    tf = _tf(spark, [(f"tok{i}", 10 + i) for i in range(40)])
    sketch = C.cms_build(tf, "token", "n", depth=4, width=8)
    out = C.cms_estimate(tf, sketch, "token", depth=4, width=8)
    rows = out.collect()
    assert len(rows) == 40
    assert all(r.est_n >= r.n for r in rows)
    # width 8 with 40 tokens MUST collide somewhere
    assert any(r.est_n > r.n for r in rows)


def test_cms_exact_when_no_collisions(spark):
    tf = _tf(spark, [("a", 5), ("b", 7)])
    sketch = C.cms_build(tf, "token", "n", depth=4, width=1024)
    out = {r.token: r.est_n for r in
           C.cms_estimate(tf, sketch, "token", depth=4, width=1024).collect()}
    assert out == {"a": 5, "b": 7}


def test_cms_shard_sketches_merge_to_union_sketch(spark):
    """Cell-wise SUM of shard sketches == sketch of the union — the
    mergeability property that makes CMS tree-aggregatable."""
    s1 = _tf(spark, [("a", 3), ("b", 2)])
    s2 = _tf(spark, [("a", 4), ("c", 9)])
    union = _tf(spark, [("a", 7), ("b", 2), ("c", 9)])
    merged = (
        C.cms_build(s1, "token", "n", width=8)
        .unionAll(C.cms_build(s2, "token", "n", width=8))
        .groupBy("row_id", "bucket")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )
    direct = C.cms_build(union, "token", "n", width=8)
    assert sorted(map(tuple, merged.collect())) == \
        sorted(map(tuple, direct.collect()))


def test_cms_bucket_matches_sql_twin(spark):
    """Spark bucket function == DuckDB twin for a sample of tokens."""
    import duckdb

    toks = [(f"w{i}",) for i in range(25)]
    df = spark.createDataFrame(toks, "token string")
    got = {
        (r.token, r.row_id): r.bucket
        for r in df.select(
            "token",
            F.explode(F.sequence(F.lit(0), F.lit(3))).alias("row_id"),
        ).select("token", "row_id", C.cms_bucket("token", "row_id", 16))
        .collect()
    }
    b = C.cms_bucket_sql("token", "row_id", 16)
    want = {
        (t, r): v
        for t, r, v in duckdb.sql(
            f"SELECT token, row_id, {b} FROM (SELECT unnest("
            f"{[t for t, in toks]!r}) AS token), "
            "(SELECT unnest([0,1,2,3]) AS row_id)"
        ).fetchall()
    }
    assert got == want
