"""similarity/quantize.py int8 quantization unit tests."""

from pyspark.sql import functions as F

from osm_spark.similarity import quantize as QZ


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_codes_are_exact_at_extremes(spark):
    df = _vecs(spark, [(1, [1.0, -1.0, 0.5, 0.0])])
    codes = df.select(QZ.codes_int8("embedding").alias("q")).first().q
    assert codes[0] == 127          # +maxabs -> exactly 127
    assert codes[1] == -127         # -maxabs -> exactly -127
    assert codes[2] == 63           # floor(0.5 * 127) = 63
    assert codes[3] == 0


def test_zero_vector_guards_division(spark):
    df = _vecs(spark, [(1, [0.0, 0.0, 0.0])])
    row = QZ.quantize_int8(df).first()
    assert (row.scale_e9, row.qsum, row.qmin, row.qmax, row.max_err_e9) == \
        (0, 0, 0, 0, 0)


def test_reconstruction_error_bounded_by_one_level(spark):
    import random

    rng = random.Random(7)
    df = _vecs(
        spark,
        [(i, [rng.uniform(-3, 3) for _ in range(32)]) for i in range(50)],
    )
    out = QZ.quantize_int8(df)
    rows = out.collect()
    assert len(rows) == 50
    for r in rows:
        # |x - q*scale/127| < scale/127  (floor quantization step)
        assert r.max_err_e9 < r.scale_e9 // 127 + 1
        assert -127 <= r.qmin <= r.qmax <= 127


def test_quantize_plan_is_scan_shaped(spark):
    df = _vecs(spark, [(1, [1.0, 2.0])])
    plan = QZ.quantize_int8(df)._jdf.queryExecution().executedPlan().toString()
    for node in ("Exchange", "Join", "BatchEvalPython", "ArrowEvalPython",
                 "MapInPandas"):
        assert node not in plan, plan
