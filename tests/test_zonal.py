"""geo/zonal.py per-polygon rollup unit tests."""

from pyspark.sql import functions as F

from osm_spark.geo import zonal as ZN


def _polys(spark, rows):
    return spark.createDataFrame(
        [
            (
                pid,
                [x0, x1, x1, x0, x0],
                [y0, y0, y1, y1, y0],
                x0, x1, y0, y1,
            )
            for pid, x0, x1, y0, y1 in rows
        ],
        "poly_id long, xs array<double>, ys array<double>, "
        "xmin double, xmax double, ymin double, ymax double",
    )


def test_zonal_stats_counts_and_fixed_point_mean(spark):
    pts = spark.createDataFrame(
        [
            (1, 10, 0.5, 0.5),   # zone A
            (2, 20, 0.6, 0.6),   # zone A
            (3, 5, 0.5, 0.5),    # zone A
            (4, 99, 5.5, 5.5),   # zone B
            (5, 7, 9.9, 9.9),    # no zone
        ],
        "doc_id long, n_chars long, lat double, lon double",
    )
    polys = _polys(spark, [(1, 0.0, 1.0, 0.0, 1.0), (2, 5.0, 6.0, 5.0, 6.0)])
    out = {
        r.poly_id: r
        for r in ZN.zonal_stats(pts, polys, "n_chars", zoom=4, salt=2).collect()
    }
    assert set(out) == {1, 2}
    a = out[1]
    assert (a.n_points, a.sum_val, a.min_point, a.max_point) == (3, 35, 1, 3)
    assert a.mean_val_e3 == 35 * 1000 // 3  # exact integer fixed point
    assert out[2].n_points == 1 and out[2].sum_val == 99


def test_zonal_stats_overlapping_zones_count_twice(spark):
    pts = spark.createDataFrame(
        [(1, 4, 0.5, 0.5)], "doc_id long, n_chars long, lat double, lon double"
    )
    polys = _polys(
        spark, [(1, 0.0, 1.0, 0.0, 1.0), (2, 0.25, 0.75, 0.25, 0.75)]
    )
    out = ZN.zonal_stats(pts, polys, "n_chars", zoom=4, salt=1)
    assert out.count() == 2
    assert out.agg(F.sum("n_points")).first()[0] == 2
