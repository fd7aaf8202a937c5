"""knn_kring at high zoom: the probe-radius selection is now a Spark
aggregation (nothing data-sized is collected), so the zoom is not
capped by driver memory — verify z10 agrees with exact brute force."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from osm_spark.geo import distance
from osm_spark.geo.cells import knn_kring
from osm_spark.pipeline import pages


@pytest.mark.parametrize("zoom", [7, 10])
def test_knn_matches_brute_force(spark, sf_dir, zoom):
    corpus = pages.page_points(spark, sf_dir)
    queries = [(1, 40.7, -74.0), (2, -10.0, 30.0), (3, 60.0, 179.5)]
    k = 5

    got = {
        (r["qid"], r["rank"]): r["neighbor"]
        for r in knn_kring(corpus, queries, k=k, zoom=zoom).collect()
    }

    qdf = spark.createDataFrame(queries, "qid long, qlat double, qlon double")
    scored = corpus.crossJoin(qdf).select(
        "qid",
        F.col("doc_id").alias("neighbor"),
        distance.haversine_m("qlat", "qlon", "lat", "lon").alias("dist_m"),
    )
    w = Window.partitionBy("qid").orderBy(F.col("dist_m").asc(), F.col("neighbor"))
    want = {
        (r["qid"], r["rank"]): r["neighbor"]
        for r in scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .collect()
    }
    # ring probing is exact as long as the refinement ring captured the
    # true top-k; at these corpus densities it must equal brute force
    assert got == want


@pytest.mark.parametrize("probe_limit", [4096, 60])
def test_knn_hex_matches_brute_force(spark, sf_dir, probe_limit):
    """Hex-ring kNN is exact — including antimeridian queries (the
    planar hex grid does not wrap; the verify rect splits) and under
    forced resolution coarsening (tiny probe_limit)."""
    from osm_spark.geo.cells import knn_hex

    corpus = pages.page_points(spark, sf_dir)
    queries = [(1, 40.7, -74.0), (2, -10.0, 30.0), (3, 60.0, 179.5), (4, -84.0, 0.5)]
    k = 5
    got = {
        (r["qid"], r["rank"]): r["neighbor"]
        for r in knn_hex(
            corpus, queries, k=k, res=4, probe_limit=probe_limit
        ).collect()
    }
    qdf = spark.createDataFrame(queries, "qid long, qlat double, qlon double")
    scored = corpus.crossJoin(qdf).select(
        "qid",
        F.col("doc_id").alias("neighbor"),
        distance.haversine_m("qlat", "qlon", "lat", "lon").alias("dist_m"),
    )
    w = Window.partitionBy("qid").orderBy(F.col("dist_m").asc(), F.col("neighbor"))
    want = {
        (r["qid"], r["rank"]): r["neighbor"]
        for r in scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .collect()
    }
    assert got == want
