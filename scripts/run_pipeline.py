"""spark-submit entrypoint: the full geocode -> tile -> rollup pipeline
with per-stage lineage manifests and snapshot resume.

North-rule shipping shape:

    spark-submit --py-files osm_spark.zip scripts/run_pipeline.py \
        --sf-dir /root/testdata/sf0.01 --out /tmp/geotile_out

(locally, plain ``python scripts/run_pipeline.py`` works too — the
module is importable either way). Re-running after a crash or with the
same input recomputes only uncommitted stages (see
osm_spark/pipeline/manifest.py).

Stages:
  1. pages        documents -> (url, warc_ts, html, text, lang, lat, lon)
  2. tile_assign  per-page z12 tile + quadkey clustering key, output
                  range-partitioned by the quadkey value (cell-prefix
                  clustering — spatially adjacent tiles colocate)
  3. tile_counts  per-tile page counts, pyramid z12..z0
  4. hex_assign   per-page aperture-7 hex cell (H3 surface, res 6) via
                  the vectorized Arrow encode + res-3 ancestor by pure
                  bit math, range-partitioned by cell id (hex ids
                  cluster hierarchically by construction)
  5. hex_counts   per-hex-cell page counts at res 6 and the res-3
                  aperture-7 rollup
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", required=True)
    ap.add_argument("--zoom", type=int, default=12)
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    args = ap.parse_args()

    from osm_spark.geo import tiles
    from osm_spark.pipeline import manifest, pages
    from osm_spark.session import get_spark

    spark = get_spark("geotile-pipeline", master=f"local[{args.cpus}]")
    spark.sparkContext.setLogLevel("WARN")

    fp = f"{args.sf_dir}|z{args.zoom}"
    z = args.zoom

    pg = manifest.run_stage(
        spark, args.out, "pages", fp, lambda: pages.pages(spark, args.sf_dir)
    )

    def build_assign():
        xy = pg.select(
            "url",
            "doc_id",
            tiles.tile_x("lon", z).alias("tile_x"),
            tiles.tile_y("lat", z).alias("tile_y"),
        )
        keyed = xy.withColumn(
            "cell_key", tiles.quadkey_value("tile_x", "tile_y")
        )
        # cell-prefix range partitioning: spatially adjacent tiles land
        # in the same output partitions (the Iceberg sort-order analog)
        return keyed.repartitionByRange(int(args.cpus), "cell_key")

    assign = manifest.run_stage(spark, args.out, "tile_assign", fp, build_assign)

    def build_counts():
        base = assign.groupBy("tile_x", "tile_y").agg(
            F.count("*").alias("n_pages")
        )
        out = base.withColumn("zoom", F.lit(z))
        cur = base
        for zz in range(z - 1, -1, -1):
            cur = (
                cur.select(
                    F.shiftright("tile_x", 1).alias("tile_x"),
                    F.shiftright("tile_y", 1).alias("tile_y"),
                    "n_pages",
                )
                .groupBy("tile_x", "tile_y")
                .agg(F.sum("n_pages").alias("n_pages"))
            )
            out = out.unionByName(cur.withColumn("zoom", F.lit(zz)))
        return out

    counts = manifest.run_stage(spark, args.out, "tile_counts", fp, build_counts)

    def build_hex_assign():
        from osm_spark.geo import hex_spark as HS

        keyed = pg.select(
            "url",
            "doc_id",
            HS.hex_cell("lat", "lon", 6).alias("cell"),
        ).withColumn("cell_r3", HS.hex_parent("cell", 3))
        return keyed.repartitionByRange(int(args.cpus), "cell")

    hexes = manifest.run_stage(spark, args.out, "hex_assign", fp, build_hex_assign)

    def build_hex_counts():
        fine = hexes.groupBy("cell").agg(F.count("*").alias("n_pages"))
        coarse = hexes.groupBy(F.col("cell_r3").alias("cell")).agg(
            F.count("*").alias("n_pages")
        )
        return fine.withColumn("res", F.lit(6)).unionByName(
            coarse.withColumn("res", F.lit(3))
        )

    hex_counts = manifest.run_stage(
        spark, args.out, "hex_counts", fp, build_hex_counts
    )

    total = counts.where(F.col("zoom") == 0).agg(F.sum("n_pages")).first()[0]
    n_pages = pg.count()
    assert total == n_pages, (total, n_pages)
    hex_total = (
        hex_counts.where(F.col("res") == 3).agg(F.sum("n_pages")).first()[0]
    )
    assert hex_total == n_pages, (hex_total, n_pages)
    print(
        json.dumps(
            {
                "pages": n_pages,
                "tiles_z": z,
                "rollup_rows": counts.count(),
                "hex_cells": hex_counts.count(),
                "out": args.out,
                "resumable": True,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
