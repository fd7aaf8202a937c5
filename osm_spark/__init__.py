"""osm_spark — a from-scratch PySpark-native spatial-join + tiling engine.

Re-expresses the semantics of the reference library (paulmach/osm, Go) as
idiomatic Spark DataFrame transforms:

- packed element/feature ids            (osm_spark.core.ids)
- slippy-map tile math, zooms 0-18      (osm_spark.geo.tiles)
- aperture-7 hex index (H3 surface)     (osm_spark.geo.hex, .hex_spark)
- S2-style adaptive covering            (osm_spark.geo.covering)
- WKB geometry codec                    (osm_spark.geo.wkb)
- point-in-polygon joins (ray-cast/WKB) (osm_spark.geo.pip)
- cell index / k-ring / exact kNN       (osm_spark.geo.cells)
- GeoJSON feature emission              (osm_spark.functions.geojson)
- BMP/WAV media codecs                  (osm_spark.multimodal.codecs)
- bucketed state store + time travel    (osm_spark.streaming.state_store)
- polygon heuristics + tag predicates   (osm_spark.functions)
- temporal as-of annotation joins       (osm_spark.temporal.annotate)
- multipolygon / ring assembly          (osm_spark.geom.assembly)
- replication streaming                 (osm_spark.streaming.replication)
- web-scale text ops (dedup, quality)   (osm_spark.text)
- embedding similarity search (BF/LSH/IVF) (osm_spark.similarity)
- raster <-> vector tile conversion     (osm_spark.geo.raster)
- multimodal binary media columns       (osm_spark.multimodal)
- iterative graph depth (child-first)   (osm_spark.plans.iterate)
- pages pipeline + lineage manifest     (osm_spark.pipeline)

Everything is DataFrame/SQL column math or Arrow-vectorized pandas UDFs;
no per-row Python in any hot path.
"""

__version__ = "0.1.0"
