"""osm_spark — a from-scratch PySpark-native spatial-join + tiling engine.

Re-expresses the semantics of the reference library (paulmach/osm, Go) as
idiomatic Spark DataFrame transforms:

- packed element/feature ids            (osm_spark.core.ids)
- slippy-map tile math, zooms 0-18      (osm_spark.geo.tiles)
- point-in-polygon joins (ray-cast)     (osm_spark.geo.pip)
- cell index / k-ring / kNN             (osm_spark.geo.cells)
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
