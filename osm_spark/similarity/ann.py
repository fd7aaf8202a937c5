"""Similarity search over embedding columns (array<float>).

- brute_force_topk: exact cosine top-k. Plan: broadcast the (small)
  query set, one narrow pass over the corpus with numpy matmul per
  Arrow batch (mapInPandas), per-query top-k via window. At 100 TB the
  corpus side never shuffles; only |queries| x |corpus| score rows do,
  and those are cut to k per query by partial top-k before the shuffle.
- random_hyperplane_bucket: sign-LSH bucketing (column HOFs only) — the
  scale path: equi-join on bucket replaces the all-pairs score.
- topk_sql: DuckDB twin for the correctness gate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StructField, StructType


def cosine_expr(a, b) -> Column:
    """Cosine via zip_with + sequential aggregate (deterministic l-to-r
    summation). Pure column HOF — used when both sides are columns."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    ad = F.transform(a, lambda x: x.cast("double"))
    bd = F.transform(b, lambda x: x.cast("double"))
    dot = F.aggregate(F.zip_with(ad, bd, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(F.transform(ad, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))
    nb = F.sqrt(F.aggregate(F.transform(bd, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))
    return dot / (na * nb)


def brute_force_topk(
    corpus: DataFrame,
    queries: list[tuple[int, list[float]]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query (queries broadcast, numpy matmul
    per Arrow batch). Returns (q, rank, neighbor) with rank 1..k, ties
    broken by neighbor id."""
    spark = corpus.sparkSession
    qids = [int(q) for q, _ in queries]
    qmat = np.asarray([v for _, v in queries], dtype=np.float64)
    qnorm = np.linalg.norm(qmat, axis=1)
    bq = spark.sparkContext.broadcast((qids, qmat, qnorm))

    schema = StructType(
        [
            StructField("q", LongType()),
            StructField("neighbor", LongType()),
            StructField("cos", DoubleType()),
        ]
    )

    def score(batches):
        qids_, qmat_, qnorm_ = bq.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy()
            emb = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            dots = emb @ qmat_.T  # (n, q)
            norms = np.linalg.norm(emb, axis=1)
            cos = dots / (norms[:, None] * qnorm_[None, :])
            n, nq = cos.shape
            yield pd.DataFrame(
                {
                    "q": np.repeat(qids_, n),
                    "neighbor": np.tile(ids, nq),
                    "cos": cos.T.reshape(-1),
                }
            )

    scored = corpus.select(id_col, vec_col).mapInPandas(score, schema=schema)
    scored = scored.filter(F.col("neighbor") != F.col("q"))
    w = Window.partitionBy("q").orderBy(F.col("cos").desc(), F.col("neighbor"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q", "rank", "neighbor")
    )


def hyperplanes(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random integer hyperplanes: h[p][j] =
    ((p*37 + j*101) % 19) - 9. Reproducible in any engine."""
    return [
        [float((p * 37 + j * 101) % 19 - 9) for j in range(dim)]
        for p in range(n_planes)
    ]


def random_hyperplane_bucket(
    corpus: DataFrame,
    dim: int,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Sign-LSH bucket id per vector, pure column HOFs (no Python)."""
    planes = hyperplanes(n_planes, dim)
    ad = F.transform(vec_col, lambda x: x.cast("double"))
    bucket = F.lit(0)
    for p, plane in enumerate(planes):
        pl = F.array(*[F.lit(v) for v in plane])
        dot = F.aggregate(
            F.zip_with(ad, pl, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
        )
        bucket = bucket + F.when(dot > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return corpus.select(F.col(id_col), bucket.alias("bucket"))


def ivf_assign(
    corpus: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF coarse quantizer: assign each vector to the centroid with the
    max dot product (ties -> larger centroid id, deterministic via
    struct max). Pure column HOFs — the sequential double fold is
    bit-identical across engines, so cell ids are exactly reproducible.

    At scale: centroids are a trained broadcast list (here: a
    deterministic subset of the corpus standing in for k-means);
    assignment is one narrow codegen stage; the cell id becomes the
    partitioning/bucketing key for probe-limited search."""
    ad = F.transform(vec_col, lambda x: x.cast("double"))
    cands = []
    for cid, vec in centroids:
        pl = F.array(*[F.lit(float(v)) for v in vec])
        dot = F.aggregate(
            F.zip_with(ad, pl, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        cands.append(F.struct(dot.alias("dot"), F.lit(int(cid)).alias("cid")))
    best = F.greatest(*cands) if len(cands) > 1 else cands[0]
    return corpus.select(
        F.col(id_col), best["cid"].cast("long").alias("cell")
    )


def ivf_search(
    corpus: DataFrame,
    queries: list[tuple[int, list[float]]],
    centroids: list[tuple[int, list[float]]],
    nprobe: int = 2,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF probe search: per query take the ``nprobe`` best cells (by
    centroid dot), brute-force cosine only within those cells, emit
    rank-only top-k (ties -> smaller neighbor id). The scale path: the
    probed fraction of the corpus is nprobe/n_cells, reached via a cell
    equi-join instead of an all-pairs cross."""
    import numpy as np

    cmat = {cid: np.asarray(v, dtype=np.float64) for cid, v in centroids}

    def query_cells(vec):
        v = np.asarray(vec, dtype=np.float64)
        scored = sorted(
            ((float(v @ c), cid) for cid, c in cmat.items()),
            key=lambda t: (-t[0], -t[1]),
        )
        return [cid for _, cid in scored[:nprobe]]

    assigned = ivf_assign(corpus, centroids, id_col, vec_col)
    corpus_cells = corpus.join(assigned, id_col)

    spark = corpus.sparkSession
    probe_rows = [
        (int(qid), int(cell)) for qid, vec in queries for cell in query_cells(vec)
    ]
    probes = spark.createDataFrame(probe_rows, "q long, cell long")
    qdf = spark.createDataFrame(
        [(int(qid), [float(x) for x in vec]) for qid, vec in queries],
        f"q long, qvec array<double>",
    )
    cand = (
        probes.join(corpus_cells, "cell")
        .join(F.broadcast(qdf), "q")
        .where(F.col(id_col) != F.col("q"))
    )
    cos = cosine_expr(F.col("qvec"), F.col(vec_col))
    scored = cand.select(
        "q", F.col(id_col).alias("neighbor"), cos.alias("cos")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("q").orderBy(F.col("cos").desc(), F.col("neighbor"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .select("q", "rank", "neighbor")
    )
