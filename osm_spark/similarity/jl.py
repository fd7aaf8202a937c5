"""Johnson-Lindenstrauss projection — distance-preserving reduction.

The JL lemma: projecting n points into O(eps^-2 log n) dimensions
through a random +-1 (Rademacher/Achlioptas) matrix preserves all
pairwise distances within (1 +- eps).  In an ANN stack this runs
BEFORE LSH/IVF/PQ: 64 -> 16 dims cuts every downstream distance
computation 4x while keeping neighbor ranks stable — the standard
first stage when embeddings are wide and the index is
distance-based.

Spark-first shape: the sign matrix is PARAMETER-SIZED (in_dims x
out_dims), derived deterministically from md5 parity in Python and
embedded as plan literals — so the projection is pure in-row
zip_with + ascending-order fold arithmetic: zero shuffle, zero
Python at execution time, whole-stage codegen, and the SQL oracle
can write the identical +-term chain out longhand (multiplying by
+-1.0 is exact, and both engines add in the same order, so even the
floating sums are bit-identical before quantization).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sign_matrix(in_dims: int, out_dims: int, salt: str = "jl") -> list:
    """in_dims x out_dims of +-1, from md5 parity — deterministic
    across processes/engines (pure function of indices + salt)."""
    return [
        [
            1
            if int(
                hashlib.md5(f"{salt}|{i}|{j}".encode()).hexdigest()[0], 16
            ) < 8
            else -1
            for j in range(out_dims)
        ]
        for i in range(in_dims)
    ]


def project(
    vecs: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    in_dims: int = 64,
    out_dims: int = 16,
    salt: str = "jl",
) -> DataFrame:
    """-> (id, out_dim, y_e6): floor(1e6 * sum_i x_i * s_ij) per
    output dimension, ascending-i summation order."""
    mat = sign_matrix(in_dims, out_dims, salt)
    x = F.col(vec_col)
    dims = []
    for j in range(out_dims):
        signs = F.array(*[F.lit(float(mat[i][j])) for i in range(in_dims)])
        y = F.aggregate(
            F.zip_with(x, signs, lambda a, b: a.cast("double") * b),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        dims.append(
            F.struct(
                F.lit(j).alias("out_dim"),
                F.floor(y * 1e6).cast("long").alias("y_e6"),
            )
        )
    return vecs.select(
        F.col(id_col), F.explode(F.array(*dims)).alias("p")
    ).select(id_col, F.col("p.out_dim").alias("out_dim"),
             F.col("p.y_e6").alias("y_e6"))
