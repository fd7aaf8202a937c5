"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing (schemas, partition discipline, Arrow batch
shapes, UDF signatures) is real and tested; the codec itself is stubbed
— the sandbox has no image/audio libraries, so ``decode_image`` with
``real_decode=True`` raises NotImplementedError, and the default is a
DETERMINISTIC FAKE decode (byte-arithmetic "pixels") that keeps every
pipeline property checkable: fixed output schema, per-row determinism,
batch independence.

Production swap-in: replace ``_fake_decode_batch`` with PIL/libvips in
the same mapInPandas generator — the plan (narrow scan -> Arrow batches
-> pandas transform, no shuffle) is unchanged.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, IntegerType, LongType, StringType, StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("blob", BinaryType()),
        StructField("meta", StructType(
            [
                StructField("mime", StringType()),
                StructField("n_bytes", LongType()),
            ]
        )),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("feature", ArrayType(LongType())),  # 8-bin byte histogram
    ]
)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Stand-in media table: utf-8 bytes of text as the opaque blob."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("kind"),
        F.encode("text", "UTF-8").alias("blob"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.octet_length(F.encode("text", "UTF-8")).alias("n_bytes"),
        ).alias("meta"),
    )


def _fake_decode_batch(blobs: pd.Series) -> pd.DataFrame:
    """Deterministic fake decode: 'dimensions' from blob length, an 8-bin
    byte histogram as the 'feature'. Vectorized numpy over the batch."""
    widths, heights, chans, feats = [], [], [], []
    for b in blobs:
        arr = np.frombuffer(bytes(b), dtype=np.uint8)
        n = len(arr)
        widths.append(int(n % 640 + 1))
        heights.append(int(n % 480 + 1))
        chans.append(3)
        hist = np.bincount(arr >> 5, minlength=8).astype(np.int64)
        feats.append(hist.tolist())
    return pd.DataFrame(
        {"width": widths, "height": heights, "channels": chans, "feature": feats}
    )


def decode_features(media: DataFrame, real_decode: bool = False) -> DataFrame:
    """Decode/feature-extract via mapInPandas (Arrow-batched, no shuffle).

    ``real_decode=True`` is the production path — STUB: raises
    NotImplementedError (no image/audio libs in this environment).
    """
    if real_decode:
        raise NotImplementedError(
            "real media decode requires PIL/libvips/ffmpeg — not available "
            "in this environment; the fake-decode path exercises the same "
            "Spark plumbing"
        )

    def gen(batches):
        for pdf in batches:
            out = _fake_decode_batch(pdf["blob"])
            out.insert(0, "media_id", pdf["media_id"].values)
            yield out

    return media.select("media_id", "blob").mapInPandas(gen, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' plumbing: slice the blob every n bytes (stand-in
    for video frame extraction) — pure column ops, one row per frame."""
    n_frames = F.floor(F.octet_length("blob") / every_n_bytes).cast("int")
    # NB: sequence(0, -1) yields a DESCENDING [0,-1] in Spark — blobs
    # shorter than one frame must produce an empty list, not two rows.
    idxs = F.when(n_frames > 0, F.sequence(F.lit(0), n_frames - 1)).otherwise(
        F.array().cast("array<int>")
    )
    return (
        media.select(
            "media_id",
            F.posexplode(idxs).alias("frame_idx", "_"),
            F.col("blob"),
        )
        .select(
            "media_id",
            "frame_idx",
            F.substring(
                "blob", F.col("frame_idx") * every_n_bytes + 1, every_n_bytes
            ).alias("frame_bytes"),
        )
    )
