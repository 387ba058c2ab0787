"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride Spark as ``binary`` columns with a metadata struct;
decode / feature-extraction runs as Arrow-batched ``mapInPandas`` so each
Python worker touches a whole batch of payloads at once — the correct
shape for a 100 TB media pipeline (payloads never pass through the driver,
partitions bound worker memory).

The actual codecs (PIL/librosa/ffmpeg) are NOT in this container, so the
decode step is stubbed: ``decode_image_features`` raises
``NotImplementedError`` unless ``fake=True``, in which case it produces
deterministic pseudo-features from the payload bytes (hash-derived), so the
plumbing — schema, batching, partitioning, UDF signature — is fully
testable.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Typed metadata carried next to every media payload.
MEDIA_META_STRUCT = T.StructType(
    [
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("format", T.StringType(), True),  # png|jpeg|wav|mp4…
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("sha1", T.StringType(), True),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)


def attach_fake_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Build a deterministic binary payload column from text (test stand-in
    for real image bytes) plus a media metadata struct."""
    payload = F.encode(F.col(text_col), "UTF-8").cast("binary")
    meta = F.struct(
        F.lit("image").alias("media_type"),
        F.lit("fake").alias("format"),
        F.lit(64).cast("int").alias("width"),
        F.lit(64).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )
    return df.select(F.col(id_col).alias("doc_id"), payload.alias("payload"), meta.alias("media"))


def decode_image_features(
    df: DataFrame,
    *,
    feature_dim: int = 8,
    fake: bool = False,
    batch_partitions: int | None = None,
) -> DataFrame:
    """Decode payloads → fixed-size feature vectors via ``mapInPandas``.

    Real decoding requires an image codec not present in this container —
    ``fake=False`` raises ``NotImplementedError`` **inside the executors'
    first batch** (fail-fast, documented stub). ``fake=True`` derives
    deterministic features from sha1(payload) so tests exercise the full
    distributed path: Arrow batches in, Arrow batches out, no driver hop.
    """
    if batch_partitions:
        df = df.repartition(batch_partitions)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image codecs unavailable in this environment; "
                    "use fake=True for deterministic stub features"
                )
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "sha1": pdf["payload"].map(lambda b: hashlib.sha1(b).hexdigest()),
                }
            )
            out["features"] = out["sha1"].map(
                lambda h: [
                    int(h[2 * i : 2 * i + 2], 16) / 255.0 for i in range(feature_dim)
                ]
            )
            yield out

    return df.mapInPandas(decode, schema=IMAGE_FEATURES_SCHEMA)
