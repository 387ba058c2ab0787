"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride Spark as ``binary`` columns with a metadata struct;
decode / feature-extraction runs as Arrow-batched ``mapInPandas`` so each
Python worker touches a whole batch of payloads at once — the correct
shape for a 100 TB media pipeline (payloads never pass through the driver,
partitions bound worker memory).

The decode step is REAL for binary PPM (P6): a dependency-free numpy
parser turns header + raw RGB bytes into an (h, w, 3) pixel array and
channel statistics — so the path genuinely exercises bytes → pixels →
features. Formats that need an external codec (JPEG/PNG magic detected)
raise ``NotImplementedError`` inside the executors' first batch: this
container ships no PIL/ffmpeg, and silently faking those would hide it.
A hash-derived stub (``fake=True``) remains for plumbing tests that only
care about Arrow batching, not pixels.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Typed metadata carried next to every media payload.
MEDIA_META_STRUCT = T.StructType(
    [
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("format", T.StringType(), True),  # ppm|png|jpeg|wav|mp4…
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

IMAGE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("r_sum", T.LongType(), True),
        T.StructField("g_sum", T.LongType(), True),
        T.StructField("b_sum", T.LongType(), True),
        T.StructField("px_sq_sum", T.LongType(), True),
        T.StructField("sha1", T.StringType(), True),
    ]
)


# ---------------------------------------------------------------------------
# PPM (P6) codec — pure numpy, no external deps
# ---------------------------------------------------------------------------


def encode_ppm(pixels: np.ndarray) -> bytes:
    """Serialize an ``(h, w, 3)`` uint8 array as a binary P6 PPM."""
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) pixel array, got shape {pixels.shape}")
    h, w, _ = pixels.shape
    return f"P6\n{w} {h}\n255\n".encode("ascii") + pixels.astype(np.uint8).tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Parse a binary P6 PPM into an ``(h, w, 3)`` uint8 array.

    Header grammar: ``P6``, then whitespace-separated width, height,
    maxval (``#`` comments allowed between tokens), then ONE whitespace
    byte, then ``w*h*3`` raw RGB bytes. Raises ``ValueError`` on anything
    malformed — decode errors must surface per-batch, not as garbage
    features.
    """
    if not payload.startswith(b"P6"):
        raise ValueError("not a binary PPM (P6) payload")
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(payload) and payload[pos : pos + 1] not in (b"\n", b"\r"):
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        if pos == start:
            raise ValueError("truncated PPM header")
        tokens.append(payload[start:pos])
    pos += 1  # the single whitespace byte after maxval
    w, h, maxval = (int(t) for t in tokens)
    if maxval != 255:
        raise ValueError(f"only maxval=255 PPMs supported, got {maxval}")
    need = w * h * 3
    data = payload[pos : pos + need]
    if len(data) != need:
        raise ValueError(f"PPM body has {len(data)} bytes, expected {need}")
    return np.frombuffer(data, dtype=np.uint8).reshape(h, w, 3)


def ppm_features(pixels: np.ndarray) -> list[float]:
    """The 8 base image features, each scaled into [0, 1]: per-channel
    means and population stds (R, G, B), then overall mean and std."""
    px = pixels.astype(np.float64)
    means = px.mean(axis=(0, 1)) / 255.0
    stds = px.std(axis=(0, 1)) / 255.0
    return [*means, *stds, float(px.mean() / 255.0), float(px.std() / 255.0)]


def _fake_pixels(text: str, width: int, height: int) -> np.ndarray:
    """Deterministic pseudo-image from a text seed: a linear byte ramp
    ``(i*a + b) mod 256`` with (a, b) drawn from md5(text) — reproducible
    across platforms and hand-computable in tests."""
    digest = hashlib.md5(text.encode("utf-8")).digest()
    a = 1 + 2 * (digest[0] % 127)  # odd → full-period mod 256
    b = digest[1]
    vals = (np.arange(width * height * 3, dtype=np.int64) * a + b) % 256
    return vals.astype(np.uint8).reshape(height, width, 3)


def attach_fake_payload(
    df: DataFrame, id_col: str, text_col: str, *, width: int = 8, height: int = 8
) -> DataFrame:
    """Build a REAL binary P6 PPM payload column (pixels deterministically
    derived from the text — test stand-in for actual camera bytes) plus a
    media metadata struct. Generation runs as an Arrow-batched pandas UDF
    on the executors; payload bytes never touch the driver."""

    @F.pandas_udf(T.BinaryType())
    def make_ppm(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda t: encode_ppm(_fake_pixels(t if t is not None else "", width, height))
        )

    meta = F.struct(
        F.lit("image").alias("media_type"),
        F.lit("ppm").alias("format"),
        F.lit(width).cast("int").alias("width"),
        F.lit(height).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )
    return df.select(
        F.col(id_col).alias("doc_id"), make_ppm(F.col(text_col)).alias("payload"), meta.alias("media")
    )


def decode_image_features(
    df: DataFrame,
    *,
    feature_dim: int = 8,
    fake: bool = False,
    batch_partitions: int | None = None,
) -> DataFrame:
    """Decode payloads → fixed-size feature vectors via ``mapInPandas``.

    The real path dispatches on magic bytes: binary PPM decodes with the
    numpy parser (header → pixel array → channel mean/std features);
    JPEG/PNG — or anything else — raise ``NotImplementedError`` in the
    executors' first batch (fail-fast: those codecs aren't in this
    container). ``fake=True`` keeps the sha1-derived stub features for
    tests that exercise only the Arrow plumbing.

    Feature vectors are ``feature_dim`` floats in [0, 1]: the 8 base
    stats (see :func:`ppm_features`) truncated, or zero-padded beyond 8.
    """
    if batch_partitions:
        df = df.repartition(batch_partitions)

    def fit(vals: list[float]) -> list[float]:
        return (vals + [0.0] * feature_dim)[:feature_dim]

    def real_features(b: bytes) -> list[float]:
        if b.startswith(b"P6"):
            return fit(ppm_features(decode_ppm(b)))
        magic = "jpeg" if b.startswith(b"\xff\xd8") else "png" if b.startswith(b"\x89PNG") else "unknown"
        raise NotImplementedError(
            f"image codecs unavailable in this environment for format={magic}; "
            "supply binary PPM (P6) payloads or use fake=True stub features"
        )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "sha1": pdf["payload"].map(lambda b: hashlib.sha1(b).hexdigest()),
                }
            )
            if fake:
                out["features"] = out["sha1"].map(
                    lambda h: fit([int(h[2 * i : 2 * i + 2], 16) / 255.0 for i in range(8)])
                )
            else:
                out["features"] = pdf["payload"].map(real_features)
            yield out

    return df.mapInPandas(decode, schema=IMAGE_FEATURES_SCHEMA)


def decode_image_stats(df: DataFrame) -> DataFrame:
    """Decode PPM payloads → EXACT integer pixel statistics per image:
    parsed header dims plus per-channel pixel sums and the global
    sum-of-squares (all int64, no float rounding anywhere).

    This is the oracle-checkable face of the decode path: the float
    features of :func:`decode_image_features` are pure functions of these
    sums, but float means/stds can't be hash-compared across engines,
    while integer sums can — an independent oracle that re-derives the
    expected pixels from the generation formula pins the ENTIRE
    bytes→header-parse→pixel-reconstruction path exactly (any codec bug —
    off-by-one header skip, channel swap, truncation — shifts a sum).
    Same Arrow-batched ``mapInPandas`` shape as the feature decode:
    payloads never touch the driver.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                px = decode_ppm(b).astype(np.int64)
                h, w, _ = px.shape
                rows.append(
                    (
                        doc_id,
                        len(b),
                        w,
                        h,
                        int(px[:, :, 0].sum()),
                        int(px[:, :, 1].sum()),
                        int(px[:, :, 2].sum()),
                        int((px * px).sum()),
                        hashlib.sha1(b).hexdigest(),
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_STATS_SCHEMA.fields])

    return df.mapInPandas(decode, schema=IMAGE_STATS_SCHEMA)
