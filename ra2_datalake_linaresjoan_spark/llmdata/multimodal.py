"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the lakehouse as ``binary`` columns with a
struct of metadata (modality, mime, width/height/duration…). The Spark-side
plumbing — schema, partition-friendly batch shape, Arrow-batched
``mapInPandas`` UDF signatures — is real and tested. Decode kernels come in
three modes: ``decode_mode="numpy"`` is a REAL decoder for uncompressed
image formats (binary PPM / 24-bit BMP via ``numpy_codecs`` — exact
pixels, pure numpy, no Pillow needed); ``"stub"`` (default) produces
deterministic fake features for formats the container cannot decode; and
``decode_stub=False`` raises NotImplementedError where a Pillow/ffmpeg
call would go (JPEG/PNG/video remain library-gated).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Canonical multimodal column schema: payload + typed metadata struct.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("modality", T.StringType()),
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def attach_binary_payload(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Demo/bootstrap: wrap a text column as a binary payload with metadata —
    exercises the exact schema/plumbing a real image column would use."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            F.lit("text").alias("modality"),
            F.lit("text/plain").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a real decoder: bytes → tiny feature
    vector from byte statistics. Replaced by Pillow/torchvision in prod."""
    if not payload:
        return [0.0] * dim
    acc = [0] * dim
    for i, b in enumerate(payload):
        acc[i % dim] = (acc[i % dim] + b) % 1000
    n = len(payload)
    return [a / n for a in acc]


def extract_features(
    media: DataFrame,
    dim: int = 8,
    decode_stub: bool = True,
    decode_mode: str | None = None,
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via
    ``mapInPandas`` — the real 100-TB shape: executors stream Arrow record
    batches, Python touches each payload once, output schema is fixed.

    ``decode_mode``:
    - ``"stub"`` (default, = ``decode_stub=True``): deterministic fake
      features from byte statistics.
    - ``"numpy"``: REAL decode for uncompressed image formats (binary
      PPM / 24-bit BMP — ``llmdata.numpy_codecs``, no Pillow needed);
      features are actual per-channel means/stds + a luminance
      histogram. Compressed formats raise.
    - ``"real"`` (= ``decode_stub=False``): where PIL/av would run;
      raises NotImplementedError — the container has no media libs.
    """
    mode = decode_mode or ("stub" if decode_stub else "real")
    if mode not in ("stub", "numpy", "real"):
        # a typo ("Numpy") previously fell through to the stub branch and
        # returned FABRICATED features with no signal that decode never ran
        raise ValueError(f"unknown decode_mode {mode!r}: use stub|numpy|real")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if mode == "numpy":
            from ra2_datalake_linaresjoan_spark.llmdata.numpy_codecs import (
                IMAGE_FEATURE_DIM,
                decode_image,
                image_features,
            )
        for pdf in batches:
            if mode == "real":
                raise NotImplementedError(
                    "real media decode requires Pillow/ffmpeg — not in this container"
                )
            if mode == "numpy":
                # null/empty payloads (schema allows them) degrade to the
                # all-zero feature — sized by IMAGE_FEATURE_DIM so a
                # feature-set change can never desync degraded rows from
                # real rows' vector length
                # meta is nullable in MEDIA_SCHEMA (e.g. a metadata join
                # miss): a null meta row degrades like a null payload
                # instead of TypeError-ing the whole job
                feats = [
                    image_features(decode_image(bytes(p), m["mime"]))
                    if p is not None and len(p) > 0 and m is not None
                    else [0.0] * IMAGE_FEATURE_DIM
                    for p, m in zip(pdf["payload"], pdf["meta"])
                ]
            else:
                feats = [_fake_feature(p, dim) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": [
                        m["modality"] if m is not None else None
                        for m in pdf["meta"]
                    ],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def resize_images(
    media: DataFrame,
    width: int = 224,
    height: int = 224,
    decode_stub: bool = True,
    decode_mode: str | None = None,
) -> DataFrame:
    """Image resize over binary payloads (mapInPandas, Arrow-batched).

    ``decode_mode="numpy"`` is a REAL resize for uncompressed formats:
    PPM/BMP decode → nearest-neighbor index-map resize → PPM re-encode
    (``llmdata.numpy_codecs``, exact pixels, no Pillow). The default
    stub truncates/pads bytes to a deterministic size so schema,
    batching, and downstream contracts stay exercised for formats the
    container cannot decode; ``decode_stub=False`` raises where a PIL
    resize would run.
    """
    mode = decode_mode or ("stub" if decode_stub else "real")
    if mode not in ("stub", "numpy", "real"):
        raise ValueError(f"unknown decode_mode {mode!r}: use stub|numpy|real")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        black = None
        if mode == "numpy":
            import numpy as np

            from ra2_datalake_linaresjoan_spark.llmdata.numpy_codecs import (
                decode_image,
                encode_ppm,
                resize_nearest,
            )

            # null/empty payloads map to one precomputed black target-size
            # image (keeps the 1:1 row contract; stub path tolerates
            # empties the same way)
            black = encode_ppm(np.zeros((height, width, 3), dtype=np.uint8))
        target = width * height // 64  # deterministic stub payload size
        for pdf in batches:
            if mode == "real":
                raise NotImplementedError("real resize requires Pillow")
            out = []
            for p in pdf["payload"]:
                b = bytes(p or b"")
                if mode == "numpy":
                    if not b:
                        out.append(black)
                    else:
                        out.append(
                            encode_ppm(resize_nearest(decode_image(b), width, height))
                        )
                else:
                    out.append(b[:target].ljust(target, b"\0"))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": out,
                    "width": width,
                    "height": height,
                }
            )

    return media.mapInPandas(run, schema=RESIZED_SCHEMA)


def sample_frames(
    media: DataFrame, every_n: int = 10, max_frames: int = 4, decode_stub: bool = True
) -> DataFrame:
    """Video frame sampling: one payload → up to ``max_frames`` frame rows
    (a 1:N mapInPandas — the shape a real ffmpeg/av extraction uses).

    Stub: frames are deterministic byte slices of the payload. Real:
    ``av.open`` + keyframe stepping.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError("real frame sampling requires PyAV/ffmpeg")
            ids, idxs, frames = [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(p or b"")
                step = max(len(b) // max(every_n, 1), 1)
                for i in range(min(max_frames, max(len(b) // step, 1))):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(b[i * step : (i + 1) * step])
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames})

    return media.mapInPandas(run, schema=FRAME_SCHEMA)


def byte_stats(media: DataFrame) -> DataFrame:
    """Pure-JVM metadata pass: payload sizes per modality — the cheap scan
    you run before deciding what to decode."""
    return (
        media.groupBy(F.col("meta.modality").alias("modality"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.octet_length("payload")).alias("total_bytes"),
            F.round(F.avg(F.octet_length("payload")), 4).alias("avg_bytes"),
        )
    )
