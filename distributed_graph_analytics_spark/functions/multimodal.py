"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real — schema, partition-friendly batch
iteration, Arrow-batched mapInPandas UDFs with bounded batch sizes —
and the codec work is import-gated: `decode_image`/`resize_image` use
Pillow when it is importable, raise NotImplementedError when it is not
(this container ships no image libraries), and always accept
`fake=True` for a deterministic stand-in (derived from the bytes'
sha256) so the pipeline shape is testable end-to-end anywhere.

At 100 TB the pattern is: keep binaries in their own column (parquet
keeps them out of unrelated scans via column pruning), set
spark.sql.execution.arrow.maxRecordsPerBatch low enough that a batch of
decoded frames fits executor memory, and partition by a size-balanced
key rather than row count.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("feature", ArrayType(FloatType())),
        StructField("n_bytes", IntegerType()),
        StructField("payload_sha256", StringType()),
    ]
)


def synthesize_media_table(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media rows (payload = repeatable bytes)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.sha256(f"media-{i}".encode()).digest() * (4 + i % 5)
        rows.append(
            (
                i,
                kind,
                bytearray(payload),
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                64 + i % 16,
                48 + i % 9,
                1000 + 10 * i,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _pil():
    """Import-try for Pillow — the container this repo is developed in
    ships no image codec, so the real decode path is exercised only
    where the library exists (tests skip without it)."""
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None


def decode_image(payload: bytes, fake: bool = False) -> list[float]:
    """Decode an image payload into an 8-dim feature vector.

    Real path (when Pillow is importable): decode, convert to RGB, and
    emit [width, height, mean_R, mean_G, mean_B, min_lum, max_lum,
    aspect] — deterministic, codec-backed. Without Pillow the real
    path raises NotImplementedError (honest gate, not a silent fake).
    fake=True always produces a deterministic 8-dim feature from the
    payload hash so the distributed plumbing is testable anywhere."""
    if fake:
        h = hashlib.sha256(payload).digest()
        return [b / 255.0 for b in h[:8]]
    Image = _pil()
    if Image is None:
        raise NotImplementedError(
            "image decoding requires Pillow (not installed); "
            "run with fake=True for the deterministic stand-in"
        )
    import io

    with Image.open(io.BytesIO(payload)) as im:
        rgb = im.convert("RGB")
        w, h = rgb.size
        px = list(rgb.getdata())
        n = max(len(px), 1)
        means = [sum(c[i] for c in px) / n / 255.0 for i in range(3)]
        lum = [(c[0] + c[1] + c[2]) / 3.0 / 255.0 for c in px] or [0.0]
        return [float(w), float(h), *means, min(lum), max(lum), w / max(h, 1)]


def extract_features(media: DataFrame, fake: bool = True, batch_size: int = 256) -> DataFrame:
    """mapInPandas feature extraction: Arrow-batched, bounded batches,
    schema-stable output. The decode step is the stub above."""
    spark = media.sparkSession
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_size))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            shas = []
            for payload in pdf["payload"]:
                raw = bytes(payload)
                feats.append(decode_image(raw, fake=fake))
                shas.append(hashlib.sha256(raw).hexdigest())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                    "payload_sha256": shas,
                }
            )

    return media.mapInPandas(run, FEATURES_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def resize_image(
    payload: bytes, width: int, height: int, fake: bool = False
) -> bytes:
    """Resize an image payload to (width, height), returned as PNG
    bytes (Pillow path). Without Pillow the real path raises
    NotImplementedError; fake=True emits a deterministic stand-in
    payload of width*height bytes cycled from the source hash —
    size-realistic so batch-memory behavior is testable anywhere."""
    if fake:
        h = hashlib.sha256(payload).digest()
        n = width * height
        return (h * (n // len(h) + 1))[:n]
    Image = _pil()
    if Image is None:
        raise NotImplementedError(
            "image resizing requires Pillow (not installed); "
            "run with fake=True for the deterministic stand-in"
        )
    import io

    with Image.open(io.BytesIO(payload)) as im:
        out = io.BytesIO()
        im.resize((width, height)).save(out, format="PNG")
        return out.getvalue()


def resize_images(
    media: DataFrame,
    width: int,
    height: int,
    fake: bool = True,
    batch_size: int = 64,
) -> DataFrame:
    """mapInPandas resize: Arrow-batched with a LOW default batch size —
    decoded pixel buffers dominate memory, so the batch bound (not the
    row count) is what keeps an executor alive at 100 TB. Only image
    rows pass through; the projection prunes every other column before
    the Python boundary."""
    spark = media.sparkSession
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_size))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": [
                        resize_image(bytes(p), width, height, fake=fake)
                        for p in pdf["payload"]
                    ],
                    "width": width,
                    "height": height,
                }
            )

    return (
        media.where(F.col("kind") == "image")
        .select("media_id", "kind", "payload")
        .mapInPandas(run, RESIZED_SCHEMA)
    )


def frame_sample(media: DataFrame, every_ms: int = 500) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled
    timestamp (decode stubbed; timestamps are real columnar math)."""
    return (
        media.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
            ).alias("ts_ms"),
        )
    )
