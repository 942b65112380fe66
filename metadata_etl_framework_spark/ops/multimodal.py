"""Multimodal (image/audio/video) column plumbing.

Treats media as opaque ``binary`` columns + typed metadata structs. The
Spark-side contracts — schemas, Arrow batch shapes, mapInPandas
signatures, partition sizing — are real and tested; the actual codec
work is STUBBED (Pillow/ffmpeg/torchaudio are not in this container) with
deterministic fakes, clearly marked below. Swap `_decode_*_stub` for real
decoders on a cluster with media libraries installed.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_META_SCHEMA = (
    "doc_id long, media binary, width int, height int, format string"
)
IMAGE_FEATURES_SCHEMA = (
    "doc_id long, width int, height int, format string, feature array<float>"
)
FRAME_SAMPLE_SCHEMA = "doc_id long, frame_index int, frame binary"


def _decode_image_stub(payload: bytes) -> tuple[int, int, str]:
    """STUB decode: deterministic fake dimensions from the payload hash.

    Real implementation: PIL.Image.open(io.BytesIO(payload)) →
    (img.width, img.height, img.format). NotImplemented libs in container.
    """
    h = hashlib.sha256(payload or b"").digest()
    return 64 + h[0] % 192, 64 + h[1] % 192, ["JPEG", "PNG", "WEBP"][h[2] % 3]


def extract_image_metadata(df: DataFrame, media_col: str = "media") -> DataFrame:
    """binary column → (width, height, format) via Arrow-batched mapInPandas.

    Batches stream through; nothing accumulates on any single node, so
    partition count (not file count) bounds memory — at 100 TB, size input
    partitions with spark.sql.files.maxPartitionBytes as usual.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = pdf[media_col].map(lambda b: _decode_image_stub(bytes(b or b"")))
            pdf = pdf.copy()
            pdf["width"] = meta.map(lambda t: t[0]).astype("int32")
            pdf["height"] = meta.map(lambda t: t[1]).astype("int32")
            pdf["format"] = meta.map(lambda t: t[2])
            yield pdf

    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields]
        + ["width int", "height int", "format string"]
    )
    return df.mapInPandas(decode, schema=out_schema)


def image_features(df: DataFrame, media_col: str = "media", dim: int = 8) -> DataFrame:
    """binary → fixed-dim float feature vector (STUB: hash-derived).

    Real implementation: a vision model forward pass per Arrow batch
    (the batch shape here is exactly what a torch/ONNX runner consumes).
    """

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def vec(b: bytes) -> list[float]:
                h = hashlib.sha256(bytes(b or b"")).digest()
                return [h[i] / 255.0 for i in range(dim)]

            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "feature": pdf[media_col].map(lambda b: vec(b)),
                }
            )

    return df.mapInPandas(featurize, schema=f"doc_id long, feature array<float>")


def sample_frames(df: DataFrame, media_col: str = "media", every_n: int = 10) -> DataFrame:
    """video binary → sampled frame rows (STUB frames; real: ffmpeg).

    One input row fans out to many frame rows — done inside mapInPandas so
    the fan-out never materializes on the driver.
    """

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                payload = bytes(r[media_col] or b"")
                n_frames = 1 + (hashlib.sha256(payload).digest()[0] % 5)
                for i in range(n_frames):
                    rows.append(
                        {
                            "doc_id": r["doc_id"],
                            "frame_index": i * every_n,
                            "frame": hashlib.sha256(payload + bytes([i])).digest(),
                        }
                    )
            yield pd.DataFrame(rows, columns=["doc_id", "frame_index", "frame"])

    return df.mapInPandas(sample, schema=FRAME_SAMPLE_SCHEMA)
