"""Multimodal (image/audio/video) column operators.

Training-data pipelines carry media as opaque ``binary`` columns with
typed metadata. The Spark-side plumbing here is real — schemas,
Arrow-batched ``mapInPandas`` UDF signatures, batch shaping,
partition-size control — while the codec step is STUBBED: this
container has no image/audio libraries, so decoding either raises
``NotImplementedError`` (strict mode) or produces a deterministic fake
(test mode) behind the same interface a PIL/ffmpeg implementation
would use. Swapping in a real codec touches ONLY ``_decode_image`` /
``_decode_audio``.

Design notes for 100 TB:
- media bytes never pass through a shuffle: all extractors are
  narrow ``mapInPandas`` over the source partitions; only the small
  feature rows (dims, hashes, frames metadata) are shuffled.
- ``spark.sql.files.maxPartitionBytes`` should be lowered (e.g. 64 MB)
  for tables with large binary columns so Arrow batches stay bounded;
  extractors additionally re-chunk with ``maxRecordsPerBatch``.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

IMAGE_META = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("media_sha256", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("mode", T.StringType(), True),
    ]
)

AUDIO_META = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("media_sha256", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("duration_s", T.DoubleType(), True),
    ]
)

FRAME_SAMPLE = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_index", T.IntegerType(), False),
        T.StructField("timestamp_s", T.DoubleType(), False),
        T.StructField("frame_sha256", T.StringType(), True),
    ]
)


class CodecUnavailable(NotImplementedError):
    pass


def _decode_image(raw: bytes, fake: bool):
    """STUB: returns (width, height, mode). A real implementation is
    ``PIL.Image.open(io.BytesIO(raw))``; this container has no PIL."""
    if not fake:
        raise CodecUnavailable("image codec not available in this environment")
    # deterministic fake derived from the bytes (stable across runs)
    h = int.from_bytes(hashlib.sha256(raw).digest()[:4], "big")
    return 64 + h % 1024, 64 + (h >> 10) % 1024, "RGB"


def _decode_audio(raw: bytes, fake: bool):
    """STUB: returns (sample_rate, n_samples)."""
    if not fake:
        raise CodecUnavailable("audio codec not available in this environment")
    h = int.from_bytes(hashlib.sha256(raw).digest()[4:8], "big")
    return 16000, 16000 + h % 160000


def image_metadata(
    media: DataFrame,
    id_col: str = "doc_id",
    bytes_col: str = "media",
    fake_decode: bool = True,
) -> DataFrame:
    """binary column → typed image metadata via Arrow-batched
    mapInPandas (no per-row Python UDF calls at the plan level)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, raw in zip(pdf[id_col], pdf[bytes_col]):
                if raw is None:
                    rows.append((doc_id, None, None, None, None, None))
                    continue
                raw = bytes(raw)
                w, h, mode = _decode_image(raw, fake_decode)
                rows.append(
                    (
                        doc_id,
                        hashlib.sha256(raw).hexdigest(),
                        len(raw),
                        w,
                        h,
                        mode,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "media_sha256",
                    "n_bytes",
                    "width",
                    "height",
                    "mode",
                ],
            )

    return media.select(id_col, bytes_col).mapInPandas(extract, IMAGE_META)


def audio_metadata(
    media: DataFrame,
    id_col: str = "doc_id",
    bytes_col: str = "media",
    fake_decode: bool = True,
) -> DataFrame:
    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, raw in zip(pdf[id_col], pdf[bytes_col]):
                if raw is None:
                    rows.append((doc_id, None, None, None, None, None))
                    continue
                raw = bytes(raw)
                sr, n = _decode_audio(raw, fake_decode)
                rows.append(
                    (
                        doc_id,
                        hashlib.sha256(raw).hexdigest(),
                        len(raw),
                        sr,
                        n,
                        n / sr,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "media_sha256",
                    "n_bytes",
                    "sample_rate",
                    "n_samples",
                    "duration_s",
                ],
            )

    return media.select(id_col, bytes_col).mapInPandas(extract, AUDIO_META)


def frame_sample(
    media: DataFrame,
    every_s: float = 1.0,
    max_frames: int = 16,
    id_col: str = "doc_id",
    bytes_col: str = "media",
    fake_decode: bool = True,
) -> DataFrame:
    """Video → sampled frame rows (UDTF shape: one media row → many
    frame rows). Frame extraction is stubbed with deterministic hashes;
    a real implementation feeds ffmpeg per Arrow batch."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, raw in zip(pdf[id_col], pdf[bytes_col]):
                if raw is None:
                    continue
                raw = bytes(raw)
                if not fake_decode:
                    raise CodecUnavailable("video codec not available")
                # deterministic fake duration → frame count
                h = int.from_bytes(hashlib.sha256(raw).digest()[8:12], "big")
                duration = 1.0 + h % 30
                n = min(max_frames, int(duration / every_s))
                for i in range(n):
                    ts = i * every_s
                    fh = hashlib.sha256(raw + str(i).encode()).hexdigest()
                    rows.append((doc_id, i, ts, fh))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "frame_index", "timestamp_s", "frame_sha256"],
            )

    return media.select(id_col, bytes_col).mapInPandas(extract, FRAME_SAMPLE)
