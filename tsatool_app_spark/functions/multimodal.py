"""Multimodal (image/audio/video) column plumbing.

Large-scale training pipelines carry media as opaque ``binary`` columns with
typed metadata; the Spark-side concerns — schema, batch shape, partition
sizing, Arrow transfer — are real and tested here. The actual codec work
(JPEG decode, audio resample, video frame extraction) requires native
libraries not present in this container, so the decode kernels are STUBS:
:func:`decode_image_batch` raises NotImplementedError unless
``fake_decoder=True``, in which case a deterministic fake (parses our own
16-byte test header) stands in so the distributed plumbing is testable
end-to-end.

Design rules for 100 TB of media:

- media bytes NEVER pass through a shuffle: all per-item transforms are
  mapInPandas (narrow, no exchange); joins happen on metadata projections
  with the binary column dropped first;
- Arrow batch size is capped via maxRecordsPerBatch at the session level —
  with ~1 MB items the default 10k rows/batch would be 10 GB per Arrow
  batch; callers should size spark.sql.execution.arrow.maxRecordsPerBatch
  accordingly (e.g. 64);
- metadata (width/height/duration/codec) lives in a typed struct column so
  filters prune without touching bytes (Parquet column pruning).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Canonical media-item schema: id + opaque bytes + typed metadata.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("content", BinaryType(), True),
        StructField(
            "meta",
            StructType(
                [
                    StructField("kind", StringType(), True),   # image|audio|video
                    StructField("codec", StringType(), True),
                    StructField("width", IntegerType(), True),
                    StructField("height", IntegerType(), True),
                    StructField("n_bytes", LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

#: Fake header for tests: magic 'TSTM' + u32 width + u32 height + u32 chans.
_FAKE_MAGIC = b"TSTM"
_FAKE_HEADER = struct.Struct(">4sIII")


def pack_fake_image(width: int, height: int, channels: int = 3) -> bytes:
    """Deterministic fake image bytes for plumbing tests: header + payload
    whose bytes are a function of (x, y) so downstream kernels can assert."""
    payload = bytes(
        ((x * 31 + y * 17) % 251) for y in range(height) for x in range(width)
    )
    return _FAKE_HEADER.pack(_FAKE_MAGIC, width, height, channels) + payload


def _unpack_fake_header(buf: bytes) -> tuple[int, int, int, bytes]:
    """Module-level (pickle-by-reference safe: struct.Struct objects can't be
    captured in mapInPandas closures)."""
    import struct as _struct

    magic, w, h, c = _struct.unpack_from(">4sIII", buf, 0)
    if magic != _FAKE_MAGIC:
        raise ValueError("not a fake test image")
    return w, h, c, buf[16:]


def _pack_fake_header(w: int, h: int, c: int) -> bytes:
    import struct as _struct

    return _struct.pack(">4sIII", _FAKE_MAGIC, w, h, c)


def _fake_decode(buf: bytes) -> tuple[int, int, int, float]:
    w, h, c, payload = _unpack_fake_header(buf)
    mean = sum(payload) / max(len(payload), 1)
    return w, h, c, mean


def decode_image_batch(
    media: DataFrame,
    *,
    fake_decoder: bool = False,
    content_col: str = "content",
    id_col: str = "media_id",
) -> DataFrame:
    """Decode image bytes → (media_id, width, height, channels, mean_px).

    mapInPandas: one Arrow batch in, one out; the binary column is consumed
    inside the worker and NOT carried into the output (keep shuffles
    byte-free). Real decode = PIL/turbojpeg — NOT AVAILABLE in this
    container; pass fake_decoder=True to run the deterministic stub.
    """
    out_schema = StructType(
        [
            StructField(id_col, LongType(), False),
            StructField("width", IntegerType(), True),
            StructField("height", IntegerType(), True),
            StructField("channels", IntegerType(), True),
            StructField("mean_px", StringType(), True),  # str(float) — stable
        ]
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if not fake_decoder:
            raise NotImplementedError(
                "real image decoding requires PIL/libjpeg (absent here); "
                "use fake_decoder=True for the plumbing path"
            )
        for pdf in batches:
            rows = []
            for mid, buf in zip(pdf[id_col], pdf[content_col]):
                w, h, c, mean = _fake_decode(bytes(buf))
                rows.append((mid, w, h, c, f"{mean:.6f}"))
            yield pd.DataFrame(
                rows, columns=[id_col, "width", "height", "channels", "mean_px"]
            )

    return media.select(id_col, content_col).mapInPandas(decode, out_schema)


def resize_images(
    media: DataFrame,
    target_w: int,
    target_h: int,
    *,
    fake_decoder: bool = False,
    content_col: str = "content",
    id_col: str = "media_id",
) -> DataFrame:
    """Resize kernel: (media_id, content) → (media_id, content) at target
    size. Stub semantics with fake_decoder: nearest-neighbour subsample of
    the fake payload, re-packed with the fake header — byte-deterministic."""
    out_schema = StructType(
        [
            StructField(id_col, LongType(), False),
            StructField(content_col, BinaryType(), True),
        ]
    )

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if not fake_decoder:
            raise NotImplementedError(
                "real resize requires an image library (absent here); "
                "use fake_decoder=True for the plumbing path"
            )
        for pdf in batches:
            rows = []
            for mid, buf in zip(pdf[id_col], pdf[content_col]):
                w, h, c, payload = _unpack_fake_header(bytes(buf))
                out = bytearray(_pack_fake_header(target_w, target_h, c))
                for y in range(target_h):
                    sy = y * h // target_h
                    for x in range(target_w):
                        sx = x * w // target_w
                        out.append(payload[sy * w + sx])
                rows.append((mid, bytes(out)))
            yield pd.DataFrame(rows, columns=[id_col, content_col])

    return media.select(id_col, content_col).mapInPandas(resize, out_schema)


def media_metadata(media: DataFrame) -> DataFrame:
    """Metadata projection WITHOUT touching bytes: filters/joins on this
    stay in the columnar fast path (content column pruned from the scan)."""
    return media.select(
        "media_id",
        F.col("meta.kind").alias("kind"),
        F.col("meta.codec").alias("codec"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.coalesce(F.col("meta.n_bytes"), F.length("content").cast("long")).alias(
            "n_bytes"
        ),
    )


def sample_video_frames(
    media: DataFrame,
    every_nth: int,
    *,
    id_col: str = "media_id",
) -> DataFrame:
    """Frame-sampling STUB: real implementation needs ffmpeg/pyav (absent).

    The Spark contract is pinned anyway: input one row per video, output one
    row per sampled frame (media_id, frame_idx, frame_bytes) via mapInPandas
    fan-out — the 1→N row shape is what matters for planning."""
    raise NotImplementedError(
        "video frame sampling requires ffmpeg/pyav (absent in this container); "
        "contract: mapInPandas fan-out to (media_id, frame_idx, frame_bytes)"
    )
