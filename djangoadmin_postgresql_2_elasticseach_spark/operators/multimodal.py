"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side plumbing is real and tested: schema contract, partition-
preserving batch iteration, Arrow transfer shapes. The codec itself is
pluggable; this container has no image/audio libraries, so the default
codec is a clearly-marked deterministic FAKE (parses our own synthetic
header) and the real-decode entry point raises NotImplementedError.

Scale design:
- payloads never pass through the driver; mapInPandas streams Arrow
  record batches executor-side;
- ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds batch memory
  (set it so batch_rows × max_payload fits the executor);
- metadata-only transforms (filters on width/duration) operate on the
  typed metadata struct WITHOUT touching the binary column — column
  pruning keeps the payload out of the scan entirely when only metadata
  is referenced.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

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

# Synthetic payload header: magic "FAKEIMG" + u16 width + u16 height +
# u8 channels, then raw bytes. Deterministic stand-in for a real codec.
_MAGIC = b"FAKEIMG"
_HEADER = ">7sHHB"
_HEADER_LEN = struct.calcsize(_HEADER)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("payload", BinaryType(), True),
    ]
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("channels", IntegerType(), True),
        StructField("valid", StringType(), True),
    ]
)


def encode_fake_image(media_id: int, width: int, height: int, channels: int = 3) -> bytes:
    """Deterministic synthetic payload for fixtures/tests."""
    header = struct.pack(_HEADER, _MAGIC, width, height, channels)
    body = bytes((media_id * 31 + i) % 251 for i in range(min(width * height, 256)))
    return header + body


def decode_real(payload: bytes):  # pragma: no cover - stub by design
    """Real image decode — requires an image library not present in this
    container. STUB: wire Pillow/ffmpeg here in production."""
    raise NotImplementedError(
        "real media decode needs an image/audio library; this environment "
        "ships none — use the fake codec path (decode_fake) which exercises "
        "the identical Spark plumbing"
    )


def _decode_fake(payload: bytes | None):
    if payload is None:
        return None, None, None, "null"
    if len(payload) < _HEADER_LEN or payload[:7] != _MAGIC:
        return None, None, None, "corrupt"
    _, w, h, c = struct.unpack(_HEADER, payload[:_HEADER_LEN])
    return int(w), int(h), int(c), "ok"


def extract_metadata(media: DataFrame) -> DataFrame:
    """binary payload → typed metadata struct, executor-side via
    Arrow-batched mapInPandas (the shape a real decode would use)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = pdf["payload"].map(_decode_fake)
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(
                        lambda b: len(b) if b is not None else None
                    ),
                    "width": meta.map(lambda m: m[0]),
                    "height": meta.map(lambda m: m[1]),
                    "channels": meta.map(lambda m: m[2]),
                    "valid": meta.map(lambda m: m[3]),
                }
            )
            yield out

    return media.mapInPandas(run, schema=MEDIA_META_SCHEMA)


def resize_stub(media: DataFrame, max_dim: int) -> DataFrame:
    """Resize plumbing: passes payloads through mapInPandas and rewrites
    the header dims clamped to ``max_dim`` (a real impl transforms the
    body too). Output schema == input schema — composable."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def clamp(b):
                if b is None or len(b) < _HEADER_LEN or b[:7] != _MAGIC:
                    return b
                _, w, h, c = struct.unpack(_HEADER, b[:_HEADER_LEN])
                scale = max(w, h) / max_dim if max(w, h) > max_dim else 1
                nw, nh = max(1, int(w / scale)), max(1, int(h / scale))
                return struct.pack(_HEADER, _MAGIC, nw, nh, c) + b[_HEADER_LEN:]

            pdf = pdf.copy()
            pdf["payload"] = pdf["payload"].map(clamp)
            yield pdf

    return media.mapInPandas(run, schema=MEDIA_SCHEMA)


def frame_sample_stub(media: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """Frame-sampling plumbing for video-ish payloads: one output row per
    sampled offset (explode shape). Body bytes stand in for frames."""
    out_schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("frame_idx", IntegerType(), False),
            StructField("frame_byte", IntegerType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None or len(payload) <= _HEADER_LEN:
                    continue
                body = payload[_HEADER_LEN:]
                for i, off in enumerate(range(0, len(body), every_n_bytes)):
                    rows.append((mid, i, body[off]))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_byte"])

    return media.mapInPandas(run, schema=out_schema)


def feature_extract_stub(media: DataFrame, dim: int = 16) -> DataFrame:
    """Feature extraction plumbing: payload → fixed-``dim`` float
    embedding via Arrow-batched mapInPandas. The deterministic fake is a
    normalized byte histogram of the body (a real impl swaps in a model
    forward pass — identical schema/batch shape).

    Output (media_id, embedding array<float>) composes directly with the
    similarity operators (brute_force_topk / ivf_topk /
    embedding_neardup_lsh) — the multimodal → embedding → ANN pipeline.
    """
    out_schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("embedding", ArrayType(FloatType()), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            embs = []
            for payload in pdf["payload"]:
                if payload is None or len(payload) <= _HEADER_LEN:
                    embs.append(None)
                    continue
                body = payload[_HEADER_LEN:]
                hist = [0.0] * dim
                for b in body:
                    hist[b % dim] += 1.0
                total = sum(hist) or 1.0
                embs.append([v / total for v in hist])
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "embedding": embs}
            )

    return media.mapInPandas(run, schema=out_schema)


def filter_by_metadata(media_meta: DataFrame, min_width: int) -> DataFrame:
    """Metadata-only predicate — never touches the payload column, so
    Catalyst prunes the binary from the scan entirely."""
    return media_meta.filter(
        (F.col("valid") == "ok") & (F.col("width") >= min_width)
    )
