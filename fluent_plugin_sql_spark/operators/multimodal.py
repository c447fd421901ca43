"""Multimodal column plumbing (north star: image/audio/video as opaque
binary columns with typed metadata).

The container has no image/audio codecs, so DECODING is stubbed — either
raising ``NotImplementedError`` (strict mode) or producing a clearly-
marked deterministic fake (test mode).  Everything Spark-side is real and
tested: the schema contract, the Arrow-batched ``mapInPandas`` plumbing,
batch shapes, and partitioning behavior — swap ``_decode_stub`` for a
real codec (PIL/ffmpeg) and nothing else changes.

Scale notes: binary payloads ride in parquet as plain BINARY columns;
``spark.sql.files.maxPartitionBytes`` bounds scan-task size, and the
decode UDF is a ``mapInPandas`` iterator so one task never materializes
more than one Arrow batch of frames (bound with
``spark.sql.execution.arrow.maxRecordsPerBatch`` for fat payloads).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# typed metadata carried alongside every binary payload
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField("format", T.StringType()),  # png|wav|mp4|...
        T.StructField("n_bytes", T.LongType()),
        T.StructField("checksum_md5", T.StringType()),
    ]
)

DECODED_IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("n_pixels", T.LongType()),
    ]
)


def attach_binary(df: DataFrame, source_col: str, media_type: str = "image", fmt: str = "raw") -> DataFrame:
    """Wrap a source column as an opaque binary payload + typed metadata.

    (On real data the payload arrives as binary already; here we encode a
    text column so the plumbing is exercised end-to-end on the driver
    tables.)
    """
    payload = F.encode(F.col(source_col), "UTF-8")
    return df.withColumn("payload", payload).withColumn(
        "media_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(fmt).alias("format"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
            F.md5(payload).alias("checksum_md5"),
        ),
    )


def _decode_stub(payload: bytes, strict: bool) -> tuple[int, int, int]:
    """STUB: stand-in for a real image decode (no codec libs in this
    container).  strict mode raises; fake mode derives deterministic
    dimensions from the payload checksum so tests are reproducible."""
    if strict:
        raise NotImplementedError(
            "image decode requires a codec library (PIL/libvips) not present "
            "in this environment; wire it in here"
        )
    h = hashlib.md5(payload).digest()
    width = 16 + h[0] % 240
    height = 16 + h[1] % 240
    channels = 1 + h[2] % 4
    return width, height, channels


def decode_images(df: DataFrame, id_col: str = "doc_id", strict: bool = False) -> DataFrame:
    """Arrow-batched decode: payload → (width, height, channels, n_pixels).

    ``mapInPandas`` iterator: one Arrow batch in, one out — constant
    memory per task regardless of partition size.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [_decode_stub(p, strict) for p in pdf["payload"]]
            out = pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "channels": [d[2] for d in dims],
                }
            )
            out["n_pixels"] = (out.width * out.height * out.channels).astype("int64")
            yield out

    return df.select(id_col, "payload").mapInPandas(decode, DECODED_IMAGE_SCHEMA)


def sample_frames(
    df: DataFrame, id_col: str = "doc_id", every_n_bytes: int = 64, max_frames: int = 8
) -> DataFrame:
    """STUB frame sampler: emits one row per sampled "frame" offset —
    the plumbing (explode fan-out, per-frame rows, bounded frames per
    asset) is what a real video pipeline needs; the decode itself is the
    deterministic fake."""
    n = F.col("media_meta.n_bytes")
    offsets = F.slice(
        F.sequence(F.lit(0), F.greatest((n / every_n_bytes).cast("int") - 1, F.lit(0))),
        1,
        max_frames,
    )
    return df.select(
        F.col(id_col),
        F.explode(offsets).alias("frame_idx"),
        (F.col("media_meta.n_bytes") - F.lit(every_n_bytes) * F.col("frame_idx")).alias(
            "bytes_remaining"
        ),
    )
