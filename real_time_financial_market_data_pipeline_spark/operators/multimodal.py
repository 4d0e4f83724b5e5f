"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, with decode / feature-extract / resize / frame-sample as
Arrow-batched Pandas UDFs over mapInPandas.

The container has no image/audio codecs, so the DECODE step is stubbed:
`decode_media(..., codec="real")` raises NotImplementedError where a
production build would call into PIL/ffmpeg, and the default
`codec="fake"` produces a deterministic byte-derived decode so the
Spark-side plumbing — schema, batching, partitioning, UDF signatures —
is real and fully tested.

Scale design: payloads stay in executor-side Arrow batches end-to-end
(mapInPandas streams batches; nothing is collected); metadata-only
queries never touch the binary column thanks to parquet column pruning;
feature vectors come back as fixed-width array<float> suitable for the
similarity operators.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
    ]
)


def synthesize_media(df: DataFrame, id_col: str, text_col: str, mime: str = "image/png") -> DataFrame:
    """Deterministic fake media table from any text column (test input:
    payload = utf-8 bytes; metadata derived from content length)."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        payload.alias("payload"),
        F.lit(mime).alias("mime"),
        (F.length(payload) % 1920 + 1).cast("int").alias("width"),
        (F.length(payload) % 1080 + 1).cast("int").alias("height"),
        (F.length(payload).cast("long") * 10).alias("duration_ms"),
        F.lit(16000).alias("sample_rate"),
    )


def _fake_pixels(payload: bytes, n: int = 64) -> list[float]:
    """Deterministic 'decoded' representation: sha256-expanded bytes → n
    floats in [0,1). Stands in for a real pixel/PCM buffer."""
    out: list[float] = []
    counter = 0
    seed = payload or b""
    while len(out) < n:
        h = hashlib.sha256(seed + counter.to_bytes(4, "big")).digest()
        out.extend(b / 255.0 for b in h)
        counter += 1
    return out[:n]


DECODED_SCHEMA = "media_id long, n_bytes long, features array<float>"


def decode_media(df: DataFrame, codec: str = "fake", feature_dim: int = 64) -> DataFrame:
    """payload → fixed-width feature vector, per Arrow batch.

    codec="real" is the production hook (PIL/ffmpeg) — unavailable here.
    """
    if codec == "real":
        raise NotImplementedError(
            "real codecs (PIL/ffmpeg) are not installed in this environment; "
            "use codec='fake' for the deterministic byte-derived decode"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else 0),
                    "features": pdf["payload"].map(lambda b: _fake_pixels(b, feature_dim)),
                }
            )

    return df.select("media_id", "payload").mapInPandas(batches, schema=DECODED_SCHEMA)


RESIZED_SCHEMA = "media_id long, width int, height int, payload binary"


def resize_images(df: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Resize plumbing: batch signature + metadata update are real; the
    pixel transform is the deterministic stub (truncate/pad payload to
    the target byte budget)."""
    budget = target_w * target_h

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            def _resize(b: bytes | None) -> bytes:
                b = b or b""
                return b[:budget] if len(b) >= budget else b + b"\0" * (budget - len(b))

            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": target_w,
                    "height": target_h,
                    "payload": pdf["payload"].map(_resize),
                }
            )

    return df.select("media_id", "payload").mapInPandas(batches, schema=RESIZED_SCHEMA)


FRAMES_SCHEMA = "media_id long, frame_idx int, frame_ts_ms long, frame array<float>"


def sample_frames(df: DataFrame, every_ms: int = 1000, feature_dim: int = 16) -> DataFrame:
    """Frame sampling (video → one row per sampled frame): a fan-out
    mapInPandas — each input row yields ceil(duration_ms/every_ms) rows;
    zero-duration media yields no frames."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, tss, frames = [], [], [], []
            for _, row in pdf.iterrows():
                dur = int(row["duration_ms"] or 0)
                payload = row["payload"] or b""
                for i, t in enumerate(range(0, dur, every_ms)):
                    ids.append(row["media_id"])
                    idxs.append(i)
                    tss.append(t)
                    frames.append(_fake_pixels(payload + i.to_bytes(4, "big"), feature_dim))
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_ts_ms": tss, "frame": frames}
            )

    return df.select("media_id", "payload", "duration_ms").mapInPandas(
        batches, schema=FRAMES_SCHEMA
    )


def media_stats(df: DataFrame) -> DataFrame:
    """Metadata-only aggregate — never reads the payload column (parquet
    column pruning keeps this cheap at 100 TB)."""
    return df.groupBy("mime").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.avg("width").alias("avg_width"),
        F.avg("height").alias("avg_height"),
        F.sum("duration_ms").alias("total_duration_ms"),
    )
