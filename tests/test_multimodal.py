"""Multimodal plumbing tests: schema, batch shapes, fan-out, pruning."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real_time_financial_market_data_pipeline_spark.operators.multimodal import (
    decode_media,
    media_stats,
    resize_images,
    sample_frames,
    synthesize_media,
)
from real_time_financial_market_data_pipeline_spark.tables import load_table
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def media(spark):
    docs = load_table(spark, SF_DIR, "documents").limit(50)
    return synthesize_media(docs, "doc_id", "text").cache()


def test_synthesize_schema(media):
    assert dict(media.dtypes)["payload"] == "binary"
    assert media.count() == 50


def test_decode_deterministic(media):
    a = {r["media_id"]: r["features"] for r in decode_media(media).collect()}
    b = {r["media_id"]: r["features"] for r in decode_media(media).collect()}
    assert a == b  # byte-derived decode is deterministic
    assert all(len(v) == 64 for v in a.values())
    n_bytes = {r["media_id"]: r["n_bytes"] for r in decode_media(media).collect()}
    orig = {r["media_id"]: len(r["payload"]) for r in media.collect()}
    assert n_bytes == orig


def test_decode_real_codec_is_stubbed(media):
    with pytest.raises(NotImplementedError):
        decode_media(media, codec="real")


def test_resize_budget(media):
    out = resize_images(media, 8, 4).collect()
    assert all(len(r["payload"]) == 32 for r in out)


def test_frame_sampling_fanout(media):
    frames = sample_frames(media, every_ms=1000)
    joined = (
        frames.groupBy("media_id")
        .count()
        .join(media.select("media_id", "duration_ms"), "media_id")
        .collect()
    )
    for r in joined:
        expected = -(-r["duration_ms"] // 1000)  # ceil(dur/1s); 0 frames for 0 duration
        assert r["count"] == expected


def test_metadata_stats_prune_payload(media, tmp_path):
    p = str(tmp_path / "media.parquet")
    media.write.parquet(p)
    spark = media.sparkSession
    stats = media_stats(spark.read.parquet(p))
    plan = stats._jdf.queryExecution().executedPlan().toString()
    assert "payload" not in plan  # column pruned at the scan
    assert stats.count() == 1
