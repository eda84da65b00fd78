"""Multimodal plumbing: schema, Arrow batch shapes, deterministic stub
features, resize/frame-sample plans, strict-mode integration gate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from parallel_connected_components_spark.operators.multimodal import (
    FEATURE_DIM,
    extract_features,
    gen_media,
    resize_images,
    sample_frames,
)


def test_media_schema_and_determinism(spark):
    m1 = gen_media(spark, 60)
    assert m1.count() == 60
    assert {f.name for f in m1.schema.fields} == {
        "media_id", "kind", "payload", "width", "height", "duration_ms", "sample_rate",
    }
    m2 = gen_media(spark, 60)
    assert m1.exceptAll(m2).count() == 0


def test_extract_features_shapes(spark):
    media = gen_media(spark, 40)
    feats = extract_features(media)
    rows = feats.collect()
    assert len(rows) == 40
    for r in rows:
        assert len(r["feature"]) == FEATURE_DIM
        assert all(0.0 <= x < 1.0 for x in r["feature"])
        assert r["n_bytes"] > 0
    # deterministic across runs and partitionings
    again = {r["media_id"]: r["feature"] for r in extract_features(media.repartition(7)).collect()}
    for r in rows:
        assert again[r["media_id"]] == r["feature"]


def test_strict_mode_raises(spark):
    media = gen_media(spark, 5)
    with pytest.raises(Exception, match="NotImplementedError|real media decoding"):
        extract_features(media, strict=True).collect()


def test_resize_plan(spark):
    media = gen_media(spark, 100)
    out = resize_images(media, max_side=256).collect()
    assert out  # some images exist
    for r in out:
        assert max(r["target_width"], r["target_height"]) <= 257  # rounding slack
        assert r["target_width"] >= 1 and r["target_height"] >= 1


def test_frame_sampling(spark):
    media = gen_media(spark, 100)
    frames = sample_frames(media, every_ms=50000)
    vids = {r["media_id"]: r["duration_ms"] for r in media.filter("kind = 'video'").collect()}
    got = frames.groupBy("media_id").agg(F.count("*").alias("n")).collect()
    assert {r["media_id"] for r in got} == set(vids)
    for r in got:
        expected = (vids[r["media_id"]] - 1) // 50000 + 1
        assert r["n"] == expected
