"""Multimodal plumbing tests: schemas, Arrow batch shapes, explode
semantics, strict-mode stubs."""

from __future__ import annotations

import pytest

from clickstreaming_end_to_end_data_engineering_project_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    df = mm.synthetic_media(spark, 60)
    df.cache().count()
    yield df
    df.unpersist()


def test_image_features_schema_and_determinism(spark, media):
    feats = mm.image_features(media)
    assert feats.schema == mm.IMAGE_FEATURES_SCHEMA
    rows = {r["media_id"]: r for r in feats.collect()}
    assert len(rows) == 20  # every 3rd row is an image
    again = {r["media_id"]: r for r in mm.image_features(media).collect()}
    assert rows == again  # deterministic decode stub
    r = next(iter(rows.values()))
    assert 64 <= r["width"] <= 256 and r["n_bytes"] == 128


def test_frame_sampling_explodes_rows(spark, media):
    frames = mm.sample_frames(media, every_n=2)
    assert frames.schema == mm.FRAME_SAMPLE_SCHEMA
    pdf = frames.toPandas()
    assert set(pdf["media_id"]) == {i for i in range(60) if i % 3 == 2}
    assert (pdf.groupby("media_id")["frame_idx"].min() == 0).all()


def test_media_fingerprints_find_payload_dups(spark, media):
    # synthetic payloads repeat every 2 ids -> exact dup pairs exist
    fps = mm.media_fingerprints(media)
    dup_groups = (
        fps.groupBy("fingerprint").count().filter("count > 1").count()
    )
    assert dup_groups == 30
    assert fps.columns == ["media_id", "kind", "fingerprint", "n_bytes"]


def test_strict_mode_raises_like_missing_lib(spark, media):
    with pytest.raises(Exception, match="(?i)NotImplementedError|PIL|decode"):
        mm.image_features(media, strict=True).collect()


def test_resize_images_bounded_payload_and_determinism(spark, media):
    resized = mm.resize_images(media, width=224, height=224)
    assert resized.schema == mm.RESIZED_IMAGE_SCHEMA
    rows = {r["media_id"]: r for r in resized.collect()}
    assert len(rows) == 20  # images only
    budget = 224 * 224 // 64
    for r in rows.values():
        assert (r["width"], r["height"]) == (224, 224)
        # output bounded by the target raster — the property that makes
        # the resized table safe to shuffle where raw blobs were not
        assert len(r["payload"]) == budget
    again = {r["media_id"]: r for r in mm.resize_images(media, 224, 224).collect()}
    assert {k: bytes(v["payload"]) for k, v in rows.items()} == {
        k: bytes(v["payload"]) for k, v in again.items()
    }
    # strict mode raises like a missing decoder build
    with pytest.raises(Exception, match="(?i)NotImplementedError|PIL|resize"):
        mm.resize_images(media, strict=True).collect()


def test_audio_features_schema_and_ranges(spark, media):
    feats = mm.audio_features(media)
    assert feats.schema == mm.AUDIO_FEATURES_SCHEMA
    rows = feats.collect()
    assert len(rows) == 20  # every 3rd row is audio
    for r in rows:
        assert 500 <= r["duration_ms"] < 60_000
        assert r["sample_rate"] in (8000, 16000, 22000, 44000, 48000)
        assert 0 <= r["loudness_bucket"] <= 9
        assert r["n_bytes"] == 128
    with pytest.raises(Exception, match="(?i)NotImplementedError|ffmpeg|decode"):
        mm.audio_features(media, strict=True).collect()
