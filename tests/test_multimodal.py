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
