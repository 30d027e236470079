"""Multimodal binary-column plumbing: schemas, mapInPandas batch contract,
frame-sample explode shape. Decode kernels are deterministic stubs (libs not
in the container) — the Spark-side contract is what's under test."""

import pyspark.sql.functions as F
import pytest

from traildb_spark.operators import multimodal


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", b"\x89PNG" + b"x" * 100, "image/png", '{"source":"cam1"}'),
        (2, "image", b"\xff\xd8JPEG" + b"y" * 50, "image/jpeg", '{"source":"cam2"}'),
        (3, "video", b"z" * 3000, "video/mp4", '{"source":"cam1"}'),
        (4, "audio", b"a" * 10, "audio/wav", None),
    ]
    return spark.createDataFrame(rows, schema=multimodal.MEDIA_SCHEMA)


def test_media_metadata_no_payload_read(media):
    out = multimodal.media_metadata(media).collect()
    by_id = {r["media_id"]: r for r in out}
    assert by_id[1]["n_bytes"] == 104
    assert by_id[1]["meta_source"] == "cam1"
    assert by_id[4]["meta_source"] is None


def test_extract_image_features_schema_and_determinism(media):
    out = multimodal.extract_image_features(media)
    assert out.schema == multimodal.IMAGE_FEATURES_SCHEMA
    rows = {r["media_id"]: r for r in out.collect()}
    assert set(rows) == {1, 2}  # only kind='image'
    r1 = rows[1]
    assert r1["n_bytes"] == 104 and r1["width"] > 0 and r1["height"] > 0
    assert len(r1["features"]) == 8
    # deterministic stub: second run identical
    again = {r["media_id"]: r for r in multimodal.extract_image_features(media).collect()}
    assert again[1]["phash"] == r1["phash"]


def test_sample_video_frames_shape(media):
    out = multimodal.sample_video_frames(media, every_n=1).collect()
    assert all(r["frame_idx"] >= 0 for r in out)
    # 3000 bytes -> ceil contract: (3000/1024)+1 = 3 frames at every_n=1
    assert len(out) == 3
    assert {r["media_id"] for r in out} == {3}
