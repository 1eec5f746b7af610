"""Multimodal column plumbing: binary payloads, Arrow-batched feature
extraction (stub codec), frame sampling row shape."""

import pyspark.sql.functions as F
import pytest

from venice_spark.multimodal import attach_media_columns, extract_features, sample_frames, _decode_image


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
    bin_df = docs.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    return attach_media_columns(bin_df, "doc_id", "payload", "text/plain")


def test_metadata_columns(media):
    row = media.first()
    assert row["mime"] == "text/plain"
    assert row["payload_bytes"] == len(bytes(row["payload"]))


def test_feature_extraction_deterministic(media):
    f1 = {r["media_id"]: r["features"] for r in extract_features(media).collect()}
    f2 = {r["media_id"]: r["features"] for r in extract_features(media).collect()}
    assert f1 == f2
    dims = {len(v) for v in f1.values()}
    assert dims == {16}


def test_frame_sampling_shape(media):
    frames = sample_frames(media, every_n_bytes=64, max_frames=3)
    rows = frames.filter(F.col("media_id") == frames.first()["media_id"]).collect()
    assert 1 <= len(rows) <= 3
    assert all(isinstance(bytes(r["frame"]), bytes) for r in rows)
    # frames reassemble a prefix of the payload in order
    assert [r["frame_idx"] for r in sorted(rows, key=lambda r: r["frame_idx"])] == list(range(len(rows)))


def test_real_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        _decode_image(b"\x89PNG...")
