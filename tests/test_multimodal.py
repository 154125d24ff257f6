"""Multimodal plumbing tests: binary columns through mapInPandas with the
deterministic fake decoder (real codecs absent in this container)."""

from __future__ import annotations

import pytest

from tsatool_app_spark.functions.multimodal import (
    MEDIA_SCHEMA,
    decode_image_batch,
    media_metadata,
    pack_fake_image,
    resize_images,
    sample_video_frames,
)


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [
        (1, pack_fake_image(8, 4), ("image", "fake", 8, 4, None)),
        (2, pack_fake_image(16, 16), ("image", "fake", 16, 16, None)),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_decode_image_batch(spark, media_df):
    out = {r.media_id: r for r in decode_image_batch(media_df, fake_decoder=True).collect()}
    assert (out[1].width, out[1].height, out[1].channels) == (8, 4, 3)
    assert (out[2].width, out[2].height) == (16, 16)
    # deterministic payload → deterministic mean
    expected_mean = sum(((x * 31 + y * 17) % 251) for y in range(4) for x in range(8)) / 32
    assert out[1].mean_px == f"{expected_mean:.6f}"


def test_decode_without_library_raises(spark, media_df):
    with pytest.raises(Exception) as ei:
        decode_image_batch(media_df, fake_decoder=False).collect()
    assert "NotImplementedError" in str(ei.value) or "requires" in str(ei.value)


def test_resize_roundtrip(spark, media_df):
    resized = resize_images(media_df, 4, 2, fake_decoder=True)
    meta = decode_image_batch(resized, fake_decoder=True).collect()
    assert all((r.width, r.height) == (4, 2) for r in meta)
    # resize is deterministic: same input → same bytes
    b1 = {r.media_id: bytes(r.content) for r in resized.collect()}
    b2 = {r.media_id: bytes(r.content) for r in resize_images(media_df, 4, 2, fake_decoder=True).collect()}
    assert b1 == b2


def test_media_metadata_prunes_bytes(spark, media_df):
    meta = media_metadata(media_df)
    assert "content" not in meta.columns
    rows = {r.media_id: r for r in meta.collect()}
    assert rows[1].kind == "image" and rows[1].n_bytes == len(pack_fake_image(8, 4))


def test_video_sampling_contract(spark, media_df):
    with pytest.raises(NotImplementedError):
        sample_video_frames(media_df, 5)
