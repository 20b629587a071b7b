"""Multimodal plumbing tests: stub gating, determinism, batch shape."""

from __future__ import annotations

import pytest

from irio2024_mapreduce_spark.operators.multimodal import (
    decode_image,
    media_table,
    multimodal_decode,
)


def test_real_decode_is_gated():
    with pytest.raises(NotImplementedError, match="PIL|libvips"):
        decode_image(b"\x89PNG...")


def test_fake_decode_deterministic():
    a = decode_image(b"payload-bytes", fake=True)
    b = decode_image(b"payload-bytes", fake=True)
    assert a == b
    w, h = a
    assert 64 <= w < 256 and 64 <= h < 256


def test_media_schema(spark, sf_dir):
    df = media_table(spark, sf_dir)
    types = dict(df.dtypes)
    assert types["payload"] == "binary"
    assert types["media_type"] == "string"
    assert types["meta"].startswith("struct<")


def test_decode_pipeline_deterministic(spark, sf_dir):
    a = sorted(map(tuple, multimodal_decode(spark, sf_dir).collect()))
    b = sorted(map(tuple, multimodal_decode(spark, sf_dir).collect()))
    assert a == b
    assert len(a) == 3  # one row per media_type
