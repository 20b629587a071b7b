"""Multimodal plumbing tests: stub gating, determinism, batch shape."""

from __future__ import annotations

import pytest

from irio2024_mapreduce_spark.operators.multimodal import (
    _try_import_pil,
    decode_image,
    media_table,
    multimodal_decode,
)

HAVE_PIL = _try_import_pil() is not None


def _png_payload(w: int, h: int) -> bytes:
    """A real encoded PNG of the given size (only called under PIL)."""
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (w, h), (10, 20, 30)).save(buf, format="PNG")
    return buf.getvalue()


@pytest.mark.skipif(HAVE_PIL, reason="Pillow present: real path active")
def test_real_decode_is_gated_without_pil():
    with pytest.raises(NotImplementedError, match="Pillow|libvips"):
        decode_image(b"\x89PNG...")


@pytest.mark.skipif(not HAVE_PIL, reason="Pillow not importable here")
def test_real_decode_with_pil():
    """Where Pillow exists, fake=False decodes real bytes: true
    dimensions come back, and the fake path stays byte-identical to
    the no-PIL environments (hash-derived, codec-independent)."""
    payload = _png_payload(37, 53)
    assert decode_image(payload) == (37, 53)
    assert decode_image(payload, fake=True) == decode_image(
        payload, fake=True
    )


@pytest.mark.skipif(not HAVE_PIL, reason="Pillow not importable here")
def test_real_resize_with_pil():
    from irio2024_mapreduce_spark.operators.multimodal import resize_image

    out = resize_image(_png_payload(200, 100), (64, 32))
    assert decode_image(out) == (64, 32)  # round-trips through decode


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


def test_resize_gated_and_deterministic():
    from irio2024_mapreduce_spark.operators.multimodal import resize_image

    if not HAVE_PIL:
        with pytest.raises(NotImplementedError, match="Pillow|libvips"):
            resize_image(b"img", (128, 96))
    a = resize_image(b"img", (128, 96), fake=True)
    b = resize_image(b"img", (128, 96), fake=True)
    assert a == b and len(a) == (128 * 96) // 64
    assert resize_image(b"img", (64, 64), fake=True) != a[: (64 * 64) // 64]


def test_frame_sampling_shape():
    from irio2024_mapreduce_spark.operators.multimodal import sample_frames

    with pytest.raises(NotImplementedError, match="ffmpeg|pyav"):
        sample_frames(b"vid", 4)
    frames = sample_frames(b"v" * 100, 4, fake=True)
    assert [ix for ix, _ in frames] == [0, 25, 50, 75]
    assert len({fb for _, fb in frames}) == 4  # distinct frame bytes


def test_resize_and_frames_queries(spark, sf_dir):
    from irio2024_mapreduce_spark.operators.multimodal import (
        FRAMES_PER_VIDEO,
        multimodal_frames,
        multimodal_resize,
    )

    from pyspark.sql import functions as F

    from irio2024_mapreduce_spark.operators.multimodal import media_table

    rs = multimodal_resize(spark, sf_dir).collect()
    assert len(rs) == 1 and rs[0]["out_w"] == 128
    # resized_sha is a pure function of the payload: distinct outputs
    # must equal distinct image payloads (duplicate texts collide by
    # design, so don't assume == n_images)
    n_distinct_payloads = (
        media_table(spark, sf_dir)
        .filter(F.col("media_type") == "image/png")
        .select("payload")
        .distinct()
        .count()
    )
    assert rs[0]["distinct_outputs"] == n_distinct_payloads
    fr = multimodal_frames(spark, sf_dir).collect()
    assert all(r["n_frames"] == FRAMES_PER_VIDEO for r in fr)
    assert all(r["first_frame"] == 0 for r in fr)


def test_decode_pipeline_deterministic(spark, sf_dir):
    a = sorted(map(tuple, multimodal_decode(spark, sf_dir).collect()))
    b = sorted(map(tuple, multimodal_decode(spark, sf_dir).collect()))
    assert a == b
    assert len(a) == 3  # one row per media_type
