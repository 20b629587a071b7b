"""Multimodal plumbing tests: real stdlib decode (PPM/BMP), codec
gating for compressed formats, determinism, batch shape."""

from __future__ import annotations

import struct

import pytest

from irio2024_mapreduce_spark.operators.multimodal import (
    _try_import_pil,
    decode_image,
    encode_ppm,
    media_table,
    multimodal_decode,
    resize_image,
)

HAVE_PIL = _try_import_pil() is not None


def _ppm_payload(w: int, h: int, fill: bytes = b"\x10\x20\x30") -> bytes:
    return encode_ppm(w, h, fill * (w * h))


def _bmp_payload(w: int, h: int) -> bytes:
    """Minimal 24-bit BMP: file header + BITMAPINFOHEADER + padded
    rows (pixel content irrelevant for header decode)."""
    row = w * 3 + (-w * 3) % 4
    pixels = b"\x00" * (row * abs(h))
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                       len(pixels), 2835, 2835, 0, 0)
    head = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(pixels), 0, 0,
                       14 + 40)
    return head + info + pixels


@pytest.mark.skipif(HAVE_PIL, reason="Pillow present: real path active")
def test_compressed_decode_is_gated_without_pil():
    with pytest.raises(NotImplementedError, match="Pillow|libvips"):
        decode_image(b"\x89PNG...")


def test_real_decode_ppm_stdlib():
    """Real bytes → real dimensions, no codec library: the stdlib P6
    parser reads the actual header. Runs in every environment."""
    payload = _ppm_payload(37, 53)
    assert decode_image(payload) == (37, 53)
    with pytest.raises(ValueError, match="PPM"):
        decode_image(b"P6\n10 10\n65535\n" + b"x" * 300)  # bad maxval


def test_real_decode_bmp_stdlib():
    assert decode_image(_bmp_payload(200, 100)) == (200, 100)
    # top-down BMPs store negative height; dimensions are magnitudes
    assert decode_image(_bmp_payload(16, -9)) == (16, 9)


def test_real_resize_ppm_stdlib():
    """Nearest-neighbor resize round-trips through decode and
    preserves the uniform fill of a uniform source."""
    out = resize_image(_ppm_payload(200, 100, b"\x05\x06\x07"), (64, 32))
    assert decode_image(out) == (64, 32)
    w, h = 64, 32
    assert out.endswith(b"\x05\x06\x07" * (w * h))
    # downsample of a non-uniform image picks real source pixels:
    # left half red, right half blue → halves survive the resize
    px = (b"\xff\x00\x00" * 4 + b"\x00\x00\xff" * 4) * 8
    out2 = resize_image(encode_ppm(8, 8, px), (2, 2))
    assert decode_image(out2) == (2, 2)
    body = out2[-12:]
    assert body == b"\xff\x00\x00\x00\x00\xff" * 2


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
    if not HAVE_PIL:
        with pytest.raises(NotImplementedError, match="Pillow|libvips"):
            resize_image(b"img", (128, 96))  # not P6 → codec-gated
    a = resize_image(b"img", (128, 96), fake=True)
    b = resize_image(b"img", (128, 96), fake=True)
    assert a == b and len(a) == (128 * 96) // 64
    assert resize_image(b"img", (64, 64), fake=True) != a[: (64 * 64) // 64]


def test_avi_roundtrip_and_rejection():
    """encode_avi/decode_avi: exact header + frame roundtrip, even
    sampling, and loud rejection of malformed input."""
    from irio2024_mapreduce_spark.operators.multimodal import (
        decode_avi,
        encode_avi,
        sample_frames,
    )

    frames_in = [bytes([i]) * 24 for i in range(7)]
    avi = encode_avi(4, 2, frames_in)
    w, h, total, frames = decode_avi(avi)
    assert (w, h, total) == (4, 2, 7)
    assert frames == frames_in
    # even sampling: idx_i = i * total // n, real frame bytes back
    sampled = sample_frames(avi, 4)
    assert [ix for ix, _ in sampled] == [0, 1, 3, 5]
    assert all(fb == frames_in[ix] for ix, fb in sampled)
    # compressed containers stay gated — no silent fake
    with pytest.raises(NotImplementedError, match="ffmpeg|pyav"):
        sample_frames(b"\x00\x00\x00\x18ftypmp42", 4)
    with pytest.raises(ValueError, match="RIFF/AVI"):
        decode_avi(b"RIFFxxxxWAVE")
    # a frame-count/chunk mismatch must not decode quietly
    import struct

    broken = avi[:48] + struct.pack("<I", 9) + avi[52:]
    with pytest.raises(ValueError, match="declares 9"):
        decode_avi(broken)
    with pytest.raises(ValueError, match="aligned"):
        encode_avi(3, 2, [b"\x00" * 18])  # stride 9 not 4-aligned


def test_avi_walker_is_iterative_and_clamps_chunk_sizes():
    """Adversarial payloads (ADVICE r7): a LIST nesting deeper than
    the Python recursion limit must not RecursionError, and a chunk
    whose declared size overruns its enclosing span must raise, not
    silently truncate frames."""
    import struct
    import sys

    from irio2024_mapreduce_spark.operators.multimodal import (
        decode_avi,
        encode_avi,
    )

    # deep nesting: LIST shells around a valid hdrl+movi core
    core = encode_avi(4, 2, [bytes(24)])[12:]  # strip RIFF header
    depth = sys.getrecursionlimit() + 100
    body = core
    for _ in range(depth):
        body = b"LIST" + struct.pack("<I", 4 + len(body)) + b"nest" + body
    payload = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"AVI " + body
    w, h, total, frames = decode_avi(payload)  # no RecursionError
    assert (w, h, total, len(frames)) == (4, 2, 1, 1)

    # declared chunk size overruns the buffer → loud error
    avi = encode_avi(4, 2, [bytes(24)])
    movi_at = avi.index(b"00db")
    oversize = avi[: movi_at + 4] + struct.pack("<I", 10**6) + avi[movi_at + 8 :]
    with pytest.raises(ValueError, match="declares 1000000"):
        decode_avi(oversize)


def test_video_table_payloads_are_real_avi(spark, sf_dir):
    """The JVM-expression-built payloads must parse as genuine
    uncompressed AVI with the documented fixture parameters, and must
    byte-match the Python reference encoder."""
    from irio2024_mapreduce_spark.operators.multimodal import (
        AVI_FRAME_BYTES,
        AVI_H,
        AVI_W,
        decode_avi,
        encode_avi,
        video_table,
    )

    rows = video_table(spark, sf_dir).collect()
    assert rows
    docs = {
        r["doc_id"]: r["n_chars"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "n_chars")
        .collect()
    }
    for r in rows[:50]:
        payload = bytes(r["payload"])
        w, h, total, frames = decode_avi(payload)
        t = 4 + docs[r["doc_id"]] % 20
        assert (w, h, total) == (AVI_W, AVI_H, t)
        expect = encode_avi(
            AVI_W,
            AVI_H,
            [
                bytes([97 + (r["doc_id"] + i) % 26]) * AVI_FRAME_BYTES
                for i in range(t)
            ],
        )
        assert payload == expect  # byte-exact vs the reference encoder


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
    # thumbs of uniform-fill sources depend only on the fill color:
    # distinct outputs == distinct fills among image rows (images with
    # different dims but the same fill collapse to the same thumb)
    n_distinct_fills = (
        media_table(spark, sf_dir)
        .filter(F.col("media_type") == "image/ppm")
        .select((F.col("doc_id") % 26).alias("fill"))
        .distinct()
        .count()
    )
    assert rs[0]["distinct_outputs"] == n_distinct_fills
    # real byte accounting: P6 header "P6\n128 96\n255\n" is 14 bytes
    assert rs[0]["total_bytes"] == rs[0]["n_images"] * (14 + 128 * 96 * 3)
    fr = multimodal_frames(spark, sf_dir).collect()
    assert fr
    for r in fr:
        assert r["n_frames"] == FRAMES_PER_VIDEO
        assert r["first_frame"] == 0
        # 4 ≤ total ≤ 23 ⇒ the 4 sampled indices are all distinct and
        # their fills collision-free ⇒ 4 distinct REAL frame hashes
        assert 4 <= r["total_frames"] <= 23
        assert r["distinct_frames"] == FRAMES_PER_VIDEO
        assert (r["width"], r["height"]) == (4, 2)
        assert r["last_frame"] == 3 * r["total_frames"] // 4


def test_decode_pipeline_deterministic(spark, sf_dir):
    a = sorted(map(tuple, multimodal_decode(spark, sf_dir).collect()))
    b = sorted(map(tuple, multimodal_decode(spark, sf_dir).collect()))
    assert a == b
    assert len(a) == 3  # one row per media_type


def test_wav_roundtrip_and_rejection():
    """encode_wav/decode_wav: exact header roundtrip, chunk-walking
    past interposed chunks, and loud rejection of malformed input."""
    import struct

    import pytest

    from irio2024_mapreduce_spark.operators.multimodal import (
        decode_wav,
        encode_wav,
    )

    wav = encode_wav(8000, 1, 8, b"\x10" * 123)
    assert decode_wav(wav) == (8000, 1, 8, 123)
    # stereo 16-bit: n_frames counts FRAMES, not bytes
    wav2 = encode_wav(44100, 2, 16, b"\x00" * 400)
    assert decode_wav(wav2) == (44100, 2, 16, 100)
    # an interposed LIST chunk between fmt and data must be skipped
    body = b"\x07" * 10
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    raw = encode_wav(8000, 1, 8, body)
    with_list = raw[:36] + extra + raw[36:]
    patched = (
        with_list[:4]
        + struct.pack("<I", struct.unpack_from("<I", with_list, 4)[0] + 12)
        + with_list[8:]
    )
    assert decode_wav(patched) == (8000, 1, 8, 10)
    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxNOPE")
    with pytest.raises(ValueError):
        decode_wav(b"\x89PNG\r\n")
    with pytest.raises(ValueError):
        encode_wav(8000, 2, 16, b"\x00" * 7)  # misaligned frames


def test_audio_table_payloads_are_real_wav(spark, sf_dir):
    """The JVM-expression-built payloads must parse as genuine PCM
    WAV with the documented fixture parameters."""
    from irio2024_mapreduce_spark.operators.multimodal import (
        WAV_SAMPLE_RATE,
        audio_table,
        decode_wav,
    )

    rows = audio_table(spark, sf_dir).collect()
    assert rows
    for r in rows:
        sr, ch, bits, n = decode_wav(bytes(r["payload"]))
        assert (sr, ch, bits) == (WAV_SAMPLE_RATE, 1, 8)
        assert 16 <= n <= 195
        # total payload = 44-byte canonical header + one byte/frame
        assert len(bytes(r["payload"])) == 44 + n


def test_resize_numpy_matches_scalar_reference():
    """The vectorized nearest-neighbor resize must byte-match the
    scalar striding definition (sy = y*h//th, sx = x*w//tw) on
    arbitrary images and target shapes — hypothesis-driven guard for
    the r7 numpy rewrite."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from irio2024_mapreduce_spark.operators.multimodal import (
        _resize_ppm,
        encode_ppm,
    )

    @settings(max_examples=50, deadline=None)
    @given(
        w=st.integers(1, 24),
        h=st.integers(1, 24),
        tw=st.integers(1, 24),
        th=st.integers(1, 24),
        data=st.data(),
    )
    def check(w, h, tw, th, data):
        px = bytes(
            data.draw(
                st.lists(
                    st.integers(0, 255),
                    min_size=w * h * 3,
                    max_size=w * h * 3,
                )
            )
        )
        payload = encode_ppm(w, h, px)
        got = _resize_ppm(payload, (tw, th))
        # scalar reference: the original per-pixel loop
        out = bytearray()
        for y in range(th):
            row = px[(y * h // th) * w * 3:]
            for x in range(tw):
                sx = (x * w // tw) * 3
                out += row[sx:sx + 3]
        assert got == encode_ppm(tw, th, bytes(out))

    check()


def test_av_codecs_round_trip_property():
    """Hypothesis round-trips for both RIFF codecs: arbitrary frame
    payloads and dims survive encode→decode bit-exactly (AVI needs
    4-byte row alignment ⇒ width ≡ 0 mod 4; WAV needs frame-aligned
    buffers)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from irio2024_mapreduce_spark.operators.multimodal import (
        decode_avi,
        decode_wav,
        encode_avi,
        encode_wav,
    )

    @settings(max_examples=60, deadline=None)
    @given(
        w4=st.integers(1, 6),  # width = 4*w4 keeps rows 4-aligned
        h=st.integers(1, 8),
        nf=st.integers(0, 6),
        data=st.data(),
    )
    def check_avi(w4, h, nf, data):
        w = 4 * w4
        frames = [
            bytes(
                data.draw(
                    st.lists(
                        st.integers(0, 255),
                        min_size=w * h * 3,
                        max_size=w * h * 3,
                    )
                )
            )
            for _ in range(nf)
        ]
        got = decode_avi(encode_avi(w, h, frames))
        assert got == (w, h, nf, frames)

    @settings(max_examples=60, deadline=None)
    @given(
        rate=st.sampled_from([8000, 16000, 44100]),
        ch=st.integers(1, 2),
        bits=st.sampled_from([8, 16]),
        nf=st.integers(0, 64),
        data=st.data(),
    )
    def check_wav(rate, ch, bits, nf, data):
        block = ch * bits // 8
        pcm = bytes(
            data.draw(
                st.lists(
                    st.integers(0, 255),
                    min_size=nf * block,
                    max_size=nf * block,
                )
            )
        )
        assert decode_wav(encode_wav(rate, ch, bits, pcm)) == (
            rate,
            ch,
            bits,
            nf,
        )

    check_avi()
    check_wav()
