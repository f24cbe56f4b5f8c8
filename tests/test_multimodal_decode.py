"""Real multimodal decode tests. Since round 13 the decode path is
REAL without any codec library for uncompressed 24-bit BMP (pure-numpy
parser, `llm/multimodal.py:decode_bmp24`), so most of this file runs
unconditionally: codec round-trip across every row-padding remainder,
golden-byte pins (the exact on-disk layout can't drift silently), the
formula-vs-decoder cross-check the DuckDB oracle relies on, and the
real `decoded_image_features` mapInPandas plan on BMP payloads.

The PIL probe remains for COMPRESSED formats (the spark-avro /
delta-spark / protobuf pattern): this container ships no codecs, so
the PNG test skips with the probe's own evidence; on any environment
with PIL it drives the same plumbing with real PNG bytes. Probed fresh
each round per the standing policy."""

import hashlib

import numpy as np
import pytest

from aws_etl_pipeline_spark.llm.multimodal import (
    _bmp_pixel_planes,
    decode_bmp24,
    decode_image,
    decoded_image_features,
    encode_bmp24,
    synth_bmp,
)


def test_bmp_roundtrip_every_padding_remainder():
    """encode -> decode is the identity for widths hitting every
    row-padding remainder mod 4 (BMP rows pad to 4-byte boundaries —
    the classic decoder bug is padding arithmetic)."""
    for w, h in [(16, 12), (17, 13), (18, 14), (19, 15), (32, 24), (1, 1)]:
        rng = np.random.RandomState(w * 100 + h)
        rgb = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
        img = decode_bmp24(encode_bmp24(rgb))
        assert (img.width, img.height, img.mode) == (w, h, "RGB")
        assert (img.pixels == rgb).all()


def test_bmp_golden_bytes():
    """Pin the exact serialized layout: header fields, bottom-up BGR
    rows, padding. A byte-level change in the encoder (or a decoder
    that silently compensates) flips these."""
    payload = synth_bmp(7)
    assert payload[:2] == b"BM"
    assert len(payload) == 1422
    assert hashlib.md5(payload).hexdigest() == (
        "b397902481138c434782a196521f09d1"
    )
    # 2x1 red-then-blue image: row padded 3 -> 4? (2*3=6, pad to 8)
    tiny = encode_bmp24(
        np.array([[[255, 0, 0], [0, 0, 255]]], dtype=np.uint8)
    )
    # pixel data: BGR red (00 00 FF), BGR blue (FF 00 00), 2 pad bytes
    assert tiny[54:] == bytes([0, 0, 255, 255, 0, 0, 0, 0])
    assert decode_bmp24(tiny).pixels.tolist() == [[[255, 0, 0], [0, 0, 255]]]


def test_bmp_topdown_variant():
    """Negative biHeight = top-down row order; the parser must NOT
    flip those."""
    rgb = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    data = bytearray(encode_bmp24(rgb))
    # rewrite height to -2 and flip the stored rows to top-down
    import struct

    h = struct.unpack_from("<i", data, 22)[0]
    assert h == 2
    struct.pack_into("<i", data, 22, -2)
    row_bytes = (3 * 3 + 3) & ~3
    rows = bytes(data[54:])
    data[54:] = rows[row_bytes:] + rows[:row_bytes]
    img = decode_bmp24(bytes(data))
    assert (img.pixels == rgb).all()


def test_decoder_matches_generating_formula():
    """The oracle contract: decoded pixels == the closed-form
    (doc_id, x, y) formula, through the full decode_image dispatch."""
    for d in [0, 1, 42, 123456789]:
        img = decode_image(synth_bmp(d))
        r, g, b = _bmp_pixel_planes(d, img.width, img.height)
        assert (img.pixels[:, :, 0] == r).all()
        assert (img.pixels[:, :, 1] == g).all()
        assert (img.pixels[:, :, 2] == b).all()


def test_malformed_bmp_rejected_cleanly():
    """r13 advice: header lies (negative/zero dims, offset past EOF,
    truncated pixel data) must surface as a clean ValueError before
    any allocation — never an opaque numpy error or a header-driven
    giant allocation."""
    import struct

    good = synth_bmp(1)

    def mutate(off, fmt, val):
        data = bytearray(good)
        struct.pack_into(fmt, data, off, val)
        return bytes(data)

    for bad in (
        mutate(18, "<i", -5),  # negative width
        mutate(18, "<i", 0),  # zero width
        mutate(22, "<i", 0),  # zero height
        mutate(18, "<i", 1 << 24),  # oversized width vs payload
        mutate(10, "<I", len(good) + 1),  # offset past EOF
        good[: len(good) // 2],  # truncated pixel data
        b"BM\x00\x01",  # header itself truncated
    ):
        with pytest.raises(ValueError):
            decode_bmp24(bad)


def test_decode_image_rejects_unknown_without_pil():
    """The NotImplementedError is now the FALLBACK: non-BMP payloads
    on a codec-less container still raise (honest boundary), BMP
    decodes for real."""
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL present — fallback branch unreachable here")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG\r\n\x1a\nnot-really-a-png")


def test_real_bmp_decode_through_mapinpandas(spark):
    """The real decoder through the same mapInPandas plan the PIL
    probe uses — runs unconditionally now (no codec needed)."""
    rows = [(int(d), synth_bmp(d)) for d in (1, 2, 3)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        r.doc_id: (r.width, r.height, r.mode)
        for r in decoded_image_features(df).collect()
    }
    assert got == {
        1: (16 + 1 % 17, 12 + 1 % 13, "RGB"),
        2: (18, 14, "RGB"),
        3: (19, 15, "RGB"),
    }


def _pil_probe():
    """Return the PIL Image module if importable, else the ImportError
    message proving absence."""
    try:
        import PIL  # noqa: F401
        from PIL import Image  # noqa: F401

        return Image, None
    except ImportError as e:
        return None, str(e)


def test_real_png_decode_through_mapinpandas(spark):
    Image, reason = _pil_probe()
    if Image is None:
        pytest.skip(f"PIL absent (compressed formats only) — probe: {reason}")
    import io  # pragma: no cover — below runs only with codecs present

    def png_bytes(w, h, color):
        buf = io.BytesIO()
        Image.new("RGB", (w, h), color).save(buf, format="PNG")
        return buf.getvalue()

    rows = [
        (1, png_bytes(7, 3, (255, 0, 0))),
        (2, png_bytes(64, 48, (0, 255, 0))),
        (3, png_bytes(1, 1, (0, 0, 255))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        r.doc_id: (r.width, r.height, r.mode)
        for r in decoded_image_features(df).collect()
    }
    assert got == {1: (7, 3, "RGB"), 2: (64, 48, "RGB"), 3: (1, 1, "RGB")}


# ---------------------------------------------------------------- WAV (r14)


def _wav_imports():
    from aws_etl_pipeline_spark.llm.multimodal import (  # noqa: F401
        _wav_sample_planes,
        decode_wav16,
        encode_wav16,
        synth_wav,
    )

    return _wav_sample_planes, decode_wav16, encode_wav16, synth_wav


def test_wav_roundtrip_mono_and_stereo():
    """encode -> decode is the identity for mono and stereo PCM,
    including negative samples and the int16 extremes."""
    _, decode_wav16, encode_wav16, _ = _wav_imports()
    for n, ch, seed in [(1, 1, 0), (120, 1, 1), (121, 2, 2), (7, 2, 3)]:
        rng = np.random.RandomState(seed)
        s = rng.randint(-32768, 32768, (n, ch)).astype(np.int16)
        au = decode_wav16(encode_wav16(s, 8000))
        assert (au.sample_rate, au.n_channels, au.n_frames) == (8000, ch, n)
        assert (au.samples == s).all()


def test_wav_golden_bytes():
    """Pin the exact serialized layout: canonical 44-byte header,
    little-endian interleaved int16 frames. A byte-level change in the
    encoder (or a decoder that silently compensates) flips these."""
    _, decode_wav16, encode_wav16, synth_wav = _wav_imports()
    p7 = synth_wav(7)  # 127 stereo frames: 44 + 127*4
    assert len(p7) == 552
    assert hashlib.md5(p7).hexdigest() == "da3e2a5006c3ae36521dce055b7dd1e5"
    p0 = synth_wav(0)  # 120 mono frames: 44 + 120*2
    assert len(p0) == 284
    assert hashlib.md5(p0).hexdigest() == "13db7488b034ec70025e109882f51beb"
    # one hand-built file: two stereo frames, known samples
    tiny = encode_wav16(
        np.array([[1, -1], [32767, -32768]], dtype=np.int16), 44100
    )
    assert tiny[:4] == b"RIFF" and tiny[8:12] == b"WAVE"
    assert tiny[12:16] == b"fmt " and tiny[36:40] == b"data"
    assert tiny[44:] == bytes(
        [0x01, 0x00, 0xFF, 0xFF, 0xFF, 0x7F, 0x00, 0x80]
    )


def test_wav_decoder_matches_generating_formula():
    """The oracle contract: decoding synth_wav(d) reproduces the
    closed-form sample planes exactly."""
    planes, decode_wav16, _, synth_wav = _wav_imports()
    for d in (0, 1, 6, 7, 100):
        au = decode_wav16(synth_wav(d))
        want = planes(d, 120 + d % 101, 1 + d % 2)
        assert au.n_frames == 120 + d % 101
        assert au.n_channels == 1 + d % 2
        assert (au.samples == want).all()


def test_wav_extra_chunks_tolerated():
    """A LIST chunk between fmt and data (common in real recorders)
    must be skipped by the RIFF walk, including odd-size padding."""
    _, decode_wav16, encode_wav16, _ = _wav_imports()
    s = np.array([[5], [-6], [7]], dtype=np.int16)
    base = encode_wav16(s, 16000)
    # splice an odd-sized junk chunk before 'data' (word-aligned pad)
    import struct as _st

    junk = _st.pack("<4sI", b"LIST", 3) + b"abc\x00"
    patched = base[:36] + junk + base[36:]
    patched = patched[:4] + _st.pack("<I", len(patched) - 8) + patched[8:]
    au = decode_wav16(patched)
    assert (au.samples == s).all() and au.sample_rate == 16000


def test_malformed_wav_rejected_cleanly():
    """Every malformed payload fails as a clean ValueError BEFORE any
    allocation — never an opaque numpy error (the BMP discipline)."""
    _, decode_wav16, encode_wav16, synth_wav = _wav_imports()
    good = synth_wav(1)
    import struct as _st

    cases = [
        b"RIFX" + good[4:],  # bad magic
        good[:8] + b"AIFF" + good[12:],  # not WAVE
        good[:40] + _st.pack("<I", 10**9) + good[44:],  # data size past EOF
        good[:44],  # no data bytes at all -> truncated chunk
        good[:20] + _st.pack("<H", 3) + good[22:],  # float PCM fmt
        good[:34] + _st.pack("<H", 8) + good[36:],  # 8-bit
        good[:12] + _st.pack("<4sI", b"data", 4) + b"abcd",  # data before fmt
    ]
    for i, payload in enumerate(cases):
        with pytest.raises(ValueError):
            decode_wav16(payload)
    # partial frame: stereo data chunk whose size is not a multiple of
    # block_align
    s = np.array([[1, 2]], dtype=np.int16)
    b = encode_wav16(s, 8000)
    bad = b[:40] + _st.pack("<I", 3) + b[44:47]
    with pytest.raises(ValueError):
        decode_wav16(bad)


def test_wav_decode_query_stats(spark):
    """End-to-end mapInPandas pipeline on a tiny doc set: the decoded
    stats match the formula recomputed in numpy."""
    from aws_etl_pipeline_spark.llm.multimodal import (
        _wav_decode_batches,
        _wav_synth_batches,
    )

    planes, _, _, _ = _wav_imports()
    df = spark.createDataFrame([(1,), (2,)], "doc_id long")
    payloads = df.mapInPandas(
        _wav_synth_batches, schema="doc_id long, payload binary"
    )
    decoded = payloads.mapInPandas(
        _wav_decode_batches,
        schema=(
            "doc_id long, sample_rate long, n_channels long, channel long, "
            "n_frames long, amp_sum long, amp_min long, amp_max long, "
            "energy long"
        ),
    )
    got = {(r.doc_id, r.channel): r for r in decoded.collect()}
    assert len(got) == 3  # doc 1 stereo (2 rows) + doc 2 mono (1 row)
    for (d, c), r in got.items():
        s = planes(d, 120 + d % 101, 1 + d % 2).astype(np.int64)[:, c]
        assert r.amp_sum == int(s.sum())
        assert r.amp_min == int(s.min()) and r.amp_max == int(s.max())
        assert r.energy == int((s * s).sum())
        assert r.sample_rate == 8000 and r.n_frames == len(s)
