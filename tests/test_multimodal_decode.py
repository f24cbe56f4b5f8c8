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
