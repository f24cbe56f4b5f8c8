"""Standing probe for the REAL multimodal decode path — the
spark-avro / delta-spark / protobuf pattern: this container ships no
image codecs (no network, installs disallowed), so the test SKIPS here
with the probe's own evidence; on any environment with PIL it
synthesizes real PNG bytes, pushes them through the same mapInPandas
plumbing the stubbed multimodal queries use (`decoded_image_features`),
and asserts the decoder recovered the true geometry. Probed fresh each
round per the standing policy. See `llm/multimodal.py:decode_image`."""

import pytest


def _pil_probe():
    """Return the PIL module if importable, else the ImportError
    message proving absence."""
    try:
        import PIL  # noqa: F401
        from PIL import Image  # noqa: F401

        return Image, None
    except ImportError as e:
        return None, str(e)


def test_real_image_decode_through_mapinpandas(spark):
    Image, reason = _pil_probe()
    if Image is None:
        pytest.skip(f"PIL absent — probe: {reason}")
    import io  # pragma: no cover — below runs only with codecs present

    from aws_etl_pipeline_spark.llm.multimodal import decoded_image_features

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
