"""Multimodal columns (north star, SURVEY §2B): image/audio/video as
opaque ``binary`` columns with typed metadata, processed by Arrow-
batched pandas UDFs over ``mapInPandas``.

The container has no image/audio codecs, so the *decode* step is a
clearly-marked stub (``decode_image`` raises NotImplementedError unless
PIL is importable); everything around it — binary columns, schema,
batch iteration, partitioning, frame sampling — is real and verified
against a DuckDB oracle computing the same bytes with SQL blob
functions.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_spread
from ..registry import query

FRAME_BYTES = 16
FRAME_STRIDE = 64

try:  # pragma: no cover — codec libs absent in this container
    from PIL import Image  # type: ignore

    _PIL = True
except ImportError:
    _PIL = False


def decode_image(data: bytes):
    """Decode an image payload. STUB: the real decoder needs PIL/libvips,
    which this environment does not ship; the Spark-side plumbing
    (binary column in, typed features out) is exercised with
    deterministic byte-level features instead (see image_features).

    Standing probe: ``tests/test_multimodal_decode.py`` probes for PIL
    each session (the spark-avro / delta / protobuf pattern) and, on
    any environment that ships codecs, drives THIS function through
    the real ``decoded_image_features`` mapInPandas plan below — no
    edits needed to light the real path up."""
    if not _PIL:
        raise NotImplementedError(
            "image decode requires PIL; this container ships no codecs"
        )
    import io

    return Image.open(io.BytesIO(data))  # pragma: no cover


def _decoded_feature_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:  # pragma: no cover — exercised only when PIL exists
    """The REAL decode path: Arrow batches of binary payloads through
    ``decode_image``, emitting true (width, height, mode). Identical
    batch shape / schema discipline to ``_feature_batches`` — only the
    feature fn differs, so the probe test verifies the same plumbing
    the stubbed queries use."""
    for pdf in batches:
        ws, hs, modes = [], [], []
        for payload in pdf["payload"]:
            img = decode_image(bytes(payload))
            ws.append(img.width)
            hs.append(img.height)
            modes.append(img.mode)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "width": pd.Series(ws, dtype="int64"),
                "height": pd.Series(hs, dtype="int64"),
                "mode": modes,
            }
        )


def decoded_image_features(df: DataFrame) -> DataFrame:
    """Real-decoder twin of ``multimodal_features``: (doc_id, payload)
    binary frame -> (doc_id, width, height, mode) via mapInPandas.
    Raises (per-batch) NotImplementedError without PIL; driven by the
    standing probe in tests/test_multimodal_decode.py."""
    return df.mapInPandas(
        _decoded_feature_batches,
        schema="doc_id long, width long, height long, mode string",
    )


def _feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched feature extraction over binary payloads: byte
    length, content hash, and deterministic fake width/height standing
    in for the decoder output."""
    for pdf in batches:
        payload = pdf["payload"]
        blen = payload.map(len)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "byte_len": blen.astype("int64"),
                "content_md5": payload.map(lambda b: hashlib.md5(b).hexdigest()),
                "fake_width": (blen % 640 + 1).astype("int64"),
                "fake_height": (blen % 480 + 1).astype("int64"),
            }
        )


@query(
    "multimodal_features",
    oracle="""
SELECT doc_id,
       octet_length(encode(text))::BIGINT AS byte_len,
       md5(text)                          AS content_md5,
       (octet_length(encode(text)) % 640 + 1)::BIGINT AS fake_width,
       (octet_length(encode(text)) % 480 + 1)::BIGINT AS fake_height
FROM documents
""",
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column feature extraction through mapInPandas: documents'
    text re-encoded as an opaque binary payload (the stand-in for an
    image blob), features computed per Arrow batch in pandas. The
    oracle recomputes the same bytes with SQL blob functions — what's
    verified is the batch plumbing, not the stub features."""
    d = load_spread(spark, sf_dir, "documents")
    payloads = d.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    return payloads.mapInPandas(
        _feature_batches,
        schema="doc_id long, byte_len long, content_md5 string, "
        "fake_width long, fake_height long",
    )


def _frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic frame sampling: every FRAME_STRIDE bytes, emit a
    FRAME_BYTES-byte 'frame' (the video analog: keyframe every Nth)."""
    for pdf in batches:
        ids, idxs, frames = [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            n_frames = max((len(payload) - FRAME_BYTES) // FRAME_STRIDE + 1, 0)
            for i in range(n_frames):
                start = i * FRAME_STRIDE
                ids.append(doc_id)
                idxs.append(i)
                frames.append(payload[start : start + FRAME_BYTES].hex().upper())
        yield pd.DataFrame(
            {"doc_id": ids, "frame_idx": idxs, "frame_hex": frames}
        ).astype({"doc_id": "int64", "frame_idx": "int64"})


@query(
    "multimodal_frame_sample",
    oracle=f"""
WITH b AS (
  SELECT doc_id, hex(encode(text)) AS payload_hex,
         greatest((octet_length(encode(text)) - {FRAME_BYTES}) // {FRAME_STRIDE} + 1, 0)
           AS n_frames
  FROM documents
)
SELECT doc_id,
       unnest(generate_series(0, n_frames - 1))::BIGINT AS frame_idx,
       unnest(list_transform(generate_series(0, n_frames - 1),
              i -> substr(payload_hex, i * {FRAME_STRIDE * 2} + 1, {FRAME_BYTES * 2})))
         AS frame_hex
FROM b WHERE n_frames > 0
""",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over binary payloads via mapInPandas: one output
    row per sampled 16-byte frame at a 64-byte stride. The expansion
    happens inside the Arrow batch iterator (no driver loop, no
    explode of a materialized array)."""
    d = load_spread(spark, sf_dir, "documents")
    payloads = d.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    return payloads.mapInPandas(
        _frame_batches, schema="doc_id long, frame_idx long, frame_hex string"
    )


RESIZE_STRIDE = 4  # keep every 4th byte — the stand-in for a real resample


def _resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic 'resize': stride-sample the payload bytes (what a
    real image resample does to pixels, minus the codec — which is
    stubbed, see decode_image)."""
    for pdf in batches:
        resized = pdf["payload"].map(lambda b: b[::RESIZE_STRIDE])
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "resized_len": resized.map(len).astype("int64"),
                "resized_hex": resized.map(lambda b: b.hex().upper()),
            }
        )


@query(
    "multimodal_resize",
    oracle=f"""
WITH b AS (
  SELECT doc_id, encode(text) AS p, octet_length(encode(text)) AS n
  FROM documents
),
r AS (
  SELECT doc_id,
         list_transform(generate_series(0, (n - 1) // {RESIZE_STRIDE}),
                        i -> substr(hex(p), i * {RESIZE_STRIDE * 2} + 1, 2)) AS px
  FROM b
)
SELECT doc_id,
       len(px)::BIGINT AS resized_len,
       array_to_string(px, '') AS resized_hex
FROM r
""",
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize/resample over binary payloads via mapInPandas: every 4th
    byte survives (the codec-free stand-in for image downsampling).
    Verified byte-for-byte — the oracle rebuilds the strided bytes and compares the hex bytes exactly."""
    d = load_spread(spark, sf_dir, "documents")
    payloads = d.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    return payloads.mapInPandas(
        _resize_batches, schema="doc_id long, resized_len long, resized_hex string"
    )


CHUNK_BYTES = 256  # audio-frame analog: energy per 256-byte window


def _energy_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Audio-analog feature: mean byte value ('energy') per fixed-size
    chunk of the payload — the plumbing a real RMS-over-PCM extraction
    uses, minus the codec."""
    for pdf in batches:
        ids, idxs, energies = [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            for i in range(0, len(payload), CHUNK_BYTES):
                chunk = payload[i : i + CHUNK_BYTES]
                ids.append(doc_id)
                idxs.append(i // CHUNK_BYTES)
                # integer-sum / small-int is exactly representable — no rounding
                energies.append(sum(chunk) / len(chunk))
        yield pd.DataFrame(
            {"doc_id": ids, "chunk_idx": idxs, "energy": energies}
        ).astype({"doc_id": "int64", "chunk_idx": "int64"})


@query(
    "multimodal_chunk_energy",
    oracle=f"""
WITH b AS (
  SELECT doc_id, hex(encode(text)) AS h, octet_length(encode(text)) AS n
  FROM documents
),
chunks AS (
  SELECT doc_id,
         unnest(generate_series(0, (n - 1) // {CHUNK_BYTES})) AS chunk_idx,
         h, n
  FROM b
)
SELECT doc_id, chunk_idx::BIGINT AS chunk_idx,
       list_sum(list_transform(
               generate_series(1, least(n - chunk_idx * {CHUNK_BYTES}, {CHUNK_BYTES})),
               i -> ('0x' || substr(h, (chunk_idx * {CHUNK_BYTES} + i - 1) * 2 + 1, 2))::INT))
             / least(n - chunk_idx * {CHUNK_BYTES}, {CHUNK_BYTES})::DOUBLE AS energy
FROM chunks
""",
)
def multimodal_chunk_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-analog chunked energy over binary payloads via mapInPandas
    (mean byte value per 256-byte window); the oracle recomputes each
    chunk's byte sum from hex."""
    d = load_spread(spark, sf_dir, "documents")
    payloads = d.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    return payloads.mapInPandas(
        _energy_batches, schema="doc_id long, chunk_idx long, energy double"
    )
