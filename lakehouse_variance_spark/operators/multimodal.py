"""Multimodal (binary) column operators for training-data pipelines.

Treats image/audio/video payloads as opaque ``binary`` columns with typed
metadata (the BASELINE north-star extension — no reference citation by
definition, SURVEY.md §2A "North-star extension operators"). The synthetic
corpus has no real media, so payloads are derived deterministically from the
``documents`` table; the Spark-side plumbing — binary schema, metadata
structs, Arrow-batched ``mapInPandas`` decode, per-frame explosion — is real
and is exactly what a 100 TB media pipeline runs, with the codec call swapped
in at the marked stub.

Scale notes: payload bytes never pass through Python row-at-a-time — the
only Python is Arrow-batched pandas; metadata extraction is pure JVM column
expressions, so filters on metadata (``width > 512``) push down BEFORE any
decode, which is the whole game when decode dominates cost.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_variance_spark.registry import register
from lakehouse_variance_spark.tables import load_table, spread

FRAME_BYTES = 32  # fake fixed-size "frame" within a payload
FRAME_STRIDE = 4  # sample every 4th frame


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, media binary, meta struct) — the multimodal data model.

    Payload = UTF-8 bytes of the document text (deterministic stand-in for
    e.g. a JPEG); metadata is a typed struct as a real pipeline would carry
    (format tag, nominal dims derived from the payload length).
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    media = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        media.alias("media"),
        F.struct(
            F.element_at(
                F.array(F.lit("jpeg"), F.lit("png"), F.lit("wav")),
                (F.pmod("doc_id", F.lit(3)) + 1).cast("int"),
            ).alias("format"),
            F.octet_length(media).alias("n_bytes"),
            (F.pmod("doc_id", F.lit(4)) * 160 + 320).alias("width"),
            (F.pmod("doc_id", F.lit(4)) * 90 + 180).alias("height"),
        ).alias("meta"),
    )


@register(
    "multimodal_metadata",
    oracle="""
    SELECT doc_id,
           (['jpeg', 'png', 'wav'])[CAST(doc_id % 3 AS INT) + 1] AS format,
           octet_length(encode(text)) AS n_bytes,
           CAST(doc_id % 4 AS BIGINT) * 160 + 320 AS width,
           CAST(doc_id % 4 AS BIGINT) * 90 + 180 AS height,
           CAST(floor(octet_length(encode(text)) / 32) AS BIGINT) AS n_frames
    FROM documents
    """,
)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata extraction over binary media columns: pure JVM expressions
    (octet_length, struct field access) — the predicate-pushdown-friendly
    layer that runs BEFORE any decode at scale."""
    m = media_table(spark, sf_dir)
    return m.select(
        "doc_id",
        F.col("meta.format").alias("format"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.floor(F.octet_length("media") / FRAME_BYTES).alias("n_frames"),
    )


def _decode_frames(payload: bytes) -> list[tuple[int, bytes]]:
    """STUB decode: a real pipeline calls the codec here (PIL / ffmpeg /
    soundfile — not installed in this environment). The deterministic fake
    splits the payload into fixed 32-byte frames and samples every 4th, so
    the distributed plumbing (batch shapes, per-frame fan-out) is fully
    exercised and testable."""
    frames = []
    for idx, off in enumerate(range(0, len(payload) - FRAME_BYTES + 1, FRAME_BYTES)):
        if idx % FRAME_STRIDE == 0:
            frames.append((idx, payload[off : off + FRAME_BYTES]))
    return frames


def decode_real_image(payload: bytes) -> Any:
    """The real decode hook, gated on the codec library being installed."""
    try:
        from PIL import Image  # noqa: PLC0415
        import io  # noqa: PLC0415
    except ImportError as exc:  # pragma: no cover - PIL absent here
        raise NotImplementedError(
            "image decode requires PIL, which is not installed; "
            "media_frame_sample uses the deterministic stub instead"
        ) from exc
    return Image.open(io.BytesIO(payload))  # pragma: no cover


def frame_sample(media: DataFrame) -> DataFrame:
    """Explode each media payload into sampled frames via Arrow-batched
    ``mapInPandas`` — the multimodal decode/fan-out pattern. One output row
    per sampled frame with a content hash for downstream dedup."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"doc_id": [], "frame_idx": [], "frame": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["media"]):
                for idx, frame in _decode_frames(bytes(payload)):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(idx)
                    out["frame"].append(frame)
            yield pd.DataFrame(out)

    frames = media.select("doc_id", "media").mapInPandas(
        sample, "doc_id long, frame_idx long, frame binary"
    )
    return frames.withColumn("frame_hash", F.xxhash64("frame"))


@register(
    "media_frame_sample",
    oracle="""
    WITH payloads AS (
        SELECT doc_id, text, encode(text) AS media FROM documents
    ),
    frames AS (
        SELECT doc_id, text,
               unnest(generate_series(0,
                   CAST(floor(octet_length(media) / 32) AS BIGINT) - 1))
                   AS frame_idx
        FROM payloads
    )
    SELECT doc_id, frame_idx,
           substring(text, CAST(frame_idx * 32 + 1 AS BIGINT), 32) AS frame_text
    FROM frames
    WHERE frame_idx % 4 = 0
    """,
)
def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over binary media via mapInPandas (decode stub): every
    4th fixed-size frame, one row per frame. The oracle re-derives the frame
    fan-out relationally (generate_series over payload length; the corpus is
    ASCII so byte frames decode to the matching character slices)."""
    frames = frame_sample(media_table(spark, sf_dir))
    return frames.select(
        "doc_id", "frame_idx", F.decode(F.col("frame"), "UTF-8").alias("frame_text")
    )


# ---------------------------------------------------------------------------
# Feature extraction + resize plumbing
# ---------------------------------------------------------------------------

N_HIST_BINS = 16
TARGET_BYTES = 256


def feature_extract(media: DataFrame, rounded: bool = True) -> DataFrame:
    """Fixed-width feature vector per payload via Arrow-batched mapInPandas:
    a 16-bin byte histogram (normalized) plus mean/std byte value — the
    embedding-stage stand-in. A real pipeline swaps the histogram for a
    model forward pass; the distributed shape (binary in, ``array<double>``
    out, vectorized batches, no per-row Python) is identical.

    ``rounded=False`` keeps raw IEEE values: the histogram dims are then
    exact ``count/n`` quotients — correctly-rounded division of the same
    integers any engine computes, hence bit-reproducible (the oracle-checked
    projection below relies on this). The mean/std tail dims involve
    re-associated float sums, so consumers compare those with tolerance."""
    import numpy as np

    def features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, feats = [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["media"]):
                arr = np.frombuffer(bytes(payload), dtype=np.uint8)
                n = max(len(arr), 1)
                hist = np.bincount(arr >> 4, minlength=N_HIST_BINS) / n
                vec = np.concatenate(
                    [hist, [arr.mean() if len(arr) else 0.0, arr.std() if len(arr) else 0.0]]
                )
                ids.append(doc_id)
                feats.append((np.round(vec, 6) if rounded else vec).tolist())
            yield pd.DataFrame({"doc_id": ids, "features": feats})

    return media.select("doc_id", "media").mapInPandas(
        features, "doc_id long, features array<double>"
    )


@register(
    "media_feature_extract",
    oracle=f"""
    WITH bytes AS (
        SELECT doc_id,
               octet_length(encode(text)) AS n,
               ascii(substring(text,
                     CAST(unnest(generate_series(1, octet_length(encode(text))))
                          AS INT), 1)) // 16 AS nibble
        FROM documents),
    dims AS (SELECT d.i AS dim_idx FROM generate_series(0, {N_HIST_BINS - 1}) d(i))
    SELECT b.doc_id,
           d.dim_idx,
           count(*) FILTER (WHERE b.nibble = d.dim_idx) * 1.0 / any_value(b.n)
               AS value
    FROM bytes b CROSS JOIN dims d
    GROUP BY b.doc_id, d.dim_idx
    """,
)
def media_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-payload feature vectors, exploded to scalar (doc_id, dim_idx,
    value) rows — the histogram dims only, UNROUNDED, because each is the
    exact IEEE quotient count/n of integers both engines derive from the
    same bytes (the corpus is ASCII, so the oracle re-counts high nibbles
    relationally). The full vector incl. mean/std stays internal via
    feature_extract — similarity.py consumes it directly; determinism and
    shape asserted in tests/test_multimodal.py. At 100 TB this is the
    GPU/codec stage: mapInPandas keeps it Arrow-batched and embarrassingly
    parallel."""
    feats = feature_extract(media_table(spark, sf_dir), rounded=False)
    return feats.select(
        "doc_id", F.posexplode("features").alias("dim_idx", "value")
    ).filter(F.col("dim_idx") < N_HIST_BINS)


def resize_payload(media: DataFrame, target_bytes: int = TARGET_BYTES) -> DataFrame:
    """Resize stub: clamp/pad every payload to a fixed byte budget and update
    the metadata struct to match — JVM-side substring/rpad on binary-as-text,
    no Python. A real image resize swaps in a codec UDF; the schema contract
    (payload replaced, meta rewritten in place, everything else untouched)
    is what downstream stages depend on."""
    clamped = F.substring(F.col("media"), 1, target_bytes)
    resized = F.when(
        F.octet_length("media") >= target_bytes, clamped
    ).otherwise(F.encode(F.rpad(F.decode("media", "UTF-8"), target_bytes, " "), "UTF-8"))
    return media.withColumn("media", resized).withColumn(
        "meta",
        F.struct(
            F.col("meta.format").alias("format"),
            F.octet_length("media").alias("n_bytes"),
            F.lit(TARGET_BYTES).alias("width"),
            F.lit(1).alias("height"),
        ),
    )


@register(
    "media_resize",
    oracle="""
    SELECT doc_id,
           CAST(length(text) >= 256 AS BOOLEAN) AS clamped,
           256 AS n_bytes,
           md5(CASE WHEN length(text) >= 256 THEN substring(text, 1, 256)
                    ELSE text || repeat(' ', 256 - length(text)) END)
               AS content_md5
    FROM documents
    """,
)
def media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing as a first-class pipeline stage: every payload
    clamped/padded to the 256-byte budget with its metadata struct rewritten
    (resize_payload), verified content-exactly via an md5 of the resized
    bytes (the corpus is ASCII, so the DuckDB string md5 hashes the same
    bytes Spark's binary md5 sees).

    The byte surgery is all JVM substring/rpad — a real codec swaps in at
    the same spot as an Arrow-batched UDF; the schema contract (payload
    replaced, meta rewritten, other columns untouched) is what this query
    pins down."""
    m = media_table(spark, sf_dir).withColumn(
        "clamped", F.octet_length("media") >= TARGET_BYTES
    )
    resized = resize_payload(m)
    return resized.select(
        "doc_id",
        "clamped",
        F.col("meta.n_bytes").cast("int").alias("n_bytes"),
        F.md5("media").alias("content_md5"),
    )
