"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata,
feature extraction via ``mapInPandas`` over Arrow batches.

The reference has no media handling; this is part of the training-data
pipeline surface (image/audio/video as binary columns). The container has
no image/audio codecs, so the *decode* step is a clearly-marked
deterministic stub (:func:`fake_decode`) — everything Spark-side (schema,
binary column handling, Arrow batch shape, partition-parallel extraction)
is real and tested. Swapping ``fake_decode`` for e.g. PIL/libsndfile is a
one-function change; the plumbing does not move.

At 100 TB the payloads dominate: ``synthesize_media`` keeps payloads in a
single binary column so Parquet stores them contiguously, and
``extract_features`` never shuffles — it is a narrow mapInPandas over the
scan, so feature extraction scales linearly with partitions.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "media_id long, mime string, n_bytes long, width int, height int, "
    "channel_mean double"
)

# Knuth multiplicative constant — only used to derive a deterministic fake
# pixel statistic from the payload bytes
_MIX = 2654435761


def synthesize_media(spark: SparkSession, documents_path: str) -> DataFrame:
    """Deterministic fake media table from ``documents.parquet``:
    (media_id, mime, payload:binary, meta:struct<n_bytes,source>).

    payload = utf-8 bytes of the document text standing in for encoded
    image bytes; mime cycles by doc_id.
    """
    docs = spark.read.parquet(documents_path)
    mime = F.element_at(
        F.array(F.lit("image/png"), F.lit("image/jpeg"), F.lit("audio/wav")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    payload = F.encode(F.col("text"), "utf-8")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        mime.alias("mime"),
        payload.alias("payload"),
        F.struct(
            F.octet_length(payload).cast("long").alias("n_bytes"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


def fake_decode(payload: bytes) -> dict:
    """STUB decoder. A real deployment replaces this with an actual codec
    (PIL.Image.open / soundfile.read — not installed in this container).
    Deterministic so tests and the DuckDB oracle can replicate it from
    byte length alone."""
    n = len(payload)
    return {
        "n_bytes": n,
        "width": n % 640,
        "height": n % 480,
        "channel_mean": float((n * _MIX) % 255),
    }


def extract_features(media: DataFrame) -> DataFrame:
    """Per-partition feature extraction over Arrow batches — the shape a
    real decoder would use (batched bytes in, typed features out), with
    no shuffle: a narrow map over the media scan."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [fake_decode(p) for p in pdf["payload"]]
            out = pd.DataFrame(feats)
            out.insert(0, "media_id", pdf["media_id"].to_numpy())
            out.insert(1, "mime", pdf["mime"].to_numpy())
            yield out

    return media.select("media_id", "mime", "payload").mapInPandas(
        extract, schema=FEATURE_SCHEMA
    )


RESIZE_CAP = 1024   # stub "resize": payload truncated to <= RESIZE_CAP bytes
FRAME_BYTES = 256   # stub "frame": fixed-size payload chunk
FRAME_EVERY = 2     # sample every 2nd frame


def resize_media(media: DataFrame, cap: int = RESIZE_CAP) -> DataFrame:
    """Stub resize: binary in → binary out over Arrow batches (a real
    deployment decodes, scales, re-encodes inside the same mapInPandas).
    Narrow map, no shuffle; payload bytes really are transformed."""

    def resize(batches):
        for pdf in batches:
            out = pdf[["media_id", "mime"]].copy()
            resized = [bytes(p[:cap]) for p in pdf["payload"]]
            out["payload"] = resized
            out["n_bytes_out"] = [len(p) for p in resized]
            yield out

    return media.select("media_id", "mime", "payload").mapInPandas(
        resize, schema="media_id long, mime string, payload binary, n_bytes_out long"
    )


def sample_frames(
    media: DataFrame, frame_bytes: int = FRAME_BYTES, every: int = FRAME_EVERY
) -> DataFrame:
    """Stub frame sampling: chunk the payload into fixed-size 'frames' and
    keep every ``every``-th one (a real deployment seeks keyframes with a
    codec in the same batched loop). One input row fans out to many frame
    rows — still a narrow map, the explode happens inside the Arrow batch."""

    def frames(batches):
        for pdf in batches:
            ids, idxs, blobs = [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                n_frames = (len(p) + frame_bytes - 1) // frame_bytes
                for i in range(0, n_frames, every):
                    ids.append(mid)
                    idxs.append(i)
                    blobs.append(bytes(p[i * frame_bytes:(i + 1) * frame_bytes]))
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame": blobs}
            )

    return media.select("media_id", "payload").mapInPandas(
        frames, schema="media_id long, frame_idx int, frame binary"
    )


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = synthesize_media(spark, f"{sf_dir}/documents.parquet")
    return extract_features(media).orderBy("media_id")


def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing; binary payload dropped from the result so the
    DuckDB twin can verify the metadata exactly."""
    media = synthesize_media(spark, f"{sf_dir}/documents.parquet")
    return (
        resize_media(media)
        .select("media_id", "mime", "n_bytes_out")
        .orderBy("media_id")
    )


def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = synthesize_media(spark, f"{sf_dir}/documents.parquet")
    return (
        sample_frames(media)
        .select(
            "media_id",
            "frame_idx",
            F.octet_length("frame").cast("long").alias("frame_bytes"),
        )
        .orderBy("media_id", "frame_idx")
    )


SQL_MULTIMODAL_RESIZE = f"""
SELECT doc_id AS media_id,
       CASE doc_id % 3 WHEN 0 THEN 'image/png' WHEN 1 THEN 'image/jpeg'
            ELSE 'audio/wav' END AS mime,
       CAST(least(octet_length(encode(text)), {RESIZE_CAP}) AS BIGINT) AS n_bytes_out
FROM documents ORDER BY media_id
"""

SQL_MULTIMODAL_FRAMES = f"""
WITH m AS (
  SELECT doc_id AS media_id, octet_length(encode(text)) AS n FROM documents
)
SELECT media_id,
       CAST(i AS INT) AS frame_idx,
       CAST(least(n - i * {FRAME_BYTES}, {FRAME_BYTES}) AS BIGINT) AS frame_bytes
FROM (
  SELECT media_id, n,
         unnest(generate_series(0, CAST(ceil(n / {FRAME_BYTES}.0) AS BIGINT) - 1)) AS i
  FROM m WHERE n > 0
)
WHERE i % {FRAME_EVERY} = 0
ORDER BY media_id, frame_idx
"""

SQL_MULTIMODAL_FEATURES = f"""
SELECT doc_id AS media_id,
       CASE doc_id % 3 WHEN 0 THEN 'image/png' WHEN 1 THEN 'image/jpeg'
            ELSE 'audio/wav' END AS mime,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST(octet_length(encode(text)) % 640 AS INT) AS width,
       CAST(octet_length(encode(text)) % 480 AS INT) AS height,
       CAST((octet_length(encode(text)) * {_MIX}) % 255 AS DOUBLE) AS channel_mean
FROM documents ORDER BY media_id
"""
