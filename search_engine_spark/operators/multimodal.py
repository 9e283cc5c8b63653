"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata,
feature extraction via ``mapInPandas`` over Arrow batches.

The reference has no media handling; this is part of the training-data
pipeline surface (image/audio/video as binary columns). Two tiers live
here:

* **Real codecs** (``..functions.codecs`` — pure stdlib zlib/wave/struct,
  no third-party libs): the ``*_real`` operators below synthesize REAL
  PNG / WAV payloads, push them through Arrow binary columns, and decode
  them back — width/height/pixel sums and sample stats are verified
  against closed-form DuckDB oracles, so a wrong inflate, unfilter,
  resize index, or PCM parse fails the hash. This closes the former
  fake-decode gap for image + audio.
* **Stub tier** (:func:`fake_decode` et al., kept below): the original
  byte-length-deterministic plumbing stubs, retained for the formats the
  stdlib genuinely cannot parse (video containers, JPEG). Swapping
  ``fake_decode`` for a production codec is a one-function change; the
  plumbing does not move.

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


# ---------------------------------------------------------------------------
# Real-codec tier: genuine PNG / WAV bytes through Arrow binary columns.
#
# Synthesis is a deterministic closed form of doc_id ONLY, so the DuckDB
# oracle can recompute every pixel/sample without ever seeing the bytes —
# the Spark path must encode (zlib deflate + per-row PNG filters / RIFF
# PCM) and then DECODE those bytes to reproduce the same sums. Integer
# sums keep the strict hash exact; the only doubles are single divisions
# of exactly-representable ints (bitwise identical in Python and DuckDB).
#
# Scale shape: both stages are narrow mapInPandas over the documents scan
# (no shuffle, no collect); payloads live in one binary column so Parquet
# stores them contiguously. At 100 TB the decode batch loop is the same —
# only the codec body would swap for libpng/libsndfile.
# ---------------------------------------------------------------------------

IMG_W_BASE, IMG_W_MOD = 16, 17   # width  = 16 + doc_id % 17  (16..32)
IMG_H_BASE, IMG_H_MOD = 12, 13   # height = 12 + doc_id % 13  (12..24)
AUD_N_BASE, AUD_N_STEP, AUD_N_MOD = 256, 64, 7   # n = 256 + (doc_id%7)*64
AUD_RATE_BASE = 8000             # rate = 8000 * (1 + doc_id % 2)
AUD_FRAME = 160                  # samples per analysis frame
AUD_FRAME_EVERY = 2              # keep every 2nd frame


def _synth_image(doc_id: int):
    import numpy as np

    w = IMG_W_BASE + doc_id % IMG_W_MOD
    h = IMG_H_BASE + doc_id % IMG_H_MOD
    x = np.arange(w)[None, :, None]
    y = np.arange(h)[:, None, None]
    c = np.arange(3)[None, None, :]
    return ((7 * doc_id + 5 * x + 3 * y + 11 * c) % 256).astype("uint8")


def _synth_audio(doc_id: int):
    import numpy as np

    n = AUD_N_BASE + (doc_id % AUD_N_MOD) * AUD_N_STEP
    i = np.arange(n)
    return (((31 * doc_id + 17 * i) % 4096) - 2048).astype("int16"), \
        AUD_RATE_BASE * (1 + doc_id % 2)


def synthesize_media_real(
    spark: SparkSession, documents_path: str, kind: str
) -> DataFrame:
    """(media_id, payload:binary) with REAL encoded bytes: PNG for
    ``kind='image'`` (even doc ids), WAV for ``kind='audio'`` (odd).
    Narrow mapInPandas over a pruned single-column scan."""
    from ..functions import codecs

    parity = 0 if kind == "image" else 1
    docs = (
        spark.read.parquet(documents_path)
        .select("doc_id")
        .filter(F.col("doc_id") % 2 == parity)
    )

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].to_numpy()
            if kind == "image":
                blobs = [codecs.png_encode(_synth_image(int(d))) for d in ids]
            else:
                blobs = [
                    codecs.wav_encode(*_synth_audio(int(d))) for d in ids
                ]
            yield pd.DataFrame({"media_id": ids, "payload": blobs})

    return docs.mapInPandas(encode, schema="media_id long, payload binary")


def q_multimodal_image_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode real PNG payloads back to pixels; report exact pixel sums.
    A wrong signature parse, CRC check, inflate, or unfilter (all five
    PNG filter types appear — encoder cycles them per row) breaks the
    hash vs the closed-form oracle."""
    from ..functions import codecs

    media = synthesize_media_real(spark, f"{sf_dir}/documents.parquet",
                                  "image")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            cols = {
                "media_id": np.empty(len(pdf), dtype="int64"),
                "width": np.empty(len(pdf), dtype="int32"),
                "height": np.empty(len(pdf), dtype="int32"),
                "n_pixels": np.empty(len(pdf), dtype="int64"),
                "pixel_sum": np.empty(len(pdf), dtype="int64"),
                "channel_mean": np.empty(len(pdf), dtype="float64"),
            }
            # typed columns up front (not list-of-tuples): an EMPTY
            # Arrow batch then yields correctly-dtyped empty columns
            # instead of relying on lenient object->long coercion
            for i, (mid, blob) in enumerate(
                zip(pdf["media_id"], pdf["payload"])
            ):
                img = codecs.png_decode(bytes(blob))
                h, w, ch = img.shape
                ps = int(img.sum(dtype=np.int64))
                npx = w * h * ch
                cols["media_id"][i] = int(mid)
                cols["width"][i] = w
                cols["height"][i] = h
                cols["n_pixels"][i] = npx
                cols["pixel_sum"][i] = ps
                cols["channel_mean"][i] = ps / npx
            yield pd.DataFrame(cols)

    return (
        media.mapInPandas(
            decode,
            schema="media_id long, width int, height int, n_pixels long, "
                   "pixel_sum long, channel_mean double",
        ).orderBy("media_id")
    )


def q_multimodal_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full real round trip: decode PNG → nearest-neighbor resize to half
    dimensions → re-encode → decode again → exact sums of the resized
    pixels. Verifies both codec directions AND the resize index math
    against the oracle's replication of floor(dst*src/dstdim)."""
    from ..functions import codecs

    media = synthesize_media_real(spark, f"{sf_dir}/documents.parquet",
                                  "image")

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["payload"]):
                img = codecs.png_decode(bytes(blob))
                h, w = img.shape[:2]
                w2, h2 = max(1, w // 2), max(1, h // 2)
                small = codecs.png_decode(
                    codecs.png_encode(codecs.resize_nearest(img, w2, h2))
                )
                ps = int(small.sum(dtype=np.int64))
                rows.append((int(mid), w2, h2, ps, ps / (w2 * h2 * 3)))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "width", "height", "pixel_sum",
                         "channel_mean"],
            )

    return (
        media.mapInPandas(
            resize,
            schema="media_id long, width int, height int, pixel_sum long, "
                   "channel_mean double",
        ).orderBy("media_id")
    )


def q_multimodal_audio_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode real RIFF/PCM WAV payloads; exact sample stats. duration_ms
    is the single exact division n*1000/rate (bitwise reproducible)."""
    from ..functions import codecs

    media = synthesize_media_real(spark, f"{sf_dir}/documents.parquet",
                                  "audio")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["payload"]):
                samples, rate = codecs.wav_decode(bytes(blob))
                sabs = int(np.abs(samples.astype(np.int64)).sum())
                rows.append((int(mid), rate, len(samples), sabs,
                             len(samples) * 1000 / rate))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "sample_rate", "n_samples",
                         "sample_abs_sum", "duration_ms"],
            )

    return (
        media.mapInPandas(
            decode,
            schema="media_id long, sample_rate int, n_samples long, "
                   "sample_abs_sum long, duration_ms double",
        ).orderBy("media_id")
    )


def q_multimodal_audio_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real frame sampling over decoded PCM: fixed windows of AUD_FRAME
    samples (partial tail kept), every AUD_FRAME_EVERY-th frame, exact
    abs-sum per frame. One media row fans out to many frame rows inside
    the Arrow batch — still a narrow map."""
    from ..functions import codecs

    media = synthesize_media_real(spark, f"{sf_dir}/documents.parquet",
                                  "audio")

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, idxs, lens, sums = [], [], [], []
            for mid, blob in zip(pdf["media_id"], pdf["payload"]):
                samples, _rate = codecs.wav_decode(bytes(blob))
                absd = np.abs(samples.astype(np.int64))
                n_frames = (len(samples) + AUD_FRAME - 1) // AUD_FRAME
                for fi in range(0, n_frames, AUD_FRAME_EVERY):
                    seg = absd[fi * AUD_FRAME:(fi + 1) * AUD_FRAME]
                    ids.append(int(mid))
                    idxs.append(fi)
                    lens.append(len(seg))
                    sums.append(int(seg.sum()))
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_len": lens,
                 "frame_abs_sum": sums}
            )

    return (
        media.mapInPandas(
            frames,
            schema="media_id long, frame_idx int, frame_len int, "
                   "frame_abs_sum long",
        ).orderBy("media_id", "frame_idx")
    )


_SQL_IMG_BASE = f"""
  SELECT doc_id, {IMG_W_BASE} + doc_id % {IMG_W_MOD} AS w,
         {IMG_H_BASE} + doc_id % {IMG_H_MOD} AS h
  FROM documents WHERE doc_id % 2 = 0
"""

SQL_MULTIMODAL_IMAGE_DECODE = f"""
WITH img AS ({_SQL_IMG_BASE}),
xs AS (SELECT doc_id, w, h,
              unnest(generate_series(0, CAST(w AS BIGINT) - 1)) AS x
       FROM img),
xy AS (SELECT doc_id, w, h, x,
              unnest(generate_series(0, CAST(h AS BIGINT) - 1)) AS y
       FROM xs),
px AS (SELECT doc_id, w, h,
              SUM((7*doc_id + 5*x + 3*y) % 256
                  + (7*doc_id + 5*x + 3*y + 11) % 256
                  + (7*doc_id + 5*x + 3*y + 22) % 256) AS ps
       FROM xy GROUP BY doc_id, w, h)
SELECT doc_id AS media_id,
       CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       CAST(w * h * 3 AS BIGINT) AS n_pixels,
       CAST(ps AS BIGINT) AS pixel_sum,
       CAST(ps AS DOUBLE) / (w * h * 3) AS channel_mean
FROM px ORDER BY media_id
"""

SQL_MULTIMODAL_IMAGE_RESIZE = f"""
WITH img AS ({_SQL_IMG_BASE}),
dims AS (SELECT doc_id, w, h,
                greatest(1, w // 2) AS w2, greatest(1, h // 2) AS h2
         FROM img),
xs AS (SELECT doc_id, w, h, w2, h2,
              unnest(generate_series(0, CAST(w2 AS BIGINT) - 1)) AS x2
       FROM dims),
xy AS (SELECT doc_id, w, h, w2, h2, x2,
              unnest(generate_series(0, CAST(h2 AS BIGINT) - 1)) AS y2
       FROM xs),
src AS (SELECT doc_id, w2, h2,
               (x2 * w) // w2 AS sx, (y2 * h) // h2 AS sy
        FROM xy),
px AS (SELECT doc_id, w2, h2,
              SUM((7*doc_id + 5*sx + 3*sy) % 256
                  + (7*doc_id + 5*sx + 3*sy + 11) % 256
                  + (7*doc_id + 5*sx + 3*sy + 22) % 256) AS ps
       FROM src GROUP BY doc_id, w2, h2)
SELECT doc_id AS media_id,
       CAST(w2 AS INT) AS width, CAST(h2 AS INT) AS height,
       CAST(ps AS BIGINT) AS pixel_sum,
       CAST(ps AS DOUBLE) / (w2 * h2 * 3) AS channel_mean
FROM px ORDER BY media_id
"""

_SQL_AUD_BASE = f"""
  SELECT doc_id,
         {AUD_N_BASE} + (doc_id % {AUD_N_MOD}) * {AUD_N_STEP} AS n,
         {AUD_RATE_BASE} * (1 + doc_id % 2) AS rate
  FROM documents WHERE doc_id % 2 = 1
"""

SQL_MULTIMODAL_AUDIO_DECODE = f"""
WITH aud AS ({_SQL_AUD_BASE}),
s AS (SELECT doc_id, n, rate,
             unnest(generate_series(0, CAST(n AS BIGINT) - 1)) AS i
      FROM aud)
SELECT doc_id AS media_id,
       CAST(rate AS INT) AS sample_rate,
       CAST(n AS BIGINT) AS n_samples,
       CAST(SUM(ABS(((31*doc_id + 17*i) % 4096) - 2048)) AS BIGINT)
           AS sample_abs_sum,
       CAST(n * 1000 AS DOUBLE) / rate AS duration_ms
FROM s GROUP BY doc_id, n, rate ORDER BY media_id
"""

SQL_MULTIMODAL_AUDIO_FRAMES = f"""
WITH aud AS ({_SQL_AUD_BASE}),
s AS (SELECT doc_id, unnest(generate_series(0, CAST(n AS BIGINT) - 1)) AS i
      FROM aud)
SELECT doc_id AS media_id,
       CAST(i // {AUD_FRAME} AS INT) AS frame_idx,
       CAST(COUNT(*) AS INT) AS frame_len,
       CAST(SUM(ABS(((31*doc_id + 17*i) % 4096) - 2048)) AS BIGINT)
           AS frame_abs_sum
FROM s
WHERE (i // {AUD_FRAME}) % {AUD_FRAME_EVERY} = 0
GROUP BY doc_id, i // {AUD_FRAME}
ORDER BY media_id, frame_idx
"""
