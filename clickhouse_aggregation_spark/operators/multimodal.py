"""Multimodal-column plumbing (beyond-reference surface).

Media (image/audio/video) are carried as opaque ``binary`` payload
columns with typed metadata — the pattern a 100 TB multimodal training
pipeline needs: the engine moves/filters/partitions bytes and runs
decode / feature-extraction as Arrow-batched Pandas stages via
``mapInPandas``, never row-at-a-time Python.

The container has no image/audio libraries, so the *decode* step is a
clearly-marked stub (``decode_media`` raises ``NotImplementedError``
unless a real decoder is importable); the Spark-side plumbing — binary
schema, mapInPandas batch shape, deterministic byte-level feature
extraction — is real and tested (tests/test_multimodal.py).

Payloads are synthesized from documents.text (UTF-8 bytes) so the
pipeline runs on driver fixtures; a real deployment swaps the source
for parquet/tar shards of actual media bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from ..sources.tables import ensure_parallelism, load_table
from .registry import register

KINDS = ("image", "audio", "video")

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("n_bytes", T.IntegerType(), False),
    T.StructField("header_u32", T.LongType(), True),
    T.StructField("low_byte_count", T.LongType(), True),
    T.StructField("low_byte_ratio", T.DoubleType(), True),
])


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → media(media_id, kind, payload binary, meta)."""
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(F.array(*[F.lit(k) for k in KINDS]),
                     (F.col("doc_id") % 3 + 1).cast("int")).alias("kind"),
        F.col("text").cast("binary").alias("payload"),
        F.struct(F.col("source").alias("origin"),
                 F.col("n_chars").alias("declared_len")).alias("meta"),
    )


def decode_media(payload: bytes, kind: str):
    """STUB: real decoders (PIL / soundfile / pyav) are not in this
    container. The import-try keeps the operator runnable where they
    exist; everywhere else the decode stage is explicit about being
    unavailable rather than silently fake."""
    if kind == "image":
        try:
            from PIL import Image  # noqa: F401
        except ImportError:
            raise NotImplementedError(
                "image decode requires PIL; container ships without it")
        raise NotImplementedError("wire PIL.Image.open(BytesIO(payload)) here")
    raise NotImplementedError(f"no decoder for kind={kind!r} in this container")


def _extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched byte-level feature extraction (the stage that would
    call ``decode_media`` in a full deployment). Deterministic: header
    word big-endian, low-byte ratio as exact fraction."""
    for pdf in batches:
        payloads = pdf["payload"]
        n_bytes = payloads.map(len)
        header = payloads.map(
            lambda b: int.from_bytes(b[:4], "big") if len(b) >= 4 else None)
        low_count = payloads.map(lambda b: sum(1 for x in b if x < 0x70))
        low_ratio = low_count / n_bytes.map(lambda n: n if n else None)
        yield pd.DataFrame({
            "media_id": pdf["media_id"],
            "kind": pdf["kind"],
            "n_bytes": n_bytes.astype("int32"),
            "header_u32": header,
            "low_byte_count": low_count,
            "low_byte_ratio": low_ratio,
        })


@register(
    "multimodal_payload_stats",
    oracle="""
SELECT CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image'
            WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
       count(*) AS n_media,
       CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
       CAST(min(octet_length(encode(text))) AS BIGINT) AS min_bytes,
       CAST(max(octet_length(encode(text))) AS BIGINT) AS max_bytes
FROM documents
GROUP BY 1""",
    doc="Typed-metadata rollup over the opaque binary payload column: "
        "byte accounting per media kind (the planning query a media "
        "pipeline runs before fanning out decode jobs).",
)
def q_multimodal_payload_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = media_table(spark, sf_dir)
    return (
        media.groupBy("kind")
        .agg(F.count(F.lit(1)).alias("n_media"),
             F.sum(F.octet_length("payload")).alias("total_bytes"),
             F.min(F.octet_length("payload")).cast("long").alias("min_bytes"),
             F.max(F.octet_length("payload")).cast("long").alias("max_bytes"))
    )


@register(
    "multimodal_feature_extract",
    # The byte-level features ARE deterministic and SQL-expressible, so
    # the mapInPandas stage gets a full value oracle (only the stubbed
    # media decode genuinely isn't). documents.text is pure ASCII in the
    # driver fixtures (verified: octet_length(encode(text)) = length(text)
    # for every row at every SF), so ord(char) = byte value.
    oracle="""
SELECT doc_id AS media_id,
       CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image'
            WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
       CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
       CASE WHEN length(text) >= 4 THEN
         CAST(ord(substr(text,1,1)) AS BIGINT) * 16777216
         + ord(substr(text,2,1)) * 65536
         + ord(substr(text,3,1)) * 256
         + ord(substr(text,4,1)) END AS header_u32,
       CAST(length(text)
            - length(regexp_replace(text, '[\\x00-\\x6f]', '', 'g'))
            AS BIGINT) AS low_byte_count,
       CAST(length(text)
            - length(regexp_replace(text, '[\\x00-\\x6f]', '', 'g'))
            AS DOUBLE)
         / CAST(octet_length(encode(text)) AS DOUBLE) AS low_byte_ratio
FROM documents""",
    doc="mapInPandas feature extraction over binary payloads: Arrow "
        "batches in, typed feature rows out. The decode hook is the "
        "stubbed decode_media; byte-level features are real and "
        "value-checked against a DuckDB byte-function oracle.",
    tags=("pandas-udf",),
)
def q_multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = media_table(spark, sf_dir)
    return media.mapInPandas(_extract_features, schema=FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# frame sampling: 1:N row expansion over binary payloads

FRAME_STRIDE = 64      # bytes between sampled frames
FRAME_LEN = 16         # bytes per sampled frame
MAX_FRAMES = 8         # cap per media item
FP_LEN = 8             # fingerprint = hex of the frame's first 8 bytes

FRAME_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("frame_idx", T.IntegerType(), False),
    T.StructField("frame_off", T.LongType(), False),
    T.StructField("frame_len", T.IntegerType(), False),
    T.StructField("fp", T.StringType(), False),
])


def _sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched 1:N frame sampling — the stage that would call a
    video decoder's keyframe iterator; here frames are deterministic
    byte windows (stride 64, 16 bytes) so the plumbing (binary in,
    multiple typed rows out) is real and value-checkable."""
    for pdf in batches:
        out: dict[str, list] = {k: [] for k in
                                ("media_id", "frame_idx", "frame_off",
                                 "frame_len", "fp")}
        for mid, payload in zip(pdf["media_id"], pdf["payload"]):
            b = bytes(payload)
            n = len(b)
            for i in range(min(MAX_FRAMES,
                               (n + FRAME_STRIDE - 1) // FRAME_STRIDE)):
                off = i * FRAME_STRIDE
                out["media_id"].append(int(mid))
                out["frame_idx"].append(i)
                out["frame_off"].append(off)
                out["frame_len"].append(min(FRAME_LEN, n - off))
                out["fp"].append(b[off:off + FP_LEN].hex().upper())
        yield pd.DataFrame(out).astype(
            {"media_id": "int64", "frame_idx": "int32",
             "frame_off": "int64", "frame_len": "int32", "fp": "object"})


@register(
    "multimodal_frame_sample",
    # documents.text is pure ASCII in the driver fixtures (see
    # multimodal_feature_extract), so byte windows == char windows
    oracle=f"""
WITH vids AS (
  SELECT doc_id, text, octet_length(encode(text)) AS len
  FROM documents WHERE CAST(doc_id % 3 AS INTEGER) = 2
),
frames AS (
  SELECT doc_id, len, text,
         unnest(range(0, least({MAX_FRAMES},
                               (len + {FRAME_STRIDE - 1}) // {FRAME_STRIDE})))
           AS i
  FROM vids
)
SELECT doc_id AS media_id,
       CAST(i AS INTEGER) AS frame_idx,
       CAST(i * {FRAME_STRIDE} AS BIGINT) AS frame_off,
       CAST(least({FRAME_LEN}, len - i * {FRAME_STRIDE}) AS INTEGER)
         AS frame_len,
       hex(encode(substr(text, CAST(i * {FRAME_STRIDE} + 1 AS INTEGER),
                         CAST(least({FP_LEN}, len - i * {FRAME_STRIDE})
                              AS INTEGER)))) AS fp
FROM frames""",
    doc="Frame sampling over video payloads: mapInPandas 1:N row "
        "expansion (binary in, up to 8 typed frame rows out at a "
        "64-byte stride) — the keyframe-extraction plumbing of a video "
        "training pipeline, with the decoder swapped for deterministic "
        "byte windows (container has no media libs). Value-checked "
        "against a DuckDB unnest(range())-lateral oracle.",
    tags=("pandas-udf",),
)
def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = media_table(spark, sf_dir).filter(F.col("kind") == "video")
    return media.mapInPandas(_sample_frames, schema=FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# resize: binary -> binary reduction with typed metadata

RESIZE_FACTOR = 4      # keep every 4th byte (stand-in resampling kernel)

RESIZE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("orig_bytes", T.IntegerType(), False),
    T.StructField("thumb_bytes", T.IntegerType(), False),
    T.StructField("thumb_fp", T.StringType(), False),
])


def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched binary->binary reduction — the stage that would
    call a real resampler after ``decode_media``; the deterministic
    stand-in keeps every RESIZE_FACTOR-th byte so the plumbing (binary
    in, reduced binary + metadata out) is value-checkable."""
    for pdf in batches:
        out = {"media_id": [], "orig_bytes": [], "thumb_bytes": [],
               "thumb_fp": []}
        for mid, payload in zip(pdf["media_id"], pdf["payload"]):
            b = bytes(payload)
            thumb = b[::RESIZE_FACTOR]
            out["media_id"].append(int(mid))
            out["orig_bytes"].append(len(b))
            out["thumb_bytes"].append(len(thumb))
            out["thumb_fp"].append(thumb[:8].hex().upper())
        yield pd.DataFrame(out).astype(
            {"media_id": "int64", "orig_bytes": "int32",
             "thumb_bytes": "int32", "thumb_fp": "object"})


@register(
    "multimodal_resize",
    # ASCII fixture payloads (see multimodal_feature_extract): byte
    # subsampling == char subsampling, so DuckDB rebuilds the thumbnail
    # with a list_transform over positions and string_aggs it in order
    oracle=f"""
WITH imgs AS (
  SELECT doc_id, text, octet_length(encode(text)) AS len
  FROM documents WHERE CAST(doc_id % 3 AS INTEGER) = 0
),
thumbs AS (
  SELECT doc_id, len,
         list_aggregate(list_transform(
             range(0, (len + {RESIZE_FACTOR - 1}) // {RESIZE_FACTOR}),
             i -> substr(text, CAST(1 + i * {RESIZE_FACTOR} AS INTEGER), 1)),
           'string_agg', '') AS thumb
  FROM imgs
)
SELECT doc_id AS media_id,
       CAST(len AS INTEGER) AS orig_bytes,
       CAST(length(thumb) AS INTEGER) AS thumb_bytes,
       hex(encode(substr(thumb, 1, 8))) AS thumb_fp
FROM thumbs""",
    doc="Resize over image payloads: mapInPandas binary->binary "
        "reduction (every 4th byte as the stand-in resampling kernel; "
        "a real deployment swaps in decode_media + a resampler) with "
        "typed size metadata. Rounds out the multimodal stub family "
        "(decode / feature-extract / frame-sample / resize) with the "
        "same real-plumbing-fake-kernel pattern, value-checked against "
        "a DuckDB positional-subsample oracle.",
    tags=("pandas-udf",),
)
def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = media_table(spark, sf_dir).filter(F.col("kind") == "image")
    return media.mapInPandas(_resize, schema=RESIZE_SCHEMA)
