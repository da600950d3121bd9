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
