"""Source/sink format parity (SURVEY.md §2.1): beyond parquet, the
engine reads/writes ORC, JSON-lines, and CSV with EXPLICIT schemas
(never inferSchema — the reference's model is schema-declared-up-front,
§1.1). Timestamp columns round-trip as ISO-8601 strings in the text
formats (marshal F10) and natively in ORC.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, types as T

_TEXT_FORMATS = {"json", "csv"}
TS_FORMAT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"


def write_as(df: DataFrame, path: str, fmt: str) -> None:
    w = df.write.mode("overwrite")
    if fmt == "csv":
        w = w.option("header", "true").option("timestampFormat", TS_FORMAT)
    elif fmt == "json":
        w = w.option("timestampFormat", TS_FORMAT)
    w.format(fmt).save(path)


def read_as(spark: SparkSession, path: str, fmt: str,
            schema: T.StructType) -> DataFrame:
    """Schema is mandatory: inference is banned engine-wide."""
    r = spark.read.schema(schema)
    if fmt == "csv":
        r = r.option("header", "true").option("timestampFormat", TS_FORMAT)
    elif fmt == "json":
        r = r.option("timestampFormat", TS_FORMAT)
    return r.format(fmt).load(path)


def roundtrip(df: DataFrame, root: str, fmt: str) -> DataFrame:
    path = os.path.join(root, fmt)
    write_as(df, path, fmt)
    return read_as(df.sparkSession, path, fmt, df.schema)
