"""Catalog abstraction: Iceberg when available, parquet paths otherwise.

The reference reads tar/S3 archives per entity (io_util.py:247-285
obtain_input_file, :182-203 transfer_output); table-native I/O replaces
both directions. The engine targets Iceberg (BASELINE.json), but the
sandbox has no Iceberg runtime jar, so everything routes through this
seam (SURVEY.md §7c): a name containing '/' or ending '.parquet' is a
parquet path; otherwise it is treated as a catalog table
(``spark.read.table`` — Iceberg/HMS/whatever the session's catalog
provides). Semantics (schema, partitioning, checkpoint protocol) are
identical either way.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampNTZType(), False),
    ]
)


def _is_path(name: str) -> bool:
    return "/" in name or name.endswith(".parquet")


def read_table(spark: SparkSession, name: str) -> DataFrame:
    if _is_path(name):
        return spark.read.parquet(name)
    return spark.read.table(name)


def write_table(df: DataFrame, name: str, mode: str = "overwrite") -> None:
    if _is_path(name):
        df.write.mode(mode).parquet(name)
    else:
        df.writeTo(name).createOrReplace() if mode == "overwrite" else df.writeTo(
            name
        ).append()


def read_transcripts(spark: SparkSession, name: str) -> DataFrame:
    """Read + schema-align the transcript table (input_hint shape).

    Casts to the canonical column set/order and types; fails loudly on
    missing columns (config-validation discipline, base_util.py:21-131).
    """
    df = read_table(spark, name)
    missing = {f.name for f in TRANSCRIPT_SCHEMA.fields} - set(df.columns)
    if missing:
        raise ValueError(f"transcript source missing columns: {sorted(missing)}")
    return df.select(
        F.col("conv_id").cast("string"),
        F.col("turn_idx").cast("int"),
        F.col("role").cast("string"),
        F.col("text").cast("string"),
        F.col("tool").cast("string"),
        F.col("ts").cast("timestamp_ntz"),
    )
