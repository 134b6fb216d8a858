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


def write_bucketed(
    df: DataFrame,
    table: str,
    n_buckets: int,
    bucket_cols: list[str] | str,
    sort_cols: list[str] | str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` hash-bucketed (and optionally sorted) on the join
    key — the co-located-join layout for tables that are joined
    repeatedly on the same key (index tables, entity spines, feature
    stores). A join of two tables bucketed with the SAME count on the
    join key runs with ZERO exchanges on either side (Catalyst reads
    the bucket spec as the output partitioning), so the 100 TB join
    cost collapses to a per-bucket merge; with matching ``sort_cols``
    and one file per bucket the sorts go too. Bucket membership is
    Murmur3 on the column — stable across writes, so incremental
    appends land in the right bucket files.

    This is the parquet/in-memory-catalog twin of Iceberg's bucket
    partition transform (``writeTo(...).partitionedBy(bucket(N, col))``
    — see module docstring for the Iceberg routing)."""
    if isinstance(bucket_cols, str):
        bucket_cols = [bucket_cols]
    w = df.write.bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        if isinstance(sort_cols, str):
            sort_cols = [sort_cols]
        w = w.sortBy(*sort_cols)
    w.mode(mode).format("parquet").saveAsTable(table)
