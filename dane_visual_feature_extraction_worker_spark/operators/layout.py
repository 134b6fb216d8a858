"""Data-layout operators: Z-order (Morton) clustering keys.

Multi-dimensional data skipping is the single biggest scan-cost lever
at 100 TB: a table range-partitioned and sorted by a Z-order key over
(time, entity) keeps BOTH a time-range filter and an entity filter
effective against parquet row-group min/max stats, where a plain sort
on one dimension serves only that dimension (the reference worker
reads its input per-document and has no layout story at all — this is
the Spark-native replacement for its one-file-at-a-time locality,
cf. reference worker.py:60-74 download-then-process loop).

Everything here is EXACT integer math (bucket = delta DIV quantum,
bit interleave by shift/add), so any SQL engine replays the key
bit-for-bit — the layout decision itself becomes oracle-testable,
not just the data it carries.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def _bucket(col: F.Column, lo: int, hi: int, bits: int) -> F.Column:
    """Equal-quantum integer bucket of ``col`` in [lo, hi] -> [0, 2^bits).

    quantum = range DIV 2^bits + 1, bucket = (v - lo) DIV quantum.
    DIV-by-quantum (not multiply-then-DIV) keeps every intermediate
    <= range, so epoch-MICROSECOND domains (~1e15) cannot overflow
    int64 the way (v - lo) * 65535 would.  quantum >= 1 always, and
    (v - lo) DIV quantum < 2^bits by construction:
    range DIV (range DIV K + 1) < K.

    The division itself must be EXACT (a double quotient can round
    across an integer boundary): subtracting ``pmod`` first makes the
    numerator exactly divisible, and IEEE division of two exact
    doubles with a representable integer quotient is exact — the
    deltas here are <= range < 2^53, so both operands are exact.
    """
    quantum = (hi - lo) // (1 << bits) + 1
    delta = col.cast("bigint") - F.lit(lo).cast("bigint")
    exact = delta - F.pmod(delta, F.lit(quantum))
    return (exact / F.lit(quantum)).cast("bigint")


def zorder_key(
    x: F.Column,
    y: F.Column,
    x_range: tuple[int, int],
    y_range: tuple[int, int],
    bits: int = 16,
) -> F.Column:
    """Morton key interleaving ``bits`` bucket bits of x (even bit
    positions) and y (odd positions) — pure shift/add codegen, no UDF.

    ``x_range``/``y_range`` are the (min, max) of each dimension —
    one scalar aggregate at build time, broadcast as literals into
    the expression (the per-row path never touches them again).
    2*bits <= 62 keeps the key in signed int64.
    """
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    xb = _bucket(x, x_range[0], x_range[1], bits)
    yb = _bucket(y, y_range[0], y_range[1], bits)
    z = None
    for i in range(bits):
        xbit = F.shiftrightunsigned(xb, i).bitwiseAND(F.lit(1))
        ybit = F.shiftrightunsigned(yb, i).bitwiseAND(F.lit(1))
        term = xbit * F.lit(1 << (2 * i)) + ybit * F.lit(1 << (2 * i + 1))
        z = term if z is None else z + term
    return z.cast("bigint")


def zorder_layout(
    df: DataFrame,
    x: str,
    y: str,
    bits: int = 16,
    partitions: int | None = None,
    key_col: str = "zkey",
) -> DataFrame:
    """Cluster ``df`` for 2-D data skipping: compute the Morton key,
    range-partition on it and sort within partitions — the layout an
    Iceberg/Delta ``OPTIMIZE ZORDER BY`` produces, expressed as plain
    Spark so the write path stays engine-agnostic.

    Plan: ONE scalar aggregate for the two (min, max) pairs (collected
    — four int64s, never data-sized), then a narrow key projection and
    one range exchange.  repartitionByRange samples the key, so skewed
    key densities still yield balanced output files; sortWithinPartitions
    is the in-partition tail of the same shuffle, not a second exchange.
    """
    lo = df.select(
        F.min(F.col(x).cast("bigint")).alias("xlo"),
        F.max(F.col(x).cast("bigint")).alias("xhi"),
        F.min(F.col(y).cast("bigint")).alias("ylo"),
        F.max(F.col(y).cast("bigint")).alias("yhi"),
    ).collect()[0]
    keyed = df.withColumn(
        key_col,
        zorder_key(
            F.col(x), F.col(y),
            (lo["xlo"], lo["xhi"]), (lo["ylo"], lo["yhi"]),
            bits=bits,
        ),
    )
    n = partitions or df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions", "32"
    )
    return keyed.repartitionByRange(int(n), key_col).sortWithinPartitions(
        key_col
    )


def global_index(
    df: DataFrame,
    order_by: list[str],
    idx_col: str = "global_idx",
    partitions: int | None = None,
) -> DataFrame:
    """Contiguous 0-based global row index under a TOTAL order — the
    scale-safe replacement for ``row_number() OVER (ORDER BY …)``,
    whose empty-partitionBy window collapses the whole table into ONE
    task (the classic 100 TB driver-killer). ``order_by`` must be a
    total order (include a unique tiebreak column); otherwise the
    index assignment between equal keys is partition-dependent.

    Plan (two phases, both fully parallel):

    1. ``repartitionByRange(order_by) + sortWithinPartitions`` — one
       range exchange; partition i holds keys strictly below
       partition i+1 (RangePartitioner contract), each sorted.
       ``monotonically_increasing_id()`` stamped AFTER the sort is
       consecutive within each partition in sort order. The stamped
       frame is persisted: the id is assignment-time-stable only if
       the lineage is not recomputed between the two jobs below.
    2. ONE |partitions|-row aggregate (count + min id per partition
       id) collected to the driver, prefix-summed (tiny — never data
       sized), broadcast-joined back:
       ``idx = offset[pid] + (id − min_id[pid])``.

    The caller owns unpersisting the RETURNED frame's cache once
    consumed (it is the persisted stamped frame plus a broadcast
    join — cheap to keep, safe to drop).
    """
    n_parts = partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    cols = [F.col(c) for c in order_by]
    stamped = (
        df.repartitionByRange(int(n_parts), *cols)
        .sortWithinPartitions(*cols)
        .withColumn("__pid", F.spark_partition_id())
        .withColumn("__mid", F.monotonically_increasing_id())
    )
    stamped.persist()
    stats = (
        stamped.groupBy("__pid")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("__n"),
            F.min("__mid").alias("__mid0"),
        )
        .collect()
    )
    offsets, acc = [], 0
    for r in sorted(stats, key=lambda r: r["__pid"]):
        offsets.append((r["__pid"], acc, r["__mid0"]))
        acc += r["__n"]
    omap = df.sparkSession.createDataFrame(
        offsets, "__pid int, __off long, __mid0 long"
    )
    return (
        stamped.join(F.broadcast(omap), "__pid")
        .withColumn(
            idx_col,
            (F.col("__off") + (F.col("__mid") - F.col("__mid0"))).cast(
                "bigint"
            ),
        )
        .drop("__pid", "__mid", "__off", "__mid0")
    )


def curriculum_order(
    docs: DataFrame,
    length_col: str = "n_chars",
    id_col: str = "doc_id",
    rank_col: str = "curriculum_rank",
    partitions: int | None = None,
) -> DataFrame:
    """Shortest-first curriculum ranking of a corpus — the canonical
    curriculum-learning data order (easy/short examples first), as a
    CONTIGUOUS 0-based rank every downstream epoch sampler can slice
    by range. Built on :func:`global_index`, so the 100 TB plan has
    no single-partition window anywhere: one range exchange + a
    |partitions|-row driver prefix-sum.
    """
    out = global_index(
        docs.select(F.col(id_col), F.col(length_col).cast("bigint")),
        order_by=[length_col, id_col],
        idx_col=rank_col,
        partitions=partitions,
    )
    return out.select(id_col, length_col, rank_col)
