"""Table maintenance: small-file compaction for parquet table dirs.

At 10^12-turn scale the per-bucket/resumable write pattern
(checkpoint.py) and streaming sinks produce many small files; readers
then pay per-file open/footer costs and lose row-group locality. On
Iceberg this is `rewrite_data_files`; for plain parquet dirs this
helper rewrites a table to ~``target_mb`` files. Deterministic layout:
optional ``sort_by`` re-clusters (e.g. (conv_id, ts)) so downstream
entity scans prune via min/max row-group stats.
"""

from __future__ import annotations

import os
import re
import warnings

from pyspark.sql import DataFrame, SparkSession

_URI_SCHEME = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.-]*://")


def is_local_path(path: str) -> bool:
    """True for plain POSIX paths (and explicit ``file://``).

    The swap/recovery machinery below uses driver-local ``os.rename`` /
    ``os.walk`` / ``shutil`` — correct only for a local filesystem. A
    checkpoint/table dir on ``s3://`` / ``hdfs://`` must not be walked
    with os APIs (ADVICE r4: run_resumable calls these unconditionally);
    callers skip with a warning instead of crashing after the work is
    done. Routing renames through the Hadoop FileSystem API is the
    upgrade path when an object-store deployment needs compaction."""
    if path.startswith("file://"):
        return True
    return not _URI_SCHEME.match(path)


def _skip_nonlocal(path: str, op: str) -> bool:
    if is_local_path(path):
        return False
    warnings.warn(
        f"{op}: skipping non-local path {path!r} (driver-local fs ops "
        "only; use Iceberg rewrite_data_files / Hadoop FileSystem API "
        "on object stores)",
        stacklevel=3,
    )
    return True


def dir_bytes(path: str) -> int:
    total = 0
    for root, _d, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                try:
                    total += os.path.getsize(os.path.join(root, f))
                except OSError:
                    pass
    return total


def _recover_interrupted_swap(path: str) -> None:
    """If a prior compaction crashed between its two swap renames,
    ``path`` is missing and the full original sits at ``<path>.__old__``
    — rename it back. A leftover ``__old__`` *alongside* a live table
    is a completed swap whose cleanup died; drop it."""
    import shutil

    if _skip_nonlocal(path, "_recover_interrupted_swap"):
        return
    p = path.rstrip("/")
    old = p + ".__old__"
    if os.path.isdir(old):
        if not os.path.isdir(p):
            os.rename(old, p)
        else:
            shutil.rmtree(old)


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_mb: int = 128,
    sort_by: list[str] | None = None,
) -> dict:
    """Rewrite ``path`` (a parquet dir) into ~target_mb files.

    Returns {files_before, files_after, bytes}. Write-then-swap:
    the rewrite lands in a sibling ``<path>.__compact__`` dir, then the
    swap is two renames — original aside to ``<path>.__old__``, temp
    into place — so at every instant a complete table exists at either
    ``path`` or ``<path>.__old__`` (ADVICE r2: rmtree-then-rename had a
    window with NO table). A crash between the renames is recovered by
    renaming ``<path>.__old__`` back; ``_recover_interrupted_swap``
    does that automatically at the next compaction. Renames are
    same-parent (sibling dirs), so no cross-filesystem failure mode.
    """
    import shutil

    if _skip_nonlocal(path, "compact_parquet"):
        return {"files_before": None, "files_after": None, "bytes": None,
                "skipped": "non-local path"}
    _recover_interrupted_swap(path)
    df = spark.read.parquet(path)
    n_bytes = dir_bytes(path)
    files_before = sum(
        1
        for _r, _d, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    )
    n_files = max(1, round(n_bytes / (target_mb * 1024 * 1024)))
    if sort_by:
        out: DataFrame = df.repartitionByRange(n_files, *sort_by).sortWithinPartitions(
            *sort_by
        )
    else:
        out = df.coalesce(n_files) if n_files < df.rdd.getNumPartitions() else df.repartition(n_files)
    tmp = path.rstrip("/") + ".__compact__"
    old = path.rstrip("/") + ".__old__"
    out.write.mode("overwrite").parquet(tmp)
    os.rename(path.rstrip("/"), old)  # original intact under __old__
    os.rename(tmp, path.rstrip("/"))  # compacted table live
    shutil.rmtree(old)  # only now is the original gone
    files_after = sum(
        1
        for _r, _d, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    )
    return {
        "files_before": files_before,
        "files_after": files_after,
        "bytes": n_bytes,
    }
