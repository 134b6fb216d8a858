"""Archive (tar / tar.gz) ingestion — the reference's real input path.

The reference's work unit arrives as ``visxp_prep__<source_id>.tar.gz``
fetched from object storage and untarred to loose files
(io_util.py:247-285 obtain_input_file, :299-303 untar_input_file;
feature_extraction.py:56-63 consumes the extracted dir). Distributed,
the download+untar step becomes: ``binaryFile`` scan over the archive
blobs → ``mapInPandas`` + stdlib ``tarfile`` expansion of each payload
into (archive, member, payload) rows — no local filesystem staging, no
shell-outs; members flow straight into ``extract_features``.

Scale notes:
- one archive = one input row = one unit of expansion work; parallelism
  is ACROSS archives (the reference's one-tarball-per-queue-message
  granularity, worker.py:66-90). tar is not a splittable format, so a
  single huge archive cannot parallelize *internally* — keep archives
  at the source-id granularity the reference uses (thousands of small
  tarballs, ideal here).
- expansion is streaming: ``tarfile`` reads the in-memory payload
  sequentially; member payloads are yielded per Arrow batch, so peak
  memory is one archive + one output batch per task.
- ``spark.sql.files.maxPartitionBytes`` does not split binaryFile rows;
  each archive lands whole in exactly one task.
"""

from __future__ import annotations

import fnmatch
import io
import tarfile
from typing import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

TAR_MEMBER_SCHEMA = (
    "archive string, member string, member_idx int, "
    "n_bytes int, payload binary"
)


def read_tar_members(
    spark: SparkSession,
    path: str,
    pattern: str = "*.tar*",
    member_glob: str = "*",
) -> DataFrame:
    """One row per regular-file member of every tar archive under
    ``path``. Compression is auto-detected per archive (``r:*`` —
    plain, gz, bz2, xz), mirroring tarfile.open in the reference's
    untar (io_util.py:301-303). ``member_glob`` filters member names
    (fnmatch) INSIDE the expansion, so non-matching payloads are never
    materialized into Arrow batches."""
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", pattern)
        .load(path)
        .select("path", "content")
    )

    def expand(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for apath, blob in zip(pdf["path"], pdf["content"]):
                names, idxs, sizes, payloads = [], [], [], []
                with tarfile.open(
                    fileobj=io.BytesIO(bytes(blob)), mode="r:*"
                ) as tf:
                    for i, m in enumerate(tf):
                        if not m.isfile():
                            continue
                        if not fnmatch.fnmatch(m.name, member_glob):
                            continue
                        f = tf.extractfile(m)
                        data = f.read() if f is not None else b""
                        names.append(m.name)
                        idxs.append(i)
                        sizes.append(len(data))
                        payloads.append(data)
                yield pd.DataFrame(
                    {
                        "archive": pd.Series(
                            [apath] * len(names), dtype=object
                        ),
                        "member": pd.Series(names, dtype=object),
                        "member_idx": pd.Series(idxs, dtype="int32"),
                        "n_bytes": pd.Series(sizes, dtype="int32"),
                        "payload": pd.Series(payloads, dtype=object),
                    }
                )

    return raw.mapInPandas(expand, schema=TAR_MEMBER_SCHEMA)


def tar_members_to_mm(members: DataFrame) -> DataFrame:
    """Adapt tar member rows to the multimodal contract schema
    (multimodal.attach_payload shape), so ``extract_features`` runs
    unchanged on archive contents. ``doc_id`` is a stable hash of
    (archive, member) — re-listing reproduces it."""
    ext = F.lower(F.element_at(F.split(F.col("member"), r"\."), -1))
    mime = (
        F.when(ext == "jpg", "image/jpeg")
        .when(ext == "jpeg", "image/jpeg")
        .when(ext == "png", "image/png")
        .when(ext == "npz", "application/x-npz")
        .when(ext == "txt", "text/plain")
        .otherwise("application/octet-stream")
    )
    return members.select(
        F.xxhash64(F.concat_ws("#", "archive", "member")).alias("doc_id"),
        F.col("payload"),
        mime.alias("mime"),
        F.col("n_bytes").alias("n_bytes_meta"),
        F.concat_ws("#", "archive", "member").alias("source_path"),
    )


TAR_SINK_SCHEMA = (
    "entity string, archive string, n_members int, n_bytes bigint"
)


def archive_sink(
    df: DataFrame,
    out_dir: str,
    entity_col: str = "entity",
    name_col: str = "member",
    payload_col: str = "payload",
    prefix: str = "out",
    gz: bool = True,
) -> DataFrame:
    """A15 archive sink: one ``<prefix>__<entity>.tar(.gz)`` per entity,
    written EXECUTOR-side, manifest rows back to the driver.

    The reference tars each entity's output dir and ships it to object
    storage (io_util.py:180-203 transfer_output — one archive per
    source_id). Distributed: groupBy(entity) + applyInPandas, each
    group serialized to one tarball under ``out_dir`` (a shared
    filesystem / object-store mount); the returned DataFrame is the
    manifest (entity, archive path, member count, payload bytes) — the
    registration row the reference writes to its index (worker.py:
    93-114). Determinism: members sorted by name, tar metadata zeroed,
    gzip mtime fixed, so re-running an entity reproduces identical
    bytes (idempotent overwrite).

    Scale shape: parallelism across entities (the reference's queue
    granularity); one archive's members must fit one task — the same
    bound the reference's per-entity tar already implies."""
    import gzip
    import os
    import re

    import pandas as pd

    os.makedirs(out_dir, exist_ok=True)
    suffix = ".tar.gz" if gz else ".tar"

    def write_group(pdf: pd.DataFrame) -> pd.DataFrame:
        entity = str(pdf[entity_col].iloc[0])
        safe = re.sub(r"[^A-Za-z0-9_.-]", "_", entity)
        path = os.path.join(out_dir, f"{prefix}__{safe}{suffix}")
        rows = sorted(
            zip(pdf[name_col], pdf[payload_col]), key=lambda r: str(r[0])
        )
        total = 0
        tmp = path + ".__tmp__"
        with open(tmp, "wb") as raw:
            if gz:
                stream = gzip.GzipFile(
                    filename="", mode="wb", fileobj=raw, mtime=0
                )
            else:
                stream = raw
            with tarfile.open(fileobj=stream, mode="w") as tf:
                for name, payload in rows:
                    data = bytes(payload) if payload is not None else b""
                    info = tarfile.TarInfo(name=str(name))
                    info.size = len(data)
                    info.mtime = 0
                    info.uid = info.gid = 0
                    tf.addfile(info, io.BytesIO(data))
                    total += len(data)
            if gz:
                stream.close()
        os.replace(tmp, path)  # atomic publish; reruns overwrite
        return pd.DataFrame(
            {
                "entity": [entity],
                "archive": [path],
                "n_members": [len(rows)],
                "n_bytes": [total],
            }
        )

    return df.groupBy(entity_col).applyInPandas(
        write_group, schema=TAR_SINK_SCHEMA
    )


def build_tar_archives(
    items: list[tuple[str, bytes]],
    out_dir: str,
    per_archive: int = 64,
    prefix: str = "prep",
    gz: bool = True,
) -> list[str]:
    """Driver-side fixture builder: pack (member_name, payload) items
    into ``ceil(n/per_archive)`` tarballs named like the reference's
    ``visxp_prep__<source_id>.tar.gz``. Deterministic member metadata
    (mtime/uid/gid zeroed) so archives are reproducible. This is the
    TEST-fixture twin of production, where archives already exist in
    object storage."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    mode = "w:gz" if gz else "w"
    suffix = ".tar.gz" if gz else ".tar"
    for a in range(0, len(items), per_archive):
        p = os.path.join(out_dir, f"{prefix}__{a // per_archive:05d}{suffix}")
        with tarfile.open(p, mode) as tf:
            for name, payload in items[a : a + per_archive]:
                info = tarfile.TarInfo(name=name)
                info.size = len(payload)
                info.mtime = 0
                info.uid = info.gid = 0
                tf.addfile(info, io.BytesIO(payload))
        paths.append(p)
    return paths
