"""Multimodal column plumbing: binary payloads + typed metadata.

The reference's core job is exactly this: opaque media blobs (JPEG
keyframes, NPZ spectrograms) keyed by (entity, timestamp), decoded and
batch-feature-extracted (data_handling.py:74-109; feature_extraction.py:
17-32). Here the Spark-side plumbing is real — binary column, schema,
Arrow batch shape, partitioning — while the *decode* itself is stubbed
(image/audio libs are absent in this environment): ``decode_stub``
raises NotImplementedError by contract, and ``fake_decode`` is the
deterministic stand-in used by tests/oracles (byte-stat features).

At scale: payloads live in parquet binary columns (or object-store URIs
read via ``spark.read.format("binaryFile")``), feature extraction is a
``mapInPandas`` over Arrow batches (batch size = arrow_batch_size ≈ 256,
mirroring the reference batch), model/codec init happens once per
iterator (worker-level init, worker.py:61).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

FEATURE_DIM = 8

MM_SCHEMA = (
    "doc_id bigint, n_bytes int, payload_md5 string, features array<float>"
)


def decode_stub(payload: bytes) -> "np.ndarray":
    """Real decoder seam (jpeg/audio). Not available in this container.

    Reference analogue: ``Image.open`` / librosa STFT
    (data_handling.py:101-109, misc/spectrogram_example2/
    get_sepectogram.py:39-55)."""
    raise NotImplementedError(
        "media codecs unavailable; inject a decoder or use fake_decode"
    )


def fake_decode(payload: bytes) -> "np.ndarray":
    """Deterministic stand-in decode: byte-statistics feature vector
    (length, mean, std, min, max, first/last byte, checksum%997).

    Engine-portable float discipline: byte sums / squared sums are exact
    integers in IEEE double (≤ 255²·n ≪ 2^53), so mean = sum/n and
    std = sqrt(sum_sq/n − mean²) are each ONE float op from exact
    inputs — any SQL engine reproduces them bit-for-bit (the np.std
    two-pass formula would not round-trip)."""
    if len(payload) == 0:
        return np.zeros(FEATURE_DIM, dtype=np.float32)
    b = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
    n = float(len(b))
    s = float(int(b.sum()))
    sq = float(int((b * b).sum()))
    mean = s / n
    var = sq / n - mean * mean
    return np.array(
        [
            n,
            mean,
            float(np.sqrt(var if var > 0.0 else 0.0)),
            float(b.min()),
            float(b.max()),
            float(b[0]),
            float(b[-1]),
            float(int(s) % 997),
        ],
        dtype=np.float32,
    )


def attach_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Synthesize the binary column from text bytes (test fixture path;
    production reads real blobs). Schema is the contract: binary +
    typed metadata columns."""
    return docs.select(
        "doc_id",
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit("text/plain").alias("mime"),
        F.octet_length(F.col(text_col)).alias("n_bytes_meta"),
    )


def extract_features(mm: DataFrame, decode=fake_decode) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Iterator form = once-per-task init of the (stub) codec, Arrow
    batches ≈ 256 rows — the distributed twin of the reference's
    DataLoader + apply_model loop."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        codec = decode  # per-task init seam (model load goes here)
        for pdf in batches:
            feats = [codec(p if p is not None else b"") for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [
                        len(p) if p is not None else 0 for p in pdf["payload"]
                    ],
                    "payload_md5": [
                        hashlib.md5(p if p is not None else b"").hexdigest()
                        for p in pdf["payload"]
                    ],
                    "features": feats,
                }
            )

    return mm.mapInPandas(run, schema=MM_SCHEMA)


def read_binary_files(spark, path: str, pattern: str = "*") -> DataFrame:
    """Production blob ingestion: ``spark.read.format("binaryFile")``.

    The reference's real input is files on disk — ``keyframes/*.jpg``,
    ``spectrograms/*_{rate}.npz`` (data_handling.py:31-51). Distributed,
    that directory scan becomes the binaryFile source: one row per blob
    with (path, modificationTime, length, content), filterable by glob
    BEFORE read (pathGlobFilter pushes into file listing). Output uses
    the same contract schema as ``attach_payload``, so
    ``extract_features`` runs unchanged on real files; ``doc_id`` is a
    deterministic hash of the file name (stable across re-lists).
    """
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", pattern)
        .load(path)
    )
    ext = F.lower(F.element_at(F.split(F.col("path"), r"\."), -1))
    mime = (
        F.when(ext == "jpg", "image/jpeg")
        .when(ext == "jpeg", "image/jpeg")
        .when(ext == "png", "image/png")
        .when(ext == "npz", "application/x-npz")
        .when(ext == "wav", "audio/wav")
        .otherwise("application/octet-stream")
    )
    return raw.select(
        F.xxhash64(F.col("path")).alias("doc_id"),
        F.col("content").alias("payload"),
        mime.alias("mime"),
        F.col("length").cast("int").alias("n_bytes_meta"),
        F.col("path").alias("source_path"),
    )
