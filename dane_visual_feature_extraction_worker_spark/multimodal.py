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


def frame_sample(
    mm: DataFrame, frame_bytes: int = 16, stride: int = 4
) -> DataFrame:
    """Frame sampling over binary payloads: treat each payload as a
    sequence of fixed-size frames and keep every ``stride``-th one —
    the reference's keyframe extraction shape (it consumes pre-sampled
    keyframes/*.jpg per shot, data_handling.py:31-40; here the sampling
    itself is distributed). mapInPandas over Arrow batches; emits one
    row per SAMPLED frame (explode shape) with the frame's offset and
    digest, so downstream feature extraction parallelizes per frame.
    """
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            doc_ids, idxs, offs, digests = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                p = payload if payload is not None else b""
                n_frames = len(p) // frame_bytes
                for fi in range(0, n_frames, stride):
                    off = fi * frame_bytes
                    doc_ids.append(doc_id)
                    idxs.append(fi)
                    offs.append(off)
                    digests.append(
                        hashlib.md5(p[off : off + frame_bytes]).hexdigest()
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(doc_ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "byte_offset": pd.Series(offs, dtype="int32"),
                    "frame_md5": pd.Series(digests, dtype=object),
                }
            )

    return mm.mapInPandas(
        run,
        schema="doc_id bigint, frame_idx int, byte_offset int, frame_md5 string",
    )


def resize_payload(mm: DataFrame, out_len: int = 8) -> DataFrame:
    """Nearest-neighbor 'resize' of a binary payload to ``out_len``
    samples (the 1-D stand-in for image resize — reference preprocesses
    keyframes to a fixed input shape before the model). Sample i reads
    source byte floor(i * n / out_len); zero-padded when the payload is
    shorter than out_len. Deterministic + byte-exact, so an oracle can
    recompute every sample; the Spark plumbing (Arrow batches, schema,
    flat sample columns) is the production shape."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols: dict = {
                "doc_id": pdf["doc_id"],
                "n_bytes": [
                    len(p) if p is not None else 0 for p in pdf["payload"]
                ],
            }
            samples = []
            for payload in pdf["payload"]:
                p = payload if payload is not None else b""
                n = len(p)
                if n == 0:
                    samples.append([0] * out_len)
                else:
                    samples.append([p[(i * n) // out_len] for i in range(out_len)])
            for i in range(out_len):
                cols[f"s{i}"] = pd.Series(
                    [s[i] for s in samples], dtype="int32"
                )
            yield pd.DataFrame(cols)

    scols = ", ".join(f"s{i} int" for i in range(out_len))
    return mm.mapInPandas(run, schema=f"doc_id bigint, n_bytes int, {scols}")
