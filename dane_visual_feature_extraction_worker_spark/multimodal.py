"""Multimodal column plumbing: binary payloads + typed metadata.

The reference's core job is exactly this: opaque media blobs (JPEG
keyframes, NPZ spectrograms) keyed by (entity, timestamp), decoded and
batch-feature-extracted (data_handling.py:74-109; feature_extraction.py:
17-32). The Spark-side plumbing is real — binary column, schema,
Arrow batch shape, partitioning — and so are the decoders for every
reference input format: PPM (decode_ppm), PNG (decode_png, stdlib-zlib
inflate + defilter), NPZ spectrograms (decode_npz), and baseline JPEG
(jpeg.decode_jpeg, from-scratch Huffman + IDCT). ``decode_stub``
remains the injection seam for external codecs this container can't
build from scratch (video containers, hardware decoders); ``fake_decode``
is the deterministic stand-in used by byte-stat tests/oracles.

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
    """Injection seam for codecs beyond the shipped ones (video
    containers, hardware decoders). PPM/PNG/NPZ decode in this module
    and baseline JPEG in ``jpeg.py`` are real from-scratch
    implementations — inject those, a library codec, or fake_decode.

    Reference analogue: ``Image.open`` / librosa STFT
    (data_handling.py:101-109, misc/spectrogram_example2/
    get_sepectogram.py:39-55)."""
    raise NotImplementedError(
        "no codec injected; use decode_ppm/decode_png/decode_npz/"
        "jpeg.decode_jpeg or a library decoder"
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


# --- real 2-D decode path (PPM) --------------------------------------
#
# The reference's per-item transform is decode → resize to a fixed
# (H, W) → z-normalize with config constants: keyframes get
# Normalize + Resize(dim_v, antialias=True) (data_handling.py:62-69),
# spectrograms get (x - 1.93) / 17.89 (misc/spectrogram_example2/
# get_sepectogram.py:63-64). Image codecs (PIL/torch) are absent in
# this container, so the SHIPPED decoder handles PPM (P6) — a raw
# uncompressed RGB format parseable with numpy alone — and the same
# seam accepts an injected JPEG/PNG decoder in production.

#: spectrogram z-normalization constants (get_sepectogram.py:63-64)
ZNORM_MEAN = 1.93
ZNORM_STD = 17.89


def encode_ppm(arr: "np.ndarray") -> bytes:
    """Serialize an (H, W, 3) uint8 array as binary PPM (P6)."""
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError("encode_ppm expects (H, W, 3) uint8")
    h, w = arr.shape[:2]
    return f"P6\n{w} {h}\n255\n".encode("ascii") + arr.tobytes()


def decode_ppm(payload: bytes) -> "np.ndarray":
    """Parse binary PPM (P6) into an (H, W, 3) uint8 array.

    Header = magic, width, height, maxval separated by whitespace
    (comments unsupported — fixture format), then raw RGB rows."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    fields: list[bytes] = []
    pos = 2
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(payload[start:pos])
    pos += 1  # single whitespace after maxval, then raw pixels
    w, h, maxval = (int(f) for f in fields)
    if maxval != 255:
        raise ValueError(f"unsupported maxval {maxval}")
    n = h * w * 3
    raw = np.frombuffer(payload, dtype=np.uint8, count=n, offset=pos)
    return raw.reshape(h, w, 3)


def resize_nn_2d(img: "np.ndarray", out_h: int, out_w: int) -> "np.ndarray":
    """Nearest-neighbor 2-D resize: output pixel (i, j) reads source
    (floor(i*H/out_h), floor(j*W/out_w)) — exact integer index math, so
    any engine (or a golden fixture) reproduces it byte-for-byte."""
    h, w = img.shape[:2]
    ri = (np.arange(out_h) * h) // out_h
    ci = (np.arange(out_w) * w) // out_w
    return img[ri][:, ci]


def znorm_2d(
    img: "np.ndarray", mean: float = ZNORM_MEAN, std: float = ZNORM_STD
) -> "np.ndarray":
    """Z-score normalization with config constants, float32 like the
    reference tensor path ((x - 1.93) / 17.89)."""
    return (img.astype(np.float32) - np.float32(mean)) / np.float32(std)


def decode_transform_2d(
    mm: DataFrame,
    out_h: int = 32,
    out_w: int = 32,
    mean: float = ZNORM_MEAN,
    std: float = ZNORM_STD,
    decode=decode_ppm,
) -> DataFrame:
    """Decode → resize(out_h, out_w) → z-normalize over binary payloads
    — the reference's full per-item transform, distributed as one
    mapInPandas stage (decoder initialized once per task via the
    iterator form). Emits shape + summary columns per item; the
    normalized tensor itself stays inside the stage (at 100 TB you
    never materialize float tensors into a shuffle — downstream model
    scoring fuses into the same stage, as the reference fuses transform
    + forward pass in its DataLoader loop)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        codec = decode  # once-per-task init seam
        for pdf in batches:
            src_h, src_w, zmean, zmin, zmax = [], [], [], [], []
            for payload in pdf["payload"]:
                img = codec(bytes(payload) if payload is not None else b"")
                z = znorm_2d(resize_nn_2d(img, out_h, out_w), mean, std)
                src_h.append(img.shape[0])
                src_w.append(img.shape[1])
                zmean.append(float(z.mean(dtype=np.float64)))
                zmin.append(float(z.min()))
                zmax.append(float(z.max()))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "src_h": pd.Series(src_h, dtype="int32"),
                    "src_w": pd.Series(src_w, dtype="int32"),
                    "out_h": pd.Series([out_h] * len(src_h), dtype="int32"),
                    "out_w": pd.Series([out_w] * len(src_w), dtype="int32"),
                    "z_mean": pd.Series(zmean, dtype="float64"),
                    "z_min": pd.Series(zmin, dtype="float64"),
                    "z_max": pd.Series(zmax, dtype="float64"),
                }
            )

    return mm.mapInPandas(
        run,
        schema=(
            "doc_id bigint, src_h int, src_w int, out_h int, out_w int, "
            "z_mean double, z_min double, z_max double"
        ),
    )


def synth_ppm_payloads(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Deterministic PPM fixture payloads from document text: an
    (8 + id%5) × (8 + id%7) RGB image whose pixel bytes tile the text's
    UTF-8 bytes (zeros for empty text). Spark-side (mapInPandas), so
    fixture generation scales with the corpus like real ingestion."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                h = 8 + int(doc_id) % 5
                w = 8 + int(doc_id) % 7
                bs = np.frombuffer(
                    (text or "").encode("utf-8"), dtype=np.uint8
                )
                if bs.size == 0:
                    bs = np.zeros(1, dtype=np.uint8)
                img = np.resize(bs, (h, w, 3))  # tiles/truncates to fit
                payloads.append(encode_ppm(img))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "payload": pd.Series(payloads, dtype=object),
                }
            )

    return docs.mapInPandas(run, schema="doc_id bigint, payload binary")


# --- PNG decode path (keyframes) ---------------------------------------
#
# The reference's video input is JPEG keyframes decoded with
# ``Image.open`` (data_handling.py:31-32, 106-109). No imaging library
# exists in this container, so the engine ships a from-scratch PNG
# codec instead: PNG is the lossless member of the reference's input
# family and — unlike JPEG's DCT/huffman pipeline — is fully decodable
# with stdlib zlib + numpy while exercising every real-decoder concern
# (container parsing, CRC validation, inflate, per-scanline predictive
# filters). The same ``decode=`` seam accepts a JPEG decoder in
# production (multimodal.decode_stub).

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color type -> samples/pixel


def encode_png(arr: "np.ndarray") -> bytes:
    """Minimal PNG writer (8-bit gray / gray+alpha / RGB / RGBA, one
    IDAT, filter 0 on every scanline) — builds REAL compressed PNG
    bytes for fixtures; decode_png round-trips them exactly."""
    import struct
    import zlib

    if arr.dtype != np.uint8:
        raise ValueError("encode_png expects uint8")
    if arr.ndim == 2:
        color = 0
    elif arr.ndim == 3 and arr.shape[2] in (2, 3, 4):
        color = {2: 4, 3: 2, 4: 6}[arr.shape[2]]
    else:
        raise ValueError("encode_png expects (H,W[,2|3|4]) uint8")
    h, w = arr.shape[:2]
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    pa = abs(b - c)
    pb = abs(a - c)
    pc = abs(a + b - 2 * c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(payload: bytes) -> "np.ndarray":
    """From-scratch baseline PNG decoder: chunk walk with CRC checks,
    stdlib-zlib inflate, all five scanline filters undone.

    Supports bit depth 8, color types 0/2/4/6 (gray, RGB, gray+alpha,
    RGBA), no palette, no interlace — the baseline subset every encoder
    in this repo (and most real-world RGB PNG) emits. Filters None/Up
    undo as vector adds, Sub as a per-channel-lane cumulative sum
    (recon[x] = filt[x] + recon[x-bpp] telescopes; mod-256 distributes
    over the prefix sum), Average/Paeth need the sequential per-pixel
    recurrence the spec defines. Returns (H, W) uint8 for grayscale,
    (H, W, C) otherwise."""
    import struct
    import zlib

    if not payload.startswith(_PNG_SIG):
        raise ValueError("not a PNG payload")
    pos = len(_PNG_SIG)
    ihdr = None
    idat = []
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(
            ">I", payload[pos + 8 + length : pos + 12 + length]
        )
        if zlib.crc32(tag + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif tag == b"IDAT":
            idat.append(data)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or color not in _PNG_CHANNELS or comp or filt or interlace:
        raise ValueError(
            f"unsupported PNG variant (depth={depth} color={color} "
            f"interlace={interlace}); baseline 8-bit only"
        )
    ch = _PNG_CHANNELS[color]
    stride = w * ch
    data = zlib.decompress(b"".join(idat))
    if len(data) != h * (stride + 1):
        raise ValueError("PNG scanline payload size mismatch")
    rows = np.frombuffer(data, dtype=np.uint8).reshape(h, stride + 1)
    out = np.empty((h, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        ft = int(rows[y, 0])
        row = rows[y, 1:].astype(np.int32)
        if ft == 0:
            recon = row
        elif ft == 1:  # Sub: per-lane prefix sum
            recon = (
                np.cumsum(row.reshape(w, ch), axis=0) % 256
            ).reshape(stride)
        elif ft == 2:  # Up
            recon = (row + prior) % 256
        elif ft == 3:  # Average
            recon = row.copy()
            for x in range(stride):
                left = recon[x - ch] if x >= ch else 0
                recon[x] = (row[x] + (left + prior[x]) // 2) % 256
        elif ft == 4:  # Paeth
            recon = row.copy()
            for x in range(stride):
                left = int(recon[x - ch]) if x >= ch else 0
                up = int(prior[x])
                ul = int(prior[x - ch]) if x >= ch else 0
                recon[x] = (row[x] + _paeth(left, up, ul)) % 256
        else:
            raise ValueError(f"unknown PNG filter {ft}")
        out[y] = recon.astype(np.uint8)
        prior = recon
    return out.reshape(h, w) if ch == 1 else out.reshape(h, w, ch)


def synth_png_payloads(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Deterministic REAL-PNG fixture payloads: an (8 + id%5) x
    (8 + id%7) grayscale image whose pixel bytes tile the text's UTF-8
    bytes (zeros for empty), zlib-compressed through encode_png —
    the PNG twin of synth_ppm_payloads."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                h = 8 + int(doc_id) % 5
                w = 8 + int(doc_id) % 7
                bs = np.frombuffer(
                    (text or "").encode("utf-8"), dtype=np.uint8
                )
                if bs.size == 0:
                    bs = np.zeros(1, dtype=np.uint8)
                img = np.resize(bs, (h, w))
                payloads.append(encode_png(img))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "payload": pd.Series(payloads, dtype=object),
                }
            )

    return docs.mapInPandas(run, schema="doc_id bigint, payload binary")


def synth_jpeg_payloads(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Deterministic REAL-JPEG fixture payloads: an
    8*(1 + id%3) x 8*(1 + id%4) grayscale image whose 8x8 BLOCKS are
    constant, block (bi, bj) holding text byte (bi*wb + bj) mod n
    (zero for empty text), encoded at quality=100 through the
    from-scratch baseline codec (jpeg.encode_jpeg). Block-constant +
    all-ones quantizers makes the lossy pipeline bit-exact (one DC
    coefficient per block, an exact integer — jpeg.py module
    docstring), which is what lets the SQL oracle replay the tiling."""
    from dane_visual_feature_extraction_worker_spark.jpeg import encode_jpeg

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                hb = 1 + int(doc_id) % 3
                wb = 1 + int(doc_id) % 4
                bs = np.frombuffer(
                    (text or "").encode("utf-8"), dtype=np.uint8
                )
                if bs.size == 0:
                    bs = np.zeros(1, dtype=np.uint8)
                blocks = np.resize(bs, (hb, wb))
                img = np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1)
                payloads.append(encode_jpeg(img, quality=100))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "payload": pd.Series(payloads, dtype=object),
                }
            )

    return docs.mapInPandas(run, schema="doc_id bigint, payload binary")


# --- NPZ decode path (spectrograms) -----------------------------------
#
# The reference's audio input is literally NPZ: one
# ``<ts>_<rate>.npz`` per timestamp, loaded with
# ``np.load(path)["arr_0"]`` and z-normalized (data_handling.py:50-51,
# 88-94; get_sepectogram.py:63-64). NPZ is a zip of ``.npy`` members —
# numpy alone decodes it, so unlike JPEG this path ships REAL, not as a
# seam. One deliberate difference: the reference stores a *pickled
# dict* under arr_0 and loads with allow_pickle=True
# (data_handling.py:88-89); pickle execution on untrusted corpus blobs
# is not acceptable in a distributed engine, so this decoder reads
# plain ``.npy`` array members only (allow_pickle=False) and a
# dict-shaped payload must be re-packed upstream.


def encode_npz(arrays: "dict[str, np.ndarray]") -> bytes:
    """Serialize arrays as an uncompressed NPZ blob (np.savez;
    deterministic: zip member timestamps default to the 1980 epoch)."""
    import io

    buf = io.BytesIO()
    np.savez(buf, **arrays)
    return buf.getvalue()


def decode_npz(payload: bytes, key: str = "arr_0") -> "np.ndarray":
    """Decode one member of an NPZ payload to an ndarray.

    allow_pickle stays False: object arrays in untrusted blobs are a
    code-execution vector (the reference tolerates them because it
    only reads its own prep output, data_handling.py:88)."""
    import io

    with np.load(io.BytesIO(payload), allow_pickle=False) as npz:
        if key not in npz.files:
            raise KeyError(
                f"member {key!r} not in npz (has {npz.files!r})"
            )
        return npz[key]


def decode_transform_npz(
    mm: DataFrame,
    key: str = "arr_0",
    mean: float = ZNORM_MEAN,
    std: float = ZNORM_STD,
) -> DataFrame:
    """Decode NPZ spectrograms → z-normalize — the reference's audio
    transform ((x - 1.93) / 17.89, get_sepectogram.py:63-64), one
    mapInPandas stage, tensor never leaves the stage (downstream model
    scoring fuses here, like the 2-D path).

    Emitted stats are chosen to be engine-replayable: z_min/z_max ride
    the monotonic float32 transform of the min/max input value;
    ``z_mean`` derives from the float64 input SUM — exact (order-free)
    whenever the array holds integer-valued samples ≤ 2^53, which the
    byte-derived fixtures and uint8-sourced spectrograms satisfy."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        m32, s32 = np.float32(mean), np.float32(std)
        for pdf in batches:
            rows_, cols_, zmin, zmax, zmean = [], [], [], [], []
            for payload in pdf["payload"]:
                arr = decode_npz(
                    bytes(payload) if payload is not None else b"", key
                )
                a32 = arr.astype(np.float32)
                z = (a32 - m32) / s32
                s = float(arr.astype(np.float64).sum())
                n = float(arr.size)
                rows_.append(arr.shape[0])
                cols_.append(arr.shape[1] if arr.ndim > 1 else 1)
                zmin.append(float(z.min()))
                zmax.append(float(z.max()))
                zmean.append(((s / n) - mean) / std)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_rows": pd.Series(rows_, dtype="int32"),
                    "n_cols": pd.Series(cols_, dtype="int32"),
                    "z_min": pd.Series(zmin, dtype="float64"),
                    "z_max": pd.Series(zmax, dtype="float64"),
                    "z_mean": pd.Series(zmean, dtype="float64"),
                }
            )

    return mm.mapInPandas(
        run,
        schema=(
            "doc_id bigint, n_rows int, n_cols int, "
            "z_min double, z_max double, z_mean double"
        ),
    )


def synth_npz_payloads(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Deterministic NPZ fixture payloads: an (8 + id%5) × (8 + id%7)
    float32 array tiling the text's UTF-8 byte values (zeros for empty
    text), packed under ``arr_0`` like the reference's prep output.
    Spark-side (mapInPandas), scales with the corpus."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                h = 8 + int(doc_id) % 5
                w = 8 + int(doc_id) % 7
                bs = np.frombuffer(
                    (text or "").encode("utf-8"), dtype=np.uint8
                )
                if bs.size == 0:
                    bs = np.zeros(1, dtype=np.uint8)
                arr = np.resize(bs, (h, w)).astype(np.float32)
                payloads.append(encode_npz({"arr_0": arr}))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "payload": pd.Series(payloads, dtype=object),
                }
            )

    return docs.mapInPandas(run, schema="doc_id bigint, payload binary")


_WAV_RIFF = b"RIFF"
_WAV_WAVE = b"WAVE"


def encode_wav(samples: "np.ndarray", rate: int) -> bytes:
    """Minimal canonical-form WAV writer: RIFF/WAVE container, one
    ``fmt `` chunk (PCM, mono, 16-bit) + one ``data`` chunk,
    little-endian int16 samples — the exact subset every telephony /
    ASR corpus ships.  Pure stdlib struct; the encode twin of
    ``decode_wav`` (round-trip golden-tested)."""
    import struct

    s = np.asarray(samples, dtype="<i2")
    data = s.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, int(rate), int(rate) * 2, 2, 16)
    body = (
        _WAV_WAVE
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return _WAV_RIFF + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple["np.ndarray", int]:
    """From-scratch WAV/PCM decoder: RIFF chunk walk (tolerates extra
    chunks like LIST/INFO, honors word alignment), strict validation
    of the fmt contract (PCM, mono, 16-bit — raise on ADPCM/float/
    stereo rather than silently mis-parse), returns (int16 samples,
    sample_rate).  The audio member of the decode family next to PPM/
    PNG/NPZ/JPEG (reference keeps all media behind one decode seam,
    data_handling.py:31-32); every step is spec-literal so the SQL
    oracle can replay the byte math."""
    import struct

    if len(payload) < 12 or payload[:4] != _WAV_RIFF or payload[8:12] != _WAV_WAVE:
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (length,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + length]
        if tag == b"fmt ":
            if length < 16:
                raise ValueError("WAV fmt chunk too short")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif tag == b"data":
            data = body
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, channels, rate, _byterate, _align, bits = fmt
    if audio_format != 1 or channels != 1 or bits != 16:
        raise ValueError(
            f"unsupported WAV: format={audio_format} channels={channels} "
            f"bits={bits} (PCM mono 16-bit only)"
        )
    if len(data) % 2:
        data = data[:-1]
    return np.frombuffer(data, dtype="<i2"), int(rate)


def synth_wav_payloads(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Deterministic REAL-WAV fixture payloads: the text's UTF-8 byte
    pairs reinterpreted as little-endian int16 samples (trailing odd
    byte dropped; fewer than 2 bytes -> one zero sample) at sample
    rate 8000·(1 + id%3) — the audio twin of synth_png_payloads.
    Spark-side (mapInPandas), scales with the corpus."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                bs = np.frombuffer(
                    (text or "").encode("utf-8"), dtype=np.uint8
                )
                ns = bs.size // 2
                if ns == 0:
                    samples = np.zeros(1, dtype="<i2")
                else:
                    samples = bs[: ns * 2].view("<i2")
                payloads.append(
                    encode_wav(samples, 8000 * (1 + int(doc_id) % 3))
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "payload": pd.Series(payloads, dtype=object),
                }
            )

    return docs.mapInPandas(run, schema="doc_id bigint, payload binary")


def decode_audio_features(mm: DataFrame, decode=decode_wav) -> DataFrame:
    """Decode → per-clip audio summary over binary payloads, one
    mapInPandas stage (decoder initialized once per task): sample
    count, rate, exact integer duration (µs DIV), peak amplitude,
    energy Σs² and mean |s| in micro units — the stats an ASR-corpus
    intake computes before any resampler runs.  ALL-integer outputs so
    the gate needs no float tolerance; the waveform itself never
    leaves the stage (the decode_transform_2d discipline — at 100 TB
    you don't shuffle PCM)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        codec = decode
        for pdf in batches:
            ns_l, rate_l, dur_l, peak_l, en_l, ma_l = [], [], [], [], [], []
            for payload in pdf["payload"]:
                s, rate = codec(bytes(payload) if payload is not None else b"")
                a = s.astype(np.int64)
                ns = int(a.size)
                ns_l.append(ns)
                rate_l.append(rate)
                dur_l.append(ns * 1_000_000 // rate)
                peak_l.append(int(np.abs(a).max()) if ns else 0)
                en_l.append(int((a * a).sum()))
                ma_l.append(
                    int(np.abs(a).sum()) * 1_000_000 // ns if ns else 0
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_samples": pd.Series(ns_l, dtype="int64"),
                    "sample_rate": pd.Series(rate_l, dtype="int64"),
                    "duration_us": pd.Series(dur_l, dtype="int64"),
                    "peak": pd.Series(peak_l, dtype="int64"),
                    "energy": pd.Series(en_l, dtype="int64"),
                    "mean_abs_micro": pd.Series(ma_l, dtype="int64"),
                }
            )

    return mm.mapInPandas(
        run,
        schema=(
            "doc_id bigint, n_samples bigint, sample_rate bigint, "
            "duration_us bigint, peak bigint, energy bigint, "
            "mean_abs_micro bigint"
        ),
    )
