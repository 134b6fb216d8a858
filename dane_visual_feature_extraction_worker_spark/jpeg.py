"""From-scratch baseline-sequential JPEG codec (encode + decode).

The reference's video input is literally JPEG keyframes — one
``<ts>.jpg`` per shot, loaded with PIL and batch-fed to the CNN
(reference data_handling.py:31-32, 101-109). No image library ships in
this container, so this module implements the baseline-sequential JPEG
subset (ITU-T T.81) directly on numpy + stdlib:

- **encode_jpeg**: 8-bit grayscale or RGB 4:4:4, JFIF container,
  Annex-K quantization tables scaled by the IJG quality formula,
  Annex-K Huffman tables, level shift -> 8x8 float DCT-II -> quantize
  -> zigzag -> DC-differential + AC run/size entropy coding with byte
  stuffing.
- **decode_jpeg**: the general inverse — DQT (8/16-bit), SOF0, DHT,
  DRI/RSTn restart markers, 1- or 3-component scans with sampling
  factors up to 2x2 (4:4:4, 4:2:2, 4:2:0), Huffman decode, dequantize,
  inverse zigzag, float IDCT, nearest-neighbor chroma upsampling, JFIF
  YCbCr -> RGB.

Exactness property used by the oracle gate (driver_queries
``multimodal_decode_jpeg``): at quality=100 the IJG scaling clamps
every quantizer step to 1, and an image that is CONSTANT within each
8x8 block has one nonzero coefficient per block (DC = 8*(v-128), an
exact integer; float DCT error ~1e-12 is killed by round()), so
encode -> decode is bit-exact end to end even though the codec is the
real lossy pipeline. Smooth non-blockwise images round-trip within the
usual quantization tolerance (property-tested).

Performance posture: the codec is the per-payload Python inside a
``mapInPandas`` stage (the documented slow-path seam for media decode,
multimodal.py module docstring). The entropy decoder is table-driven:
the scan is byte-unstuffed and split at restart markers ONCE, then each
Huffman symbol resolves with a single 16-bit-peek list lookup
(``_dec_lut``) and magnitude bits come out in one mask op — no per-bit
tree walk. IDCT, dequantization, and inverse zigzag are batched over
all blocks of a component in one einsum after the scan, so the
per-symbol Python loop is the only remaining serial part, which is
inherent to sequential entropy coding (~52 ms for a worst-case
random-noise QVGA grayscale frame; block-sparse real content decodes
proportionally to its nonzero coefficient count).
"""

from __future__ import annotations

import functools
import struct

import numpy as np

# --- tables (ITU-T T.81 Annex K) --------------------------------------

QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32).reshape(8, 8)

QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32).reshape(8, 8)

# zigzag[k] = (row, col) of the k-th coefficient in scan order
_ZZ = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K Huffman specs: (bits[1..16] code-count list, value list)
_DC_LUMA_SPEC = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA_SPEC = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA_SPEC = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_AC_CHROMA_SPEC = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)

# orthonormal 8-point DCT-II matrix: forward A = C B C^T, inverse
# B = C^T A C; float64 keeps the constant-block error ~1e-12, far
# below the round() threshold the gate's exactness argument needs
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16) * (
            np.sqrt(0.125) if _k == 0 else 0.5
        )


def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: 100 -> every step clamps to 1 (the lossless
    corner the oracle gate uses), 50 -> the Annex-K table verbatim."""
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((table * scale + 50) // 100, 1, 255).astype(np.int32)


def _build_code_lengths(spec):
    """spec -> [(value, code, length)] in T.81 C.2 canonical order."""
    bits, values = spec
    out = []
    code = 0
    idx = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out.append((values[idx], code, ln))
            code += 1
            idx += 1
        code <<= 1
    return out


def _enc_table(spec):
    return {v: (c, ln) for v, c, ln in _build_code_lengths(spec)}


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # pad with 1-bits per spec
        return bytes(self.buf)


def _magnitude(v: int) -> tuple[int, int]:
    """v -> (category, extra bits) per T.81 F.1.2.1 (one's-complement
    encoding of negatives)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    cat = a.bit_length()
    return cat, (v if v > 0 else v + (1 << cat) - 1)


def _fdct_quant(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """(H, W) uint8 plane -> (nby, nbx, 64) int32 zigzagged quantized
    coefficients; H, W must be multiples of 8 (caller edge-pads)."""
    h, w = plane.shape
    s = plane.astype(np.float64) - 128.0
    blocks = s.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)
    coefs = np.einsum("ij,abjk,lk->abil", _C, blocks, _C)
    zz = np.round(coefs / q).astype(np.int32).reshape(
        h // 8, w // 8, 64
    )[:, :, _ZZ]
    return zz


def _encode_scan(planes, qtabs, writer: "_BitWriter") -> None:
    """Interleave blocks component-major per MCU (all planes here are
    full-resolution: the encoder emits 4:4:4 only, so an MCU is one
    block per component)."""
    enc_dc = [_enc_table(_DC_LUMA_SPEC), _enc_table(_DC_CHROMA_SPEC)]
    enc_ac = [_enc_table(_AC_LUMA_SPEC), _enc_table(_AC_CHROMA_SPEC)]
    zz = [_fdct_quant(p, qtabs[min(i, 1)]) for i, p in enumerate(planes)]
    nby, nbx = zz[0].shape[:2]
    pred = [0] * len(planes)
    for by in range(nby):
        for bx in range(nbx):
            for ci in range(len(planes)):
                tsel = min(ci, 1)
                blk = zz[ci][by, bx]
                diff = int(blk[0]) - pred[ci]
                pred[ci] = int(blk[0])
                cat, extra = _magnitude(diff)
                code, ln = enc_dc[tsel][cat]
                writer.put(code, ln)
                if cat:
                    writer.put(extra, cat)
                run = 0
                last_nz = 0
                nz = np.nonzero(blk[1:])[0]
                last_nz = (nz[-1] + 1) if nz.size else 0
                for k in range(1, last_nz + 1):
                    v = int(blk[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = enc_ac[tsel][0xF0]  # ZRL
                        writer.put(code, ln)
                        run -= 16
                    cat, extra = _magnitude(v)
                    code, ln = enc_ac[tsel][(run << 4) | cat]
                    writer.put(code, ln)
                    writer.put(extra, cat)
                    run = 0
                if last_nz < 63:
                    code, ln = enc_ac[tsel][0x00]  # EOB
                    writer.put(code, ln)


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    return np.clip(
        np.round(np.stack([y, cb, cr], axis=-1)), 0, 255
    ).astype(np.uint8)


def _pad_to_8(plane: np.ndarray) -> np.ndarray:
    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def _dht_segment(tclass: int, tid: int, spec) -> bytes:
    bits, values = spec
    payload = bytes([(tclass << 4) | tid]) + bytes(bits) + bytes(values)
    return b"\xff\xc4" + struct.pack(">H", len(payload) + 2) + payload


def encode_jpeg(arr: np.ndarray, quality: int = 90) -> bytes:
    """Baseline-sequential JFIF encode of (H, W) grayscale or (H, W, 3)
    RGB uint8; 4:4:4 (no chroma subsampling)."""
    if arr.dtype != np.uint8:
        raise ValueError("encode_jpeg expects uint8")
    if arr.ndim == 2:
        planes = [_pad_to_8(arr)]
    elif arr.ndim == 3 and arr.shape[2] == 3:
        ycc = _rgb_to_ycbcr(arr)
        planes = [_pad_to_8(ycc[..., i]) for i in range(3)]
    else:
        raise ValueError("encode_jpeg expects (H,W) or (H,W,3) uint8")
    h, w = arr.shape[:2]
    ncomp = len(planes)
    qtabs = [
        _quality_scale(QUANT_LUMA, quality),
        _quality_scale(QUANT_CHROMA, quality),
    ][: (2 if ncomp == 3 else 1)]

    out = bytearray(b"\xff\xd8")  # SOI
    out += (
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00"
        + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + bytes([0, 0])
    )
    for tid, q in enumerate(qtabs):
        flat = q.reshape(64)[_ZZ]  # stored in zigzag order
        out += (
            b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid])
            + bytes(int(v) for v in flat)
        )
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, min(ci, 1)])  # 1x1 sampling
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment(0, 0, _DC_LUMA_SPEC)
    out += _dht_segment(1, 0, _AC_LUMA_SPEC)
    if ncomp == 3:
        out += _dht_segment(0, 1, _DC_CHROMA_SPEC)
        out += _dht_segment(1, 1, _AC_CHROMA_SPEC)
    sos = bytes([ncomp])
    for ci in range(ncomp):
        t = min(ci, 1)
        sos += bytes([ci + 1, (t << 4) | t])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
    writer = _BitWriter()
    _encode_scan(planes, qtabs, writer)
    out += writer.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --- decoder ----------------------------------------------------------


@functools.lru_cache(maxsize=64)
def _dec_lut(bits: tuple[int, ...], values: tuple[int, ...]) -> list[int]:
    """16-bit-peek Huffman LUT: entry = (codelen << 8) | value for every
    16-bit word whose prefix is the code; 0 = invalid. One list index
    replaces the per-bit tree walk — the classic table-driven decoder
    (T.81 only bounds codes at 16 bits, so one table covers any code).
    Cached per table spec: real corpora reuse a handful of tables (most
    encoders ship Annex K verbatim), and the 64K-entry list build is
    ~70% of small-image decode time when rebuilt per frame."""
    lut = np.zeros(1 << 16, dtype=np.uint16)
    code = 0
    vi = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            lo = code << (16 - ln)
            hi = (code + 1) << (16 - ln)
            lut[lo:hi] = (ln << 8) | values[vi]
            vi += 1
            code += 1
        code <<= 1
    return lut.tolist()


def _split_ecs(d: bytes, pos: int) -> list[bytes]:
    """Slice the entropy-coded data into restart-interval chunks,
    byte-unstuffed (0xFF00 -> 0xFF) and padded with 0xFFFF so trailing
    partial lookups terminate. Chunk k+1 starts after RSTn marker k;
    any other marker ends the scan."""
    chunks: list[bytes] = []
    start = i = pos
    n = len(d)
    while True:
        j = d.find(b"\xff", i)
        if j < 0 or j + 1 >= n:
            chunks.append(d[start:n].replace(b"\xff\x00", b"\xff"))
            break
        nxt = d[j + 1]
        if nxt == 0x00:
            i = j + 2
            continue
        if 0xD0 <= nxt <= 0xD7:  # RSTn: chunk boundary
            chunks.append(d[start:j].replace(b"\xff\x00", b"\xff"))
            start = i = j + 2
            continue
        chunks.append(d[start:j].replace(b"\xff\x00", b"\xff"))
        break
    return [c + b"\xff\xff" for c in chunks]


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode baseline-sequential JFIF/JPEG bytes -> (H, W) uint8
    grayscale or (H, W, 3) uint8 RGB. Supports DQT 8/16-bit, multiple
    DHT per segment, DRI/RSTn, sampling factors up to 2x2."""
    d = payload
    if d[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    comps = []  # (id, hsamp, vsamp, qsel)
    h = w = 0
    restart_interval = 0
    scan_comps = []

    while pos + 4 <= len(d):
        if d[pos] != 0xFF:
            pos += 1
            continue
        marker = d[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack(">H", d[pos + 2 : pos + 4])
        seg = d[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            sp = 0
            while sp < len(seg):
                prec, tid = seg[sp] >> 4, seg[sp] & 0xF
                sp += 1
                if prec:
                    vals = np.frombuffer(
                        seg[sp : sp + 128], dtype=">u2"
                    ).astype(np.int32)
                    sp += 128
                else:
                    vals = np.frombuffer(
                        seg[sp : sp + 64], dtype=np.uint8
                    ).astype(np.int32)
                    sp += 64
                q = np.zeros(64, dtype=np.int32)
                q[_ZZ] = vals  # stored zigzagged
                qtabs[tid] = q.reshape(8, 8)
        elif marker == 0xC0:  # SOF0 baseline
            h, w = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            comps = []
            for ci in range(ncomp):
                cid, samp, qsel = seg[6 + 3 * ci : 9 + 3 * ci]
                comps.append((cid, samp >> 4, samp & 0xF, qsel))
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG SOF{marker - 0xC0} (baseline "
                "sequential only)"
            )
        elif marker == 0xC4:  # DHT
            sp = 0
            while sp < len(seg):
                tclass, tid = seg[sp] >> 4, seg[sp] & 0xF
                bits = tuple(seg[sp + 1 : sp + 17])
                nval = sum(bits)
                values = tuple(seg[sp + 17 : sp + 17 + nval])
                tab = _dec_lut(bits, values)
                (dc_tabs if tclass == 0 else ac_tabs)[tid] = tab
                sp += 17 + nval
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan_comps = []
            for ci in range(ns):
                cid, tsel = seg[1 + 2 * ci : 3 + 2 * ci]
                scan_comps.append((cid, tsel >> 4, tsel & 0xF))
            pos = pos + 2 + seglen
            break
        pos += 2 + seglen
    else:
        raise ValueError("JPEG missing SOS")
    if not comps or not scan_comps:
        raise ValueError("JPEG missing SOF0/SOS")

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax > 2 or vmax > 2:
        raise ValueError("sampling factors above 2x2 unsupported")
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    # per-component dense coefficient store: (block_rows, block_cols, 64)
    coefs = []
    for cid, hs, vs, qsel in comps:
        coefs.append(
            np.zeros((mcuy * vs, mcux * hs, 64), dtype=np.int32)
        )
    # per-component (dc_lut, ac_lut) resolved once, not per MCU
    luts = []
    for cid, hs, vs, qsel in comps:
        sc = next(s for s in scan_comps if s[0] == cid)
        luts.append((dc_tabs[sc[1]], ac_tabs[sc[2]]))

    chunks = _split_ecs(d, pos)
    n_restarts = (
        (mcux * mcuy - 1) // restart_interval if restart_interval else 0
    )
    if len(chunks) < n_restarts + 1:
        raise ValueError("expected RSTn marker")

    # fast table-driven entropy decode: 16-bit peek -> (len, value) in
    # one list index; magnitude bits read in one mask op. acc/nbits is
    # the usual shift register refilled a byte at a time from the
    # unstuffed chunk; past the end the refill feeds 0xFF pad bits
    # (same semantics as a T.81 1-padded tail), so truncated data hits
    # the invalid-code check instead of running off the buffer.
    chunk_i = 0
    cb = chunks[0]
    ncb = len(cb)
    bpos = acc = nbits = 0
    pred = [0] * len(comps)
    mcu_done = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_done and (
                mcu_done % restart_interval == 0
            ):
                chunk_i += 1
                if chunk_i >= len(chunks):
                    raise ValueError("expected RSTn marker")
                cb = chunks[chunk_i]
                ncb = len(cb)
                bpos = acc = nbits = 0
                pred = [0] * len(comps)
            for ci, (cid, hs, vs, qsel) in enumerate(comps):
                dct, act = luts[ci]
                cc = coefs[ci]
                for by in range(vs):
                    for bx in range(hs):
                        zz = [0] * 64
                        while nbits < 16:
                            acc = (acc << 8) | (
                                cb[bpos] if bpos < ncb else 0xFF
                            )
                            bpos += 1
                            nbits += 8
                        e = dct[(acc >> (nbits - 16)) & 0xFFFF]
                        if e == 0:
                            raise ValueError("invalid JPEG Huffman code")
                        nbits -= e >> 8
                        cat = e & 0xFF
                        if cat:
                            while nbits < cat:
                                acc = (acc << 8) | (
                                    cb[bpos] if bpos < ncb else 0xFF
                                )
                                bpos += 1
                                nbits += 8
                            v = (acc >> (nbits - cat)) & ((1 << cat) - 1)
                            nbits -= cat
                            if v < (1 << (cat - 1)):
                                v += 1 - (1 << cat)
                            pred[ci] += v
                        zz[0] = pred[ci]
                        k = 1
                        while k <= 63:
                            while nbits < 16:
                                acc = (acc << 8) | (
                                    cb[bpos] if bpos < ncb else 0xFF
                                )
                                bpos += 1
                                nbits += 8
                            e = act[(acc >> (nbits - 16)) & 0xFFFF]
                            if e == 0:
                                raise ValueError("invalid JPEG Huffman code")
                            nbits -= e >> 8
                            rs = e & 0xFF
                            if rs == 0x00:  # EOB
                                break
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += rs >> 4
                            if k > 63:
                                raise ValueError("AC index overflow")
                            cat = rs & 0xF
                            while nbits < cat:
                                acc = (acc << 8) | (
                                    cb[bpos] if bpos < ncb else 0xFF
                                )
                                bpos += 1
                                nbits += 8
                            v = (acc >> (nbits - cat)) & ((1 << cat) - 1)
                            nbits -= cat
                            if v < (1 << (cat - 1)):
                                v += 1 - (1 << cat)
                            zz[k] = v
                            k += 1
                        acc &= (1 << nbits) - 1
                        cc[my * vs + by, mx * hs + bx] = zz
            mcu_done += 1

    # batched dequantize + inverse zigzag + IDCT per component: one
    # einsum over all blocks replaces the per-block 8x8 matmuls
    out_planes = []
    for ci, (cid, hs, vs, qsel) in enumerate(comps):
        q = qtabs[qsel].reshape(64)[_ZZ]  # quant steps in zigzag order
        br, bc, _ = coefs[ci].shape
        deq = coefs[ci].astype(np.float64) * q
        blocks = np.zeros((br, bc, 64), dtype=np.float64)
        blocks[:, :, _ZZ] = deq
        blocks = blocks.reshape(br, bc, 8, 8)
        spat = np.einsum("ki,rckl,lj->rcij", _C, blocks, _C)
        p = spat.transpose(0, 2, 1, 3).reshape(br * 8, bc * 8)
        if hs < hmax or vs < vmax:  # nearest-neighbor upsample
            p = np.repeat(np.repeat(p, vmax // vs, 0), hmax // hs, 1)
        out_planes.append(p[:h, :w])
    if len(out_planes) == 1:
        y = np.clip(np.round(out_planes[0] + 128.0), 0, 255)
        return y.astype(np.uint8)
    y = out_planes[0] + 128.0
    cb = out_planes[1]
    cr = out_planes[2]
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
