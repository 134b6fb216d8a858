"""From-scratch baseline JPEG codec: golden, round-trip, and
distributed-gate tests (reference input format: JPEG keyframes,
data_handling.py:31-32, 101-109)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from dane_visual_feature_extraction_worker_spark.jpeg import (
    QUANT_LUMA,
    _quality_scale,
    decode_jpeg,
    encode_jpeg,
)


def test_quality_100_quantizers_are_all_ones():
    # the exactness argument of the gated entry rests on this corner
    assert (_quality_scale(QUANT_LUMA, 100) == 1).all()
    assert (_quality_scale(QUANT_LUMA, 50) == QUANT_LUMA).all()


def test_block_constant_roundtrip_exact_q100():
    # constant 8x8 blocks -> one integer DC coefficient per block ->
    # the REAL lossy pipeline is bit-exact at quality 100
    rng = np.random.RandomState(7)
    for hb, wb in [(1, 1), (2, 3), (3, 4)]:
        blocks = rng.randint(0, 256, size=(hb, wb), dtype=np.uint8)
        img = np.repeat(np.repeat(blocks, 8, 0), 8, 1)
        out = decode_jpeg(encode_jpeg(img, quality=100))
        assert out.dtype == np.uint8 and out.shape == img.shape
        np.testing.assert_array_equal(out, img)


def test_constant_image_exact_any_quality():
    # DC = 8*(v-128); any quantizer reproduces a constant image within
    # one DC step — at v where Q0 divides the DC exactly, bit-exact
    img = np.full((24, 16), 128, dtype=np.uint8)  # DC diff = 0 exactly
    for q in (25, 50, 75, 90, 100):
        np.testing.assert_array_equal(decode_jpeg(encode_jpeg(img, q)), img)


def test_smooth_gradient_roundtrip_tolerance():
    y, x = np.mgrid[0:32, 0:48]
    img = ((y * 3 + x * 2) % 256).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=95))
    # smooth content at q95: worst-case per-pixel error stays small
    assert out.shape == img.shape
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.max() <= 12 and err.mean() <= 3.0


def test_rgb_roundtrip_tolerance_and_constant():
    rgb = np.zeros((16, 24, 3), dtype=np.uint8)
    rgb[..., 0], rgb[..., 1], rgb[..., 2] = 200, 80, 30
    out = decode_jpeg(encode_jpeg(rgb, quality=100))
    assert out.shape == rgb.shape
    # color-space conversion rounds each direction: +-2 per channel
    assert np.abs(out.astype(int) - rgb.astype(int)).max() <= 2
    y, x = np.mgrid[0:16, 0:24]
    grad = np.stack(
        [(y * 5) % 256, (x * 5) % 256, ((x + y) * 3) % 256], axis=-1
    ).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(grad, quality=95))
    assert np.abs(out.astype(int) - grad.astype(int)).mean() <= 4.0


def test_non_multiple_of_8_dims_crop():
    img = (np.arange(11 * 13, dtype=np.int64) % 256).astype(
        np.uint8
    ).reshape(11, 13)
    out = decode_jpeg(encode_jpeg(img, quality=95))
    assert out.shape == (11, 13)


def test_decoder_spec_golden_handbuilt_dc_only():
    """Decoder golden test INDEPENDENT of the encoder: a minimal
    baseline JPEG hand-assembled from the T.81 spec — one 8x8
    grayscale block, all-ones quantizer, DC category 4 with value
    diff=+8 (bits '1000'), immediate EOB. DC 8 -> IDCT constant
    8/8 = 1 -> +128 = 129 everywhere."""
    dqt = b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + b"\x01" * 64
    sof = (
        b"\xff\xc0" + struct.pack(">H", 11)
        + bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0])
    )
    # DC table: one code of length 2 -> value 4 (category 4)
    dc_bits = [0, 1] + [0] * 14
    dht_dc = (
        b"\xff\xc4" + struct.pack(">H", 2 + 1 + 16 + 1)
        + b"\x00" + bytes(dc_bits) + bytes([4])
    )
    # AC table: one code of length 2 -> value 0x00 (EOB)
    dht_ac = (
        b"\xff\xc4" + struct.pack(">H", 2 + 1 + 16 + 1)
        + b"\x10" + bytes(dc_bits) + bytes([0])
    )
    sos = (
        b"\xff\xda" + struct.pack(">H", 8)
        + bytes([1, 1, 0x00, 0, 63, 0])
    )
    # entropy: DC code '00' + 4 magnitude bits '1000' (=+8), EOB '00'
    # -> bits 00 1000 00, padded with 1s to a byte: 0b00100000 -> 0x20
    ecs = bytes([0b00100000])
    jpg = b"\xff\xd8" + dqt + sof + dht_dc + dht_ac + sos + ecs + b"\xff\xd9"
    out = decode_jpeg(jpg)
    np.testing.assert_array_equal(
        out, np.full((8, 8), 129, dtype=np.uint8)
    )


def test_decode_rejects_garbage():
    with pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg")
    with pytest.raises(ValueError):
        decode_jpeg(b"")


def test_synth_jpeg_payloads_gate_shape(spark):
    from dane_visual_feature_extraction_worker_spark.multimodal import (
        decode_transform_2d,
        synth_jpeg_payloads,
    )

    docs = spark.createDataFrame(
        [(1, "hello world"), (2, ""), (5, "abcé")],
        "doc_id long, text string",
    )
    out = decode_transform_2d(
        synth_jpeg_payloads(docs), out_h=16, out_w=16, decode=decode_jpeg
    ).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[1]["src_h"] == 8 * (1 + 1 % 3)
    assert by_id[1]["src_w"] == 8 * (1 + 1 % 4)
    # empty text -> all-zero blocks -> z_min == z_max == (0-1.93)/17.89
    z0 = float(
        (np.float32(0) - np.float32(1.93)) / np.float32(17.89)
    )
    assert by_id[2]["z_min"] == pytest.approx(z0, abs=0)
    assert by_id[2]["z_max"] == pytest.approx(z0, abs=0)
    # block-constant exactness: min/max must equal exact byte extremes
    bs = "hello world".encode("utf-8")
    hb, wb = 1 + 1 % 3, 1 + 1 % 4
    tiles = np.resize(np.frombuffer(bs, np.uint8), (hb, wb))
    # doc 1 is a (16, 16) image: resize 16x16 is the identity, so the
    # resized index set covers every block
    z = (tiles.astype(np.float32) - np.float32(1.93)) / np.float32(17.89)
    assert by_id[1]["z_min"] == pytest.approx(float(z.min()), abs=0)
    assert by_id[1]["z_max"] == pytest.approx(float(z.max()), abs=0)


def test_decoder_restart_markers_handbuilt():
    """DRI/RSTn path: a 16x8 image (two MCUs), restart interval 1, so
    an RST0 marker sits between the two blocks and the DC predictor
    resets — both blocks carry diff=+8, so BOTH come out 129 (without
    the reset the second would be 130)."""
    dqt = b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + b"\x01" * 64
    sof = (
        b"\xff\xc0" + struct.pack(">H", 11)
        + bytes([8]) + struct.pack(">HH", 8, 16) + bytes([1, 1, 0x11, 0])
    )
    dc_bits = [0, 1] + [0] * 14
    dht_dc = (
        b"\xff\xc4" + struct.pack(">H", 2 + 1 + 16 + 1)
        + b"\x00" + bytes(dc_bits) + bytes([4])
    )
    dht_ac = (
        b"\xff\xc4" + struct.pack(">H", 2 + 1 + 16 + 1)
        + b"\x10" + bytes(dc_bits) + bytes([0])
    )
    dri = b"\xff\xdd" + struct.pack(">H", 4) + struct.pack(">H", 1)
    sos = (
        b"\xff\xda" + struct.pack(">H", 8)
        + bytes([1, 1, 0x00, 0, 63, 0])
    )
    mcu = bytes([0b00100000])  # DC '00' + '1000' (+8), EOB '00', pad 1s
    jpg = (
        b"\xff\xd8" + dqt + sof + dht_dc + dht_ac + dri + sos
        + mcu + b"\xff\xd0" + mcu + b"\xff\xd9"
    )
    out = decode_jpeg(jpg)
    np.testing.assert_array_equal(
        out, np.full((8, 16), 129, dtype=np.uint8)
    )


def test_decoder_missing_restart_raises():
    dqt = b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + b"\x01" * 64
    sof = (
        b"\xff\xc0" + struct.pack(">H", 11)
        + bytes([8]) + struct.pack(">HH", 8, 16) + bytes([1, 1, 0x11, 0])
    )
    dc_bits = [0, 1] + [0] * 14
    dht_dc = (
        b"\xff\xc4" + struct.pack(">H", 2 + 1 + 16 + 1)
        + b"\x00" + bytes(dc_bits) + bytes([4])
    )
    dht_ac = (
        b"\xff\xc4" + struct.pack(">H", 2 + 1 + 16 + 1)
        + b"\x10" + bytes(dc_bits) + bytes([0])
    )
    dri = b"\xff\xdd" + struct.pack(">H", 4) + struct.pack(">H", 1)
    sos = (
        b"\xff\xda" + struct.pack(">H", 8)
        + bytes([1, 1, 0x00, 0, 63, 0])
    )
    mcu = bytes([0b00100000])
    # two MCUs, interval 1, but NO RST0 between them
    jpg = (
        b"\xff\xd8" + dqt + sof + dht_dc + dht_ac + dri + sos
        + mcu + mcu + b"\xff\xd9"
    )
    with pytest.raises(ValueError):
        decode_jpeg(jpg)


def test_decoder_truncated_entropy_raises():
    """Entropy data cut mid-block: the 0xFF pad tail must surface as
    an invalid-code ValueError, never an IndexError."""
    img = np.arange(64 * 96, dtype=np.uint8).reshape(64, 96) % 251
    payload = encode_jpeg(img, quality=90)
    sos_at = payload.find(b"\xff\xda")
    cut = payload[: sos_at + 40]  # a few entropy bytes, then nothing
    with pytest.raises(ValueError):
        decode_jpeg(cut)


def test_decoder_420_chroma_subsampling_handbuilt():
    """Hand-assembled 4:2:0 JPEG (luma 2x2, chroma 1x1 — 4 Y blocks +
    Cb + Cr per MCU): exercises the interleaved multi-block MCU walk
    and the nearest-neighbor chroma upsample. Constant blocks with
    unit quantizers make the expected RGB exact: Y=+8 -> 129,
    Cr=+8 -> (130, 128, 129) after the JFIF conversion."""
    dqt = b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + b"\x01" * 64
    sof = (
        b"\xff\xc0" + struct.pack(">H", 17)
        + bytes([8]) + struct.pack(">HH", 16, 16) + bytes([3])
        + bytes([1, 0x22, 0]) + bytes([2, 0x11, 0]) + bytes([3, 0x11, 0])
    )
    dc_bits = [0, 2] + [0] * 14   # '00' -> cat 0, '01' -> cat 4
    dht_dc = (
        b"\xff\xc4" + struct.pack(">H", 2 + 1 + 16 + 2)
        + b"\x00" + bytes(dc_bits) + bytes([0, 4])
    )
    ac_bits = [0, 1] + [0] * 14   # '00' -> EOB
    dht_ac = (
        b"\xff\xc4" + struct.pack(">H", 2 + 1 + 16 + 1)
        + b"\x10" + bytes(ac_bits) + bytes([0])
    )
    sos = (
        b"\xff\xda" + struct.pack(">H", 12)
        + bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0])
    )
    # Y1: '01'+'1000' (+8), EOB; Y2-4: cat0, EOB; Cb: cat0, EOB;
    # Cr: '01'+'1000' (+8), EOB  ->  0x60 0x00 0x00 0x60
    scan = bytes([0x60, 0x00, 0x00, 0x60])
    jpg = b"\xff\xd8" + dqt + sof + dht_dc + dht_ac + sos + scan + b"\xff\xd9"
    out = decode_jpeg(jpg)
    assert out.shape == (16, 16, 3)
    np.testing.assert_array_equal(
        out, np.broadcast_to(np.array([130, 128, 129], np.uint8), (16, 16, 3))
    )
