"""WAV codec + audio-features batch."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from dane_visual_feature_extraction_worker_spark.multimodal import (
    decode_audio_features,
    decode_wav,
    encode_wav,
    synth_wav_payloads,
)


def test_wav_roundtrip():
    s = np.array([0, 1, -1, 32767, -32768, 1234], dtype=np.int16)
    out, rate = decode_wav(encode_wav(s, 16000))
    assert rate == 16000
    assert np.array_equal(out, s)


def test_wav_golden_bytes():
    # spec-literal check of the container layout
    payload = encode_wav(np.array([258], dtype=np.int16), 8000)
    assert payload[:4] == b"RIFF"
    assert payload[8:12] == b"WAVE"
    assert payload[12:16] == b"fmt "
    fmt = struct.unpack("<HHIIHH", payload[20:36])
    assert fmt == (1, 1, 8000, 16000, 2, 16)
    assert payload[36:40] == b"data"
    assert payload[44:46] == bytes([2, 1])  # 258 little-endian


def test_wav_tolerates_extra_chunks():
    s = np.array([5, -5], dtype=np.int16)
    p = encode_wav(s, 8000)
    # splice a LIST chunk (odd length -> exercises word alignment)
    extra = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"
    spliced = p[:12] + extra + p[12:]
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    out, rate = decode_wav(spliced)
    assert np.array_equal(out, s) and rate == 8000


@pytest.mark.parametrize(
    "mutate",
    [
        lambda p: b"JUNK" + p[4:],                      # bad magic
        lambda p: p[:20] + struct.pack("<H", 3) + p[22:],   # ADPCM
        lambda p: p[:22] + struct.pack("<H", 2) + p[24:],   # stereo
        lambda p: p[:34] + struct.pack("<H", 8) + p[36:],   # 8-bit
    ],
)
def test_wav_rejects_unsupported(mutate):
    p = encode_wav(np.array([1], dtype=np.int16), 8000)
    with pytest.raises(ValueError):
        decode_wav(mutate(p))


def test_wav_features_spark(spark):
    docs = spark.createDataFrame(
        [(0, "ab"), (1, "abc"), (2, ""), (3, None)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r
        for r in decode_audio_features(synth_wav_payloads(docs)).collect()
    }
    # doc 0: 'ab' = bytes 97,98 -> one sample 98*256+97 = 25185 @ 8000
    assert got[0]["n_samples"] == 1
    assert got[0]["sample_rate"] == 8000
    assert got[0]["peak"] == 25185
    assert got[0]["energy"] == 25185 * 25185
    assert got[0]["duration_us"] == 1_000_000 // 8000
    # doc 1: 'abc' -> odd trailing byte dropped, still one sample @16000
    assert got[1]["n_samples"] == 1 and got[1]["sample_rate"] == 16000
    # docs 2/3: empty/null -> one zero sample
    for d in (2, 3):
        assert got[d]["n_samples"] == 1
        assert got[d]["peak"] == 0 and got[d]["energy"] == 0
        assert got[d]["mean_abs_micro"] == 0


def test_wav_negative_sample_math(spark):
    # byte pair (0x00, 0xFF) -> 0xFF00 = -256 as int16
    docs = spark.createDataFrame([(0, "\x00ÿ")], "doc_id long, text string")
    # 'ÿ' is U+00FF -> UTF-8 is 2 bytes (0xC3 0xBF): construct via bytes
    import pandas as pd

    pdf = pd.DataFrame({"doc_id": [0], "payload": [
        encode_wav(np.array([-256], dtype=np.int16), 8000)
    ]})
    mm = spark.createDataFrame(pdf)
    r = decode_audio_features(mm).first()
    assert r["peak"] == 256
    assert r["energy"] == 256 * 256
    assert r["mean_abs_micro"] == 256 * 1_000_000
