"""Tar archive ingestion (A16) + real 2-D decode transform.

Reference behaviors covered: tar.gz work units expanded to member
files (io_util.py:247-303), per-item decode → resize → z-normalize
(data_handling.py:62-69; get_sepectogram.py:63-64 constants)."""

from __future__ import annotations

import hashlib

import numpy as np
import pyspark.sql.functions as F
import pytest

from dane_visual_feature_extraction_worker_spark.multimodal import (
    ZNORM_MEAN,
    ZNORM_STD,
    decode_ppm,
    decode_transform_2d,
    encode_ppm,
    extract_features,
    resize_nn_2d,
    synth_ppm_payloads,
    znorm_2d,
)
from dane_visual_feature_extraction_worker_spark.sources.archives import (
    build_tar_archives,
    read_tar_members,
    tar_members_to_mm,
)


@pytest.fixture()
def tar_dir(tmp_path):
    items = [
        (f"keyframes/{i}.jpg", f"payload-{i}".encode() * (i + 1))
        for i in range(10)
    ] + [("meta/provenance.json", b"{}")]
    build_tar_archives(items, str(tmp_path / "tars"), per_archive=4)
    return str(tmp_path / "tars"), dict(items)


def test_tar_members_roundtrip(spark, tar_dir):
    path, items = tar_dir
    got = read_tar_members(spark, path).collect()
    assert len(got) == len(items)
    for r in got:
        assert bytes(r["payload"]) == items[r["member"]]
        assert r["n_bytes"] == len(items[r["member"]])
    # 11 items over per_archive=4 -> 3 archives
    assert len({r["archive"] for r in got}) == 3


def test_tar_member_glob_filters_inside_expansion(spark, tar_dir):
    path, items = tar_dir
    got = read_tar_members(spark, path, member_glob="keyframes/*.jpg")
    names = {r["member"] for r in got.collect()}
    assert names == {k for k in items if k.startswith("keyframes/")}


def test_tar_plain_uncompressed(spark, tmp_path):
    build_tar_archives(
        [("a.bin", b"\x00\x01"), ("b.bin", b"xyz")],
        str(tmp_path),
        gz=False,
    )
    got = {r["member"]: bytes(r["payload"]) for r in
           read_tar_members(spark, str(tmp_path), pattern="*.tar").collect()}
    assert got == {"a.bin": b"\x00\x01", "b.bin": b"xyz"}


def test_tar_to_features_end_to_end(spark, tar_dir):
    """The reference chain: tarball -> members -> feature extraction
    (io_util untar feeding feature_extraction.py:56-63)."""
    path, items = tar_dir
    mm = tar_members_to_mm(read_tar_members(spark, path))
    out = extract_features(mm).collect()
    assert len(out) == len(items)
    md5s = {hashlib.md5(v).hexdigest() for v in items.values()}
    assert {r["payload_md5"] for r in out} == md5s
    assert all(len(r["features"]) == 8 for r in out)
    # doc_id is a stable (archive, member) hash: re-read reproduces it
    again = tar_members_to_mm(read_tar_members(spark, path)).collect()
    assert {r["doc_id"] for r in again} == {r["doc_id"] for r in out}


# --- 2-D decode ------------------------------------------------------


def test_ppm_roundtrip():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(5, 9, 3), dtype=np.uint8)
    assert (decode_ppm(encode_ppm(img)) == img).all()


def test_ppm_rejects_garbage():
    with pytest.raises(ValueError):
        decode_ppm(b"JFIF....")


def test_resize_znorm_golden_fixture():
    """Golden check of the reference transform math: resize to (2, 3)
    reads source pixels (floor(i*H/2), floor(j*W/3)); z-norm is
    (x - 1.93) / 17.89 in float32 (get_sepectogram.py:63-64)."""
    img = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    r = resize_nn_2d(img, 2, 3)
    expected_rows = [(0 * 4) // 2, (1 * 4) // 2]
    expected_cols = [(0 * 6) // 3, (1 * 6) // 3, (2 * 6) // 3]
    assert (r == img[expected_rows][:, expected_cols]).all()
    z = znorm_2d(r)
    golden = (r.astype(np.float32) - np.float32(1.93)) / np.float32(17.89)
    assert z.dtype == np.float32
    np.testing.assert_allclose(z, golden, rtol=0, atol=0)


def test_decode_transform_2d_spark_matches_numpy(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i} body " * (i + 1)) for i in range(12)],
        "doc_id long, text string",
    )
    mm = synth_ppm_payloads(docs)
    out = {r["doc_id"]: r for r in
           decode_transform_2d(mm, out_h=4, out_w=4).collect()}
    assert len(out) == 12
    for i in range(12):
        h, w = 8 + i % 5, 8 + i % 7
        bs = np.frombuffer((f"doc {i} body " * (i + 1)).encode(), np.uint8)
        img = np.resize(bs, (h, w, 3))
        z = znorm_2d(resize_nn_2d(img, 4, 4), ZNORM_MEAN, ZNORM_STD)
        r = out[i]
        assert (r["src_h"], r["src_w"]) == (h, w)
        assert r["z_mean"] == pytest.approx(float(z.mean(dtype=np.float64)))
        assert r["z_min"] == float(z.min()) and r["z_max"] == float(z.max())


def test_decode_transform_injected_decoder(spark):
    """The decoder seam takes any codec (production JPEG path)."""
    docs = spark.createDataFrame([(1, b"\x05" * 10)], "doc_id long, payload binary")

    def fixed_decoder(payload: bytes):
        return np.full((3, 3, 3), payload[0], dtype=np.uint8)

    r = decode_transform_2d(
        docs, out_h=2, out_w=2, decode=fixed_decoder
    ).collect()[0]
    z = znorm_2d(np.full((2, 2, 3), 5, np.uint8))
    assert r["z_mean"] == pytest.approx(float(z.mean(dtype=np.float64)))


def test_archive_sink_roundtrip(spark, tmp_path):
    """A15 twin: per-entity tarballs written executor-side, manifest
    returned; read_tar_members round-trips every payload, and re-running
    reproduces byte-identical archives (idempotent publish)."""
    import os

    from dane_visual_feature_extraction_worker_spark.sources.archives import (
        archive_sink,
    )

    rows = [
        (f"ent{e}", f"files/{m}.bin", bytes([e * 16 + m]) * (m + 1))
        for e in range(3)
        for m in range(4)
    ]
    df = spark.createDataFrame(
        rows, "entity string, member string, payload binary"
    )
    out = str(tmp_path / "sink")
    manifest = {r["entity"]: r for r in archive_sink(df, out).collect()}
    assert set(manifest) == {"ent0", "ent1", "ent2"}
    for e, r in manifest.items():
        assert r["n_members"] == 4
        assert os.path.exists(r["archive"])

    back = read_tar_members(spark, out, pattern="out__*.tar.gz").collect()
    got = {(r["archive"].split("out__")[1].split(".tar")[0], r["member"]):
           bytes(r["payload"]) for r in back}
    want = {(e, m): p for e, m, p in rows}
    assert got == want

    # idempotent: second run produces byte-identical archives
    before = {e: open(r["archive"], "rb").read() for e, r in manifest.items()}
    archive_sink(df, out).collect()
    for e, r in manifest.items():
        assert open(r["archive"], "rb").read() == before[e]


def test_decode2d_empty_text_payload(spark):
    """Empty document: synth tiles a single zero byte; the transform
    yields all-zero pixels, z-min == z-max == znorm(0)."""
    docs = spark.createDataFrame([(5, "")], "doc_id long, text string")
    r = decode_transform_2d(synth_ppm_payloads(docs), out_h=4, out_w=4).collect()[0]
    z0 = float((np.float32(0) - np.float32(ZNORM_MEAN)) / np.float32(ZNORM_STD))
    assert (r["src_h"], r["src_w"]) == (8 + 5 % 5, 8 + 5 % 7)
    assert r["z_min"] == z0 and r["z_max"] == z0


def test_npz_encode_decode_roundtrip():
    from dane_visual_feature_extraction_worker_spark.multimodal import (
        decode_npz,
        encode_npz,
    )

    a = np.arange(12, dtype=np.float32).reshape(3, 4)
    blob = encode_npz({"arr_0": a})
    assert np.array_equal(decode_npz(blob), a)
    # deterministic bytes (zip member mtimes pinned to the 1980 epoch)
    assert blob == encode_npz({"arr_0": a})
    with pytest.raises(KeyError):
        decode_npz(blob, key="missing")


def test_npz_decode_rejects_pickled_members():
    """Untrusted-blob safety: object arrays need pickle; the decoder
    must refuse them (the reference loads its own prep output with
    allow_pickle=True, data_handling.py:88 — not acceptable over an
    arbitrary corpus)."""
    import io

    from dane_visual_feature_extraction_worker_spark.multimodal import decode_npz

    buf = io.BytesIO()
    np.savez(buf, arr_0=np.array([{"audio": [1, 2]}], dtype=object))
    with pytest.raises(ValueError):
        decode_npz(buf.getvalue())


def test_npz_transform_matches_numpy(spark):
    from dane_visual_feature_extraction_worker_spark.multimodal import (
        ZNORM_MEAN,
        ZNORM_STD,
        decode_transform_npz,
        synth_npz_payloads,
    )

    docs = spark.createDataFrame(
        [(0, "hello world"), (3, ""), (11, "Spark NPZ spectrogram path")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in decode_transform_npz(synth_npz_payloads(docs)).collect()
    }
    for doc_id, text in [(0, "hello world"), (3, ""), (11, "Spark NPZ spectrogram path")]:
        h, w = 8 + doc_id % 5, 8 + doc_id % 7
        bs = np.frombuffer(text.encode(), dtype=np.uint8)
        if bs.size == 0:
            bs = np.zeros(1, dtype=np.uint8)
        arr = np.resize(bs, (h, w)).astype(np.float32)
        z = (arr - np.float32(ZNORM_MEAN)) / np.float32(ZNORM_STD)
        r = out[doc_id]
        assert (r["n_rows"], r["n_cols"]) == (h, w)
        assert r["z_min"] == float(z.min())
        assert r["z_max"] == float(z.max())
        exp_mean = (
            float(arr.astype(np.float64).sum()) / arr.size - ZNORM_MEAN
        ) / ZNORM_STD
        assert r["z_mean"] == exp_mean


# --- PNG codec (r5): from-scratch baseline decoder --------------------


def test_png_roundtrip_all_color_types():
    from dane_visual_feature_extraction_worker_spark.multimodal import (
        decode_png,
        encode_png,
    )

    rng = np.random.RandomState(7)
    for shape in [(5, 7), (9, 4, 3), (6, 6, 4), (3, 5, 2), (1, 1), (16, 16, 3)]:
        a = rng.randint(0, 256, size=shape, dtype=np.uint8)
        b = decode_png(encode_png(a))
        assert b.shape == a.shape and (a == b).all()


def test_png_decoder_all_filters_match_spec_reference():
    """Hand-built PNG streams exercising every scanline filter (None/
    Sub/Up/Average/Paeth) per row, across gray/RGB/RGBA/gray+alpha,
    decoded and compared against a literal per-pixel transcription of
    the PNG spec's reconstruction recurrences — the golden-fixture
    discipline the reference applies to its own transforms
    (tests/unit/feature_extraction_test.py)."""
    import struct
    import zlib

    from dane_visual_feature_extraction_worker_spark.multimodal import (
        _PNG_SIG,
        decode_png,
    )

    rng = np.random.RandomState(3)

    def ref_decode(h, w, ch, filtered_rows, ftypes):
        out = np.zeros((h, w * ch), dtype=np.int32)
        for y in range(h):
            row = filtered_rows[y].astype(np.int32)
            ft = ftypes[y]
            prior = out[y - 1] if y > 0 else np.zeros(w * ch, dtype=np.int32)
            rec = np.zeros(w * ch, dtype=np.int32)
            for x in range(w * ch):
                left = rec[x - ch] if x >= ch else 0
                up = prior[x]
                ul = prior[x - ch] if x >= ch else 0
                if ft == 0:
                    p = 0
                elif ft == 1:
                    p = left
                elif ft == 2:
                    p = up
                elif ft == 3:
                    p = (left + up) // 2
                else:
                    pa, pb, pc = abs(up - ul), abs(left - ul), abs(left + up - 2 * ul)
                    p = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
                rec[x] = (row[x] + p) % 256
            out[y] = rec
        return out.astype(np.uint8)

    def build_png(h, w, ch, filtered_rows, ftypes, color):
        raw = b"".join(
            bytes([ftypes[y]]) + filtered_rows[y].tobytes() for y in range(h)
        )

        def chunk(tag, data):
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
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b"")
        )

    for ch, color in [(1, 0), (3, 2), (4, 6), (2, 4)]:
        h, w = 7, 5
        ftypes = [0, 1, 2, 3, 4, 1, 4][:h]
        rows = [rng.randint(0, 256, size=w * ch, dtype=np.uint8) for _ in range(h)]
        got = decode_png(build_png(h, w, ch, rows, ftypes, color))
        exp = ref_decode(h, w, ch, rows, ftypes)
        exp = exp.reshape(h, w) if ch == 1 else exp.reshape(h, w, ch)
        assert got.shape == exp.shape and (got == exp).all()


def test_png_decoder_rejects_corruption():
    from dane_visual_feature_extraction_worker_spark.multimodal import (
        decode_png,
        encode_png,
    )

    png = encode_png(np.arange(16, dtype=np.uint8).reshape(4, 4))
    bad = bytearray(png)
    bad[20] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(bad))
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"GIF89a")


def test_decode_transform_png_spark_matches_numpy(spark):
    """Distributed PNG decode path == local numpy reference: synth
    real-PNG payloads from text, decode_transform_2d(decode=decode_png)
    vs direct tiling + resize + znorm."""
    from dane_visual_feature_extraction_worker_spark.multimodal import (
        decode_png,
        decode_transform_2d,
        resize_nn_2d,
        synth_png_payloads,
        znorm_2d,
    )

    rows = [(0, "hello world"), (1, ""), (2, "xyz" * 40), (3, "a")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = (
        decode_transform_2d(
            synth_png_payloads(docs), out_h=16, out_w=16, decode=decode_png
        )
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for _, r in got.iterrows():
        text = dict(rows)[r["doc_id"]]
        h, w = 8 + r["doc_id"] % 5, 8 + r["doc_id"] % 7
        bs = np.frombuffer(text.encode(), dtype=np.uint8)
        if bs.size == 0:
            bs = np.zeros(1, dtype=np.uint8)
        img = np.resize(bs, (int(h), int(w)))
        z = znorm_2d(resize_nn_2d(img, 16, 16))
        assert r["src_h"] == h and r["src_w"] == w
        assert np.float32(r["z_min"]) == z.min()
        assert np.float32(r["z_max"]) == z.max()
