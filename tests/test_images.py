"""Real-pixel image surface: stdlib PNG/BMP decode, perceptual hashes,
banded Hamming near-dup (operators/images.py)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from basic_data_pipeline_spark.operators import images as I


def _rng(seed):
    return np.random.default_rng(seed)


# --- reference PNG unfilter (spec-literal, per byte) ----------------------


def _ref_unfilter(raw: bytes, w: int, h: int, ch: int) -> np.ndarray:
    """Per-byte PNG unfiltering straight from the spec — the slow
    reference the vectorized decoder is checked against."""
    stride = w * ch
    out = bytearray()
    prev = bytes(stride)
    pos = 0
    for _ in range(h):
        ft = raw[pos]
        row = bytearray(raw[pos + 1 : pos + 1 + stride])
        pos += 1 + stride
        for x in range(stride):
            a = row[x - ch] if x >= ch else 0
            b = prev[x]
            c = prev[x - ch] if x >= ch else 0
            if ft == 1:
                row[x] = (row[x] + a) & 0xFF
            elif ft == 2:
                row[x] = (row[x] + b) & 0xFF
            elif ft == 3:
                row[x] = (row[x] + (a + b) // 2) & 0xFF
            elif ft == 4:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[x] = (row[x] + pred) & 0xFF
        out += row
        prev = bytes(row)
    return np.frombuffer(bytes(out), np.uint8).reshape(h, w, ch)


def _png_with_filters(px: np.ndarray, ftypes: list[int]) -> bytes:
    """Encode pixels as PNG using a CHOSEN filter type per row (forward
    filtering per spec), so the decoder must exercise every unfilter."""
    h, w, ch = px.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    arr = px.astype(np.int32)
    raw = bytearray()
    prev = np.zeros((w, ch), np.int32)
    for y in range(h):
        ft = ftypes[y % len(ftypes)]
        cur = arr[y]
        left = np.vstack([np.zeros((1, ch), np.int32), cur[:-1]])
        ul = np.vstack([np.zeros((1, ch), np.int32), prev[:-1]])
        if ft == 0:
            f = cur
        elif ft == 1:
            f = cur - left
        elif ft == 2:
            f = cur - prev
        elif ft == 3:
            f = cur - (left + prev) // 2
        else:
            p = left + prev - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, ul)
            )
            f = cur - pred
        raw += bytes([ft]) + (f & 0xFF).astype(np.uint8).tobytes()
        prev = cur

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        I._PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def _bmp24(px: np.ndarray, top_down: bool = False) -> bytes:
    h, w, _ = px.shape
    stride = (w * 3 + 3) & ~3
    rows = px[:, :, ::-1] if top_down else px[::-1, :, ::-1]
    body = b"".join(
        rows[y].tobytes() + bytes(stride - w * 3) for y in range(h)
    )
    hdr = (
        b"BM"
        + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
        + struct.pack("<Iii", 40, w, -h if top_down else h)
        + struct.pack("<HHII", 1, 24, 0, len(body))
        + struct.pack("<iiII", 2835, 2835, 0, 0)
    )
    return hdr + body


# --- decoders -------------------------------------------------------------


@pytest.mark.parametrize("shape", [(13, 17), (13, 17, 3), (13, 17, 4)])
def test_png_roundtrip(shape):
    px = _rng(1).integers(0, 256, size=shape, dtype=np.uint8)
    back = I.decode_png_pixels(I.encode_png(px))
    assert back.shape == (13, 17, 1 if len(shape) == 2 else shape[2])
    np.testing.assert_array_equal(back.reshape(shape), px)


@pytest.mark.parametrize("ch", [1, 2, 3, 4])
def test_png_all_filters_match_reference(ch):
    px = _rng(ch).integers(0, 256, size=(16, 11, ch), dtype=np.uint8)
    data = _png_with_filters(px, [0, 1, 2, 3, 4])
    got = I.decode_png_pixels(data)
    # independently unfilter the same compressed stream per the spec
    idat = zlib.decompress(
        data[data.index(b"IDAT") + 4 : data.rindex(b"IEND") - 8]
    )
    ref = _ref_unfilter(idat, 11, 16, ch)
    np.testing.assert_array_equal(got, ref)
    np.testing.assert_array_equal(got, px)


def test_png_palette():
    plte = _rng(7).integers(0, 256, size=(16, 3), dtype=np.uint8)
    idx = _rng(8).integers(0, 16, size=(9, 7), dtype=np.uint8)

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(9))
    data = (
        I._PNG_MAGIC
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 7, 9, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", plte.tobytes())
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    np.testing.assert_array_equal(I.decode_png_pixels(data), plte[idx])


def test_png_rejects_unsupported():
    px = _rng(2).integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
    good = I.encode_png(px)
    assert I.decode_png_pixels(b"nope") is None
    assert I.decode_png_pixels(good[:40]) is None
    # 16-bit depth flagged in IHDR -> not covered, never garbage
    bad = bytearray(good)
    bad[24] = 16
    assert I.decode_png_pixels(bytes(bad)) is None


@pytest.mark.parametrize("top_down", [False, True])
def test_bmp_roundtrip(top_down):
    px = _rng(3).integers(0, 256, size=(10, 7, 3), dtype=np.uint8)
    np.testing.assert_array_equal(
        I.decode_bmp_pixels(_bmp24(px, top_down)), px
    )


def test_same_pixels_same_hash_across_containers():
    px = _rng(4).integers(0, 256, size=(24, 24, 3), dtype=np.uint8)
    assert I.dhash64(I.decode_png_pixels(I.encode_png(px))) == I.dhash64(
        I.decode_bmp_pixels(_bmp24(px))
    )
    assert I.ahash64(I.decode_png_pixels(I.encode_png(px))) == I.ahash64(
        I.decode_bmp_pixels(_bmp24(px))
    )


# --- perceptual hashes ----------------------------------------------------


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & (2**64 - 1)).count("1")


def test_hashes_near_for_noise_far_for_different():
    yy, xx = np.mgrid[0:64, 0:64]
    base = np.stack(
        [(xx * 3 + yy) % 256, (xx + yy * 5) % 256, (xx * yy) % 256], axis=2
    ).astype(np.uint8)
    noisy = base.copy()
    noisy[5, 7] ^= 0x0F
    noisy[40, 12] ^= 0x0F
    other = np.stack(
        [(xx * 7 + yy * 2) % 256, (yy * yy) % 256, (xx * 11) % 256], axis=2
    ).astype(np.uint8)
    for h in (I.dhash64, I.ahash64):
        assert _ham(h(base), h(noisy)) <= 4
        assert _ham(h(base), h(other)) > 10


def test_hash_signedness_rides_int64():
    # an all-bright bottom half forces high bits -> negative int64; the
    # value must round-trip through numpy int64 unchanged
    px = np.zeros((16, 16), np.uint8)
    px[8:] = 255
    v = I.ahash64(px)
    assert -(2**63) <= v < 2**63
    assert int(np.int64(v)) == v


def test_dhash_brightness_invariance():
    px = _rng(5).integers(0, 128, size=(32, 32, 3), dtype=np.uint8)
    brighter = (px.astype(np.int32) + 60).clip(0, 255).astype(np.uint8)
    assert _ham(I.dhash64(px), I.dhash64(brighter)) <= 6


# --- Spark surface --------------------------------------------------------


@pytest.fixture(scope="module")
def corpus(spark):
    ids = spark.range(0, 48).select(F.col("id").alias("doc_id"))
    return I.synth_images(ids, group_size=4, size=32, noise_px=3)


def test_image_hashes_real_and_partition_invariant(spark, corpus):
    h1 = I.image_hashes(corpus).orderBy("media_id").collect()
    h2 = (
        I.image_hashes(corpus.repartition(7))
        .orderBy("media_id")
        .collect()
    )
    assert [r["ihash"] for r in h1] == [r["ihash"] for r in h2]
    assert all(r["ihash"] is not None for r in h1)
    assert all(r["width"] == 32 and r["height"] == 32 for r in h1)


def test_image_hashes_null_for_undecodable(spark):
    rows = [(1, bytearray(b"not an image at all")), (2, bytearray(I.encode_png(np.zeros((4, 4), np.uint8))))]
    df = spark.createDataFrame(rows, "media_id long, data binary")
    out = {r["media_id"]: r for r in I.image_hashes(df).collect()}
    assert out[1]["ihash"] is None and out[1]["width"] is None
    assert out[2]["ihash"] is not None


def test_near_dup_pairs_equal_bruteforce(spark, corpus):
    hashes = I.image_hashes(corpus)
    rows = hashes.collect()
    hs = {r["media_id"]: r["ihash"] for r in rows}
    for mh in (3, 6):
        expect = {
            (a, b)
            for a in hs
            for b in hs
            if a < b and _ham(hs[a], hs[b]) <= mh
        }
        got = {
            (r["id_a"], r["id_b"])
            for r in I.image_near_dup_pairs(hashes, max_hamming=mh).collect()
        }
        # banding recall is 1.0 by pigeonhole and verify is exact popcount
        assert got == expect
        assert expect, "fixture must actually contain near-dups"


def test_near_dup_groups_cluster_together(spark, corpus):
    hashes = I.image_hashes(corpus)
    pairs = I.image_near_dup_pairs(hashes, max_hamming=8).collect()
    groups = {
        r["media_id"]: r["group_id"]
        for r in corpus.select("media_id", "group_id").collect()
    }
    same = [p for p in pairs if groups[p["id_a"]] == groups[p["id_b"]]]
    # noise flips a handful of pixels: same-group pairs dominate
    assert len(same) >= 0.8 * len(pairs) and len(same) >= 24


def test_near_dup_band_cap_prunes_hot_buckets(spark):
    # 40 identical flat images (one hot bucket per band) + one isolated
    # pair: the cap kills the flat clique's candidates, keeps the pair
    rng = np.random.default_rng(9)
    flat = I.encode_png(np.full((16, 16), 128, np.uint8))
    a = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
    b = a.copy()
    b[0, 0] ^= 1
    rows = [(i, bytearray(flat)) for i in range(40)]
    rows += [(100, bytearray(I.encode_png(a))), (101, bytearray(I.encode_png(b)))]
    df = spark.createDataFrame(rows, "media_id long, data binary")
    hashes = I.image_hashes(df)
    capped = {
        (r["id_a"], r["id_b"])
        for r in I.image_near_dup_pairs(
            hashes, max_hamming=3, max_band_df=10
        ).collect()
    }
    assert (100, 101) in capped
    assert not any(x < 40 and y < 40 for x, y in capped)
    # uncapped finds the clique (and stays exact)
    full = I.image_near_dup_pairs(hashes, max_hamming=3).count()
    assert full >= 40 * 39 // 2


def test_near_dup_rejects_bad_budget(spark, corpus):
    with pytest.raises(ValueError):
        I.image_near_dup_pairs(I.image_hashes(corpus), max_hamming=0)
    with pytest.raises(ValueError):
        I.image_near_dup_pairs(I.image_hashes(corpus), max_hamming=64)


# --- resource-exhaustion guards (r10 ADVICE) --------------------------------
# The damage→null policy must also cover HOSTILE headers: a crafted
# 65535×65535 descriptor or a zlib bomb would otherwise raise MemoryError
# (not in any converted-exception list) and kill the whole mapInPandas
# task instead of nulling one row.


def _png_chunk(tag, body):
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def test_png_oversized_header_nulls_fast():
    data = (
        I._PNG_MAGIC
        + _png_chunk(
            b"IHDR", struct.pack(">IIBBBBB", 100_000, 100_000, 8, 2, 0, 0, 0)
        )
        + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 64))
        + _png_chunk(b"IEND", b"")
    )
    assert I.decode_png_pixels(data) is None


def test_png_zlib_bomb_is_bounded():
    # declares 4x4 RGB but the IDAT inflates to ~64 MB: the bounded
    # decompress stops at declared-size+1 and the length check nulls it
    data = (
        I._PNG_MAGIC
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0))
        + _png_chunk(b"IDAT", zlib.compress(b"\x00" * (64 << 20), 9))
        + _png_chunk(b"IEND", b"")
    )
    assert I.decode_png_pixels(data) is None


def test_gif_oversized_descriptor_nulls_fast():
    # 65535×65535 image descriptor (4.3e9 px): must null before any LZW
    # expansion, not bytearray-allocate its way to MemoryError
    data = (
        b"GIF89a"
        + struct.pack("<HHBBB", 65535, 65535, 0x80 | 0x00, 0, 0)
        + bytes(6)  # 2-entry global color table
        + b"\x2c"
        + struct.pack("<HHHHB", 0, 0, 65535, 65535, 0)
        + b"\x02"  # LZW min code size
        + b"\x01\x00\x00"  # one data sub-block + terminator
        + b"\x3b"
    )
    assert I.decode_gif_pixels(data) is None
