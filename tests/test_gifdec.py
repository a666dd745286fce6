"""GIF LZW pixel decoder (r10 — the last stdlib-reachable pixel gate)
tested against an INDEPENDENT spec-literal reference ENCODER, the same
methodology as the JPEG decoder tests (tests/test_jpegdec.py): the
encoder below is written from the GIF89a specification (Appendix F LZW,
Appendix E interlace) with its own width-bump bookkeeping, so an
agreement bug in the decoder cannot hide behind shared code.

Covers: round-trips (few-color, full-256-color with width growth through
12 bits and clear-at-full-table, single-color KwKwK case), interlace,
local color tables, extension-block skipping, GIF87a and 89a, and a
truncation/corruption fuzz pinning the damage-to-null policy. The
mixed-container near-dup test extends the PNG+JPEG one to GIF.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from basic_data_pipeline_spark.operators import images as I


# --------------------------------------------------------------------------
# reference encoder (spec-literal, test-side only)
# --------------------------------------------------------------------------


def _lzw_encode_reference(min_size: int, indexes: bytes) -> bytes:
    """GIF Appendix F LZW encoder: emit-then-add, width bumps one emit
    after the decoder's table-size rule (derived in-line), CLEAR at full
    table, LSB-first packing."""
    clear, eoi = 1 << min_size, (1 << min_size) + 1
    out: list[tuple[int, int]] = []
    width = min_size + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    out.append((clear, width))
    cur = b""
    for b in indexes:
        s = bytes([b])
        nxt = cur + s
        if nxt in table:
            cur = nxt
            continue
        out.append((table[cur], width))
        if next_code < 4096:
            table[nxt] = next_code
            next_code += 1
            # decoder bumps after ITS append (table size == 2^width);
            # with emit-then-add that is next_code == 2^width + 1 here
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        else:  # table full: clear and restart (the spec's only option
            # besides deferred clear, which this encoder does not use)
            out.append((clear, width))
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_size + 1
        cur = s
    if cur:
        out.append((table[cur], width))
    out.append((eoi, width))
    buf = bytearray()
    acc = nb = 0
    for code, w in out:
        acc |= code << nb
        nb += w
        while nb >= 8:
            buf.append(acc & 0xFF)
            acc >>= 8
            nb -= 8
    if nb:
        buf.append(acc & 0xFF)
    return bytes(buf)


def encode_gif_reference(
    px: np.ndarray,
    interlace: bool = False,
    local_palette: bool = False,
    version: bytes = b"GIF89a",
    with_extension: bool = False,
) -> bytes:
    """(h, w, 3) uint8 with ≤256 distinct colors → a complete GIF."""
    h, w = px.shape[:2]
    flat = px.reshape(-1, 3)
    colors, inv = np.unique(flat, axis=0, return_inverse=True)
    n = len(colors)
    assert n <= 256, "reference encoder needs a paletted image"
    bits = max(2, (max(n - 1, 1)).bit_length())
    size = 1 << bits
    pal = np.zeros((size, 3), np.uint8)
    pal[:n] = colors
    size_field = bits - 1

    out = bytearray()
    out += version
    lsd_flags = (0x00 if local_palette else 0x80) | size_field
    out += struct.pack("<HHBBB", w, h, lsd_flags, 0, 0)
    if not local_palette:
        out += pal.tobytes()
    if with_extension:  # a Graphic Control Extension to skip
        out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"
        # and a comment extension with two sub-blocks
        out += b"\x21\xfe\x05hello\x03bye" + b"\x00"
    id_flags = (0x80 if local_palette else 0x00) | (
        0x40 if interlace else 0x00
    )
    if local_palette:
        id_flags |= size_field
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, id_flags)
    if local_palette:
        out += pal.tobytes()
    arr = inv.reshape(h, w).astype(np.uint8)
    if interlace:  # rows stored in 4-pass order (Appendix E)
        arr = arr[np.array(I._gif_deinterlace_order(h))]
    min_size = max(2, bits)
    out.append(min_size)
    lzw = _lzw_encode_reference(min_size, arr.tobytes())
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


def _pattern(h: int, w: int, n_colors: int, seed: int = 7) -> np.ndarray:
    """Deterministic (h, w, 3) image drawn from an n_colors palette."""
    pal = np.array(
        [
            [(13 * i + seed) % 256, (7 * i * i + 3) % 256, (31 * i) % 256]
            for i in range(n_colors)
        ],
        np.uint8,
    )
    yy, xx = np.mgrid[0:h, 0:w]
    idx = (xx * 3 + yy * 5 + (xx * yy) // 4 + seed) % n_colors
    return pal[idx]


# --------------------------------------------------------------------------
# round-trips
# --------------------------------------------------------------------------


def test_few_color_roundtrip_exact():
    px = _pattern(23, 31, 5)
    out = I.decode_gif_pixels(encode_gif_reference(px))
    assert out is not None and np.array_equal(out, px)


def test_full_256_color_width_growth_and_clear_at_full():
    # 96x96 = 9216 pixels of high-entropy 256-color content: the LZW
    # table grows through every width to 12 bits and hits the 4096-entry
    # clear at least once — the decoder must track both transitions
    rng = np.random.default_rng(42)
    pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    idx = rng.integers(0, 256, (96, 96), dtype=np.uint8)
    px = pal[idx]
    raw = encode_gif_reference(px)
    out = I.decode_gif_pixels(raw)
    assert out is not None and np.array_equal(out, px)


def test_single_color_kwkwk_case():
    # a constant image is the canonical KwKwK stream (code == len(table))
    px = np.full((17, 11, 3), [9, 200, 47], np.uint8)
    out = I.decode_gif_pixels(encode_gif_reference(px))
    assert out is not None and np.array_equal(out, px)


def test_interlaced_roundtrip():
    px = _pattern(29, 16, 7, seed=3)  # odd height crosses all 4 passes
    out = I.decode_gif_pixels(encode_gif_reference(px, interlace=True))
    assert out is not None and np.array_equal(out, px)


def test_local_palette_and_extension_skip():
    px = _pattern(12, 18, 9, seed=11)
    raw = encode_gif_reference(
        px, local_palette=True, with_extension=True
    )
    out = I.decode_gif_pixels(raw)
    assert out is not None and np.array_equal(out, px)


def test_gif87a_roundtrip():
    px = _pattern(8, 8, 3, seed=1)
    out = I.decode_gif_pixels(encode_gif_reference(px, version=b"GIF87a"))
    assert out is not None and np.array_equal(out, px)


def test_dispatch_through_decode_image_pixels():
    px = _pattern(10, 10, 4)
    out = I.decode_image_pixels(encode_gif_reference(px))
    assert out is not None and np.array_equal(out, px)


# --------------------------------------------------------------------------
# damage → None, never raise
# --------------------------------------------------------------------------


def test_truncation_fuzz_never_raises():
    px = _pattern(14, 19, 6)
    raw = encode_gif_reference(px, with_extension=True)
    for k in range(len(raw)):
        r = I.decode_gif_pixels(raw[:k])
        assert r is None or isinstance(r, np.ndarray)


def test_corruption_fuzz_never_raises():
    px = _pattern(14, 19, 6)
    raw = bytearray(encode_gif_reference(px))
    for p in range(len(raw)):
        orig = raw[p]
        for v in (0x00, 0xFF, orig ^ 0x55):
            raw[p] = v
            r = I.decode_gif_pixels(bytes(raw))
            assert r is None or isinstance(r, np.ndarray)
        raw[p] = orig


def test_non_gif_is_none():
    assert I.decode_gif_pixels(b"") is None
    assert I.decode_gif_pixels(b"NOTAGIF") is None
    assert I.decode_gif_pixels(b"GIF89a") is None  # header only


# --------------------------------------------------------------------------
# mixed-container near-dup corpus (PNG + JPEG + GIF)
# --------------------------------------------------------------------------


def test_mixed_png_jpeg_gif_near_dup_corpus(spark):
    """The perceptual near-dup pipeline must find same-group pairs when
    one copy is a PNG, one a baseline JPEG, and one a GIF of the same
    content — three containers, one hash space."""
    from tests.test_jpegdec import encode_jpeg_reference

    groups = 4
    rows = []
    mid = 0
    for g in range(groups):
        base = _pattern(32, 32, 8, seed=g * 13 + 1)
        for container in ("png", "jpeg", "gif"):
            if container == "png":
                blob = I.encode_png(base)
            elif container == "jpeg":
                blob = encode_jpeg_reference(base, luma_q=1, chroma_q=1)
            else:
                blob = encode_gif_reference(base)
            rows.append((mid, g, bytearray(blob)))
            mid += 1
    media = spark.createDataFrame(
        rows, "media_id long, group_id long, data binary"
    )
    hashes = I.image_hashes(media, method="dhash")
    assert hashes.filter("ihash IS NULL").count() == 0  # all three decode
    pairs = I.image_near_dup_pairs(hashes, max_hamming=6)
    got = {
        (a, b)
        for a, b in pairs.select("id_a", "id_b").collect()
    }
    id2g = {r[0]: r[1] for r in rows}
    # every same-group pair found, no cross-group pair claimed
    same = {
        (a, b)
        for a in id2g
        for b in id2g
        if a < b and id2g[a] == id2g[b]
    }
    assert same <= got
    assert all(id2g[a] == id2g[b] for a, b in got)
