"""Real image pixels in pure stdlib + numpy, and perceptual near-dup.

The multimodal module (operators/multimodal.py) parses every shipped
container's METADATA with stdlib; this module goes one level deeper for
the two containers whose pixel data needs no codec library at all:

* **PNG** — stdlib ``zlib`` inflates the IDAT stream and the five
  scanline filters (None/Sub/Up/Average/Paeth) unfilter with numpy;
  8-bit gray / gray+alpha / RGB / RGBA / palette, non-interlaced.
* **BMP** — 24-bit uncompressed BI_RGB is a plain strided read.

On those real pixels we compute **perceptual hashes** (aHash: 8×8
area-mean threshold; dHash: 9×8 horizontal gradient — the classic
near-duplicate-image fingerprints) and find **near-duplicate images**
with banded Hamming LSH: split the 64-bit hash into ``max_hamming + 1``
bands, equi-join on (band, value) — by pigeonhole any pair within the
Hamming budget collides on at least one band — then verify with
JVM-side ``bit_count(a XOR b)``. No pairwise scan ever materializes;
candidate volume is bounded the same way the text MinHash banding is
(operators/dedup.py).

Scale shape: decode + hash is mapInPandas over Arrow batches (the only
Python stage — per-image work, embarrassingly parallel, no shuffle);
banding is one explode (×bands) + one equi-join on 16-ish-bit band
values + a bit_count filter, all JVM codegen. The reference
(/root/reference/consumer_to_file.py) ships no media handling at all;
this is the north-star multimodal surface made real for the codecs the
standard library can honestly decode: PNG, BMP, JPEG (baseline since
r9, PROGRESSIVE since r10 — operators/jpegdec.py), and GIF (since r10 —
the LZW entropy stream is ~100 lines of public spec, Appendix F). The
remaining JPEG variants (arithmetic coding, 12-bit, hierarchical)
return null like any other uncovered container; video stays
documented-gated (an H.264 decoder is not a sane from-scratch
deliverable).

The decoders are exact, not fast: PNG's Average/Paeth rows fall back
to a per-pixel-column loop (Sub/Up/None are fully vectorized), and the
JPEG IDCT is a per-block float64 matrix product. Production decoding
of billions of JPEGs still belongs in a SIMD codec library via the
``_load_codecs`` hook; what this module guarantees is that the whole
Spark-side pipeline — binary column → pixels → perceptual hash →
banded near-dup — is real and tested end to end with zero optional
dependencies, mixed containers included.
"""

from __future__ import annotations

import struct
import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from basic_data_pipeline_spark.partitioning import spread

# --- PNG ------------------------------------------------------------------

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
# color type -> samples per pixel (bit depth 8 only)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def encode_png(pixels: np.ndarray) -> bytes:
    """Minimal PNG writer (filter 0, one IDAT): gray (h,w), RGB (h,w,3)
    or RGBA (h,w,4) uint8. The round-trip partner of
    :func:`decode_png_pixels` — used by tests and by `resize` outputs
    that must stay self-describing."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        color, arr = 0, px[:, :, None]
    elif px.ndim == 3 and px.shape[2] in (3, 4):
        color, arr = (2 if px.shape[2] == 3 else 6), px
    else:
        raise ValueError("pixels must be (h,w), (h,w,3) or (h,w,4) uint8")
    h, w = arr.shape[:2]

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


# Resource-exhaustion guard (r10 ADVICE): the damage→null policy must
# also cover MALICIOUS headers — a crafted 65535×65535 GIF descriptor or
# a PNG zlib bomb drives multi-GB allocations and raises MemoryError,
# which no decoder's exception list converts, so one hostile blob would
# kill the whole mapInPandas task instead of nulling one row. Any image
# whose pixel count exceeds this cap decodes to None (64 Mpx ≈ 200 MB
# RGB — far above any fixture and a sane per-row bound for a 100 TB
# pipeline's Python workers; jpegdec applies the equivalent coefficient
# -block cap before allocating).
MAX_DECODE_PIXELS = 1 << 26


def decode_png_pixels(data: bytes) -> np.ndarray | None:
    """PNG → (h, w, channels) uint8, or None when the bytes are not a
    PNG this decoder covers (bit depth ≠ 8, interlaced, truncated).
    Stdlib-only: chunk walk + zlib + numpy unfiltering; palette images
    resolve through PLTE to RGB."""
    if len(data) < 33 or data[:8] != _PNG_MAGIC:
        return None
    pos, ihdr, plte, idat = 8, None, None, []
    while pos + 8 <= len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        if len(body) < ln:
            return None
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"PLTE":
            plte = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if ihdr is None or not idat:
        return None
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        return None
    ch = _PNG_CHANNELS.get(color)
    if ch is None or (color == 3 and plte is None):
        return None
    if w == 0 or h == 0 or w * h > MAX_DECODE_PIXELS:
        return None  # hostile/oversized header — null, never MemoryError
    stride = w * ch
    # bounded decompress: a zlib bomb must not allocate past the declared
    # image size (+1 so an over-long stream fails the length check)
    try:
        raw = zlib.decompressobj().decompress(
            b"".join(idat), h * (stride + 1) + 1
        )
    except zlib.error:
        return None
    if len(raw) != h * (stride + 1):
        return None
    raw = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
    ftypes, rows = raw[:, 0], raw[:, 1:].astype(np.int32)
    out = np.zeros((h, stride), np.int32)
    prev = np.zeros(stride, np.int32)
    for y in range(h):
        r, t = rows[y], int(ftypes[y])
        if t == 0:
            rec = r
        elif t == 1:  # Sub: cumulative along x per channel lane
            rec = np.cumsum(r.reshape(w, ch), axis=0).reshape(stride) & 0xFF
        elif t == 2:  # Up
            rec = (r + prev) & 0xFF
        elif t == 3:  # Average (left-dependent: loop pixels, vector lanes)
            rec2 = r.reshape(w, ch).copy()
            up = prev.reshape(w, ch)
            left = np.zeros(ch, np.int32)
            for x in range(w):
                rec2[x] = (rec2[x] + ((left + up[x]) >> 1)) & 0xFF
                left = rec2[x]
            rec = rec2.reshape(stride)
        elif t == 4:  # Paeth
            rec2 = r.reshape(w, ch).copy()
            up = prev.reshape(w, ch)
            left = np.zeros(ch, np.int32)
            ul = np.zeros(ch, np.int32)
            for x in range(w):
                p = left + up[x] - ul
                pa, pb, pc = (
                    np.abs(p - left),
                    np.abs(p - up[x]),
                    np.abs(p - ul),
                )
                pred = np.where(
                    (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up[x], ul)
                )
                rec2[x] = (rec2[x] + pred) & 0xFF
                ul = up[x]
                left = rec2[x]
            rec = rec2.reshape(stride)
        else:
            return None
        out[y] = rec
        prev = rec
    px = out.astype(np.uint8).reshape(h, w, ch)
    if color == 3:
        px = plte[px[:, :, 0]]
    return px


# --- GIF ------------------------------------------------------------------
# (r10 — retires the last stdlib-reachable pixel gate; GIF87a/89a LZW is
# ~100 lines of public spec, the same footing as PNG/BMP/baseline JPEG.)


def _gif_lzw(min_size: int, stream: bytes, max_pixels: int) -> bytearray | None:
    """GIF Appendix F LZW: variable-width codes packed LSB-first across
    the concatenated data sub-blocks; CLEAR resets the table, widths grow
    to 12 bits. Returns palette indexes, or None on damage."""
    clear = 1 << min_size
    eoi = clear + 1
    out = bytearray()
    bitpos = 0
    nbits = len(stream) * 8
    width = min_size + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    prev: bytes | None = None
    while True:
        if bitpos + width > nbits:
            return None  # truncated before EOI
        byte_i = bitpos >> 3
        window = int.from_bytes(
            stream[byte_i : byte_i + 3].ljust(3, b"\x00"), "little"
        )
        code = (window >> (bitpos & 7)) & ((1 << width) - 1)
        bitpos += width
        if code == clear:
            table = list(base)
            width = min_size + 1
            prev = None
            continue
        if code == eoi:
            return out
        if prev is None:
            if code >= len(table):
                return None
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            return None
        if len(table) == (1 << width) and width < 12:
            width += 1
        out += entry
        if len(out) >= max_pixels:
            return out  # enough pixels; trailing codes are padding
        prev = entry


# interlaced GIFs store rows in four passes (89a spec, appendix E)
def _gif_deinterlace_order(h: int) -> list[int]:
    return (
        list(range(0, h, 8))
        + list(range(4, h, 8))
        + list(range(2, h, 4))
        + list(range(1, h, 2))
    )


def decode_gif_pixels(data: bytes) -> np.ndarray | None:
    """GIF87a/89a FIRST FRAME → (h, w, 3) uint8 RGB, or None for damage.
    Header + color tables + extension skip are plain struct walks; the
    image data is real LZW (`_gif_lzw`). Interlace is undone; the frame
    is returned at its own size (animation composition onto the logical
    screen is out of scope — the perceptual near-dup consumer hashes
    frame content, not canvas placement). Transparency resolves to the
    palette color (hashing wants stable luma, not alpha)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    try:
        w, h, flags, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
        pos = 13
        gct = None
        if flags & 0x80:
            n = 2 << (flags & 0x07)
            gct = np.frombuffer(data[pos : pos + 3 * n], np.uint8)
            if gct.size != 3 * n:
                return None
            gct = gct.reshape(-1, 3)
            pos += 3 * n
        while pos < len(data):
            b0 = data[pos]
            if b0 == 0x3B:  # trailer before any image
                return None
            if b0 == 0x21:  # extension: skip its sub-blocks
                pos += 2
                while pos < len(data):
                    sz = data[pos]
                    pos += 1
                    if sz == 0:
                        break
                    pos += sz
                continue
            if b0 != 0x2C:  # not an image descriptor
                return None
            _ix, _iy, iw, ih, iflags = struct.unpack(
                "<HHHHB", data[pos + 1 : pos + 10]
            )
            pos += 10
            pal = gct
            if iflags & 0x80:  # local color table
                n = 2 << (iflags & 0x07)
                pal = np.frombuffer(data[pos : pos + 3 * n], np.uint8)
                if pal.size != 3 * n:
                    return None
                pal = pal.reshape(-1, 3)
                pos += 3 * n
            if pal is None or iw == 0 or ih == 0:
                return None
            if iw * ih > MAX_DECODE_PIXELS:
                return None  # hostile descriptor — LZW expansion is
                # ~3600×, so a small stream can inflate to the full
                # iw*ih bytearray; cap before decoding
            min_size = data[pos]
            pos += 1
            if not 2 <= min_size <= 8:
                return None
            stream = bytearray()
            while pos < len(data):
                sz = data[pos]
                pos += 1
                if sz == 0:
                    break
                stream += data[pos : pos + sz]
                pos += sz
            idx = _gif_lzw(min_size, bytes(stream), iw * ih)
            if idx is None or len(idx) < iw * ih:
                return None
            arr = np.frombuffer(bytes(idx[: iw * ih]), np.uint8)
            if int(arr.max()) >= pal.shape[0]:
                return None
            arr = arr.reshape(ih, iw)
            if iflags & 0x40:  # interlaced
                de = np.zeros_like(arr)
                de[np.array(_gif_deinterlace_order(ih))] = arr
                arr = de
            return pal[arr]
        return None
    except (struct.error, IndexError, ValueError):
        return None  # damage → null, same policy as PNG/BMP/JPEG


# --- BMP ------------------------------------------------------------------


def decode_bmp_pixels(data: bytes) -> np.ndarray | None:
    """24-bit uncompressed BMP → (h, w, 3) uint8 RGB (BMP stores BGR
    bottom-up with 4-byte row padding), or None for any other BMP
    flavor."""
    if len(data) < 54 or data[:2] != b"BM":
        return None
    (off,) = struct.unpack("<I", data[10:14])
    hdr_sz, w, h = struct.unpack("<Iii", data[14:26])
    planes, bpp = struct.unpack("<HH", data[26:30])
    (compression,) = struct.unpack("<I", data[30:34])
    if hdr_sz < 40 or bpp != 24 or compression != 0 or w <= 0 or h == 0:
        return None
    top_down = h < 0  # negative height = top-down rows
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    if off + stride * h > len(data):
        return None
    rows = np.frombuffer(data[off : off + stride * h], np.uint8).reshape(
        h, stride
    )[:, : w * 3]
    px = rows.reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    return px if top_down else px[::-1]


def decode_image_pixels(data: bytes) -> np.ndarray | None:
    """Dispatch on magic bytes to a pure-stdlib pixel decoder, or None
    when no decoder covers the container. Baseline JPEG decodes for real
    since r9 (operators/jpegdec.py), GIF LZW since r10
    (:func:`decode_gif_pixels`); non-baseline JPEG variants (progressive
    etc.) return None like any other uncovered container — the
    undecodable→null policy (progressive decodes for real since r10;
    arithmetic/12-bit/hierarchical remain the gated variants).
    decode_jpeg guarantees JpegError/
    JpegUnsupported for ANY malformed input (unexpected parse failures
    are converted inside, fuzz-pinned in tests/test_jpegdec.py), so one
    corrupt blob nulls one row instead of crashing the whole
    mapInPandas task."""
    if data[:8] == _PNG_MAGIC:
        return decode_png_pixels(data)
    if data[:2] == b"BM":
        return decode_bmp_pixels(data)
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return decode_gif_pixels(data)
    if data[:2] == b"\xff\xd8":
        from basic_data_pipeline_spark.operators import jpegdec

        try:
            return jpegdec.decode_jpeg(data)
        except (jpegdec.JpegUnsupported, jpegdec.JpegError):
            return None  # the PNG convention: damage → null, not raise
    return None


# --- perceptual hashes ----------------------------------------------------


def _to_gray(px: np.ndarray) -> np.ndarray:
    """uint8 pixels (any channel count) → int32 luma grid (ITU-R 601
    integer form: (299R + 587G + 114B) // 1000 — exact and
    engine-portable, no float rounding)."""
    px = px.astype(np.int32)
    if px.ndim == 2:
        return px
    if px.shape[2] == 1:
        return px[:, :, 0]
    if px.shape[2] == 2:  # gray + alpha
        return px[:, :, 0]
    r, g, b = px[:, :, 0], px[:, :, 1], px[:, :, 2]
    return (299 * r + 587 * g + 114 * b) // 1000


def _cell_means(gray: np.ndarray, oh: int, ow: int) -> np.ndarray:
    """Exact area means over an oh×ow grid of integer-boundary cells
    (images smaller than the grid are nearest-neighbor upscaled first —
    deterministic, no interpolation)."""
    h, w = gray.shape
    if h < oh:
        gray = np.repeat(gray, -(-oh // h), axis=0)
        h = gray.shape[0]
    if w < ow:
        gray = np.repeat(gray, -(-ow // w), axis=1)
        w = gray.shape[1]
    ys = (np.arange(oh + 1) * h) // oh
    xs = (np.arange(ow + 1) * w) // ow
    out = np.empty((oh, ow), np.float64)
    for i in range(oh):
        band = gray[ys[i] : ys[i + 1]]
        for j in range(ow):
            out[i, j] = band[:, xs[j] : xs[j + 1]].mean()
    return out


def ahash64(px: np.ndarray) -> int:
    """Average hash: 8×8 area means, bit set where cell > grid mean.
    Row-major bit i = row*8 + col; returned as SIGNED int64 (two's
    complement) so it rides a Spark LongType unchanged."""
    cells = _cell_means(_to_gray(px), 8, 8)
    bits = (cells > cells.mean()).reshape(64)
    return int(np.packbits(bits[::-1]).view(">u8").astype(np.int64)[0])


def dhash64(px: np.ndarray) -> int:
    """Difference hash: 9×8 area means, bit set where cell[r,c] >
    cell[r,c+1] — the horizontal-gradient fingerprint, more robust to
    global brightness shifts than aHash. Same bit order/signedness."""
    cells = _cell_means(_to_gray(px), 8, 9)
    bits = (cells[:, :-1] > cells[:, 1:]).reshape(64)
    return int(np.packbits(bits[::-1]).view(">u8").astype(np.int64)[0])


_HASHERS = {"ahash": ahash64, "dhash": dhash64}

IMAGE_HASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("ihash", T.LongType()),
    ]
)


def image_hashes(
    media: DataFrame, method: str = "dhash", id_col: str = "media_id"
) -> DataFrame:
    """(media_id, width, height, ihash) — decode each ``data`` binary
    with the stdlib decoders and compute the perceptual hash. Rows whose
    bytes no decoder covers come back with NULL dimensions/hash (the
    caller decides whether undecodable means quarantine or skip — same
    policy surface as the CDC DLQ). One Arrow-batched Python stage, no
    shuffle."""
    if method not in _HASHERS:
        raise ValueError(f"method must be one of {sorted(_HASHERS)}")
    hasher = _HASHERS[method]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, fps = [], [], [], []
            for mid, data in zip(pdf[id_col], pdf["data"]):
                px = decode_image_pixels(bytes(data))
                ids.append(mid)
                if px is None:
                    ws.append(None), hs.append(None), fps.append(None)
                else:
                    ws.append(px.shape[1]), hs.append(px.shape[0])
                    fps.append(hasher(px))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "width": pd.Series(ws, dtype="Int32"),
                    "height": pd.Series(hs, dtype="Int32"),
                    "ihash": pd.Series(fps, dtype="Int64"),
                }
            )

    return media.mapInPandas(run, IMAGE_HASH_SCHEMA)


def hash_bands(
    hashes: DataFrame,
    max_hamming: int = 6,
    id_col: str = "media_id",
    hash_col: str = "ihash",
) -> DataFrame:
    """(id, ihash, bi, bv) — each non-null 64-bit hash split into
    ``max_hamming + 1`` contiguous bands (band index ``bi``, band value
    ``bv``): the pigeonhole blocking key shared by the pairwise matcher
    (:func:`image_near_dup_pairs`) and the persisted incremental index
    (operators/incremental_images.py), which buckets its table on
    exactly (bi, bv) so increments join it in place."""
    nb = max_hamming + 1
    if not 2 <= nb <= 64:
        raise ValueError("max_hamming must be in [1, 63]")
    bounds = [(i * 64) // nb for i in range(nb + 1)]
    ih = F.col(hash_col)
    bands = F.array(
        *[
            F.struct(
                F.lit(i).alias("bi"),
                F.shiftrightunsigned(ih, bounds[i])
                .bitwiseAND(
                    F.lit((1 << (bounds[i + 1] - bounds[i])) - 1).cast("long")
                )
                .alias("bv"),
            )
            for i in range(nb)
        ]
    )
    return (
        hashes.filter(ih.isNotNull())
        .select(F.col(id_col), ih.alias("ihash"), F.explode(bands).alias("b"))
        .select(
            id_col,
            "ihash",
            F.col("b.bi").alias("bi"),
            F.col("b.bv").alias("bv"),
        )
    )


def image_near_dup_pairs(
    hashes: DataFrame,
    max_hamming: int = 3,
    id_col: str = "media_id",
    hash_col: str = "ihash",
    max_band_df: int | None = None,
) -> DataFrame:
    """(id_a, id_b, hamming) — image pairs whose perceptual hashes are
    within ``max_hamming`` bits, found WITHOUT a pairwise scan: the
    64-bit hash splits into ``max_hamming + 1`` contiguous bands, so by
    pigeonhole every qualifying pair shares at least one band exactly
    (≤ max_hamming differing bits cannot touch all max_hamming + 1
    bands) — recall is 1.0 by construction, like the prefix blocking in
    operators/entity.py. One explode (×bands), one equi-join on (band
    index, band value), then the exact JVM-side popcount verify.

    **Budget vs scale (the multi-index-hashing size rule).** Band width
    is ``64 // (max_hamming + 1)`` bits, and join volume is Σ_bucket
    df² with df ≈ n / 2^width for spread hashes — the join stays linear
    only while n ≲ 2^width · max_band_df. The default budget 3 gives
    16-bit bands (fine to ~10⁸ images per cap unit); a budget of 8
    gives 7-bit bands, measured QUADRATIC past ~10⁵ images
    (SCALING.md round-8: Σdf² grew 252× over a 16× corpus and the 64×
    probe timed out before the budget was brought down). For larger
    Hamming budgets at corpus scale, dedup exactly on the full hash
    first, run this at a small budget, and let transitive clustering
    absorb the rest — the same layering as the text pipeline's
    exact-then-near dedup.

    ``max_band_df`` prunes band buckets holding more than that many
    hashes before the join (the boilerplate cut every banding operator
    here applies — flat-image hashes concentrate in a few low-entropy
    band values that identify nothing). It bounds join volume at
    n_bands · max_band_df per row but FORFEITS the pigeonhole guarantee
    for pairs whose every shared band is hot. At production scale
    ALWAYS set it."""
    keyed = hash_bands(hashes, max_hamming, id_col, hash_col)
    if max_band_df is not None:
        ok = (
            keyed.groupBy("bi", "bv")
            .agg(F.count("*").alias("_df"))
            .filter(F.col("_df") <= max_band_df)
            .select("bi", "bv")
        )
        keyed = keyed.join(ok, ["bi", "bv"], "left_semi")
    a = keyed.select(
        F.col(id_col).alias("id_a"), F.col("ihash").alias("_ha"), "bi", "bv"
    )
    b = keyed.select(
        F.col(id_col).alias("id_b"), F.col("ihash").alias("_hb"), "bi", "bv"
    )
    return (
        a.join(b, ["bi", "bv"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.bit_count(
                F.col("_ha").bitwiseXOR(F.col("_hb"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


# --- deterministic real-image corpus -------------------------------------


def synth_images(
    docs: DataFrame,
    id_col: str = "doc_id",
    group_size: int = 4,
    size: int = 32,
    noise_px: int = 3,
) -> DataFrame:
    """(media_id, group_id, data) — a REAL image corpus derived from any
    id frame: ids in the same ``group_size`` block render the same
    deterministic base pattern with ``noise_px`` id-salted pixels
    flipped, then encode as actual PNG bytes (copies are perceptual
    near-dups of each other; different groups are far apart). Everything
    the near-dup pipeline sees — container bytes, decode, hashes — is
    real; only the camera is synthetic. Ids spread first so the
    CPU-bound render/encode fans out regardless of the source layout."""

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("group_id", T.LongType()),
            T.StructField("data", T.BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        yy, xx = np.mgrid[0:size, 0:size]
        for pdf in batches:
            out = []
            for mid in pdf[id_col]:
                mid = int(mid)
                g = mid // group_size
                r = (xx * (3 + g % 7) + yy * (5 + g % 11) + g) % 256
                gr = (xx * xx // (1 + g % 5) + yy * (2 + g % 13)) % 256
                bl = (xx * yy // (1 + g % 3) + g * 7) % 256
                px = np.stack([r, gr, bl], axis=2).astype(np.uint8)
                for k in range(noise_px):
                    s = (mid * 1_000_003 + k * 7919) % (size * size)
                    px[s // size, s % size] ^= 0x0F
                out.append((mid, g, encode_png(px)))
            yield pd.DataFrame(out, columns=["media_id", "group_id", "data"])

    return spread(docs.select(id_col), id_col).mapInPandas(run, schema)
