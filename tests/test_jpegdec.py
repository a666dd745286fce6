"""Baseline JPEG decoder (operators/jpegdec.py) vs a serial pure-Python
reference ENCODER written here from the same public spec (T.81) — the
images.py PNG-test convention: the test owns an independent
implementation, the operator must invert it.

The encoder emits valid baseline JPEGs (SOI/DQT/SOF0/DHT/SOS/EOI,
byte-stuffed entropy data, optional DRI/RSTn) with simple canonical
9-bit Huffman tables (legal per Annex C — correctness, not
compression) and configurable quantization/subsampling, so round-trips
pin DC/AC coding, dequantization, zigzag, IDCT, upsampling, and the
YCbCr conversion."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from basic_data_pipeline_spark.operators import jpegdec as J


# --------------------------------------------------------------------------
# serial reference encoder
# --------------------------------------------------------------------------

_C = J._C  # same orthonormal basis: encoder FDCT = C @ x @ C.T


def _fdct_quant(block: np.ndarray, q: np.ndarray) -> np.ndarray:
    cf = _C @ (block.astype(np.float64) - 128.0) @ _C.T
    return np.rint(cf / q.reshape(8, 8)).astype(np.int64)


def _csize(v: int) -> int:
    return int(abs(v)).bit_length()


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self) -> bytes:
        if self.n:
            self.acc <<= 8 - self.n
            self.acc |= (1 << (8 - self.n)) - 1  # pad with 1s (spec)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.n = 0
        return bytes(self.out)


def _flat9_table(symbols: list[int]) -> tuple[list[int], bytes, dict]:
    """All symbols at 9 bits — canonical, legal, terrible compression."""
    symbols = sorted(set(symbols))
    assert len(symbols) < 500
    bits = [0] * 16
    bits[8] = len(symbols)  # lengths are 1-indexed: index 8 = 9 bits
    codes = {s: (i, 9) for i, s in enumerate(symbols)}
    return bits, bytes(symbols), codes


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def encode_jpeg_reference(
    img: np.ndarray,
    luma_q: int = 1,
    chroma_q: int = 1,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Minimal baseline encoder: grayscale (h,w) or RGB (h,w,3);
    uniform quant tables (value = luma_q / chroma_q); 4:2:0 when
    ``subsample`` (RGB only), else 4:4:4."""
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if gray:
        planes = [img.astype(np.float64)]
        samp = [(1, 1)]
        qsel = [0]
    else:
        r, g, b = (img[..., i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]
        samp = [(2, 2), (1, 1), (1, 1)] if subsample else [(1, 1)] * 3
        qsel = [0, 1, 1]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    qts = {
        0: np.full(64, luma_q, dtype=np.int64),
        1: np.full(64, chroma_q, dtype=np.int64),
    }

    # per-plane: subsample (mean pool), pad to the MCU grid (replicate)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    padded = []
    for p, (hs, vs) in zip(planes, samp):
        if (hs, vs) != (hmax, vmax):
            fy, fx = vmax // vs, hmax // hs
            ph = -(-p.shape[0] // fy) * fy
            pw = -(-p.shape[1] // fx) * fx
            p2 = np.pad(
                p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])),
                mode="edge",
            )
            p = p2.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))
        th, tw = mcuy * vs * 8, mcux * hs * 8
        p = np.pad(
            p, ((0, th - p.shape[0]), (0, tw - p.shape[1])), mode="edge"
        )
        padded.append(p)

    # pass 1: MCU-ordered coefficient blocks per component
    blocks: list[list[np.ndarray]] = [[] for _ in planes]
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (hs, vs) in enumerate(samp):
                for byy in range(vs):
                    for bxx in range(hs):
                        y0 = (my * vs + byy) * 8
                        x0 = (mx * hs + bxx) * 8
                        blk = padded[ci][y0 : y0 + 8, x0 : x0 + 8]
                        blocks[ci].append(
                            _fdct_quant(blk, qts[qsel[ci]])
                        )

    # symbol inventory for the flat Huffman tables (dry run), then the
    # real emission with the assigned codes
    dc_syms: list[list[int]] = [[], []]
    ac_syms: list[list[int]] = [[], []]

    def _emit(ci, coeffs, pred, bw, dc_codes, ac_codes, collect=None):
        zz = coeffs.reshape(64)
        zig = zz[J._ZIGZAG]  # natural -> zigzag order
        diff = int(zig[0]) - pred
        t = _csize(diff)
        if collect is not None:
            collect[0].append(t)
        else:
            c, L = dc_codes[t]
            bw.write(c, L)
            if t:
                v = diff if diff >= 0 else diff + (1 << t) - 1
                bw.write(v, t)
        run = 0
        for k in range(1, 64):
            v = int(zig[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                if collect is not None:
                    collect[1].append(0xF0)
                else:
                    c, L = ac_codes[0xF0]
                    bw.write(c, L)
                run -= 16
            s = _csize(v)
            rs = (run << 4) | s
            if collect is not None:
                collect[1].append(rs)
            else:
                c, L = ac_codes[rs]
                bw.write(c, L)
                vv = v if v >= 0 else v + (1 << s) - 1
                bw.write(vv, s)
            run = 0
        if run:
            if collect is not None:
                collect[1].append(0x00)
            else:
                c, L = ac_codes[0x00]
                bw.write(c, L)
        return int(zig[0])

    # dry run per table class
    per_mcu = [hs * vs for hs, vs in samp]
    n_mcu = mcux * mcuy
    idx = [0] * len(planes)
    preds = [0] * len(planes)
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            preds = [0] * len(planes)
        for ci in range(len(planes)):
            for _ in range(per_mcu[ci]):
                coeffs = blocks[ci][idx[ci]]
                idx[ci] += 1
                tsel = 0 if ci == 0 else 1
                col = (dc_syms[tsel], ac_syms[tsel])
                preds[ci] = _emit(ci, coeffs, preds[ci], None, None, None, col)

    tables = {}
    for tsel in (0, 1):
        if not dc_syms[tsel] and not ac_syms[tsel]:
            continue
        tables[("dc", tsel)] = _flat9_table(dc_syms[tsel] or [0])
        tables[("ac", tsel)] = _flat9_table(ac_syms[tsel] or [0x00])

    # real emission
    bw = _BitWriter()
    chunks: list[bytes] = []
    idx = [0] * len(planes)
    preds = [0] * len(planes)
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            chunks.append(bw.flush())
            bw = _BitWriter()
            preds = [0] * len(planes)
        for ci in range(len(planes)):
            tsel = 0 if ci == 0 else 1
            for _ in range(per_mcu[ci]):
                coeffs = blocks[ci][idx[ci]]
                idx[ci] += 1
                preds[ci] = _emit(
                    ci, coeffs, preds[ci], bw,
                    tables[("dc", tsel)][2], tables[("ac", tsel)][2],
                )
    chunks.append(bw.flush())

    out = bytearray(b"\xff\xd8")
    for tq in sorted({q for q in qsel}):
        out += _seg(0xDB, bytes([tq]) + bytes(qts[tq].astype(np.uint8)))
    ncomp = len(planes)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci in range(ncomp):
        hs, vs = samp[ci]
        sof += bytes([ci + 1, (hs << 4) | vs, qsel[ci]])
    out += _seg(0xC0, sof)
    for (cls, tsel), (bits, values, _codes) in sorted(tables.items()):
        tc = 0 if cls == "dc" else 1
        out += _seg(0xC4, bytes([(tc << 4) | tsel]) + bytes(bits) + values)
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        tsel = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (tsel << 4) | tsel])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)
    for i, ch in enumerate(chunks):
        if i:
            out += bytes([0xFF, 0xD0 + ((i - 1) % 8)])
        out += ch
    out += b"\xff\xd9"
    return bytes(out)


# --------------------------------------------------------------------------
# fixtures
# --------------------------------------------------------------------------


def _gradient(h, w, rgb=True):
    yy, xx = np.mgrid[0:h, 0:w]
    if not rgb:
        return ((yy * 3 + xx * 5) % 256).astype(np.uint8)
    r = ((yy * 2 + xx) % 256).astype(np.uint8)
    g = ((yy + xx * 2) % 256).astype(np.uint8)
    b = ((255 - yy * 3 + xx) % 256).astype(np.uint8)
    return np.stack([r, g, b], axis=-1)


def _smooth(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    r = (128 + 100 * np.sin(yy / 9.0)).astype(np.uint8)
    g = (128 + 100 * np.cos(xx / 11.0)).astype(np.uint8)
    b = (128 + 90 * np.sin((xx + yy) / 13.0)).astype(np.uint8)
    return np.stack([r, g, b], axis=-1)


# --------------------------------------------------------------------------
# tests
# --------------------------------------------------------------------------


def test_spec_literal_dc_only_block():
    """Hand-built single-component 8×8 JPEG with one DC-only block:
    quant 16, DC code for magnitude 6 with value 48 → coefficient
    48·16 = 768 → orthonormal IDCT gives 768/8 + 128 = 224 everywhere."""
    bits, values, codes = _flat9_table([0, 6])
    bitsa, valuesa, codesa = _flat9_table([0x00])
    bw = _BitWriter()
    c, L = codes[6]
    bw.write(c, L)
    bw.write(48, 6)  # positive 6-bit magnitude 48 (=0b110000)
    c, L = codesa[0x00]
    bw.write(c, L)  # EOB
    data = (
        b"\xff\xd8"
        + _seg(0xDB, bytes([0]) + bytes([16] * 64))
        + _seg(0xC0, bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0]))
        + _seg(0xC4, bytes([0x00]) + bytes(bits) + values)
        + _seg(0xC4, bytes([0x10]) + bytes(bitsa) + valuesa)
        + _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        + bw.flush()
        + b"\xff\xd9"
    )
    out = J.decode_jpeg(data)
    assert out.shape == (8, 8)
    assert np.all(out == 224)


def test_gray_roundtrip_q1_near_lossless():
    img = _gradient(24, 16, rgb=False)
    out = J.decode_jpeg(encode_jpeg_reference(img))
    assert out.shape == img.shape
    assert np.max(np.abs(out.astype(int) - img.astype(int))) <= 1


def test_rgb_444_roundtrip():
    img = _smooth(17, 23)  # non-multiple-of-8 crops
    out = J.decode_jpeg(encode_jpeg_reference(img))
    assert out.shape == img.shape
    assert np.max(np.abs(out.astype(int) - img.astype(int))) <= 3


def test_rgb_420_subsampled_roundtrip():
    img = _smooth(33, 30)  # non-multiple-of-16 exercises MCU crop
    out = J.decode_jpeg(encode_jpeg_reference(img, subsample=True))
    assert out.shape == img.shape
    # luma near-exact; chroma smoothed by 2×2 pooling on a smooth image
    assert np.mean(np.abs(out.astype(int) - img.astype(int))) < 4.0
    assert np.max(np.abs(out.astype(int) - img.astype(int))) < 40


def test_quantization_and_ac_paths():
    """Coarser quant exercises AC runs/ZRL/EOB; energy stays close."""
    img = _smooth(32, 32)
    out = J.decode_jpeg(encode_jpeg_reference(img, luma_q=8, chroma_q=12))
    assert out.shape == img.shape
    assert np.mean(np.abs(out.astype(int) - img.astype(int))) < 8.0


def test_restart_markers_match_unrestarted():
    img = _smooth(32, 24)
    a = J.decode_jpeg(encode_jpeg_reference(img))
    b = J.decode_jpeg(encode_jpeg_reference(img, restart_interval=2))
    assert np.array_equal(a, b)


def test_sixteen_bit_dqt():
    img = _gradient(16, 16, rgb=False)
    raw = encode_jpeg_reference(img)
    # rewrite the 8-bit DQT as a 16-bit one (pq=1), same values
    i = raw.index(b"\xff\xdb")
    seglen = struct.unpack(">H", raw[i + 2 : i + 4])[0]
    tq = raw[i + 4] & 0x0F
    vals = raw[i + 5 : i + 5 + 64]
    wide = b"".join(struct.pack(">H", v) for v in vals)
    new = _seg(0xDB, bytes([(1 << 4) | tq]) + wide)
    patched = raw[:i] + new + raw[i + 2 + seglen :]
    assert np.array_equal(J.decode_jpeg(patched), J.decode_jpeg(raw))


def test_damage_and_unsupported_raise():
    img = _gradient(16, 16, rgb=False)
    raw = encode_jpeg_reference(img)
    with pytest.raises(J.JpegError):
        J.decode_jpeg(raw[: len(raw) // 2])
    with pytest.raises(J.JpegError):
        J.decode_jpeg(b"\x00\x01\x02")
    # flip SOF0 -> SOF2: progressive DECODES for real since r10, so a
    # baseline stream mislabeled progressive is now structural DAMAGE
    # (its full-band ss=0..se=63 scan is illegal in progressive mode) —
    # JpegError, never garbage pixels
    prog = raw.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(J.JpegError):
        J.decode_jpeg(prog)
    # arithmetic coding stays a loud gate
    arith = raw.replace(b"\xff\xc0", b"\xff\xc9", 1)
    with pytest.raises(J.JpegUnsupported):
        J.decode_jpeg(arith)


def test_mixed_png_jpeg_near_dup_corpus(spark):
    """The r8 gate retired end-to-end: a corpus mixing PNG and JPEG
    encodings of near-identical images goes through the REAL Spark
    pipeline (binary column → decode → aHash → banded Hamming join) and
    the near-dup pairs bridge the two containers."""
    from basic_data_pipeline_spark.operators import images as IM

    docs = spark.range(8).select(F.col("id").alias("doc_id"))
    png_corpus = IM.synth_images(docs, group_size=4, noise_px=1)
    rows = png_corpus.collect()

    def reencode(row):
        if row["media_id"] % 2 == 0:
            return (row["media_id"], row["group_id"], bytearray(row["data"]))
        px = IM.decode_png_pixels(bytes(row["data"]))
        jb = encode_jpeg_reference(px)  # near-lossless q=1
        return (row["media_id"], row["group_id"], bytearray(jb))

    mixed = spark.createDataFrame(
        [reencode(r) for r in rows],
        "media_id long, group_id long, data binary",
    )
    hashes = IM.image_hashes(mixed)
    got = hashes.collect()
    assert all(r["ihash"] is not None for r in got), "JPEG rows must decode"
    pairs = IM.image_near_dup_pairs(hashes, max_hamming=10)
    linked = {
        frozenset((r["id_a"], r["id_b"])) for r in pairs.collect()
    }
    # within-group cross-container pairs (even id = PNG, odd id = JPEG)
    cross = [p for p in linked if len({i % 2 for i in p}) == 2]
    assert cross, "near-dups must bridge PNG and JPEG containers"
    by_group = {r["media_id"]: r["group_id"] for r in rows}
    assert all(
        len({by_group[i] for i in p}) == 1 for p in linked
    ), "no cross-group false pairs at this budget"


def test_fill_bytes_before_markers_decode_identically():
    """T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker
    code. Insert fill runs before every top-level marker AND before the
    RSTn markers inside the entropy stream; the decode must equal the
    unpadded one (legal padding, not damage)."""
    img = _gradient(24, 24, rgb=True)
    raw = encode_jpeg_reference(img, restart_interval=2)
    base = J.decode_jpeg(raw)

    padded = bytearray()
    i = 0
    in_scan = False
    while i < len(raw):
        b = raw[i]
        if b == 0xFF and i + 1 < len(raw):
            m = raw[i + 1]
            if m == 0x00:  # stuffed data byte — copy verbatim
                padded += raw[i : i + 2]
                i += 2
                continue
            # pad every marker except the leading SOI (the interchange
            # format starts with SOI proper), including in-scan RSTn
            if m != 0xFF and i > 0:
                padded += b"\xff\xff\xff"  # three fill bytes
                padded += raw[i : i + 2]
                if m == 0xDA:
                    in_scan = True
                i += 2
                continue
        padded.append(b)
        i += 1
    assert in_scan
    out = J.decode_jpeg(bytes(padded))
    assert np.array_equal(out, base)


def test_truncation_fuzz_every_offset_raises_jpeg_errors_only():
    """The damage-to-null contract: for EVERY truncation point of a valid
    JPEG, decode_jpeg either succeeds or raises JpegError/JpegUnsupported
    — never struct.error / IndexError / bare ValueError, which would
    crash the whole mapInPandas task instead of nulling one row."""
    img = _gradient(17, 13, rgb=True)  # non-multiple-of-8 dims
    raw = encode_jpeg_reference(img, restart_interval=1)
    for k in range(len(raw)):
        try:
            J.decode_jpeg(raw[:k])
        except (J.JpegError, J.JpegUnsupported):
            pass


def test_corruption_fuzz_byte_flips_raise_jpeg_errors_only():
    """Flip each byte of the header/tables region (and a stride through
    the entropy data) to 8 different values: only JpegError/
    JpegUnsupported (or a successful decode) may come out."""
    img = _smooth(16, 16)
    raw = bytearray(encode_jpeg_reference(img))
    positions = list(range(0, min(len(raw), 120))) + list(
        range(120, len(raw), 7)
    )
    for p in positions:
        orig = raw[p]
        for v in (0x00, 0x01, 0x3F, 0x7F, 0x80, 0xC2, 0xFF, orig ^ 0xA5):
            raw[p] = v
            try:
                J.decode_jpeg(bytes(raw))
            except (J.JpegError, J.JpegUnsupported):
                pass
            finally:
                raw[p] = orig


def test_non_dividing_sampling_factors_unsupported():
    """hmax/vmax not divisible by a component's factors (e.g. 3x1 luma
    with 2x1 chroma) is outside replication-upsampling scope — must be
    JpegUnsupported, not a numpy shape crash."""
    img = _gradient(16, 16, rgb=True)
    raw = bytearray(encode_jpeg_reference(img, subsample=True))
    # find SOF0 and rewrite luma sampling 2x2 -> 3x2 (non-dividing vs
    # chroma 1x1 is fine; 3 % 2 breaks the hmax divisibility for chroma
    # only if hmax=3 — chroma hs=1 divides 3; so make chroma hs=2: 3%2=1)
    i = raw.find(b"\xff\xc0")
    assert i > 0
    # SOF payload: len(2) prec(1) h(2) w(2) nc(1) then per-comp (cid, hv, tq)
    comp0_hv = i + 4 + 1 + 4 + 1 + 1  # first comp's hv byte
    raw[comp0_hv] = 0x32  # h=3, v=2 (chroma stays 1x1 -> fine)
    comp1_hv = comp0_hv + 3
    raw[comp1_hv] = 0x21  # chroma h=2 (2 does not divide hmax=3), v=1
    with pytest.raises(J.JpegUnsupported):
        J.decode_jpeg(bytes(raw))


# --------------------------------------------------------------------------
# progressive reference encoder (r10) — spec-literal, test-side only
# --------------------------------------------------------------------------


def _trunc_shift(v: int, al: int) -> int:
    """G.1.2.2: AC point transform = divide by 2^al truncating toward
    zero (NOT an arithmetic shift for negatives)."""
    return (abs(v) >> al) * (1 if v >= 0 else -1)


def _coef_blocks_2d(img, luma_q, chroma_q, subsample):
    """Quantized coefficient blocks laid out like the decoder's
    accumulator: per component, (mcuy*vs, mcux*hs, 64) in ZIGZAG order.
    Same plane prep as the baseline encoder."""
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if gray:
        planes = [img.astype(np.float64)]
        samp = [(1, 1)]
        qsel = [0]
    else:
        r, g, b = (img[..., i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]
        samp = [(2, 2), (1, 1), (1, 1)] if subsample else [(1, 1)] * 3
        qsel = [0, 1, 1]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    qts = {
        0: np.full(64, luma_q, dtype=np.int64),
        1: np.full(64, chroma_q, dtype=np.int64),
    }
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    coefs = []
    bdims = []
    for ci, (p, (hs, vs)) in enumerate(zip(planes, samp)):
        if (hs, vs) != (hmax, vmax):
            fy, fx = vmax // vs, hmax // hs
            ph = -(-p.shape[0] // fy) * fy
            pw = -(-p.shape[1] // fx) * fx
            p2 = np.pad(
                p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), mode="edge"
            )
            p = p2.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))
        th, tw = mcuy * vs * 8, mcux * hs * 8
        cw = -(-w * hs // hmax)
        ch = -(-h * vs // vmax)
        bdims.append((-(-ch // 8), -(-cw // 8)))
        p = np.pad(
            p, ((0, th - p.shape[0]), (0, tw - p.shape[1])), mode="edge"
        )
        nby, nbx = mcuy * vs, mcux * hs
        arr = np.zeros((nby, nbx, 64), np.int64)
        for by in range(nby):
            for bx in range(nbx):
                nat = _fdct_quant(
                    p[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8],
                    qts[qsel[ci]],
                ).reshape(64)
                arr[by, bx] = nat[J._ZIGZAG]
        coefs.append(arr)
    return coefs, bdims, samp, qsel, qts, h, w, mcux, mcuy, hmax, vmax


class _ProgEmitter:
    """One scan's symbol/bit stream. ``holder=None`` collects symbols
    for the flat-table dry run; otherwise ``holder`` is a one-element
    list carrying the CURRENT BitWriter (swapped at restart markers)."""

    def __init__(self, holder, dc_codes=None, ac_codes=None,
                 dc_pool=None, ac_pool=None):
        self.holder = holder
        self.dc_codes, self.ac_codes = dc_codes, ac_codes
        self.dc_pool, self.ac_pool = dc_pool, ac_pool

    def dc_sym(self, t):
        if self.holder is None:
            self.dc_pool.append(t)
        else:
            c, L = self.dc_codes[t]
            self.holder[0].write(c, L)

    def ac_sym(self, rs):
        if self.holder is None:
            self.ac_pool.append(rs)
        else:
            c, L = self.ac_codes[rs]
            self.holder[0].write(c, L)

    def bits(self, v, n):
        if self.holder is not None and n:
            self.holder[0].write(v, n)


def _emit_dc_first(em, diff):
    t = _csize(diff)
    em.dc_sym(t)
    if t:
        v = diff if diff >= 0 else diff + (1 << t) - 1
        em.bits(v, t)


class _AcFirstState:
    """EOBRUN bookkeeping for one AC-first restart segment."""

    def __init__(self, em):
        self.em = em
        self.eobrun = 0

    def flush(self):
        if self.eobrun:
            n = self.eobrun.bit_length() - 1
            self.em.ac_sym(n << 4)
            self.em.bits(self.eobrun - (1 << n), n)
            self.eobrun = 0

    def block(self, zig, ss, se, al):
        vals = [_trunc_shift(int(zig[k]), al) for k in range(ss, se + 1)]
        nz = [i for i, v in enumerate(vals) if v]
        if not nz:
            self.eobrun += 1
            if self.eobrun == 32767:
                self.flush()
            return
        self.flush()
        run = 0
        last = nz[-1]
        for i, v in enumerate(vals):
            if i > last:
                break
            if v == 0:
                run += 1
                continue
            while run > 15:
                self.em.ac_sym(0xF0)
                run -= 16
            s = _csize(v)
            self.em.ac_sym((run << 4) | s)
            vv = v if v >= 0 else v + (1 << s) - 1
            self.em.bits(vv, s)
            run = 0
        if last < len(vals) - 1:
            self.eobrun = 1  # trailing zeros: this block ends with EOB


class _AcRefineState:
    """EOBRUN + buffered-correction-bit bookkeeping for one AC-refine
    restart segment (mirrors the decoder's G.1.2.3 state machine)."""

    def __init__(self, em):
        self.em = em
        self.eobrun = 0
        self.buf: list[int] = []  # correction bits owed after the EOBn

    def flush(self):
        if self.eobrun:
            n = self.eobrun.bit_length() - 1
            self.em.ac_sym(n << 4)
            self.em.bits(self.eobrun - (1 << n), n)
            for b in self.buf:
                self.em.bits(b, 1)
            self.eobrun = 0
            self.buf = []

    def block(self, zig, ss, se, ah, al):
        hist = [_trunc_shift(int(zig[k]), ah) for k in range(ss, se + 1)]
        now = [_trunc_shift(int(zig[k]), al) for k in range(ss, se + 1)]
        corr = [abs(v) & 1 for v in now]  # bit al of the magnitude
        newsig = [
            i for i, (h0, v) in enumerate(zip(hist, now)) if h0 == 0 and v
        ]
        if not newsig:
            # whole block rides the EOB run; its nonzero-history
            # correction bits are read during the run walk
            self.eobrun += 1
            self.buf.extend(corr[i] for i in range(len(hist)) if hist[i])
            if self.eobrun == 32767:
                self.flush()
            return
        self.flush()
        cur = 0  # index into the band [0, se-ss]
        for p in newsig:
            while True:
                zcount = sum(
                    1 for i in range(cur, p) if hist[i] == 0
                )
                if zcount <= 15:
                    break
                self.em.ac_sym(0xF0)  # ZRL: consume 16 zero-history
                consumed = 0
                while consumed < 16:
                    if hist[cur]:
                        self.em.bits(corr[cur], 1)
                    else:
                        consumed += 1
                    cur += 1
            v = now[p]
            assert abs(v) == 1, "refine insertion must be ±1"
            self.em.ac_sym((zcount << 4) | 1)
            self.em.bits(1 if v > 0 else 0, 1)
            while cur < p:
                if hist[cur]:
                    self.em.bits(corr[cur], 1)
                cur += 1
            cur = p + 1
        if cur <= se - ss:
            self.eobrun = 1
            self.buf = [
                corr[i] for i in range(cur, se - ss + 1) if hist[i]
            ]


def encode_jpeg_progressive_reference(
    img: np.ndarray,
    luma_q: int = 1,
    chroma_q: int = 1,
    subsample: bool = False,
    restart_interval: int = 0,
    script=None,
) -> bytes:
    """Spec-literal PROGRESSIVE encoder (T.81 Annex G): spectral
    selection + two successive-approximation levels for luma, one for
    chroma/DC. Encodes the SAME quantized coefficients as
    encode_jpeg_reference, so the decoded pixels must equal the
    baseline decode bit-for-bit — the round-trip invariant the tests
    pin. Independent bookkeeping from the decoder (encoder-side EOBRUN/
    correction-bit buffering vs decoder-side state machine)."""
    (coefs, bdims, samp, qsel, qts, h, w,
     mcux, mcuy, hmax, vmax) = _coef_blocks_2d(
        img, luma_q, chroma_q, subsample
    )
    nc = len(coefs)
    if script is None:
        if nc == 1:
            script = [
                ([0], 0, 0, 0, 1),
                ([0], 1, 63, 0, 1),
                ([0], 1, 63, 1, 0),
                ([0], 0, 0, 1, 0),
            ]
        else:
            script = [
                ([0, 1, 2], 0, 0, 0, 1),
                ([0], 1, 5, 0, 2),
                ([0], 6, 63, 0, 2),
                ([1], 1, 63, 0, 1),
                ([2], 1, 63, 0, 1),
                ([0], 1, 5, 2, 1),
                ([0], 6, 63, 2, 1),
                ([0], 1, 5, 1, 0),
                ([0], 6, 63, 1, 0),
                ([1], 1, 63, 1, 0),
                ([2], 1, 63, 1, 0),
                ([0, 1, 2], 0, 0, 1, 0),
            ]

    dc_pools: dict[int, list] = {0: [], 1: []}
    ac_pools: dict[int, list] = {0: [], 1: []}

    def run_scan(comps, ss, se, ah, al, em_of):
        """Drive one scan; em_of(tsel) -> _ProgEmitter (all sharing one
        BitWriter holder when emitting). Returns the flushed restart
        chunk list when emitting, else None."""
        probe = em_of(0)
        emitting = probe.holder is not None
        holder = probe.holder
        chunks = []
        if emitting:
            holder[0] = _BitWriter()

        def em(ci):
            return em_of(0 if ci == 0 else 1)

        interleaved = len(comps) > 1
        if interleaved:
            n_units = mcux * mcuy
        else:
            bh, bw_ = bdims[comps[0]]
            n_units = bh * bw_
        preds = {ci: 0 for ci in comps}
        ac_states = {
            ci: (_AcFirstState(em(ci)) if ah == 0 else _AcRefineState(em(ci)))
            for ci in comps
        }
        for unit in range(n_units):
            if restart_interval and unit and unit % restart_interval == 0:
                for st in ac_states.values():
                    if ss > 0:
                        st.flush()
                if emitting:
                    chunks.append(holder[0].flush())
                    holder[0] = _BitWriter()
                preds = {ci: 0 for ci in comps}
                ac_states = {
                    ci: (
                        _AcFirstState(em(ci))
                        if ah == 0
                        else _AcRefineState(em(ci))
                    )
                    for ci in comps
                }
            if interleaved:
                my, mx = divmod(unit, mcux)
                for ci in comps:
                    hs, vs = samp[ci]
                    for byy in range(vs):
                        for bxx in range(hs):
                            zig = coefs[ci][my * vs + byy, mx * hs + bxx]
                            c0 = int(zig[0])
                            if ah == 0:
                                v = c0 >> al
                                _emit_dc_first(em(ci), v - preds[ci])
                                preds[ci] = v
                            else:
                                em(ci).bits((c0 >> al) & 1, 1)
            else:
                ci = comps[0]
                bh, bw_ = bdims[ci]
                by, bx = divmod(unit, bw_)
                zig = coefs[ci][by, bx]
                if ss == 0:
                    c0 = int(zig[0])
                    if ah == 0:
                        v = c0 >> al
                        _emit_dc_first(em(ci), v - preds[ci])
                        preds[ci] = v
                    else:
                        em(ci).bits((c0 >> al) & 1, 1)
                elif ah == 0:
                    ac_states[ci].block(zig, ss, se, al)
                else:
                    ac_states[ci].block(zig, ss, se, ah, al)
        for st in ac_states.values():
            if ss > 0:
                st.flush()
        if emitting:
            chunks.append(holder[0].flush())
        return chunks

    # dry run: collect symbols per table class
    for comps, ss, se, ah, al in script:
        run_scan(
            comps, ss, se, ah, al,
            lambda tsel: _ProgEmitter(
                None, dc_pool=dc_pools[tsel], ac_pool=ac_pools[tsel]
            ),
        )
    tables = {}
    for tsel in (0, 1):
        if dc_pools[tsel]:
            tables[("dc", tsel)] = _flat9_table(dc_pools[tsel])
        if ac_pools[tsel]:
            tables[("ac", tsel)] = _flat9_table(ac_pools[tsel])

    out = bytearray(b"\xff\xd8")
    for tq in sorted(set(qsel)):
        out += _seg(0xDB, bytes([tq]) + bytes(qts[tq].astype(np.uint8)))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([nc])
    for ci in range(nc):
        hs, vs = samp[ci]
        sof += bytes([ci + 1, (hs << 4) | vs, qsel[ci]])
    out += _seg(0xC2, sof)  # SOF2: progressive
    for (cls, tsel), (bits, values, _codes) in sorted(tables.items()):
        tc = 0 if cls == "dc" else 1
        out += _seg(0xC4, bytes([(tc << 4) | tsel]) + bytes(bits) + values)
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))

    holder = [None]  # current BitWriter, swapped at restarts

    for comps, ss, se, ah, al in script:
        def em_of(tsel):
            dc = tables.get(("dc", tsel))
            ac = tables.get(("ac", tsel))
            return _ProgEmitter(
                holder, dc_codes=dc[2] if dc else None,
                ac_codes=ac[2] if ac else None,
            )

        chunks = run_scan(comps, ss, se, ah, al, em_of)
        sos = bytes([len(comps)])
        for ci in comps:
            tsel = 0 if ci == 0 else 1
            sos += bytes([ci + 1, (tsel << 4) | tsel])
        sos += bytes([ss, se, (ah << 4) | al])
        out += _seg(0xDA, sos)
        for i, ch in enumerate(chunks):
            if i:
                out += bytes([0xFF, 0xD0 + ((i - 1) % 8)])
            out += ch
    out += b"\xff\xd9"
    return bytes(out)


# --------------------------------------------------------------------------
# progressive decode tests (r10)
# --------------------------------------------------------------------------


def _prog_equals_baseline(img, **kw):
    base = J.decode_jpeg(encode_jpeg_reference(img, **kw))
    prog = J.decode_jpeg(encode_jpeg_progressive_reference(img, **kw))
    assert prog.shape == base.shape
    assert np.array_equal(prog, base), (
        f"max diff {np.max(np.abs(prog.astype(int) - base.astype(int)))}"
    )


def test_progressive_gray_equals_baseline():
    # same quantized coefficients -> bit-identical pixels
    _prog_equals_baseline(_gradient(24, 24, rgb=False))


def test_progressive_rgb_444_equals_baseline():
    _prog_equals_baseline(_gradient(32, 32, rgb=True))


def test_progressive_rgb_420_subsampled_equals_baseline():
    _prog_equals_baseline(_gradient(32, 32, rgb=True), subsample=True)


def test_progressive_odd_dims_true_vs_padded_blocks():
    # 17x13 with 4:2:0: luma true block dims (3x2) < padded MCU dims
    # (4x2->2 MCUs wide = 4 block cols) — AC scans walk TRUE dims only
    _prog_equals_baseline(_gradient(17, 13, rgb=True), subsample=True)


def test_progressive_quantized_equals_baseline():
    _prog_equals_baseline(_smooth(24, 24), luma_q=8)
    _prog_equals_baseline(_gradient(16, 16, rgb=True), luma_q=6, chroma_q=10)


def test_progressive_restart_markers():
    _prog_equals_baseline(_gradient(24, 24, rgb=True), restart_interval=2)
    _prog_equals_baseline(
        _gradient(24, 24, rgb=True), subsample=True, restart_interval=1
    )


def test_progressive_eobrun_spans_blocks():
    # a nearly-flat image quantized hard: most blocks' AC bands are all
    # zero, so the encoder accumulates multi-block EOB runs (EOBn > 0)
    # and the decoder's eobrun skip path is genuinely exercised
    img = np.full((48, 48), 128, np.uint8)
    img[0, 0] = 255  # one block with content
    _prog_equals_baseline(img, luma_q=16)


def test_progressive_dispatches_through_images():
    from basic_data_pipeline_spark.operators import images as IM

    img = _gradient(16, 16, rgb=True)
    px = IM.decode_image_pixels(encode_jpeg_progressive_reference(img))
    assert px is not None and px.shape == (16, 16, 3)


def test_progressive_truncation_fuzz():
    raw = encode_jpeg_progressive_reference(
        _gradient(17, 13, rgb=True), restart_interval=2
    )
    for k in range(len(raw)):
        try:
            J.decode_jpeg(raw[:k])
        except (J.JpegError, J.JpegUnsupported):
            pass


def test_progressive_corruption_fuzz():
    raw = bytearray(encode_jpeg_progressive_reference(_smooth(16, 16)))
    positions = list(range(0, min(len(raw), 120))) + list(
        range(120, len(raw), 11)
    )
    for p in positions:
        orig = raw[p]
        for v in (0x00, 0xFF, orig ^ 0xA5):
            raw[p] = v
            try:
                J.decode_jpeg(bytes(raw))
            except (J.JpegError, J.JpegUnsupported):
                pass
            finally:
                raw[p] = orig


def test_hostile_sof_dimensions_raise_unsupported_not_memoryerror():
    """A crafted 65535×65535 SOF with 15×15 sampling factors would drive
    a multi-GB coefficient allocation — MemoryError, which is NOT in the
    converted-exception list, so one hostile blob could kill the whole
    mapInPandas task. The block cap rejects it with JpegUnsupported
    (→ null row) before allocating (r10 ADVICE)."""
    with pytest.raises(J.JpegUnsupported, match="coefficient blocks"):
        J._FrameState((65535, 65535, [(1, 15, 15, 0)], False))
    # three max-sampled components: the multi-component sum also trips
    with pytest.raises(J.JpegUnsupported, match="coefficient blocks"):
        J._FrameState(
            (65535, 65535, [(1, 4, 4, 0), (2, 4, 4, 0), (3, 4, 4, 0)], True)
        )
    # sane dims stay accepted (regression guard on the cap's level)
    st = J._FrameState((1024, 1024, [(1, 2, 2, 0), (2, 1, 1, 1)], False))
    assert st.coef[0].shape[2] == 64
