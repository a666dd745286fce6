"""Baseline JPEG decoder in pure stdlib + numpy — retires the last
pixel-decode gate (r8 verdict stretch item #7; the PNG decoder in
operators/images.py is the precedent: public-spec formats implemented
from the spec so the multimodal pipeline runs REAL pixels with no
third-party codec).

Scope: baseline DCT (SOF0), Huffman entropy coding, 8-bit samples,
1 or 3 components, any sampling factors (4:4:4, 4:2:2, 4:2:0 covered by
the general h×v max-factor upsampler), restart markers (DRI/RSTn),
16-bit DQT entries. Progressive (SOF2), arithmetic coding, 12-bit, and
hierarchical modes stay out of scope — `JpegUnsupported` names the
feature so operators/multimodal.py can keep its loud-gate convention
for the exotic variants.

Implementation notes (ITU-T T.81 / ISO 10918-1, public spec):

* Entropy-coded segments remove the 0x00 byte stuffed after 0xFF; an
  RSTn marker resets the bit reader and all DC predictors.
* Huffman tables arrive as (bits[1..16], values) exactly as in Annex C;
  decoding walks the canonical code tree via the (min, max, valptr)
  arrays from the spec's DECODE procedure — O(16) per symbol, no tree
  object.
* The 2-D IDCT is the exact separable orthonormal form computed as
  C.T @ block @ C with the standard 8×8 cosine matrix in float64 —
  bit-reproducible across platforms for identical coefficients (IEEE
  double, fixed operation order), which is what the engine's
  determinism contract needs (T.81 only bounds IDCT error; exactness
  across ENGINES matters more here than conformance-window tricks).
* Chroma upsampling is pixel replication (nearest), the common
  baseline-decoder choice.

The decoder is driver-/worker-side CPU code: images.py wraps it in the
same Arrow `mapInPandas` stage as PNG/BMP, so the cluster shape (one
task per batch of binary blobs, zero shuffle) is unchanged.
"""

from __future__ import annotations

import struct

import numpy as np


class JpegError(ValueError):
    """Structurally invalid JPEG (truncated, bad marker sequence)."""


class JpegUnsupported(ValueError):
    """Valid JPEG using a feature outside the baseline scope
    (progressive, arithmetic, 12-bit, >3 components)."""


_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# orthonormal 8x8 DCT basis (row k = basis k): pixels = C.T @ coeffs @ C
_C = np.zeros((8, 8), dtype=np.float64)
for _k in range(8):
    _scale = np.sqrt(1.0 / 8.0) if _k == 0 else np.sqrt(2.0 / 8.0)
    for _n in range(8):
        _C[_k, _n] = _scale * np.cos((2.0 * _n + 1.0) * _k * np.pi / 16.0)
del _k, _n, _scale


class _Huff:
    """Canonical Huffman table in the spec's (mincode, maxcode, valptr)
    form (T.81 Annex C / F.2.2.3 DECODE)."""

    def __init__(self, bits: list[int], values: bytes) -> None:
        code = 0
        k = 0
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        for ll in range(1, 17):
            n = bits[ll - 1]
            if n:
                self.valptr[ll] = k
                self.mincode[ll] = code
                code += n
                k += n
                self.maxcode[ll] = code - 1
            code <<= 1
        self.values = values


class _BitReader:
    """MSB-first bit reader over one entropy-coded segment (stuffing
    already removed)."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise JpegError("entropy data exhausted")
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map the t-bit magnitude to its signed
    value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _decode_symbol(r: _BitReader, h: _Huff) -> int:
    code = 0
    for ll in range(1, 17):
        code = (code << 1) | r.read_bit()
        if h.maxcode[ll] >= 0 and code <= h.maxcode[ll]:
            return h.values[h.valptr[ll] + code - h.mincode[ll]]
    raise JpegError("invalid Huffman code")


def _decode_block(
    r: _BitReader, dc_tab: _Huff, ac_tab: _Huff, pred: int
) -> tuple[np.ndarray, int]:
    """One 8×8 block of dequantizable coefficients in zigzag order,
    plus the updated DC predictor."""
    zz = np.zeros(64, dtype=np.int64)
    t = _decode_symbol(r, dc_tab)
    diff = _extend(r.receive(t), t)
    pred += diff
    zz[0] = pred
    k = 1
    while k < 64:
        rs = _decode_symbol(r, ac_tab)
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run == 15:  # ZRL: sixteen zeros
                k += 16
                continue
            break  # EOB
        k += run
        if k >= 64:
            raise JpegError("AC run past block end")
        zz[k] = _extend(r.receive(size), size)
        k += 1
    return zz, pred


def _idct8x8(coeffs: np.ndarray) -> np.ndarray:
    return _C.T @ coeffs @ _C


def decode_jpeg(data: bytes) -> np.ndarray:
    """bytes → uint8 array (h, w) for grayscale or (h, w, 3) RGB.
    Raises JpegError on damage, JpegUnsupported past baseline scope —
    and NOTHING else: any unexpected parse failure on malformed input
    (short struct fields, out-of-range indexes, bad numpy shapes from
    inconsistent headers) is converted to JpegError so the mapInPandas
    damage-to-null policy in images.decode_image_pixels holds for every
    corrupt blob, not just the failure modes enumerated by hand
    (tests/test_jpegdec.py fuzzes truncations at every byte offset)."""
    try:
        return _decode_jpeg(data)
    except (JpegError, JpegUnsupported):
        raise
    except (ValueError, IndexError, KeyError, struct.error,
            ZeroDivisionError, OverflowError) as e:
        raise JpegError(f"malformed JPEG: {type(e).__name__}: {e}") from e


def _decode_jpeg(data: bytes) -> np.ndarray:
    if len(data) < 4 or data[0:2] != b"\xff\xd8":
        raise JpegError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _Huff] = {}
    huff_ac: dict[int, _Huff] = {}
    frame = None  # (h, w, [(cid, hs, vs, tq)])
    restart_interval = 0
    rgb = None

    while pos < len(data):
        if data[pos] != 0xFF:
            raise JpegError(f"expected marker at {pos}")
        # T.81 B.1.1.2: any number of 0xFF FILL bytes may precede the
        # marker code — skip the run, the marker is the first non-FF
        while pos < len(data) and data[pos] == 0xFF:
            pos += 1
        if pos >= len(data):
            raise JpegError("truncated in marker fill bytes")
        marker = data[pos]
        pos += 1
        if marker == 0x00:
            raise JpegError("stray FF00 outside entropy-coded data")
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone markers
        if pos + 2 > len(data):
            raise JpegError("truncated segment header")
        seglen = struct.unpack(">H", data[pos : pos + 2])[0]
        seg = data[pos + 2 : pos + seglen]
        if len(seg) != seglen - 2:
            raise JpegError("truncated segment")
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if pq == 0:
                    tbl = np.frombuffer(
                        seg[p : p + 64], dtype=np.uint8
                    ).astype(np.int64)
                    p += 64
                elif pq == 1:
                    tbl = np.frombuffer(
                        seg[p : p + 128], dtype=">u2"
                    ).astype(np.int64)
                    p += 128
                else:
                    raise JpegError(f"bad DQT precision {pq}")
                if len(tbl) != 64:
                    raise JpegError("truncated DQT")
                qt[tq] = tbl
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                values = seg[p + 17 : p + 17 + n]
                if len(values) != n:
                    raise JpegError("truncated DHT")
                (huff_dc if tc == 0 else huff_ac)[th] = _Huff(bits, values)
                p += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline)
            prec = seg[0]
            if prec != 8:
                raise JpegUnsupported(f"{prec}-bit samples")
            h, w = struct.unpack(">HH", seg[1:5])
            nc = seg[5]
            if nc not in (1, 3):
                raise JpegUnsupported(f"{nc} components")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise JpegUnsupported(
                f"non-baseline frame type SOF{marker - 0xC0}"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[0:2])[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise JpegError("SOS before SOF")
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tdta = seg[1 + 2 * i : 3 + 2 * i]
                scan.append((cs, tdta >> 4, tdta & 0x0F))
            # entropy-coded data follows the SOS segment
            ep = pos + seglen
            chunks: list[bytes] = []
            cur = bytearray()
            resets: list[int] = []  # chunk boundaries at RSTn
            while ep < len(data):
                b = data[ep]
                if b != 0xFF:
                    cur.append(b)
                    ep += 1
                    continue
                m2 = data[ep + 1] if ep + 1 < len(data) else None
                if m2 == 0x00:
                    cur.append(0xFF)
                    ep += 2
                elif m2 == 0xFF:
                    ep += 1  # fill byte before a marker (B.1.1.2)
                elif m2 is not None and 0xD0 <= m2 <= 0xD7:
                    chunks.append(bytes(cur))
                    cur = bytearray()
                    ep += 2
                else:
                    break  # a real marker ends the scan
            chunks.append(bytes(cur))
            rgb = _decode_scan(
                frame, scan, chunks, qt, huff_dc, huff_ac,
                restart_interval,
            )
            pos = ep
            continue
        pos += seglen
    if rgb is None:
        raise JpegError("no scan decoded")
    return rgb


def _decode_scan(
    frame, scan, chunks, qt, huff_dc, huff_ac, restart_interval
) -> np.ndarray:
    h, w, comps = frame
    if len(scan) != len(comps):
        raise JpegUnsupported("multi-scan baseline (partial scans)")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    for _cid, hs, vs, _tq in comps:
        if hs < 1 or vs < 1:
            raise JpegError("zero sampling factor")
        if hmax % hs or vmax % vs:
            # replication upsampling needs integer ratios; T.81 allows
            # e.g. 3×1-vs-2×1 but no baseline encoder emits it
            raise JpegUnsupported(
                f"non-dividing sampling factors {hs}x{vs} vs max "
                f"{hmax}x{vmax}"
            )
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    by_id = {c[0]: c for c in comps}
    planes = []
    meta = []  # (hs, vs, qtab, dc_tab, ac_tab)
    for cs, td, ta in scan:
        if cs not in by_id:
            raise JpegError(f"scan references unknown component {cs}")
        _cid, hs, vs, tq = by_id[cs]
        if tq not in qt:
            raise JpegError(f"missing DQT {tq}")
        if td not in huff_dc or ta not in huff_ac:
            raise JpegError("missing Huffman table")
        planes.append(
            np.zeros((mcuy * vs * 8, mcux * hs * 8), dtype=np.float64)
        )
        meta.append((hs, vs, qt[tq], huff_dc[td], huff_ac[ta]))

    n_mcu = mcux * mcuy
    mcu_done = 0
    preds = [0] * len(scan)
    chunk_i = 0
    r = _BitReader(chunks[0])
    while mcu_done < n_mcu:
        if (
            restart_interval
            and mcu_done
            and mcu_done % restart_interval == 0
        ):
            chunk_i += 1
            if chunk_i >= len(chunks):
                raise JpegError("missing restart segment")
            r = _BitReader(chunks[chunk_i])
            preds = [0] * len(scan)
        my, mx = divmod(mcu_done, mcux)
        for ci, (hs, vs, qtab, dct, act) in enumerate(meta):
            for byy in range(vs):
                for bxx in range(hs):
                    zz, preds[ci] = _decode_block(r, dct, act, preds[ci])
                    coeffs = np.zeros(64, dtype=np.float64)
                    coeffs[_ZIGZAG] = (zz * qtab).astype(np.float64)
                    px = _idct8x8(coeffs.reshape(8, 8)) + 128.0
                    y0 = (my * vs + byy) * 8
                    x0 = (mx * hs + bxx) * 8
                    planes[ci][y0 : y0 + 8, x0 : x0 + 8] = px
        mcu_done += 1

    # upsample each plane to full MCU-aligned resolution, then crop
    full = []
    for ci, (hs, vs, _q, _d, _a) in enumerate(meta):
        p = planes[ci]
        if hs != hmax or vs != vmax:
            p = np.repeat(np.repeat(p, vmax // vs, axis=0), hmax // hs, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        return np.clip(np.rint(full[0]), 0, 255).astype(np.uint8)
    y, cb, cr = full
    cb = cb - 128.0
    cr = cr - 128.0
    # ITU-R BT.601 (the JFIF conversion, T.871)
    rr = y + 1.402 * cr
    gg = y - 0.344136 * cb - 0.714136 * cr
    bb = y + 1.772 * cb
    out = np.stack([rr, gg, bb], axis=-1)
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)
