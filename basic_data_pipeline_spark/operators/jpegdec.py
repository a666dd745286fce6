"""JPEG decoder (baseline + progressive) in pure stdlib + numpy (r8
stretch item #7, progressive closed r10; the PNG decoder in
operators/images.py is the precedent: public-spec formats implemented
from the spec so the multimodal pipeline runs REAL pixels with no
third-party codec).

Scope: baseline DCT (SOF0/1) AND progressive (SOF2, since r10) —
Huffman entropy coding, 8-bit samples, 1 or 3 components, any sampling
factors (4:4:4, 4:2:2, 4:2:0 covered by the general h×v max-factor
upsampler), restart markers (DRI/RSTn), 16-bit DQT entries; progressive
covers spectral selection, successive approximation (DC + AC first and
refinement passes, EOBRUN), interleaved DC scans, and non-interleaved
AC scans over true (unpadded) component block dims.

Arithmetic coding, 12-bit, and hierarchical modes are PERMANENTLY
CLOSED gates (decided r11, not deferred) — `JpegUnsupported` names the
feature and the row nulls. Why closed rather than implemented:

* **Conformance is unverifiable here.** Every decoder in this module is
  pinned against an INDEPENDENT spec-literal reference encoder plus
  closed forms (DC-only images, exact IDCT) — the encoder's correctness
  is checkable separately from the decoder's. The QM arithmetic coder
  breaks that pattern: encoder and decoder must share the normative
  113-state probability table (T.81 Table D.3) verbatim, so a
  round-trip test proves only SELF-consistency — a transcription error
  in the table still round-trips. With no arithmetic-capable
  third-party codec in this environment to cross-check (PIL/libjpeg
  builds ship without arithmetic support), shipping it would convert
  today's loud `JpegUnsupported` into silent pixel corruption on any
  real arithmetic file. Loud gate > silently wrong decode.
* **Rarity.** Arithmetic-coded JPEGs are effectively absent from real
  corpora (historical patent encumbrance meant encoders never adopted
  it; mainstream browsers and PIL do not decode it), so a web-scale
  multimodal pipeline loses ~nothing — and the damage→null policy
  already handles the stragglers gracefully. The same holds for 12-bit
  (medical-imaging niche; this pipeline's perceptual hashes are 8-bit
  luma) and hierarchical (rarer still).

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


# Resource-exhaustion guard (r10 ADVICE): the 'any malformed input →
# JpegError' guarantee must also cover hostile-but-parseable headers — a
# crafted 65535×65535 SOF with 15×15 sampling factors drives multi-GB
# int64 coefficient allocations and raises MemoryError, which is NOT in
# the converted-exception list, so one blob would kill the whole
# mapInPandas task. Cap the total 8×8 coefficient blocks across all
# components (each block is 64 int64 = 512 B → 1M blocks = 512 MiB, the
# sane per-row bound; ≈44 Mpx at 4:2:0, above images.MAX_DECODE_PIXELS'
# equivalent). Oversized frames raise JpegUnsupported → the row nulls.
MAX_COEF_BLOCKS = 1 << 20


class JpegUnsupported(ValueError):
    """Valid JPEG using a feature outside the supported scope
    (arithmetic coding, 12-bit, hierarchical, >3 components;
    baseline AND progressive both decode for real)."""


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
    frame = None  # (h, w, [(cid, hs, vs, tq)], progressive)
    restart_interval = 0
    state = None  # _FrameState once the first SOS arrives

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
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
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
            frame = (h, w, comps, marker == 0xC2)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
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
            if len(seg) < 1 + 2 * ns + 3:
                raise JpegError("truncated SOS header")
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
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
            if state is None:
                state = _FrameState(frame)
            state.decode_scan(
                scan, chunks, huff_dc, huff_ac, restart_interval,
                ss, se, ah, al,
            )
            pos = ep
            continue
        pos += seglen
    if state is None or not state.any_scan:
        raise JpegError("no scan decoded")
    return state.render(qt)


class _FrameState:
    """Per-image coefficient accumulator: every scan (the single scan of
    a baseline image; the DC/AC first+refinement scan sequence of a
    progressive one, T.81 Annex G) decodes QUANTIZED coefficients into
    per-component block arrays, and `render` dequantizes + IDCTs once at
    EOI. Sequential and progressive share the marker walk, the bit
    reader, the restart handling, and this accumulator — only the
    per-block coefficient procedure differs."""

    def __init__(self, frame) -> None:
        h, w, comps, progressive = frame
        if h == 0 or w == 0:
            raise JpegError("zero frame dimension")
        self.h, self.w = h, w
        self.comps = comps  # [(cid, hs, vs, tq)]
        self.progressive = progressive
        self.any_scan = False
        self.hmax = max(c[1] for c in comps)
        self.vmax = max(c[2] for c in comps)
        for _cid, hs, vs, _tq in comps:
            if hs < 1 or vs < 1:
                raise JpegError("zero sampling factor")
            if self.hmax % hs or self.vmax % vs:
                raise JpegUnsupported(
                    f"non-dividing sampling factors {hs}x{vs} vs max "
                    f"{self.hmax}x{self.vmax}"
                )
        self.mcux = -(-w // (8 * self.hmax))
        self.mcuy = -(-h // (8 * self.vmax))
        total_blocks = sum(
            (self.mcuy * vs) * (self.mcux * hs) for _c, hs, vs, _t in comps
        )
        if total_blocks > MAX_COEF_BLOCKS:
            raise JpegUnsupported(
                f"frame too large: {total_blocks} coefficient blocks "
                f"> cap {MAX_COEF_BLOCKS} (resource-exhaustion guard)"
            )
        self.coef: list[np.ndarray] = []
        self.bdims: list[tuple[int, int]] = []  # true block dims per comp
        for _cid, hs, vs, _tq in comps:
            cw = -(-w * hs // self.hmax)
            ch = -(-h * vs // self.vmax)
            self.bdims.append((-(-ch // 8), -(-cw // 8)))
            # padded to whole MCUs: interleaved scans address the pad
            self.coef.append(
                np.zeros((self.mcuy * vs, self.mcux * hs, 64), np.int64)
            )
        self.ci_of = {c[0]: i for i, c in enumerate(comps)}

    # -- per-block coefficient procedures (T.81 F.2.2 / G.1.2) ----------

    @staticmethod
    def _block_seq(r, dctab, actab, zz, pred):
        t = _decode_symbol(r, dctab)
        pred += _extend(r.receive(t), t)
        zz[0] = pred
        k = 1
        while k < 64:
            rs = _decode_symbol(r, actab)
            run, size = rs >> 4, rs & 0x0F
            if size == 0:
                if run == 15:
                    k += 16
                    continue
                break  # EOB
            k += run
            if k >= 64:
                raise JpegError("AC run past block end")
            zz[k] = _extend(r.receive(size), size)
            k += 1
        return pred

    @staticmethod
    def _block_dc_first(r, dctab, zz, pred, al):
        t = _decode_symbol(r, dctab)
        pred += _extend(r.receive(t), t)
        zz[0] = pred << al
        return pred

    @staticmethod
    def _block_dc_refine(r, zz, al):
        if r.read_bit():
            zz[0] |= 1 << al

    @staticmethod
    def _block_ac_first(r, actab, zz, ss, se, al, eobrun):
        """G.1.2.2: first pass over the [ss, se] band; returns eobrun."""
        if eobrun > 0:
            return eobrun - 1
        k = ss
        while k <= se:
            rs = _decode_symbol(r, actab)
            run, size = rs >> 4, rs & 0x0F
            if size == 0:
                if run != 15:  # EOBn: run = log2 of the run length
                    eobrun = (1 << run) - 1
                    if run:
                        eobrun += r.receive(run)
                    break
                k += 16  # ZRL
                continue
            k += run
            if k > se:
                raise JpegError("AC run past band end")
            zz[k] = _extend(r.receive(size), size) << al
            k += 1
        return eobrun

    @staticmethod
    def _block_ac_refine(r, actab, zz, ss, se, al, eobrun):
        """G.1.2.3: refinement pass — new ±1·2^al coefficients enter,
        every already-nonzero coefficient passed over reads one
        correction bit. Returns eobrun."""
        p1 = 1 << al
        m1 = -1 << al
        k = ss
        if eobrun == 0:
            while k <= se:
                rs = _decode_symbol(r, actab)
                run, size = rs >> 4, rs & 0x0F
                newval = 0
                if size == 0:
                    if run != 15:  # EOBn: correction bits continue below
                        eobrun = (1 << run)
                        if run:
                            eobrun += r.receive(run)
                        break
                    # ZRL: skip 16 zero-history positions
                else:
                    if size != 1:
                        raise JpegError("refinement size must be 1")
                    newval = p1 if r.read_bit() else m1
                while k <= se:
                    if zz[k] != 0:
                        if r.read_bit() and (zz[k] & p1) == 0:
                            zz[k] += p1 if zz[k] > 0 else m1
                    else:
                        if run == 0:
                            break
                        run -= 1
                    k += 1
                if newval and k <= se:
                    zz[k] = newval
                if k > se and size != 0:
                    raise JpegError("refinement run past band end")
                k += 1
        if eobrun > 0:
            while k <= se:
                if zz[k] != 0:
                    if r.read_bit() and (zz[k] & p1) == 0:
                        zz[k] += p1 if zz[k] > 0 else m1
                k += 1
            eobrun -= 1
        return eobrun

    # -- scan drivers ----------------------------------------------------

    def decode_scan(
        self, scan, chunks, huff_dc, huff_ac, restart_interval,
        ss, se, ah, al,
    ) -> None:
        for cs, _td, _ta in scan:
            if cs not in self.ci_of:
                raise JpegError(f"scan references unknown component {cs}")
        if not self.progressive:
            if (ss, se, ah, al) != (0, 63, 0, 0):
                raise JpegError("baseline scan with progression parameters")
            if len(scan) != len(self.comps):
                raise JpegUnsupported("multi-scan baseline (partial scans)")
        else:
            if not (ss <= se <= 63 and ah <= 13 and al <= 13):
                raise JpegError("bad progression parameters")
            if ss == 0 and se != 0:
                raise JpegError("progressive scan mixing DC and AC")
            if ss > 0 and len(scan) != 1:
                raise JpegError("progressive AC scan must be one component")
        self.any_scan = True
        dc_scan = ss == 0
        interleaved = len(scan) > 1

        meta = []  # (ci, hs, vs, dctab, actab)
        for cs, td, ta in scan:
            ci = self.ci_of[cs]
            _cid, hs, vs, _tq = self.comps[ci]
            if self.progressive:
                need_dc = dc_scan and ah == 0
                need_ac = not dc_scan
            else:
                need_dc = need_ac = True
            dctab = huff_dc.get(td) if need_dc else None
            actab = huff_ac.get(ta) if need_ac else None
            if (need_dc and dctab is None) or (need_ac and actab is None):
                raise JpegError("missing Huffman table")
            meta.append((ci, hs, vs, dctab, actab))

        if interleaved:
            n_units = self.mcux * self.mcuy
        else:
            ci = meta[0][0]
            bh, bw = self.bdims[ci]
            n_units = bw * bh

        preds = [0] * len(scan)
        eobrun = 0
        chunk_i = 0
        r = _BitReader(chunks[0])
        for unit in range(n_units):
            if restart_interval and unit and unit % restart_interval == 0:
                chunk_i += 1
                if chunk_i >= len(chunks):
                    raise JpegError("missing restart segment")
                r = _BitReader(chunks[chunk_i])
                preds = [0] * len(scan)
                eobrun = 0
            if interleaved:
                my, mx = divmod(unit, self.mcux)
                for si, (ci, hs, vs, dctab, actab) in enumerate(meta):
                    for byy in range(vs):
                        for bxx in range(hs):
                            zz = self.coef[ci][my * vs + byy, mx * hs + bxx]
                            preds[si] = self._apply_block(
                                r, zz, dctab, actab, preds[si],
                                ss, se, ah, al, dc_scan, 0,
                            )
            else:
                ci, hs, vs, dctab, actab = meta[0]
                bh, bw = self.bdims[ci]
                by, bx = divmod(unit, bw)
                zz = self.coef[ci][by, bx]
                out = self._apply_block(
                    r, zz, dctab, actab, preds[0],
                    ss, se, ah, al, dc_scan, eobrun,
                )
                if dc_scan:
                    preds[0] = out
                else:
                    eobrun = out

    def _apply_block(
        self, r, zz, dctab, actab, pred, ss, se, ah, al, dc_scan, eobrun,
    ):
        if not self.progressive:
            return self._block_seq(r, dctab, actab, zz, pred)
        if dc_scan:
            if ah == 0:
                return self._block_dc_first(r, dctab, zz, pred, al)
            self._block_dc_refine(r, zz, al)
            return pred
        if ah == 0:
            return self._block_ac_first(r, actab, zz, ss, se, al, eobrun)
        return self._block_ac_refine(r, actab, zz, ss, se, al, eobrun)

    # -- rendering --------------------------------------------------------

    def render(self, qt) -> np.ndarray:
        full = []
        for ci, (_cid, hs, vs, tq) in enumerate(self.comps):
            if tq not in qt:
                raise JpegError(f"missing DQT {tq}")
            qtab = qt[tq]
            blocks = self.coef[ci]
            nby, nbx = blocks.shape[:2]
            plane = np.zeros((nby * 8, nbx * 8), np.float64)
            for by in range(nby):
                for bx in range(nbx):
                    zz = blocks[by, bx]
                    coeffs = np.zeros(64, np.float64)
                    coeffs[_ZIGZAG] = (zz * qtab).astype(np.float64)
                    plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                        _idct8x8(coeffs.reshape(8, 8)) + 128.0
                    )
            if hs != self.hmax or vs != self.vmax:
                plane = np.repeat(
                    np.repeat(plane, self.vmax // vs, axis=0),
                    self.hmax // hs,
                    axis=1,
                )
            full.append(plane[: self.h, : self.w])
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
