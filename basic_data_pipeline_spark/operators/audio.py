"""Real audio samples in pure stdlib + numpy, and constellation match.

The audio twin of operators/images.py: WAV PCM needs no codec library —
the RIFF chunk walk is ``struct`` and the samples are a strided int16
read — and numpy's real FFT turns them into spectrograms. On top:
**spectral-peak constellation fingerprinting** (the Wang 2003 /
Shazam-style scheme): pick the strongest spectral peaks per frame, pair
each anchor peak with nearby target peaks, hash (f_anchor, f_target,
Δt) into one int, and match recordings by counting hash collisions that
agree on a consistent time OFFSET — the offset-histogram vote that
makes the scheme robust to clips starting mid-recording.

Spark shape: decode + FFT + peak hashing is ONE Arrow-batched
mapInPandas stage (per-recording work, embarrassingly parallel, no
shuffle — the exact cost profile of the image decode stage, sized the
same way at 100 TB). Matching is all JVM: one equi-join on the hash
value, one groupBy on (pair, offset) for the vote, one groupBy for the
best offset — candidate volume is bounded by hash-bucket occupancy
exactly like MinHash/Hamming banding, never all-pairs. MP3 stays
metadata-only (operators/multimodal.py — entropy decoding without a
codec is out of scope); the gate there says so.

Determinism: int16 → float64 is exact; the Hann window and rfft are
deterministic per platform; per-frame peaks tie-break on the LOWER bin.
Tests pin synthetic sine mixes whose peak bins are known in closed form,
so a platform FFT drift would fail loudly rather than skew silently.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from basic_data_pipeline_spark.partitioning import spread

# --- WAV ------------------------------------------------------------------


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """Minimal PCM16 WAV writer: (n,) or (n, ch) int16. The round-trip
    partner of :func:`decode_wav_samples`."""
    s = np.asarray(samples, dtype=np.int16)
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    body = s.tobytes()  # interleaved little-endian
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * ch * 2, ch * 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(body))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(body))
        + body
    )


def decode_wav_samples(data: bytes) -> tuple[np.ndarray, int] | None:
    """WAV → ((n, ch) int16 array, sample rate), or None for anything
    but integer PCM 16-bit (the only flavor decodable without a codec
    table). Stdlib chunk walk, numpy strided read."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None
    pos, fmt, pcm = 12, None, None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt " and len(body) >= 16:
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            pcm = body
        pos += 8 + size + (size & 1)
    if fmt is None or pcm is None:
        return None
    codec, ch, rate, _, block, bits = fmt
    if codec != 1 or bits != 16 or ch < 1 or block != ch * 2:
        return None
    n = len(pcm) // block
    if n == 0:
        return None
    arr = np.frombuffer(pcm[: n * block], "<i2").reshape(n, ch)
    return arr, rate


# --- constellation fingerprints ------------------------------------------

N_FFT = 512
HOP = 256
PEAKS_PER_FRAME = 3
FAN_OUT = 5  # targets paired per anchor
MAX_DT = 32  # frames ahead a target may sit


def spectral_peaks(samples: np.ndarray) -> np.ndarray:
    """mono float samples → (n_points, 2) int32 array of (frame, bin)
    constellation points: the ``PEAKS_PER_FRAME`` strongest rfft bins of
    each Hann-windowed frame (DC bin excluded, ties to the lower bin)."""
    x = samples.astype(np.float64)
    if len(x) < N_FFT:
        x = np.pad(x, (0, N_FFT - len(x)))
    n_frames = 1 + (len(x) - N_FFT) // HOP
    idx = np.arange(N_FFT)[None, :] + HOP * np.arange(n_frames)[:, None]
    frames = x[idx] * np.hanning(N_FFT)[None, :]
    mag = np.abs(np.fft.rfft(frames, axis=1))[:, 1:]  # drop DC
    # stable top-k: sort by (-magnitude, bin) via lexsort per frame
    order = np.argsort(-mag, axis=1, kind="stable")[:, :PEAKS_PER_FRAME]
    out = np.stack(
        [
            np.repeat(np.arange(n_frames), PEAKS_PER_FRAME),
            (order + 1).reshape(-1),  # undo the DC drop
        ],
        axis=1,
    ).astype(np.int32)
    return out


def constellation_hashes(points: np.ndarray) -> np.ndarray:
    """(frame, bin) points → (n, 2) int64 array of (anchor_frame, hash):
    each anchor pairs with the next ``FAN_OUT`` points within ``MAX_DT``
    frames; hash packs (f1, f2, Δt) — 9 + 9 + 6 bits — into one int."""
    if len(points) == 0:
        return np.zeros((0, 2), np.int64)
    pts = points[np.lexsort((points[:, 1], points[:, 0]))]
    out = []
    n = len(pts)
    for i in range(n):
        t1, f1 = int(pts[i, 0]), int(pts[i, 1])
        paired = 0
        for j in range(i + 1, n):
            t2, f2 = int(pts[j, 0]), int(pts[j, 1])
            dt = t2 - t1
            if dt <= 0:
                continue
            if dt > MAX_DT or paired >= FAN_OUT:
                break
            h = (f1 << 15) | (f2 << 6) | dt
            out.append((t1, h))
            paired += 1
    return np.array(out, np.int64).reshape(-1, 2)


AUDIO_FP_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("t", T.IntegerType()),
        T.StructField("fhash", T.LongType()),
    ]
)


def audio_fingerprints(media: DataFrame, id_col: str = "media_id") -> DataFrame:
    """(media_id, t, fhash) — decode each ``data`` WAV, mix to mono
    (integer mean of channels), fingerprint. Undecodable rows yield NO
    fingerprints (an id-preserving quarantine join downstream can spot
    them; same policy as image_hashes' null rows, expressed as absence
    because the output here is one-to-many)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ts, hs = [], [], []
            for mid, data in zip(pdf[id_col], pdf["data"]):
                dec = decode_wav_samples(bytes(data))
                if dec is None:
                    continue
                samples, _ = dec
                mono = samples.astype(np.int32).mean(axis=1)
                fp = constellation_hashes(spectral_peaks(mono))
                ids.extend([int(mid)] * len(fp))
                ts.extend(fp[:, 0].tolist())
                hs.extend(fp[:, 1].tolist())
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "t": pd.Series(ts, dtype="int32"),
                    "fhash": pd.Series(hs, dtype="int64"),
                }
            )

    return media.mapInPandas(run, AUDIO_FP_SCHEMA)


def audio_match_pairs(
    fps: DataFrame,
    min_votes: int = 8,
    max_hash_df: int | None = 200,
) -> DataFrame:
    """(id_a, id_b, offset, votes) — recording pairs sharing ≥
    ``min_votes`` fingerprint hashes at ONE consistent frame offset
    (t_a − t_b): the constellation vote that separates a real clip
    match from chance hash collisions, robust to clips starting
    anywhere in the recording.

    Join volume is Σ_hash df(hash)² — ``max_hash_df`` prunes hashes
    appearing in more than that many (recording, t) rows first (the
    boilerplate cut every banding operator here applies; a hash half
    the corpus emits identifies nothing). With the cap, candidate
    volume is bounded by n_hashes · max_hash_df."""
    keyed = fps.select(F.col("media_id").alias("_aid"), "t", "fhash")
    if max_hash_df is not None:
        ok = (
            keyed.groupBy("fhash")
            .agg(F.count("*").alias("_df"))
            .filter(F.col("_df") <= max_hash_df)
            .select("fhash")
        )
        keyed = keyed.join(ok, "fhash", "left_semi")
    a = keyed.select(F.col("_aid").alias("id_a"), F.col("t").alias("_ta"), "fhash")
    b = keyed.select(F.col("_aid").alias("id_b"), F.col("t").alias("_tb"), "fhash")
    votes = (
        a.join(b, "fhash")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy(
            "id_a", "id_b", (F.col("_ta") - F.col("_tb")).alias("offset")
        )
        .agg(F.count("*").alias("votes"))
    )
    # best offset per pair (earliest offset on vote ties — deterministic)
    from pyspark.sql.window import Window as W

    best = F.row_number().over(
        W.partitionBy("id_a", "id_b").orderBy(
            F.col("votes").desc(), F.col("offset")
        )
    )
    return (
        votes.withColumn("_rk", best)
        .filter((F.col("_rk") == 1) & (F.col("votes") >= min_votes))
        .select("id_a", "id_b", "offset", "votes")
    )


def synth_audio(
    docs: DataFrame,
    id_col: str = "doc_id",
    group_size: int = 4,
    seconds: float = 2.0,
    rate: int = 8000,
) -> DataFrame:
    """(media_id, group_id, data) — a REAL WAV corpus: ids in the same
    ``group_size`` block render the same deterministic three-tone chord
    sequence; each copy starts at an id-dependent offset into the
    sequence (so matches must prove themselves through the offset vote,
    not trivial equality) with id-salted low-level noise. Different
    groups use disjoint chord frequencies. Same contract as
    images.synth_images: real container bytes, synthetic camera."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("group_id", T.LongType()),
            T.StructField("data", T.BinaryType()),
        ]
    )
    n = int(seconds * rate)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # render enough source tail for the LAST group member's clip
        # window (member m starts m * HOP * 4 samples in)
        pad = group_size * HOP * 4
        tt = np.arange(n + pad, dtype=np.float64) / rate
        for pdf in batches:
            out = []
            for mid in pdf[id_col]:
                mid = int(mid)
                g = mid // group_size
                # three tones stepping every quarter second, pinned to
                # exact FFT bins; per-group base bins are hash-spread so
                # different groups' (f1, f2, Δt) trios don't collide
                bases = [20 + ((g * 97 + k * 79) % 200) for k in range(3)]
                seg = (tt * 4).astype(np.int64)  # quarter-second steps
                bin_hz = rate / N_FFT
                wave = sum(
                    np.sin(
                        2
                        * np.pi
                        * ((base + (seg + k) % 5) * bin_hz)
                        * tt
                    )
                    for k, base in enumerate(bases)
                )
                # whole-HOP start offsets: copies shift by an integer
                # frame count, so their constellations align at one
                # exact offset (the vote the matcher must find)
                start = (mid % group_size) * (HOP * 4)
                clip = wave[start : start + n]
                rng = np.random.default_rng(mid)
                noise = rng.normal(0.0, 0.01, n)
                pcm = np.clip((clip / 3 + noise) * 20000, -32768, 32767)
                out.append((mid, g, encode_wav(pcm.astype(np.int16), rate)))
            yield pd.DataFrame(out, columns=["media_id", "group_id", "data"])

    return spread(docs.select(id_col), id_col).mapInPandas(run, schema)
