"""Real-sample audio surface: stdlib WAV decode, spectral-peak
constellation fingerprints, offset-vote matching (operators/audio.py)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from basic_data_pipeline_spark.operators import audio as A


def _tone(freqs, n=16000, rate=8000, amp=8000):
    t = np.arange(n) / rate
    w = sum(np.sin(2 * np.pi * f * t) for f in freqs)
    return (w / len(freqs) * amp).astype(np.int16)


# --- WAV codec ------------------------------------------------------------


@pytest.mark.parametrize("ch", [1, 2])
def test_wav_roundtrip(ch):
    rng = np.random.default_rng(1)
    s = rng.integers(-30000, 30000, size=(777, ch), dtype=np.int16)
    dec = A.decode_wav_samples(A.encode_wav(s if ch > 1 else s[:, 0], 8000))
    assert dec is not None
    got, rate = dec
    assert rate == 8000
    np.testing.assert_array_equal(got, s)


def test_wav_rejects_non_pcm16():
    assert A.decode_wav_samples(b"RIFFxxxxWAVE") is None
    assert A.decode_wav_samples(b"not audio") is None
    good = bytearray(A.encode_wav(_tone([440]), 8000))
    good[20] = 3  # codec = IEEE float
    assert A.decode_wav_samples(bytes(good)) is None


# --- constellation --------------------------------------------------------


def test_spectral_peaks_find_pure_tones():
    # bin k corresponds to k * rate / N_FFT Hz; choose exact-bin tones
    rate, k1, k2, k3 = 8000, 20, 45, 90
    freqs = [k * rate / A.N_FFT for k in (k1, k2, k3)]
    pts = A.spectral_peaks(_tone(freqs).astype(np.float64))
    by_frame = {}
    for t, b in pts:
        by_frame.setdefault(t, set()).add(b)
    interior = [bs for t, bs in by_frame.items() if 2 < t < max(by_frame) - 2]
    assert interior and all(bs == {k1, k2, k3} for bs in interior)


def test_constellation_hash_packing_and_fanout():
    pts = np.array([(0, 10), (1, 20), (2, 30), (40, 40)], np.int32)
    hashes = A.constellation_hashes(pts)
    got = {(int(t), int(h)) for t, h in hashes}
    # anchors pair only within MAX_DT: (0,10)->(1,20),(2,30); (1,20)->(2,30)
    assert got == {
        (0, (10 << 15) | (20 << 6) | 1),
        (0, (10 << 15) | (30 << 6) | 2),
        (1, (20 << 15) | (30 << 6) | 1),
    }


def test_identical_audio_identical_fingerprints():
    a = A.constellation_hashes(A.spectral_peaks(_tone([440, 880]).astype(float)))
    b = A.constellation_hashes(A.spectral_peaks(_tone([440, 880]).astype(float)))
    np.testing.assert_array_equal(a, b)


# --- Spark surface --------------------------------------------------------


@pytest.fixture(scope="module")
def corpus(spark):
    ids = spark.range(0, 24).select(F.col("id").alias("doc_id"))
    return A.synth_audio(ids, group_size=4, seconds=2.0, rate=8000)


def test_fingerprints_partition_invariant(spark, corpus):
    f1 = sorted(map(tuple, A.audio_fingerprints(corpus).collect()))
    f2 = sorted(
        map(tuple, A.audio_fingerprints(corpus.repartition(7)).collect())
    )
    assert f1 == f2 and len(f1) > 0


def test_undecodable_rows_yield_no_fingerprints(spark):
    rows = [
        (1, bytearray(b"junk bytes, not a wav")),
        (2, bytearray(A.encode_wav(_tone([440]), 8000))),
    ]
    df = spark.createDataFrame(rows, "media_id long, data binary")
    ids = {r["media_id"] for r in A.audio_fingerprints(df).collect()}
    assert ids == {2}


def test_match_pairs_find_groups_with_consistent_offset(spark, corpus):
    fps = A.audio_fingerprints(corpus)
    pairs = A.audio_match_pairs(fps, min_votes=8).collect()
    groups = {
        r["media_id"]: r["group_id"]
        for r in corpus.select("media_id", "group_id").collect()
    }
    assert pairs, "same-chord clips must match"
    same = [p for p in pairs if groups[p["id_a"]] == groups[p["id_b"]]]
    assert len(same) >= 0.9 * len(pairs)
    # the winning offset equals the planted whole-frame shift: member m
    # starts 4m frames INTO the source, so its local frame for a given
    # source event is 4m lower -> t_a - t_b = 4*(m_b - m_a)
    for p in same:
        shift = 4 * ((p["id_b"] % 4) - (p["id_a"] % 4))
        assert p["offset"] == shift, p
    # every within-group pair is found
    want = {
        (a, b)
        for a in groups
        for b in groups
        if a < b and groups[a] == groups[b]
    }
    assert want <= {(p["id_a"], p["id_b"]) for p in same}


def test_match_rejects_unrelated_audio(spark):
    rows = [
        (1, bytearray(A.encode_wav(_tone([300, 700]), 8000))),
        (2, bytearray(A.encode_wav(_tone([451, 903]), 8000))),
    ]
    df = spark.createDataFrame(rows, "media_id long, data binary")
    assert A.audio_match_pairs(A.audio_fingerprints(df), min_votes=8).count() == 0
