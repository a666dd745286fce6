"""Embedding reduction: random projection + PCA vs numpy
(operators/embeddings.py)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from basic_data_pipeline_spark.operators import embeddings as E

DIM = 64


@pytest.fixture(scope="module")
def vecs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


@pytest.fixture(scope="module")
def vecs_np(vecs):
    rows = vecs.select("vec_id", "embedding").collect()
    ids = [r["vec_id"] for r in rows]
    x = np.array([r["embedding"] for r in rows], dtype=np.float64)
    return ids, x


# --- random projection ----------------------------------------------------

def test_rp_matches_numpy(vecs, vecs_np):
    ids, x = vecs_np
    out_dim = 16
    m = np.array(
        [E._jl_component("rp", j, DIM) for j in range(out_dim)]
    ) / np.sqrt(out_dim)
    got = {
        r["vec_id"]: np.array(r["embedding"])
        for r in E.random_projection(
            vecs, "vec_id", "embedding", DIM, out_dim
        ).collect()
    }
    want = x @ m.T
    for i, vid in enumerate(ids):
        assert np.allclose(got[vid], want[i], atol=1e-9)


def test_rp_preserves_distances_approximately(vecs_np, vecs):
    """JL property: pairwise squared distances preserved within a loose
    factor at out_dim=32 for 64-dim inputs."""
    ids, x = vecs_np
    red = E.random_projection(vecs, "vec_id", "embedding", DIM, 32)
    got = {r["vec_id"]: np.array(r["embedding"]) for r in red.collect()}
    rng = np.random.default_rng(0)
    idx = rng.choice(len(ids), size=(50, 2))
    ratios = []
    for a, b in idx:
        if a == b:
            continue
        d_hi = np.sum((x[a] - x[b]) ** 2)
        d_lo = np.sum((got[ids[a]] - got[ids[b]]) ** 2)
        if d_hi > 0:
            ratios.append(d_lo / d_hi)
    r = np.array(ratios)
    assert 0.4 < r.mean() < 1.6 and (r > 0.15).all() and (r < 3.5).all()


def test_rp_deterministic_and_partition_invariant(vecs):
    a = E.random_projection(
        vecs.repartition(7), "vec_id", "embedding", DIM, 8
    ).collect()
    b = E.random_projection(
        vecs.coalesce(1), "vec_id", "embedding", DIM, 8
    ).collect()
    assert {r["vec_id"]: r["embedding"] for r in a} == {
        r["vec_id"]: r["embedding"] for r in b
    }


def test_rp_validates(vecs):
    with pytest.raises(ValueError):
        E.random_projection(vecs, "vec_id", "embedding", DIM, 0)
    with pytest.raises(ValueError):
        E.random_projection(vecs, "vec_id", "embedding", DIM, DIM + 1)


# --- PCA ------------------------------------------------------------------

def test_pca_fit_matches_numpy(vecs, vecs_np):
    ids, x = vecs_np
    model = E.pca_fit(vecs, "embedding", DIM, 8)
    assert model["n"] == len(ids)
    assert np.allclose(model["mean"], x.mean(axis=0), atol=1e-9)
    cov = np.cov(x, rowvar=False, bias=True)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:8]
    want_var = evals[order]
    assert np.allclose(model["explained_variance"], want_var, rtol=1e-6)
    # components span the same subspace (compare up to sign per vector)
    for got, want in zip(model["components"], evecs[:, order].T):
        c = abs(float(np.dot(got, want)))
        assert c > 1 - 1e-6


def test_pca_project_centers_and_projects(vecs, vecs_np):
    ids, x = vecs_np
    model = E.pca_fit(vecs, "embedding", DIM, 4)
    got = {
        r["vec_id"]: np.array(r["embedding"])
        for r in E.pca_project(vecs, "vec_id", "embedding", model).collect()
    }
    comps = np.array(model["components"])
    want = (x - np.array(model["mean"])) @ comps.T
    for i, vid in enumerate(ids):
        assert np.allclose(got[vid], want[i], atol=1e-8)
    # projected data is centered
    m = np.mean([got[v] for v in ids], axis=0)
    assert np.allclose(m, 0, atol=1e-8)


def test_pca_partition_invariant_fit(vecs):
    m1 = E.pca_fit(vecs.repartition(7), "embedding", DIM, 4)
    m2 = E.pca_fit(vecs.coalesce(1), "embedding", DIM, 4)
    assert np.allclose(m1["mean"], m2["mean"], atol=1e-9)
    assert np.allclose(
        m1["explained_variance"], m2["explained_variance"], rtol=1e-9
    )
    for a, b in zip(m1["components"], m2["components"]):
        assert abs(float(np.dot(a, b))) > 1 - 1e-9


def test_pca_variance_ordering_and_reconstruction(vecs, vecs_np):
    ids, x = vecs_np
    model = E.pca_fit(vecs, "embedding", DIM, 8)
    ev = model["explained_variance"]
    assert all(ev[i] >= ev[i + 1] for i in range(len(ev) - 1))
    # top-8 reconstruction error < total variance (sanity of subspace)
    comps = np.array(model["components"])
    xc = x - np.array(model["mean"])
    recon = (xc @ comps.T) @ comps
    err = np.mean(np.sum((xc - recon) ** 2, axis=1))
    tot = np.mean(np.sum(xc**2, axis=1))
    assert err < tot * 0.95


def test_pca_validates(spark, vecs):
    with pytest.raises(ValueError):
        E.pca_fit(vecs, "embedding", DIM, 0)
    one = vecs.limit(1)
    with pytest.raises(ValueError):
        E.pca_fit(one, "embedding", DIM, 2)


# --- SQ8 scalar quantization ----------------------------------------------

@pytest.fixture(scope="module")
def sq8_model(vecs):
    return E.sq8_fit(vecs)


def _np_sq8(x):
    """Numpy replica of the fit+encode+decode affine map."""
    lo, hi = x.min(axis=0), x.max(axis=0)
    scale = (hi - lo) / 255.0
    safe = np.where(scale == 0.0, 1.0, scale)
    codes = np.clip(np.floor((x - lo) / safe + 0.5), 0, 255)
    codes = np.where(scale == 0.0, 0.0, codes)
    return codes.astype(np.int64), lo + codes * scale


def test_sq8_fit_matches_numpy(sq8_model, vecs_np):
    _, x = vecs_np
    rows = {r["d"]: (r["lo"], r["hi"]) for r in sq8_model.collect()}
    assert len(rows) == DIM
    for d in range(DIM):
        assert rows[d][0] == pytest.approx(x[:, d].min(), abs=0)
        assert rows[d][1] == pytest.approx(x[:, d].max(), abs=0)


def test_sq8_encode_matches_numpy_and_bounds(vecs, sq8_model, vecs_np):
    ids, x = vecs_np
    want_codes, want_xhat = _np_sq8(x)
    got = {
        r["vec_id"]: r["codes"]
        for r in E.sq8_encode(vecs, sq8_model).select("vec_id", "codes").collect()
    }
    for i, vid in enumerate(ids):
        assert list(got[vid]) == list(want_codes[i])
        assert min(got[vid]) >= 0 and max(got[vid]) <= 255


def test_sq8_reconstruction_error_bounded(vecs, sq8_model, vecs_np):
    """Per-coordinate |x - xhat| <= scale/2 — the SQ8 guarantee."""
    ids, x = vecs_np
    lo, hi = x.min(axis=0), x.max(axis=0)
    half = (hi - lo) / 255.0 / 2.0
    enc = E.sq8_encode(vecs, sq8_model)
    dec = {
        r["vec_id"]: np.array(r["xhat"])
        for r in E.sq8_decode(enc, sq8_model).select("vec_id", "xhat").collect()
    }
    for i, vid in enumerate(ids):
        assert np.all(np.abs(x[i] - dec[vid]) <= half + 1e-12)


def test_sq8_search_matches_numpy_adc(vecs, sq8_model, vecs_np):
    """Ranks equal the numpy replication of asymmetric cosine exactly."""
    ids, x = vecs_np
    _, xhat = _np_sq8(x)
    k = 5
    queries = vecs.filter(F.col("vec_id") < 5)
    got = {}
    for r in E.sq8_search(
        queries, E.sq8_encode(vecs, sq8_model), sq8_model, k
    ).collect():
        got.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"]))
    idx = {vid: i for i, vid in enumerate(ids)}
    for qid in [i for i in ids if i < 5]:
        qv = x[idx[qid]]
        sims = xhat @ qv / (np.linalg.norm(xhat, axis=1) * np.linalg.norm(qv))
        order = sorted(
            ((float(-sims[idx[v]]), v) for v in ids if v != qid)
        )[:k]
        want = [(rk + 1, v) for rk, (_, v) in enumerate(order)]
        assert sorted(got[qid]) == want


def test_sq8_search_high_recall_vs_exact(vecs, sq8_model, vecs_np):
    """ADC over 8-bit codes keeps near-perfect top-5 recall on the
    fixture — quantization noise is per-coordinate <= scale/2."""
    from basic_data_pipeline_spark.operators import similarity

    queries = vecs.filter(F.col("vec_id") < 20)
    exact = similarity.topk_neighbors(queries, vecs, 5)
    approx = E.sq8_search(queries, E.sq8_encode(vecs, sq8_model), sq8_model, 5)
    hits = exact.join(approx, ["query_id", "neighbor_id"], "inner").count()
    assert hits / exact.count() >= 0.9
