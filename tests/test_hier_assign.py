"""Hierarchical (two-level) IVF coarse assignment
(similarity.ivf_assign hier=True — the Θ(n·√n_cells) scale path that
replaces the flat Θ(n·n_cells) scoring measured super-linear at the 64×
probe, SCALING.md round 7)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from basic_data_pipeline_spark.operators import similarity as S

DIM = 64
SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def vecs(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def cents(spark, vecs):
    c = S.centroids(
        vecs.withColumn("blk", F.pmod(F.xxhash64("vec_id"), F.lit(24))),
        "blk",
        DIM,
    ).cache()
    c.count()
    return c


def _cells(df):
    return {
        r["vec_id"]: r["cell"]
        for r in df.filter(F.col("probe") == 1).collect()
    }


def test_auto_dispatch_small_is_flat_exact(spark, vecs, cents):
    """hier=None with a small centroid table takes the flat path: the
    assignment is IDENTICAL to hier=False (it is the same plan)."""
    auto = _cells(S.ivf_assign(vecs, cents, DIM))
    flat = _cells(S.ivf_assign(vecs, cents, DIM, hier=False))
    assert auto == flat and len(auto) == vecs.count()


def test_hier_shape_and_agreement(spark, vecs, cents):
    """Forced hierarchical path: every vector still gets exactly nprobe
    probe rows with a unique probe=1 cell, and super_probes is a real
    monotone recall lever even on this near-uniform fixture (the
    hardest geometry for coarse pruning — measured 82%/95% at sp=2/3,
    exact at sp=all)."""
    flat = _cells(S.ivf_assign(vecs, cents, DIM, hier=False))
    h = S.ivf_assign(vecs, cents, DIM, nprobe=2, hier=True, super_probes=2)
    rows = h.collect()
    per_vec = {}
    for r in rows:
        per_vec.setdefault(r["vec_id"], []).append(r["probe"])
    assert all(sorted(ps) == [1, 2] for ps in per_vec.values())
    assert set(per_vec) == set(flat)

    def agreement(sp: int) -> float:
        h1 = _cells(
            S.ivf_assign(vecs, cents, DIM, hier=True, super_probes=sp)
        )
        return sum(1 for v in flat if h1[v] == flat[v]) / len(flat)

    a2, a3 = agreement(2), agreement(3)
    assert a2 >= 0.75 and a3 >= 0.9, (a2, a3)
    assert a3 >= a2  # more super probes never hurt


def test_hier_more_super_probes_converges_to_flat(spark, vecs, cents):
    """super_probes covering ALL supers makes the hierarchical path
    exact: every cell is reachable, so probe=1 equals flat assignment
    bit-for-bit (same tie-breaks)."""
    flat = _cells(S.ivf_assign(vecs, cents, DIM, hier=False))
    full = _cells(
        S.ivf_assign(vecs, cents, DIM, hier=True, super_probes=24)
    )
    assert full == flat


def test_index_search_recall_through_hier_assign(spark, vecs, tmp_path):
    """An index whose query fan-out uses the hierarchical path keeps
    high top-k recall vs the flat-probed search on the same index."""
    idx = str(tmp_path / "ivf")
    S.ivf_build_index(vecs, idx, DIM)
    queries = vecs.filter(F.col("vec_id") < 40)
    want = {
        (r["query_id"], r["neighbor_id"])
        for r in S.ivf_index_search(queries, idx, DIM, k=3).collect()
    }
    cents = spark.read.parquet(f"{idx}/centroids")
    assigned = spark.read.parquet(f"{idx}/assigned")
    q = S.ivf_assign(queries, cents, DIM, nprobe=2, hier=True,
                     super_probes=3)
    got = set()
    qside = q.select(
        F.col("cell"),
        F.col("vec_id").alias("query_id"),
        S.as_double_array(F.col("embedding")).alias("qv"),
    )
    c = assigned.select(
        "cell",
        F.col("vec_id").alias("neighbor_id"),
        S.as_double_array(F.col("embedding")).alias("cv"),
    )
    from pyspark.sql.window import Window as W

    w = W.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id")
    )
    res = (
        qside.join(c, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", S.cosine(F.col("qv"), F.col("cv")))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
    )
    got = {(r["query_id"], r["neighbor_id"]) for r in res.collect()}
    assert len(got & want) / len(want) >= 0.9
