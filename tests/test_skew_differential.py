"""Skewed-fixture differential coverage (r10 verdict item #5).

The oracle fixtures are uniform (seed=42), so the salting/cap machinery
— `rollup.salted_sum`'s two-phase split, the salted fact⋈dim join,
`max_band_df`-capped LSH banding, the BM25 `max_df_frac` cut — was never
oracle-checked in a regime where it actually BINDS. This suite rewrites
two tables into a hot-key variant (one event_type carrying ~90% of
events; 40% of documents forming one near-duplicate pile whose shared
tokens dominate every LSH band and document-frequency table) and replays
the REGISTERED queries + their REGISTERED oracle SQL over the skewed
files: same row count, same columns, same order-insensitive value hash —
the driver's gate, at a point of the input space the driver never
visits. Salting and caps must change EXECUTION, never results.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

#: slow tier (r12): differential skew campaign; the salted-join correctness pin stays in the default tier via the oracle-checked join_salted_skew slot
pytestmark = pytest.mark.slow

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from basic_data_pipeline_spark import TABLES, registry
from tools.compare import table_hash

SRC = "/root/testdata/sf0.001"

#: slots whose operators carry salting or hot-key caps — the machinery
#: this fixture exists to stress (agg: salted 2-phase sum + exact
#: percentiles on the hot group; join: salted fact⋈dim; minhash/lsh:
#: banded candidates with hot-bucket caps + jaccard verify; topk:
#: the bm25 max-df cut + rrf fusion over the pile-dominated dfreq)
SLOTS = [
    "agg_salted_skew",
    "join_salted_skew",
    "dedup_minhash_lsh",
    "dedup_lsh_verified",
    "sim_topk_methods",
]

_PILE_BASE = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu "
    "nu xi omicron pi rho sigma tau upsilon phi chi psi omega one two "
    "three four five six seven eight nine ten eleven twelve thirteen "
    "fourteen fifteen"
)


@pytest.fixture(scope="module")
def skew_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("skew")
    con = duckdb.connect()
    for t in TABLES:
        if t in ("events", "documents"):
            continue
        os.symlink(f"{SRC}/{t}.parquet", f"{d}/{t}.parquet")
    # events: one hot event_type (~90% of rows) — the worst-skew shape
    # the salted aggregation/join exist for
    con.execute(
        f"""
        COPY (SELECT event_id, ts, user_id,
                     CASE WHEN event_id % 10 != 0 THEN 'click'
                          ELSE event_type END AS event_type,
                     value, props
              FROM read_parquet('{SRC}/events.parquet'))
        TO '{d}/events.parquet' (FORMAT PARQUET)
        """
    )
    # documents: a 40% near-duplicate pile — 40 shared tokens + one
    # varying token per doc (pairwise jaccard ≈ 0.95 across the whole
    # pile), so every LSH band is pile-hot and the shared terms dominate
    # the BM25 document-frequency table
    con.execute(
        f"""
        COPY (SELECT doc_id,
                     CASE WHEN doc_id % 5 < 2
                          THEN '{_PILE_BASE} variant' || CAST(doc_id % 7 AS VARCHAR)
                          ELSE text END AS text,
                     lang, source,
                     CAST(length(CASE WHEN doc_id % 5 < 2
                          THEN '{_PILE_BASE} variant' || CAST(doc_id % 7 AS VARCHAR)
                          ELSE text END) AS BIGINT) AS n_chars
              FROM read_parquet('{SRC}/documents.parquet'))
        TO '{d}/documents.parquet' (FORMAT PARQUET)
        """
    )
    con.close()
    return str(d)


@pytest.fixture(scope="module")
def duck(skew_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{skew_dir}/{t}.parquet'"
        )
    yield con
    con.close()


def test_fixture_is_actually_skewed(skew_dir, duck):
    hot = duck.execute(
        "SELECT max(n) * 1.0 / sum(n) FROM (SELECT count(*) n FROM events "
        "GROUP BY event_type)"
    ).fetchone()[0]
    assert hot > 0.85, f"hot event_type carries only {hot:.0%}"
    pile = duck.execute(
        "SELECT count(*) FROM documents WHERE doc_id % 5 < 2"
    ).fetchone()[0]
    assert pile >= 150  # one near-dup component of this size


@pytest.mark.parametrize("name", SLOTS)
def test_skewed_oracle_hash_matches(name, spark, skew_dir, duck):
    qs = registry.queries()
    oracles = registry.oracle_sql()
    sdf = qs[name](spark, skew_dir)
    srows, scols = sdf.collect(), sdf.columns
    cur = duck.execute(oracles[name])
    ocols = [c[0] for c in cur.description]
    orows = cur.fetchall()
    assert len(srows) == len(orows), f"{name}: row count under skew"
    assert sorted(scols) == sorted(ocols), f"{name}: columns under skew"
    assert table_hash(scols, srows) == table_hash(ocols, orows), (
        f"{name}: value hash diverged under skew"
    )
    # the arm contract holds under skew too: no arm may silently empty
    # (e.g. the bm25 max-df cut erasing the pile-dominated vocabulary)
    problems = registry.audit_arm_rows(name, scols, srows)
    assert problems == [], problems
