"""The sanctioned Python-UDF surface (SURVEY.md §2.10) — every variant the
engine supports, each with its placement rule:

| variant                       | when                                    |
|-------------------------------|-----------------------------------------|
| built-in expressions          | ALWAYS first choice (whole-stage codegen)|
| pandas_udf scalar             | numpy math over arrays Spark lacks      |
| pandas_udf grouped agg        | custom aggregates (Arrow, partial-less) |
| applyInPandas (grouped map)   | per-group reshaping needing pandas      |
| mapInPandas                   | per-batch decode (operators/multimodal) |
| applyInPandasWithState        | custom streaming state (streaming/)     |
| Python UDTF (lateral)         | one row → variable rows with row logic  |
| row-at-a-time udf             | LAST resort: per-value Python-type logic|

The reference is one big row-at-a-time scalar UDF pipeline
(consumer_to_file.py:88-127); this engine keeps Python OFF the hot path —
normalize/validate are column expressions (functions/normalize.py) — and
routes the remaining Python through Arrow. Tests pin every variant to its
JVM-side equivalent so the Python path can never drift semantically.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


# -- pandas_udf scalar: vectorized cosine over array<double> ---------------

@F.pandas_udf(T.DoubleType())
def cosine_pudf(a: pd.Series, b: pd.Series) -> pd.Series:
    """Arrow-batched cosine similarity: each batch becomes two numpy
    matrices, one BLAS pass per batch — the ~10-100× win over row UDFs.
    Equivalent to the JVM `aggregate` fold in operators/similarity.py
    (asserted in tests); use THIS form when the expression fold gets
    unwieldy (e.g. fused multi-metric kernels), the JVM fold when the
    plan should stay UDF-free."""
    ma = np.vstack(a.to_numpy())
    mb = np.vstack(b.to_numpy())
    num = (ma * mb).sum(axis=1)
    den = np.linalg.norm(ma, axis=1) * np.linalg.norm(mb, axis=1)
    with np.errstate(divide="ignore", invalid="ignore"):
        return pd.Series(np.where(den == 0, 0.0, num / den))


# -- pandas_udf grouped agg: weighted mean ---------------------------------

@F.pandas_udf(T.DoubleType())
def weighted_mean_pudf(v: pd.Series, w: pd.Series) -> float:
    """Grouped-aggregate pandas UDF (one call per group, Arrow-fed).
    NOTE the scale contract: unlike built-in aggregates there is NO
    map-side partial — every group's rows move to one reducer. Fine for
    bounded groups (per-user, per-day); for heavy-tailed groups prefer a
    built-in decomposition (sum(v*w)/sum(w), which this must equal)."""
    den = w.sum()
    return float((v * w).sum() / den) if den else float("nan")


# -- applyInPandas (grouped map): per-group standardization ----------------

def zscore_by_group(
    df: DataFrame, group_col: str, value_col: str, id_col: str = "vec_id"
) -> DataFrame:
    """Grouped-map applyInPandas: standardize a value within its group
    ((x - mean) / std, population std). One shuffle on the group key,
    whole group in pandas memory — the reshaping escape hatch when the
    per-group logic doesn't decompose into window expressions. This one
    DOES decompose (tests assert equality with the window form), which is
    exactly what makes it a safe pin for the mechanism.

    Output schema is (id_col, group_col, z_value), with id/group types
    DERIVED from the input frame — string ids and non-long group keys
    work unchanged."""
    out_schema = T.StructType(
        [
            df.schema[id_col],
            df.schema[group_col],
            T.StructField("z_value", T.DoubleType()),
        ]
    )

    def standardize(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf[value_col].to_numpy(dtype="float64")
        std = x.std()  # population (ddof=0), matches F.stddev_pop
        z = np.zeros_like(x) if std == 0 else (x - x.mean()) / std
        return pd.DataFrame(
            {
                id_col: pdf[id_col],
                group_col: pdf[group_col],
                "z_value": z,
            }
        )

    return df.groupBy(group_col).applyInPandas(standardize, out_schema)


# -- Python UDTF: one row in, variable rows out (Spark 4) ------------------

@F.udtf(returnType="sent_id int, sentence string, n_words int")
class SentencesUDTF:
    """Table-valued Python function (the §2.10 UDTF slot): split a
    document into sentences on ./!/? boundaries, one output row per
    sentence with its ordinal and word count. UDTFs are the
    row-to-variable-rows escape hatch when the expansion logic needs
    Python; THIS one decomposes into split+posexplode JVM expressions,
    and the tests pin the two against each other — same contract as
    every other variant in this module. Used via lateralJoin/LATERAL,
    so the expansion streams without materializing per-doc arrays."""

    def eval(self, text: str):
        if text is None:
            return
        import re

        for i, s in enumerate(
            p.strip() for p in re.split(r"[.!?]+", text) if p.strip()
        ):
            yield i, s, len(s.split())


def sentences_jvm(df: DataFrame, text_col: str) -> DataFrame:
    """The codegen formulation SentencesUDTF must match: regex split +
    filter + posexplode (always preferred on hot paths)."""
    parts = F.filter(
        F.transform(
            F.split(F.col(text_col), r"[.!?]+"), lambda s: F.trim(s)
        ),
        lambda s: s != "",
    )
    return df.select(
        *df.columns, F.posexplode(parts).alias("sent_id", "sentence")
    ).withColumn("n_words", F.size(F.split(F.col("sentence"), r"\s+")))


# -- row-at-a-time udf: the documented last resort -------------------------

@F.udf(T.StringType())
def python_type_of_json(value: str) -> str:
    """The §2.10 escape hatch the survey names: value-level type inference
    needing Python `isinstance` (the reference's infer_clickhouse_type,
    consumer_to_file.py:115-127). Row-at-a-time by nature — each value
    independently round-trips Python. KEEP OFF HOT PATHS: schema
    inference runs on bounded samples only (operators/cdc.py limits to
    10k rows)."""
    if value is None:
        return "none"
    try:
        v = json.loads(value)
    except (ValueError, TypeError):
        return "str"
    if isinstance(v, bool):
        return "bool"
    if isinstance(v, int):
        return "int"
    if isinstance(v, float):
        return "float"
    if isinstance(v, str):
        return "str"
    if isinstance(v, list):
        return "list"
    if isinstance(v, dict):
        return "dict"
    return "other"
