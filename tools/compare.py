"""Local replica of the driver's correctness gate.

Runs every registered query on Spark and its oracle on DuckDB at a given
scale factor, then compares row count, column names, and an
order-insensitive value hash (floats canonicalized). Use while iterating:

    python tools/compare.py                 # all queries at sf0.01
    python tools/compare.py q1 join_        # substring filters
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 python tools/compare.py
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time
import traceback

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from basic_data_pipeline_spark import TABLES, get_spark
from basic_data_pipeline_spark import registry

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def canon(v) -> str:
    """Canonicalize one cell for hashing (float-tolerant, None-stable)."""
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon(v[k])}" for k in sorted(v)) + "}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def table_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def run() -> int:
    filters = sys.argv[1:]
    qs = registry.queries()
    oracles = registry.oracle_sql()
    if filters:
        qs = {k: v for k, v in qs.items() if any(f in k for f in filters)}

    spark = get_spark("compare")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    n_pass = n_fail = n_rowsonly = 0
    failures: list[str] = []
    arm_audit: dict[str, dict] = {}
    for name, fn in sorted(qs.items()):
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            srows = sdf.collect()
            scols = sdf.columns
            selapsed = time.time() - t0
        except Exception:
            print(f"FAIL  {name}: spark error")
            traceback.print_exc()
            n_fail += 1
            failures.append(name)
            continue

        # per-arm nonemptiness audit (r10): from the rows already
        # collected — a union-merged slot must not carry an arm that is
        # empty on both sides (empty-vs-empty still hash-matches)
        arm_problems = registry.audit_arm_rows(name, scols, srows)
        tag = registry.ARM_CONTRACT.get(name)
        if tag is not None:
            i = scols.index(tag[0]) if tag[0] in scols else None
            counts = {}
            if i is not None:
                for r in srows:
                    counts[r[i]] = counts.get(r[i], 0) + 1
            arm_audit[name] = {"tag_col": tag[0], "arms": counts,
                               "violations": arm_problems}
        else:
            arm_audit[name] = {"rows": len(srows), "violations": arm_problems}
        if arm_problems:
            print(f"FAIL  {name}: ARM AUDIT: " + "; ".join(arm_problems))
            n_fail += 1
            failures.append(name)
            continue

        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (no oracle) [{selapsed:.1f}s]")
            n_rowsonly += 1
            continue
        try:
            dres = con.execute(oracles[name])
            drows = dres.fetchall()
            dcols = [d[0] for d in dres.description]
        except Exception:
            print(f"FAIL  {name}: duckdb error")
            traceback.print_exc()
            n_fail += 1
            failures.append(name)
            continue

        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duckdb={len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols spark={sorted(scols)} duckdb={sorted(dcols)}")
        if not problems:
            sh = table_hash(scols, [tuple(r) for r in srows])
            dh = table_hash(dcols, drows)
            if sh != dh:
                problems.append(f"hash spark={sh} duckdb={dh}")
                # locate first differing row for debugging
                so = sorted(range(len(scols)), key=lambda i: scols[i])
                do = sorted(range(len(dcols)), key=lambda i: dcols[i])
                sset = sorted("|".join(canon(r[i]) for i in so) for r in srows)
                dset = sorted("|".join(canon(r[i]) for i in do) for r in drows)
                for a, b in zip(sset, dset):
                    if a != b:
                        problems.append(f"  first diff:\n  spark : {a}\n  duckdb: {b}")
                        break
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            n_fail += 1
            failures.append(name)
        else:
            print(f"ok    {name}: {len(srows)} rows [{selapsed:.1f}s]")
            n_pass += 1

    print(
        f"\n{n_pass} ok, {n_rowsonly} rows-only, {n_fail} fail"
        + (f" — failing: {', '.join(failures)}" if failures else "")
    )
    audit_out = os.environ.get("SPARK_GRAFT_ARM_AUDIT_OUT")
    if audit_out and not filters:
        import json

        with open(audit_out, "w") as f:
            json.dump(
                {"sf_dir": SF_DIR, "slots": arm_audit,
                 "all_arms_nonempty": all(
                     not v["violations"] for v in arm_audit.values())},
                f, indent=1, sort_keys=True,
            )
        print(f"arm audit → {audit_out}")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(run())
