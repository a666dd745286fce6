"""One-off: run every registered query at sf0.01 and dump per-tag counts
for every candidate tag column, to seed registry.ARM_CONTRACT."""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from collections import Counter
from basic_data_pipeline_spark import get_spark, registry

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
CAND = ("kind", "grp", "method", "branch", "flavor", "src", "op", "table")

spark = get_spark("arm_scan")
out = {}
for name, fn in registry.queries().items():
    t0 = time.time()
    try:
        df = fn(spark, SF_DIR)
        cols = df.columns
        rows = df.collect()
    except Exception as e:
        out[name] = {"err": repr(e)[:200]}
        print(f"ERR {name}: {e}", flush=True)
        continue
    ent = {"rows": len(rows), "cols": cols, "tags": {}}
    for tc in CAND:
        if tc in cols:
            i = cols.index(tc)
            vals = Counter(r[i] for r in rows)
            if 0 < len(vals) <= 40 and all(isinstance(k, str) for k in vals):
                ent["tags"][tc] = dict(sorted(vals.items()))
    out[name] = ent
    print(f"ok  {name}: {len(rows)} rows, tags={list(ent['tags'])} [{time.time()-t0:.1f}s]", flush=True)

with open("/tmp/arm_scan.json", "w") as f:
    json.dump(out, f, indent=1, sort_keys=True)
print("WROTE /tmp/arm_scan.json", flush=True)
