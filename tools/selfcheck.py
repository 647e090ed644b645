#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB against the sf tables and compare (columns sorted by name, rows
sorted) against the parquet that graft.Verify dumped. Exact match required
(floats compared bitwise after both sides' round())."""
import json, sys, glob
import duckdb

# optional: --json <path> writes a committed-artifact form, one verdict per
# entry ("ok" | the failure line), plus the sf dir it ran against
json_out = None
argv = list(sys.argv[1:])
if "--json" in argv:
    i = argv.index("--json")
    json_out = argv[i + 1]
    del argv[i:i + 2]
sf_dir = argv[0] if len(argv) > 0 else "/root/testdata/sf0.01"
out_dir = argv[1] if len(argv) > 1 else "/tmp/verify_out"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def tpath(d, t):
    """Driver fixtures are single parquet FILES; GenData tables are
    DIRECTORIES of part files - glob accordingly."""
    import os
    p = f"{d}/{t}.parquet"
    return f"{p}/*.parquet" if os.path.isdir(p) else p

con = duckdb.connect()
for t in TABLES:
    if t == "events":
        # mirror Spark's µs truncation of a NANOS-generation ts column
        # (a no-op when the fixture is already TIMESTAMP_MICROS)
        con.execute(f"CREATE VIEW events AS SELECT event_id, "
                    f"CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, "
                    f"value, props FROM '{tpath(sf_dir, 'events')}'")
    else:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{tpath(sf_dir, t)}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
ok = fail = skipped = 0
verdicts = {}
for name in sorted(oracle):
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        print(f"MISSING SPARK OUTPUT: {name}")
        verdicts[name] = "missing spark output"
        fail += 1
        continue
    try:
        got = con.execute(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
        exp = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        print(f"ERROR {name}: {e}")
        verdicts[name] = f"error: {e}"
        fail += 1
        continue
    got = got.reindex(sorted(got.columns), axis=1)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    if list(got.columns) != list(exp.columns):
        print(f"SCHEMA MISMATCH {name}: spark={list(got.columns)} oracle={list(exp.columns)}")
        verdicts[name] = "schema mismatch"
        fail += 1
        continue
    if len(got) != len(exp):
        print(f"ROWCOUNT MISMATCH {name}: spark={len(got)} oracle={len(exp)}")
        verdicts[name] = f"rowcount mismatch: spark={len(got)} oracle={len(exp)}"
        fail += 1
        continue
    gs = got.sort_values(by=list(got.columns), ignore_index=True)
    es = exp.sort_values(by=list(exp.columns), ignore_index=True)
    # normalize dtypes for compare
    import pandas as pd
    diff_cols = []
    for c in gs.columns:
        a, b = gs[c], es[c]
        try:
            if a.dtype != b.dtype:
                b = b.astype(a.dtype)
        except Exception:
            pass
        eq = (a == b) | (a.isna() & b.isna())
        if not eq.all():
            diff_cols.append((c, int((~eq).sum())))
    if diff_cols:
        print(f"VALUE MISMATCH {name}: {diff_cols}")
        for c, _ in diff_cols[:2]:
            m = ~((gs[c] == es[c]) | (gs[c].isna() & es[c].isna()))
            print("  spark:", gs[m][c].head(3).tolist(), " oracle:", es[m][c].head(3).tolist())
        verdicts[name] = f"value mismatch: {diff_cols[:4]}"
        fail += 1
    else:
        verdicts[name] = "ok"
        ok += 1
print(f"\n{ok} ok, {fail} fail, {skipped} no-oracle")
if json_out:
    with open(json_out, "w") as f:
        json.dump({"sf_dir": sf_dir, "ok": ok, "fail": fail,
                   "entries": verdicts}, f, indent=1, sort_keys=True)
sys.exit(1 if fail else 0)
