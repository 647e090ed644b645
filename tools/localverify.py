#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify first
(writes <out>/<query>/ parquet dirs + oracle_sql.json), then this script
runs each oracle SQL in DuckDB over the same test tables and compares.

Usage: python3 tools/localverify.py [sfdir] [verify_out] [query_filter...]
"""
import json, sys, glob
import duckdb
import pandas as pd

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/verify_out"
only = set(sys.argv[3:])

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def tpath(d, t):
    """Driver fixtures are single parquet FILES; GenData tables are
    DIRECTORIES of part files - glob accordingly."""
    import os
    p = f"{d}/{t}.parquet"
    return f"{p}/*.parquet" if os.path.isdir(p) else p

con = duckdb.connect()
# LV_MEMLIMIT (e.g. "40GB"): bound DuckDB so heavy sf1 oracles spill to
# temp disk instead of riding the 80%-of-RAM default into the kernel OOM
# killer (a 292-entry sf1 pass was OOM-killed at ~111 GB RSS without it).
_ml = __import__("os").environ.get("LV_MEMLIMIT")
if _ml:
    con.execute(f"SET memory_limit='{_ml}'")
    con.execute(f"SET temp_directory="
                f"'{__import__('os').environ.get('LV_SPILLDIR', '/tmp/duckspill')}'")
# LV_THREADS: bound DuckDB's thread pool so the oracle re-check can share
# the box with concurrent sbt/Spark work (default: all cores).
_th = __import__("os").environ.get("LV_THREADS")
if _th:
    con.execute(f"SET threads={int(_th)}")
for t in TABLES:
    if t == "events":
        # mirror Spark's ns->us truncation of the TIMESTAMP_NS column
        con.execute(f"CREATE VIEW events AS SELECT event_id, "
                    f"CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, "
                    f"value, props FROM '{tpath(sfdir, 'events')}'")
    else:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{tpath(sfdir, t)}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

# LV_MATERIALIZE=cte1,cte2: rewrite `<name> AS (` -> `<name> AS MATERIALIZED (`
# in the oracle SQL before running it. Pure evaluation hint (DuckDB >= 0.10
# inlines CTEs by default, so one referenced k times re-evaluates k times —
# the 32-plane-dot `bits` CTE at sf1 measured ~27 CPU-hours uncapped); the
# result set is identical, only the evaluation strategy changes. Off by
# default so the driver-mirror compare runs the committed SQL verbatim.
_mat = [c.strip() for c in __import__("os").environ
        .get("LV_MATERIALIZE", "").split(",") if c.strip()]
if _mat:
    import re as _re
    for k in list(oracle):
        for c in _mat:
            oracle[k] = _re.sub(rf"(\b{_re.escape(c)} AS) \(",
                                r"\1 MATERIALIZED (", oracle[k])

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize timestamps to us precision for cross-engine compare
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

fails, passes, skips = [], 0, 0
for name in sorted(oracle):
    if only and name not in only:
        continue
    spark_dir = f"{outdir}/{name}"
    files = glob.glob(f"{spark_dir}/*.parquet")
    if not files:
        fails.append((name, "NO_SPARK_OUTPUT"))
        continue
    try:
        sp = con.execute(f"SELECT * FROM '{spark_dir}/*.parquet'").df()
        oc = con.execute(oracle[name]).df()
    except Exception as e:
        # carry the exception CLASS so the per-entry runner can key its
        # resource-deferral detection on it (duckdb.OutOfMemoryException /
        # duckdb.IOException) instead of substring-matching the message
        fails.append((name, f"ERR[{type(e).__name__}] {str(e)[:300]}"))
        continue
    sp, oc = canon(sp), canon(oc)
    if list(sp.columns) != list(oc.columns):
        fails.append((name, f"COLS spark={list(sp.columns)} oracle={list(oc.columns)}"))
        continue
    if len(sp) != len(oc):
        fails.append((name, f"ROWS spark={len(sp)} oracle={len(oc)}"))
        continue
    bad = None
    for c in sp.columns:
        a, b = sp[c], oc[c]
        try:
            if a.dtype != b.dtype:
                # driver's hash compare coerces integer widths (r1 evidence:
                # row_number int32 vs BIGINT passed) — only flag non-int diffs
                if str(a.dtype).startswith("int") and str(b.dtype).startswith("int"):
                    a, b = a.astype("int64"), b.astype("int64")
                else:
                    bad = f"DTYPE {c}: spark={a.dtype} oracle={b.dtype}"
                    break
            if not a.equals(b):
                idx = (a != b) & ~(a.isna() & b.isna())
                i = idx[idx].index[0] if idx.any() else None
                bad = f"VAL {c} @row{i}: spark={a[i]!r} oracle={b[i]!r}"
                break
        except Exception as e:
            bad = f"CMPERR {c}: {str(e)[:200]}"
            break
    if bad:
        fails.append((name, bad))
    else:
        passes += 1

print(f"PASS {passes}  FAIL {len(fails)}")
for n, why in fails:
    print(f"  FAIL {n}: {why}")
