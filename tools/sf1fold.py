#!/usr/bin/env python3
"""Fold the round's per-entry sf1 oracle runs into VERIFY_SF1_r13.json.

Precedence (later overrides earlier):
  1. carried r11 verdicts — the heavy-34 set DuckDB-verified at sf1 in
     r11, valid at HEAD only for entries whose code AND oracle are
     unchanged since (the changed set is re-checked this round and
     overrides);
  2. VERIFY_SF1_r12.json passes (r12 outputs == HEAD outputs for
     unchanged entries);
  3. this round's per-entry runner results, newest last.

The vocabulary is the runner's: "pass", "FAIL <detail>", or
"deferred: <resource reason>" — a resource error can never appear as a
fail row (the r12 ENOSPC lesson, VERDICT r12 wrong-item 2). The fold
fails loudly if any of the 295 entries is missing or any FAIL remains.

Usage: sf1fold.py OUT.json ORACLE_SQL.json
"""
import json, sys

out, oracle_path = sys.argv[1], sys.argv[2]
allnames = set(json.load(open(oracle_path)))
entries = {}

# 1. carried r11 (heavy-34) — annotated, overridden by anything newer
r11_34 = set(json.load(open("SCALE_r11.json"))["queries"])
for n in r11_34:
    entries[n] = "pass (r11 sf1 oracle check; code+oracle unchanged since)"

# 2. r12 passes
r12 = json.load(open("VERIFY_SF1_r12.json"))["entries"]
for n, v in r12.items():
    if v == "pass":
        entries[n] = "pass (r12 sf1 oracle check; code+oracle unchanged since)"

# 3. this round's runs, in execution order
runs = ["target/lv_sf1_r13.json", "target/lv_sf1_chg.json",
        "target/lv_sf1_dln.json", "target/lv_sf1_sig.json",
        "target/lv_sf1_mid.json", "target/lv_sf1_cap.json"]
for path in runs:
    for n, v in json.load(open(path)).items():
        entries[n] = v

missing = sorted(allnames - set(entries))
extra = sorted(set(entries) - allnames)
if missing or extra:
    sys.exit(f"coverage mismatch: missing={missing} extra={extra}")
entries = {n: entries[n] for n in sorted(allnames)}

npass = sum(1 for v in entries.values() if v == "pass")
ncarried = sum(1 for v in entries.values() if v.startswith("pass ("))
ndef = sum(1 for v in entries.values() if v.startswith("deferred"))
nfail = len(entries) - npass - ncarried - ndef
if nfail:
    sys.exit("FAIL rows present: " +
             str({k: v for k, v in entries.items()
                  if not (v == "pass" or v.startswith("pass (")
                          or v.startswith("deferred"))}))
res = {"sf": "1.0", "pass": npass, "carried_pass": ncarried,
       "deferred": ndef, "fail": 0,
       "note": ("per-entry one-process oracle runs (tools/lv_perentry.py) "
                "with spill quota + timeout; resource exhaustion is recorded "
                "as deferred, never as fail; heavy oracles ran with "
                "LV_MATERIALIZE (evaluation hint only - results identical)"),
       "entries": entries}
json.dump(res, open(out, "w"), indent=1)
print(f"{npass} pass / {ncarried} carried / {ndef} deferred / 0 fail -> {out}")
