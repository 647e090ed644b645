#!/usr/bin/env python3
"""Fold localverify runs into a committed verdict artifact:
{"sf":..., "pass":N, "fail":M, "entries":{name: "pass"|"<reason>"}}.

Each run is NAMESFILE:LOG where NAMESFILE lists the entry names that run
covered (one per line) and LOG is its localverify output. localverify
prints only the failures per-entry plus a "PASS n FAIL m" summary, so
passing entries are reconstructed as (names - fails) and cross-checked
against the summary count. Later runs override earlier verdicts.
Usage: lv2json.py out.json sf NAMESFILE:LOG [NAMESFILE:LOG...]
"""
import json, re, sys

out, sf = sys.argv[1], sys.argv[2]
entries = {}
for arg in sys.argv[3:]:
    namesfile, log = arg.split(":", 1)
    names = [l.strip() for l in open(namesfile) if l.strip()]
    fails, summary = {}, None
    for line in open(log):
        m = re.match(r"\s*FAIL\s+(\S+):\s*(.*)$", line)
        if m:
            fails[m.group(1)] = m.group(2)
        m = re.match(r"PASS (\d+)\s+FAIL (\d+)", line)
        if m:
            summary = (int(m.group(1)), int(m.group(2)))
    if summary is None:
        sys.exit(f"{log}: no summary line - run incomplete?")
    if summary != (len(names) - len(fails), len(fails)):
        sys.exit(f"{log}: summary {summary} != reconstructed "
                 f"({len(names) - len(fails)}, {len(fails)})")
    for n in names:
        entries[n] = fails.get(n, "pass")
res = {"sf": sf,
       "pass": sum(1 for v in entries.values() if v == "pass"),
       "fail": sum(1 for v in entries.values() if v != "pass"),
       "entries": dict(sorted(entries.items()))}
json.dump(res, open(out, "w"), indent=1)
print(f"{res['pass']} pass / {res['fail']} fail -> {out}")
