#!/usr/bin/env python3
"""Fold an sf10 spot-run into SCALE_r12.json: for each entry present in
the sf10 bench json, add times["10.0"] / samples["10.0"] and an
"alpha_sf10" tail slope (sf1 median -> sf10), the next-decade analogue of
alpha_tail. Usage: sf10merge.py SCALE_r12.json bench_sf10.json [more...]
"""
import json
import math
import statistics
import sys

art_path = sys.argv[1]
benches = [json.load(open(p)) for p in sys.argv[2:]]
art = json.load(open(art_path))

art.setdefault("passes", {})["10.0"] = [
    {"total": round(b["value"], 1), "warmup_sec": round(b["warmup_sec"], 2),
     "failed": b.get("failed", [])} for b in benches]

merged = 0
for name, rec in art["queries"].items():
    vals = sorted(round(b["queries"][name], 3)
                  for b in benches if b["queries"].get(name, 0) > 0)
    if not vals:
        continue
    t10 = statistics.median(vals)
    rec["times"]["10.0"] = round(t10, 3)
    rec.setdefault("samples", {})["10.0"] = vals
    t1 = rec["times"].get("1.0")
    if t1:
        rec["alpha_sf10"] = round(math.log10(t10 / t1), 3)
    merged += 1

if "10.0" not in art["runs"]:
    art["runs"].append("10.0")
with open(art_path, "w") as f:
    json.dump(art, f, indent=1)

rows = [(n, r) for n, r in art["queries"].items() if "alpha_sf10" in r]
print("| query | t(sf1) | t(sf10) | alpha (sf1->sf10) |")
print("| --- | --- | --- | --- |")
for n, r in sorted(rows, key=lambda x: -x[1]["alpha_sf10"]):
    print(f"| `{n}` | {r['times']['1.0']:.1f} | {r['times']['10.0']:.1f} "
          f"| {r['alpha_sf10']:.2f} |")
bad = [n for n, r in rows if r["alpha_sf10"] > 1.3]
print(f"\n{merged} entries merged; sf10-tail-superlinear (>1.3): "
      + (", ".join(sorted(bad)) if bad else "none"))
