#!/usr/bin/env python3
"""Fit per-query scaling exponents from Bench runs at several scale
factors (the r11 scale-proof): t(sf) ~ c * sf^alpha, fitted by least
squares in log10-log10 space over all measured scales, plus the tail
slope between the two largest scales (the segment where fixed
orchestration floors — stream triggers, store init, planning — have been
amortized and the data term dominates; for tick-style entries the
3-point fit UNDERstates data growth at small sf for the same reason).

Usage: scalefit.py out.json sf:bench.json [sf:bench.json ...]
Writes a JSON artifact {query: {times:{sf:t}, alpha, alpha_tail}} and
prints a markdown table sorted by alpha descending.
"""
import json
import math
import sys

out_path = sys.argv[1]
runs = []  # (sf, {query: sec})
for arg in sys.argv[2:]:
    sf, path = arg.split(":", 1)
    with open(path) as f:
        d = json.load(f)
    runs.append((float(sf), d["queries"]))
runs.sort()

names = sorted(set.intersection(*[set(q) for _, q in runs]))
res = {}
for n in names:
    pts = [(sf, q[n]) for sf, q in runs if q.get(n, 0) > 0]
    if len(pts) < 2:
        continue
    xs = [math.log10(sf) for sf, _ in pts]
    ys = [math.log10(t) for _, t in pts]
    mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
    denom = sum((x - mx) ** 2 for x in xs)
    alpha = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / denom
    (sf_a, t_a), (sf_b, t_b) = pts[-2], pts[-1]
    alpha_tail = math.log10(t_b / t_a) / math.log10(sf_b / sf_a)
    res[n] = {
        "times": {str(sf): round(t, 3) for sf, t in pts},
        "alpha": round(alpha, 3),
        "alpha_tail": round(alpha_tail, 3),
    }

with open(out_path, "w") as f:
    json.dump({"runs": [str(sf) for sf, _ in runs], "queries": res}, f, indent=1)

hdr_sfs = [str(sf) for sf, _ in runs]
print("| query | " + " | ".join(f"t(sf{s})" for s in hdr_sfs) +
      " | alpha (fit) | alpha (tail) |")
print("|" + " --- |" * (len(hdr_sfs) + 3))
for n in sorted(res, key=lambda k: -res[k]["alpha_tail"]):
    r = res[n]
    ts = " | ".join(f"{r['times'].get(s, float('nan')):.2f}" for s in hdr_sfs)
    print(f"| `{n}` | {ts} | {r['alpha']:.2f} | {r['alpha_tail']:.2f} |")
bad = [n for n in res if res[n]["alpha_tail"] > 1.3]
print(f"\n{len(res)} queries; tail-superlinear (>1.3): {bad if bad else 'none'}")
