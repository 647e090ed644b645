#!/usr/bin/env python3
"""Build SCALE_r13.json: SCALE_r12 carried forward, with the two entries
whose plans changed this round (sample-trained IVF re-train, doc-range-
sharded substring dedup) re-measured on HEAD — 3 quiet sf1 passes
(median + samples) and a fresh sf10 pass. alpha_sf10 recomputed as
log10(t10/t1_median); carried entries keep their r12 numbers (code
unchanged). Sources: target/scale/bench_sf1_p{1,2,3}.json and
target/scale/bench_sf10_r13.json.
"""
import json, math, statistics

base = json.load(open("SCALE_r12.json"))
changed = ["q_llm_knn_ivf_incremental", "q_llm_dedup_substrings"]

sf1 = [json.load(open(f"target/scale/bench_sf1_p{i}.json"))["queries"]
       for i in (1, 2, 3)]
sf10 = json.load(open("target/scale/bench_sf10_r13.json"))["queries"]

for q in changed:
    rec = base["queries"][q]
    s1 = sorted(round(p[q], 3) for p in sf1)
    m1 = statistics.median(s1)
    t10 = round(sf10[q], 3)
    rec["samples"]["1.0"] = s1
    rec["times"]["1.0"] = m1
    rec["samples"]["10.0"] = [t10]
    rec["times"]["10.0"] = t10
    rec["alpha_sf10"] = round(math.log10(t10 / m1), 3)
    # alpha_tail spans 0.1 -> 1.0 on the carried sf0.1 median
    t01 = rec["times"]["0.1"]
    rec["alpha_tail"] = round(math.log10(m1 / t01), 3)
    rec["r13"] = "re-measured on HEAD (plan changed this round)"

base["estimator"] = ("per-entry median across quiet passes; all samples "
                     "recorded; r13 re-measured only the two plan-changed "
                     "entries (others carried from r12, code unchanged)")
json.dump(base, open("SCALE_r13.json", "w"), indent=1)
for q in changed:
    r = base["queries"][q]
    print(q, "sf1", r["times"]["1.0"], "sf10", r["times"]["10.0"],
          "alpha_sf10", r["alpha_sf10"])
