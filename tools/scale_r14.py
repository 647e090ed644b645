#!/usr/bin/env python3
"""Build SCALE_r14.json from SCALE_r13.json + this round's measurements.

Provenance-hardened (VERDICT r13 wrong-item 1 / next-2): every sample
folded this round must come with a scalerun.sh sidecar
(<bench>.prov.json) proving the measurement regime AND that the working
tree was clean at a recorded commit before and after the run. The fold
REFUSES (non-zero exit) to ingest a sample whose sidecar is missing,
whose clean flag is false, or whose commit differs from the other
samples being folded — a plan change can no longer ship in the same
snapshot as a pre-change measurement labeled "HEAD". Each re-measured
entry records {commit, runner, cpus, heap} inline.

Inputs (produced by tools/scalerun.sh with SCALE_TAG):
  target/scale/bench_sf1_p{1,2,3}.json        fresh sf1 passes (plan-changed entries)
  target/scale/bench_sf10_p{1,2}.json         fresh sf10 passes (the sf10 ten)
plus their .prov.json sidecars.

Entries listed in RE_SF1 get a fresh sf1 median; entries in SF10 get
fresh sf10 samples (median of the passes) and a recomputed
alpha_sf10 = log10(t10_median / t1_median). Everything else carries
from SCALE_r13 (code unchanged — the carried annotation says since when).
"""
import glob, json, math, os, statistics, sys

RE_SF1 = ["q_llm_dedup_substrings"]  # plan changed this round
SF10 = [
    # the r13 five (fresh second samples) + ranks 6-10 (first sf10 data)
    "q_llm_bm25_forget", "q_llm_bm25_incremental", "q_llm_dedup_substrings",
    "q_llm_forget", "q_llm_knn_ivf_incremental",
    "q_llm_dedup_family_recall", "q_llm_knn_pq_incremental",
    "q_llm_knn_ivf_forget", "q_llm_dedup_incremental",
    "q_llm_groups_incremental",
]


def src_equivalent(a, b):
    """True iff the MEASURED surface (src + build) is identical at the two
    commits — a docs-only commit between passes must not poison a fold,
    but any source drift must."""
    import subprocess
    out = subprocess.run(
        ["git", "diff", "--name-only", a, b, "--",
         "src/main/scala", "src/test/scala", "build.sbt"],
        capture_output=True, text=True, check=True).stdout.strip()
    return out == ""


def load_checked(pattern):
    """Load bench jsons matching `pattern`, enforcing sidecar provenance."""
    outs, commits, regimes = [], set(), []
    paths = sorted(p for p in glob.glob(pattern)
                   if not p.endswith(".prov.json"))
    if not paths:
        sys.exit(f"no bench artifacts match {pattern}")
    for p in paths:
        prov_path = p[:-len(".json")] + ".prov.json"
        if not os.path.exists(prov_path):
            sys.exit(f"REFUSED: {p} has no provenance sidecar {prov_path}")
        prov = json.load(open(prov_path))
        if not prov.get("clean"):
            sys.exit(f"REFUSED: {p} measured on a dirty tree / moving HEAD "
                     f"(commit {prov.get('commit', '?')[:9]})")
        commits.add(prov["commit"])
        regimes.append(prov)
        outs.append(json.load(open(p))["queries"])
    base = sorted(commits)[0]
    for c in commits:
        if c != base and not src_equivalent(base, c):
            sys.exit(f"REFUSED: samples span SOURCE-different commits: "
                     f"{sorted(x[:9] for x in commits)}")
    return outs, base, regimes[0]


base = json.load(open("SCALE_r13.json"))

sf1_runs, sf1_commit, sf1_prov = load_checked("target/scale/bench_sf1_p*.json")
sf10_runs, sf10_commit, sf10_prov = load_checked("target/scale/bench_sf10_p*.json")
if sf1_commit != sf10_commit and not src_equivalent(sf1_commit, sf10_commit):
    sys.exit(f"REFUSED: sf1 ({sf1_commit[:9]}) and sf10 ({sf10_commit[:9]}) "
             f"measured at source-different commits")
commit = sf10_commit

for q in RE_SF1:
    rec = base["queries"][q]
    s1 = sorted(round(r[q], 3) for r in sf1_runs if q in r)
    if len(s1) < 3:
        sys.exit(f"{q}: need 3 fresh sf1 samples, have {s1}")
    rec["samples"]["1.0"] = s1
    rec["times"]["1.0"] = statistics.median(s1)
    rec["alpha_tail"] = round(
        math.log10(rec["times"]["1.0"] / rec["times"]["0.1"]), 3)

for q in SF10:
    rec = base["queries"][q]
    s10 = sorted(round(r[q], 3) for r in sf10_runs if q in r)
    if len(s10) < 2:
        sys.exit(f"{q}: need >=2 fresh sf10 samples, have {s10}")
    rec["samples"]["10.0"] = s10
    rec["times"]["10.0"] = statistics.median(s10)
    rec["alpha_sf10"] = round(
        math.log10(rec["times"]["10.0"] / rec["times"]["1.0"]), 3)
    rec.pop("r13", None)
    rec["r14"] = {
        "note": ("re-measured on HEAD this round"
                 + (" (plan changed; fresh sf1 too)" if q in RE_SF1
                    else " (fresh sf10 samples; sf1 median carried)")),
        "commit": commit, "runner": sf10_prov["runner"],
        "cpus": sf10_prov["cpus"], "heap": sf10_prov["heap"],
    }

base["estimator"] = (
    "per-entry median across quiet passes; all samples recorded; r14 "
    "re-measured the 10-entry sf10 set with >=2 provenance-checked passes "
    "each (sidecars assert clean tree + single commit; the fold refuses "
    "anything else) and fresh 3-pass sf1 for the plan-changed substring "
    "dedup; other entries carry r13 numbers (code unchanged)")
json.dump(base, open("SCALE_r14.json", "w"), indent=1)
for q in SF10:
    r = base["queries"][q]
    flag = " *** ABOVE 1.3 GATE ***" if r["alpha_sf10"] > 1.3 else ""
    print(f"{q}: sf1 {r['times']['1.0']} sf10 {r['times']['10.0']} "
          f"samples {r['samples']['10.0']} alpha {r['alpha_sf10']}{flag}")
print(f"commit {commit[:9]} regime {sf10_prov['runner']}/cpus="
      f"{sf10_prov['cpus']}/heap={sf10_prov['heap']}")
