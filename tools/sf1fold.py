#!/usr/bin/env python3
"""Fold per-entry sf1 oracle runs + carried verdicts into VERIFY_SF1_r{N}.json.

Carried-pass precedence is now MECHANICALLY GUARDED (ADVICE r13 medium):
a verdict carried from an earlier round is only accepted for entries whose
Spark + oracle source is provably unchanged since that round's commit.
"Provably unchanged" is derived from git, not from a hand-curated list:

  1. changed = `git diff --name-only <carried_commit>..HEAD -- src/main/scala`
  2. closure = fixpoint of files that textually reference any changed
     file's top-level object/class/trait names (catches shared-helper
     indirection: an entry defined in TextAnalysis.scala is dirty when
     Dln.scala changes, because TextAnalysis references `Dln` even though
     Dln.scala never mentions the entry's name)
  3. dirty entries = every entry name that appears in a closure file.
     Both the DataFrame code and the DuckDB oracle text live in the same
     source files (SparkEntry.queries / oracleSql contributions), so one
     closure covers both sides.

The fold FAILS (non-zero exit) if any dirty entry lacks a fresh verdict
from this round's runs — a stale pass can no longer be silently recorded.

Verdict vocabulary unchanged: "pass", "FAIL <detail>",
"deferred: <resource reason>"; any FAIL fails the fold; every one of the
oracle's entries must be covered.

Usage:
  sf1fold.py OUT.json ORACLE_SQL.json \
      --carry VERIFY_SF1_r13.json@<commit> [--carry ...] \
      --run target/lv_a.json [--run ...]
"""
import argparse, json, re, subprocess, sys

ap = argparse.ArgumentParser()
ap.add_argument("out")
ap.add_argument("oracle_sql")
ap.add_argument("--carry", action="append", default=[],
                help="ARTIFACT.json@commit — carried verdicts, oldest first")
ap.add_argument("--run", action="append", default=[],
                help="this round's per-entry runner results, oldest first")
args = ap.parse_args()

allnames = set(json.load(open(args.oracle_sql)))


def sh(*cmd):
    return subprocess.run(cmd, capture_output=True, text=True, check=True).stdout


def strip_comments(src):
    """Remove Scala // and (nesting) /* */ comments, preserving string
    literals — `//` is DuckDB integer division inside oracle SQL strings,
    and a comment-only mention of an object (e.g. Tables.scala citing
    `Verify` in a scaladoc) must not create a dependency edge: without
    this the closure saturated to all 295 entries through two comment
    mentions."""
    out, i, n = [], 0, len(src)
    while i < n:
        c = src[i]
        if src.startswith('"""', i):  # triple-quoted string
            j = src.find('"""', i + 3)
            j = n if j < 0 else j + 3
            out.append(src[i:j]); i = j
        elif c == '"':
            j = i + 1
            while j < n and src[j] != '"':
                j += 2 if src[j] == '\\' else 1
            out.append(src[i:j + 1]); i = j + 1
        elif src.startswith("//", i):
            j = src.find("\n", i)
            i = n if j < 0 else j
        elif src.startswith("/*", i):
            depth, i = 1, i + 2
            while i < n and depth:
                if src.startswith("/*", i): depth += 1; i += 2
                elif src.startswith("*/", i): depth -= 1; i += 2
                else: i += 1
        else:
            out.append(c); i += 1
    return "".join(out)


def top_level_names(path, rev="HEAD"):
    """Top-level object/class/trait names defined in a Scala file at rev."""
    try:
        src = strip_comments(sh("git", "show", f"{rev}:{path}"))
    except subprocess.CalledProcessError:
        return set()
    # any modifier sequence allowed (sealed/abstract/implicit/private[pkg]/
    # protected/final/case/lazy, in any order) — ADVICE r14: a bare
    # `sealed trait X` with no companion otherwise escapes the closure
    return set(re.findall(
        r"^\s*(?:(?:private(?:\[\w+\])?|protected(?:\[\w+\])?|final|sealed"
        r"|abstract|implicit|case|lazy)\s+)*"
        r"(?:object|class|trait)\s+(\w+)", src, re.M))


def dirty_entries(commit):
    """Entry names whose Spark-or-oracle source changed since `commit`."""
    changed = [f for f in sh("git", "diff", "--name-only",
                             f"{commit}..HEAD", "--", "src/main/scala")
               .splitlines() if f]
    if not changed:
        return set(), []
    tracked = [f for f in sh("git", "ls-files", "src/main/scala").splitlines()
               if f]
    body = {}
    for f in tracked:
        try:
            body[f] = strip_comments(sh("git", "show", f"HEAD:{f}"))
        except subprocess.CalledProcessError:
            body[f] = ""
    closure = set(changed)
    while True:
        # names defined by the current closure, at HEAD and at the carried
        # commit (a deleted/renamed helper still dirties its old referents)
        names = set()
        for f in closure:
            names |= top_level_names(f, "HEAD") | top_level_names(f, commit)
        pats = [re.compile(rf"\b{re.escape(n)}\b") for n in names]
        grown = closure | {f for f, src in body.items()
                           if any(p.search(src) for p in pats)}
        if grown == closure:
            break
        closure = grown
    dirty = {n for n in allnames
             if any(n in body.get(f, "") for f in closure)}
    return dirty, sorted(closure)


entries, provenance = {}, {}
for spec in args.carry:
    path, commit = spec.rsplit("@", 1)
    art = json.load(open(path))
    dirty, closure = dirty_entries(commit)
    print(f"carry {path}@{commit[:9]}: {len(dirty)} entries dirtied by "
          f"{len(closure)} changed/closure files")
    for n, v in art["entries"].items():
        ok = v == "pass" or v.startswith("pass (")
        if ok and n not in dirty:
            entries[n] = f"pass ({path.split('/')[-1]} @ {commit[:9]}; " \
                         f"source unchanged since — git-derived)"
for path in args.run:
    for n, v in json.load(open(path)).items():
        entries[n] = v

missing = sorted(allnames - set(entries))
extra = sorted(set(entries) - allnames)
if missing or extra:
    sys.exit(f"coverage gap — dirty-or-new entries lacking a fresh verdict: "
             f"missing={missing} extra={extra}")
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
                "with spill quota + timeout; resource exhaustion recorded as "
                "deferred, never fail; carried passes are git-guarded — a "
                "carried verdict is refused for any entry whose source "
                "reference-closure changed since the carried commit"),
       "entries": entries}
json.dump(res, open(args.out, "w"), indent=1)
print(f"{npass} pass / {ncarried} carried / {ndef} deferred / 0 fail -> {args.out}")
