#!/usr/bin/env python3
"""Render soak_results.jsonl (graft.Soak output) as the scaling table
for docs/SCALING.md: per-query wall time at each scale, the measured
growth factors, and a linearity verdict.

A query is flagged super-linear when its 10x->100x growth factor
exceeds the data growth by more than 3x tolerance-adjusted margin
(ratio > 13 for a 10x step); the 1x->10x step is noisier (fixed
per-query constants dominate small scales) so it only warns.
"""
import json
import sys
from collections import defaultdict

path = sys.argv[1] if len(sys.argv) > 1 else "soak_results.jsonl"
runs = defaultdict(dict)   # query -> scale -> sec (last write wins)
errors = []
with open(path) as f:
    for line in f:
        line = line.strip()
        if not line:
            continue
        r = json.loads(line)
        if r.get("metric") != "soak":
            continue
        if "error" in r:
            errors.append((r["query"], r["scale"], r["error"]))
        else:
            # growth factors compare COLD first-pass times when the
            # harness recorded them; min-of-passes is warm (substrate
            # caches) and understates small scales
            runs[r["query"]][r["scale"]] = (
                r.get("sec_cold", r["sec"]), r["sec"])
            # a later success supersedes an earlier error for the same
            # (query, scale) — the soak is re-run after fixes
            errors = [(q, s, e) for (q, s, e) in errors
                      if not (q == r["query"] and s == r["scale"])]

scales = sorted({s for q in runs.values() for s in q})
print("| query | " + " | ".join(f"{s}x cold/warm (s)" for s in scales) +
      " | growth 1x->10x | growth 10x->100x | verdict |")
print("|---" * (len(scales) + 4) + "|")


def fmt(v):
    if v is None:
        return "-"
    if isinstance(v, tuple):
        return f"{v[0]:.2f}/{v[1]:.2f}"
    return f"{v:.2f}"


def cold(v):
    return v[0] if isinstance(v, tuple) else v


for q in sorted(runs, key=lambda q: -cold(runs[q].get(100, runs[q].get(10, 0)) or 0)):
    t = {s: runs[q].get(s) for s in scales}
    g10 = cold(t.get(10)) / cold(t.get(1)) if t.get(10) and t.get(1) else None
    g100 = cold(t.get(100)) / cold(t.get(10)) if t.get(100) and t.get(10) else None
    if g100 is None:
        verdict = "(incomplete)"
    elif g100 <= 10.0:
        verdict = "linear-or-better"
    elif g100 <= 13.0:
        verdict = "~linear"
    else:
        verdict = f"**SUPER-LINEAR** ({g100:.1f}x per 10x)"
    row = [q] + [fmt(t.get(s)) for s in scales] + [
        f"{g10:.2f}x" if g10 else "-",
        f"{g100:.2f}x" if g100 else "-", verdict]
    print("| " + " | ".join(str(c) for c in row) + " |")

for q, s, e in errors:
    print(f"\nERROR {q} @ {s}x: {e}")
