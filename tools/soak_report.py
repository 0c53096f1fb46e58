#!/usr/bin/env python3
"""Render soak_results.jsonl (graft.Soak output) as the scaling table
for docs/SCALING.md: per-query wall time at each scale, the measured
growth factors between consecutive scales, and a linearity verdict.

Growth factors compare COLD first-pass times (sec_cold) when the
harness recorded them; min-of-passes is warm (substrate caches) and
understates small scales. A step is flagged super-linear when its
time growth exceeds the data growth by more than a 1.3x tolerance;
the verdict is judged on the LARGEST-scale step available (smaller
steps are constant-dominated and only warn).
"""
import json
import sys
from collections import defaultdict

path = sys.argv[1] if len(sys.argv) > 1 else "soak_results.jsonl"

print("NOTE: rows aggregate last-write-wins across EVERY run in the",
      file=sys.stderr)
print("jsonl, including subset re-runs. 'cold' means first-pass-per-",
      file=sys.stderr)
print("query WITHIN a run: in a subset re-run an earlier query may have",
      file=sys.stderr)
print("built the shared substrate caches (Dedup.scala), so its 'cold'",
      file=sys.stderr)
print("can be far below a full-family run's (e.g. text_quality 0.7s vs",
      file=sys.stderr)
print("41.5s at 100x). Verdicts are only meaningful over a single",
      file=sys.stderr)
print("full-family run; docs/SCALING.md holds the vetted table.",
      file=sys.stderr)
runs = defaultdict(dict)   # query -> scale -> (cold, warm); last write wins
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
            runs[r["query"]][r["scale"]] = (r.get("sec_cold", r["sec"]), r["sec"])
            # a later success supersedes an earlier error for the same
            # (query, scale) — the soak is re-run after fixes
            errors = [(q, s, e) for (q, s, e) in errors
                      if not (q == r["query"] and s == r["scale"])]

scales = sorted({s for q in runs.values() for s in q})
steps = list(zip(scales, scales[1:]))
hdr = (["query"] + [f"{s}x cold/warm (s)" for s in scales]
       + [f"{a}x→{b}x" for a, b in steps] + ["verdict"])
print("| " + " | ".join(hdr) + " |")
print("|---" * len(hdr) + "|")


def cold(v):
    return v[0] if v else None


for q in sorted(runs, key=lambda q: -(cold(runs[q].get(max(runs[q])))or 0)):
    t = runs[q]
    cells = [f"{t[s][0]:.2f}/{t[s][1]:.2f}" if s in t else "-" for s in scales]
    growths = []
    verdict, vstep = "(incomplete)", None
    for a, b in steps:
        if a in t and b in t and t[a][0]:
            g = t[b][0] / t[a][0]
            growths.append(f"{g:.2f}x")
            ratio = b / a
            vstep = (g, ratio)
        else:
            growths.append("-")
    if vstep:
        g, ratio = vstep
        if g <= ratio:
            verdict = "linear-or-better"
        elif g <= 1.3 * ratio:
            verdict = "~linear"
        else:
            verdict = f"**SUPER-LINEAR** ({g:.1f}x per {ratio:.0f}x)"
    print("| " + " | ".join([q] + cells + growths + [verdict]) + " |")

for q, s, e in errors:
    print(f"\nERROR {q} @ {s}x: {e}")
