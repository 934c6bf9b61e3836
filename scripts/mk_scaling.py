#!/usr/bin/env python3
"""Build SCALING.md from two full-surface bench artifacts (sf0.01, sf0.1).

Classifies each query by its 10x-data time ratio:
  <1.5   overhead-bound (JVM/commit/plan setup dominates at these SFs)
  1.5-4  sub-linear (partial aggregation / pruning absorbing growth)
  4-12   ~linear in data (or output)
  >12    super-linear -> listed loudly for audit
"""
import json, sys

small = json.load(open(sys.argv[1]))  # sf0.01
big = json.load(open(sys.argv[2]))    # sf0.1
out = sys.argv[3]

rows = []
for q, t1 in sorted(big["queries"].items()):
    t0 = small["queries"].get(q)
    if t0 is None or t0 <= 0 or t1 <= 0:
        continue
    rows.append((q, t0, t1, t1 / t0))

def bucket(r):
    if r < 1.5: return "overhead-bound"
    if r < 4: return "sub-linear"
    if r < 12: return "~linear"
    return "SUPER-LINEAR"

counts = {}
for _, _, _, r in rows:
    counts[bucket(r)] = counts.get(bucket(r), 0) + 1

lines = []
lines.append("# SCALING — measured 10x-data behavior (sf0.01 -> sf0.1, local[32])")
lines.append("")
lines.append("One full-surface bench run per SF, same binary, same session config")
lines.append("(pinned order, sf0.001 warmup). Per HACKING.md's drift findings,")
lines.append("individual ratios carry up to ~1.5x VM noise; the CLASS of a query")
lines.append("(overhead-bound vs linear) is robust, single ratios are not.")
lines.append("")
lines.append(f"- total: {small['value']:.1f}s (sf0.01) -> {big['value']:.1f}s (sf0.1) over {len(rows)} shared queries")
for b in ["overhead-bound", "sub-linear", "~linear", "SUPER-LINEAR"]:
    lines.append(f"- {b}: {counts.get(b, 0)} queries")
lines.append("")
lines.append("| query | sf0.01 s | sf0.1 s | 10x ratio | class |")
lines.append("|---|---|---|---|---|")
for q, t0, t1, r in sorted(rows, key=lambda x: -x[3]):
    lines.append(f"| `{q}` | {t0:.2f} | {t1:.2f} | {r:.1f} | {bucket(r)} |")
lines.append("")
open(out, "w").write("\n".join(lines) + "\n")
print(f"wrote {out}: {len(rows)} rows, classes {counts}")
