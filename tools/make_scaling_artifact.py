#!/usr/bin/env python3
"""Parse a dual-SF Bench run (SPARK_GRAFT_SF_DIRS mode) into SCALING_r{N}.json:
the raw per-SF JSON lines plus sf0.1->sf1 cost exponents over the queries both
SFs timed (exponent = log10(min_sf1/min_sf01), since the fixture is 10x)."""
import json
import math
import sys

raw, out, note = sys.argv[1], sys.argv[2], sys.argv[3]
lines = []
for ln in open(raw):
    ln = ln.strip()
    if ln.startswith('{"metric"'):
        lines.append(json.loads(ln))
if len(lines) < 2:
    sys.exit(f"expected 2 JSON lines in {raw}, found {len(lines)}")

small = next(l for l in lines if "sf0.1" in l["sf"])
big = next(l for l in lines if "sf1" in l["sf"])
exps = {}
for q, v1 in big["mins"].items():
    v0 = small["mins"].get(q)
    if v0 and v0 > 0 and v1 > 0:
        exps[q] = round(math.log10(v1 / v0), 3)

json.dump(
    {"note": note, "lines": lines,
     "exponents_common_top_queries": dict(sorted(exps.items()))},
    open(out, "w"), indent=1)
print(f"{out}: {len(exps)} exponents; "
      f"max {max(exps.items(), key=lambda x: x[1]) if exps else None}")
