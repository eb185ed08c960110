#!/usr/bin/env python3
"""Dev-only: fold the local[N] byte-bound-arm bench runs (run_parbench outputs)
into the SCALING_r{N}.json decode-parallelism addendum (VERDICT r10 #9).

Usage: python3 tools/make_parallelism_artifact.py OUT note in8.json in16.json in32.json

The per-query MIN is the honest cross-config statistic on this throttling VM
(medians absorb throttle episodes unevenly across configs); speedups are
min(local[8]) / min(local[N]).
"""
import json, sys

out, note = sys.argv[1], sys.argv[2]
runs = {}
for p in sys.argv[3:]:
    d = json.load(open(p))
    # cpus isn't in the JSON; recover it from the filename convention parbenchN.json
    n = int("".join(ch for ch in p.split("/")[-1] if ch.isdigit()))
    runs[n] = d
base = min(runs)
speedups = {}
for q in runs[base]["mins"]:
    speedups[q] = {
        str(n): round(runs[base]["mins"][q] / runs[n]["mins"][q], 2)
        for n in sorted(runs)
    }
art = {
    "note": note,
    "configs": {str(n): {"total_min_sum": round(sum(r["mins"].values()), 2),
                         "throttle_ratio": r.get("throttle_ratio"),
                         "passes": r.get("passes"),
                         "mins": r["mins"]}
                for n, r in sorted(runs.items())},
    "speedup_vs_local%d" % base: speedups,
}
json.dump(art, open(out, "w"), indent=1)
print(f"{out}: base local[{base}], configs {sorted(runs)}")
