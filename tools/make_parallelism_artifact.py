#!/usr/bin/env python3
"""Dev-only: fold the local[N] byte-bound-arm bench runs (tools/run_parbench.sh
outputs, named parbench_<N>.json) into the decode-parallelism addendum
artifact (VERDICT r10 #9 / r11 #1).

Usage: python3 tools/make_parallelism_artifact.py OUT note \
           parbench_8.json parbench_16.json parbench_32.json

The per-query MIN is the honest cross-config statistic on this throttling VM
(medians absorb throttle episodes unevenly across configs); speedups are
min(local[base]) / min(local[N]) with base = the smallest N given.
"""
import json, re, sys

out, note = sys.argv[1], sys.argv[2]
runs = {}
for p in sys.argv[3:]:
    d = json.load(open(p))
    # thread count from the run_parbench.sh naming convention, anchored so a
    # stray digit elsewhere in the path can never corrupt it (ADVICE r11)
    m = re.search(r"parbench_(\d+)\.json$", p)
    if not m:
        sys.exit(f"{p}: expected .../parbench_<N>.json (run_parbench.sh output)")
    runs[int(m.group(1))] = d
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
