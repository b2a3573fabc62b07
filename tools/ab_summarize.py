#!/usr/bin/env python3
"""Summarize the round-17 A/B runs (tools/ab_r17.sh) into BENCH_AB_R17.json:
per-key MIN across the 3 interleaved runs per binary, the r17/r15 ratio per
key, and the median ratio — the binary-vs-box adjudication number."""
import json
import statistics
import sys

def best(prefix):
    per = {}
    for i in (1, 2, 3):
        with open(f"target/ab/{prefix}_{i}.json") as f:
            q = json.load(f)["queries"]
        for k, v in q.items():
            per[k] = min(per.get(k, float("inf")), v)
    return per

r15, r17 = best("r15"), best("r17")
keys = sorted(r15)
ratios = {k: r17[k] / r15[k] for k in keys}
med = statistics.median(ratios.values())
out = {
    "purpose": "round-17 A/B: r15 binary (77f0d8f) vs r17 HEAD, "
               "10 untouched sub-second keys, 3 interleaved BenchKeys runs "
               "each at sf0.1, per-key min; settles whether round 16's "
               "driver-bench inflation was box decay or a binary regression",
    "r15_min_sec": {k: round(r15[k], 4) for k in keys},
    "r17_min_sec": {k: round(r17[k], 4) for k in keys},
    "ratio_r17_over_r15": {k: round(ratios[k], 4) for k in keys},
    "median_ratio": round(med, 4),
    "total_r15": round(sum(r15.values()), 3),
    "total_r17": round(sum(r17.values()), 3),
}
with open("BENCH_AB_R17.json", "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out, indent=1))
sys.exit(0)
