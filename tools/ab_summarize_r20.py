#!/usr/bin/env python3
"""Summarize the r20 interleaved A/B (round-start c08278f vs r20 HEAD)
into BENCH_AB_R20.json. Design: 6 full Bench runs per binary at
sf0.1/local[32], alternating on one box — pairs 1-3 ran base-first,
pairs 4-6 head-first, so neither binary systematically enjoys the
quieter slot (the box measured 92-223 s total swings on ONE binary this
day; per-key min-of-6 plus order balance is the noise defence)."""
import json, statistics, sys

REPS = range(1, 7)

def best(prefix):
    per, totals, loads = {}, [], []
    for i in REPS:
        try:
            with open(f"/tmp/ab_{prefix}_{i}.json") as f:
                d = json.load(f)
        except FileNotFoundError:
            continue
        totals.append(round(d["value"], 2))
        loads.append(d.get("env", {}).get("loadavg_start"))
        for k, v in d["queries"].items():
            per[k] = min(per.get(k, float("inf")), v)
    return per, totals, loads

base, btot, bload = best("base")
head, htot, hload = best("head")
keys = sorted(set(base) & set(head))
speedup = {k: base[k] / head[k] for k in keys}
med = statistics.median(speedup.values())
out = {
    "purpose": "r20 interleaved A/B: round-start binary (c08278f, fresh "
               "worktree build incl. copyResources) vs r20 HEAD; 6 full "
               "Bench runs per side at sf0.1/local[32], alternating, "
               "order-balanced (3 pairs base-first, 3 head-first); "
               "per-key min-of-6",
    "base_total_runs_sec": btot,
    "head_total_runs_sec": htot,
    "base_min_total_sec": round(sum(base.values()), 2),
    "head_min_total_sec": round(sum(head.values()), 2),
    "total_speedup_min": round(sum(base.values()) / sum(head.values()), 4),
    "median_per_key_speedup": round(med, 4),
    "base_min_sec": {k: round(base[k], 4) for k in keys},
    "head_min_sec": {k: round(head[k], 4) for k in keys},
    "speedup_base_over_head": {k: round(speedup[k], 4) for k in keys},
    "env": {"base_loadavg_starts": bload, "head_loadavg_starts": hload},
}
with open("/root/repo/BENCH_AB_R20.json", "w") as f:
    json.dump(out, f, indent=1)
touched = ["sink_vcf", "sink_vcf_multi", "varda_annotate",
           "varda_annotate_multi", "varda_annotate_store",
           "varda_coverage_join", "varda_coverage_depth",
           "agg_exact_median", "agg_quartiles", "dedup_simhash",
           "agg_freq_ratio", "varda_frequency", "varda_sample_expr",
           "varda_sample_retract", "varda_freq_incremental",
           "text_span_dedup", "graph_components", "graph_pagerank",
           "graph_triangles", "agg_profile_stats"]
print(f"totals: base {out['base_min_total_sec']} -> head {out['head_min_total_sec']}"
      f"  ({out['total_speedup_min']}x)  median per-key {med:.3f}")
for k in touched:
    if k in speedup:
        print(f"{k:28s} {base[k]:6.2f} -> {head[k]:6.2f}  {speedup[k]:5.2f}x")
worst = sorted(speedup.items(), key=lambda x: x[1])[:8]
print("worst:", [(k, round(v, 2)) for k, v in worst])
