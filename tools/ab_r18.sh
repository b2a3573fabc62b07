#!/bin/bash
# Round-18 bench A/B: the round-17 binary (commit aa00d93, built in
# target/r17ab) vs the current HEAD binary, BenchKeys over 10 UNTOUCHED
# sub-second keys at sf0.1, interleaved within one session on one box —
# adjudicates whether the 78.3 -> 104.7 s local min-of-3 delta is box
# decay (per-binary ratio ~1.0) or a binary regression. Same harness
# and key set as round 17's ab_r17.sh.
set -euo pipefail
cd "$(dirname "$0")/.."
KEYS="agg_groupby_sums join_inner_equi join_broadcast win_rank_dense_row \
set_except_all fn_string fn_json topk_per_group events_funnel sort_multi_null"
SF=/root/testdata/sf0.1
mkdir -p target/ab18
for i in 1 2 3; do
  (cd target/r17ab && sbt -batch \
    "runMain graft.BenchKeys $SF /root/repo/target/ab18/r17_$i.json $KEYS" \
    2>&1 | grep -E "benchkeys" | tail -2)
  sbt -batch \
    "runMain graft.BenchKeys $SF /root/repo/target/ab18/r18_$i.json $KEYS" \
    2>&1 | grep -E "benchkeys" | tail -2
done
echo "A/B runs complete: target/ab18/"
