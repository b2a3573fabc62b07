#!/bin/bash
# Round-17 bench A/B (VERDICT round-16 item 2): the round-15 binary
# (commit 77f0d8f, built in target/r15ab) vs the current HEAD binary,
# BenchKeys over 10 UNTOUCHED sub-second keys at sf0.1, interleaved
# r15/r17 within one session on one box — settles whether round 16's
# 98.5 -> 133.1 s driver-bench delta was box decay (per-binary ratio
# ~1.0) or a binary regression.
set -euo pipefail
cd "$(dirname "$0")/.."
KEYS="agg_groupby_sums join_inner_equi join_broadcast win_rank_dense_row \
set_except_all fn_string fn_json topk_per_group events_funnel sort_multi_null"
SF=/root/testdata/sf0.1
mkdir -p target/ab
for i in 1 2 3; do
  (cd target/r15ab && sbt -batch \
    "runMain graft.BenchKeys $SF /root/repo/target/ab/r15_$i.json $KEYS" \
    2>&1 | grep -E "benchkeys" | tail -11)
  sbt -batch \
    "runMain graft.BenchKeys $SF /root/repo/target/ab/r17_$i.json $KEYS" \
    2>&1 | grep -E "benchkeys" | tail -11
done
echo "A/B runs complete: target/ab/"
