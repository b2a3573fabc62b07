#!/bin/bash
# Round-19 ANN decade re-measure: warm-min BenchOne reps at sf1 (20k
# vectors) and sf10 (200k) for the four ANN keys. rep1 pays the
# one-time fixture build; the recorded number is the warm min. Run on
# a QUIET box (the round-18 sim_ann_ivf 4.05x reading was adjudicated
# environmental; this run settles it).
set -u
cd /root/repo
out=/tmp/ann_decade_r19
mkdir -p $out
for key in sim_ann_lsh sim_ann_ivf sim_ann_ivf_persist sim_ann_ivf_rebuild; do
  for sf in target/testdata-sf1 target/testdata-sf10; do
    tag=$(basename $sf)
    echo "== $key @ $tag =="
    SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.BenchOne $key $sf 4" 2>/dev/null \
      | grep benchone | tee $out/${key}_${tag}.txt
  done
done
