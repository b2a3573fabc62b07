#!/bin/bash
# Full local gate: oracle parity at all scales + tests + bench.
set -e
cd /root/repo
for sf in sf0.001 sf0.01 sf0.1; do
  sbt -batch "runMain graft.Verify /root/testdata/$sf target/verify_$sf" 2>&1 | grep -E "\[verify\]" || true
  python3 tools/check.py /root/testdata/$sf target/verify_$sf | tail -1
done
sbt -batch test 2>&1 | grep -E "Tests:|FAILED"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" 2>/dev/null | grep metric
