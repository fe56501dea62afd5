#!/bin/bash
# Same-host A/B of the r11 (1d149ae) vs r12 (f6ceed5) trees, interleaved
# r12->r11->r12->r11 so ambient host drift hits both sides equally.
# Outputs /tmp/ab_{r11,r12}_{1,2}.json (Bench's one-line artifact).
set -e
export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
echo "[ab] compiling r11 tree"
(cd /root/repo/.ab_r11 && sbt -batch compile) > /tmp/ab_r11_compile.log 2>&1
echo "[ab] compiling r12 tree"
(cd /root/repo/.ab_r12 && sbt -batch compile) > /tmp/ab_r12_compile.log 2>&1
for i in 1 2; do
  echo "[ab] pass $i: r12"
  (cd /root/repo/.ab_r12 && GRAFT_BENCH_OUT=/tmp/ab_r12_$i.json sbt -batch "runMain graft.Bench") > /tmp/ab_r12_run$i.log 2>&1
  echo "[ab] pass $i: r11"
  (cd /root/repo/.ab_r11 && GRAFT_BENCH_OUT=/tmp/ab_r11_$i.json sbt -batch "runMain graft.Bench") > /tmp/ab_r11_run$i.log 2>&1
done
echo "[ab] DONE"
