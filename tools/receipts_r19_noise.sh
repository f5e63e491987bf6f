#!/bin/bash
# Round-19 receipt: the noise-class cells' structural fix (VERDICT r18
# #2). k3_kafka_admission / k7_kafka_txn_stream / r8_redis_eos_sink get
# one discarded warmup pass + median-of-5 in Bench; this script prices
# OLD method (median-of-3, no warmup — the pre-change commit in a
# worktree) vs NEW method (this repo) on the SAME day, interleaved, N
# sessions per side, one clean JVM per (side, iteration).
#
# Claim to verify: the per-session reported medians of the NEW method
# spread < 1.3x across sessions on each of the three cells (the old
# method's k3/k7 day-swing is documented at ~2x; its same-day session
# spread is the comparison baseline printed alongside).
#
# Usage: receipts_r19_noise.sh <old_worktree_dir> [iters=3]
set -u
OLD=${1:?old worktree dir (compiled, with copyResources)}
ITERS=${2:-3}
ADDOPENS=""
for p in java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect \
         java.base/java.io java.base/java.net java.base/java.nio java.base/java.util \
         java.base/java.util.concurrent java.base/java.util.concurrent.atomic \
         java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action \
         java.base/sun.util.calendar; do
  ADDOPENS="$ADDOPENS --add-opens $p=ALL-UNNAMED"
done
OUT=/tmp/receipts_r19
mkdir -p $OUT/cwd_old $OUT/cwd_new

run_one() {  # side repo iter
  local side=$1 repo=$2 iter=$3
  local json=$OUT/noise_${side}_${iter}.json
  (cd $OUT/cwd_$side && \
   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
   SPARK_GRAFT_BENCH_ONLY=k3_kafka_admission,k7_kafka_txn_stream,r8_redis_eos_sink \
   SPARK_GRAFT_BENCH_SKIP_XP=1 \
   SPARK_GRAFT_TIDE_WAIT_SEC=120 \
   SPARK_GRAFT_BENCH_JSON=$json \
   java $ADDOPENS -Xmx16g \
     -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
     -cp "$repo/target/scala-2.13/classes:/opt/spark/jars/*" \
     graft.Bench > $OUT/noise_${side}_${iter}.log 2>&1)
  echo "done noise $side $iter rc=$?"
}

for iter in $(seq 1 $ITERS); do
  run_one old "$OLD" $iter
  run_one new /root/repo $iter
done
echo ALL_DONE
