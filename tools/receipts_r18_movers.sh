#!/bin/bash
# Round-18 receipt: q2/p17/m2 (the composed artifact's three residual
# >=1.8x up-movers, all sub-2s cells) isolated interleaved A/B,
# r17 final (4b42df5, worktree) vs round-18 final (/root/repo de37a99).
# One clean JVM per (side, iteration); sides alternate per iteration.
# NOTE: for these warmup-dominated small cells the isolated ABSOLUTE
# value is inflated (cold JIT) — only the SIDE-TO-SIDE ratio is the
# receipt.
set -u
ADDOPENS=""
for p in java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect \
         java.base/java.io java.base/java.net java.base/java.nio java.base/java.util \
         java.base/java.util.concurrent java.base/java.util.concurrent.atomic \
         java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action \
         java.base/sun.util.calendar; do
  ADDOPENS="$ADDOPENS --add-opens $p=ALL-UNNAMED"
done
OUT=/tmp/receipts
mkdir -p $OUT/cwd_mvr17 $OUT/cwd_mvr18

run_one() {  # side repo iter
  local side=$1 repo=$2 iter=$3
  local json=$OUT/mv_${side}_${iter}.json
  (cd $OUT/cwd_mv$side && \
   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
   SPARK_GRAFT_BENCH_ONLY=q2_filter_agg,p17_shuffle_shards,m2_media_features \
   SPARK_GRAFT_BENCH_SKIP_XP=1 \
   SPARK_GRAFT_BENCH_JSON=$json \
   java $ADDOPENS -Xmx16g \
     -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
     -cp "$repo/target/scala-2.13/classes:/opt/spark/jars/*" \
     graft.Bench > $OUT/mv_${side}_${iter}.log 2>&1)
  echo "done mv $side $iter rc=$?"
}

for iter in 1 2 3; do
  run_one r17 /tmp/graft-r17 $iter
  run_one r18 /root/repo $iter
done
echo ALL_DONE
