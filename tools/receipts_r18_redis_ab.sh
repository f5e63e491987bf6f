#!/bin/bash
# Round-18 post-record receipt: the redis-exposed bench cells (r1/r3/r8)
# interleaved A/B, pre-clamp-hardening commit (7a19847, worktree) vs
# final (140fe46, /root/repo). One clean JVM per (side, iteration).
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
mkdir -p $OUT/cwd_rda $OUT/cwd_rdb

run_one() {  # side repo iter
  local side=$1 repo=$2 iter=$3
  local json=$OUT/rd_${side}_${iter}.json
  (cd $OUT/cwd_rd$side && \
   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
   SPARK_GRAFT_BENCH_ONLY=r1_redis_read,r3_redis_sharding,r8_redis_eos_sink \
   SPARK_GRAFT_BENCH_SKIP_XP=1 \
   SPARK_GRAFT_BENCH_JSON=$json \
   java $ADDOPENS -Xmx16g \
     -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
     -cp "$repo/target/scala-2.13/classes:/opt/spark/jars/*" \
     graft.Bench > $OUT/rd_${side}_${iter}.log 2>&1)
  echo "done rd $side $iter rc=$?"
}

for iter in 1 2 3; do
  run_one a /tmp/graft-r18a $iter
  run_one b /root/repo $iter
done
echo ALL_DONE
