#!/bin/bash
# r8 three-way interleaved: pre (7a19847) / bisect (140fe46 with old
# RedisSource+RedisStreams+facade) / final (140fe46). One clean JVM per
# (side, iteration), sides rotate per iteration.
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
mkdir -p $OUT/cwd_3a $OUT/cwd_3b $OUT/cwd_3c

run_one() {  # side repo iter
  local side=$1 repo=$2 iter=$3
  local json=$OUT/w3_${side}_${iter}.json
  (cd $OUT/cwd_3$side && \
   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
   SPARK_GRAFT_BENCH_ONLY=r8_redis_eos_sink \
   SPARK_GRAFT_BENCH_SKIP_XP=1 \
   SPARK_GRAFT_BENCH_JSON=$json \
   java $ADDOPENS -Xmx16g \
     -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
     -cp "$repo/target/scala-2.13/classes:/opt/spark/jars/*" \
     graft.Bench > $OUT/w3_${side}_${iter}.log 2>&1)
  echo "done w3 $side $iter rc=$?"
}

for iter in 1 2 3; do
  run_one a /tmp/graft-r18a $iter
  run_one b /tmp/graft-bisect $iter
  run_one c /root/repo $iter
done
echo ALL_DONE
