#!/bin/bash
# Phase-2 A/B: SAME query set on both binaries (the common 231 batch
# queries that succeed on both sides), removing the workload-set asymmetry
# of the full-suite comparison — the r5 binary fails the 13 events-layout
# streaming lanes instantly on regenerated data, so its full run carries
# none of the streaming session residue (state-store maintenance, RocksDB
# checkpoints) the r6 run does. If the full-suite ratio collapses here,
# the "slowdown" is session-pressure contamination, not per-query code.
set -u
SF_DIR=${SF_DIR:-/root/testdata/sf0.1}
OUT=${OUT:-/root/repo/.tmp/ab}
RUNS=${RUNS:-2}
QUERIES=$(cat "$OUT/common_queries.txt")
ADDOPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED \
--add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED \
--add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED \
--add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED \
--add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED \
--add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED \
--add-opens java.base/sun.util.calendar=ALL-UNNAMED"
run_one() {
  local side=$1 wd=$2 i=$3
  cd "$wd" || exit 1
  SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_CPUS=32 SPARK_GRAFT_QUERIES="$QUERIES" \
  SPARK_GRAFT_BENCH_OUT="$OUT/c_${side}_run${i}_artifact.json" \
  timeout 1800 java $ADDOPENS -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC -Xmx8g \
    -cp "target/scala-2.13/classes:/opt/spark/jars/*" graft.Bench \
    > "$OUT/c_${side}_run${i}.out" 2> "$OUT/c_${side}_run${i}.err"
  echo "[ab-common] $side run $i rc=$? $(date +%H:%M:%S)"
}
for i in $(seq 1 "$RUNS"); do
  run_one r6 /root/repo/.worktrees/r6 "$i"
  run_one r5 /root/repo/.worktrees/r5 "$i"
done
echo "[ab-common] done"
