#!/bin/bash
# Controlled A/B bench: r5-end vs r6-end binaries on IDENTICAL current data.
# Protocol (VERDICT r6 task 1): >=3 runs per side, interleaved (r6,r5)x3 so
# slow box-state drift cancels across sides; per-query MEDIANS compared by
# tools/ab_analyze.py. Queries that error on either side (the r5 binary
# predates the events µs-NTZ layout fix) are excluded from the comparison.
set -u
SF_DIR=${SF_DIR:-/root/testdata/sf0.1}
OUT=${OUT:-/root/repo/.tmp/ab}
RUNS=${RUNS:-3}
mkdir -p "$OUT"
ADDOPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED \
--add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED \
--add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED \
--add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED \
--add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED \
--add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED \
--add-opens java.base/sun.util.calendar=ALL-UNNAMED"
run_one() { # side workdir runidx
  local side=$1 wd=$2 i=$3
  cd "$wd" || exit 1
  SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_OUT="$OUT/${side}_run${i}_artifact.json" \
  timeout 1800 java $ADDOPENS -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC -Xmx8g \
    -cp "target/scala-2.13/classes:/opt/spark/jars/*" graft.Bench \
    > "$OUT/${side}_run${i}.out" 2> "$OUT/${side}_run${i}.err"
  echo "[ab] $side run $i rc=$? $(date +%H:%M:%S)"
}
for i in $(seq 1 "$RUNS"); do
  run_one r6 /root/repo/.worktrees/r6 "$i"
  run_one r5 /root/repo/.worktrees/r5 "$i"
done
echo "[ab] done"
