#!/bin/bash
# First-principles checker at sf1: run each lane in its own process with a
# wall-clock timeout and an address-space cap, so a pandas recompute that is
# intractable at 100x (quadratic pair loops, dense power iterations) fails
# loudly as TIMEOUT/MEM instead of wedging the box. Results: one line per
# lane (PASS/FAIL/TIMEOUT) in $OUT.
# Usage: tools/checker_sf1.sh <sfDir> <sparkOut> <resultFile> [parallelism]
set -u
SF=${1:?sfDir}; DUMP=${2:?sparkOut}; OUT=${3:?resultFile}; PAR=${4:-8}
LANES=$(python3 - <<'EOF'
import importlib.util, sys
spec = importlib.util.spec_from_file_location("vi", "tools/verify_independent.py")
m = importlib.util.module_from_spec(spec)
sys.argv = ["vi"]
try:
    spec.loader.exec_module(m)
except SystemExit:
    pass
print("\n".join(sorted(m.CHECKS)))
EOF
)
: > "$OUT"
run_lane() {
  lane=$1
  # 24 GiB address-space cap per lane; 900 s wall cap.
  res=$( (ulimit -v $((24*1024*1024)); timeout 900 \
    python3 tools/verify_independent.py --sf-dir "$SF" --spark-out "$DUMP" \
      --only "$lane" 2>&1) )
  rc=$?
  if [ $rc -eq 124 ]; then
    echo "TIMEOUT $lane" >> "$OUT"
  elif echo "$res" | grep -q "^PASS $lane"; then
    echo "PASS $lane" >> "$OUT"
  else
    echo "FAIL $lane :: $(echo "$res" | grep -m3 "FAIL\|Error\|error" | tr '\n' ' ')" >> "$OUT"
  fi
}
export -f run_lane; export SF DUMP OUT
echo "$LANES" | xargs -P "$PAR" -I{} bash -c 'run_lane {}'
sort -k2 -o "$OUT" "$OUT"
grep -c '^PASS' "$OUT" | xargs echo pass:
grep -v '^PASS' "$OUT" || true
