#!/bin/bash
# Solo-mode bench artifact (VERDICT r8 task 4): run each cache-sensitive
# lane in its OWN JVM with k=3 medians, so suite ordering and block-manager
# churn cannot move the number — every round since r6 spent prose
# adjudicating exactly those false regressions (q220 4.65x, q121 1.68x were
# all suite artifacts that reproduced the previous round's time solo).
# Merge into one committed artifact comparable round-over-round.
#
# Usage: tools/solo_bench.sh <sfDir> <outJson> [lanes-csv]
set -eu
SF=${1:?sfDir}; OUT=${2:?outJson}
# Default set = the rec-family cache-sensitive lanes PLUS every lane a
# round has ever adjudicated as suite-ordering churn (r9: q26/q107/q23/
# q105/q106/q162/q186; r11 driver-flagged: q119/q68/q201/q18;
# r12 driver-flagged: q50/q151/q273/q275/q67 — VERDICT r12 task 7) —
# tools/ab_analyze.py roundcmp classifies against this artifact, so a
# lane missing here costs a hand adjudication later.
LANES=${3:-q220_rec_unbounded,q121_item_cf,q268_split_leakage,q21_rec_dot,q22_rec_cosine,q23_rec_lists,q245_rec_lists_capped,q246_rec_cosine_capped,q26_lsh_pairs,q105_conversion_paths,q106_salted_join,q107_zorder,q162_geo_bucket_join,q186_degree_assortativity,q119_user_set_sim,q68_pq_topk,q201_bm25,q18_tfidf_topk,q50_als_recommend,q151_kmeans,q273_dedup_savings,q275_eval_contamination,q67_pq_codes}
TMP=$(mktemp -d)
IFS=',' read -ra L <<< "$LANES"
for q in "${L[@]}"; do
  echo "[solo] $q ..." >&2
  SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
    SPARK_GRAFT_QUERIES=$q SPARK_GRAFT_BENCH_OUT=$TMP/$q.json \
    sbt -batch 'runMain graft.Bench' >/dev/null 2>&1 \
    || echo "[solo] $q FAILED" >&2
done
python3 - "$OUT" "$TMP" <<'EOF'
import json, sys, glob
out, tmp = sys.argv[1], sys.argv[2]
merged = {"stat": "solo-median", "queries": {}, "samples": {}}
for f in sorted(glob.glob(tmp + "/*.json")):
    d = json.load(open(f))
    merged["queries"].update(d["queries"])
    merged["samples"].update(d["samples"])
    merged["sf"] = d.get("sf")
    merged["k"] = d.get("k")
json.dump(merged, open(out, "w"), indent=1)
print("[solo] wrote", out, "lanes:", len(merged["queries"]))
EOF
rm -rf "$TMP"
