#!/usr/bin/env python3
"""Oracle type-affinity lint.

The driver hashes canonicalized VALUES of the Spark parquet dump and the
DuckDB oracle result. A DuckDB output type that doesn't map 1:1 onto the
Spark parquet type canonicalizes differently even when numerically equal —
round 7 shipped 7 bit-exact lanes that read hash-red at the driver because
an uncast sum(BIGINT) is typed HUGEINT (INT128) by DuckDB. verify_local.py
fetches Python-native ints and cannot see this class, so this lint closes
the gap the local replica left open:

 1. DESCRIBE every oracle SQL — FAIL on any HUGEINT / UHUGEINT output
    column (no Spark type maps to int128; a cast is always the fix).
 2. If a Spark dump exists for the query, DESCRIBE it too (both sides
    described by DuckDB = one type vocabulary) and FAIL on any
    column-for-column type mismatch outside ALLOWED_PAIRS.

Usage: python3 tools/oracle_lint.py <outDir> <sfDir> [q1,q2,...]
  <outDir> must contain oracle_sql.json (written by graft.Verify); the
  per-query parquet dumps are optional — step 2 is skipped when absent,
  step 1 (the HUGEINT ban) always runs.
Exit 0 = clean, 1 = findings.
"""
import sys, os, json, glob

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from verify_local import connect  # shared view setup over <sfDir>/*.parquet

# HUGEINT: uncast sum(BIGINT) — the exact round-7 failure class. DECIMAL:
# the near-miss cousin (an uncast float literal or round() over decimals);
# the repo convention is fully DOUBLE/BIGINT-typed oracle outputs, so any
# DECIMAL output is a missing cast.
BANNED = ("HUGEINT", "UHUGEINT", "DECIMAL")

# (spark_dump_type, oracle_type) pairs proven to hash identically at the
# driver: 18 lanes with Spark int32 row_number()/length() vs DuckDB BIGINT
# were hash-green in CORRECTNESS_r07 — integer canonicalization is
# width-independent on both fetch paths.
ALLOWED_PAIRS = {("INTEGER", "BIGINT")}


def normalize(t):
    return t.strip().upper()


def describe(con, sql):
    rows = con.execute(f"DESCRIBE {sql}").fetchall()
    return {r[0]: normalize(r[1]) for r in rows}


def main(out_dir, sf_dir, only=None):
    con = connect(sf_dir)
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:
        oracles = {k: v for k, v in oracles.items() if k in only}
    n_fail = 0
    for name in sorted(oracles):
        sql = oracles[name]
        try:
            otypes = describe(con, sql)
        except Exception as e:
            print(f"FAIL {name}: DESCRIBE oracle error {e}")
            n_fail += 1
            continue
        bad = {c: t for c, t in otypes.items()
               if any(b in t for b in BANNED)}
        if bad:
            print(f"FAIL {name}: oracle emits int128 column(s) {bad} — "
                  f"wrap in CAST(... AS BIGINT)")
            n_fail += 1
            continue
        spark_glob = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_glob:
            print(f"PASS {name} (oracle-only; no Spark dump to cross-type)")
            continue
        try:
            stypes = describe(con, f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        except Exception as e:
            print(f"FAIL {name}: DESCRIBE spark dump error {e}")
            n_fail += 1
            continue
        if set(stypes) != set(otypes):
            print(f"FAIL {name}: column sets differ spark={sorted(stypes)} "
                  f"oracle={sorted(otypes)}")
            n_fail += 1
            continue
        mism = {c: (stypes[c], otypes[c]) for c in stypes
                if stypes[c] != otypes[c]
                and (stypes[c], otypes[c]) not in ALLOWED_PAIRS}
        if mism:
            print(f"FAIL {name}: type mismatch (spark, oracle) {mism}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(otypes)} cols typed-matched)")
    print(f"== oracle_lint: {len(oracles) - n_fail} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    sys.exit(main(sys.argv[1], sys.argv[2], only))
