#!/usr/bin/env python3
"""Out-of-band oracle for q74_sketches (the last rows-only lane).

q74 is `no_oracle` by nature: HyperLogLog++ counts and KLL/GK-style
quantile sketches are engine-specific randomized summaries, so no DuckDB
SQL reproduces Spark's bit-exact output. But both sketches publish
MATHEMATICAL ERROR CONTRACTS, and those are checkable against exact
answers computed independently in DuckDB over the same parquet:

  - approx_count_distinct(user_id, rsd=0.02): HLL++ with relative
    standard deviation 2%. Gate: |approx - exact| / exact <= 4 * rsd
    (4 sigma — false-alarm probability ~6e-5 per group; a broken sketch
    is orders of magnitude off, not 8%).
  - percentile_approx(value, q, accuracy=10000): Greenwald-Khanna style
    with rank error epsilon = 1/accuracy. The estimate is an actual data
    value, so the check is on its RANK: the fraction-below..fraction-at
    interval of the returned value must intersect [q - eps', q + eps']
    with eps' = 2/accuracy (2x slack for interpolation at boundaries).

Both checks run per event_type group, mirroring the query exactly
(same Tables.events normalization: the events table is read raw here
because q74 aggregates user_id/value only — no timestamp involvement).

Usage (since r9 the DECLARED q74 lane emits the exact counts plus
bound-verdict booleans — the raw estimates this tool audits come from
graft.tools.DumpAux, not a Verify dump):
  sbt "runMain graft.tools.DumpAux /root/testdata/sf0.01 /tmp/aux"
  python3 tools/verify_sketches.py --sf-dir /root/testdata/sf0.01 \
      --spark-out /tmp/aux/sketches_raw
Exit 0 = all gates pass.
"""
import argparse
import glob
import sys

import duckdb

HLL_RSD = 0.02
HLL_SIGMAS = 4.0
PCT_ACCURACY = 10000
PCT_EPS = 2.0 / PCT_ACCURACY


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--spark-out", required=True,
                    help="q74_sketches parquet dir from a graft.Verify dump")
    args = ap.parse_args()

    con = duckdb.connect()
    spark_files = glob.glob(f"{args.spark_out}/*.parquet") or [args.spark_out]
    spark = {
        r[0]: {"approx_users": r[1], "p50": r[2], "p95": r[3]}
        for r in con.execute(
            "SELECT event_type, approx_users, p50, p95 FROM read_parquet(?)",
            [spark_files]).fetchall()
    }
    if not spark:
        print("FAIL: no spark output rows", file=sys.stderr)
        return 1

    exact = {
        r[0]: {"users": r[1], "n": r[2]}
        for r in con.execute(
            f"""SELECT event_type, count(DISTINCT user_id), count(value)
                FROM read_parquet('{args.sf_dir}/events.parquet')
                GROUP BY 1""").fetchall()
    }

    ok = True
    for et in sorted(spark):
        s, e = spark[et], exact.get(et)
        if e is None:
            print(f"FAIL {et}: group missing from exact side")
            ok = False
            continue
        rel = abs(s["approx_users"] - e["users"]) / max(e["users"], 1)
        hll_ok = rel <= HLL_SIGMAS * HLL_RSD
        print(f"{'PASS' if hll_ok else 'FAIL'} {et} hll: "
              f"approx={s['approx_users']} exact={e['users']} "
              f"rel_err={rel:.4f} (gate {HLL_SIGMAS * HLL_RSD:.2f})")
        ok &= hll_ok

        for qname, q in (("p50", 0.50), ("p95", 0.95)):
            est = s[qname]
            lt, le = con.execute(
                f"""SELECT sum(CASE WHEN value < ? THEN 1 ELSE 0 END),
                           sum(CASE WHEN value <= ? THEN 1 ELSE 0 END)
                    FROM read_parquet('{args.sf_dir}/events.parquet')
                    WHERE event_type = ?""", [est, est, et]).fetchone()
            lo, hi = lt / e["n"], le / e["n"]
            # rank interval of the returned value must touch [q-eps, q+eps]
            p_ok = lo <= q + PCT_EPS and hi >= q - PCT_EPS
            print(f"{'PASS' if p_ok else 'FAIL'} {et} {qname}: est={est} "
                  f"rank_interval=[{lo:.6f},{hi:.6f}] "
                  f"target=[{q - PCT_EPS:.6f},{q + PCT_EPS:.6f}]")
            ok &= p_ok

    print("== sketches", "PASS" if ok else "FAIL", "==")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
