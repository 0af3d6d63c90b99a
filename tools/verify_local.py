#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness check.

Usage: python3 tools/verify_local.py <outDir> <sfDir> [q1,q2,...]

Reads <outDir>/<name>/ parquet (written by graft.Verify) and
<outDir>/oracle_sql.json, runs each oracle SQL in DuckDB with views over
<sfDir>/*.parquet, canonicalizes both results (columns sorted by name, rows
sorted, doubles rounded to 9 significant-ish decimals) and diffs.
"""
import sys, os, json, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 9)
            if isinstance(v, list):
                v = tuple(round(x, 9) if isinstance(x, float) else x for x in v)
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return [cols[i] for i in order], out


def connect(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written layout (dir of part files)
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def main(out_dir, sf_dir, only=None):
    con = connect(sf_dir)
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:
        oracles = {k: v for k, v in oracles.items() if k in only}
    n_pass = n_fail = 0
    for name in sorted(oracles):
        sql = oracles[name]
        spark_glob = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_glob:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        s = con.execute(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        scols = [d[0] for d in s.description]
        srows = s.fetchall()
        try:
            o = con.execute(sql)
            ocols = [d[0] for d in o.description]
            orows = o.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}", flush=True)
            n_fail += 1
            # a spill-to-disk failure (e.g. disk full) can invalidate the
            # connection; reconnect so one heavy oracle doesn't sink the rest
            try:
                con.close()
            except Exception:
                pass
            con = connect(sf_dir)
            continue
        sc, sr = canon(srows, scols)
        oc, orr = canon(orows, ocols)
        if sc != oc:
            print(f"FAIL {name}: columns spark={sc} oracle={oc}")
            n_fail += 1
        elif sr != orr:
            diff = [(a, b) for a, b in zip(sr, orr) if a != b][:3]
            extra = abs(len(sr) - len(orr))
            print(f"FAIL {name}: rows spark={len(sr)} oracle={len(orr)} "
                  f"(len diff {extra}); first diffs: {diff}")
            n_fail += 1
        elif len(sr) == 0:
            # An empty result that hash-matches an empty oracle is the one
            # agreement the compare can't vouch for: a shared degenerate
            # bug (e.g. a filter both sides copy) passes trivially. Every
            # lane is expected to produce rows on the driver's testdata.
            print(f"FAIL {name}: PASS-EMPTY — both engine and oracle "
                  f"returned 0 rows; parity proves nothing here")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(sr)} rows)")
            n_pass += 1
    # queries without oracle → rows-only
    for qdir in sorted(glob.glob(f"{out_dir}/*/")):
        name = qdir.rstrip("/").split("/")[-1]
        if name not in oracles:
            try:
                n = len(con.execute(f"SELECT * FROM '{qdir}*.parquet'").fetchall())
                print(f"ROWS-ONLY {name}: {n} rows")
            except Exception as e:
                print(f"FAIL {name}: rows-only read error {e}")
                n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    sys.exit(main(sys.argv[1], sys.argv[2], only))
