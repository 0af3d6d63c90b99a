#!/usr/bin/env python3
"""Sliced DuckDB oracle compare for the four queries whose single-query
oracles exceed single-node DuckDB spill at sf1 (SCALE.md "Quad-scale
oracle gate"): q23_rec_lists / q46_precision_rec (TF-IDF rec chain) and
q40_textrank_rec / q117_precision_textrank (TextRank rec chain).

Usage:
  python3 tools/verify_sf1_sliced.py <outDir> <sfDir> [--user-slices K]
      [--doc-slices M] [--db PATH]

<outDir> is a graft.Verify dump at the target scale containing parquet for
(at least) the four queries above — q39_textrank_kw too, if present — plus
oracle_sql.json. Engine outputs are compared against DuckDB re-derivations
assembled from the SAME oracle SQL the driver runs, decomposed along the
queries' independence structure so every piece fits in memory:

- The user side of both chains is per-user independent: every CTE keyed by
  userId (profiles, active days, scoring, ranking, precision hits) computes
  each user's rows from that user's clicks alone, and the doc-side CTEs
  never read clicks. So adding `AND user_id % K = k` to the one `clicks`
  CTE yields BIT-EXACT per-slice results, and the union over k = 0..K-1 is
  exactly the unsliced result. q23/q40 are compared slice-by-slice against
  the engine output filtered by the same predicate — full coverage, not a
  sample.
- q46/q117 aggregate per date ACROSS users; sum(hit)/count(*) decompose
  over any user partition, so each slice contributes a partial (hits, rec)
  per date, summed and rounded in DuckDB at the end (never in Python — the
  engines' round() must stay the only rounding authority).
- The TextRank news keyword table is doc-global but per-DOC independent
  (TextRank.java:61-73 runs per document), so it is materialized once into
  the database by doc slices (`doc_id % M = m`) from the q39 oracle minus
  its display rounding (the q40 chain consumes raw doubles), then
  substituted for the recursive news-side CTEs in the sliced q40/q117 runs.
  If the dump contains q39_textrank_kw, each doc slice is also compared
  against the engine's q39 output — verifying the table before anything
  consumes it.

All SQL is derived from oracle_sql.json by anchored substitution; every
anchor asserts its exact occurrence count, so drift between this tool and
the Scala-authored oracles fails loudly instead of silently diverging.
"""
import sys, os, json, glob, argparse
import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from verify_local import canon, TABLES

CLICKS_ANCHOR = "FROM events WHERE event_type = 'click')"
TOKLIST_ANCHOR = "AS tl\n  FROM documents),"
NEWS_KW_CTE = """news_kw AS (
  SELECT id, word, value FROM (
    SELECT id, word, value,
      row_number() OVER (PARTITION BY id ORDER BY value DESC, word) AS rn
    FROM news_scored) t WHERE rn <= 5),"""
PRECISION_TAIL = """SELECT date, CAST(sum(hit) AS BIGINT) AS n_hits, count(*) AS n_recommended,
  round(CAST(sum(hit) AS DOUBLE) / count(*), 6) AS precision
FROM joined GROUP BY date"""
PARTIAL_TAIL = "SELECT date, CAST(sum(hit) AS BIGINT) AS hits, count(*) AS rec FROM joined GROUP BY date"
Q39_ROUND = "SELECT id, word, round(value, 6) AS value FROM ("
Q39_RAW = "SELECT id, word, value FROM ("


def subst(sql, old, new, count=1):
    n = sql.count(old)
    assert n == count, f"anchor matched {n} times, expected {count}: {old[:80]!r}"
    return sql.replace(old, new)


def connect(db_path, sf_dir):
    con = duckdb.connect(db_path)
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def compare(con, name, oracle_rows, oracle_cols, engine_sql):
    e = con.execute(engine_sql)
    ecols = [d[0] for d in e.description]
    erows = e.fetchall()
    ec, er = canon(erows, ecols)
    oc, orr = canon(oracle_rows, oracle_cols)
    if ec != oc:
        print(f"FAIL {name}: columns engine={ec} oracle={oc}")
        return False
    if er != orr:
        diff = [(a, b) for a, b in zip(er, orr) if a != b][:2]
        print(f"FAIL {name}: rows engine={len(er)} oracle={len(orr)}; first diffs: {diff}")
        return False
    return True


def sliced_lists(con, qname, sql_template, out_dir, K, fails):
    """Compare a per-(user, day) list query slice-by-slice; returns rows compared."""
    total = 0
    for k in range(K):
        sql = subst(sql_template, CLICKS_ANCHOR,
                    f"FROM events WHERE event_type = 'click' AND user_id % {K} = {k})")
        o = con.execute(sql)
        ocols = [d[0] for d in o.description]
        orows = o.fetchall()
        ok = compare(con, f"{qname}[slice {k}/{K}]", orows, ocols,
                     f"SELECT * FROM '{out_dir}/{qname}/*.parquet' WHERE userId % {K} = {k}")
        if not ok:
            fails.append(f"{qname}[{k}]")
        total += len(orows)
    return total


def precision_partials(con, table, sql_template, K):
    con.execute(f"CREATE OR REPLACE TABLE {table} (date DATE, hits BIGINT, rec BIGINT)")
    for k in range(K):
        sql = subst(sql_template, CLICKS_ANCHOR,
                    f"FROM events WHERE event_type = 'click' AND user_id % {K} = {k})")
        sql = subst(sql, PRECISION_TAIL, PARTIAL_TAIL)
        con.execute(f"INSERT INTO {table} {sql}")


def precision_compare(con, qname, table, out_dir, fails):
    o = con.execute(f"""
        SELECT date, CAST(sum(hits) AS BIGINT) AS n_hits,
          CAST(sum(rec) AS BIGINT) AS n_recommended,
          round(CAST(sum(hits) AS DOUBLE) / sum(rec), 6) AS precision
        FROM {table} GROUP BY date""")
    ocols = [d[0] for d in o.description]
    orows = o.fetchall()
    if not compare(con, qname, orows, ocols,
                   f"SELECT * FROM '{out_dir}/{qname}/*.parquet'"):
        fails.append(qname)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("sf_dir")
    ap.add_argument("--user-slices", type=int, default=32)
    ap.add_argument("--doc-slices", type=int, default=25)
    ap.add_argument("--db", default=None)
    args = ap.parse_args()
    K, M = args.user_slices, args.doc_slices
    assert K >= 1 and M >= 1
    db = args.db or f"{args.out_dir}/sliced.duckdb"
    if os.path.exists(db):
        os.remove(db)
    con = connect(db, args.sf_dir)
    oracles = json.load(open(f"{args.out_dir}/oracle_sql.json"))
    fails = []

    # ---- TF-IDF chain: q23 slice-by-slice, q46 from summed partials ----
    n = sliced_lists(con, "q23_rec_lists", oracles["q23_rec_lists"],
                     args.out_dir, K, fails)
    print(f"{'FAIL' if any(f.startswith('q23') for f in fails) else 'PASS'} "
          f"q23_rec_lists: {n} rows over {K} user slices")
    precision_partials(con, "q46_partials", oracles["q46_precision_rec"], K)
    precision_compare(con, "q46_precision_rec", "q46_partials", args.out_dir, fails)
    if "q46_precision_rec" not in fails:
        print(f"PASS q46_precision_rec (summed over {K} user slices)")

    # ---- TextRank news keywords: materialize by doc slice (raw values) ----
    kw_sql = subst(oracles["q39_textrank_kw"], Q39_ROUND, Q39_RAW)
    con.execute("CREATE OR REPLACE TABLE news_kw_tr (id BIGINT, word VARCHAR, value DOUBLE)")
    check_q39 = bool(glob.glob(f"{args.out_dir}/q39_textrank_kw/*.parquet"))
    for m in range(M):
        sql = subst(kw_sql, TOKLIST_ANCHOR,
                    f"AS tl\n  FROM documents WHERE doc_id % {M} = {m}),")
        con.execute(f"INSERT INTO news_kw_tr {sql}")
        if check_q39:
            ok = compare(con, f"q39_textrank_kw[slice {m}/{M}]",
                         con.execute(f"""SELECT id, word, round(value, 6) AS value
                             FROM news_kw_tr WHERE id % {M} = {m}""").fetchall(),
                         ["id", "word", "value"],
                         f"SELECT * FROM '{args.out_dir}/q39_textrank_kw/*.parquet' WHERE id % {M} = {m}")
            if not ok:
                fails.append(f"q39[{m}]")
    nkw = con.execute("SELECT count(*) FROM news_kw_tr").fetchone()[0]
    print(f"news_kw_tr materialized: {nkw} rows over {M} doc slices"
          + (f" ({'FAIL' if any(f.startswith('q39') for f in fails) else 'PASS'}"
             " vs engine q39)" if check_q39 else ""))

    # ---- TextRank chain: substitute the table, slice the user side ----
    def textrank_template(sql):
        sql = subst(sql, TOKLIST_ANCHOR,
                    "AS tl\n  FROM documents WHERE doc_id IN (SELECT newsId FROM clicks)),")
        return subst(sql, NEWS_KW_CTE, "news_kw AS (SELECT * FROM news_kw_tr),")

    n = sliced_lists(con, "q40_textrank_rec",
                     textrank_template(oracles["q40_textrank_rec"]),
                     args.out_dir, K, fails)
    print(f"{'FAIL' if any(f.startswith('q40') for f in fails) else 'PASS'} "
          f"q40_textrank_rec: {n} rows over {K} user slices")
    precision_partials(con, "q117_partials",
                       textrank_template(oracles["q117_precision_textrank"]), K)
    precision_compare(con, "q117_precision_textrank", "q117_partials",
                      args.out_dir, fails)
    if "q117_precision_textrank" not in fails:
        print(f"PASS q117_precision_textrank (summed over {K} user slices)")

    print(f"== sliced compare: {'FAIL ' + str(fails) if fails else 'ALL PASS'} ==")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
