#!/usr/bin/env python3
"""First-principles sf1 evidence for the four quadratic rec lanes.

q23/q46 (TF-IDF dot lists + precision) and q40/q117 (TextRank lists +
precision) are the only lanes whose monolithic verify_independent.py
recomputes are intractable at sf1: the intermediate (day,user,news)
candidate stream is ~1.5e9 elements (the q220 guard's own ceiling), so
the whole-dict recompute dies on memory (q23/q46, 60 GiB cap) or time
(q40/q117, 3600 s cap).

Scoring is independent per user, so this driver rearranges the SAME
textbook arithmetic — identical profile builds, rounding, tie-breaks,
and day-window logic as verify_independent — into a memory-bounded
shape:
  * news-side state (profiles, inverted index, per-news day lists) is
    built ONCE;
  * users are processed in K hash slices (u % K == r), each user's
    candidates folded straight into per-(day,user) top-5 heaps instead
    of a materialized explode;
  * each slice's ranked lists are compared against the graft.Verify
    dump with a vectorized merge;
  * exact per-date (hits, recommended) partials accumulate across
    slices, so after the union (= every user exactly once) the
    precision lanes are recomputed exactly, not sampled.

Usage: python3 tools/verify_sf1_rec_fp.py --sf-dir /tmp/sf1 \
           --spark-out /tmp/verify_out_sf1 [--mode tfidf|textrank|both]
"""
import argparse
import heapq
import importlib.util
import os
import sys
import time

import duckdb
import pandas as pd

_HERE = os.path.dirname(os.path.abspath(__file__))
spec = importlib.util.spec_from_file_location(
    "vi", os.path.join(_HERE, "verify_independent.py"))
vi = importlib.util.module_from_spec(spec)
spec.loader.exec_module(vi)


def day_windows(news_date):
    """Per distinct publication date: the loop-day list [lo..hi], the
    same max/min clamp as verify_independent's explode."""
    out = {}
    for dt in set(news_date.values()):
        lo = max(dt - pd.Timedelta(days=vi.NUM_DAYS), vi.FROM_DATE)
        hi = min(dt, vi.TO_DATE)
        days = []
        day = lo
        while day <= hi:
            days.append(day)
            day += pd.Timedelta(days=1)
        out[dt] = days
    return out


def build_inv(news_kw, news_date):
    in_range = {d for d, dt in news_date.items()
                if vi.FROM_DATE <= dt <= vi.TO_DATE +
                pd.Timedelta(days=vi.NUM_DAYS)}
    inv = {}
    for d in in_range:
        for w, v in news_kw[d]:
            inv.setdefault(w, []).append((d, v))
    return inv


def slice_lists(users, user_kw, inv, news_kw, news_date, windows,
                active_days, mode, score_round):
    """Ranked top-5 lists for one user slice; per-(day,u) bounded heaps,
    key (-score, newsId) — heap keeps the 5 strongest as (sc, -d)."""
    heaps = {}
    for u in users:
        prof = user_kw.get(u)
        if not prof:
            continue
        udays = active_days.get(u)
        if not udays:
            continue
        acc = {}
        common = {}
        for w, uv in prof:
            for d, nv in inv.get(w, ()):
                acc[d] = acc.get(d, 0.0) + uv * nv
                common[d] = common.get(d, 0) + 1
        lp = len(prof)
        for d, sc in acc.items():
            if mode != "dot":
                sc = common[d] / (lp * len(news_kw[d]))
            sc = vi.spark_round(sc, score_round)
            if sc <= 0:
                continue
            key = (sc, -d)
            for day in windows[news_date[d]]:
                if day not in udays:
                    continue
                h = heaps.get((day, u))
                if h is None:
                    heaps[(day, u)] = [(sc, -d, d)]
                elif len(h) < 5:
                    heapq.heappush(h, (sc, -d, d))
                elif key > (h[0][0], h[0][1]):
                    heapq.heapreplace(h, (sc, -d, d))
    lists = {}
    for (day, u), h in heaps.items():
        top = sorted(h, key=lambda t: (-t[0], t[2]))
        lists[(day, u)] = [d for _, _, d in top]
    return lists


def run_family(name, list_lane, prec_lane, news_kw, news_date, user_kw,
               ck, spark_out, mode, score_round, k_slices):
    ckd = ck.copy()
    ckd["date"] = pd.to_datetime(ckd["date"])
    act = ckd[(ckd["date"] >= vi.FROM_DATE) & (ckd["date"] <= vi.TO_DATE)]
    active_days = {int(u): {pd.Timestamp(d) for d in g["date"]}
                   for u, g in act.groupby("userId")}
    clicked = set(zip(ckd["date"], ckd["userId"].astype(int),
                      ckd["newsId"].astype(int)))
    inv = build_inv(news_kw, news_date)
    windows = day_windows(news_date)

    got = vi.dump(spark_out, list_lane)
    # normalize to ns so the merge key dtype matches the recompute's
    got["date"] = pd.to_datetime(got["date"]).astype("datetime64[ns]")
    got["userId"] = got["userId"].astype(int)

    errs = []
    total_rows = 0
    per_date = {}
    users = sorted(active_days)
    for r in range(k_slices):
        t0 = time.time()
        su = [u for u in users if u % k_slices == r]
        lists = slice_lists(su, user_kw, inv, news_kw, news_date, windows,
                            active_days, mode, score_round)
        total_rows += len(lists)
        exp = pd.DataFrame(
            [(u, day, ",".join(str(i) for i in ids))
             for (day, u), ids in lists.items()],
            columns=["userId", "date", "news_exp"])
        exp["date"] = exp["date"].astype("datetime64[ns]")
        gs = got[got["userId"] % k_slices == r]
        if len(gs) != len(exp):
            errs.append(f"slice {r}: row count {len(gs)} != {len(exp)}")
        m = gs.merge(exp, on=["userId", "date"], how="outer",
                     indicator=True)
        bad = int((m["_merge"] != "both").sum() +
                  (m.loc[m["_merge"] == "both", "news"] !=
                   m.loc[m["_merge"] == "both", "news_exp"]).sum())
        if bad:
            errs.append(f"slice {r}: {bad}/{len(exp)} lists differ")
        for (day, u), ids in lists.items():
            h, n = per_date.get(day, (0, 0))
            hits = sum(1 for i in ids if (day, u, i) in clicked)
            per_date[day] = (h + hits, n + len(ids))
        print(f"[{name}] slice {r}: {len(su)} users, {len(lists)} lists, "
              f"{time.time() - t0:.1f}s", flush=True)
    if len(got) != total_rows:
        errs.append(f"total rows {len(got)} != {total_rows}")

    gp = vi.dump(spark_out, prec_lane)
    gp["date"] = pd.to_datetime(gp["date"])
    gp = gp.set_index("date")
    if len(gp) != len(per_date):
        errs.append(f"precision date count {len(gp)} != {len(per_date)}")
    for day, (h, n) in per_date.items():
        row = gp.loc[day]
        if int(row["n_hits"]) != h or int(row["n_recommended"]) != n or \
           not vi.close(row["precision"], h / n, 6e-7):
            errs.append(f"{day.date()}: ({row['n_hits']},"
                        f"{row['n_recommended']}) != ({h},{n})")
    for e in errs:
        print(f"FAIL {name}: {e}")
    if not errs:
        print(f"PASS {list_lane} (+{prec_lane}): {total_rows} lists, "
              f"{len(per_date)} precision dates, {k_slices} slices")
    return errs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--spark-out", required=True)
    ap.add_argument("--mode", default="both",
                    choices=["tfidf", "textrank", "both"])
    ap.add_argument("--slices", type=int, default=32)
    args = ap.parse_args()
    con = duckdb.connect()
    n_fail = 0
    if args.mode in ("tfidf", "both"):
        t0 = time.time()
        news_kw, news_date, user_kw, ck = vi._tfidf_profiles(
            con, args.sf_dir)
        print(f"[tfidf] profiles built in {time.time() - t0:.1f}s",
              flush=True)
        n_fail += len(run_family(
            "tfidf", "q23_rec_lists", "q46_precision_rec", news_kw,
            news_date, user_kw, ck, args.spark_out, "dot", 4, args.slices))
    if args.mode in ("textrank", "both"):
        # _textrank_recs builds everything inline; replicate its profile
        # stage here (same window-graph quirks via the shared helpers).
        t0 = time.time()
        toks = vi._doc_tokens(con, args.sf_dir)
        window = 5
        news_kw = {}
        for d, tk in toks.items():
            words = {}
            for i, tok in enumerate(tk):
                s = words.setdefault(tok, set())
                left = max(0, i - window)
                right = i + window
                if right >= len(tk):
                    right = 0
                c = left
                while c <= right and c != i:
                    s.add(tk[c])
                    c += 1
            news_kw[d] = vi._textrank_vote(words, 5)
        news_date = {d: pd.Timestamp("2024-01-01") +
                     pd.Timedelta(days=d % 30) for d in toks}
        ck = vi.clicks(con, args.sf_dir)
        user_kw = {}
        for u, g in ck.groupby("userId"):
            words = {}
            for nid in set(g["newsId"].astype(int)):
                if nid not in toks:
                    continue
                keys = set(toks[nid])
                for k in keys:
                    words.setdefault(k, set()).update(keys - {k})
            if words:
                user_kw[int(u)] = vi._textrank_vote(words, 8)
        print(f"[textrank] profiles built in {time.time() - t0:.1f}s",
              flush=True)
        n_fail += len(run_family(
            "textrank", "q40_textrank_rec", "q117_precision_textrank",
            news_kw, news_date, user_kw, ck, args.spark_out, "dot", 6,
            args.slices))
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
