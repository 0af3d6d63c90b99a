#!/usr/bin/env python3
"""Adjudicate the r6 bench slowdown (VERDICT r7 task 1).

Reads the interleaved A/B runs produced by tools/ab_bench.sh
(.tmp/ab/{r5,r6}_run{i}.out — one Bench JSON line each), computes
per-query MEDIANS per side over the common successfully-run query set,
and writes bench/ab_r7.json with:
  - per-query median seconds for each side + ratio r6/r5
  - geomean ratio over the common set, plus the same restricted to the
    driver-tail-visible queries (the 60 the r6-vs-r5 1.28x claim was
    computed on)
  - per-side run-to-run spread (the box noise floor, measured per query)
  - excluded queries (errored on either side, or present on one side only)
"""
import json, math, re, sys, glob, os, statistics


def _geomean(ratios):
    ratios = [r for r in ratios if r and r > 0]
    return math.exp(sum(math.log(r) for r in ratios) / len(ratios)) if ratios else None


def round_compare(cur_path, prev_path, solo_path, out_path,
                  regress_at=1.2, churn_tol=1.25):
    """Round-over-round bench diff with AUTOMATIC churn adjudication
    (VERDICT r9 task 6): apparent regressions are classified against the
    committed solo-bench artifact (per-lane own-JVM medians) and the
    current run's own sample spread, so no round hand-adjudicates the
    q23/q26/q107-class suite-ordering churn in prose.

    `solo_path` must be the CURRENT binary's solo artifact
    (tools/solo_bench.sh output): classification per lane with
    ratio >= regress_at:
      - "suite-churn (solo)": the lane's own-JVM solo median reproduces
        the PREVIOUS round's time (solo <= prev * churn_tol) — the binary
        is not slower; the in-suite median moved with block-manager/
        ordering state. This is r9's "reproduces its r8 time in run 1 of
        the same binary" adjudication, mechanized.
      - "suite-churn (spread)": the two rounds' k-sample RANGES overlap
        (fastest current sample <= slowest previous sample) — the medians
        moved but the distributions did not separate; on this box the
        measured run-to-run spread is ~1.3-2x on sub-second lanes, wider
        than the flag threshold.
      - "REAL": neither — the distributions separated; investigate (an
        intended plan change lands here too, e.g. a lane that now builds
        a shared stage it previously borrowed warm).
    """
    cur = json.load(open(cur_path))
    prev = json.load(open(prev_path))
    solo = json.load(open(solo_path)) if solo_path and os.path.exists(solo_path) else {"queries": {}}
    common = sorted(set(cur["queries"]) & set(prev["queries"]))
    per, regressions = {}, {}
    for q in common:
        c, p = cur["queries"][q], prev["queries"][q]
        ratio = round(c / p, 3) if p > 0 else None
        per[q] = {"prev_s": round(p, 3), "cur_s": round(c, 3), "ratio": ratio}
        if ratio is not None and ratio >= regress_at and c - p > 0.15:
            samples = cur.get("samples", {}).get(q, [c])
            prev_samples = prev.get("samples", {}).get(q, [p])
            verdict = "REAL"
            sq = solo["queries"].get(q)
            if sq is not None and sq <= p * churn_tol:
                verdict = "suite-churn (solo)"
            elif min(samples) <= max(prev_samples):
                verdict = "suite-churn (spread)"
            regressions[q] = dict(per[q], verdict=verdict,
                                  cur_samples=[round(s, 3) for s in samples],
                                  solo_median_s=sq and round(sq, 3))
    result = {
        "protocol": {
            "cur": cur_path, "prev": prev_path, "solo": solo_path,
            "rule": f"ratio >= {regress_at} and delta > 0.15 s flags; "
                    f"cur solo median <= prev*{churn_tol} or prev inside "
                    "cur sample range => suite churn, else REAL",
        },
        "n_common": len(common),
        # _geomean returns None when no positive ratios exist (disjoint
        # query sets, or every prev median 0) — report that instead of
        # raising TypeError on round(None, 4).
        "geomean_ratio_cur_over_prev": (lambda g: round(g, 4) if g is not None
                                        else None)(_geomean(
            [v["ratio"] for v in per.values()])),
        "total_prev_s": round(sum(v["prev_s"] for v in per.values()), 1),
        "total_cur_s": round(sum(v["cur_s"] for v in per.values()), 1),
        "n_flagged": len(regressions),
        "n_real": sum(1 for v in regressions.values() if v["verdict"] == "REAL"),
        "regressions": dict(sorted(regressions.items(),
                                   key=lambda kv: -kv[1]["ratio"])),
        "per_query": per,
    }
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    json.dump(result, open(out_path, "w"), indent=1)
    print(f"common={len(common)} geomean={result['geomean_ratio_cur_over_prev']}"
          f" flagged={len(regressions)} real={result['n_real']}")
    for q, v in result["regressions"].items():
        print(f"  {v['verdict']:>22} {q}: {v['prev_s']} -> {v['cur_s']}"
              f" ({v['ratio']}x, solo={v['solo_median_s']})")
    return result


if len(sys.argv) > 1 and sys.argv[1] == "roundcmp":
    round_compare(sys.argv[2], sys.argv[3],
                  sys.argv[4] if len(sys.argv) > 4 else None,
                  sys.argv[5] if len(sys.argv) > 5 else "bench/round_cmp.json")
    sys.exit(0)

AB = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.tmp/ab"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/bench/ab_r7.json"

def load_side(side):
    runs, failed = [], set()
    for out in sorted(glob.glob(f"{AB}/{side}_run*.out")):
        with open(out) as f:
            line = [l for l in f if l.startswith('{"metric"')]
        if not line:
            print(f"WARN: no JSON in {out}")
            continue
        runs.append(json.load(open(out)) if False else json.loads(line[-1]))
        err = out[:-4] + ".err"
        if os.path.exists(err):
            for l in open(err, errors="replace"):
                m = re.match(r"\[bench\] ([a-z0-9_]+)", l)
                if m:
                    failed.add(m.group(1))
    return runs, failed

r5_runs, r5_failed = load_side("r5")
r6_runs, r6_failed = load_side("r6")
assert r5_runs and r6_runs, "missing runs"

q5 = set.intersection(*[set(r["queries"]) for r in r5_runs])
q6 = set.intersection(*[set(r["queries"]) for r in r6_runs])
excluded = sorted((q5 ^ q6) | r5_failed | r6_failed)
common = sorted((q5 & q6) - r5_failed - r6_failed)

def med(runs, q): return statistics.median(r["queries"][q] for r in runs)
def spread(runs, q):
    v = sorted(r["queries"][q] for r in runs)
    return v[-1] / v[0] if v[0] > 0 else None

per_query = {}
for q in common:
    m5, m6 = med(r5_runs, q), med(r6_runs, q)
    per_query[q] = {
        "r5_median_s": round(m5, 3), "r6_median_s": round(m6, 3),
        "ratio_r6_over_r5": round(m6 / m5, 3) if m5 > 0 else None,
        "r5_spread": round(spread(r5_runs, q), 3),
        "r6_spread": round(spread(r6_runs, q), 3),
    }

def geomean(ratios):
    ratios = [r for r in ratios if r and r > 0]
    return math.exp(sum(math.log(r) for r in ratios) / len(ratios))

gm_all = geomean([v["ratio_r6_over_r5"] for v in per_query.values()])
# Driver tail = last ~60 queries in Bench's map iteration order; approximate
# with the 60 alphabetically-last common queries (Bench iterates a Scala Map;
# the driver captured whatever its stdout tail kept). The all-query geomean
# is the primary number; this slice exists to speak to the original claim.
tail60 = sorted(common)[-60:]
gm_tail = geomean([per_query[q]["ratio_r6_over_r5"] for q in tail60])

noise5 = geomean([per_query[q]["r5_spread"] for q in common])
noise6 = geomean([per_query[q]["r6_spread"] for q in common])

worst = sorted(per_query.items(), key=lambda kv: -(kv[1]["ratio_r6_over_r5"] or 0))[:10]
best = sorted(per_query.items(), key=lambda kv: (kv[1]["ratio_r6_over_r5"] or 9))[:10]

result = {
    "protocol": {
        "data": "identical current sf0.1 testdata for both sides",
        "binaries": {"r5": "worktree @ 4736e88 (r5 end)", "r6": "worktree @ 62e4599 (r6 end)"},
        "runs_per_side": {"r5": len(r5_runs), "r6": len(r6_runs)},
        "interleaving": "(r6,r5) x N alternating, same JVM flags (-Xmx8g, local[32])",
        "comparison": "per-query MEDIANS over the common non-erroring query set",
    },
    "n_common": len(common), "excluded": excluded,
    "geomean_ratio_r6_over_r5_all": round(gm_all, 4),
    "geomean_ratio_r6_over_r5_tail60": round(gm_tail, 4),
    "within_side_noise_geomean_spread": {"r5": round(noise5, 4), "r6": round(noise6, 4)},
    "r5_total_median_s": round(statistics.median(r["value"] for r in r5_runs), 1),
    "r6_total_median_s": round(statistics.median(r["value"] for r in r6_runs), 1),
    "worst10_r6_vs_r5": {q: v for q, v in worst},
    "best10_r6_vs_r5": {q: v for q, v in best},
    "per_query": per_query,
}
os.makedirs(os.path.dirname(OUT), exist_ok=True)
json.dump(result, open(OUT, "w"), indent=1)
print(f"common={len(common)} excluded={len(excluded)}")
print(f"geomean r6/r5 ALL     = {gm_all:.4f}")
print(f"geomean r6/r5 tail60  = {gm_tail:.4f}")
print(f"noise floor (spread)  : r5 {noise5:.4f}  r6 {noise6:.4f}")
print(f"totals: r5 {result['r5_total_median_s']}s  r6 {result['r6_total_median_s']}s")
for q, v in worst[:5]:
    print(f"  worst {q}: {v['r5_median_s']} -> {v['r6_median_s']} ({v['ratio_r6_over_r5']}x)")
