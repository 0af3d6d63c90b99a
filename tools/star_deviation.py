#!/usr/bin/env python3
"""Quantify q281 (star-candidate exact clusters) against q70 (pair-complete
exact clusters) on a Verify dump: refinement check + split statistics.

The declared contract (Dedup.lshStarCandidates scaladoc, ExtSpec pin) is
split-only deviation: every q281 cluster sits inside exactly one q70
cluster. This driver verifies that on real dump output and reports how
much splitting actually happens — the number SCALE.md cites for the nd
stress fixtures.

Usage: python3 tools/star_deviation.py <verifyOutDir> [starLane]
(starLane defaults to q281_star_dedup_clusters; pass
q285_star2_dedup_clusters to price the h=2 dial)
"""
import glob
import json
import sys

import pandas as pd


def labels(out, lane):
    files = sorted(glob.glob(f"{out}/{lane}/*.parquet"))
    df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    return df.set_index("doc_id")["cluster"]


def main():
    out = sys.argv[1]
    lane = sys.argv[2] if len(sys.argv) > 2 else "q281_star_dedup_clusters"
    full = labels(out, "q70_dedup_clusters")
    star = labels(out, lane)
    assert len(full) == len(star), "row count mismatch"
    m = pd.DataFrame({"full": full, "star": star}).reset_index()

    # refinement: each star cluster maps to exactly one full cluster
    viol = m.groupby("star")["full"].nunique()
    n_viol = int((viol > 1).sum())

    full_sizes = m.groupby("full").size()
    star_sizes = m.groupby("star").size()
    # full clusters that star splits: containing >1 distinct star label
    splits = m.groupby("full")["star"].nunique()
    split_clusters = splits[splits > 1]
    nontrivial_full = full_sizes[full_sizes > 1]

    report = {
        "n_docs": int(len(m)),
        "refinement_violations": n_viol,
        "n_full_clusters": int(full.nunique()),
        "n_star_clusters": int(star.nunique()),
        "n_full_nonsingleton": int(len(nontrivial_full)),
        "n_full_clusters_split_by_star": int(len(split_clusters)),
        "pct_full_nonsingleton_split": round(
            100.0 * len(split_clusters) / max(1, len(nontrivial_full)), 3),
        "n_docs_label_differs": int((m["full"] != m["star"]).sum()),
        "pct_docs_label_differs": round(
            100.0 * (m["full"] != m["star"]).mean(), 4),
        "max_full_cluster": int(full_sizes.max()),
        "max_star_cluster": int(star_sizes.max()),
    }
    print(json.dumps(report))
    if n_viol:
        print(f"REFINEMENT VIOLATED in {n_viol} star clusters", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
