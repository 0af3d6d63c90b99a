#!/usr/bin/env python3
"""Out-of-band oracle for q50_als_recommend (VERDICT r7 task 6).

q50 is `no_oracle` by nature: iterative matrix factorization isn't
expressible in DuckDB SQL. This tool provides independent evidence with a
from-scratch NumPy implementation of the SAME mathematical contract the
Spark side runs (graft.pipelines.AlsRecommender):

  - implicit-feedback ALS (Hu, Koren, Volinsky, ICDM'08): preference
    p = 1 for any positive rating, confidence c = 1 + alpha * r
  - Spark ML's documented deviations: regParam is scaled per entity by its
    positive-rating count (the ALS-WR-style lambda * n_u scaling Spark
    applies in ml.recommendation.ALS.computeFactors), alpha = 1.0 default
  - same hyperparameters: rank=8, maxIter=8, regParam=0.1, ratings =
    per-(user,item) click-count sums from the same events.parquet

Initialization necessarily differs (Spark seeds per-block XORShift
factors; NumPy uses its own seeded Gaussian), so factor matrices are NOT
comparable bit-for-bit — only the RANKING structure both converge to is.
The comparison is therefore rank-tolerant, two metrics per user:
  - overlap@k between the two engines' top-k item sets
  - cross-NDCG@k: Spark's top-k list scored by the NumPy model's
    predicted preferences (1.0 = NumPy's model would have ranked Spark's
    list identically; robust to near-tie order swaps)

On the sf0.01 matrix (150 users x 497 items, nnz=1970) rank-8 implicit
MF is heavily seed-dominated: two seeds of THIS SAME NumPy
implementation agree on only ~0.26 of their top-5 sets (~0.70
cross-NDCG). Absolute thresholds would therefore test the data's
conditioning, not the implementations. The gate is RELATIVE to that
measured self-agreement ceiling: Spark's agreement with the NumPy model
must be at least 80% of the ceiling on overlap and 95% on cross-NDCG —
i.e. Spark-vs-NumPy disagrees no more than NumPy-vs-NumPy does, which is
exactly what "same mathematical contract, different init" predicts.
(Measured r7 @ sf0.01: spark-vs-numpy overlap 0.281 and cross-NDCG 0.718
— BOTH above the respective ceilings 0.263 / 0.702: Spark's output is
indistinguishable from another seed of the same algorithm. PASS.)

Usage (since r9 the DECLARED q50 lane emits bound-verdict booleans, so
the raw rec lists come from graft.tools.DumpAux, not a Verify dump):
  sbt "runMain graft.tools.DumpAux /root/testdata/sf0.01 /tmp/aux"
  python3 tools/verify_als.py --sf-dir /root/testdata/sf0.01 \
      --spark-out /tmp/aux/als_lists
"""
import argparse, sys
import numpy as np
import duckdb


def load_ratings(sf_dir):
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT user_id AS u, event_id % 500 AS i,
                   CAST(count(*) AS DOUBLE) AS r
            FROM read_parquet('{sf_dir}/events.parquet')
            WHERE event_type = 'click' GROUP BY 1, 2"""
    ).fetchall()
    users = sorted({r[0] for r in rows})
    items = sorted({r[1] for r in rows})
    uidx = {u: k for k, u in enumerate(users)}
    iidx = {i: k for k, i in enumerate(items)}
    R = np.zeros((len(users), len(items)))
    for u, i, r in rows:
        R[uidx[u], iidx[i]] = r
    return R, users, items


def als_implicit(R, rank=8, iters=8, lam=0.1, alpha=1.0, seed=42):
    """Implicit ALS, normal-equation form with the YtY speedup.

    x_u = (YtY + Y^T (C_u - I) Y + lam * n_u * I)^-1  Y^T C_u p_u
    with C_u = diag(1 + alpha * r_u), p_u = 1[r_u > 0],
    n_u = |{i : r_ui > 0}|  (Spark's per-entity lambda scaling).
    """
    rng = np.random.default_rng(seed)
    nu, ni = R.shape
    # Spark-style init scale: N(0,1)/sqrt(rank)-ish magnitude
    X = rng.standard_normal((nu, rank)) * 0.1
    Y = rng.standard_normal((ni, rank)) * 0.1
    P = (R > 0).astype(float)
    for _ in range(iters):
        for (A, B, Rm, Pm) in ((X, Y, R, P), (Y, X, R.T, P.T)):
            BtB = B.T @ B
            for idx in range(A.shape[0]):
                r = Rm[idx]
                nz = r > 0
                n_pos = int(nz.sum())
                if n_pos == 0:
                    A[idx] = 0.0
                    continue
                Bnz = B[nz]                      # (n_pos, rank)
                c = 1.0 + alpha * r[nz]          # confidences
                # YtY + Y^T (C-I) Y restricted to the nonzero rows
                G = BtB + (Bnz * (c - 1.0)[:, None]).T @ Bnz
                G += lam * n_pos * np.eye(A.shape[1])
                A[idx] = np.linalg.solve(G, (Bnz * c[:, None]).T @ Pm[idx][nz])
    return X, Y


def topk(X, Y, k):
    S = X @ Y.T
    return np.argsort(-S, axis=1, kind="stable")[:, :k], S


def ndcg_of_list(scores_row, chosen, k):
    """NDCG@k of an item list `chosen` under preference scores scores_row."""
    # One COMMON shift for both the chosen list and the ideal list: scores
    # are preferences ~[0,1] but can stray negative, and shifting each list
    # by its own minimum would put DCG and IDCG on different gain scales
    # (the ratio could exceed 1 and rank lists inconsistently).
    off = float(scores_row.min())
    off = off if off < 0 else 0.0
    gains = scores_row[chosen] - off
    disc = 1.0 / np.log2(np.arange(2, len(chosen) + 2))
    dcg = float((gains * disc).sum())
    ideal = np.sort(scores_row)[::-1][:k] - off
    idcg = float((ideal * disc[: len(ideal)]).sum())
    return dcg / idcg if idcg > 0 else 1.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--spark-out", required=True,
                    help="q50_als_recommend.parquet written by graft.Verify")
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--overlap-frac", type=float, default=0.80,
                    help="required fraction of the self-agreement overlap ceiling")
    ap.add_argument("--ndcg-frac", type=float, default=0.95,
                    help="required fraction of the self-agreement cross-NDCG ceiling")
    args = ap.parse_args()

    R, users, items = load_ratings(args.sf_dir)
    print(f"ratings matrix: {R.shape[0]} users x {R.shape[1]} items, "
          f"nnz={int((R > 0).sum())}")

    X, Y = als_implicit(R)
    my_top, S = topk(X, Y, args.k)

    # self-agreement ceiling: an independent seed of the SAME implementation
    X2, Y2 = als_implicit(R, seed=4242)
    alt_top, S2 = topk(X2, Y2, args.k)
    self_overlap = np.mean([
        len(set(my_top[u]) & set(alt_top[u])) / args.k for u in range(len(users))])
    self_ndcg = np.mean([
        ndcg_of_list(S[u], alt_top[u], args.k) for u in range(len(users))])

    con = duckdb.connect()
    spark = con.execute(
        f"""SELECT userId, list(newsId ORDER BY rn) AS recs
            FROM read_parquet('{args.spark_out}/*.parquet')
            WHERE rn <= {args.k} GROUP BY userId"""
    ).fetchall()
    uidx = {u: k for k, u in enumerate(users)}
    iidx = {i: k for k, i in enumerate(items)}
    overlaps, ndcgs, skipped = [], [], 0
    for uid, recs in spark:
        if uid not in uidx:
            skipped += 1
            continue
        u = uidx[uid]
        sp = [iidx[i] for i in recs if i in iidx]
        overlaps.append(len(set(sp) & set(my_top[u])) / args.k)
        ndcgs.append(ndcg_of_list(S[u], np.array(sp), args.k))
    mo, mn = float(np.mean(overlaps)), float(np.mean(ndcgs))
    gate_o = args.overlap_frac * self_overlap
    gate_n = args.ndcg_frac * self_ndcg
    print(f"spark users compared: {len(overlaps)} (skipped {skipped})")
    print(f"self-agreement ceiling (two NumPy seeds): "
          f"overlap@{args.k} {self_overlap:.3f}, cross-NDCG@{args.k} {self_ndcg:.3f}")
    print(f"mean overlap@{args.k} spark-vs-numpy:    {mo:.3f}  (gate {gate_o:.3f})")
    print(f"mean cross-NDCG@{args.k} spark-vs-numpy: {mn:.3f}  (gate {gate_n:.3f})")
    ok = mo >= gate_o and mn >= gate_n
    print("PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
