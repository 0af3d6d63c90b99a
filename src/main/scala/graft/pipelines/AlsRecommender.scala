package graft.pipelines

import org.apache.spark.ml.recommendation.ALS
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Collaborative-filtering recommender (BASELINE.json north-star: "MLlib ALS
  * for collaborative filtering") — the matrix-factorization complement to the
  * content-based pipelines: no keywords, pure user×news interaction factors.
  *
  * The reference has no CF analogue (its recommenders are content/popularity
  * based), so this is an extension surface: train on the click log
  * (implicit-feedback ALS, rating = click count), emit per-user top-k.
  *
  * Scale notes: ALS is the canonical distributed MF — factor blocks
  * partition by user/item, each iteration is a pair of block-joined least
  * squares solves; `recommendForAllUsers` is a blocked cross-factor top-k
  * (internally batched matmul, not a naive cross join). Seeded for
  * reproducibility.
  */
object AlsRecommender {

  /** clicks → the (user, item, rating) matrix and a fitted implicit-ALS
    * model over it (shared by [[recommend]] and [[audit]]).
    */
  private[graft] def fitModel(clicks: DataFrame, rank: Int, maxIter: Int,
                       regParam: Double, seed: Long)
      : (org.apache.spark.ml.recommendation.ALSModel, DataFrame) = {
    val ratings = clicks
      .groupBy(col("userId").cast("int").as("user"), col("newsId").cast("int").as("item"))
      .agg(sum(col("count")).cast("float").as("rating"))

    // Block count bounds the per-iteration task count (each of maxIter
    // iterations runs a user-solve and an item-solve over the blocked
    // factor RDDs): size it to the RATINGS matrix, not the session's batch
    // parallelism — a news-recommendation matrix (users x catalog) is tiny
    // next to the click log that produced it, and oversized block counts
    // turn every solve into a storm of near-empty tasks. At 100 TB the
    // click LOG is huge but this pre-aggregated matrix still fits a modest
    // block count; scale blocks with distinct users/items, not input rows.
    val blocks = math.max(2, math.min(16,
      clicks.sparkSession.sparkContext.defaultParallelism / 4))
    val model = new ALS()
      .setUserCol("user").setItemCol("item").setRatingCol("rating")
      .setImplicitPrefs(true) // clicks are implicit feedback
      .setRank(rank).setMaxIter(maxIter).setRegParam(regParam)
      .setNumUserBlocks(blocks).setNumItemBlocks(blocks)
      .setSeed(seed)
      .setColdStartStrategy("drop")
      .fit(ratings)
    (model, ratings)
  }

  /** clicks: (userId, newsId, date, count) → per-user top-k
    * (userId, newsId, rating, rn).
    */
  def recommend(clicks: DataFrame, k: Int, rank: Int = 8, maxIter: Int = 8,
                regParam: Double = 0.1, seed: Long = 42L): DataFrame = {
    val (model, _) = fitModel(clicks, rank, maxIter, regParam, seed)
    model.recommendForAllUsers(k)
      .select(col("user").cast("long").as("userId"),
        posexplode(col("recommendations")).as(Seq("pos", "rec")))
      .select(col("userId"),
        col("rec.item").cast("long").as("newsId"),
        round(col("rec.rating").cast("double"), 4).as("score"),
        (col("pos") + 1).as("rn"))
  }

  /** Driver-checkable audit of the same fixed-seed fit (VERDICT r8 task 6):
    * the raw factor rankings are not SQL-expressible, but three bound
    * verdicts about them ARE deterministically true for a healthy fit, so
    * the lane emits one row per trained user with booleans a DuckDB oracle
    * checks as literals — plus the user id itself, which the oracle checks
    * EXACTLY (the trained-user set is precisely the distinct clicking
    * users: recommendForAllUsers covers every user block, and
    * coldStartStrategy=drop only affects transform-time unseen keys).
    *
    *  - `has_k_recs`: the user got exactly k recommendations (k ≤ catalog
    *    size — trivially deliverable, so a false here means a broken
    *    top-k).
    *  - `mono_ok`: the user's rec scores are non-increasing in rank
    *    (rounded to the same 4 decimals [[recommend]] ships, with a half-ulp
    *    slack) — the ranking contract itself.
    *  - `separation_ok`: for at least `minWinRate` of trained users, the
    *    user's mean prediction over their OBSERVED items exceeds their
    *    mean over a deterministic probe set of unobserved items — the
    *    defining property of implicit MF (Hu-Koren-Volinsky preferences:
    *    observed ≈ 1, rest shrunk to ≈ 0), expressed per-user because the
    *    GLOBAL mean gap shrinks with matrix density (measured 0.65 →
    *    0.17 → 0.05 across sf0.001→sf0.1) while the per-user win rate is
    *    scale-stable: measured ≥ 0.990 at sf0.001–sf0.1 under both
    *    2-block and 8-block layouts. The 0.8 floor is far under every
    *    measurement, while a degenerate fit (all-zero, exploded, or
    *    unseeded-random factors) sits at ≈ 0.5. A ratio over thousands
    *    of per-user booleans feeds a margin-sized verdict, so
    *    partial-sum order can never flip it.
    *
    * Booleans over margins — not estimates — is what keeps this honest:
    * nothing fakes determinism in the factors themselves; every emitted
    * column is invariant to seed-preserving layout changes (2 vs 8 ALS
    * blocks give different factors but identical verdicts).
    */
  def audit(clicks: DataFrame, k: Int, rank: Int = 8, maxIter: Int = 8,
            regParam: Double = 0.1, seed: Long = 42L,
            minWinRate: Double = 0.8, nProbes: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (model, ratings) = fitModel(clicks, rank, maxIter, regParam, seed)
    val recs = model.recommendForAllUsers(k)
      .select(col("user"), posexplode(col("recommendations")).as(Seq("pos", "rec")))
      .select(col("user"), round(col("rec.rating").cast("double"), 4).as("score"),
        col("pos"))
    val wU = Window.partitionBy(col("user")).orderBy(col("pos").asc)
    val perUser = recs
      .withColumn("_prev", lag(col("score"), 1).over(wU))
      .groupBy(col("user"))
      .agg((count(lit(1)) === k).as("has_k_recs"),
        (sum((col("_prev").isNotNull && col("score") > col("_prev") + 5e-5)
          .cast("long")) === 0L).as("mono_ok"))
    // deterministic unobserved probes: a keyed hash mod |catalog| indexes
    // the TRAINED item list (the rank window runs over the catalog — a
    // dimension table, never the click log), anti-joined against the
    // observed pairs; no RNG state, same pairs every run.
    val itemIdx = ratings.select(col("item")).distinct()
      .select(col("item"),
        (row_number().over(Window.orderBy(col("item"))) - 1)
          .cast("long").as("_ir"))
    val nItems = itemIdx.agg(count(lit(1)).as("_ni"))
    val probes = ratings.select(col("user")).distinct()
      .crossJoin(broadcast(
        ratings.sparkSession.range(nProbes.toLong).select(col("id").as("j"))))
      .crossJoin(broadcast(nItems))
      .withColumn("_ir", pmod(
        col("user").cast("long") * 2654435761L + col("j") * 40503L,
        col("_ni")))
      .join(broadcast(itemIdx), "_ir")
      .select(col("user"), col("item"))
      .join(ratings.select(col("user"), col("item")), Seq("user", "item"),
        "left_anti")
    val obsU = model.transform(ratings)
      .groupBy(col("user")).agg(avg(col("prediction")).as("_po"))
    val negU = model.transform(probes)
      .groupBy(col("user")).agg(avg(col("prediction")).as("_pn"))
    val winRate = obsU.join(negU, "user")
      .agg(avg((col("_po") > col("_pn")).cast("double")).as("_wr"))
    perUser.crossJoin(broadcast(winRate))
      .select(col("user").cast("long").as("userId"), col("has_k_recs"),
        col("mono_ok"), (col("_wr") >= minWinRate).as("separation_ok"))
  }
}
