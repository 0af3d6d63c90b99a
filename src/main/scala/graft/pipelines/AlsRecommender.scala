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

  /** clicks: (userId, newsId, date, count) → per-user top-k
    * (userId, newsId, rating, rn).
    */
  def recommend(clicks: DataFrame, k: Int, rank: Int = 8, maxIter: Int = 8,
                regParam: Double = 0.1, seed: Long = 42L): DataFrame = {
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

    model.recommendForAllUsers(k)
      .select(col("user").cast("long").as("userId"),
        posexplode(col("recommendations")).as(Seq("pos", "rec")))
      .select(col("userId"),
        col("rec.item").cast("long").as("newsId"),
        round(col("rec.rating").cast("double"), 4).as("score"),
        (col("pos") + 1).as("rn"))
  }
}
