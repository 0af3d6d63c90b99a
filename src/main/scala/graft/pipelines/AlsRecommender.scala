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

    val model = new ALS()
      .setUserCol("user").setItemCol("item").setRatingCol("rating")
      .setImplicitPrefs(true) // clicks are implicit feedback
      .setRank(rank).setMaxIter(maxIter).setRegParam(regParam)
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
