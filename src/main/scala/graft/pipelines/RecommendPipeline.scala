package graft.pipelines

import graft.model.{Scene, SimilarityAlgorithm}
import graft.ops.Ops
import graft.sim.Scoring
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The shared recommendation skeleton of the two content-based pipelines
  * (reference E1/E2 `recommend()`, /root/reference/TF_IDF.java:151-234,
  * TextRank.java:220-312): per loop-day,
  *   1. today's active users (distinct users who clicked today, A1),
  *   2. their keyword profiles (semi-join, reference J1 cross+contains),
  *   3. candidate news = news dated in [today, today+numDays] (direction-1
  *      DateZoneFilter, TF_IDF.java:166),
  *   4. score every (user, news) pair (J2), keep score > 0,
  *   5. per-user ranking: TextRank cuts at numRecommendations
  *      (TextRank.java:294-296), TF_IDF collects all (TF_IDF.java:206-221).
  *
  * Spark-first: the day loop is one job — candidate news membership
  * `news.date ∈ [day, day+numDays]` is exploded map-side into
  * `day ∈ [date-numDays, date]`, users arrive as normalized (date, userId)
  * rows joined on equality, and scoring is the inverted-index equi-join
  * (graft.sim.Scoring) instead of a cross product. Ties in scores break
  * newsId-asc (frozen spec; the reference's sortGroup tie order is
  * unspecified).
  */
object RecommendPipeline {

  /** Scored (date, userId, newsId, score) for every active (user, day) ×
    * candidate news pair with score > 0.
    *
    * @param userKw  (userId, word, value) — user-profile keywords
    * @param newsKw  (id, date, word, value) — news keywords
    * @param clicks  (userId, newsId, date, count)
    */
  def scoredPairs(userKw: DataFrame, newsKw: DataFrame, clicks: DataFrame,
                  scene: Scene, scoreRound: Option[Int] = None): DataFrame = {
    val activeUsers = Ops.distinctUsersPerDay(clicks)
      .filter(col("date").between(lit(scene.fromDate), lit(scene.toDate)))

    // News doc is a candidate for day ∈ [date-numDays, date] ∩ [from, to].
    val candidateNews = newsKw
      .filter(col("date").between(lit(scene.fromDate), date_add(lit(scene.toDate), scene.numDays)))
      .withColumn("day", explode(sequence(
        greatest(date_sub(col("date"), scene.numDays), lit(scene.fromDate)),
        least(col("date"), lit(scene.toDate)),
        expr("interval 1 day"))))
      .select(col("day"), col("id"), col("word"), col("value"))

    // Profile of each active (day, user): equi-join replaces cross+contains.
    val activeProfiles = userKw
      .join(activeUsers.withColumnRenamed("date", "day"), "userId")
      .select(col("day"), col("userId"), col("word"), col("value"))

    val scored = scene.similarityAlgorithm match {
      case SimilarityAlgorithm.CosineSimilarity =>
        // F5 calculateX per day-slice: inverted-index join keyed on (day, word).
        val lsize = activeProfiles.groupBy("day", "userId").agg(count(lit(1)).as("_lsize"))
        val rsize = candidateNews.groupBy("day", "id").agg(count(lit(1)).as("_rsize"))
        activeProfiles.select(col("day"), col("userId"), col("word"))
          .join(candidateNews.select(col("day"), col("id"), col("word")), Seq("day", "word"))
          .groupBy(col("day"), col("userId"), col("id"))
          .agg(count(lit(1)).as("_common"))
          .join(lsize, Seq("day", "userId"))
          .join(rsize, Seq("day", "id"))
          .withColumn("score", col("_common").cast("double") / (col("_lsize") * col("_rsize")))
      case SimilarityAlgorithm.EuclideanDistance =>
        activeProfiles.select(col("day"), col("userId"), col("word"), col("value").as("_lv"))
          .join(candidateNews.select(col("day"), col("id"), col("word"), col("value").as("_rv")),
            Seq("day", "word"))
          .groupBy(col("day"), col("userId"), col("id"))
          .agg(sum(col("_lv") * col("_rv")).as("score"))
    }
    // Optional rounding BEFORE the >0 guard and ranking: makes ordering
    // reproducible bit-for-bit across engines (oracle parity).
    val maybeRounded = scoreRound match {
      case Some(p) => scored.withColumn("score", round(col("score"), p))
      case None    => scored
    }
    maybeRounded
      .filter(col("score") > 0) // reference guard TextRank.java:275
      .select(col("day").as("date"), col("userId"), col("id").as("newsId"), col("score"))
  }

  /** Reference-shaped recommendations (userId, date, news array), ranked
    * score-desc / newsId-asc; `limit` = Some(k) for the TextRank cut, None
    * for TF_IDF's unbounded collect.
    */
  def recommendAll(userKw: DataFrame, newsKw: DataFrame, clicks: DataFrame,
                   scene: Scene, limit: Option[Int],
                   scoreRound: Option[Int] = None): DataFrame = {
    val ranked = Ops.topKPerGroup(
      scoredPairs(userKw, newsKw, clicks, scene, scoreRound),
      Seq("date", "userId"),
      Seq(col("score").desc, col("newsId").asc),
      limit.getOrElse(Int.MaxValue))
    ranked
      .groupBy(col("userId"), col("date"))
      .agg(transform(
        array_sort(collect_list(struct(col("rn"), col("newsId")))),
        x => x("newsId")).as("news"))
  }
}
