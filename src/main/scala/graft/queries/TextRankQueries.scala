package graft.queries

import graft.io.Tables
import graft.model.{Scene, SimilarityAlgorithm}
import graft.pipelines.{RecommendPipeline, TextRankKeywords}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.sql.Date

/** The TextRank pipeline (reference E2, /root/reference/TextRank.java) over
  * the testdata mapping: per-document window-graph keyword extraction
  * (P1/F2/F4) and the full recommend run with clique-graph user profiles
  * (A2/F3). Power-iteration output is not ANSI-SQL-expressible, so these are
  * rows-only queries — the algorithm itself is pinned by the hand-computed
  * TextRankSpec unit tests (including the right=0 tail-clamp quirk).
  */
object TextRankQueries {
  type Q = (SparkSession, String) => DataFrame

  private val scene = Scene(
    windowSize = 5,
    numNewsKeywords = 5,
    numUserKeywords = 8,
    numDays = 7,
    fromDate = Date.valueOf("2024-01-05"),
    toDate = Date.valueOf("2024-01-25"),
    friction = 0.85,
    maxIterates = 30,
    minDifference = 1e-4,
    numRecommendations = 5,
    similarityAlgorithm = SimilarityAlgorithm.EuclideanDistance)

  /** Per-document TextRank keyword table, shared by q39 (direct output) and
    * q40 (scoring input) — one run of the power-iteration UDF over the
    * corpus per session+dataset (the reference writes this exact table to
    * files once, TextRank.java:68-73, and re-reads it at :224).
    */
  private def sharedNewsKw(s: SparkSession, d: String): DataFrame =
    graft.runtime.Stage.shared(s"textrank-news-kw:${System.identityHashCode(s)}:$d") {
      graft.runtime.Stage.persistShared(
        TextRankKeywords.newsKeywords(graft.ops.Ops.fanOut(Tables.news(s, d)), scene))
    }

  val queries: Map[String, Q] = Map(
    // E2 keyword stage: per-document TextRank over the window co-occurrence
    // graph (the graph never crosses a row — a UDF, not GraphX).
    "q39_textrank_kw" -> ((s, d) =>
      sharedNewsKw(s, d).withColumn("value", round(col("value"), 6))),

    // E2 end-to-end: clique-graph user profiles from clicked documents'
    // texts, dot-product scoring, per-(day,user) ranked lists.
    "q40_textrank_rec" -> ((s, d) => {
      val news = Tables.news(s, d)
      val clicks = Tables.clicks(s, d)
      // scoped persist: the keyword profiles feed multiple plan branches, and
      // the TextRank UDF over every document must not re-run per branch
      val newsKw = graft.runtime.Stage.scopedPersist(
        sharedNewsKw(s, d).join(news.select(col("id"), col("date")), "id"))
      val userTweets = clicks.select(col("userId"), col("newsId"))
        .join(news.select(col("id"), col("content")), col("newsId") === col("id"))
        .select(col("userId"), col("content"))
      val userKw = graft.runtime.Stage.scopedPersist(
        TextRankKeywords.userKeywords(userTweets, scene))
      RecommendPipeline.recommendAll(userKw, newsKw, clicks, scene,
        limit = Some(scene.numRecommendations), scoreRound = Some(6))
        // comma-joined list: the external comparator sorts the output frame
        // and can't lexsort raw array columns
        .withColumn("news", concat_ws(",", col("news")))
    })
  )

  /** Not SQL-expressible (power iteration) — rows-only driver check. */
  val oracle: Map[String, String] = Map.empty
}
