package graft

import graft.ext.{Ann, Dedup}
import graft.model.{Scene, SimilarityAlgorithm}
import graft.pipelines.{HotTopicsPipeline, PrecisionEval, RecommendPipeline}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Date

/** Degenerate-input behavior: pipelines must return empty results (never
  * throw) on empty/out-of-range inputs — the shapes a real scheduler feeds
  * them at partition boundaries.
  */
class EdgeCaseSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val emptyClicks = spark.createDataFrame(
    spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
    StructType(Seq(
      StructField("userId", LongType), StructField("newsId", LongType),
      StructField("date", DateType), StructField("count", IntegerType))))

  private val scene = Scene(numDays = 2, fromDate = Date.valueOf("2024-01-01"),
    toDate = Date.valueOf("2024-01-05"), numRecommendations = 3)

  test("HotTopics on zero clicks: empty, no failure") {
    assert(HotTopicsPipeline.topicsPerDay(emptyClicks, scene).count() === 0)
    assert(HotTopicsPipeline.recommendAll(emptyClicks, scene).count() === 0)
  }

  test("HotTopics with all clicks outside the scene range: empty") {
    val clicks = Seq((1L, 10L, Date.valueOf("2023-06-01"), 1))
      .toDF("userId", "newsId", "date", "count")
    assert(HotTopicsPipeline.topicsPerDay(clicks, scene).count() === 0)
  }

  test("recommendAll with no active users / empty profiles: empty") {
    val userKw = Seq.empty[(Long, String, Double)].toDF("userId", "word", "value")
    val newsKw = Seq((10L, Date.valueOf("2024-01-02"), "w", 1.0))
      .toDF("id", "date", "word", "value")
    val sc = scene.copy(similarityAlgorithm = SimilarityAlgorithm.EuclideanDistance)
    assert(RecommendPipeline.recommendAll(userKw, newsKw, emptyClicks, sc, Some(3)).count() === 0)
  }

  test("PrecisionEval with empty recommendations: empty") {
    val recs = Seq.empty[(Long, Date, Seq[Long])].toDF("userId", "date", "news")
    assert(PrecisionEval.precisions(recs, emptyClicks).count() === 0)
  }

  test("dedup on texts shorter than the shingle size: empty signatures, jaccard well-defined") {
    val docs = Seq((1L, "one two"), (2L, "x")).toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(docs, "doc_id", col("text"), 3, 8).collect()
    assert(sigs.length === 2)
    sigs.foreach(r => assert(r.isNullAt(1))) // no shingles -> null sig
    val j = Dedup.jaccard(Seq((1L, 2L)).toDF("doc_a", "doc_b"), docs, "doc_id", col("text"), 3)
    // both shingle sets empty -> pair drops out of the size join (no rows)
    assert(j.count() === 0)
  }

  test("ANN with empty query side: empty") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    assert(Ann.bruteForceTopK(e.filter($"vec_id" < 0), e.limit(10), 3).count() === 0)
  }
}
