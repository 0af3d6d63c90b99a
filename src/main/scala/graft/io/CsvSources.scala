package graft.io

import graft.model._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.types._

/** Schema-checked CSV loaders for the reference's entity files (SURVEY.md
  * §2.1 S1-S3: `NewsModel.loadNewsDataSet`, `TweetModel.loadSimpleDataSet`,
  * `ClickModel.loadClickDataSet` — impls absent; schemas frozen per
  * FIXTURES.md §a). Explicit schemas, no inference pass — at scale schema
  * inference reads the data twice.
  */
object CsvSources {

  val newsSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("date", DateType),
    StructField("title", StringType),
    StructField("description", StringType),
    StructField("content", StringType)))

  val tweetSchema: StructType = StructType(Seq(
    StructField("userId", LongType),
    StructField("creation_time", DateType),
    StructField("content", StringType)))

  val clickSchema: StructType = StructType(Seq(
    StructField("userId", LongType),
    StructField("newsId", LongType),
    StructField("date", DateType),
    StructField("count", IntegerType)))

  /** S1 — news CSV (TF_IDF.java:64, TextRank.java:58). */
  def loadNews(spark: SparkSession, path: String): Dataset[News] = {
    import spark.implicits._
    spark.read.option("header", "true").schema(newsSchema).csv(path).as[News]
  }

  /** S2 — tweets CSV (TF_IDF.java:93, TextRank.java:80). */
  def loadTweets(spark: SparkSession, path: String): Dataset[Tweet] = {
    import spark.implicits._
    spark.read.option("header", "true").schema(tweetSchema).csv(path).as[Tweet]
  }

  /** S3 — click log CSV, 4-col form (TextRank.java:322, HotTopics.java:34). */
  def loadClicks(spark: SparkSession, path: String): Dataset[Click] = {
    import spark.implicits._
    spark.read.option("header", "true").schema(clickSchema).csv(path).as[Click]
  }
}
