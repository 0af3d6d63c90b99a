package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Schema-checked readers for the driver-generated star schema
  * (TESTDATA.md) plus the reference-shaped entity views derived from it.
  *
  * Reference loaders S1-S4 (SURVEY.md §2.1): the reference reads fixed-schema
  * CSV into POJOs (`NewsModel.loadNewsDataSet`, /root/reference/TF_IDF.java:64);
  * here the storage format is parquet and the schema travels with the file, so
  * readers are thin. Column pruning + predicate pushdown reach the parquet scan
  * because everything downstream stays in Column expressions.
  */
object Tables {

  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** The driver's `events.ts` layout has changed across rounds: parquet
    * TIMESTAMP(NANOS) — which Spark only reads as a raw long under
    * spark.sql.legacy.parquet.nanosAsLong=true — through round 5, plain µs
    * TIMESTAMP_NTZ from round 6. Normalize both to a µs TimestampType here
    * so every downstream query sees the same `ts` type regardless of
    * layout, matching what the DuckDB oracle sees (DuckDB truncates ns→µs
    * natively and reads NTZ µs as its plain TIMESTAMP).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // integral DIV, not `/`: Column `/` is double division, and epoch
        // NANOS (~1.7e18) exceed double's 2^53 integer range — the float
        // round-trip lands ±1µs off and breaks exact-timestamp oracles
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case _: org.apache.spark.sql.types.TimestampNTZType =>
        // wall-clock-preserving ONLY under the session's pinned UTC zone
        // (the cast reinterprets the wall clock in the session zone); a
        // consumer that forgot the pin must fail loudly here, not read
        // silently shifted timestamps. Keeps unix_micros & friends (which
        // reject NTZ) working unchanged.
        require(
          s.conf.get("spark.sql.session.timeZone", "") == "UTC",
          "events.ts normalization requires spark.sql.session.timeZone=UTC; " +
            s"session has '${s.conf.get("spark.sql.session.timeZone", "<unset>")}'")
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** The reference's click log (ClickModel, /root/reference/HotTopics.java:34;
    * schema FIXTURES.md) mapped onto the `events` table: a click event's
    * payload id is folded onto the 500-document id space. Deterministic and
    * expressible identically in the DuckDB oracle.
    */
  def clicks(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .filter(col("event_type") === "click")
      .select(
        col("user_id").as("userId"),
        (col("event_id") % 500).as("newsId"),
        to_date(col("ts")).as("date"),
        lit(1).as("count"))

  /** The reference's news table (NewsModel, FIXTURES.md) mapped onto
    * `documents`: publication date synthesized deterministically from doc_id
    * onto the same 30-day window the events span.
    */
  def news(s: SparkSession, d: String): DataFrame =
    documents(s, d).select(
      col("doc_id").as("id"),
      date_add(lit(java.sql.Date.valueOf("2024-01-01")), (col("doc_id") % 30).cast("int")).as("date"),
      col("text").as("content"),
      col("lang"),
      col("source"))
}
