package graft.queries

import graft.io.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-4 surface additions: the SQL dependent-join lane (LATERAL), the
  * record-linkage blocking pattern (edit distance within deterministic
  * blocks), URL decomposition (training-corpus provenance columns), and
  * chained stateful streaming aggregation.
  */
object SurfaceQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // LATERAL correlated subquery with ORDER BY/LIMIT — the dependent-join
    // SQL surface. Catalyst decorrelates the per-row top-3 into a plain
    // join + window ranking (the same plan a hand-written row_number takes)
    // rather than executing per-customer subqueries — the property that
    // makes the syntax usable at all at 100 TB.
    "q224_lateral_topk" -> ((s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("customer_v")
      Tables.orders(s, d).createOrReplaceTempView("orders_v")
      s.sql(
        """SELECT c.c_custkey, t.o_orderkey, t.price
          |FROM customer_v c,
          |LATERAL (SELECT o_orderkey, round(o_totalprice, 2) AS price
          |         FROM orders_v o WHERE o.o_custkey = c.c_custkey
          |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 3) t
          |WHERE c.c_custkey % 100 = 0""".stripMargin)
    }),

    // Record-linkage blocking: candidate pairs meet only inside a
    // deterministic block (shared 8-char prefix), and the expensive exact
    // edit distance runs on candidates only — the fuzzy-dedup sibling of
    // the LSH band join (never all-pairs; the quadratic term is bounded by
    // block size). A production corpus would block on a stronger key
    // (hashed shingle, phonetic code) for skew; the SHAPE — block equi-join
    // then per-pair scoring — is what this pins.
    "q225_fuzzy_block_dedup" -> ((s, d) => {
      val t = Tables.documents(s, d).select(col("doc_id"),
        substring(col("text"), 1, 8).as("blk"),
        substring(col("text"), 1, 40).as("head"))
      val a = t.select(col("blk"), col("doc_id").as("doc_a"), col("head").as("_ha"))
      val b = t.select(col("blk"), col("doc_id").as("doc_b"), col("head").as("_hb"))
      a.join(b, Seq("blk"))
        .filter(col("doc_a") < col("doc_b"))
        .withColumn("dist", levenshtein(col("_ha"), col("_hb")))
        .filter(col("dist") <= 10)
        .select(col("doc_a"), col("doc_b"), col("dist"))
    }),

    // URL decomposition (corpus provenance: host/path/query columns drive
    // per-domain dedup, quality priors, and robots filtering): Spark's
    // codegen'd parse_url over deterministically synthesized URLs; the
    // oracle reconstructs the same components from the source columns.
    "q226_url_parse" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          concat(lit("https://"), col("source"), lit(".example.com/"),
            col("lang"), lit("/doc-"), col("doc_id").cast("string"),
            lit("?ref="), (col("doc_id") % 7).cast("string")).as("url"))
        .select(col("doc_id"),
          parse_url(col("url"), lit("HOST")).as("host"),
          parse_url(col("url"), lit("PATH")).as("path"),
          parse_url(col("url"), lit("QUERY")).as("query"))),

    // Chained stateful streaming: hourly windowed counts -> daily profile
    // of the hourly series, both stateful operators inside one append-mode
    // query (see StreamingAppendAgg.dailyHourlyProfile).
    "q227_stream_chained_agg" -> ((s, d) =>
      graft.streaming.StreamingAppendAgg.dailyHourlyProfile(s, d))
  )

  // ---- DuckDB oracles ----

  val oracle: Map[String, String] = Map(
    "q224_lateral_topk" ->
      """SELECT c.c_custkey, t.o_orderkey, t.price
        |FROM customer c,
        |LATERAL (SELECT o_orderkey, round(o_totalprice, 2) AS price
        |         FROM orders o WHERE o.o_custkey = c.c_custkey
        |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 3) t
        |WHERE c.c_custkey % 100 = 0""".stripMargin,

    "q225_fuzzy_block_dedup" ->
      """WITH t AS (
        |  SELECT doc_id, substr(text, 1, 8) AS blk, substr(text, 1, 40) AS head
        |  FROM documents)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(levenshtein(a.head, b.head) AS INT) AS dist
        |FROM t a JOIN t b ON a.blk = b.blk AND a.doc_id < b.doc_id
        |WHERE levenshtein(a.head, b.head) <= 10""".stripMargin,

    "q226_url_parse" ->
      """SELECT doc_id,
        |  source || '.example.com' AS host,
        |  '/' || lang || '/doc-' || CAST(doc_id AS VARCHAR) AS path,
        |  'ref=' || CAST(doc_id % 7 AS VARCHAR) AS query
        |FROM documents""".stripMargin,

    "q227_stream_chained_agg" ->
      """WITH h AS (
        |  SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hr,
        |    count(*) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, CAST(date_trunc('day', hr) AS DATE) AS day,
        |  CAST(sum(n) AS BIGINT) AS n_events,
        |  count(*) AS n_active_hours,
        |  CAST(max(n) AS BIGINT) AS max_hourly
        |FROM h GROUP BY 1, 2""".stripMargin
  )
}
