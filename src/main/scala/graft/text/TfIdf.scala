package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.Ops

/** TF-IDF keyword extraction (reference A5/A6/F14).
  *
  * The reference's `TermModel.countTFIDF(termDataSet, numDocs)` and
  * `DocumentModel.fromTermDataSet(terms, numKeywords)` are absent from the
  * snapshot (called at /root/reference/TF_IDF.java:66,74,95,97; the term shape
  * "(Term, Tweet ID, Number)" documented at TextRank.java:33-34). The frozen
  * spec here: tf = (field-weighted) term occurrence count within a document,
  * idf = ln(N / df) with df = number of documents containing the term,
  * score = tf * idf.
  *
  * All-DataFrame: tokenize-explode (the engine's Generator case, SURVEY §2.9)
  * → two hash aggregations (per-(doc,term) tf, per-term df) → join. The df
  * side aggregates to ~vocabulary size, so the join back is
  * broadcast-friendly; partial aggregation is automatic. No driver actions —
  * the doc count is computed as a 1-row aggregate and cross-joined so the
  * whole thing stays one lazy plan.
  */
object TfIdf {

  /** Per-(docId, word) weighted term counts from one or more text fields
    * (reference F14 field-weighted term generation, TF_IDF.java:56-84:
    * title/description/content weighted TITLE_WEIGHT/DESCRIPTION_WEIGHT/
    * CONTENT_WEIGHT).
    */
  def termCounts(docs: DataFrame, idCol: String, fields: Seq[(Column, Double)]): DataFrame = {
    val perField = fields.map { case (textCol, weight) =>
      docs.select(col(idCol), explode(Tokenizer.tokens(textCol)).as("word"))
        .groupBy(col(idCol), col("word"))
        .agg((count(lit(1)) * lit(weight)).as("tf"))
    }
    perField.reduce(_ unionAll _)
      .groupBy(col(idCol), col("word"))
      .agg(sum(col("tf")).as("tf"))
  }

  /** tf-idf scores for every (docId, word): columns (idCol, word, tf, df,
    * score). `round` > 0 rounds the score so cross-engine comparisons are
    * exact; pass 0 to keep full precision.
    */
  def scores(docs: DataFrame, idCol: String, fields: Seq[(Column, Double)],
             roundTo: Int = 0): DataFrame = {
    val tf = termCounts(docs, idCol, fields)
    val dfreq = tf.groupBy("word").agg(count(lit(1)).as("df"))
    val n = docs.select(col(idCol)).agg(count(lit(1)).as("n_docs"))
    val raw = tf.join(dfreq, "word")
      .crossJoin(broadcast(n))
      .withColumn("score", col("tf") * log(col("n_docs") / col("df")))
    if (roundTo > 0) raw.withColumn("score", round(col("score"), roundTo)) else raw
  }

  /** Per-document top-k keywords by (score desc, word asc) — the reference's
    * `DocumentModel.fromTermDataSet` (TF_IDF.java:74). Returns
    * (idCol, word, score, rn).
    */
  def topKeywords(docs: DataFrame, idCol: String, fields: Seq[(Column, Double)],
                  k: Int, roundTo: Int = 0): DataFrame =
    Ops.topKPerGroup(
      scores(docs, idCol, fields, roundTo).select(col(idCol), col("word"), col("score")),
      Seq(idCol), Seq(col("score").desc, col("word").asc), k)
}
