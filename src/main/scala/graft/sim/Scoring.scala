package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pair scoring for the user×news recommendation step (reference J2,
  * /root/reference/TextRank.java:258-280, TF_IDF.java:186-206).
  *
  * The reference scores **every** (user-profile, news-doc) pair with a Flink
  * `cross` — O(U·N·K²) similarity evaluations per day. That dies at scale.
  * Both reference similarity measures factor over shared words, so the scale
  * path is the sparse inverted-index decomposition (SURVEY.md §4):
  * explode keywords → equi-join on word → group-sum per (user, news). Pairs
  * with no shared word score 0 and are dropped by the reference's `value > 0`
  * guard (TextRank.java:275) — exactly the pairs the equi-join never
  * produces, so the rewrite is semantics-preserving, not approximate.
  *
  * Shuffle profile: one hash join on `word` (vocabulary-sized keys; hot words
  * are bounded because keyword lists are top-k) + one aggregation on
  * (user, news). No cross product anywhere.
  */
object Scoring {

  /** F5 `calculateX` via inverted index, for the duplicate-free keyword lists
    * the pipelines produce: score = |common| / (|k1|·|k2|) (the reference's
    * product-denominator quirk, CosineSimilarity.java:126).
    *
    * left: (leftId, word) — one row per keyword; right: (rightId, word).
    * Returns (leftId, rightId, score) for pairs with ≥1 shared word.
    */
  def invertedCosineX(left: DataFrame, leftId: String,
                      right: DataFrame, rightId: String): DataFrame = {
    val lsize = left.groupBy(leftId).agg(count(lit(1)).as("_lsize"))
    val rsize = right.groupBy(rightId).agg(count(lit(1)).as("_rsize"))
    left.join(right, "word")
      .groupBy(col(leftId), col(rightId))
      .agg(count(lit(1)).as("_common"))
      .join(lsize, leftId)
      .join(rsize, rightId)
      .withColumn("score",
        col("_common").cast("double") / (col("_lsize") * col("_rsize")))
      .select(col(leftId), col(rightId), col("score"))
  }

  /** F8 sparse dot product via inverted index: score = Σ v_l·v_r over shared
    * words (EuclideanDistance.java:35-40). left: (leftId, word, value);
    * right: (rightId, word, value). The `value > 0` guard is applied by the
    * caller (scores can only be ≤0 if weights are).
    */
  def invertedDot(left: DataFrame, leftId: String,
                  right: DataFrame, rightId: String): DataFrame = {
    val l = left.select(col(leftId), col("word"), col("value").as("_lv"))
    val r = right.select(col(rightId), col("word"), col("value").as("_rv"))
    l.join(r, "word")
      .groupBy(col(leftId), col(rightId))
      .agg(sum(col("_lv") * col("_rv")).as("score"))
  }

  /** WAND-lite posting-list cap: keep only the `cap` highest-value postings
    * per word (value desc, id asc — a total order, so the cut is
    * deterministic and oracle-checkable). The inverted-index join's per-word
    * fan-out is |users with word| × |postings of word|; a stop-word-like
    * term with millions of postings dominates the whole shuffle. Capping
    * bounds every word's contribution to |users| × cap — the
    * frequency-capped-posting-list cut of WAND-family top-k retrieval
    * (Broder et al., CIKM'03), minus the per-query upper-bound traversal
    * (static plans can't adapt mid-scan). APPROXIMATE by contract: pairs
    * whose only shared words were capped away lose that score mass. Opt-in
    * via `postingCap` in [[graft.pipelines.RecommendPipeline]]; the default
    * path never applies it.
    *
    * postings: (idCol, word, value) — one row per (document, keyword).
    */
  def cappedPostings(postings: DataFrame, idCol: String, cap: Int): DataFrame = {
    require(cap > 0, s"posting cap must be positive, got $cap")
    graft.ops.Ops.topKPerGroup(postings, Seq("word"),
        Seq(col("value").desc, col(idCol).asc), cap, rankCol = "_wrn")
      .drop("_wrn")
  }

  /** The faithful all-pairs scorer (reference J2 verbatim): crossJoin +
    * similarity UDF + `score > 0`. Kept for parity testing and for small
    * candidate sets; `sim` maps (leftKeywords, rightKeywords) columns to a
    * score column. left: (leftId, keywords), right: (rightId, keywords).
    */
  def crossScore(left: DataFrame, leftId: String, right: DataFrame, rightId: String,
                 sim: (Column, Column) => Column): DataFrame =
    left.select(col(leftId), col("keywords").as("_lk"))
      .crossJoin(right.select(col(rightId), col("keywords").as("_rk")))
      .withColumn("score", sim(col("_lk"), col("_rk")))
      .filter(col("score") > 0)
      .select(col(leftId), col(rightId), col("score"))
}
