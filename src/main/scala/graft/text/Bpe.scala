package graft.text

import graft.runtime.Stage
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding tokenizer training (Sennrich et al.,
  * ACL'16 "Neural Machine Translation of Rare Words with Subword Units")
  * over the corpus word-frequency table — the learned-subword upgrade of
  * the fixed BPE-ish token estimate in q42 (ExtQueries).
  *
  * Scale shape: the corpus is touched exactly once (tokenize → explode →
  * word-frequency agg); every merge round after that runs over the
  * VOCABULARY, which is bounded by the language, not the corpus — a 100 TB
  * crawl and a 100 GB crawl have word tables within an order of magnitude.
  * Each round is
  *   adjacent-pair count (vocab rows × avg word length, map-side explode) →
  *   1-row argmax (`orderBy.limit(1)` — a global top-1, partial-aggregated) →
  *   merge applied map-side via string replace.
  * The winning pair reaches the merge step as a `broadcast(limit(1))` cross
  * join, never a driver collect, so the whole K-round chain stays one
  * declarative plan; each round's vocabulary frame persists via
  * [[Stage.scopedPersist]] to keep lineage linear (round r feeds both the
  * argmax and the next round's replace — without the persist the plan
  * recomputes round r−1 twice per round, exponential in K).
  *
  * Symbol sequences are carried as a pipe-wrapped string, e.g. "hello" →
  * `|h||e||l||l||o||</w>|`: an adjacent pair (a,b) is the substring
  * `|a||b|`, and Java's leftmost-non-overlapping `replace` IS the BPE merge
  * rule ("aaa" under merge (a,a) → [aa, a]). DuckDB's `replace` has the
  * same left-to-right non-overlapping contract, which is what makes the
  * whole training loop hash-checkable against a SQL oracle. Tokens are
  * [a-z]+ ([[Tokenizer.tokens]]), so the `|` delimiter and the `</w>`
  * end-of-word marker cannot collide with symbol content.
  */
object Bpe {

  val EndOfWord = "</w>"

  /** Corpus (word, freq) with the initial per-character representation. */
  private def initVocab(docs: DataFrame, textCol: Column): DataFrame =
    docs.select(explode(Tokenizer.tokens(textCol)).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .withColumn("repr",
        concat(lit("|"),
          array_join(concat(
            filter(split(col("word"), ""), c => length(c) > 0),
            array(lit(EndOfWord))), "||"),
          lit("|")))

  /** Symbols of a wrapped representation string, as array<string>. */
  private def symbols(repr: Column): Column =
    split(btrim(repr, lit("|")), "\\|\\|")

  /** Adjacent-pair weights over the current vocabulary representations:
    * (left_sym, right_sym, weight = Σ word freq per occurrence).
    */
  private def pairWeights(vocab: DataFrame): DataFrame = {
    val syms = symbols(col("repr"))
    vocab
      .select(col("freq"), explode(zip_with(
        slice(syms, lit(1), size(syms) - 1),
        slice(syms, lit(2), size(syms) - 1),
        (a, b) => struct(a.as("l"), b.as("r")))).as("_p"))
      .groupBy(col("_p.l").as("left_sym"), col("_p.r").as("right_sym"))
      .agg(sum("freq").as("weight"))
  }

  /** Train `k` merges; returns the merge table and the final vocabulary
    * representations: ((round, left_sym, right_sym, merged, weight),
    * (word, freq, repr)).
    *
    * Like every iterative lane (PageRank, connected components), the
    * loop-carried vocabulary frame is lineage-cut per round via
    * [[graft.runtime.Reroot]] — NOT `Stage.scopedPersist`: the trained
    * state outlives the building query (q247/q248/q249 share it), and a
    * shared persisted frame whose lineage references scoped caches loses
    * its buffers when the next query scope unpersists them (Spark's
    * non-cascading unpersist invalidates-and-lazily-rebuilds dependent
    * cache entries), silently re-running the whole K-round chain —
    * measured 6.7 s → 35 s per re-read at sf1. An eager checkpoint has no
    * plan-cache dependencies to invalidate, and also keeps the lineage one
    * round deep instead of K rounds (the usual exponential-recompute
    * guard). The per-round `best` frames stay on the base strategy (they
    * are the merge-table output, live past the loop); the vocabulary rolls
    * (round r's cut supersedes r−1's).
    */
  private def train(docs: DataFrame, textCol: Column, k: Int): (DataFrame, DataFrame) = {
    require(k > 0, s"merge rounds must be positive, got $k")
    val reroot = graft.runtime.Reroot.fromEnv()
    val roll = graft.runtime.Reroot.rolling(reroot)
    var vocab = roll(initVocab(docs, textCol))
    val rounds = scala.collection.mutable.ListBuffer[DataFrame]()
    var r = 1
    var exhausted = false
    while (r <= k && !exhausted) {
      // Global argmax with a total order (weight desc, pair asc) — the
      // selection is deterministic, so the LEARNED TOKENIZER itself is
      // oracle-checkable, not just its statistics.
      val best = reroot(
        pairWeights(vocab)
          .orderBy(col("weight").desc, col("left_sym").asc, col("right_sym").asc)
          .limit(1))
      // A fully-merged vocabulary (every word one symbol) has no adjacent
      // pairs left: best is EMPTY, and crossJoining it through would
      // annihilate the vocab frame — every downstream lane would return a
      // silently-empty answer. Real BPE training stops here instead; the
      // merge table then carries r−1 < k rounds. isEmpty on the
      // just-checkpointed 1-row frame is a cheap local scan.
      if (best.isEmpty) {
        exhausted = true
      } else {
        vocab = roll(
          vocab.crossJoin(broadcast(best))
            .withColumn("repr", replace(col("repr"),
              concat(lit("|"), col("left_sym"), lit("||"), col("right_sym"), lit("|")),
              concat(lit("|"), col("left_sym"), col("right_sym"), lit("|"))))
            .select("word", "freq", "repr"))
        rounds += best.withColumn("round", lit(r))
      }
      r += 1
    }
    require(rounds.nonEmpty,
      "BPE training found no adjacent symbol pairs in round 1 — every word " +
        "is already a single symbol; a merge table cannot be learned from " +
        "this corpus")
    val merges = rounds.reduce(_.unionByName(_))
      .select(col("round"), col("left_sym"), col("right_sym"),
        concat(col("left_sym"), col("right_sym")).as("merged"), col("weight"))
    (merges, vocab)
  }

  /** [[train]] memoized per (session, corpus key, k) via [[Stage.shared]] —
    * the BPE lanes (q247/q248/q249) all read the same trained state,
    * exactly as the reference pipelines re-read their materialized keyword
    * files. No extra persist: both outputs read from the training run's
    * eager checkpoints (the merge table is a union of K one-row
    * checkpointed frames, the vocabulary IS the final checkpoint).
    */
  private def trainShared(s: SparkSession, key: String, docs: DataFrame,
                          textCol: Column, k: Int): (DataFrame, DataFrame) =
    Stage.shared(s, s"bpe:$key:$k") {
      train(docs, textCol, k)
    }

  /** The learned merge table: (round, left_sym, right_sym, merged, weight)
    * for rounds 1..k. `corpusKey` scopes the shared trained state (use the
    * dataset dir).
    */
  def merges(s: SparkSession, corpusKey: String, docs: DataFrame,
             textCol: Column, k: Int): DataFrame =
    trainShared(s, corpusKey, docs, textCol, k)._1

  /** Corpus token counts under the k-merge segmentation: (token, n) where n
    * counts every occurrence (word multiplicity × corpus frequency) — the
    * real-token-budget twin of q42's fixed estimate.
    */
  def vocabAfter(s: SparkSession, corpusKey: String, docs: DataFrame,
                 textCol: Column, k: Int): DataFrame = {
    val (_, vocab) = trainShared(s, corpusKey, docs, textCol, k)
    vocab.select(col("freq"), explode(symbols(col("repr"))).as("token"))
      .groupBy("token").agg(sum("freq").as("n"))
  }

  /** Per-word subword-token counts under the k-merge segmentation:
    * (word, n_sub) — the join side for fertility/compression metrics.
    */
  def wordTokenCounts(s: SparkSession, corpusKey: String, docs: DataFrame,
                      textCol: Column, k: Int): DataFrame = {
    val (_, vocab) = trainShared(s, corpusKey, docs, textCol, k)
    vocab.select(col("word"), size(symbols(col("repr"))).as("n_sub"))
  }
}
