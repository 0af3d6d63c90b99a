package graft.queries

import graft.io.Tables
import graft.ops.Ops
import graft.text.{TfIdf, Tokenizer}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis query surface over the `documents` table: tokenization
  * (reference F1), token statistics, quality scoring, exact deduplication,
  * corpus word frequencies, and TF-IDF keyword extraction (reference
  * A5/A6 — the keyword stage of the TF_IDF pipeline, SURVEY.md §2.4/§2.7).
  *
  * All token logic is Column expressions (split/filter/explode — codegen'd,
  * no UDFs) with a semantically identical regexp in the DuckDB oracle.
  */
object TextQueries {
  type Q = (SparkSession, String) => DataFrame

  /** q14's quality-score stopword list — mirrored in
    * tools/shared_constants.json (SharedConstantsSpec).
    */
  private[graft] val stopwords = Seq("the", "a", "of", "and")

  val queries: Map[String, Q] = Map(
    // F1 tokenize + per-doc token stats.
    "q13_token_stats" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("toks", Tokenizer.tokens(col("text")))
        .select(
          col("doc_id"),
          size(col("toks")).as("n_tokens"),
          size(array_distinct(col("toks"))).as("n_distinct"))
    }),

    // Quality scoring: stopword ratio + average token length.
    "q14_quality_score" -> ((s, d) => {
      val stopArr = array(stopwords.map(lit): _*)
      Tables.documents(s, d)
        .withColumn("toks", Tokenizer.tokens(col("text")))
        .select(
          col("doc_id"),
          col("n_chars"),
          round(size(filter(col("toks"), w => array_contains(stopArr, w)))
            .cast("double") / size(col("toks")), 6).as("stopword_ratio"),
          round(aggregate(col("toks"), lit(0L), (acc, w) => acc + length(w))
            .cast("double") / size(col("toks")), 6).as("avg_token_len"))
    }),

    // Exact dedup: hash-groupBy on content (scale path: the groupBy shuffles
    // on the hash, never on the full text; representative = min doc_id).
    "q15_dedup_exact" -> ((s, d) => {
      Tables.documents(s, d)
        .groupBy(md5(col("text").cast("binary")).as("content_hash"))
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("rep_doc"))
    }),

    // Per-language corpus stats.
    "q16_lang_stats" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("n_tokens", size(Tokenizer.tokens(col("text"))))
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          Ops.avgFixedHalfUp(col("n_chars"), 0, 4).as("avg_chars"),
          Ops.avgFixedHalfUp(col("n_tokens"), 0, 4).as("avg_tokens"))
    }),

    // Corpus-wide top-20 word frequencies (tokenize-explode + agg + top-k).
    "q17_word_freq" -> ((s, d) => {
      val counts = Tables.documents(s, d)
        .select(explode(Tokenizer.tokens(col("text"))).as("word"))
        .groupBy("word").agg(count(lit(1)).as("n"))
      Ops.topKPerGroup(counts.withColumn("g", lit(1)), Seq("g"),
        Seq(col("n").desc, col("word").asc), 20)
        .select("word", "n", "rn")
    }),

    // A5/A6: per-document top-5 TF-IDF keywords (fanned out: single-row-group
    // scan must not serialize the tokenize stage onto one core).
    "q18_tfidf_topk" -> ((s, d) => {
      TfIdf.topKeywords(Ops.fanOut(Tables.documents(s, d)), "doc_id",
        Seq(col("text") -> 1.0), k = 5, roundTo = 6)
    }),

    // Deterministic hash-based stratified sampling — the reproducible
    // training-subset pattern: membership is a pure function of the row key
    // (md5 bucket), so the same subset falls out on any engine, any run,
    // any partitioning — unlike rand()-based sampling. Per-language rates.
    "q62_hash_sample" -> ((s, d) => {
      // bucket in [0, 4096) from the first 3 hex digits of md5(doc_id)
      val bucket = conv(substring(md5(col("doc_id").cast("string")), 1, 3), 16, 10)
        .cast("int")
      val rate = when(col("lang") === "en", lit(1024))   // 25%
        .when(col("lang") === "de", lit(2048))           // 50%
        .otherwise(lit(410))                             // ~10%
      Tables.documents(s, d)
        .withColumn("bucket", bucket)
        .filter(col("bucket") < rate)
        .select(col("doc_id"), col("lang"), col("bucket"))
    }),

    // Distributed BPE tokenizer training (graft.text.Bpe): the learned
    // merge table itself — round, pair, merged symbol, pair weight — is
    // the query output, so the TRAINING LOOP is hash-checked end-to-end
    // (argmax selection, tie order, and the leftmost-non-overlapping merge
    // rule all have to agree with the SQL re-derivation to pass).
    "q247_bpe_merges" -> ((s, d) =>
      graft.text.Bpe.merges(s, d, Ops.fanOut(Tables.documents(s, d)),
        col("text"), BpeRounds)),

    // Corpus token counts under the learned k-merge segmentation — the
    // real-subword token budget (q42 upgrades from a fixed ceil(len/4)
    // estimate to the trained tokenizer's actual counts).
    "q248_bpe_vocab" -> ((s, d) =>
      graft.text.Bpe.vocabAfter(s, d, Ops.fanOut(Tables.documents(s, d)),
        col("text"), BpeRounds)),

    // Tokenizer fertility per language: subword tokens emitted per word
    // under the learned segmentation — the per-language cost metric a
    // tokenizer change is judged by. Word→n_sub comes from the shared
    // trained state; the per-language word counts attach by an equi-join
    // on word (vocabulary-sized — broadcastable at any corpus scale).
    "q249_bpe_fertility" -> ((s, d) => {
      val docs = Ops.fanOut(Tables.documents(s, d))
      val langWords = docs
        .select(col("lang"), explode(Tokenizer.tokens(col("text"))).as("word"))
        .groupBy("lang", "word").agg(count(lit(1)).as("lfreq"))
      val wlen = graft.text.Bpe.wordTokenCounts(s, d, docs, col("text"), BpeRounds)
      langWords.join(wlen, "word")
        .groupBy("lang")
        .agg(
          sum(col("lfreq") * col("n_sub")).as("n_tokens"),
          sum(col("lfreq")).as("n_words"),
          Ops.ratioHalfUp(sum(col("lfreq") * col("n_sub")) * lit(1000000L),
            sum(col("lfreq")), 6).as("fertility"))
    }),

    // Token-stream chunk packing (graft.ext.Packing): every doc's position
    // and context-window span in the concatenated pretraining stream,
    // computed with the two-phase distributed prefix sum (order-aligned
    // buckets + broadcast offsets) instead of the single-task global
    // window a naive Window.orderBy would plan.
    "q250_chunk_pack" -> ((s, d) =>
      graft.ext.Packing.pack(packDocs(s, d), ChunkCap)),

    // Per-chunk occupancy of the packed stream: docs touching each window
    // and the token slots they fill (= ChunkCap except the final chunk —
    // the end-to-end packing invariant the oracle re-derives).
    "q251_chunk_summary" -> ((s, d) =>
      graft.ext.Packing.chunkSummary(packDocs(s, d), ChunkCap))
  )

  /** Context-window capacity for the q250/q251 packing lanes —
    * interpolated into the engine call and the oracle SQL.
    */
  private final val ChunkCap = 2048L

  /** (doc_id, n_tok) of every non-empty doc — shared input of the packing
    * lanes (a zero-token doc occupies no chunk; filtered on both sides).
    */
  private def packDocs(s: org.apache.spark.sql.SparkSession, d: String) =
    Ops.fanOut(Tables.documents(s, d))
      .select(col("doc_id"),
        size(Tokenizer.tokens(col("text"))).cast("long").as("n_tok"))
      .filter(col("n_tok") > 0)

  /** Merge rounds for the q247/q248 BPE lanes — interpolated into both the
    * engine call and the oracle CTE chain so the two can't drift.
    */
  private val BpeRounds = 6

  private val toks = "list_filter(regexp_split_to_array(lower(text), '[^a-z]+'), w -> len(w) > 0)"
  private val stopList = stopwords.map(w => s"'$w'").mkString("(", ",", ")")

  /** The k-round BPE training chain as DuckDB CTEs (mirror of
    * [[graft.text.Bpe]]): r0 = char-wrapped vocab, then per round r a
    * pair-count (zipped unnest), a deterministic argmax `b{r}`, and the
    * replace-applied vocab `r{r}`. DuckDB's `replace` shares Java's
    * leftmost-non-overlapping contract, so the merge rule is identical.
    */
  private def bpeCtes(k: Int): String = {
    val head =
      s"""toksrc AS (SELECT lang, unnest($toks) AS word FROM documents),
         |words AS (SELECT word, count(*) AS freq FROM toksrc GROUP BY 1),
         |r0 AS (SELECT word, freq,
         |  '|' || array_to_string(list_append(
         |    list_transform(generate_series(1, length(word)), i -> word[i]),
         |    '</w>'), '||') || '|' AS repr
         |  FROM words)""".stripMargin
    val rounds = (1 to k).map { r =>
      s"""s$r AS (SELECT freq, string_split(trim(repr,'|'), '||') AS syms FROM r${r - 1}),
         |p$r AS (SELECT l AS left_sym, r AS right_sym,
         |    CAST(sum(freq) AS BIGINT) AS weight FROM (
         |    SELECT freq, unnest(syms[1:len(syms)-1]) AS l,
         |      unnest(syms[2:len(syms)]) AS r FROM s$r) z GROUP BY 1, 2),
         |b$r AS (SELECT left_sym, right_sym, weight FROM p$r
         |  ORDER BY weight DESC, left_sym ASC, right_sym ASC LIMIT 1),
         |r$r AS (SELECT word, freq,
         |  replace(repr, '|'||b.left_sym||'||'||b.right_sym||'|',
         |    '|'||b.left_sym||b.right_sym||'|') AS repr
         |  FROM r${r - 1} CROSS JOIN b$r b)""".stripMargin
    }
    (head +: rounds).mkString(",\n")
  }

  val oracle: Map[String, String] = Map(
    "q13_token_stats" ->
      s"""SELECT doc_id, len($toks) AS n_tokens,
         | len(list_distinct($toks)) AS n_distinct
         |FROM documents""".stripMargin,

    "q14_quality_score" ->
      s"""SELECT doc_id, n_chars,
         | round(CAST(len(list_filter($toks, w -> w IN $stopList)) AS DOUBLE)
         |   / len($toks), 6) AS stopword_ratio,
         | round(CAST(list_sum(list_transform($toks, w -> len(w))) AS DOUBLE)
         |   / len($toks), 6) AS avg_token_len
         |FROM documents""".stripMargin,

    "q15_dedup_exact" ->
      """SELECT md5(text) AS content_hash, count(*) AS n_docs,
        | min(doc_id) AS rep_doc
        |FROM documents GROUP BY 1""".stripMargin,

    "q16_lang_stats" ->
      s"""SELECT lang, count(*) AS n_docs,
         | ${SqlFragments.avgFixedSql("n_chars", 0, 4)} AS avg_chars,
         | ${SqlFragments.avgFixedSql(s"len($toks)", 0, 4)} AS avg_tokens
         |FROM documents GROUP BY lang""".stripMargin,

    "q17_word_freq" ->
      s"""SELECT word, n, rn FROM (
         |  SELECT word, n, row_number() OVER (ORDER BY n DESC, word) AS rn
         |  FROM (SELECT word, count(*) AS n FROM
         |        (SELECT unnest($toks) AS word FROM documents) u
         |        GROUP BY word) c) t
         |WHERE rn <= 20""".stripMargin,

    "q18_tfidf_topk" ->
      s"""WITH tokens AS (SELECT doc_id, unnest($toks) AS word FROM documents),
         |tf AS (SELECT doc_id, word, count(*) AS tf FROM tokens GROUP BY 1, 2),
         |dfreq AS (SELECT word, count(*) AS df FROM tf GROUP BY 1),
         |n AS (SELECT count(*) AS n_docs FROM documents),
         |scored AS (
         |  SELECT tf.doc_id, tf.word,
         |    round(tf.tf * ln(n.n_docs / dfreq.df), 6) AS score
         |  FROM tf JOIN dfreq USING (word) CROSS JOIN n)
         |SELECT doc_id, word, score, rn FROM (
         |  SELECT doc_id, word, score,
         |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, word) AS rn
         |  FROM scored) t WHERE rn <= 5""".stripMargin,

    "q62_hash_sample" ->
      """WITH b AS (
        |  SELECT doc_id, lang,
        |    CAST(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 AS INT) * 256
        |    + CAST(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1 AS INT) * 16
        |    + CAST(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1 AS INT) AS bucket
        |  FROM documents)
        |SELECT doc_id, lang, bucket FROM b
        |WHERE bucket < CASE lang WHEN 'en' THEN 1024 WHEN 'de' THEN 2048
        |  ELSE 410 END""".stripMargin,

    "q247_bpe_merges" ->
      s"""WITH ${bpeCtes(BpeRounds)}
         |${(1 to BpeRounds).map(r =>
             s"SELECT $r AS round, left_sym, right_sym, " +
             s"left_sym||right_sym AS merged, weight FROM b$r")
             .mkString("\nUNION ALL ")}""".stripMargin,

    "q248_bpe_vocab" ->
      s"""WITH ${bpeCtes(BpeRounds)}
         |SELECT token, CAST(sum(freq) AS BIGINT) AS n FROM (
         |  SELECT freq, unnest(string_split(trim(repr,'|'), '||')) AS token
         |  FROM r$BpeRounds) t
         |GROUP BY token""".stripMargin,

    "q249_bpe_fertility" ->
      s"""WITH ${bpeCtes(BpeRounds)},
         |langwords AS (SELECT lang, word, count(*) AS lfreq FROM toksrc GROUP BY 1, 2),
         |wlen AS (SELECT word, len(string_split(trim(repr,'|'), '||')) AS n_sub
         |  FROM r$BpeRounds)
         |SELECT lang, CAST(sum(lw.lfreq * wlen.n_sub) AS BIGINT) AS n_tokens,
         |  CAST(sum(lw.lfreq) AS BIGINT) AS n_words,
         |  ${SqlFragments.ratioHalfUpSql(
             "sum(lw.lfreq * wlen.n_sub) * 1000000", "sum(lw.lfreq)", 6)} AS fertility
         |FROM langwords lw JOIN wlen USING (word)
         |GROUP BY lang""".stripMargin,

    "q250_chunk_pack" ->
      s"""WITH ${packCtes}
         |SELECT doc_id, n_tok, CAST(cum - n_tok AS BIGINT) AS tok_start,
         |  CAST((cum - n_tok) // $ChunkCap AS BIGINT) AS first_chunk,
         |  CAST((cum - 1) // $ChunkCap AS BIGINT) AS last_chunk
         |FROM packed""".stripMargin,

    "q251_chunk_summary" ->
      s"""WITH $packCtes,
         |spans AS (SELECT cum, cum - n_tok AS tok_start,
         |    unnest(generate_series((cum - n_tok) // $ChunkCap,
         |                           (cum - 1) // $ChunkCap)) AS chunk_id
         |  FROM packed)
         |SELECT CAST(chunk_id AS BIGINT) AS chunk_id,
         |  count(*) AS n_docs,
         |  CAST(sum(least(cum, (chunk_id + 1) * $ChunkCap)
         |         - greatest(tok_start, chunk_id * $ChunkCap)) AS BIGINT)
         |    AS n_tokens
         |FROM spans GROUP BY chunk_id""".stripMargin
  )

  /** Concat-then-chunk stream coordinates (mirror of
    * [[graft.ext.Packing.pack]]'s arithmetic; the oracle uses DuckDB's
    * single-node window where the engine runs the bucketed scan).
    */
  private def packCtes: String =
    s"""ptoks AS (SELECT doc_id, CAST(len($toks) AS BIGINT) AS n_tok
       |  FROM documents),
       |nz AS (SELECT * FROM ptoks WHERE n_tok > 0),
       |packed AS (SELECT doc_id, n_tok,
       |    CAST(sum(n_tok) OVER (ORDER BY doc_id) AS BIGINT) AS cum
       |  FROM nz)""".stripMargin
}
