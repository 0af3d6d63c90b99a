package graft.queries

import graft.io.Tables
import graft.ops.Ops
import graft.runtime.Stage
import graft.text.Tokenizer
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation surface: the document-filtering operators an LLM
  * training-data pipeline runs between raw crawl and tokenizer — corpus-level
  * boilerplate detection, benchmark decontamination, token-entropy quality,
  * temperature-scaled language rebalancing (the mT5/UniMax mixing rule),
  * robust winsorization with a scale-exact two-pass quantile, and the
  * multi-stage curation funnel report. Every query is DuckDB-oracled with
  * identical aliases/rounding on both sides (md5-only hash family for any
  * deterministic sampling decision).
  */
object CurationQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Shingle width for boilerplate detection (q93). */
  private val SHINGLE = 8
  /** n-gram width for benchmark-overlap decontamination (q94). */
  private val GRAM = 5
  /** A doc is "benchmark" iff doc_id % BENCH_MOD == 0 (deterministic stand-in
    * for an eval-set manifest).
    */
  private val BENCH_MOD = 97

  /** Distinct w-token shingles per document, exploded to one row per
    * (doc_id, shingle). `array_distinct` BEFORE the explode keeps the
    * per-doc fan-out bounded by distinct shingles (repetitive docs would
    * otherwise explode quadratically at 100 TB).
    */
  private def shingleRows(s: SparkSession, d: String, w: Int): DataFrame =
    Ops.fanOut(Tables.documents(s, d))
      .select(col("doc_id"), Tokenizer.tokens(col("text")).as("tk"))
      .filter(size(col("tk")) >= w)
      .select(col("doc_id"),
        explode(array_distinct(transform(
          sequence(lit(0), size(col("tk")) - w),
          i => array_join(slice(col("tk"), i + 1, lit(w)), " ")))).as("sh"))

  val queries: Map[String, Q] = Map(

    // Corpus-level boilerplate share: a shingle that appears in >= 3
    // distinct documents is "boilerplate" (headers, license blurbs, nav
    // chrome); each doc reports what fraction of its shingles are common.
    // Plan: one explode, one groupBy(sh) for document frequency, one
    // shuffle join back on sh, one groupBy(doc_id) — no self-join. The df
    // table is NOT broadcast: at corpus scale the common-shingle set is
    // unbounded, so the join must stay a shuffle hash/SMJ on the shingle
    // key.
    "q93_boilerplate" -> ((s, d) => {
      val sh = Stage.scopedPersist(shingleRows(s, d, SHINGLE))
      val dfreq = sh.groupBy("sh").agg(count(lit(1)).as("df"))
      sh.join(dfreq, "sh")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_shingles"),
          sum(when(col("df") >= 3, 1L).otherwise(0L)).as("n_common"))
        .select(col("doc_id"), col("n_shingles"), col("n_common"),
          round(col("n_common").cast("double") / col("n_shingles"), 6)
            .as("boiler_share"))
    }),

    // Benchmark decontamination: the n-gram-overlap test every training
    // corpus runs against its eval sets. The benchmark gram set is small
    // by construction (eval sets are ~thousands of docs vs billions), so
    // it broadcasts — the corpus side is touched once, map-side, and only
    // the per-doc counters shuffle.
    "q94_decontam" -> ((s, d) => {
      val grams = Stage.scopedPersist(shingleRows(s, d, GRAM))
      val bench = grams.filter(col("doc_id") % BENCH_MOD === 0)
        .select(col("sh")).distinct()
        .withColumn("hit", lit(1L))
      grams.filter(col("doc_id") % BENCH_MOD =!= 0)
        .join(broadcast(bench), Seq("sh"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_grams"),
          sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
        .select(col("doc_id"), col("n_grams"), col("n_hit"),
          round(col("n_hit").cast("double") / col("n_grams"), 6).as("overlap"))
        .withColumn("contaminated", col("overlap") >= 0.05)
    }),

    // Token-entropy quality signal: H = ln n - (Σ c·ln c)/n over the doc's
    // unigram counts, plus H normalized by its maximum ln(n_distinct).
    // Low-entropy docs are keyboard-mash / repeated-token spam. Two
    // shuffles, both on doc-local keys; per-doc state never exceeds the
    // doc's vocabulary.
    "q95_token_entropy" -> ((s, d) => {
      val counts = Ops.fanOut(Tables.documents(s, d))
        .select(col("doc_id"), explode(Tokenizer.tokens(col("text"))).as("w"))
        .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
      val h = log(col("n").cast("double")) - col("clc") / col("n")
      counts.groupBy("doc_id")
        .agg(sum(col("c")).as("n"), count(lit(1)).as("n_distinct"),
          sum(col("c").cast("double") * log(col("c").cast("double"))).as("clc"))
        .select(col("doc_id"), col("n").as("n_tokens"), col("n_distinct"),
          round(h, 6).as("entropy"),
          round(when(col("n_distinct") > 1,
            h / log(col("n_distinct").cast("double"))).otherwise(0.0), 6)
            .as("norm_entropy"))
    }),

    // Temperature-scaled language rebalancing (mT5 α=0.5 / UniMax-style):
    // sample language l at rate ∝ p_l^α so head languages shrink and tail
    // languages keep everything, targeting half the corpus. With α=0.5 the
    // target share reduces to sqrt(n_l)/Σ sqrt(n_l). The per-language rate
    // table is a handful of rows — broadcast — and the keep/drop decision
    // is a deterministic md5 bucket per doc, so the "sample" is
    // reproducible across reruns and engines (no rand()).
    "q96_lang_mix" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val c = docs.groupBy("lang").agg(count(lit(1)).as("n_l"))
      // round(s_w, 6): double-sum order is nondeterministic across engines
      // (and across Spark partial-agg merges); rounding before use makes
      // floor(rate*4096) bit-stable.
      val tot = c.agg(sum(col("n_l")).cast("double").as("n_tot"),
        round(sum(sqrt(col("n_l").cast("double"))), 6).as("s_w"))
      val rate = least(lit(1.0),
        sqrt(col("n_l").cast("double")) / col("s_w") * (col("n_tot") / 2.0)
          / col("n_l"))
      val caps = c.crossJoin(broadcast(tot))
        .select(col("lang"), col("n_l"),
          floor(rate * 4096).cast("int").as("cap"))
      val bucket = conv(substring(md5(col("doc_id").cast("string")), 1, 3), 16, 10)
        .cast("int")
      docs.join(broadcast(caps), "lang")
        .groupBy("lang")
        .agg(max(col("n_l")).as("n_before"),
          round(max(col("cap")).cast("double") / 4096.0, 6).as("rate"),
          sum(when(bucket < col("cap"), 1L).otherwise(0L)).as("n_after"),
          sum(when(bucket < col("cap"), col("n_chars")).otherwise(0L))
            .as("kept_chars"))
    }),

    // Winsorized robust stats with an EXACT global quantile computed the
    // scale-safe way: pass 1 bins prices into ~coarse value buckets and
    // counts them (tiny aggregate), the target bucket for rank k comes from
    // a cumulative sum over that tiny table, pass 2 sorts ONLY inside the
    // target bucket (TakeOrderedAndProject over a sliver of the data). No
    // global sort, no 1%-of-100TB top-k on the driver — the q57
    // window-rank trick would single-partition here because the frame is
    // global, hence this two-pass form.
    "q97_winsorize" -> ((s, d) => {
      val prices = Stage.scopedPersist(
        Tables.orders(s, d).select(col("o_orderstatus"),
          round(col("o_totalprice"), 2).as("p")))
      // N rides the bin-table collect (exactRanksWithTotal) — no separate
      // count() job; both boundary ranks resolve in the same two passes.
      val (n, ranks) = exactRanksWithTotal(prices,
        n => Seq(math.ceil(0.01 * n).toLong, math.ceil(0.99 * n).toLong))
      val p01 = ranks(math.ceil(0.01 * n).toLong)
      val p99 = ranks(math.ceil(0.99 * n).toLong)
      val clipped = least(greatest(col("p"), lit(p01)), lit(p99))
      prices.groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_orders"),
          Ops.avgFixedHalfUp(col("p"), 2, 2).as("avg_raw"),
          Ops.avgFixedHalfUp(clipped, 2, 2).as("avg_wins"),
          sum(when(col("p") < p01, 1L).otherwise(0L)).as("n_low"),
          sum(when(col("p") > p99, 1L).otherwise(0L)).as("n_high"))
    }),

    // Heavy-hitter vocabulary via Count-Min Sketch + exact rescore — the
    // sketch pattern q77 applies to blooms, applied to counts: one
    // sketch-building pass (driver-merged, no shuffle), then the exact
    // groupBy touches ONLY words the sketch already flags as candidates.
    // CMS never under-estimates, so candidates ⊇ true heavy hitters and
    // the closing exact filter makes the output exact — the sketch's only
    // job is to shrink the shuffle. At 100 TB the full-vocabulary groupBy
    // shuffles billions of (word, n) partials; the pruned one shuffles the
    // heavy tail only.
    "q103_cms_heavy" -> ((s, d) => {
      val words = Stage.scopedPersist(
        Ops.fanOut(Tables.documents(s, d))
          .select(explode(Tokenizer.tokens(col("text"))).as("word")))
      // broadcast, not closure capture: the sketch is ~10⁵ counters and the
      // filter runs in every scan task — a torrent broadcast ships it once
      // per executor instead of once per task closure
      val cms = s.sparkContext.broadcast(
        words.stat.countMinSketch(col("word"), 0.0005, 0.99, 42))
      // the sketch already counts every added row, so the total rides the
      // sketch pass instead of a standalone count() job over the corpus
      val total = cms.value.totalCount
      // ceil(total/500) in integer math — double 0.002·total would round
      // differently from DuckDB's DECIMAL arithmetic near integers
      val threshold = (total + 499L) / 500L
      val mightBeHeavy = udf((w: String) => cms.value.estimateCount(w) >= threshold)
      words.filter(mightBeHeavy(col("word")))
        .groupBy("word").agg(count(lit(1)).as("n"))
        .filter(col("n") >= threshold)
    }),

    // Curation funnel: the per-stage survivor report a pipeline operator
    // reads before shipping a corpus — stage 0 raw, 1 length gate, 2
    // distinct-token gate, 3 entropy gate, applied cumulatively. One pass
    // computes every per-doc metric, each doc explodes into one row per
    // stage it survives, and a single groupBy yields the funnel. Gates
    // compare on round(·,6) so the stage assignment is engine-stable.
    "q99_funnel" -> ((s, d) => {
      val m = Ops.fanOut(Tables.documents(s, d))
        .select(col("doc_id"), col("n_chars"),
          Tokenizer.tokens(col("text")).as("tk"))
        .select(col("doc_id"), col("n_chars"), size(col("tk")).as("n_tok"),
          round(size(array_distinct(col("tk"))).cast("double") / size(col("tk")), 6)
            .as("uniq_ratio"))
      val reach = when(!(col("n_chars") >= 200 && col("n_chars") <= 20000), 0)
        .when(!(col("uniq_ratio") >= 0.3), 1)
        .when(!(col("n_tok") >= 50), 2)
        .otherwise(3)
      m.withColumn("reach", reach)
        .select(col("n_chars"), explode(sequence(lit(0), col("reach"))).as("stage"))
        .groupBy("stage")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
    }))

  /** Exact k-th smallest of `prices.p` without a global sort: coarse value
    * bins (width 1000) → tiny count table → cumulative rank locates the one
    * bin containing rank k → sort-limit within that bin only. Each driver
    * action touches either the tiny bin table or one bin's rows.
    */
  private[graft] def exactRankK(prices: DataFrame, k: Long): Double =
    exactRanks(prices, Seq(k))(k)

  /** Multi-rank form: the bin/cumulative table is built and collected ONCE
    * (it is |value range|/1000 rows — driver-safe by construction), then ALL
    * requested ranks resolve in ONE further job: rows of the ≤|ks| target
    * bins are rank-windowed per bin (each bin is a sliver, the window never
    * sees the full table) and the (bin, in-bin-rank) hits are collected.
    * Two jobs total for any number of ranks — the q104 decile case would
    * otherwise pay one sort-limit job per boundary.
    */
  /** Driver-safety bound on the collected bin table: the bin count is a
    * property of the DATA's value range (|range|/1000), not of the code, so
    * a wide-domain input could otherwise OOM the driver silently. ~1e6 bins
    * ≈ 24 MB of rows — loud failure far below driver-heap danger.
    */
  private[graft] val MaxBins = 1000000

  private[graft] def exactRanks(prices: DataFrame, ks: Seq[Long],
                                maxBins: Int = MaxBins): Map[Long, Double] =
    exactRanksWithTotal(prices, _ => ks, maxBins)._2

  /** Total-aware form: rank positions that depend on the row count N
    * (quantiles k = ceil(q·N)) are derived from the SAME collected bin
    * table that locates them — N is Σ bin counts, so no separate `count()`
    * job precedes the two-pass machinery. `ksOf` receives N and returns the
    * rank positions, keeping each caller's exact rank arithmetic.
    */
  private[graft] def exactRanksWithTotal(prices: DataFrame, ksOf: Long => Seq[Long],
                                         maxBins: Int = MaxBins): (Long, Map[Long, Double]) = {
    // limit(maxBins+1) bounds the collect itself (no unbounded driver
    // transfer even on a pathological domain); one extra row is enough to
    // detect overflow and fail loudly instead of OOMing.
    val bins = prices.groupBy(floor(col("p") / 1000).cast("long").as("bin"))
      .agg(count(lit(1)).as("c"))
      .orderBy(col("bin"))
      .limit(maxBins + 1)
      .collect()
    require(bins.length <= maxBins,
      s"exactRanks: value domain spans more than $maxBins bins of width " +
        "1000 — widen the bin width for this domain instead of collecting")
    val cum = bins.scanLeft(0L)(_ + _.getLong(1)).tail
    val total = cum.lastOption.getOrElse(0L)
    val ks = ksOf(total)
    val targets = ks.distinct.map { k =>
      val i = cum.indexWhere(_ >= k)
      require(i >= 0, s"rank $k exceeds row count ${cum.lastOption.getOrElse(0L)}")
      (k, bins(i).getLong(0), k - (cum(i) - bins(i).getLong(1))) // in-bin rank
    }
    val w = Window.partitionBy(col("bin")).orderBy(col("p"))
    val hits = prices
      .withColumn("bin", floor(col("p") / 1000).cast("long"))
      .filter(col("bin").isin(targets.map(_._2).distinct: _*))
      .withColumn("rn", row_number().over(w))
      .filter(targets.map { case (_, b, r) =>
        col("bin") === b && col("rn") === r
      }.reduce(_ || _))
      .select(col("bin"), col("rn"), col("p"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong) -> r.getDouble(2)).toMap
    (total, targets.map { case (k, b, r) => k -> hits((b, r)) }.toMap)
  }

  private val toks =
    "list_filter(regexp_split_to_array(lower(text), '[^a-z]+'), w -> len(w) > 0)"

  /** DuckDB twin of [[shingleRows]]. */
  private def shCte(w: Int): String =
    s"""t AS (SELECT doc_id, $toks AS tk FROM documents),
       |sh0 AS (
       |  SELECT doc_id, unnest(list_transform(range(1, len(tk) - ${w - 2}),
       |    i -> array_to_string(tk[i:i+${w - 1}], ' '))) AS sh
       |  FROM t WHERE len(tk) >= $w),
       |sh AS (SELECT DISTINCT doc_id, sh FROM sh0)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q93_boilerplate" ->
      s"""WITH ${shCte(SHINGLE)},
         |dfq AS (SELECT sh, count(*) AS df FROM sh GROUP BY 1)
         |SELECT doc_id, count(*) AS n_shingles,
         |  CAST(count(*) FILTER (WHERE df >= 3) AS BIGINT) AS n_common,
         |  round(CAST(count(*) FILTER (WHERE df >= 3) AS DOUBLE) / count(*), 6)
         |    AS boiler_share
         |FROM sh JOIN dfq USING (sh) GROUP BY 1""".stripMargin,

    "q94_decontam" ->
      s"""WITH ${shCte(GRAM)},
         |bench AS (SELECT DISTINCT sh FROM sh WHERE doc_id % $BENCH_MOD = 0),
         |o AS (
         |  SELECT s.doc_id, count(*) AS n_grams,
         |    CAST(count(b.sh) AS BIGINT) AS n_hit
         |  FROM sh s LEFT JOIN bench b USING (sh)
         |  WHERE s.doc_id % $BENCH_MOD <> 0
         |  GROUP BY 1)
         |SELECT doc_id, n_grams, n_hit,
         |  round(CAST(n_hit AS DOUBLE) / n_grams, 6) AS overlap,
         |  round(CAST(n_hit AS DOUBLE) / n_grams, 6) >= 0.05 AS contaminated
         |FROM o""".stripMargin,

    "q95_token_entropy" ->
      s"""WITH tw AS (
         |  SELECT doc_id, unnest($toks) AS w FROM documents),
         |c AS (SELECT doc_id, w, count(*) AS c FROM tw GROUP BY 1, 2),
         |a AS (
         |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,
         |    count(*) AS n_distinct,
         |    sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) AS clc
         |  FROM c GROUP BY 1)
         |SELECT doc_id, n AS n_tokens, n_distinct,
         |  round(ln(CAST(n AS DOUBLE)) - clc / n, 6) AS entropy,
         |  round(CASE WHEN n_distinct > 1
         |    THEN (ln(CAST(n AS DOUBLE)) - clc / n) / ln(CAST(n_distinct AS DOUBLE))
         |    ELSE 0.0 END, 6) AS norm_entropy
         |FROM a""".stripMargin,

    "q96_lang_mix" ->
      """WITH c AS (SELECT lang, count(*) AS n_l FROM documents GROUP BY 1),
        |t AS (SELECT CAST(sum(n_l) AS DOUBLE) AS n_tot,
        |        round(sum(sqrt(CAST(n_l AS DOUBLE))), 6) AS s_w FROM c),
        |caps AS (
        |  SELECT lang, n_l, CAST(floor(least(1.0,
        |    sqrt(CAST(n_l AS DOUBLE)) / s_w * (n_tot / 2.0) / n_l) * 4096) AS INT)
        |    AS cap
        |  FROM c, t),
        |b AS (
        |  SELECT lang, n_chars,
        |    CAST(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 AS INT) * 256
        |    + CAST(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1 AS INT) * 16
        |    + CAST(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1 AS INT) AS bucket
        |  FROM documents)
        |SELECT b.lang, max(caps.n_l) AS n_before,
        |  round(CAST(max(cap) AS DOUBLE) / 4096.0, 6) AS rate,
        |  CAST(count(*) FILTER (WHERE bucket < cap) AS BIGINT) AS n_after,
        |  CAST(coalesce(sum(n_chars) FILTER (WHERE bucket < cap), 0) AS BIGINT)
        |    AS kept_chars
        |FROM b JOIN caps ON b.lang = caps.lang
        |GROUP BY 1""".stripMargin,

    "q97_winsorize" ->
      s"""WITH b AS (
        |  SELECT o_orderstatus, round(o_totalprice, 2) AS p FROM orders),
        |r AS (
        |  SELECT p, row_number() OVER (ORDER BY p) AS rn,
        |    count(*) OVER () AS n
        |  FROM b),
        |q AS (
        |  SELECT
        |    max(CASE WHEN rn = CAST(ceil(0.01 * n) AS BIGINT) THEN p END) AS p01,
        |    max(CASE WHEN rn = CAST(ceil(0.99 * n) AS BIGINT) THEN p END) AS p99
        |  FROM r)
        |SELECT o_orderstatus, count(*) AS n_orders,
        |  ${SqlFragments.avgFixedSql("p", 2, 2)} AS avg_raw,
        |  ${SqlFragments.avgFixedSql("least(greatest(p, p01), p99)", 2, 2)} AS avg_wins,
        |  CAST(count(*) FILTER (WHERE p < p01) AS BIGINT) AS n_low,
        |  CAST(count(*) FILTER (WHERE p > p99) AS BIGINT) AS n_high
        |FROM b, q GROUP BY 1""".stripMargin,

    "q103_cms_heavy" ->
      s"""WITH w AS (SELECT unnest($toks) AS word FROM documents),
         |t AS (SELECT (count(*) + 499) // 500 AS th FROM w)
         |SELECT word, count(*) AS n
         |FROM w, t GROUP BY word, t.th HAVING count(*) >= t.th""".stripMargin,

    "q99_funnel" ->
      s"""WITH m AS (
         |  SELECT doc_id, n_chars, len($toks) AS n_tok,
         |    round(CAST(len(list_distinct($toks)) AS DOUBLE)
         |      / len($toks), 6) AS uniq_ratio
         |  FROM documents),
         |r AS (
         |  SELECT n_chars,
         |    CASE WHEN NOT (n_chars >= 200 AND n_chars <= 20000) THEN 0
         |         WHEN NOT (uniq_ratio >= 0.3) THEN 1
         |         WHEN NOT (n_tok >= 50) THEN 2
         |         ELSE 3 END AS reach
         |  FROM m),
         |e AS (SELECT n_chars, unnest(range(0, reach + 1)) AS stage FROM r)
         |SELECT CAST(stage AS INT) AS stage, count(*) AS n_docs,
         |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
         |FROM e GROUP BY 1""".stripMargin)
}
