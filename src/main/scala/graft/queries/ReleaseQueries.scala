package graft.queries

import graft.io.Tables
import graft.ops.Ops
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-release audit lanes — the checks a training-data release runs
  * after curation and before shipping (round 9):
  *
  *  - q271 duplicated-span interval audit (Lee et al., ACL 2022 "Deduplicating
  *    Training Data Makes Language Models Better", the ExactSubstr posture):
  *    not just the duplicated-token FRACTION (q253) but the merged maximal
  *    span intervals a span-level dedup would actually cut — span count,
  *    covered tokens, longest run, per document.
  *  - q272 PII scan/redaction card (BigScience ROOTS / Penedo et al. 2023
  *    RefinedWeb both ship this pass): regex detectors for emails, phone
  *    numbers, and IPv4 literals over the corpus, with a per-source count +
  *    redaction-size report. The synthetic corpus carries no PII, so a
  *    deterministic id-derived augmentation plants structural hits at every
  *    scale (the q162 precedent) — the SCAN is the operator under test.
  *  - q275 eval-contamination audit (Brown et al. 2020 §4 + Appendix C, the
  *    GPT-3 methodology): exact token-n-gram containment of the held-out
  *    splits against train — the complement of q268's LSH near-dup leakage
  *    (exact substring overlap catches verbatim quotes LSH-at-0.5 misses).
  *
  * Scale shapes (100 TB): every lane is scan → explode → keyed aggregate /
  * equi-join; windows partition by doc_id only (bounded by document length,
  * never corpus rows); nothing is quadratic in the corpus.
  */
object ReleaseQueries {
  type Q = (SparkSession, String) => DataFrame

  /** q271: span gram width in tokens — q253's [[SemanticQueries.SpanN]]
    * value, so the two span lanes measure the same 5-gram duplication.
    */
  val SpanN = 5

  /** q275: overlap gram width. GPT-3 used 13; 8 keeps the same posture at
    * synthetic document lengths (~30-40 tokens) while staying long enough
    * that a hit means a verbatim run, not a common phrase.
    */
  val OverlapN = 8

  /** q272: detector patterns (shared literally with the DuckDB oracle;
    * basic character classes only, so Java regex and RE2 agree).
    */
  val EmailPat = "[a-z0-9]+@[a-z0-9]+\\.[a-z]+"
  val PhonePat = "555-[0-9]{4}"
  val IpPat = "10\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  /** q272's augmentation strata (which doc ids get which synthetic PII) —
    * mirrored in tools/shared_constants.json (SharedConstantsSpec).
    */
  val EmailMod = 5
  val PhoneMod = 7
  val IpMod = 11

  /** q272's redaction tags (engine + oracle; mirrored in the manifest). */
  val EmailTag = "<EMAIL>"
  val PhoneTag = "<PHONE>"
  val IpTag = "<IP>"

  /** q262's split draw (md5 hex-6 bucket), reused verbatim so the
    * contamination audit and the split manifest agree on every document.
    */
  private def splitCol: Column = {
    val bucket = (conv(substring(md5(col("doc_id").cast("string")), 1, 6),
      16, 10).cast("long") % SplitDraw.Mod.toLong).cast("int")
    when(bucket < SplitDraw.TrainLt, "train")
      .when(bucket < SplitDraw.ValLt, "val").otherwise("test")
  }

  /** q272's deterministic PII augmentation: id-derived email / phone /
    * IPv4 suffixes on fixed id strata (mod 5 / 7 / 11), so hit counts are
    * structural at every SF and reproducible in the oracle.
    */
  private def augmented: Column = concat(col("text"),
    when(col("doc_id") % EmailMod === 0,
      concat(lit(" contact user"), col("doc_id").cast("string"),
        lit("@example.com"))).otherwise(lit("")),
    when(col("doc_id") % PhoneMod === 0,
      concat(lit(" call 555-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
      .otherwise(lit("")),
    when(col("doc_id") % IpMod === 0,
      concat(lit(" from 10."), (col("doc_id") % 256).cast("string"),
        lit("."), ((col("doc_id") * 7) % 256).cast("string"), lit(".1")))
      .otherwise(lit("")))

  def queries: Map[String, Q] = Map(

    // Duplicated-span interval audit: token 5-grams duplicated across ≥2
    // distinct documents mark their start positions; per document, covered
    // intervals [pos, pos+4] merge into maximal spans (adjacent or
    // overlapping runs coalesce) — the spans an ExactSubstr-style cut
    // removes. Scale shape: the gram-multiplicity stage is q253's (explode
    // → two keyed aggregates → equi-join back); the interval merge is a
    // lag/sum window PARTITIONED BY doc_id, so window state is bounded by
    // one document's gram count no matter the corpus size.
    "q271_dup_span_audit" -> ((s, d) => {
      val tk = Ops.fanOut(Tables.documents(s, d))
        .select(col("doc_id"), graft.text.Tokenizer.tokens(col("text")).as("tk"))
        .filter(size(col("tk")) >= SpanN)
      val g = graft.runtime.Stage.scopedPersist(
        tk.select(col("doc_id"),
          explode(expr(s"transform(sequence(1, size(tk) - ${SpanN - 1}), " +
            s"i -> struct(i AS pos, concat_ws(' ', slice(tk, i, $SpanN)) AS ng))"))
            .as("g"))
          .select(col("doc_id"), col("g.pos").as("pos"), col("g.ng").as("ng")))
      val dup = g.select(col("ng"), col("doc_id")).distinct()
        .groupBy(col("ng")).agg(count(lit(1)).as("nd"))
        .filter(col("nd") >= 2).select(col("ng"))
      val starts = g.join(dup, Seq("ng"), "left_semi")
      val wOrd = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val spans = starts
        .withColumn("_prev", lag(col("pos"), 1).over(wOrd))
        .withColumn("_ni",
          when(col("_prev").isNull || col("pos") > col("_prev") + SpanN, 1L)
            .otherwise(0L))
        .withColumn("_isl", sum(col("_ni")).over(wRun))
        .groupBy(col("doc_id"), col("_isl"))
        .agg(min(col("pos")).as("s"), (max(col("pos")) + (SpanN - 1)).as("e"))
      val perDoc = spans.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_spans"),
          sum(col("e") - col("s") + 1).cast("long").as("cov"),
          max(col("e") - col("s") + 1).cast("long").as("longest"))
      tk.select(col("doc_id"), size(col("tk")).cast("long").as("n_tokens"))
        .join(perDoc, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_tokens"),
          coalesce(col("n_spans"), lit(0L)).as("n_spans"),
          coalesce(col("cov"), lit(0L)).as("cov_tokens"),
          coalesce(col("longest"), lit(0L)).as("longest_span"),
          Ops.ratioHalfUp(coalesce(col("cov"), lit(0L)) * 10000,
            col("n_tokens"), 4).as("cov_frac"))
    }),

    // PII scan/redaction card: three regex detectors counted with
    // regexp_extract_all, a chained regexp_replace redaction, and the
    // per-source report (docs scanned, docs with any hit, per-type counts,
    // chars saved by redaction). One corpus scan, all regex work inside
    // codegen, map-side-combinable aggregate to |source| rows — the 100 TB
    // cost is exactly one pass.
    "q272_pii_audit" -> ((s, d) => {
      val aug = augmented
      val red = regexp_replace(
        regexp_replace(regexp_replace(aug, EmailPat, EmailTag),
          PhonePat, PhoneTag), IpPat, IpTag)
      Ops.fanOut(Tables.documents(s, d))
        .select(col("source"),
          size(regexp_extract_all(aug, lit(EmailPat), lit(0)))
            .cast("long").as("_em"),
          size(regexp_extract_all(aug, lit(PhonePat), lit(0)))
            .cast("long").as("_ph"),
          size(regexp_extract_all(aug, lit(IpPat), lit(0)))
            .cast("long").as("_ip"),
          (length(aug) - length(red)).cast("long").as("_delta"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("_em") + col("_ph") + col("_ip") > 0, 1L)
            .otherwise(0L)).as("docs_with_pii"),
          sum(col("_em")).as("n_emails"),
          sum(col("_ph")).as("n_phones"),
          sum(col("_ip")).as("n_ips"),
          sum(col("_delta")).as("chars_redacted"))
    }),

    // Within-document repetition audit (Rae et al. 2021 "Gopher" §A1.1
    // repetition filters, re-expressed on token n-grams): per document,
    // the slot share of the single most frequent 2-gram and 3-gram, the
    // fraction of bigram slots occupied by ANY duplicated bigram, and an
    // exact-integer repetitiveness flag (top 2-gram holding > 1/5 of slots
    // — the Gopher-style cut). Scale shape: every stat is DOC-LOCAL array
    // algebra (the q257 idiom) computed inside the scan projection — the
    // lane is one pass with NO shuffle; per-doc cost is O(len²) in
    // document length, bounded regardless of corpus size.
    "q277_repetition_audit" -> ((s, d) => {
      val tk = Ops.fanOut(Tables.documents(s, d))
        .select(col("doc_id"), graft.text.Tokenizer.tokens(col("text")).as("tk"))
        .filter(size(col("tk")) >= 3)
      val grams = tk.select(col("doc_id"),
        size(col("tk")).cast("long").as("n_tokens"),
        expr("transform(sequence(1, size(tk) - 1), i -> concat_ws(' ', slice(tk, i, 2)))")
          .as("_g2"),
        expr("transform(sequence(1, size(tk) - 2), i -> concat_ws(' ', slice(tk, i, 3)))")
          .as("_g3"))
      grams.select(col("doc_id"), col("n_tokens"),
        size(col("_g2")).cast("long").as("_n2"),
        size(col("_g3")).cast("long").as("_n3"),
        expr("array_max(transform(array_distinct(_g2), g -> size(filter(_g2, x -> x = g))))")
          .cast("long").as("_m2"),
        expr("array_max(transform(array_distinct(_g3), g -> size(filter(_g3, x -> x = g))))")
          .cast("long").as("_m3"),
        expr("aggregate(transform(array_distinct(_g2), g -> size(filter(_g2, x -> x = g)))," +
          " 0L, (a, c) -> a + CASE WHEN c >= 2 THEN CAST(c AS BIGINT) ELSE 0L END)")
          .as("_d2"))
        .select(col("doc_id"), col("n_tokens"),
          Ops.ratioHalfUp(col("_m2") * 10000, col("_n2"), 4).as("top2_share"),
          Ops.ratioHalfUp(col("_m3") * 10000, col("_n3"), 4).as("top3_share"),
          Ops.ratioHalfUp(col("_d2") * 10000, col("_n2"), 4).as("dup2_frac"),
          (col("_m2") * 5 > col("_n2")).as("is_repetitive"))
    }),

    // Eval-contamination audit: distinct token 8-grams per held-out doc
    // probed against the train split's distinct-gram set (the q262 draw).
    // Per split: docs, dirty docs (any verbatim 8-gram seen in train), and
    // the gram-level hit rate. Scale shape: gram explode (q253's), one
    // distinct on the train side, one equi-join on the gram key — the
    // textbook exact-containment join; short docs (< 8 tokens) re-enter
    // via the doc-list left join so n_docs counts the whole split.
    "q275_eval_contamination" -> ((s, d) => {
      val base = Ops.fanOut(Tables.documents(s, d))
        .select(col("doc_id"), splitCol.as("split"),
          graft.text.Tokenizer.tokens(col("text")).as("tk"))
      val g = graft.runtime.Stage.scopedPersist(
        base.filter(size(col("tk")) >= OverlapN)
          .select(col("doc_id"), col("split"),
            explode(expr(s"array_distinct(transform(sequence(1, size(tk) - ${OverlapN - 1}), " +
              s"i -> concat_ws(' ', slice(tk, i, $OverlapN))))")).as("ng")))
      val train = g.filter(col("split") === "train")
        .select(col("ng")).distinct().withColumn("_h", lit(1))
      val perDoc = g.filter(col("split") =!= "train")
        .join(train, Seq("ng"), "left")
        .groupBy(col("doc_id"), col("split"))
        .agg(count(lit(1)).as("ng_total"),
          sum(when(col("_h").isNotNull, 1L).otherwise(0L)).as("ng_hit"))
      base.filter(col("split") =!= "train").select(col("doc_id"), col("split"))
        .join(perDoc, Seq("doc_id", "split"), "left")
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(coalesce(col("ng_hit"), lit(0L)) > 0, 1L).otherwise(0L))
            .as("n_dirty"),
          sum(coalesce(col("ng_total"), lit(0L))).as("n_grams"),
          sum(coalesce(col("ng_hit"), lit(0L))).as("n_hit_grams"))
        .select(col("split"), col("n_docs"), col("n_dirty"),
          Ops.ratioHalfUp(col("n_dirty") * 10000, col("n_docs"), 4)
            .as("dirty_frac"),
          col("n_grams"), col("n_hit_grams"),
          when(col("n_grams") === 0, lit(0.0))
            .otherwise(Ops.ratioHalfUp(col("n_hit_grams") * 10000,
              col("n_grams"), 4)).as("hit_frac"))
    }))

  // ---- DuckDB oracles ----

  private val toks =
    "list_filter(regexp_split_to_array(lower(text), '[^a-z]+'), w -> len(w) > 0)"

  /** First 6 hex digits of md5(doc_id) as BIGINT (the q262/q268 idiom). */
  private val hex6: String = (1 to 6).map { i =>
    s"(CAST(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), $i, 1)) - 1 AS BIGINT) * ${math.pow(16, 6 - i).toLong})"
  }.mkString(" + ")

  // Single physical line: this fragment is interpolated into stripMargin
  // oracles, where a line-leading `||` would be eaten as a margin char.
  private val augSql =
    s"text || CASE WHEN doc_id % $EmailMod = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END" +
      s" || CASE WHEN doc_id % $PhoneMod = 0 THEN ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END" +
      s" || CASE WHEN doc_id % $IpMod = 0 THEN ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.' || CAST((doc_id * 7) % 256 AS VARCHAR) || '.1' ELSE '' END"

  def oracle: Map[String, String] = Map(

    "q271_dup_span_audit" ->
      s"""WITH t AS (SELECT doc_id, $toks AS tk FROM documents),
         |f AS (SELECT doc_id, tk FROM t WHERE len(tk) >= $SpanN),
         |g AS (SELECT doc_id, i AS pos, array_to_string(tk[i:i+${SpanN - 1}], ' ') AS ng
         |  FROM (SELECT doc_id, tk, unnest(range(1, len(tk) - ${SpanN - 2})) AS i FROM f) z),
         |dg AS (SELECT ng FROM (SELECT DISTINCT ng, doc_id FROM g)
         |  GROUP BY ng HAVING count(*) >= 2),
         |st AS (SELECT doc_id, pos FROM g WHERE ng IN (SELECT ng FROM dg)),
         |ni AS (SELECT doc_id, pos,
         |  CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
         |    OR pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + $SpanN
         |    THEN 1 ELSE 0 END AS nw
         |  FROM st),
         |il AS (SELECT doc_id, pos,
         |  sum(nw) OVER (PARTITION BY doc_id ORDER BY pos
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
         |  FROM ni),
         |sp AS (SELECT doc_id, isl, min(pos) AS s, max(pos) + ${SpanN - 1} AS e
         |  FROM il GROUP BY 1, 2),
         |pd AS (SELECT doc_id, count(*) AS n_spans,
         |  CAST(sum(e - s + 1) AS BIGINT) AS cov,
         |  CAST(max(e - s + 1) AS BIGINT) AS longest
         |  FROM sp GROUP BY 1)
         |SELECT f.doc_id, CAST(len(f.tk) AS BIGINT) AS n_tokens,
         |  coalesce(pd.n_spans, 0) AS n_spans,
         |  coalesce(pd.cov, 0) AS cov_tokens,
         |  coalesce(pd.longest, 0) AS longest_span,
         |  ${SqlFragments.ratioHalfUpSql("coalesce(pd.cov, 0) * 10000", "len(f.tk)", 4)}
         |    AS cov_frac
         |FROM f LEFT JOIN pd USING (doc_id)""".stripMargin,

    "q272_pii_audit" ->
      s"""WITH a AS (SELECT source, $augSql AS aug FROM documents),
         |h AS (SELECT source,
         |  CAST(len(regexp_extract_all(aug, '$EmailPat')) AS BIGINT) AS em,
         |  CAST(len(regexp_extract_all(aug, '$PhonePat')) AS BIGINT) AS ph,
         |  CAST(len(regexp_extract_all(aug, '$IpPat')) AS BIGINT) AS ip,
         |  CAST(len(aug) - len(regexp_replace(regexp_replace(regexp_replace(
         |    aug, '$EmailPat', '$EmailTag', 'g'), '$PhonePat', '$PhoneTag', 'g'),
         |    '$IpPat', '$IpTag', 'g')) AS BIGINT) AS delta
         |  FROM a)
         |SELECT source, count(*) AS n_docs,
         |  CAST(count(*) FILTER (WHERE em + ph + ip > 0) AS BIGINT)
         |    AS docs_with_pii,
         |  CAST(sum(em) AS BIGINT) AS n_emails,
         |  CAST(sum(ph) AS BIGINT) AS n_phones,
         |  CAST(sum(ip) AS BIGINT) AS n_ips,
         |  CAST(sum(delta) AS BIGINT) AS chars_redacted
         |FROM h GROUP BY 1""".stripMargin,

    "q277_repetition_audit" ->
      s"""WITH t AS (SELECT doc_id, $toks AS tk FROM documents),
         |f AS (SELECT doc_id, tk FROM t WHERE len(tk) >= 3),
         |g AS (
         |  SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tokens,
         |    list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1]) AS g2,
         |    list_transform(range(1, len(tk) - 1),
         |      i -> array_to_string(tk[i:i+2], ' ')) AS g3
         |  FROM f),
         |m AS (
         |  SELECT doc_id, n_tokens,
         |    CAST(len(g2) AS BIGINT) AS n2, CAST(len(g3) AS BIGINT) AS n3,
         |    list_max(list_transform(list_distinct(g2),
         |      g -> len(list_filter(g2, x -> x = g)))) AS m2,
         |    list_max(list_transform(list_distinct(g3),
         |      g -> len(list_filter(g3, x -> x = g)))) AS m3,
         |    list_sum(list_transform(list_distinct(g2),
         |      g -> CASE WHEN len(list_filter(g2, x -> x = g)) >= 2
         |        THEN len(list_filter(g2, x -> x = g)) ELSE 0 END)) AS d2
         |  FROM g)
         |SELECT doc_id, n_tokens,
         |  ${SqlFragments.ratioHalfUpSql("m2 * 10000", "n2", 4)} AS top2_share,
         |  ${SqlFragments.ratioHalfUpSql("m3 * 10000", "n3", 4)} AS top3_share,
         |  ${SqlFragments.ratioHalfUpSql("d2 * 10000", "n2", 4)} AS dup2_frac,
         |  m2 * 5 > n2 AS is_repetitive
         |FROM m""".stripMargin,

    "q275_eval_contamination" ->
      s"""WITH t AS (SELECT doc_id, $toks AS tk FROM documents),
         |b AS (SELECT doc_id, tk, ($hex6) % ${SplitDraw.Mod} AS bk FROM t),
         |s AS (SELECT doc_id, tk,
         |  CASE WHEN bk < ${SplitDraw.TrainLt} THEN 'train'
         |    WHEN bk < ${SplitDraw.ValLt} THEN 'val'
         |    ELSE 'test' END AS split FROM b),
         |g AS (SELECT DISTINCT doc_id, split, array_to_string(tk[i:i+${OverlapN - 1}], ' ') AS ng
         |  FROM (SELECT doc_id, split, tk, unnest(range(1, len(tk) - ${OverlapN - 2})) AS i
         |        FROM s WHERE len(tk) >= $OverlapN) z),
         |tr AS (SELECT DISTINCT ng FROM g WHERE split = 'train'),
         |pd AS (SELECT doc_id, split, count(*) AS ng_total,
         |  count(*) FILTER (WHERE ng IN (SELECT ng FROM tr)) AS ng_hit
         |  FROM g WHERE split <> 'train' GROUP BY 1, 2),
         |ev AS (SELECT doc_id, split FROM s WHERE split <> 'train')
         |SELECT ev.split, count(*) AS n_docs,
         |  CAST(count(*) FILTER (WHERE coalesce(pd.ng_hit, 0) > 0) AS BIGINT)
         |    AS n_dirty,
         |  ${SqlFragments.ratioHalfUpSql(
             "count(*) FILTER (WHERE coalesce(pd.ng_hit, 0) > 0) * 10000",
             "count(*)", 4)} AS dirty_frac,
         |  CAST(sum(coalesce(pd.ng_total, 0)) AS BIGINT) AS n_grams,
         |  CAST(sum(coalesce(pd.ng_hit, 0)) AS BIGINT) AS n_hit_grams,
         |  CASE WHEN sum(coalesce(pd.ng_total, 0)) = 0 THEN CAST(0.0 AS DOUBLE)
         |    ELSE ${SqlFragments.ratioHalfUpSql(
               "sum(coalesce(pd.ng_hit, 0)) * 10000",
               "sum(coalesce(pd.ng_total, 0))", 4)}
         |  END AS hit_frac
         |FROM ev LEFT JOIN pd ON pd.doc_id = ev.doc_id AND pd.split = ev.split
         |GROUP BY 1""".stripMargin)
}
