package graft.queries

import graft.io.Tables
import graft.ops.Ops
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 LLM-curation additions: the three published data-pipeline
  * operators the surface did not yet cover as first-class lanes —
  *
  *  - q252 SemDeDup (Abbas et al., 2023): semantic dedup as
  *    cluster-then-prune — k-means-style assignment bounds the candidate
  *    set to within-cluster pairs, so embedding dedup never goes all-pairs.
  *  - q253 cross-document duplicated-span fraction (Lee et al., ACL 2022
  *    "Deduplicating Training Data Makes Language Models Better"): the
  *    per-document fraction of token n-grams that also occur in another
  *    document — the metric that decides span-level (vs document-level)
  *    dedup.
  *  - q254 DSIR importance weights (Xie et al., NeurIPS 2023): hashed
  *    n-gram importance reweighting of a raw corpus toward a target
  *    distribution — the data-selection score, computed without a
  *    vocabulary (feature space is a fixed hash range).
  *
  * plus the curation-pipeline MATERIALIZATION steps that turn the
  * report-style lanes into actual corpus transforms:
  *
  *  - q255 mixture-sample materialization: q230's per-source target
  *    weights applied as deterministic per-doc replication counts
  *    (floor(w) copies + an md5-keyed Bernoulli(frac) copy — reproducible
  *    sampling, no RNG state).
  *  - q256 token-balanced shard manifest: global rank by token count via
  *    [[graft.ext.Packing.globalRank]]'s two-phase distributed scan,
  *    dealt snake-wise into [[Shards]] near-equal shards — the
  *    training-export layout step.
  *  - q257 quality-rule attrition funnel: the Gopher-style rule battery
  *    applied in fixed order, reporting per-rule first-failure kills and
  *    running survivors (where does the corpus go?).
  *
  * Round 8 adds the corpus-statistics and training-prep lanes: q260
  * bigram-LM quality scoring (Wenzek et al. 2020), q261 PMI
  * collocations, q262 deterministic stratified split manifest, q264
  * UniMax language-budget allocation (Chung et al., ICLR 2023), q265
  * the vocabulary coverage curve (Gowda & May 2020), and q266
  * boundary-preserving pair packing (Krell et al. 2021 posture).
  *
  * All lanes are oracle-paired; arithmetic follows the standing
  * conventions (double-cast ordered folds, round-6 floats, tie-free
  * ratios via [[Ops.ratioHalfUp]], integer cross-multiplied thresholds
  * inside filters).
  */
object SemanticQueries {
  type Q = (SparkSession, String) => DataFrame

  /** q252: seed-centroid floor (vectors vec_id < K). K must GROW with N
    * (SemDeDup's own posture — Abbas et al. 2023 use K ≈ N/10k) or the
    * within-cluster pair count goes quadratic: the sf10 stress tier caught
    * the old fixed K=8 at 162× cost for 10× data (648 s — 25k-vector
    * clusters → 2.5 G pairs). The effective K is
    * max(SemDedupK, ceil(N / SemDedupPerCluster)), computed in-plan from
    * one count and mirrored exactly in the oracle: average cluster size is
    * then ≤ SemDedupPerCluster, so pair work is ≤ N·PerCluster/2 — LINEAR
    * in the corpus. PerCluster = 2500 reproduces K=8 bit-identically at
    * every gate scale and at sf1 (N ≤ 20k), so nothing pinned moves.
    */
  val SemDedupK = 8
  val SemDedupPerCluster = 2500L

  /** q252: cosine threshold above which the higher-id vector of a
    * within-cluster pair is pruned (compared on the round-6 value, both
    * engines).
    */
  val SemDedupTau = 0.30

  /** q253: span length in tokens. 5 gives a ~10% duplicated fraction on
    * the synthetic corpus at every SF — large enough to be a "span", small
    * enough that duplication exists.
    */
  val SpanN = 5

  /** q254: hashed feature space size (md5-derived, engine-portable). */
  val DsirBuckets = 256

  /** q261: minimum pair count for a collocation candidate (PMI is
    * unstable below ~5 observations — the standard floor).
    */
  val PmiMinCount = 5

  /** q261: collocations returned (global top-k by rounded PMI). */
  val PmiTopK = 20

  /** q255: upsampling ceiling in weight-micros (3× — the practical bound
    * the q230 weight report caps at; shared with the oracle).
    */
  val MixCapMicros = 3000000L

  /** q256: number of output shards in the training-export manifest. */
  val Shards = 16

  /** q264: UniMax per-language epoch ceiling (Chung et al., ICLR 2023 use
    * small integer caps; 3 keeps upsampling bounded).
    */
  val UnimaxMaxEpochs = 3L

  /** q264: token budget as a multiple of the corpus total (2× — enough
    * headroom that small languages hit the epoch cap while the head
    * language stays under one pass, exercising both allocator branches).
    */
  val UnimaxBudgetX = 2L

  /** q265: coverage targets in basis points (50% / 75% / 90% / 99%). */
  val CoverageTargetsBp: Seq[Int] = Seq(5000, 7500, 9000, 9900)

  /** q266: pair-packing context window in tokens. Chosen just above twice
    * the corpus median document length, so complement pairing mostly fits
    * but the longest-doc pairs overflow — both packer branches are live at
    * every SF.
    */
  val PackPairCap = 110L

  /** q256: doc_id sub-bucket width of the order-aligned rank buckets
    * (docs sharing one n_tok value split into ≤-width window partitions).
    */
  val RankBucketWidth = 4096L

  /** q257: the rule battery, in application order — (name, kill reason).
    * Thresholds are integer cross-multiplications so both engines compare
    * exact integers (no ratio rounding inside a filter).
    */
  /** The q257/q276 quality-signal stopword probe list — mirrored in
    * tools/shared_constants.json (SharedConstantsSpec) because the
    * independent Python checkers re-type it.
    */
  private[graft] val SignalStopwords = Seq("the", "and", "of", "to", "in", "a", "is")

  val FunnelRules: Seq[String] = Seq(
    "word_count", "mean_word_len", "top_token_share", "uniq_ratio", "stopword_hit")

  def queries: Map[String, Q] = Map(

    // SemDeDup: embeddings → one deterministic centroid assignment (seeds =
    // the first K vectors; L2 distances rounded 6 before the argmin, ties
    // to the lower centroid id — the q151 ranking convention) → within each
    // cluster, every pair (va < vb) with round-6 cosine ≥ τ prunes vb.
    // Scale shape: centroids always ride a broadcast (K rows); points
    // shuffle ONCE on the cluster id for the pair join; norms are computed
    // per-vector BEFORE the pair join (the Ann.bruteForceTopK rule — the
    // naive form re-derives each norm cluster-size times inside the pair
    // loop). The quadratic term is |cluster|², bounded by construction
    // because K = max(SemDedupK, ceil(N/SemDedupPerCluster)) scales with N
    // (the K row rides a one-row broadcast cross into the seed filter) —
    // the whole point of cluster-then-prune over all-pairs embedding
    // dedup. The pair-loop arithmetic is the native
    // codegen float dot (VectorExpressions — (double)a·(double)b in array
    // order, bit-identical to the lambda fold over pre-cast doubles but a
    // tight primitive loop): at sf1 the lambda form spent 33.5 s in the
    // ~25M-pair scan, the native form 2.4 s (hash-identical output).
    "q252_semantic_dedup" -> ((s, d) => {
      import graft.functions.VectorExpressions.{floatVecDot, floatVecNormSq}
      val e = graft.runtime.Stage.scopedPersist(
        Tables.embeddings(s, d).select(col("vec_id"), col("embedding")))
      val kRow = e.agg(greatest(lit(SemDedupK.toLong),
        expr(s"(count(1) + ${SemDedupPerCluster - 1}) div $SemDedupPerCluster"))
        .as("_k"))
      val seeds = e.crossJoin(broadcast(kRow))
        .filter(col("vec_id") < col("_k"))
        .select(col("vec_id").cast("int").as("cl"),
          expr("transform(embedding, a -> CAST(a AS DOUBLE))").as("cx"))
      val d2 = expr(
        """aggregate(zip_with(embedding, cx,
          |  (p, q) -> (CAST(p AS DOUBLE) - q) * (CAST(p AS DOUBLE) - q)),
          |  CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)""".stripMargin)
      val assigned = graft.runtime.Stage.scopedPersist(
        e.crossJoin(broadcast(seeds))
          .withColumn("d2", round(d2, 6))
          .withColumn("rn", row_number().over(
            Window.partitionBy("vec_id").orderBy(col("d2").asc, col("cl").asc)))
          .filter(col("rn") === 1)
          .select(col("vec_id"), col("embedding"), col("cl"),
            sqrt(floatVecNormSq(col("embedding"))).as("nrm")))
      val a = assigned.select(col("cl"), col("vec_id").as("va"),
        col("embedding").as("xa"), col("nrm").as("na"))
      val b = assigned.select(col("cl"), col("vec_id").as("vb"),
        col("embedding").as("xb"), col("nrm").as("nb"))
      val pruned = a.join(b, Seq("cl"))
        .filter(col("va") < col("vb"))
        .withColumn("cos", round(floatVecDot(col("xa"), col("xb"))
          / (col("na") * col("nb")), 6))
        .filter(col("cos") >= SemDedupTau)
        .select(col("vb").as("vec_id")).distinct()
      assigned.select(col("vec_id"), col("cl").as("cluster"))
        .join(pruned.withColumn("_p", lit(1)), Seq("vec_id"), "left")
        .select(col("vec_id"), col("cluster"),
          col("_p").isNull.as("is_kept"))
    }),

    // Duplicated-span fraction: per document, the share of its token
    // 5-grams that occur in ≥ 2 distinct documents. The n-gram table is
    // ONE corpus scan; per-doc multiplicities are collapsed first (the
    // q123 rule — every later exchange moves distinct (doc, ngram) rows
    // weighted by k, not raw occurrences), which also makes the "≥ 2
    // distinct docs" test a plain count(*) on the collapsed table — no
    // count-distinct shuffle. The dup set joins back on the n-gram string
    // (shuffle hash join on both sides' natural key); the fraction is the
    // tie-free 4-decimal ratio.
    "q253_dup_spans" -> ((s, d) => {
      val tk = Ops.fanOut(Tables.documents(s, d))
        .select(col("doc_id"), graft.text.Tokenizer.tokens(col("text")).as("tk"))
        .filter(size(col("tk")) >= SpanN)
      val g = graft.runtime.Stage.scopedPersist(
        tk.select(col("doc_id"), explode(expr(
          s"transform(sequence(1, size(tk) - ${SpanN - 1}), i -> concat_ws(' ', slice(tk, i, $SpanN)))"))
          .as("ng"))
          .groupBy(col("doc_id"), col("ng"))
          .agg(count(lit(1)).as("k")))
      val dup = g.groupBy(col("ng")).agg(count(lit(1)).as("nd"))
        .filter(col("nd") >= 2).select(col("ng"), lit(1).as("_d"))
      g.join(dup, Seq("ng"), "left")
        .groupBy(col("doc_id"))
        .agg(sum(col("k")).as("n_ngrams"),
          sum(when(col("_d").isNotNull, col("k")).otherwise(lit(0L))).as("n_dup"))
        .withColumn("dup_frac",
          Ops.ratioHalfUp(col("n_dup") * 10000, col("n_ngrams"), 4))
    }),

    // DSIR importance weights: features are token bigrams hashed into a
    // fixed 256-bucket space (md5-derived — no vocabulary, no fit step);
    // the target distribution is the English slice, the raw distribution
    // the whole corpus; each document scores the k-weighted average
    // log-ratio of add-1-smoothed bucket probabilities. Scale shape: the
    // corpus is tokenized ONCE into per-doc bucket multiplicities; both
    // global distributions aggregate that same frame down to ≤ 256 rows
    // and ride broadcasts back onto it (the q123 pattern — the totals Nt /
    // Nr travel as a one-row broadcast cross, never a driver action).
    "q254_dsir_weights" -> ((s, d) => {
      val tk = Ops.fanOut(Tables.documents(s, d))
        .select(col("doc_id"), col("lang"),
          graft.text.Tokenizer.tokens(col("text")).as("tk"))
        .filter(size(col("tk")) >= 2)
      val dk = graft.runtime.Stage.scopedPersist(
        tk.select(col("doc_id"), (col("lang") === "en").as("is_t"),
          explode(expr(
            "transform(sequence(1, size(tk) - 1), i -> concat_ws(' ', slice(tk, i, 2)))"))
            .as("b"))
          .withColumn("bucket",
            (conv(substring(md5(col("b")), 1, 3), 16, 10) % DsirBuckets).cast("int"))
          .groupBy(col("doc_id"), col("is_t"), col("bucket"))
          .agg(count(lit(1)).as("k")))
      val perBucket = dk.groupBy(col("bucket"))
        .agg(sum(when(col("is_t"), col("k")).otherwise(lit(0L))).as("ct"),
          sum(col("k")).as("cr"))
      val totals = perBucket
        .agg(sum(col("ct")).cast("double").as("_nt"),
          sum(col("cr")).cast("double").as("_nr"))
      dk.join(broadcast(perBucket), Seq("bucket"))
        .crossJoin(broadcast(totals))
        .select(col("doc_id"), col("k"),
          (col("k") * log(((col("ct") + 1).cast("double") / (col("_nt") + DsirBuckets))
            / ((col("cr") + 1).cast("double") / (col("_nr") + DsirBuckets)))).as("lw"))
        .groupBy(col("doc_id"))
        .agg(sum(col("k")).as("n_bigrams"),
          round(sum(col("lw")) / sum(col("k")), 6).as("avg_log_ratio"))
    }),

    // Mixture materialization: the step AFTER q230's weight report — apply
    // the per-source target weight to every document as a deterministic
    // replication count: floor(w) guaranteed copies plus one Bernoulli(frac)
    // copy decided by a doc-keyed md5 draw, so the sampled corpus is
    // reproducible row-for-row across engines and re-runs (no RNG state).
    // All arithmetic is exact integers: the weight is half-up micros via
    // the (2a+b) div 2b identity over raw counts (never a rounded-double
    // chain), the draw is md5's first 6 hex digits mod 1e6. Scale shape:
    // the weight table is ≤|sources| rows and rides a broadcast; the
    // per-doc work is map-side — the lane adds NO shuffle beyond the tiny
    // source-count aggregate.
    "q255_mix_sample" -> ((s, d) => {
      val wAll = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      val srcIdx = regexp_extract(col("source"), "([0-9]+)$", 1).cast("long")
      val weights = Tables.documents(s, d)
        .groupBy(col("source")).agg(count(lit(1)).as("n"))
        // Loud on a suffix-less source name: the failed extract casts to
        // null, which least() would silently skip — assigning the MAX
        // (capped) weight to exactly the source whose weight is underived.
        // The guard runs on the ≤|sources|-row aggregate, not per doc.
        .withColumn("_i", when(srcIdx.isNotNull, srcIdx).otherwise(raise_error(
          concat(lit("q255: source '"), col("source"),
            lit("' has no trailing digits; mixture weights derive from " +
              "the numeric source suffix")))))
        .withColumn("wu", least(
          Ops.ratioHalfUp((col("_i") + 1) * sum(col("n")).over(wAll) * 1000000L,
            sum(col("_i") + 1).over(wAll) * col("n"), 0).cast("long"),
          lit(MixCapMicros)))
        .select(col("source"), col("wu"))
      Ops.fanOut(Tables.documents(s, d)).select(col("doc_id"), col("source"))
        .join(broadcast(weights), "source")
        .withColumn("_draw",
          conv(substring(md5(col("doc_id").cast("string")), 1, 6), 16, 10)
            .cast("long") % 1000000L)
        .select(col("doc_id"), col("source"),
          (expr("wu div 1000000") +
            (col("_draw") < col("wu") % 1000000L).cast("long")).as("n_rep"))
    }),

    // Token-balanced shard manifest — the training-export step: documents
    // ranked globally by token count (longest first, doc_id tiebreak) and
    // dealt snake-wise (boustrophedon) across the shards, so each shard's
    // token total is near-equal without any driver-side packing loop. The
    // global rank is Packing.globalRank's two-phase distributed scan with
    // composite order-aligned buckets (−n_tok, doc_id div W): parallel
    // across buckets, bounded per window partition — never the single-task
    // Window.orderBy a naive global row_number plans. Manifest output is
    // |shards| rows of exact integers.
    "q256_shard_manifest" -> ((s, d) => {
      // (doc_id, n_tok) is 16 bytes/row; caching it means the corpus is
      // scanned+tokenized ONCE — globalRank's count leg and rank leg both
      // read the cached frame instead of re-running the map work.
      val docs = graft.runtime.Stage.scopedPersist(
        Ops.fanOut(Tables.documents(s, d))
          .select(col("doc_id"),
            size(graft.text.Tokenizer.tokens(col("text"))).cast("long").as("n_tok")))
      val ranked = graft.ext.Packing.globalRank(docs,
        buckets = Seq(-col("n_tok"), expr(s"doc_id div $RankBucketWidth")),
        order = Seq(col("n_tok").desc, col("doc_id").asc),
        rankCol = "_rank")
      ranked
        .withColumn("_pass", expr(s"(_rank - 1) div $Shards"))
        .withColumn("_pos", (col("_rank") - 1) % Shards)
        .withColumn("shard",
          when(col("_pass") % 2 === 0, col("_pos"))
            .otherwise(lit(Shards - 1) - col("_pos")).cast("int"))
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
          max(col("n_tok")).as("max_tok"), min(col("n_tok")).as("min_tok"))
    }),

    // Quality-rule attrition funnel: the rule battery applied in a fixed
    // order, reported as WHERE the corpus is lost — per rule, the count of
    // documents whose FIRST failure is that rule, and the running survivor
    // count. One corpus scan computes every flag (all integer
    // cross-multiplied thresholds — no ratio rounding inside a filter);
    // the funnel itself is a ≤6-row aggregate joined onto a literal rule
    // table so zero-kill rules still report. The cumulative subtraction
    // runs on that tiny frame — the window never touches doc rows.
    "q257_rule_funnel" -> ((s, d) => {
      val tk = Ops.fanOut(Tables.documents(s, d))
        .select(graft.text.Tokenizer.tokens(col("text")).as("tk"))
      val m = tk.select(
        size(col("tk")).cast("long").as("n"),
        expr("aggregate(tk, 0L, (a, w) -> a + length(w))").as("sl"),
        expr("array_max(transform(array_distinct(tk), w -> size(filter(tk, t -> t = w))))")
          .cast("long").as("topk"),
        size(array_distinct(col("tk"))).cast("long").as("uq"),
        size(array_intersect(array_distinct(col("tk")),
          array(SignalStopwords.map(lit): _*)))
          .cast("long").as("ns"))
      val ff = graft.runtime.Stage.scopedPersist(m.select(
        when(!col("n").between(20L, 90L), 1)
          .when(col("sl") * 100 < col("n") * 425, 2)
          .when(col("topk") * 10 > col("n"), 3)
          .when(col("uq") * 10 < col("n") * 4, 4)
          .when(col("ns") < 1, 5)
          .otherwise(0).as("ff"))
        .groupBy(col("ff")).agg(count(lit(1)).as("c")))
      val total = ff.agg(sum(col("c")).as("_tot"))
      val rules = m.sparkSession.range(1, FunnelRules.size + 1L)
        .select(col("id").cast("int").as("rule"))
        .withColumn("rule_name",
          element_at(array(FunnelRules.map(lit): _*), col("rule")))
      val wCum = Window.orderBy("rule")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      rules.join(ff, col("rule") === col("ff"), "left")
        .withColumn("n_killed", coalesce(col("c"), lit(0L)))
        .crossJoin(broadcast(total))
        .withColumn("n_surviving",
          col("_tot") - sum(col("n_killed")).over(wCum))
        .select(col("rule"), col("rule_name"), col("n_killed"), col("n_surviving"))
    }),

    // Per-document quality-signals frame (round 9; the RedPajama-V2
    // posture — Together 2023 ship a "quality signals" parquet next to the
    // corpus so downstream teams filter without re-deriving signals): one
    // wide row per scoreable document joining the q257 rule inputs
    // (uniqueness, word length, top-token share, stopword hit) with the
    // q260 bigram-LM score. Scale shape: every rule stat is DOC-LOCAL
    // array algebra inside the scan projection (no shuffle at all); the
    // only shuffles are q260's vocabulary-bounded model joins plus one
    // doc_id equi-join to attach avg_nll — the frame is materialized in
    // one pass over the corpus plus the shared bigram stages.
    "q276_quality_signals" -> ((s, d) => {
      val base = Ops.fanOut(Tables.documents(s, d))
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
          graft.text.Tokenizer.tokens(col("text")).as("tk"))
        .filter(size(col("tk")) >= 2)
      val stats = base.select(col("doc_id"), col("lang"), col("source"),
        col("n_chars"), size(col("tk")).cast("long").as("n_tokens"),
        expr("aggregate(tk, 0L, (a, w) -> a + length(w))").as("_sl"),
        expr("array_max(transform(array_distinct(tk), w -> size(filter(tk, t -> t = w))))")
          .cast("long").as("_topk"),
        size(array_distinct(col("tk"))).cast("long").as("_uq"),
        (size(array_intersect(array_distinct(col("tk")),
          array(SignalStopwords.map(lit): _*)))
          >= 1).as("stopword_hit"))
      stats
        .join(bigramNllScores(s, d).select(col("doc_id"), col("avg_nll")),
          Seq("doc_id"))
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
          col("n_tokens"),
          Ops.ratioHalfUp(col("_uq") * 10000, col("n_tokens"), 4)
            .as("uniq_ratio"),
          Ops.ratioHalfUp(col("_sl") * 10000, col("n_tokens"), 4)
            .as("mean_word_len"),
          Ops.ratioHalfUp(col("_topk") * 10000, col("n_tokens"), 4)
            .as("top_token_share"),
          col("stopword_hit"), col("avg_nll"))
    }),

    // Bigram-LM quality scoring (the CCNet posture, Wenzek et al. LREC
    // 2020: score text by an n-gram LM's perplexity and filter the tail):
    // train an add-1-smoothed bigram model ON the corpus in one pass, then
    // score every document by its average negative log-likelihood under
    // that model — high avg_nll = out-of-distribution text. Scale shape:
    // the "model" is two keyed aggregates of the same per-doc bigram frame
    // (bigram counts, vocab²-bounded; start counts, vocab-bounded) joined
    // back by key — no driver-side vocabulary, no fit/transform asymmetry,
    // both map-side combinable; the smoothing constant |V| rides a one-row
    // broadcast cross. The count tables are corpus-derived but vocabulary-
    // bounded, so they do NOT grow with corpus size — at 100 TB the joins
    // stay hash joins on bounded build sides.
    "q260_bigram_lm" -> ((s, d) => bigramNllScores(s, d)),

    // Collocation extraction by pointwise mutual information:
    // PMI(w1,w2) = ln(p(w1,w2) / (p(w1)·p(w2))) over corpus bigram and
    // unigram counts, floored at PmiMinCount observations, global top-k.
    // Ranking follows the repo's tie-free convention — ordered on the
    // ROUNDED pmi with (w1, w2) as the deterministic tie-break. Scale
    // shape: two keyed aggregates of one tokenized pass, two
    // vocab-bounded joins, totals on a one-row broadcast cross; the
    // top-k is a TakeOrdered (per-partition heaps), never a global sort.
    "q261_pmi_collocations" -> ((s, d) => {
      val toks = graft.runtime.Stage.scopedPersist(
        Ops.fanOut(Tables.documents(s, d))
          .select(graft.text.Tokenizer.tokens(col("text")).as("tk"))
          .filter(size(col("tk")) >= 2))
      val uni = toks.select(explode(col("tk")).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("c"))
      val bi = toks.select(explode(expr(
        "transform(sequence(1, size(tk) - 1), i -> concat_ws(' ', slice(tk, i, 2)))"))
        .as("b"))
        .groupBy(col("b")).agg(count(lit(1)).as("cb"))
        .filter(col("cb") >= PmiMinCount)
        .withColumn("w1", substring_index(col("b"), " ", 1))
        .withColumn("w2", substring_index(col("b"), " ", -1))
      val totals = toks.agg(
        sum(size(col("tk"))).cast("double").as("_nt"),
        sum(size(col("tk")) - 1).cast("double").as("_nb"))
      bi.join(uni.select(col("w").as("w1"), col("c").as("c1")), "w1")
        .join(uni.select(col("w").as("w2"), col("c").as("c2")), "w2")
        .crossJoin(broadcast(totals))
        .withColumn("pmi", round(log((col("cb") * col("_nt") * col("_nt"))
          / (col("_nb") * col("c1") * col("c2"))), 6))
        .select(col("w1"), col("w2"), col("cb").as("n_pair"), col("pmi"))
        .orderBy(col("pmi").desc, col("w1"), col("w2"))
        .limit(PmiTopK)
    }),

    // Deterministic stratified split manifest: every document lands in
    // train/val/test (80/10/10) by an md5 draw on its id — the q255 draw
    // convention: reproducible across engines, reruns, and partitionings,
    // never RNG state. One corpus scan; the output is a ≤3·|lang| row
    // manifest with per-stratum doc and token totals.
    "q262_split_manifest" -> ((s, d) => {
      val bucket = (conv(substring(md5(col("doc_id").cast("string")), 1, 6),
        16, 10).cast("long") % SplitDraw.Mod.toLong).cast("int")
      Ops.fanOut(Tables.documents(s, d))
        .select(col("lang"),
          when(bucket < SplitDraw.TrainLt, "train")
            .when(bucket < SplitDraw.ValLt, "val")
            .otherwise("test").as("split"),
          size(graft.text.Tokenizer.tokens(col("text"))).cast("long").as("ntk"))
        .groupBy(col("lang"), col("split"))
        .agg(count(lit(1)).as("n_docs"), sum(col("ntk")).as("n_tokens"))
    }),

    // UniMax language-budget allocation (Chung et al., ICLR 2023: "UniMax:
    // Fairer and More Effective Language Sampling for Large-Scale
    // Multilingual Pretraining"): distribute a total token budget across
    // languages by uniform water-filling with a per-language epoch cap —
    // each language gets min(E·c_l, fair share), smallest first, leftovers
    // redistributed. The greedy is a closed form on the ascending-c order:
    // cappedness is monotone (if a language's cap exceeds its fair share,
    // so does every larger language's), so one cumulative-AND window finds
    // the capped prefix and the remainder splits evenly. Scale shape: the
    // windows run on the PER-LANGUAGE aggregate — a frame bounded by
    // |languages| (~10²), never corpus rows; the per-lang token totals are
    // one map-side-combinable aggregate of one corpus scan. All allocator
    // arithmetic is exact integers (cross-multiplied cap test, ratioHalfUp
    // divisions) so both engines agree bit-for-bit.
    "q264_unimax_epochs" -> ((s, d) => {
      val E = lit(UnimaxMaxEpochs)
      val perLang = Ops.fanOut(Tables.documents(s, d))
        .select(col("lang"),
          size(graft.text.Tokenizer.tokens(col("text"))).cast("long").as("ntk"))
        .groupBy(col("lang")).agg(sum(col("ntk")).as("n_tokens"))
      val wOrd = Window.orderBy(col("n_tokens").asc, col("lang").asc)
      val wAll = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      perLang
        .withColumn("_i", row_number().over(wOrd))
        .withColumn("_n", count(lit(1)).over(wAll))
        .withColumn("_B", sum(col("n_tokens")).over(wAll) * UnimaxBudgetX)
        .withColumn("_P", coalesce(sum(col("n_tokens")).over(
          wOrd.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn("_flag",
          (E * col("n_tokens") * (col("_n") - col("_i") + 1) <=
            col("_B") - E * col("_P")).cast("int"))
        .withColumn("capped", min(col("_flag")).over(
          wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)) === 1)
        .withColumn("_k", sum(col("capped").cast("int")).over(wAll))
        .withColumn("_R",
          col("_B") - E * sum(when(col("capped"), col("n_tokens"))
            .otherwise(lit(0L))).over(wAll))
        .select(col("lang"), col("n_tokens"), col("capped"),
          when(col("capped"), E * col("n_tokens"))
            .otherwise(Ops.ratioHalfUp(col("_R"), col("_n") - col("_k"), 0)
              .cast("long")).as("alloc_tokens"),
          when(col("capped"), lit(UnimaxMaxEpochs.toDouble))
            .otherwise(Ops.ratioHalfUp(col("_R") * 10000L,
              (col("_n") - col("_k")) * col("n_tokens"), 4)).as("epochs"))
    }),

    // Vocabulary coverage curve (the Zipf-coverage statistic behind
    // tokenizer-size decisions — Gowda & May, Findings of EMNLP 2020,
    // "Finding the Optimal Vocabulary Size for Neural Machine
    // Translation"): for each coverage target p, the minimum k such that
    // the k most frequent word types cover ≥ p of all corpus tokens. Scale
    // shape: the repo's corpus-parallel histogram trick (q57/q118) — never
    // a global rank over VOCABULARY rows; word counts collapse to a
    // (count-value → type count) histogram whose cardinality is the number
    // of DISTINCT frequency values (O(√total) under Zipf), the cumulative
    // window runs on that tiny frame, and the boundary row per target is a
    // 4-row broadcast range join. Within a frequency tie the minimal k is
    // order-free: every type at the boundary count adds the same c tokens,
    // so k = types_above + ceil(residual/c) — exact integers end to end
    // (coverage at 4 decimals keeps the ×10⁴ numerator < 2⁶³ even at
    // 100 TB token totals).
    "q265_topk_coverage" -> ((s, d) => {
      val hist = Ops.fanOut(Tables.documents(s, d))
        .select(explode(graft.text.Tokenizer.tokens(col("text"))).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("c"))
        .groupBy(col("c")).agg(count(lit(1)).as("nw"))
        .withColumn("tok", col("c") * col("nw"))
      val wDesc = Window.orderBy(col("c").desc)
      val wAll = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      val cum = hist
        .withColumn("_ta", coalesce(sum(col("tok")).over(
          wDesc.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn("_wa", coalesce(sum(col("nw")).over(
          wDesc.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn("_tt", sum(col("tok")).over(wAll))
      val targets = s.range(CoverageTargetsBp.size)
        .select(element_at(array(CoverageTargetsBp.map(lit): _*),
          col("id").cast("int") + 1).as("p_bp"))
      cum.join(broadcast(targets),
          col("_ta") * 10000L < col("p_bp") * col("_tt") &&
            col("p_bp") * col("_tt") <= (col("_ta") + col("tok")) * 10000L)
        // `div` (long integer division, all operands positive here) keeps
        // the ceil exact past 2^53 where divide+cast("long") would round
        // through a double; mirrors the oracle's `//`.
        .withColumn("_m",
          expr("((p_bp * _tt - 10000L * _ta - 1L) div (10000L * c)) + 1L"))
        .select(col("p_bp"),
          (col("_wa") + col("_m")).as("k_min"),
          Ops.ratioHalfUp((col("_ta") + col("_m") * col("c")) * 10000L,
            col("_tt"), 4).as("coverage"))
    }),

    // Boundary-preserving sequence packing by complement pairing (the
    // simplest deterministic member of the family in Krell et al. 2021,
    // "Efficient Sequence Packing without Cross-Contamination": SFT-style
    // packing that never splits a document, unlike q250's concat-then-
    // chunk): rank documents by token count descending and pair rank i
    // with rank N+1−i — longest with shortest — into a PackPairCap-token
    // context; pairs that overflow ship as two singleton bins. Output is
    // the one-row packing report (bins, fits, splits, mean fill of the
    // fitting pairs). Scale shape: the global rank is Packing.globalRank's
    // two-phase distributed scan (order-aligned composite buckets, never a
    // single-task Window.orderBy); N rides a one-row broadcast; the pair
    // reduction is a groupBy on bin = min(rank−1, N−rank), an equi-shuffle
    // of 16-byte rows. Mean fill is tie-free ratioHalfUp, guarded
    // identically in both engines when no pair fits.
    "q266_pair_pack" -> ((s, d) => {
      val docs = graft.runtime.Stage.scopedPersist(
        Ops.fanOut(Tables.documents(s, d))
          .select(col("doc_id"),
            size(graft.text.Tokenizer.tokens(col("text"))).cast("long").as("n_tok")))
      val ranked = graft.ext.Packing.globalRank(docs,
        buckets = Seq(-col("n_tok"), expr(s"doc_id div $RankBucketWidth")),
        order = Seq(col("n_tok").desc, col("doc_id").asc),
        rankCol = "_rank")
      val n = docs.agg(count(lit(1)).as("_N"))
      val bins = ranked.crossJoin(broadcast(n))
        .withColumn("_bin", least(col("_rank") - 1, col("_N") - col("_rank")))
        .groupBy(col("_bin"))
        .agg(count(lit(1)).as("_m"), sum(col("n_tok")).as("_tok"))
        .withColumn("_fits", col("_m") === 2 && col("_tok") <= PackPairCap)
      bins.agg(
          sum(col("_m")).as("n_docs"),
          sum(when(col("_fits"), 1L).otherwise(0L)).as("n_pairs_fit"),
          sum(when(col("_m") === 2 && !col("_fits"), 1L).otherwise(0L))
            .as("n_pairs_split"),
          sum(when(col("_m") === 1, 1L).otherwise(0L)).as("n_singletons"),
          sum(when(col("_fits"), col("_tok")).otherwise(0L)).as("_ft"))
        .select(col("n_docs"), col("n_pairs_fit"), col("n_pairs_split"),
          col("n_singletons"),
          (col("n_pairs_fit") + lit(2L) * col("n_pairs_split")
            + col("n_singletons")).as("n_bins"),
          when(col("n_pairs_fit") === 0, lit(0.0))
            .otherwise(Ops.ratioHalfUp(col("_ft") * 10000L,
              col("n_pairs_fit") * PackPairCap, 4)).as("avg_fill"))
    }),

    // CCNet head/middle/tail split (Wenzek et al., LREC 2020: partition
    // each language's corpus into perplexity terciles under the corpus
    // LM; head = most in-distribution, tail = candidates for dropping).
    // Buckets cut at the nearest-rank tercile VALUES of the q260 avg_nll
    // score — value-based thresholds, so ties never straddle a boundary
    // and no per-document rank is materialized. Scale shape: the tercile
    // boundaries come from Ops.cumHistogram on the (lang, rounded-score)
    // frame — the q57 corpus-parallel selection, windows over DISTINCT
    // score values per language, never a per-language rank window over
    // document rows; the two boundary tables are ≤|lang| rows and ride
    // broadcasts back onto the scored frame. Documents under 2 tokens
    // have no bigram score and are out of scope (q260's own domain).
    "q267_ccnet_buckets" -> ((s, d) => {
      val docs = Ops.fanOut(Tables.documents(s, d))
        .select(col("doc_id"), col("lang"),
          size(graft.text.Tokenizer.tokens(col("text"))).cast("long").as("ntk"))
      val sc = graft.runtime.Stage.scopedPersist(
        docs.join(bigramNllScores(s, d).select(col("doc_id"), col("avg_nll")),
          "doc_id"))
      val hist = Ops.cumHistogram(sc, Seq("lang"), "avg_nll")
      val b1 = hist.filter(Ops.containsRank(expr("(_n + 2) div 3")))
        .select(col("lang"), col("avg_nll").as("_c1"))
      val b2 = hist.filter(Ops.containsRank(expr("(2 * _n + 2) div 3")))
        .select(col("lang"), col("avg_nll").as("_c2"))
      sc.join(broadcast(b1), "lang").join(broadcast(b2), "lang")
        .withColumn("bucket",
          when(col("avg_nll") <= col("_c1"), "head")
            .when(col("avg_nll") <= col("_c2"), "middle").otherwise("tail"))
        .groupBy(col("lang"), col("bucket"))
        .agg(count(lit(1)).as("n_docs"), sum(col("ntk")).as("n_tokens"))
    })
  )

  /** q260/q267 shared scorer: per-document add-1 bigram-LM negative
    * log-likelihood — (doc_id, n_bigrams, avg_nll round-6). The "model"
    * is two keyed aggregates of one per-doc bigram frame (bigram counts,
    * vocab²-bounded; start counts, vocab-bounded) joined back by key; |V|
    * rides a one-row broadcast cross. Count tables are corpus-derived but
    * VOCABULARY-bounded, so the joins keep bounded build sides at 100 TB.
    * Documents with fewer than 2 tokens have no bigrams and emit no row.
    *
    * Session-shared (r13): three lanes consume this identical frame (q260
    * emits it, q267 buckets it, q276 joins it) — it was rebuilt per
    * invocation. Stage.sharedStage (parquet-cut + doc_id-pinned persist,
    * the same treatment as the rec profiles) because the build rides the
    * scoped `db` cache: a bare shared persist over a scoped input loses
    * its buffers at the next query scope (Stage.persistShared invariant).
    */
  private def bigramNllScores(s: SparkSession, d: String): DataFrame =
    graft.runtime.Stage.shared(s, s"bigram-nll:$d") {
      graft.runtime.Stage.sharedStage(buildBigramNllScores(s, d), col("doc_id"))
    }

  private def buildBigramNllScores(s: SparkSession, d: String): DataFrame = {
    val tk = Ops.fanOut(Tables.documents(s, d))
      .select(col("doc_id"), graft.text.Tokenizer.tokens(col("text")).as("tk"))
      .filter(size(col("tk")) >= 2)
    val db = graft.runtime.Stage.scopedPersist(
      tk.select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(tk) - 1), i -> concat_ws(' ', slice(tk, i, 2)))"))
        .as("b"))
        .withColumn("w1", substring_index(col("b"), " ", 1))
        .groupBy(col("doc_id"), col("w1"), col("b"))
        .agg(count(lit(1)).as("k")))
    val cb = db.groupBy(col("b")).agg(sum(col("k")).as("cb"))
    val cw = db.groupBy(col("w1")).agg(sum(col("k")).as("cw"))
    val v = cw.agg(count(lit(1)).cast("double").as("_v"))
    db.join(cb, "b").join(cw, "w1")
      .crossJoin(broadcast(v))
      .select(col("doc_id"), col("k"),
        (col("k") * -log((col("cb") + 1).cast("double")
          / (col("cw") + col("_v")))).as("nll"))
      .groupBy(col("doc_id"))
      .agg(sum(col("k")).as("n_bigrams"),
        round(sum(col("nll")) / sum(col("k")), 6).as("avg_nll"))
  }

  // ---- DuckDB oracles ----

  private val toks =
    "list_filter(regexp_split_to_array(lower(text), '[^a-z]+'), w -> len(w) > 0)"

  /** n-gram list of token array `t` (shingleExpr at [[SpanN]]). */
  private def ngrams(t: String, n: Int): String =
    s"list_transform(range(1, len($t) - ${n - 2}), i -> array_to_string(($t)[i:i+${n - 1}], ' '))"

  /** First `n` hex digits of md5 expression `x` as BIGINT (the q153 mirror
    * of Spark's conv(substring(md5, 1, n), 16, 10)).
    */
  private def md5Hex(x: String, n: Int): String = (1 to n).map { i =>
    s"(CAST(strpos('0123456789abcdef', substr(md5($x), $i, 1)) - 1 AS BIGINT) * ${math.pow(16, n - i).toLong})"
  }.mkString(" + ")

  private def md5Hex3(x: String): String = md5Hex(x, 3)

  /** q260/q267 shared oracle fragments — the DuckDB twin of
    * [[bigramNllScores]], split so q267 can extend the CTE chain.
    */
  private val bigramCtes: String =
    s"""t AS (SELECT doc_id, $toks AS tk FROM documents),
       |f AS (SELECT doc_id, tk FROM t WHERE len(tk) >= 2),
       |db AS (
       |  SELECT doc_id, tk[i] AS w1, tk[i] || ' ' || tk[i+1] AS b,
       |    count(*) AS k
       |  FROM (SELECT doc_id, tk, unnest(range(1, len(tk))) AS i FROM f) z
       |  GROUP BY 1, 2, 3),
       |cb AS (SELECT b, CAST(sum(k) AS BIGINT) AS cb FROM db GROUP BY 1),
       |cw AS (SELECT w1, CAST(sum(k) AS BIGINT) AS cw FROM db GROUP BY 1),
       |v AS (SELECT CAST(count(*) AS DOUBLE) AS v FROM cw)""".stripMargin

  private val bigramSelect: String =
    """SELECT db.doc_id, CAST(sum(db.k) AS BIGINT) AS n_bigrams,
      |  round(sum(db.k * -ln(CAST(cb.cb + 1 AS DOUBLE) / (cw.cw + v.v)))
      |    / sum(db.k), 6) AS avg_nll
      |FROM db JOIN cb USING (b) JOIN cw USING (w1), v
      |GROUP BY 1""".stripMargin

  def oracle: Map[String, String] = Map(

    "q252_semantic_dedup" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x FROM embeddings),
         |kk AS (SELECT greatest($SemDedupK,
         |  (count(*) + ${SemDedupPerCluster - 1}) // $SemDedupPerCluster) AS k
         |  FROM e),
         |c0 AS (SELECT CAST(vec_id AS INT) AS cl, x AS cx FROM e
         |  WHERE vec_id < (SELECT k FROM kk)),
         |a AS (
         |  SELECT vec_id, x, cl,
         |    round(list_sum(list_transform(range(1, 65),
         |      i -> (x[i] - cx[i]) * (x[i] - cx[i]))), 6) AS d2
         |  FROM e, c0),
         |b AS (
         |  SELECT vec_id, x, cl,
         |    sqrt(list_sum(list_transform(range(1, 65), i -> x[i] * x[i]))) AS nrm
         |  FROM (
         |    SELECT vec_id, x, cl,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY d2, cl) AS rn
         |    FROM a) WHERE rn = 1),
         |pruned AS (
         |  SELECT DISTINCT b2.vec_id
         |  FROM b b1 JOIN b b2 ON b1.cl = b2.cl AND b1.vec_id < b2.vec_id
         |  WHERE round(list_sum(list_transform(range(1, 65),
         |      i -> b1.x[i] * b2.x[i])) / (b1.nrm * b2.nrm), 6) >= $SemDedupTau)
         |SELECT b.vec_id, b.cl AS cluster,
         |  (p.vec_id IS NULL) AS is_kept
         |FROM b LEFT JOIN pruned p ON p.vec_id = b.vec_id""".stripMargin,

    "q253_dup_spans" ->
      s"""WITH t AS (SELECT doc_id, $toks AS tk FROM documents),
         |g AS (
         |  SELECT doc_id, unnest(${ngrams("tk", SpanN)}) AS ng
         |  FROM t WHERE len(tk) >= $SpanN),
         |gc AS (SELECT doc_id, ng, count(*) AS k FROM g GROUP BY 1, 2),
         |dup AS (
         |  SELECT ng FROM (SELECT ng, count(*) AS nd FROM gc GROUP BY 1)
         |  WHERE nd >= 2),
         |agg AS (
         |  SELECT gc.doc_id, CAST(sum(gc.k) AS BIGINT) AS n_ngrams,
         |    CAST(sum(CASE WHEN d.ng IS NOT NULL THEN gc.k ELSE 0 END)
         |      AS BIGINT) AS n_dup
         |  FROM gc LEFT JOIN dup d ON d.ng = gc.ng
         |  GROUP BY 1)
         |SELECT doc_id, n_ngrams, n_dup,
         |  ${SqlFragments.ratioHalfUpSql("n_dup * 10000", "n_ngrams", 4)} AS dup_frac
         |FROM agg""".stripMargin,

    "q254_dsir_weights" ->
      s"""WITH t AS (SELECT doc_id, lang, $toks AS tk FROM documents),
         |bg AS (
         |  SELECT doc_id, (lang = 'en') AS is_t, unnest(${ngrams("tk", 2)}) AS b
         |  FROM t WHERE len(tk) >= 2),
         |dk AS (
         |  SELECT doc_id, is_t,
         |    CAST((${md5Hex3("b")}) % $DsirBuckets AS INT) AS bucket,
         |    count(*) AS k
         |  FROM bg GROUP BY 1, 2, 3),
         |pb AS (
         |  SELECT bucket,
         |    sum(CASE WHEN is_t THEN k ELSE 0 END) AS ct, sum(k) AS cr
         |  FROM dk GROUP BY 1),
         |tot AS (
         |  SELECT CAST(sum(ct) AS DOUBLE) AS nt, CAST(sum(cr) AS DOUBLE) AS nr
         |  FROM pb)
         |SELECT dk.doc_id, CAST(sum(dk.k) AS BIGINT) AS n_bigrams,
         |  round(sum(dk.k * ln((CAST(pb.ct + 1 AS DOUBLE) / (tot.nt + $DsirBuckets))
         |    / (CAST(pb.cr + 1 AS DOUBLE) / (tot.nr + $DsirBuckets)))) / sum(dk.k), 6)
         |    AS avg_log_ratio
         |FROM dk JOIN pb USING (bucket), tot
         |GROUP BY 1""".stripMargin,

    "q255_mix_sample" ->
      s"""WITH a AS (
         |  SELECT source, count(*) AS n,
         |    CAST(regexp_extract(source, '([0-9]+)$$', 1) AS BIGINT) AS i
         |  FROM documents GROUP BY 1),
         |w AS (
         |  SELECT source, least(CAST(
         |    (2*((i+1) * (sum(n) OVER ()) * 1000000) + ((sum(i+1) OVER ()) * n))
         |      // (2*((sum(i+1) OVER ()) * n)) AS BIGINT), $MixCapMicros) AS wu
         |  FROM a)
         |SELECT d.doc_id, d.source,
         |  CAST(wu // 1000000
         |    + CASE WHEN (${md5Hex("CAST(d.doc_id AS VARCHAR)", 6)}) % 1000000
         |        < wu % 1000000 THEN 1 ELSE 0 END AS BIGINT) AS n_rep
         |FROM documents d JOIN w USING (source)""".stripMargin,

    "q256_shard_manifest" ->
      s"""WITH t AS (SELECT doc_id, len($toks) AS n_tok FROM documents),
         |r AS (
         |  SELECT n_tok,
         |    row_number() OVER (ORDER BY n_tok DESC, doc_id) - 1 AS r0
         |  FROM t),
         |s AS (
         |  SELECT n_tok, CASE WHEN (r0 // $Shards) % 2 = 0 THEN r0 % $Shards
         |    ELSE ${Shards - 1} - (r0 % $Shards) END AS shard
         |  FROM r)
         |SELECT CAST(shard AS INT) AS shard, count(*) AS n_docs,
         |  CAST(sum(n_tok) AS BIGINT) AS n_tokens,
         |  max(n_tok) AS max_tok, min(n_tok) AS min_tok
         |FROM s GROUP BY 1""".stripMargin,

    "q257_rule_funnel" ->
      s"""WITH t AS (SELECT $toks AS tk FROM documents),
         |m AS (
         |  SELECT len(tk) AS n,
         |    list_sum(list_transform(tk, w -> len(w))) AS sl,
         |    list_max(list_transform(list_distinct(tk),
         |      w -> len(list_filter(tk, x -> x = w)))) AS topk,
         |    len(list_distinct(tk)) AS uq,
         |    len(list_intersect(list_distinct(tk),
         |      [${SignalStopwords.map(w => s"'$w'").mkString(",")}])) AS ns
         |  FROM t),
         |f AS (
         |  SELECT CASE WHEN NOT (n BETWEEN 20 AND 90) THEN 1
         |    WHEN sl*100 < n*425 THEN 2
         |    WHEN topk*10 > n THEN 3
         |    WHEN uq*10 < n*4 THEN 4
         |    WHEN ns < 1 THEN 5 ELSE 0 END AS ff
         |  FROM m),
         |c AS (SELECT ff, count(*) AS c FROM f GROUP BY 1),
         |rules AS (
         |  SELECT i AS rule,
         |    (['${FunnelRules.mkString("','")}'])[i] AS rule_name
         |  FROM (SELECT unnest(range(1, ${FunnelRules.size + 1})) AS i))
         |SELECT CAST(r.rule AS INT) AS rule, r.rule_name,
         |  CAST(coalesce(c.c, 0) AS BIGINT) AS n_killed,
         |  CAST((SELECT sum(c) FROM c)
         |    - sum(coalesce(c.c, 0)) OVER (ORDER BY r.rule) AS BIGINT) AS n_surviving
         |FROM rules r LEFT JOIN c ON c.ff = r.rule""".stripMargin,

    "q260_bigram_lm" ->
      s"WITH $bigramCtes\n$bigramSelect",

    "q276_quality_signals" ->
      s"""WITH $bigramCtes,
         |sc AS ($bigramSelect),
         |t2 AS (SELECT doc_id, lang, source, n_chars, $toks AS tk
         |  FROM documents),
         |m AS (
         |  SELECT doc_id, lang, source, n_chars,
         |    CAST(len(tk) AS BIGINT) AS n_tokens,
         |    list_sum(list_transform(tk, w -> len(w))) AS sl,
         |    list_max(list_transform(list_distinct(tk),
         |      w -> len(list_filter(tk, x -> x = w)))) AS topk,
         |    len(list_distinct(tk)) AS uq,
         |    len(list_intersect(list_distinct(tk),
         |      [${SignalStopwords.map(w => s"'$w'").mkString(",")}])) >= 1 AS stopword_hit
         |  FROM t2 WHERE len(tk) >= 2)
         |SELECT m.doc_id, m.lang, m.source, m.n_chars, m.n_tokens,
         |  ${SqlFragments.ratioHalfUpSql("uq * 10000", "n_tokens", 4)} AS uniq_ratio,
         |  ${SqlFragments.ratioHalfUpSql("sl * 10000", "n_tokens", 4)} AS mean_word_len,
         |  ${SqlFragments.ratioHalfUpSql("topk * 10000", "n_tokens", 4)} AS top_token_share,
         |  m.stopword_hit, sc.avg_nll
         |FROM m JOIN sc USING (doc_id)""".stripMargin,

    "q267_ccnet_buckets" ->
      s"""WITH $bigramCtes,
         |sc0 AS ($bigramSelect),
         |d0 AS (SELECT doc_id, lang, CAST(len($toks) AS BIGINT) AS ntk
         |  FROM documents),
         |sc AS (SELECT d0.doc_id, d0.lang, d0.ntk, sc0.avg_nll
         |  FROM d0 JOIN sc0 USING (doc_id)),
         |rk AS (SELECT lang, avg_nll,
         |    row_number() OVER (PARTITION BY lang ORDER BY avg_nll) AS r,
         |    count(*) OVER (PARTITION BY lang) AS n
         |  FROM sc),
         |b1 AS (SELECT lang, avg_nll AS c1 FROM rk WHERE r = (n + 2) // 3),
         |b2 AS (SELECT lang, avg_nll AS c2 FROM rk WHERE r = (2*n + 2) // 3)
         |SELECT sc.lang,
         |  CASE WHEN avg_nll <= c1 THEN 'head'
         |    WHEN avg_nll <= c2 THEN 'middle' ELSE 'tail' END AS bucket,
         |  count(*) AS n_docs, CAST(sum(ntk) AS BIGINT) AS n_tokens
         |FROM sc JOIN b1 USING (lang) JOIN b2 USING (lang)
         |GROUP BY 1, 2""".stripMargin,

    "q261_pmi_collocations" ->
      s"""WITH t AS (SELECT $toks AS tk FROM documents),
         |f AS (SELECT tk FROM t WHERE len(tk) >= 2),
         |uni AS (SELECT w, count(*) AS c
         |  FROM (SELECT unnest(tk) AS w FROM f) GROUP BY 1),
         |bi AS (SELECT tk[i] AS w1, tk[i+1] AS w2, count(*) AS cb
         |  FROM (SELECT tk, unnest(range(1, len(tk))) AS i FROM f) z
         |  GROUP BY 1, 2),
         |tot AS (SELECT CAST(sum(len(tk)) AS DOUBLE) AS nt,
         |  CAST(sum(len(tk) - 1) AS DOUBLE) AS nb FROM f)
         |SELECT w1, w2, CAST(cb AS BIGINT) AS n_pair,
         |  round(ln(cb * nt * nt / (nb * c1.c * c2.c)), 6) AS pmi
         |FROM bi JOIN uni c1 ON c1.w = bi.w1 JOIN uni c2 ON c2.w = bi.w2, tot
         |WHERE cb >= $PmiMinCount
         |ORDER BY pmi DESC, w1, w2 LIMIT $PmiTopK""".stripMargin,

    "q262_split_manifest" ->
      s"""WITH b AS (SELECT lang,
         |  (${md5Hex("CAST(doc_id AS VARCHAR)", 6)}) % ${SplitDraw.Mod} AS bk,
         |  len($toks) AS ntk FROM documents)
         |SELECT lang,
         |  CASE WHEN bk < ${SplitDraw.TrainLt} THEN 'train'
         |    WHEN bk < ${SplitDraw.ValLt} THEN 'val'
         |    ELSE 'test' END AS split,
         |  count(*) AS n_docs, CAST(sum(ntk) AS BIGINT) AS n_tokens
         |FROM b GROUP BY 1, 2""".stripMargin,

    "q264_unimax_epochs" ->
      s"""WITH t AS (SELECT lang, CAST(sum(len($toks)) AS BIGINT) AS c
         |  FROM documents GROUP BY 1),
         |a AS (
         |  SELECT lang, c,
         |    row_number() OVER (ORDER BY c, lang) AS i,
         |    (SELECT CAST(count(*) AS BIGINT) FROM t) AS n,
         |    (SELECT $UnimaxBudgetX * sum(c) FROM t) AS b,
         |    coalesce(sum(c) OVER (ORDER BY c, lang
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS p
         |  FROM t),
         |f AS (
         |  SELECT *, CASE WHEN $UnimaxMaxEpochs*c*(n - i + 1)
         |      <= b - $UnimaxMaxEpochs*p THEN 1 ELSE 0 END AS flag
         |  FROM a),
         |g AS (
         |  SELECT *, min(flag) OVER (ORDER BY c, lang
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cp
         |  FROM f),
         |h AS (
         |  SELECT *, sum(cp) OVER () AS kk,
         |    b - $UnimaxMaxEpochs * sum(cp * c) OVER () AS r
         |  FROM g)
         |SELECT lang, c AS n_tokens, cp = 1 AS capped,
         |  CAST(CASE WHEN cp = 1 THEN $UnimaxMaxEpochs*c
         |    ELSE (2*r + (n - kk)) // (2*(n - kk)) END AS BIGINT) AS alloc_tokens,
         |  CASE WHEN cp = 1 THEN CAST($UnimaxMaxEpochs AS DOUBLE)
         |    ELSE ${SqlFragments.ratioHalfUpSql("r * 10000", "(n - kk) * c", 4)}
         |  END AS epochs
         |FROM h""".stripMargin,

    "q265_topk_coverage" ->
      s"""WITH w AS (SELECT w, count(*) AS c
         |  FROM (SELECT unnest($toks) AS w FROM documents) GROUP BY 1),
         |h AS (SELECT CAST(c AS BIGINT) AS c, CAST(nw AS BIGINT) AS nw,
         |  CAST(c * nw AS BIGINT) AS tok
         |  FROM (SELECT c, count(*) AS nw FROM w GROUP BY 1)),
         |cum AS (SELECT c, nw, tok,
         |  coalesce(sum(tok) OVER (ORDER BY c DESC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS ta,
         |  coalesce(sum(nw) OVER (ORDER BY c DESC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS wa,
         |  sum(tok) OVER () AS tt FROM h),
         |tg AS (SELECT unnest([${CoverageTargetsBp.mkString(", ")}]) AS p_bp),
         |m AS (
         |  SELECT p_bp, c, wa, ta, tt,
         |    (p_bp * tt - 10000 * ta - 1) // (10000 * c) + 1 AS mm
         |  FROM cum JOIN tg
         |    ON ta * 10000 < p_bp * tt AND p_bp * tt <= (ta + tok) * 10000)
         |SELECT CAST(p_bp AS INT) AS p_bp, CAST(wa + mm AS BIGINT) AS k_min,
         |  ${SqlFragments.ratioHalfUpSql("(ta + mm * c) * 10000", "tt", 4)}
         |    AS coverage
         |FROM m""".stripMargin,

    "q266_pair_pack" ->
      s"""WITH t AS (SELECT doc_id, CAST(len($toks) AS BIGINT) AS n_tok
         |  FROM documents),
         |r AS (SELECT n_tok,
         |    row_number() OVER (ORDER BY n_tok DESC, doc_id) AS rk,
         |    (SELECT CAST(count(*) AS BIGINT) FROM t) AS n
         |  FROM t),
         |b AS (SELECT least(rk - 1, n - rk) AS bin, count(*) AS m,
         |    CAST(sum(n_tok) AS BIGINT) AS tok
         |  FROM r GROUP BY 1),
         |f AS (SELECT m, tok, (m = 2 AND tok <= $PackPairCap) AS fits FROM b),
         |g AS (
         |  SELECT CAST(sum(m) AS BIGINT) AS n_docs,
         |    CAST(sum(CASE WHEN fits THEN 1 ELSE 0 END) AS BIGINT) AS n_pairs_fit,
         |    CAST(sum(CASE WHEN m = 2 AND NOT fits THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_pairs_split,
         |    CAST(sum(CASE WHEN m = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_singletons,
         |    CAST(sum(CASE WHEN fits THEN tok ELSE 0 END) AS BIGINT) AS ft
         |  FROM f)
         |SELECT n_docs, n_pairs_fit, n_pairs_split, n_singletons,
         |  n_pairs_fit + 2 * n_pairs_split + n_singletons AS n_bins,
         |  CASE WHEN n_pairs_fit = 0 THEN CAST(0 AS DOUBLE)
         |    ELSE ${SqlFragments.ratioHalfUpSql("ft * 10000", s"n_pairs_fit * $PackPairCap", 4)}
         |  END AS avg_fill
         |FROM g""".stripMargin
  )
}
