package graft.ext

import graft.text.Tokenizer
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate detection for large-scale corpus curation (BASELINE.json
  * north-star; no reference analogue — the operators a 100 TB training-data
  * pipeline needs).
  *
  * Design for scale:
  *  - Shingling/minhashing is per-row Column work (codegen'd, no shuffle).
  *  - LSH banding turns all-pairs O(N²) similarity into an equi-join on
  *    (band, key): only docs sharing a band collide. Band keys are md5
  *    strings, so the hash family is engine-portable (the DuckDB oracle
  *    computes the identical signatures).
  *  - Exact Jaccard runs only on candidate pairs (explode shingles →
  *    equi-join → group count), never on the full cross product.
  */
object Dedup {

  /** Word n-gram shingles of a token array (duplicates preserved). */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))

  /** All minhash signatures in one pass: numHashes/2 seeded digests per
    * shingle, each md5 split into two 64-bit hex slices (chars 1-16 and
    * 17-32) → numHashes independent min-hashes at half the digest work.
    * String-min of hex slices — identical in any engine with md5 (the DuckDB
    * oracle computes `min(substr(md5(seed || '_' || s), off, 16))`).
    * Single-pass UDF so the digest is computed once per (shingle, seed),
    * not once per signature column.
    */
  private val HEX = "0123456789abcdef".toCharArray

  private def hexSlice(bytes: Array[Byte], from: Int, until: Int): String = {
    val out = new Array[Char]((until - from) * 2)
    var i = from
    var j = 0
    while (i < until) {
      out(j) = HEX((bytes(i) >> 4) & 0xf)
      out(j + 1) = HEX(bytes(i) & 0xf)
      i += 1
      j += 2
    }
    new String(out)
  }

  private def signatureVector(shingles: Seq[String], numHashes: Int): Seq[String] = {
    val numSeeds = numHashes / 2
    val mins = Array.fill[String](numHashes)(null)
    val md = java.security.MessageDigest.getInstance("MD5")
    for (s <- shingles; seed <- 0 until numSeeds) {
      md.reset()
      val digest = md.digest(s"${seed}_$s".getBytes("UTF-8"))
      val lo = hexSlice(digest, 0, 8)
      val hi = hexSlice(digest, 8, 16)
      val i = 2 * seed
      if (mins(i) == null || lo < mins(i)) mins(i) = lo
      if (mins(i + 1) == null || hi < mins(i + 1)) mins(i + 1) = hi
    }
    mins.toSeq
  }

  /** (doc_id, sig0..sig{numHashes-1}) minhash signature table.
    * numHashes must be even.
    */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: Column,
                        shingleSize: Int, numHashes: Int): DataFrame = {
    require(numHashes % 2 == 0, "numHashes must be even (two slices per digest)")
    val sigUdf = udf((sh: Seq[String]) => signatureVector(sh, numHashes))
    val withSigs = docs.select(col(idCol),
      sigUdf(shingles(Tokenizer.tokens(textCol), shingleSize)).as("_sigs"))
    val sigCols = (0 until numHashes).map(i => col("_sigs")(i).as(s"sig$i"))
    withSigs.select(col(idCol) +: sigCols: _*)
  }

  /** LSH candidate pairs: docs agreeing on any band of `bandSize` consecutive
    * signatures. Returns (doc_a, doc_b) with doc_a < doc_b, distinct.
    * This is the scale path: a self-equi-join on (band, key), never O(N²).
    */
  def lshCandidates(sigs: DataFrame, idCol: String, numHashes: Int, bandSize: Int): DataFrame = {
    val bands = bandRows(sigs, idCol, numHashes, bandSize)
    val a = bands.select(col(idCol).as("doc_a"), col("band"), col("key"))
    val b = bands.select(col(idCol).as("doc_b"), col("band"), col("key"))
    a.join(b, Seq("band", "key"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
  }

  /** Star (spanning-edge) LSH candidates — the sub-quadratic candidate
    * mode for near-duplicate-DENSE corpora: within every (band, key)
    * bucket, one edge from the bucket's minimum-id doc (the hub) to each
    * other member — m−1 edges per bucket instead of C(m,2). Returns
    * (doc_a = hub, doc_b) with doc_a < doc_b, distinct across bands.
    *
    * Candidate volume is bounded by numBands·N regardless of bucket-size
    * distribution — the property [[lshCandidates]] lacks on a dup-dense
    * crawl, where a single m-member near-clique bucket emits m(m−1)/2
    * pairs (the sf10nd tier priced that at 16–21×/decade). The hub agg is
    * a partial-aggregatable groupBy on the SAME (band, key) the pair
    * self-join would shuffle on, and the join back is hub-broadcast-shaped
    * per bucket — no pair set is ever materialized.
    *
    * Connectivity contract (q281 vs q70, pinned in ExtSpec): every star
    * edge is itself a band-candidate pair, so after identical exact-jaccard
    * thresholding the star graph is a SUBGRAPH of the pair-complete graph —
    * star clusters always REFINE the pair-complete clusters, never merge
    * across them. They can split one: a member connects only through its
    * bucket hubs, so if every hub–member edge of a doc fails τ while some
    * member–member edge passes, the star graph drops that link. Identity
    * holds when buckets are τ-homogeneous (every co-bucketed pair ≥ τ) —
    * the near-clique profile dedup targets; the sf10nd stress run
    * quantifies the residual deviation.
    */
  def lshStarCandidates(sigs: DataFrame, idCol: String,
                        numHashes: Int, bandSize: Int,
                        numHubs: Int = 1): DataFrame = {
    require(numHubs >= 1, "numHubs must be >= 1")
    val bands = bandRows(sigs, idCol, numHashes, bandSize)
    // numHubs is the recall/cost dial: link each member to the h
    // smallest-id docs of the bucket (candidate volume ×h, still
    // candidate-linear; h = bucket size degenerates to the pair-complete
    // graph). h=1 keeps the cheap partial-agg path — no per-bucket sort.
    val hubs =
      if (numHubs == 1)
        bands.groupBy(col("band"), col("key")).agg(min(col(idCol)).as("_hub"))
      else {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("band"), col("key")).orderBy(col(idCol))
        bands.withColumn("_hr", row_number().over(w))
          .filter(col("_hr") <= numHubs)
          .select(col("band"), col("key"), col(idCol).as("_hub"))
      }
    bands.join(hubs, Seq("band", "key"))
      .filter(col(idCol) > col("_hub"))
      .select(col("_hub").as("doc_a"), col(idCol).as("doc_b")).distinct()
  }

  /** Rescue-wave candidates — the detached-member fix that makes the star
    * graph's clusters EXACTLY the pair-complete ([[lshCandidates]]) clusters
    * at candidate-linear + failure-proportional cost. `failedEdges` is the
    * set of star edges (doc_a = hub, doc_b = member) that failed the τ
    * threshold; the member re-probes THE BUCKET WHOSE hub edge failed,
    * pairing with every non-hub co-member of that bucket. Returns
    * (doc_a < doc_b), distinct.
    *
    * Exactness theorem (pinned in ExtSpec, recomputed by check_q286): let
    * E70 be the thresholded pair-complete edge set and E* = thresholded
    * star(h=1) ∪ thresholded rescue edges. E* ⊆ E70 (every rescue pair is
    * a co-bucket pair scored by the same jaccard and τ), and E* preserves
    * E70's connectivity: for any (x,y) ∈ E70 co-bucketed in B with hub h,
    * either x = h (then (x,y) is a star edge of B, and it passed τ because
    * it is in E70), or both hub edges (h,x),(h,y) passed τ (then x–h–y
    * already connects x,y in E*), or one of them failed IN BUCKET B —
    * whose re-probe of exactly B regenerates (x,y), which passes τ. A
    * subgraph with the same connectivity has identical connected
    * components, hence identical min-id cluster labels.
    *
    * Cost: candidate volume is Σ_buckets f_b·m_b (f_b = members of the
    * bucket whose OWN hub edge failed, m_b = bucket size) — proportional
    * to the FAILURE count, not C(m,2). τ-homogeneous buckets (exact-copy
    * groups, near-clique profiles) produce zero failures and therefore
    * zero rescue work; the wave's size is exactly the size of the star
    * approximation's error surface. Per-bucket scoping matters on a dense
    * crawl: a doc in `bands` buckets that failed in one re-probes one, not
    * all (sf10nd: 6.1M candidates vs 9.9M under a global failed-doc set).
    * Hub-side failures need no rescue: a hub's own-bucket pairs are
    * already star edges, and in buckets where it is a member its failures
    * there are member-side failures.
    */
  def lshStarRescueCandidates(sigs: DataFrame, idCol: String,
                              numHashes: Int, bandSize: Int,
                              failedEdges: DataFrame): DataFrame = {
    val bands = bandRows(sigs, idCol, numHashes, bandSize)
    // Same partial-aggregatable hub groupBy as lshStarCandidates h=1 — the
    // rescue is defined relative to the single-hub star graph.
    val hubs = bands.groupBy(col("band"), col("key")).agg(min(col(idCol)).as("_hub"))
    val withHub = bands.join(hubs, Seq("band", "key"))
    // (bucket, member) incidences whose own hub edge failed: the semi-join
    // keys on BOTH endpoints, so only the failing bucket re-probes.
    val fb = withHub.join(failedEdges,
        withHub("_hub") === failedEdges("doc_a") &&
          withHub(idCol) === failedEdges("doc_b"), "left_semi")
      .select(col(idCol).as("_f"), col("band"), col("key"))
    bands.join(fb, Seq("band", "key"))
      .join(hubs, Seq("band", "key"))
      // Drop hub-incident pairs: (hub, member) of the SAME bucket is
      // already a scored star edge; rescoring it buys nothing.
      .filter(col(idCol) =!= col("_f") && col(idCol) =!= col("_hub"))
      .select(least(col("_f"), col(idCol)).as("doc_a"),
        greatest(col("_f"), col(idCol)).as("doc_b"))
      .distinct()
  }

  /** Exact Jaccard size prefilter: j(A,B) ≥ τ forces |A| ≥ τ·|B| and
    * |B| ≥ τ·|A| (intersection ≤ min size), so pairs whose shingle-set
    * sizes are more than 1/τ apart CANNOT pass and need no intersection
    * join. Provably drops only sub-τ pairs — output-invariant for any
    * consumer that thresholds at ≥ τ — and costs two size-table hash
    * joins instead of a pairs×shingles explode. τ is passed as an exact
    * rational (num/den: τ = num/den, e.g. 1/2) so the integer-arithmetic
    * comparison has no float edge cases.
    *
    * Rounding caveat (ADVICE r12): consumers threshold on
    * `round(jaccard, 6)` ([[jaccardOnShingles]]'s default), and half-up
    * rounding admits true jaccard as low as τ − 0.5e-6. The comparison is
    * therefore widened by that margin — it keeps every pair with
    * min/max ≥ τ − 0.5e-6, i.e. min·den·2e6 ≥ max·(num·2e6 − den) — so
    * output-invariance holds for the ROUNDED threshold too, not just the
    * unrounded one. Long arithmetic: sizes < 2^31 and den·2e6 < 2^62/2^31.
    */
  def jaccardSizePrefilter(pairs: DataFrame, sh: DataFrame,
                           tauNum: Int, tauDen: Int): DataFrame = {
    val sizes = sh.groupBy(col("_id")).agg(count(lit(1)).as("_n"))
    pairs
      .join(sizes.withColumnRenamed("_id", "doc_a").withColumnRenamed("_n", "_na"), "doc_a")
      .join(sizes.withColumnRenamed("_id", "doc_b").withColumnRenamed("_n", "_nb"), "doc_b")
      .filter(least(col("_na"), col("_nb")) * lit(tauDen.toLong * 2000000L)
        >= greatest(col("_na"), col("_nb")) * lit(tauNum.toLong * 2000000L - tauDen.toLong))
      .select(col("doc_a"), col("doc_b"))
  }

  /** Asymmetric LSH candidates — the incremental-ingestion cut: INCOMING
    * docs probe the EXISTING base corpus's bands, never each other. Returns
    * (doc_a = incoming id, doc_b = base id), distinct; no `<` constraint
    * because the two id sets are disjoint by contract. Same banding as
    * [[lshCandidates]]; per-batch cost is O(|batch| · bands) probe rows
    * against the base band table, not a corpus self-join.
    */
  def lshCandidatesAgainst(incoming: DataFrame, base: DataFrame, idCol: String,
                           numHashes: Int, bandSize: Int): DataFrame = {
    val a = bandRows(incoming, idCol, numHashes, bandSize)
      .select(col(idCol).as("doc_a"), col("band"), col("key"))
    val b = bandRows(base, idCol, numHashes, bandSize)
      .select(col(idCol).as("doc_b"), col("band"), col("key"))
    a.join(b, Seq("band", "key")).select("doc_a", "doc_b").distinct()
  }

  /** One row per (doc, band) with the band's concatenated signature key —
    * the shared explode behind both candidate joins.
    */
  private def bandRows(sigs: DataFrame, idCol: String,
                       numHashes: Int, bandSize: Int): DataFrame = {
    val numBands = numHashes / bandSize
    sigs.select(col(idCol),
      explode(array((0 until numBands).map { b =>
        struct(lit(b).as("band"),
          concat((b * bandSize until (b + 1) * bandSize).map(i => col(s"sig$i")): _*).as("key"))
      }: _*)).as("bk"))
      .select(col(idCol), col("bk.band").as("band"), col("bk.key").as("key"))
  }

  /** Exploded DISTINCT shingle rows (_id, _s) per document — the input both
    * the candidate-pair Jaccard and the pair-set Jaccard consume. Exposed so
    * callers can persist/share one materialization across queries.
    */
  def shingleRows(docs: DataFrame, idCol: String, textCol: Column,
                  shingleSize: Int): DataFrame =
    docs.select(col(idCol).as("_id"),
      explode(array_distinct(shingles(Tokenizer.tokens(textCol), shingleSize))).as("_s"))

  /** DISTINCT shingle set per document as ONE array row (_id, _sa) — the
    * narrow-join twin of [[shingleRows]]. Derived per-row from the docs
    * (no shuffle at any scale); a document's shingle set is bounded by its
    * own length, so the row stays executor-friendly even on crawl docs.
    */
  def shingleArrays(docs: DataFrame, idCol: String, textCol: Column,
                    shingleSize: Int): DataFrame =
    docs.select(col(idCol).as("_id"),
      array_distinct(shingles(Tokenizer.tokens(textCol), shingleSize)).as("_sa"))

  /** Exact shingle-set Jaccard for given (doc_a, doc_b) candidate pairs:
    * explode distinct shingles per doc, equi-join, count; |A∩B|/(|A|+|B|-|A∩B|).
    */
  def jaccard(pairs: DataFrame, docs: DataFrame, idCol: String, textCol: Column,
              shingleSize: Int, roundTo: Int = 6): DataFrame = {
    // Array form: the per-doc shingle set feeds both pair sides; persist so
    // tokenize+shingle runs once per job, not twice. Bounded: |docs| rows,
    // one bounded array each. Result-identical to the exploded-row form —
    // see jaccardOnArrays.
    val arrs = graft.runtime.Stage.scopedPersist(
      shingleArrays(docs, idCol, textCol, shingleSize))
    jaccardOnArrays(pairs, arrs, roundTo)
  }

  /** Exact Jaccard over a prebuilt per-doc shingle-ARRAY table from
    * [[shingleArrays]] — result-identical to [[jaccardOnShingles]] over the
    * exploded form (same integer |A∩B|/|A|/|B|, same double division and
    * rounding; pairs with an empty/absent shingle set on either side are
    * dropped exactly as the exploded form's inner size join drops them).
    *
    * Why this form (guide §2.3/§2.4 — fewer shuffles, fewer bytes): the
    * exploded form pays a sizes groupBy over every shingle row, a join
    * that shuffles the whole shingle table by doc, a second join that
    * shuffles the |pairs|·|shingles-per-doc| intersection explode by
    * (doc, shingle), a pair-grouped count, and three joins back — ~6
    * exchanges, the widest carrying pairs×shingles rows. Here the pair
    * list joins the array table twice (doc-keyed equi-joins, broadcast
    * when the corpus side is small enough) and the intersection runs
    * per-row inside codegen'd collection expressions — 2 exchanges, none
    * wider than |pairs| rows + one array payload per side.
    *
    * `tau` (num, den): optional exact-rational size prefilter applied
    * BETWEEN the joins and BEFORE the intersection — the
    * [[jaccardSizePrefilter]] predicate (incl. its rounding-slack margin)
    * rendered as a per-row filter on the already-joined sizes, so pairs
    * that provably cannot reach τ skip the intersect entirely and no
    * extra size-table joins exist at all. Output-invariant for consumers
    * thresholding at ≥ τ on the rounded jaccard, exactly as documented on
    * [[jaccardSizePrefilter]].
    */
  def jaccardOnArrays(pairs: DataFrame, arrs: DataFrame, roundTo: Int = 6,
                      tau: Option[(Int, Int)] = None): DataFrame = {
    val aa = arrs.select(col("_id").as("doc_a"), col("_sa").as("_saa"))
    val ab = arrs.select(col("_id").as("doc_b"), col("_sa").as("_sab"))
    val joined = pairs.join(aa, "doc_a").join(ab, "doc_b")
      .withColumn("_na", size(col("_saa")).cast("long"))
      .withColumn("_nb", size(col("_sab")).cast("long"))
      .filter(col("_na") > 0 && col("_nb") > 0)
    val prefiltered = tau match {
      case Some((num, den)) =>
        joined.filter(least(col("_na"), col("_nb")) * lit(den.toLong * 2000000L)
          >= greatest(col("_na"), col("_nb")) * lit(num.toLong * 2000000L - den.toLong))
      case None => joined
    }
    prefiltered
      .withColumn("_inter",
        size(array_intersect(col("_saa"), col("_sab"))).cast("long"))
      .withColumn("jaccard", round(col("_inter").cast("double")
        / (col("_na") + col("_nb") - col("_inter")), roundTo))
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** Jaccard over a prebuilt (and typically persisted/shared) shingle-row
    * table from [[shingleRows]].
    */
  def jaccardOnShingles(pairs: DataFrame, sh: DataFrame, roundTo: Int = 6): DataFrame = {
    val sizes = sh.groupBy("_id").agg(count(lit(1)).as("_n"))
    // Shingle equality is part of the join condition (hash join on
    // (doc, shingle)) — NOT a post-join filter, which would cross every
    // shingle of a with every shingle of b per candidate pair.
    val shB = sh.select(col("_id").as("doc_b"), col("_s"))
    val inter = pairs
      .join(sh.withColumnRenamed("_id", "doc_a"), "doc_a")
      .join(shB, Seq("doc_b", "_s"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("_inter"))
    pairs
      .join(inter, Seq("doc_a", "doc_b"), "left")
      .na.fill(0L, Seq("_inter"))
      .join(sizes.withColumnRenamed("_id", "doc_a").withColumnRenamed("_n", "_na"), "doc_a")
      .join(sizes.withColumnRenamed("_id", "doc_b").withColumnRenamed("_n", "_nb"), "doc_b")
      .withColumn("jaccard", round(col("_inter").cast("double")
        / (col("_na") + col("_nb") - col("_inter")), roundTo))
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** 32-bit SimHash over a token multiset (tf-weighted): per bit j, sum
    * tf·(±1) where the sign is bit j of the token's md5; bit set iff sum > 0.
    * Pure-Scala (per-row) — the Spark side is a UDF; unit-tested, no oracle
    * (bit twiddling is not worth expressing in SQL).
    */
  def simhash32(tokens: Seq[String]): Int = {
    val votes = new Array[Long](32)
    val counts = tokens.groupBy(identity).view.mapValues(_.size)
    for ((tok, tf) <- counts) {
      val md = java.security.MessageDigest.getInstance("MD5").digest(tok.getBytes("UTF-8"))
      // first 4 bytes -> 32-bit hash
      val h = ((md(0) & 0xffL) << 24) | ((md(1) & 0xffL) << 16) | ((md(2) & 0xffL) << 8) | (md(3) & 0xffL)
      var j = 0
      while (j < 32) {
        if (((h >> j) & 1L) == 1L) votes(j) += tf else votes(j) -= tf
        j += 1
      }
    }
    var out = 0
    for (j <- 0 until 32) if (votes(j) > 0) out |= (1 << j)
    out
  }

  val simhashUdf = udf((text: String) => simhash32(Tokenizer.tokenize(text)))

  /** Hamming distance between two simhashes (for near-dup thresholding). */
  def hamming(a: Int, b: Int): Int = Integer.bitCount(a ^ b)
  val hammingUdf = udf((a: Int, b: Int) => hamming(a, b))

  /** Connected components over a near-duplicate pair graph — resolves
    * pairwise matches into duplicate clusters labeled by their minimum
    * member id (the canonical doc a curator keeps).
    *
    * Hash-min label propagation: every vertex starts as its own label; each
    * round takes the min of its own and its neighbors' labels; converged
    * when no label changes. Rounds = graph diameter — duplicate clusters are
    * shallow (near-clique), so this terminates in a few rounds; each round
    * is one shuffle join, the standard BSP formulation that scales to
    * billions of edges (the large-star/small-star variant halves rounds if
    * diameters ever get long). The convergence probe is a `limit(1).count`,
    * not a full materialization.
    *
    * The iteration runs ONLY over vertices incident to at least one edge:
    * in a corpus-dedup graph the overwhelming majority of documents are in
    * no near-dup pair, and their label trivially equals their own id — they
    * are unioned back after convergence instead of being dragged through
    * every BSP round's shuffles (at 100 TB that is the difference between
    * iterating over ~billions of rows and over the pair-graph's vertices).
    *
    * vertices: one id column named `_id`. edges: (a, b) undirected.
    * Returns (_id, label).
    */
  def connectedComponents(vertices: DataFrame, edges: DataFrame,
                          maxIter: Int = 25,
                          reroot: graft.runtime.Reroot = graft.runtime.Reroot.Local): DataFrame = {
    // Symmetrize in ONE pass over `edges`: a union of two selects scans
    // the edge lineage twice, and for callers whose candidate-pair input
    // is an expensive uncached computation (a blocked edit-distance or
    // similarity scan) that doubles the most expensive stage of the whole
    // query. The explode emits both directions per input row instead.
    val sym = reroot(edges.select(explode(array(
        struct(col("a").as("src"), col("b").as("dst")),
        struct(col("b").as("src"), col("a").as("dst")))).as("_e"))
      .select(col("_e.src").as("src"), col("_e.dst").as("dst")))
    // Every iteration re-roots `labels` with an EAGER localCheckpoint:
    //  - the logical plan stays one join deep, instead of growing by two
    //    joins per round (re-analysis/optimization of an N-round lineage is
    //    quadratic in N and dominates wall-clock long before the data does);
    //  - unlike `persist`, a checkpointed frame is a plain LogicalRDD, so
    //    AQE is free to coalesce the iteration's tiny shuffles (cached-plan
    //    output partitioning is pinned by default, checkpoints aren't);
    //  - blocks of dropped iterations are reclaimed by the ContextCleaner
    //    when their RDDs go unreferenced.
    // On a multi-executor cluster localCheckpoint trades fault-tolerance
    // for speed (executor loss forfeits the blocks and fails the job — the
    // loop would restart); pass `reroot = Reroot.Reliable(dir)` where that
    // tradeoff reverses (see graft.runtime.Reroot).
    // The loop-carried label frame goes through rolling(): each round's
    // reliable checkpoint supersedes the previous round's, whose files are
    // deleted as soon as the new round materializes (sym stays on the base
    // strategy — it is live for every round).
    val roll = graft.runtime.Reroot.rolling(reroot)
    val debug = sys.props.get("graft.cc.debug").contains("true")
    var t0 = System.nanoTime()
    var labels = roll(sym.select(col("src").as("_id")).distinct()
      .select(col("_id"), col("_id").as("label")))
    if (debug) println(f"[cc] init ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      t0 = System.nanoTime()
      val nbrMin = sym.join(labels, col("dst") === col("_id"))
        .groupBy(col("src")).agg(min(col("label")).as("_nl"))
      // Carry the previous label alongside the new one so the convergence
      // probe is a filter over the just-materialized frame — not an extra
      // self-join per round.
      val next = roll(labels.join(nbrMin, col("_id") === col("src"), "left")
        .select(col("_id"),
          least(col("label"), coalesce(col("_nl"), col("label"))).as("label"),
          col("label").as("_old")))
      val t1 = System.nanoTime()
      converged = next.filter(col("label") =!= col("_old")).limit(1).isEmpty
      if (debug) println(f"[cc] round $i step ${(t1 - t0) / 1e9}%6.2f s " +
        f"probe ${(System.nanoTime() - t1) / 1e9}%6.2f s")
      labels = next.select(col("_id"), col("label"))
      i += 1
    }
    if (!converged)
      // Partially-propagated labels are silently WRONG (two vertices of one
      // component keep different labels) — fail loudly rather than return
      // them. maxIter bounds the component diameter, which for near-dup
      // clusters is tiny; hitting it means the input is not what this
      // operator is for.
      throw new IllegalStateException(
        s"connectedComponents did not converge within $maxIter iterations; " +
          "label propagation needs more rounds than the configured bound")
    // Register the loop-final persist with the query scope so SparkEntry's
    // newQueryScope() releases it — otherwise each invocation leaks a
    // block-manager cache entry for the session lifetime.
    graft.runtime.Stage.scopedPersist(labels)
    // Isolated vertices (no incident edge) never entered the iteration;
    // their label is their own id. Endpoints come from the CHECKPOINTED
    // `sym` (src alone covers both directions), not from two more scans
    // of the raw edge lineage.
    val isolated = vertices.select(col("_id"))
      .join(sym.select(col("src").as("_id")).distinct(),
        Seq("_id"), "left_anti")
      .select(col("_id"), col("_id").as("label"))
    labels.union(isolated)
  }

  /** Large-star/small-star connected components (Kiveris, Lattanzi,
    * Mirrokni, Rastogi, Vassilvitskii — "Connected Components in MapReduce
    * and Beyond", SoCC 2014): same signature and output contract as
    * [[connectedComponents]], but converging in O(log n) ROUNDS instead of
    * O(component diameter) — the variant for graphs whose components can
    * be LONG CHAINS (the span-chain topology Lee et al. ACL '22 document
    * in crawl near-dup data), where hash-min propagation at 100× scale
    * would exceed any fixed round bound (VERDICT r12 task 4).
    *
    * Each round rewrites the edge set:
    *  - large-star: every node u connects its STRICTLY LARGER neighbors
    *    to m(u) = min(Γ(u) ∪ {u});
    *  - small-star: every edge directed large→small; each node u connects
    *    its (all smaller) neighbors and itself to m(u) = min(Γ(u)).
    * Both operations preserve connectivity (each replaced edge (u,v)
    * stays connected through m(u)); fixed points are exactly star forests
    * rooted at component minima, so the converged edge set IS the label
    * map. Rounds shrink the graph geometrically — the property hash-min
    * lacks, where a diameter-d chain needs d rounds.
    *
    * Per round: two partial-aggregatable groupBys (the per-node min) and
    * two joins back — the same shuffle shape as one hash-min round, so
    * the shallow near-dup default stays on [[connectedComponents]] (its
    * rounds are marginally cheaper and 2-3 suffice); this variant is the
    * escape hatch that keeps deep components from hitting the loud
    * maxIter throw. Convergence probe: a count compare per round, with an
    * exact exceptAll check only when counts match.
    */
  def connectedComponentsStar(vertices: DataFrame, edges: DataFrame,
                              maxIter: Int = 50,
                              reroot: graft.runtime.Reroot = graft.runtime.Reroot.Local): DataFrame = {
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.select(explode(array(
          struct(col("a").as("src"), col("b").as("dst")),
          struct(col("b").as("src"), col("a").as("dst")))).as("_e"))
        .select(col("_e.src").as("src"), col("_e.dst").as("dst"))
      val mins = sym.groupBy(col("src")).agg(min(col("dst")).as("_mn"))
      sym.join(mins, "src")
        .filter(col("dst") > col("src"))
        .select(col("dst").as("a"), least(col("src"), col("_mn")).as("b"))
        .filter(col("a") =!= col("b")).distinct()
    }
    def smallStar(e: DataFrame): DataFrame = {
      val dir = e.select(greatest(col("a"), col("b")).as("src"),
          least(col("a"), col("b")).as("dst"))
        .filter(col("src") =!= col("dst"))
      val mins = dir.groupBy(col("src")).agg(min(col("dst")).as("_mn"))
      dir.join(mins, "src")
        .filter(col("dst") =!= col("_mn"))
        .select(col("dst").as("a"), col("_mn").as("b"))
        .union(mins.select(col("src").as("a"), col("_mn").as("b")))
        .distinct()
    }
    val roll = graft.runtime.Reroot.rolling(reroot)
    var cur = roll(edges.select(col("a"), col("b"))
      .filter(col("a") =!= col("b")).distinct())
    // Edge-incident vertices, captured from the INPUT edge set — the
    // iteration rewrites edges, and isolated vertices (the overwhelming
    // majority in a corpus dedup graph) never enter it, exactly as in
    // [[connectedComponents]].
    val incident = graft.runtime.Stage.scopedPersist(
      cur.select(explode(array(col("a"), col("b"))).as("_id")).distinct())
    var curCount = cur.count()
    var converged = curCount == 0L
    var i = 0
    while (!converged && i < maxIter) {
      val next = roll(smallStar(largeStar(cur)))
      val nextCount = next.count()
      converged = nextCount == curCount &&
        next.exceptAll(cur).limit(1).isEmpty
      cur = next
      curCount = nextCount
      i += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponentsStar did not converge within $maxIter rounds")
    // The fixed point is a star forest (v → component min): labels are the
    // edges themselves plus each root labelling itself.
    val labels = cur.select(col("a").as("_id"), col("b").as("label"))
      .union(cur.select(col("b").as("_id"), col("b").as("label")))
      .distinct()
    graft.runtime.Stage.scopedPersist(labels)
    val isolated = vertices.select(col("_id"))
      .join(incident, Seq("_id"), "left_anti")
      .select(col("_id"), col("_id").as("label"))
    labels.union(isolated)
  }
}
