package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.Dedup

/** q288 pricing probe (VERDICT r12 task 3's "per-batch cost independent
  * of |base|"): times the INCREMENTAL merge — batch star+rescue edges +
  * asymmetric cross band probe + touched-cluster label-star CC — against
  * pre-materialized base state, for a FIXED batch (doc_id % 10 = 9) and
  * VARYING base sizes (doc_id % 10 in 0..2 → 30%, 0..8 → 90%), plus the
  * full-union star+rescue run (the q286 posture on base ∪ batch) as the
  * re-cluster-everything comparison. Base state (signatures, shingles,
  * labels) is persisted and counted BEFORE the timer starts — in
  * production it is loaded, not recomputed. One JSON line per run.
  *
  * Usage: runMain graft.tools.IncrementalProbe <ndDir> <outJsonPath>
  */
object IncrementalProbe {
  private val SH = 3
  private val NH = 8
  private val BAND = 2

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val outJson = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$dir/documents.parquet")

    def sigsOf(part: DataFrame): DataFrame =
      Dedup.minhashSignatures(part, "doc_id", col("text"), SH, NH)
    def shOf(part: DataFrame): DataFrame =
      Dedup.shingleRows(part, "doc_id", col("text"), SH)

    /** Star+rescue thresholded edges of one part (the ExtQueries
      * construction, re-derived from Dedup primitives for the probe).
      */
    def starRescueEdges(sigs: DataFrame, sh: DataFrame): DataFrame = {
      val scored = Dedup.jaccardOnShingles(
        Dedup.lshStarCandidates(sigs, "doc_id", NH, BAND), sh).persist()
      val failed = scored.filter(col("jaccard") < 0.5)
        .select(col("doc_a"), col("doc_b"))
      val rescue = Dedup.jaccardOnShingles(
        Dedup.jaccardSizePrefilter(
          Dedup.lshStarRescueCandidates(sigs, "doc_id", NH, BAND, failed),
          sh, 1, 2), sh)
      scored.filter(col("jaccard") >= 0.5).select(col("doc_a"), col("doc_b"))
        .union(rescue.filter(col("jaccard") >= 0.5)
          .select(col("doc_a"), col("doc_b")))
    }

    val results = new StringBuilder
    val batchDocs = docs.filter(col("doc_id") % 10 === 9).persist()
    val nBatch = batchDocs.count()

    for (baseMods <- Seq(3, 9)) {
      val baseDocs = docs
        .filter(col("doc_id") % 10 =!= 9 && col("doc_id") % 10 < baseMods)
        .persist()
      val nBase = baseDocs.count()
      // --- base state, materialized BEFORE the merge timer: band table,
      // shingle rows, cluster labels (production loads all three).
      val baseSigs = sigsOf(baseDocs).persist(); baseSigs.count()
      val baseSh = shOf(baseDocs).persist(); baseSh.count()
      val baseLabels = Dedup.connectedComponents(
          baseDocs.select(col("doc_id").as("_id")),
          starRescueEdges(baseSigs, baseSh)
            .select(col("doc_a").as("a"), col("doc_b").as("b")))
        .persist()
      baseLabels.count()

      // --- the merge, timed end to end.
      val t0 = System.nanoTime()
      val incSigs = sigsOf(batchDocs).persist()
      val incSh = shOf(batchDocs).persist()
      val allSh = baseSh.union(incSh)
      val incEdges = starRescueEdges(incSigs, incSh)
      val cross = Dedup.jaccardOnShingles(
          Dedup.jaccardSizePrefilter(
            Dedup.lshCandidatesAgainst(incSigs, baseSigs, "doc_id", NH, BAND),
            allSh, 1, 2), allSh)
        .filter(col("jaccard") >= 0.5)
        .select(col("doc_a"), col("doc_b")).persist()
      val nCross = cross.count()
      val touched = baseLabels.join(
          cross.select(col("doc_b").as("_id")).distinct(), Seq("_id"), "left_semi")
        .select(col("label").as("_tc")).distinct().persist()
      val nTouched = touched.count()
      val touchedMembers = baseLabels.join(touched,
        baseLabels("label") === touched("_tc"), "left_semi").persist()
      val labelStars = touchedMembers.filter(col("_id") =!= col("label"))
        .select(col("label").as("a"), col("_id").as("b"))
      val verts = batchDocs.select(col("doc_id").as("_id"))
        .union(touchedMembers.select(col("_id")))
      val edges = incEdges.union(cross)
        .select(col("doc_a").as("a"), col("doc_b").as("b"))
        .union(labelStars)
      val merged = Dedup.connectedComponents(verts, edges)
      val untouched = baseLabels.join(touched,
        baseLabels("label") === touched("_tc"), "left_anti")
      val outRows = merged.union(untouched).count()
      val mergeS = (System.nanoTime() - t0) / 1e9

      // --- the re-cluster-everything comparison (q286 posture on union).
      val unionDocs = baseDocs.union(batchDocs)
      val t1 = System.nanoTime()
      val uSigs = sigsOf(unionDocs).persist()
      val uSh = shOf(unionDocs).persist()
      val uRows = Dedup.connectedComponents(
          unionDocs.select(col("doc_id").as("_id")),
          starRescueEdges(uSigs, uSh)
            .select(col("doc_a").as("a"), col("doc_b").as("b")))
        .count()
      val fullS = (System.nanoTime() - t1) / 1e9

      results.append(
        s""""base${baseMods}0pct":{"base_docs":$nBase,"batch_docs":$nBatch,""" +
        s""""merge_s":${f"$mergeS%.1f"},"cross_edges":$nCross,""" +
        s""""touched_clusters":$nTouched,"out_rows":$outRows,""" +
        s""""full_union_s":${f"$fullS%.1f"},"union_rows":$uRows},""")
      println(f"[incr] base=$nBase batch=$nBatch merge=$mergeS%.1f s " +
        f"full-union=$fullS%.1f s cross=$nCross touched=$nTouched")
      spark.sharedState.cacheManager.clearCache()
    }

    val json = "{" + results.toString.stripSuffix(",") + "}"
    val w = new java.io.PrintWriter(outJson, "UTF-8")
    try w.println(json) finally w.close()
    println(json)
    spark.stop()
  }
}
