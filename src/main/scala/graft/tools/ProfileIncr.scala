package graft.tools

import graft.ext.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only stage profiler for the q288 incremental-dedup lane: times each
  * internal stage of the incremental construction in isolation so the r13
  * optimization targets measurements, not guesses. Mirrors
  * ExtQueries.incrementalClusters stage by stage. Not part of the driver
  * contract.
  */
object ProfileIncr {
  private val SH = 3
  private val NH = 8
  private val BAND = 2

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    graft.runtime.GraftScale.configure(sfDir)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[incrprof] $name%-42s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    val st = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val sigs = Dedup.minhashSignatures(graft.ops.Ops.fanOut(docs),
      "doc_id", col("text"), SH, NH).persist(st)
    val sh = Dedup.shingleArrays(graft.ops.Ops.fanOut(docs),
      "doc_id", col("text"), SH).persist(st)
    time("warm sigs")(noop(sigs))
    time("warm shingle arrays")(noop(sh))

    val incSigs = sigs.filter(col("doc_id") % 10 === 9)
    val baseSigs = sigs.filter(col("doc_id") % 10 =!= 9)

    def starRescue(part: DataFrame, tag: String): DataFrame = {
      val cands = time(s"$tag star candidates")(
        { val c = Dedup.lshStarCandidates(part, "doc_id", NH, BAND); noop(c); c })
      val scored = Dedup.jaccardOnArrays(cands, sh).persist(st)
      time(s"$tag scored (jaccardOnArrays)")(noop(scored))
      val failed = scored.filter(col("jaccard") < 0.5)
        .select(col("doc_a"), col("doc_b"))
      val rescueScored = time(s"$tag rescue scored (arrays+tau)")(
        { val r = Dedup.jaccardOnArrays(
            Dedup.lshStarRescueCandidates(part, "doc_id", NH, BAND, failed),
            sh, tau = Some((1, 2))); noop(r); r })
      scored.filter(col("jaccard") >= 0.5).select(col("doc_a"), col("doc_b"))
        .union(rescueScored.filter(col("jaccard") >= 0.5)
          .select(col("doc_a"), col("doc_b")))
    }

    val baseEdges = starRescue(baseSigs, "base").persist(st)
    time("base edges materialize")(noop(baseEdges))
    val baseVerts = docs.filter(col("doc_id") % 10 =!= 9)
      .select(col("doc_id").as("_id"))
    val baseLabels = time("base CC build+materialize")(
      { val l = Dedup.connectedComponents(baseVerts,
          baseEdges.select(col("doc_a").as("a"), col("doc_b").as("b")))
          .persist(st)
        noop(l); l })

    val incEdges = starRescue(incSigs, "inc").persist(st)
    time("inc edges materialize")(noop(incEdges))

    val cross = Dedup.jaccardOnArrays(
        Dedup.lshCandidatesAgainst(incSigs, baseSigs, "doc_id", NH, BAND),
        sh, tau = Some((1, 2)))
      .filter(col("jaccard") >= 0.5)
      .select(col("doc_a"), col("doc_b")).persist(st)
    time("cross scored (arrays+tau)")(noop(cross))

    val touched = baseLabels.join(
        cross.select(col("doc_b").as("_id")).distinct(), Seq("_id"), "left_semi")
      .select(col("label").as("_tc")).distinct()
    val touchedMembers = baseLabels.join(touched,
      baseLabels("label") === touched("_tc"), "left_semi").persist(st)
    time("touched members")(noop(touchedMembers))
    val labelStars = touchedMembers.filter(col("_id") =!= col("label"))
      .select(col("label").as("a"), col("_id").as("b"))
    val verts = docs.filter(col("doc_id") % 10 === 9)
      .select(col("doc_id").as("_id"))
      .union(touchedMembers.select(col("_id")))
    val edges = incEdges.union(cross)
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
      .union(labelStars)
    val merged = time("merge CC build+materialize")(
      { val m = Dedup.connectedComponents(verts, edges); noop(m); m })
    val untouched = baseLabels.join(touched,
      baseLabels("label") === touched("_tc"), "left_anti")
    time("final union")(noop(merged.union(untouched)))
    spark.stop()
  }
}
