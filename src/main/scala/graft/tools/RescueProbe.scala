package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.Dedup

/** One-off sizing probe for the q286 rescue wave: candidate volumes under
  * the global-failure-set rescue vs the per-bucket-failure rescue, plus
  * stage timings. Diagnostic only — not part of the driver surface.
  * Usage: runMain graft.tools.RescueProbe <sfDir>
  */
object RescueProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (sh, nh, band) = (3, 8, 2)
    def timed[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val sigs = Dedup.minhashSignatures(docs, "doc_id", col("text"), sh, nh)
      .persist()
    val shr = Dedup.shingleRows(docs, "doc_id", col("text"), sh).persist()
    val star = Dedup.lshStarCandidates(sigs, "doc_id", nh, band).persist()
    println(s"[probe] star pairs: ${timed("star count")(star.count())}")
    val scored = timed("star scoring")(
      Dedup.jaccardOnShingles(star, shr).persist())
    scored.count()
    val failedPairs = scored.filter(col("jaccard") < 0.5)
      .select(col("doc_a"), col("doc_b")).persist()
    println(s"[probe] failed pairs: ${failedPairs.count()}")
    val failedDocs = failedPairs.select(col("doc_b").as("doc_id")).distinct().persist()
    println(s"[probe] failed member docs: ${failedDocs.count()}")

    val bands = sigs.select(col("doc_id"),
      explode(array((0 until nh / band).map { b =>
        struct(lit(b).as("band"),
          concat((b * band until (b + 1) * band).map(i => col(s"sig$i")): _*).as("key"))
      }: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
    val hubs = bands.groupBy(col("band"), col("key")).agg(min(col("doc_id")).as("_hub"))

    // GLOBAL-failure rescue (the comparison leg the per-bucket scoping is
    // measured against): every doc with ANY failed hub edge re-probes ALL
    // of its buckets, pairing with every co-bucket member except itself
    // and the hub. Built inline — Dedup.lshStarRescueCandidates keys its
    // semi-join on (hub, member) failed EDGES, not a failed-doc set
    // (ADVICE r12: passing failedDocs there is a schema mismatch).
    val globalRescue = timed("global rescue cands")(
      bands.join(failedDocs.withColumnRenamed("doc_id", "_f"),
          bands("doc_id") === col("_f"), "left_semi")
        .select(col("doc_id").as("_f"), col("band"), col("key"))
        .join(bands, Seq("band", "key"))
        .join(hubs, Seq("band", "key"))
        .filter(col("doc_id") =!= col("_f") && col("doc_id") =!= col("_hub"))
        .select(least(col("_f"), col("doc_id")).as("doc_a"),
          greatest(col("_f"), col("doc_id")).as("doc_b"))
        .distinct().count())
    println(s"[probe] global rescue candidates: $globalRescue")
    val members = bands.join(hubs, Seq("band", "key"))
      .filter(col("doc_id") =!= col("_hub"))
    val failedBandRows = members.join(failedPairs,
      members("_hub") === failedPairs("doc_a") &&
        members("doc_id") === failedPairs("doc_b"), "left_semi")
      .select(col("doc_id").as("_f"), col("band"), col("key"))
    val perBucket = timed("per-bucket rescue cands")(
      bands.join(failedBandRows, Seq("band", "key"))
        .join(hubs, Seq("band", "key"))
        .filter(col("doc_id") =!= col("_f") && col("doc_id") =!= col("_hub"))
        .select(least(col("_f"), col("doc_id")).as("doc_a"),
          greatest(col("_f"), col("doc_id")).as("doc_b"))
        .distinct().count())
    println(s"[probe] per-bucket rescue candidates: $perBucket")

    val pb = bands.join(failedBandRows, Seq("band", "key"))
      .join(hubs, Seq("band", "key"))
      .filter(col("doc_id") =!= col("_f") && col("doc_id") =!= col("_hub"))
      .select(least(col("_f"), col("doc_id")).as("doc_a"),
        greatest(col("_f"), col("doc_id")).as("doc_b"))
      .distinct()
    val sizes = shr.groupBy(col("_id")).agg(count(lit(1)).as("_n"))
    val withSizes = pb
      .join(sizes.withColumnRenamed("_id", "doc_a").withColumnRenamed("_n", "_na"), "doc_a")
      .join(sizes.withColumnRenamed("_id", "doc_b").withColumnRenamed("_n", "_nb"), "doc_b")
    val surviving = timed("size-filter pass")(
      withSizes.filter(least(col("_na"), col("_nb")).cast("double")
        >= greatest(col("_na"), col("_nb")) * 0.5).count())
    println(s"[probe] per-bucket + size-ratio-filter candidates: $surviving")
    // dedup vs star pairs
    val minusStar = timed("anti star")(
      pb.join(star, Seq("doc_a", "doc_b"), "left_anti").count())
    println(s"[probe] per-bucket minus star pairs: $minusStar")
    spark.stop()
  }
}
