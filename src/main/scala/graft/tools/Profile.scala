package graft.tools

import graft.ext.Dedup
import graft.io.Tables
import graft.text.Tokenizer
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage profiler: times individual sub-stages of the bench
  * hotspots so optimization targets measurements, not guesses.
  * Not part of the driver contract.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Same scale-adaptive knobs as Bench/Verify: without this a sf1 profile
    // run would cache deserialized stages and hit the GC-storm mode the SER
    // switch exists to prevent.
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
      println(f"[profile] $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val SH = 3; val NH = 8; val BAND = 2

    val docs = Tables.documents(spark, sfDir)
    time("docs count")(docs.count())
    val toks = docs.select(col("doc_id"), Tokenizer.tokens(col("text")).as("t"))
    time("tokenize only")(toks.write.mode("overwrite").format("noop").save())
    val sh0 = docs.select(col("doc_id"),
      Dedup.shingles(Tokenizer.tokens(col("text")), SH).as("sh"))
    time("shingles")(sh0.write.mode("overwrite").format("noop").save())
    val sigs = Dedup.minhashSignatures(docs, "doc_id", col("text"), SH, NH)
    time("minhash sigs")(sigs.write.mode("overwrite").format("noop").save())
    val cands = Dedup.lshCandidates(sigs, "doc_id", NH, BAND)
    time("lsh candidates (sigs not cached)")(cands.write.mode("overwrite").format("noop").save())
    val jac = Dedup.jaccard(cands, docs, "doc_id", col("text"), SH)
    time("q26 full jaccard over candidates")(jac.write.mode("overwrite").format("noop").save())

    val ids = docs.select(col("doc_id"))
    val pairs = ids.select(col("doc_id").as("doc_a"))
      .join(ids.select(col("doc_id").as("doc_b")), col("doc_b") === col("doc_a") + 1)
    val jac27 = Dedup.jaccard(pairs, docs, "doc_id", col("text"), SH)
    time("q27 jaccard consecutive pairs")(jac27.write.mode("overwrite").format("noop").save())

    // ---- q40 TextRank stages ----
    import graft.model.{Scene, SimilarityAlgorithm}
    import graft.pipelines.{RecommendPipeline, TextRankKeywords}
    import java.sql.Date
    val scene = Scene(windowSize = 5, numNewsKeywords = 5, numUserKeywords = 8,
      numDays = 7, fromDate = Date.valueOf("2024-01-05"), toDate = Date.valueOf("2024-01-25"),
      friction = 0.85, maxIterates = 30, minDifference = 1e-4, numRecommendations = 5,
      similarityAlgorithm = SimilarityAlgorithm.EuclideanDistance)
    val news = Tables.news(spark, sfDir)
    val clicks = Tables.clicks(spark, sfDir)
    val newsKwRaw = TextRankKeywords.newsKeywords(news, scene)
    time("q40 newsKeywords (textrank udf)")(newsKwRaw.write.mode("overwrite").format("noop").save())
    val userTweets = clicks.select(col("userId"), col("newsId"))
      .join(news.select(col("id"), col("content")), col("newsId") === col("id"))
      .select(col("userId"), col("content"))
    time("q40 userTweets join")(userTweets.write.mode("overwrite").format("noop").save())
    val userKw = TextRankKeywords.userKeywords(userTweets, scene)
    time("q40 userKeywords (clique vote)")(userKw.write.mode("overwrite").format("noop").save())
    val newsKw = newsKwRaw.join(news.select(col("id"), col("date")), "id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val userKwP = userKw.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rec = RecommendPipeline.recommendAll(userKwP, newsKw, clicks, scene,
      limit = Some(scene.numRecommendations), scoreRound = Some(6),
      serving = graft.model.RecServing.Exact)
    time("q40 recommendAll (kw persisted)")(rec.write.mode("overwrite").format("noop").save())

    // ---- recommendAll internals (persisted kw inputs) ----
    {
      val activeUsers = graft.ops.Ops.distinctUsersPerDay(clicks)
        .filter(col("date").between(lit(scene.fromDate), lit(scene.toDate)))
        .withColumnRenamed("date", "day")
      time("ra activeUsers")(activeUsers.write.mode("overwrite").format("noop").save())
      val relevantNews = newsKw.filter(col("date")
        .between(lit(scene.fromDate), date_add(lit(scene.toDate), scene.numDays)))
      val userWords = userKwP.join(activeUsers.select("userId").distinct(), "userId")
      val scored = userWords.select(col("userId"), col("word"), col("value").as("_lv"))
        .join(relevantNews.select(col("id"), col("word"), col("value").as("_rv")), "word")
        .groupBy(col("userId"), col("id"))
        .agg(sum(col("_lv") * col("_rv")).as("score"))
      val pairCount = time("ra word-join pair count")(
        scored.count())
      println(s"[profile] ra scored pairs = $pairCount")
      val rounded = scored.withColumn("score", round(col("score"), 6))
        .filter(col("score") > 0).select(col("userId"), col("id"), col("score"))
      time("ra scored+rounded noop")(rounded.write.mode("overwrite").format("noop").save())
      val withDate = rounded.join(newsKw.select("id", "date").distinct(), "id")
      val pre = graft.ops.Ops.topKPerGroup(withDate, Seq("userId", "date"),
        Seq(col("score").desc, col("id").asc), 5, rankCol = "_prn").drop("_prn")
      time("ra pre-rank window")(pre.write.mode("overwrite").format("noop").save())
      val exploded = pre.withColumn("day", explode(sequence(
          greatest(date_sub(col("date"), scene.numDays), lit(scene.fromDate)),
          least(col("date"), lit(scene.toDate)), expr("interval 1 day"))))
        .join(activeUsers, Seq("day", "userId"), "left_semi")
        .select(col("day").as("date"), col("userId"), col("id").as("newsId"), col("score"))
      val ranked = graft.ops.Ops.topKPerGroup(exploded, Seq("date", "userId"),
        Seq(col("score").desc, col("newsId").asc), 5)
      val out = ranked.groupBy(col("userId"), col("date"))
        .agg(transform(array_sort(collect_list(struct(col("rn"), col("newsId")))),
          x => x("newsId")).as("news"))
      time("ra final rank+collect")(out.write.mode("overwrite").format("noop").save())
    }

    // ---- profiles() chain (q21/q22/q23/q46 shared) ----
    val t0 = System.nanoTime()
    val toksrc = docs.select(col("doc_id"), explode(Tokenizer.tokens(col("text"))).as("word"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tf = toksrc.groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dfreq = tf.groupBy("word").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val newsScored = tf.join(dfreq, "word").crossJoin(broadcast(n))
      .withColumn("value", round(col("tf") * log(col("n_docs") / col("df")), 6))
    val newsKw2 = graft.ops.Ops.topKPerGroup(
        newsScored.select(col("doc_id"), col("word"), col("value")),
        Seq("doc_id"), Seq(col("value").desc, col("word").asc), 8)
      .select(col("doc_id").as("id"), col("word"), col("value"))
    val newsKwDated = newsKw2.join(Tables.news(spark, sfDir).select(col("id"), col("date")), "id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    newsKwDated.write.mode("overwrite").format("noop").save()
    println(f"[profile] profiles newsKw chain               ${(System.nanoTime() - t0) / 1e9}%8.2f s")

    // ---- q70 CC internals ----
    {
      val st = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
      val sigs2 = Dedup.minhashSignatures(graft.ops.Ops.fanOut(docs),
        "doc_id", col("text"), SH, NH).persist(st)
      val sh = Dedup.shingleRows(graft.ops.Ops.fanOut(docs),
        "doc_id", col("text"), SH).persist(st)
      val cands2 = Dedup.lshCandidates(sigs2, "doc_id", NH, BAND).persist(st)
      val scored = Dedup.jaccardOnShingles(cands2, sh).persist(st)
      time("q70 scored pairs materialize")(
        scored.write.mode("overwrite").format("noop").save())
      val dup = scored.filter(col("jaccard") >= 0.5)
        .select(col("doc_a").as("a"), col("doc_b").as("b")).persist(st)
      println(s"[profile] q70 dup edges = ${time("q70 dup edge count")(dup.count())}")
      val verts = docs.select(col("doc_id").as("_id"))
      val cc = time("q70 connectedComponents build")(
        Dedup.connectedComponents(verts, dup))
      time("q70 connectedComponents materialize")(
        cc.write.mode("overwrite").format("noop").save())
    }

    spark.stop()
  }
}
