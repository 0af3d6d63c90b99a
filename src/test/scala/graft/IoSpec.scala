package graft

import graft.io.{CsvSources, Tables, Writers}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class IoSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft_io").toString

  test("S1-S3: schema-checked CSV loaders round-trip the entity types") {
    val dir = tmp()
    Files.writeString(java.nio.file.Paths.get(s"$dir/news.csv"),
      "id,date,title,description,content\n" +
        "1,2024-01-02,Title A,Desc A,spark flink batch\n" +
        "2,2024-01-03,Title B,Desc B,stream join scan\n")
    Files.writeString(java.nio.file.Paths.get(s"$dir/tweets.csv"),
      "userId,creation_time,content\n7,2024-01-02,spark stream\n")
    Files.writeString(java.nio.file.Paths.get(s"$dir/clicks.csv"),
      "userId,newsId,date,count\n7,1,2024-01-02,3\n")

    val news = CsvSources.loadNews(spark, s"$dir/news.csv").collect()
    assert(news.map(_.id).toSet === Set(1L, 2L))
    assert(news.find(_.id == 1L).get.date.toString === "2024-01-02")
    val tweets = CsvSources.loadTweets(spark, s"$dir/tweets.csv").collect()
    assert(tweets.head.userId === 7L && tweets.head.content === "spark stream")
    val clicks = CsvSources.loadClicks(spark, s"$dir/clicks.csv").collect()
    assert(clicks.head.count === 3)
  }

  test("K1/F15: formatted-text sink renders documents and recommendations") {
    val outDocs = tmp() + "/docs_txt"
    val docs = Seq(
      (Some(1L), None: Option[Long], Some(java.sql.Date.valueOf("2024-01-02")),
        Seq(("spark", 1.5), ("flink", 0.25)))
    ).toDF("id", "userId", "date", "kw")
      .withColumn("keywords", transform(col("kw"),
        x => struct(x("_1").as("word"), x("_2").as("value"))))
    Writers.writeFormattedText(docs, Writers.documentRender, outDocs)
    val lines = spark.read.text(outDocs).as[String].collect()
    assert(lines.toSeq === Seq("1||2024-01-02|spark:1.500000;flink:0.250000"))

    val outRecs = tmp() + "/recs_txt"
    val recs = Seq((7L, java.sql.Date.valueOf("2024-01-02"), Seq(3L, 1L, 2L)))
      .toDF("userId", "date", "news")
    Writers.writeFormattedText(recs, Writers.recommendationRender, outRecs)
    val rlines = spark.read.text(outRecs).as[String].collect()
    assert(rlines.toSeq === Seq("7|2024-01-02|3,1,2"))
  }

  test("K1 dual write: parquet round-trip preserves nested keywords") {
    val base = tmp()
    val docs = Seq((10L, Seq(("a", 1.0), ("b", 2.0))))
      .toDF("id", "kw")
      .withColumn("keywords", transform(col("kw"),
        x => struct(x("_1").as("word"), x("_2").as("value"))))
      .select("id", "keywords")
    Writers.writeDual(docs, concat_ws("|", col("id")), s"$base/pq", s"$base/txt")
    val back = spark.read.parquet(s"$base/pq")
    val kws = back.select(explode(col("keywords"))).select("col.word", "col.value")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    assert(kws === Set(("a", 1.0), ("b", 2.0)))
  }

  test("events NTZ normalization: instant-exact under UTC, loud without it") {
    // NTZ events fixture (the round-6+ driver layout)
    val dir = tmp()
    Seq((1L, 42L, "click", "2024-01-05 10:00:00"))
      .toDF("user_id", "event_id", "event_type", "w")
      .withColumn("ts", to_timestamp_ntz(col("w"))).drop("w")
      .write.parquet(s"$dir/events.parquet")

    val got = Tables.events(spark, dir)
    assert(got.schema("ts").dataType ===
      org.apache.spark.sql.types.TimestampType)
    // UTC session: the wall clock IS the instant
    assert(got.select(unix_micros(col("ts"))).head().getLong(0) ===
      1704448800000000L)

    // A consumer that forgot the UTC pin must fail the require, not read
    // silently shifted timestamps (ADVICE r6).
    val shifted = spark.newSession()
    shifted.conf.set("spark.sql.session.timeZone", "America/New_York")
    val e = intercept[IllegalArgumentException] {
      Tables.events(shifted, dir)
    }
    assert(e.getMessage.contains("timeZone=UTC"))
  }

  test("scratch sweep honors heartbeat liveness (VERDICT r8)") {
    val root = new java.io.File(System.getProperty("java.io.tmpdir"))
    val dayOld = System.currentTimeMillis() - 25L * 3600 * 1000
    // two foreign-token scratch dirs, both mtime-stale; only one owner has
    // a fresh heartbeat
    val liveDir = new java.io.File(root, "graft_lane_aaaa1111_cafe")
    val deadDir = new java.io.File(root, "graft_lane_bbbb2222_cafe")
    val liveHb = new java.io.File(root, "graft_hb_aaaa1111")
    val deadHb = new java.io.File(root, "graft_hb_bbbb2222")
    try {
      Seq(liveDir, deadDir).foreach { d =>
        d.mkdirs(); assert(d.setLastModified(dayOld))
      }
      Seq(liveHb, deadHb).foreach(f => Files.write(f.toPath, "1".getBytes))
      assert(deadHb.setLastModified(dayOld)) // dead: marker 25h stale
      graft.runtime.Scratch.sweepForTest()
      assert(liveDir.exists(), "fresh heartbeat must veto the sweep")
      assert(!deadDir.exists(), "stale heartbeat must not")
      assert(!deadHb.exists(), "stale heartbeat markers are reclaimed too")
    } finally Seq(liveDir, deadDir, liveHb, deadHb).foreach { f =>
      if (f.isDirectory) f.listFiles().foreach(_.delete()); f.delete()
    }
  }

  test("sharedCut sweep honors heartbeat liveness (VERDICT r8)") {
    import org.apache.hadoop.fs.Path
    val tmp = Files.createTempDirectory("graft-cutsweep").toFile
    val fs = new Path(tmp.getAbsolutePath)
      .getFileSystem(new org.apache.hadoop.conf.Configuration())
    val dayOld = System.currentTimeMillis() - 25L * 3600 * 1000
    val liveBase = new java.io.File(tmp, "graft-aaaa1111")
    val deadBase = new java.io.File(tmp, "graft-bbbb2222")
    try {
      Seq(liveBase, deadBase).foreach { d =>
        new java.io.File(d, "cut-1").mkdirs()
        Files.write(new java.io.File(d, "_heartbeat").toPath, "1".getBytes)
        assert(d.setLastModified(dayOld))
      }
      // dead owner: heartbeat itself is 25h stale
      assert(new java.io.File(deadBase, "_heartbeat").setLastModified(dayOld))
      graft.runtime.Stage.sweepStaleCuts(fs,
        new Path(tmp.getAbsolutePath), "cccc3333", System.currentTimeMillis())
      assert(liveBase.exists(), "fresh heartbeat must veto the sweep")
      assert(!deadBase.exists(), "stale heartbeat must not")
    } finally {
      def rm(f: java.io.File): Unit = {
        val k = f.listFiles(); if (k != null) k.foreach(rm); f.delete(); ()
      }
      rm(tmp)
    }
  }
}
