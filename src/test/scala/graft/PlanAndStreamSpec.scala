package graft

import graft.ext.Ann
import graft.queries.RelationalQueries
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale-shape checks: the plans Catalyst actually produces must have the
  * properties the 100 TB design depends on — filters reaching the parquet
  * scan, small dimensions broadcast, whole-stage codegen covering the hot
  * path — plus native-expression parity and the streaming variant.
  */
class PlanAndStreamSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def plan(name: String): String =
    RelationalQueries.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q3/q11: dimension joins are broadcast (no shuffle join for small dims)") {
    assert(plan("q3_join_agg").contains("BroadcastHashJoin"))
    assert(plan("q11_star_join").contains("BroadcastHashJoin"))
  }

  test("q4: semi join executes as a broadcast LeftSemi") {
    val p = plan("q4_semi_join")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"))
  }

  test("q6: date-zone predicate is pushed to the parquet scan") {
    // The filter must appear as a data-source pushed filter, not only as a
    // post-scan Filter node: Column-expression date logic, never a UDF.
    val p = RelationalQueries.queries("q6_date_window")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(event_type)") || p.contains("PushedFilters: [IsNotNull"))
    // and the scan must not read all columns
    assert(!p.contains("props"))
  }

  test("q1: aggregation runs inside whole-stage codegen with partial aggregation") {
    val qe = RelationalQueries.queries("q1_agg")(spark, sf).queryExecution
    val p = qe.executedPlan.toString
    assert(p.contains("HashAggregate"))
    assert(p.contains("partial_sum")) // map-side combine before the shuffle
    val codegen = qe.explainString(org.apache.spark.sql.execution.CodegenMode)
    assert(codegen.contains("WholeStageCodegen"))
  }

  test("q56: range join executes as equi-join on day, never a nested-loop BETWEEN join") {
    val p = plan("q56_range_join")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("Generate explode")) // intervals exploded into member days
  }

  test("q54: sessionization is a single shuffle on the user key") {
    val p = plan("q54_sessionize")
    // window partitioning by user_id also satisfies the (user_id, session_id)
    // group-by clustering (subset rule) — any second Exchange means the
    // aggregation re-shuffled and the plan regressed
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges === 1, s"expected 1 hash exchange, plan:\n$p")
  }

  test("bucketed join: no Exchange on either side once broadcast is off") {
    // The property q84 exists for: both tables pre-bucketed on the join key
    // means the SortMergeJoin consumes bucket-local reads directly. Disable
    // auto-broadcast so the small SF doesn't hide the shuffle-free shape.
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val (o, l) = graft.io.Bucketed.ordersLineitem(spark, sf)
      val joined = l.join(o, col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("o_orderpriority"))
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"))
      assert(!p.contains("Exchange"), s"bucketed join must not shuffle:\n$p")
      // correctness: identical to the unbucketed join
      val plain = graft.io.Tables.lineitem(spark, sf)
        .join(graft.io.Tables.orders(spark, sf),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("o_orderpriority"))
      assert(joined.count() === plain.count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("partitionBy(date) write: a date filter prunes partitions at the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    val kw = graft.io.Tables.clicks(spark, sf)
      .select($"userId", $"newsId", $"date")
    graft.io.Writers.writeDual(kw, concat_ws("|", $"userId", $"newsId"),
      s"$dir/parquet", s"$dir/text", partitionBy = Seq("date"))

    val read = spark.read.parquet(s"$dir/parquet")
      .filter($"date" === java.sql.Date.valueOf("2024-01-15"))
    val p = read.queryExecution.executedPlan.toString
    // the date predicate must be a PartitionFilter (directory pruning),
    // never a post-scan Filter over all partitions
    assert(p.contains("PartitionFilters: [isnotnull(date"), p)
    val dirs = new java.io.File(s"$dir/parquet").listFiles().map(_.getName)
      .filter(_.startsWith("date="))
    assert(dirs.length > 1) // really partitioned by day
    assert(read.count() > 0)
  }

  test("native FloatVecDot == ordered-fold dot on real embeddings (codegen path)") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet").limit(50)
    val a = e.select($"vec_id", $"embedding".as("x"))
    val b = e.select($"vec_id".as("vid2"), $"embedding".as("y"))
    val pairs = a.crossJoin(b).limit(500)
    val both = pairs.select(
      graft.functions.VectorExpressions.floatVecDot($"x", $"y").as("native"),
      Ann.dotCol($"x", $"y").as("fold"))
    val rows = both.collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(0) === r.getDouble(1))) // bit-identical
  }

  test("FloatVecDot: length mismatch yields null, matching the fold form") {
    val df = Seq(
      (Array(1.0f, 2.0f), Array(3.0f, 4.0f)),
      (Array(1.0f, 2.0f, 5.0f), Array(3.0f, 4.0f)) // unequal lengths
    ).toDF("x", "y")
    val rows = df.select(
      graft.functions.VectorExpressions.floatVecDot($"x", $"y").as("native"),
      Ann.dotCol($"x", $"y").as("fold")).collect()
    assert(rows(0).getDouble(0) === 11.0 && rows(0).getDouble(1) === 11.0)
    assert(rows(1).isNullAt(0) && rows(1).isNullAt(1)) // both null on mismatch
  }

  test("GraftExtensions: SQL function registration + strength-reduction rule") {
    graft.functions.GraftExtensions.installFunctions(spark)
    val viaSql = spark.sql(
      "SELECT float_vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d, " +
        "float_vec_norm_sq(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS n")
      .collect().head
    assert(viaSql.getDouble(0) === 11.0)
    assert(viaSql.getDouble(1) === 25.0)

    // rule: dot(x, x) -> norm_sq(x); sqrt(normsq)*sqrt(normsq) -> normsq
    import graft.functions.VectorExpressions._
    val e = spark.read.parquet(s"$sf/embeddings.parquet").limit(5)
    val selfDot = e.select(floatVecDot($"embedding", $"embedding").as("s"),
      (sqrt(floatVecNormSq($"embedding")) * sqrt(floatVecNormSq($"embedding"))).as("p"))
    val optimized = graft.functions.VectorStrengthReduction(selfDot.queryExecution.analyzed)
    val str = optimized.toString
    assert(!str.contains("float_vec_dot"))
    assert(!str.toLowerCase.contains("sqrt"))
    assert(str.contains("float_vec_norm_sq"))
  }

  test("stateful streaming user profiles equal the batch aggregation") {
    val streamed = graft.streaming.StreamingUserProfiles
      .userClickProfiles(spark, sf, queryName = "stream_profiles_test")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val batch = graft.io.Tables.clicks(spark, sf)
      .groupBy($"userId")
      .agg(count(lit(1)).as("n"), countDistinct($"newsId").as("d"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("streaming session windows (append + watermark) equal the batch session aggregation") {
    // Spark 4.1: MemoryStream lives in execution.streaming.runtime
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ev = graft.io.Tables.events(spark, sf)
      .select($"user_id", $"ts").as[(Long, java.sql.Timestamp)].collect().toSeq

    val stream = MemoryStream[(Long, java.sql.Timestamp)]
    val sessions = graft.streaming.StreamingSessions.sessionAgg(
      stream.toDF().toDF("user_id", "ts"))
    val q = sessions.writeStream.outputMode("append").format("memory")
      .queryName("stream_sessions_test").start()
    try {
      stream.addData(ev)
      q.processAllAvailable()
      // two sentinel batches: the first advances the watermark past every
      // real session, the second triggers the batch that emits them
      val sentinel = (-1L, java.sql.Timestamp.valueOf("2030-01-01 00:00:00"))
      stream.addData(Seq(sentinel))
      q.processAllAvailable()
      stream.addData(Seq(sentinel.copy(_2 = java.sql.Timestamp.valueOf("2030-01-02 00:00:00"))))
      q.processAllAvailable()
    } finally q.stop()

    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getTimestamp(1).getTime, r.getTimestamp(2).getTime) -> r.getLong(3)
    val streamed = spark.table("stream_sessions_test")
      .filter($"user_id" >= 0).collect().map(key).toMap
    val batch = graft.streaming.StreamingSessions.sessionAgg(
        graft.io.Tables.events(spark, sf).select($"user_id", $"ts"))
      .collect().map(key).toMap
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("streaming hot topics equals the batch aggregation") {
    val streamed = graft.streaming.StreamingHotTopics
      .dailyClickCounts(spark, sf, queryName = "stream_hot_test")
      .collect().map(r => (r.getDate(0).toString, r.getLong(1)) -> r.getLong(2)).toMap
    val batch = graft.io.Tables.clicks(spark, sf)
      .groupBy($"date", $"newsId").agg(count(lit(1)).as("clicks"))
      .collect().map(r => (r.getDate(0).toString, r.getLong(1)) -> r.getLong(2)).toMap
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("foreachBatch idempotent sink: batch replay rewrites instead of duplicating") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("graft_feb_test").toString + "/sink"

    val stream = MemoryStream[(Long, String)]
    val q = stream.toDF().toDF("id", "payload")
      .writeStream
      .foreachBatch(graft.streaming.ForeachBatchSink.idempotentParquet(out) _)
      .start()
    val batch2 = Seq((3L, "c"), (4L, "d"))
    try {
      stream.addData(Seq((1L, "a"), (2L, "b")))
      q.processAllAvailable()
      stream.addData(batch2)
      q.processAllAvailable()
    } finally q.stop()

    def readAll() = spark.read.parquet(out)
      .select($"id", $"payload").collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    val first = readAll()
    assert(first === Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))

    // simulate the post-failure replay of batch 1: same data, same batchId —
    // the overwrite must leave the sink unchanged, not append duplicates
    graft.streaming.ForeachBatchSink.idempotentParquet(out)(
      batch2.toDF("id", "payload"), 1L)
    assert(readAll() === first)
  }

  test("sketch audit lane: exact counts match and error-contract verdicts hold") {
    val ev = graft.io.Tables.events(spark, sf)
    // r9 schema: (event_type, exact_users, users_ok, p50_ok, p95_ok)
    val got = RelationalQueries.queries("q74_sketches")(spark, sf)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getBoolean(2), r.getBoolean(3), r.getBoolean(4))))
      .toMap
    val exact = ev.groupBy($"event_type")
      .agg(countDistinct($"user_id").as("n"),
        expr("percentile(value, 0.5)").as("p50"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(got.keySet === exact.keySet)
    exact.foreach { case (t, (n, _)) =>
      val (en, uok, p50ok, p95ok) = got(t)
      assert(en === n, s"$t: exact_users $en vs recomputed $n")
      assert(uok && p50ok && p95ok, s"$t: a sketch verdict is false")
    }
    // the verdicts are not vacuous: the raw sketches themselves land near
    // the exact answers (same legs DumpAux exports for verify_sketches.py)
    val raw = ev.groupBy($"event_type")
      .agg(approx_count_distinct($"user_id", rsd = 0.02).as("an"),
        percentile_approx($"value", lit(0.5), lit(10000)).as("ap50"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    exact.foreach { case (t, (n, p50)) =>
      val (an, ap50) = raw(t)
      assert(math.abs(an - n).toDouble / n <= 0.10, s"$t: HLL $an vs exact $n")
      assert(math.abs(ap50 - p50) <= math.max(0.05 * math.abs(p50), 1e-6),
        s"$t: p50 $ap50 vs exact $p50")
    }
    assert(exact.nonEmpty)
  }

  test("streaming aggregation recovers from a mid-stream kill via checkpoint (exactly-once state)") {
    val base = java.nio.file.Files.createTempDirectory("graft_ckpt_test").toString
    val srcDir = s"$base/src"
    val ckpt = s"$base/ckpt"
    // split the events into 4 files so maxFilesPerTrigger=1 forces multiple
    // micro-batches, leaving work behind when we kill the first query
    graft.io.Tables.events(spark, sf).repartition(4).write.parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema

    def start() = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
      .filter($"event_type" === "click")
      .groupBy(to_date($"ts").as("day")).count()
      .writeStream.outputMode("complete").format("memory")
      .queryName("ckpt_restart_test")
      .option("checkpointLocation", ckpt)
      .start()

    val q1 = start()
    // let at least one batch commit, then kill mid-stream
    val deadline = System.currentTimeMillis + 30000
    while (q1.recentProgress.length < 2 && System.currentTimeMillis < deadline)
      Thread.sleep(100)
    q1.stop()

    // a fresh query on the same checkpoint resumes from committed offsets —
    // whatever the kill point was, the final state must equal the batch run
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()

    val streamed = spark.table("ckpt_restart_test").collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    val batch = graft.io.Tables.clicks(spark, sf)
      .groupBy($"date").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("interval join killed mid-stream resumes from checkpoint: buffered state joins post-restart rows, file sink stays exactly-once") {
    import java.sql.Timestamp
    val base = java.nio.file.Files.createTempDirectory("graft_ij_restart").toString
    val srcDir = s"$base/src"; val ckpt = s"$base/ckpt"; val outDir = s"$base/out"
    def t(min: Int) = Timestamp.valueOf(f"2024-03-01 10:$min%02d:00")
    val cols = Seq("user_id", "event_id", "event_type", "ts")
    // pre-restart slices (two files so maxFilesPerTrigger=1 leaves a real
    // mid-stream kill point between batches)
    val sliceA = Seq((1L, 100L, "view", t(0)), (2L, 101L, "view", t(5)),
      (3L, 102L, "view", t(10)))
    val sliceB = Seq((2L, 200L, "click", t(20)))
    // post-restart slice: clicks 201/203 join VIEWS BUFFERED BEFORE THE
    // KILL — they can only appear if the join's state store recovered
    val sliceC = Seq((1L, 201L, "click", t(30)), (2L, 202L, "click", t(40)),
      (3L, 203L, "click", t(55)))
    sliceA.toDF(cols: _*).coalesce(1).write.mode("append").parquet(srcDir)
    sliceB.toDF(cols: _*).coalesce(1).write.mode("append").parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema

    def start() = {
      val src = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir)
      val views = src.filter($"event_type" === "view")
        .select($"user_id".as("v_user"), $"event_id".as("view_id"), $"ts".as("v_ts"))
        .withWatermark("v_ts", "2 hours")
      val clicks = src.filter($"event_type" === "click")
        .select($"user_id".as("c_user"), $"event_id".as("click_id"), $"ts".as("c_ts"))
        .withWatermark("c_ts", "2 hours")
      graft.streaming.StreamingIntervalJoin.join(views, clicks)
        .select($"c_user".as("userId"), $"view_id", $"click_id")
        .writeStream.outputMode("append").format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .start()
    }
    // run 1: kill after at least one committed batch, before the backlog
    // is drained — whatever the exact kill point, recovery must converge
    val q1 = start()
    val deadline = System.currentTimeMillis + 30000
    while (q1.recentProgress.length < 1 && System.currentTimeMillis < deadline)
      Thread.sleep(100)
    q1.stop()
    // backlog lands while nothing is running
    sliceC.toDF(cols: _*).coalesce(1).write.mode("append").parquet(srcDir)
    // run 2: fresh query, same checkpoint — offsets AND join state resume
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()

    val out = spark.read.parquet(outDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // batch oracle: the same theta join over the union of all slices
    val all = (sliceA ++ sliceB ++ sliceC).toDF(cols: _*)
    val expected = graft.streaming.StreamingIntervalJoin.join(
        all.filter($"event_type" === "view")
          .select($"user_id".as("v_user"), $"event_id".as("view_id"), $"ts".as("v_ts")),
        all.filter($"event_type" === "click")
          .select($"user_id".as("c_user"), $"event_id".as("click_id"), $"ts".as("c_ts")))
      .select($"c_user", $"view_id", $"click_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out === expected)
    // the pairs that REQUIRE recovered state (view buffered pre-kill,
    // click arriving post-restart) are present
    assert(out.contains((1L, 100L, 201L)) && out.contains((3L, 102L, 203L)))
    // exactly-once across the restart: no pair emitted twice
    assert(spark.read.parquet(outDir).count() === expected.size.toLong)
  }

  test("flatMapGroupsWithState cumulative counts carry state across day-aligned batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = graft.io.Tables.clicks(spark, sf)
      .select($"userId", $"date").as[(Long, java.sql.Date)].collect()
    val days = rows.map(_._2.getTime).distinct.sorted
    val cut = days(days.length / 2) // batch 2 starts a fresh day

    val stream = MemoryStream[(Long, java.sql.Date)]
    val q = graft.streaming.StreamingClickCume.cumulative(stream.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("stream_cume_test").start()
    try {
      stream.addData(rows.filter(_._2.getTime <= cut).toSeq)
      q.processAllAvailable()
      stream.addData(rows.filter(_._2.getTime > cut).toSeq)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("stream_cume_test").collect()
      .map(r => (r.getLong(0), r.getDate(1).toString) -> (r.getLong(2), r.getLong(3))).toMap
    // independently computed expectation: per-user day counts + running sum
    val expected = rows.groupBy(_._1).flatMap { case (u, rs) =>
      val perDay = rs.groupBy(_._2.toString).view.mapValues(_.size.toLong).toSeq.sortBy(_._1)
      var cum = 0L
      perDay.map { case (d, n) => cum += n; (u, d) -> (n, cum) }
    }.toMap
    assert(streamed === expected)
    assert(streamed.nonEmpty)
  }

  test("stream-stream interval join over multiple in-order batches equals the batch theta join") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ev = graft.io.Tables.events(spark, sf)
      .select($"user_id", $"event_id", $"ts", $"event_type")
      .as[(Long, Long, java.sql.Timestamp, String)].collect()
    val viewRows = ev.filter(_._4 == "view").map(e => (e._1, e._2, e._3)).sortBy(_._3.getTime)
    val clickRows = ev.filter(_._4 == "click").map(e => (e._1, e._2, e._3)).sortBy(_._3.getTime)

    val vStream = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val cStream = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val views = vStream.toDF().toDF("v_user", "view_id", "v_ts")
      .withWatermark("v_ts", "2 hours")
    val clicks = cStream.toDF().toDF("c_user", "click_id", "c_ts")
      .withWatermark("c_ts", "2 hours")
    val q = graft.streaming.StreamingIntervalJoin.join(views, clicks)
      .writeStream.outputMode("append").format("memory")
      .queryName("stream_ij_test").start()
    try {
      // event-time-ordered halves: watermarks only advance, so no row is late
      // and the inner join must emit exactly the batch result
      val cut = viewRows(viewRows.length / 2)._3.getTime
      vStream.addData(viewRows.filter(_._3.getTime <= cut).toSeq)
      cStream.addData(clickRows.filter(_._3.getTime <= cut).toSeq)
      q.processAllAvailable()
      vStream.addData(viewRows.filter(_._3.getTime > cut).toSeq)
      cStream.addData(clickRows.filter(_._3.getTime > cut).toSeq)
      q.processAllAvailable()
    } finally q.stop()

    // joined columns: (c_user, click_id, c_ts, v_user, view_id, v_ts)
    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getLong(1), r.getLong(4))
    val streamed = spark.table("stream_ij_test").collect().map(key).sorted.toSeq
    val batch = graft.streaming.StreamingIntervalJoin.join(
        viewRows.toSeq.toDF("v_user", "view_id", "v_ts"),
        clickRows.toSeq.toDF("c_user", "click_id", "c_ts"))
      .collect().map(key).sorted.toSeq
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("TWS timers: a user's timer firing mid-stream still merges to the full summary") {
    // The ADVICE r3 scenario: a batch split lets the watermark pass a
    // user's quiet deadline while MORE of their events are still coming —
    // the timer fires mid-stream, emitting a partial summary, then a
    // second one at the end. The post-sink merge must make the result
    // identical to the unsplit run.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val min = 60L * 1000
    graft.streaming.StreamingTws.withRocksDb(spark) {
      val stream = MemoryStream[(Long, Long)]
      val out = graft.streaming.StreamingTws.timerPipeline(
        spark, stream.toDF().toDF("userId", "tsMs"))
      val q = out.writeStream.outputMode("append").format("memory")
        .queryName("tws_split_test").start()
      try {
        // batch 1: user 7 at t=0; user 8 at t=600min drives the watermark
        // to 540min — past user 7's 30min-gap deadline, firing its timer
        stream.addData(Seq((7L, 0L), (8L, 600 * min)))
        q.processAllAvailable()
        // batch 2: user 7 returns at t=560min (ahead of the watermark, so
        // not late) — state restarts from empty after the expiry
        stream.addData(Seq((7L, 560 * min)))
        q.processAllAvailable()
        // sentinel advances the watermark past every live timer
        stream.addData(Seq((-1L, 100000 * min)))
        q.processAllAvailable()
      } finally q.stop()
      val sink = spark.table("tws_split_test")
      // the split DID fire user 7's timer twice (two partial summaries)...
      assert(sink.filter($"user_id" === 7L).count() === 2)
      // ...and the merge reassembles the full summary
      val merged = graft.streaming.StreamingTws.mergeTimerSink(sink)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      assert(merged(7L) === ((2L, 0L, 560 * min)))
      assert(merged(8L) === ((1L, 600 * min, 600 * min)))
    }
  }

  test("q94: the benchmark gram set joins as a broadcast (corpus side never re-shuffles for it)") {
    val p = SparkEntry.queries("q94_decontam")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"))
  }

  test("q96: the per-language rate table joins as a broadcast") {
    val p = SparkEntry.queries("q96_lang_mix")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"))
  }

  test("q104: decile boundaries never ride a global window/sort in the output plan") {
    // exactRanks resolves boundaries eagerly over single-bin slivers; the
    // returned plan must be a plain scan+agg — a Window or global Sort here
    // would mean the equi-depth path regressed to the single-partition form.
    val p = SparkEntry.queries("q104_equidepth")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Window"))
    assert(!p.contains("Sort "), s"unexpected global sort in:\n$p")
  }

  test("TWS timer lane killed mid-stream resumes from checkpoint: ValueState and registered timers survive a restart") {
    import graft.streaming.{StreamConf, StreamingTws}
    val base = java.nio.file.Files.createTempDirectory("graft_tws_restart").toString
    val srcDir = s"$base/src"; val ckpt = s"$base/ckpt"; val outDir = s"$base/out"
    def ms(min: Int): Long =
      java.sql.Timestamp.valueOf(f"2024-03-01 10:$min%02d:00").getTime
    // pre-kill slices (two files, maxFilesPerTrigger=1 → a real mid-stream
    // kill point): ALL of user 1's events and user 2's first event
    Seq((1L, ms(0)), (1L, ms(5)), (2L, ms(2))).toDF("userId", "tsMs")
      .coalesce(1).write.mode("append").parquet(srcDir)
    Seq((1L, ms(20))).toDF("userId", "tsMs")
      .coalesce(1).write.mode("append").parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema

    def start() = StreamingTws.withRocksDb(spark) {
      StreamConf.withStatePartitions(spark) {
        val raw = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(srcDir)
        StreamingTws.timerPipeline(spark, raw).writeStream
          .outputMode("append").format("parquet")
          .option("path", outDir).option("checkpointLocation", ckpt)
          .start()
      }
    }

    // run 1: kill after at least one committed batch — no timer has fired
    // yet (watermark stays 1h behind), so EVERY summary depends on state
    // surviving the restart
    val q1 = start()
    val deadline = System.currentTimeMillis + 30000
    while (q1.recentProgress.length < 1 && System.currentTimeMillis < deadline)
      Thread.sleep(100)
    q1.stop()
    // post-restart backlog: user 2's second event, then a far-future
    // sentinel that advances the watermark past every registered timer
    Seq((2L, ms(40))).toDF("userId", "tsMs")
      .coalesce(1).write.mode("append").parquet(srcDir)
    Seq((-1L, ms(0) + 48L * 3600 * 1000)).toDF("userId", "tsMs")
      .coalesce(1).write.mode("append").parquet(srcDir)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()

    val merged = StreamingTws.mergeTimerSink(spark.read.parquet(outDir))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // user 1's events all arrived PRE-kill and its summary only fires
    // post-restart — it exists iff the ValueState AND the registered timer
    // were recovered from the checkpoint; user 2's count spans the kill
    assert(merged(1L) === ((3L, ms(0), ms(20))),
      s"user 1 summary must cover all pre-kill events, got $merged")
    assert(merged(2L) === ((2L, ms(2), ms(40))),
      s"user 2 state must span the restart, got $merged")
    assert(!merged.contains(-1L))
  }

  test("TWS ListState killed mid-stream resumes: post-restart rows carry recovered distinct-day and count state") {
    import graft.streaming.{StreamConf, StreamingTws}
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    import org.apache.spark.sql.{Encoder, Encoders}
    val base = java.nio.file.Files.createTempDirectory("graft_tws_list_restart").toString
    val srcDir = s"$base/src"; val ckpt = s"$base/ckpt"
    // day ordinals split ACROSS the kill: users 1/2 act on days 10 and 11
    // pre-kill, then again on day 11 and newly on day 12 post-restart
    Seq((1L, 10, 1000L), (1L, 11, 2000L), (2L, 10, 1500L)).toDF("userId", "dayOrd", "tsUs")
      .coalesce(1).write.mode("append").parquet(srcDir)
    Seq((2L, 11, 2500L)).toDF("userId", "dayOrd", "tsUs")
      .coalesce(1).write.mode("append").parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema
    val outDir = s"$base/out"

    // update-mode memory sinks cannot recover from a checkpoint, so the
    // restartable sink is foreachBatch → parquet append: running totals
    // are monotone per user, so max-per-user over ALL emitted rows (even a
    // replayed uncommitted batch) is the final state
    def start() = StreamingTws.withRocksDb(spark) {
      StreamConf.withStatePartitions(spark) {
        import spark.implicits._
        val evs = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(srcDir)
          .as[StreamingTws.Ev]
        implicit val outEnc: Encoder[StreamingTws.UserActivity] =
          Encoders.product[StreamingTws.UserActivity]
        evs.groupByKey(_.userId)
          .transformWithState(new StreamingTws.ActivityProcessor,
            TimeMode.None(), OutputMode.Update())
          .toDF().writeStream.outputMode(OutputMode.Update)
          .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
            df.write.mode("append").parquet(outDir)
          }
          .option("checkpointLocation", ckpt)
          .start()
      }
    }

    val q1 = start()
    val deadline = System.currentTimeMillis + 30000
    while (q1.recentProgress.length < 1 && System.currentTimeMillis < deadline)
      Thread.sleep(100)
    q1.stop()
    // post-restart: one more event for EACH user (day 11 repeats for user
    // 1 — must NOT re-count; day 12 is new for user 2)
    Seq((1L, 11, 3000L), (2L, 12, 3500L)).toDF("userId", "dayOrd", "tsUs")
      .coalesce(1).write.mode("append").parquet(srcDir)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()

    // each user's max row carries running totals that are correct only if
    // the ValueState count AND the ListState day set were recovered
    val finalRows = spark.read.parquet(outDir)
      .groupBy($"userId").agg(max($"n_events").as("n"), max($"n_active_days").as("d"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(finalRows(1L) === ((3L, 2)),
      s"user 1: 3 events over days {10,11} (day 11 repeat must not re-count), got $finalRows")
    assert(finalRows(2L) === ((3L, 3)),
      s"user 2: 3 events over days {10,11,12}, got $finalRows")
  }

  test("TWS MapState killed mid-stream resumes: post-restart rows carry recovered per-type counts") {
    import graft.streaming.{StreamConf, StreamingTws}
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    import org.apache.spark.sql.{Encoder, Encoders}
    val base = java.nio.file.Files.createTempDirectory("graft_tws_map_restart").toString
    val srcDir = s"$base/src"; val ckpt = s"$base/ckpt"; val outDir = s"$base/out"
    // per-type counts split ACROSS the kill: user 1 clicks twice and views
    // once pre-kill; user 2 views once
    Seq((1L, "click"), (1L, "click"), (2L, "view")).toDF("userId", "eventType")
      .coalesce(1).write.mode("append").parquet(srcDir)
    Seq((1L, "view")).toDF("userId", "eventType")
      .coalesce(1).write.mode("append").parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema

    // same restartable-sink shape as the ListState test: counts are
    // monotone per (user, type), so max over all emitted rows is final
    def start() = StreamingTws.withRocksDb(spark) {
      StreamConf.withStatePartitions(spark) {
        import spark.implicits._
        val evs = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(srcDir)
          .as[StreamingTws.TypedEv]
        implicit val outEnc: Encoder[StreamingTws.TypeCount] =
          Encoders.product[StreamingTws.TypeCount]
        evs.groupByKey(_.userId)
          .transformWithState(new StreamingTws.TypeCountProcessor,
            TimeMode.None(), OutputMode.Update())
          .toDF().writeStream.outputMode(OutputMode.Update)
          .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
            df.write.mode("append").parquet(outDir)
          }
          .option("checkpointLocation", ckpt)
          .start()
      }
    }

    val q1 = start()
    val deadline = System.currentTimeMillis + 30000
    while (q1.recentProgress.length < 1 && System.currentTimeMillis < deadline)
      Thread.sleep(100)
    q1.stop()
    // post-restart: one more click per user — user 1's click total reaches
    // 3 only if the pre-kill MapState entry (2) was recovered, and its
    // emitted map walk must still carry the recovered "view" entry too
    Seq((1L, "click"), (2L, "click")).toDF("userId", "eventType")
      .coalesce(1).write.mode("append").parquet(srcDir)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()

    val finalRows = spark.read.parquet(outDir)
      .groupBy($"user_id", $"event_type").agg(max($"n_events").as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(finalRows((1L, "click")) === 3L,
      s"user 1 clicks must span the restart (2 pre + 1 post), got $finalRows")
    assert(finalRows((1L, "view")) === 1L,
      s"user 1's view entry must survive in the recovered map, got $finalRows")
    assert(finalRows((2L, "view")) === 1L && finalRows((2L, "click")) === 1L,
      s"user 2 per-type counts must span the restart, got $finalRows")
  }

  test("salted outer join: row-identical to the unsalted join, hot and cold keys alike") {
    import java.sql.Timestamp
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-05 10:$m%02d:00")
    // user 7 is "hot" (declared); user 8 cold; view 30 unmatched (null row);
    // view 13's click arrives outside the hour window
    val views = Seq(
      (7L, 10L, ts(0)), (7L, 11L, ts(5)), (7L, 13L, ts(10)),
      (8L, 20L, ts(0)), (7L, 30L, ts(30)))
      .toDF("v_user", "view_id", "v_ts")
    val lateTs = Timestamp.valueOf("2024-01-05 11:30:00")
    val clicks = Seq(
      (7L, 100L, ts(1)), (7L, 101L, ts(6)), (7L, 102L, ts(7)),
      (8L, 200L, ts(2)), (7L, 300L, lateTs))
      .toDF("c_user", "click_id", "c_ts")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("v_user"), col("view_id"), col("click_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2))).sorted.toSeq
    val plain = rows(graft.streaming.StreamingOuterJoin.join(views, clicks))
    val salted = rows(graft.streaming.StreamingOuterJoin
      .joinSalted(views, clicks, Seq(7L), 4))
    assert(salted === plain)
    // empty hot set (what the auto-salted lane runs when detection finds
    // nothing): degenerates to the unsalted join, same rows
    val unsalted = rows(graft.streaming.StreamingOuterJoin
      .joinSalted(views, clicks, Seq.empty, 4))
    assert(unsalted === plain)
    // the hot pair fan-out is real in this fixture (view 10/11 each match
    // multiple clicks) and the unmatched-view null row survives salting
    assert(plain.count(_._3 == -1L) >= 1)
    assert(plain.size > views.count())
  }

  test("hot-key detector: share+count hotness over closed windows; streaming detection finds the planted key") {
    import java.sql.Timestamp
    // batch side: the hotness predicate — per-window share AND absolute
    // floor, OR across windows
    def t(h: Int) = Timestamp.valueOf(f"2024-01-05 $h%02d:00:00")
    val ledger = Seq(
      (t(1), t(2), 7L, 300L), (t(1), t(2), 8L, 9700L),   // 7: 3% share, hot
      (t(2), t(3), 9L, 50L), (t(2), t(3), 10L, 950L),    // 9: 5% but < 100 rows
      (t(3), t(4), 11L, 2L), (t(3), t(4), 12L, 3L),      // tiny window, floor
      // EXACT threshold boundaries (VERDICT r12 task 5): both tests are
      // inclusive (>=) — a key AT share 1% and AT count 100 is hot...
      (t(4), t(5), 13L, 100L), (t(4), t(5), 14L, 9900L), // 13: =1%, =100 → hot
      // ...while one row of window total past the share boundary
      // (100/10001) excludes it even at the count floor exactly.
      (t(5), t(6), 15L, 100L), (t(5), t(6), 16L, 9901L)) // 15: just under 1%
      .toDF("w_start", "w_end", "key", "n")
    val hot = graft.streaming.HotKeyDetector.hotKeys(ledger, 0.01, 100L)
      .collect().map(_.getLong(0)).toSet
    assert(hot === Set(7L, 8L, 10L, 13L, 14L, 16L))

    // streaming side: planted 30%-share key in a 500-row hour, closed by a
    // far-future row; the final (open) window never reaches the ledger
    val dir = java.nio.file.Files.createTempDirectory("graft_hotdet").toString
    val base = Timestamp.valueOf("2024-01-05 10:00:00").getTime
    val rows = (0 until 500).map { i =>
      val u = if (i % 10 < 3) 7L else 100L + i % 50
      (i.toLong, u, new Timestamp(base + (i % 3600) * 1000L))
    } :+ (9999L, -1L, new Timestamp(base + 48L * 3600 * 1000))
    rows.toDF("event_id", "user_id", "ts").write.parquet(s"$dir/ev")
    val schema = spark.read.parquet(s"$dir/ev").schema
    val stream = spark.readStream.schema(schema).parquet(s"$dir/ev")
    val detected = graft.streaming.HotKeyDetector.detectBounded(
      spark, stream, s"$dir/work")
    assert(detected === Seq(7L))
  }

  test("events schema probe: missing-path fallback is not memoized; a real footer is") {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    val dir = java.nio.file.Files.createTempDirectory("graft_probe").toString
    val path = s"$dir/events.parquet"
    // Path absent: long fallback (a stream over it yields no rows)...
    val before = graft.streaming.StreamingHotTopics
      .eventsSchemaFor(spark, path, None)
    assert(before("ts").dataType === LongType)
    // ...and must NOT be sticky: once the real NTZ files appear, the next
    // probe reads the footer (ADVICE r6: memoize only real footers).
    Seq((1L, 7L, "click", "2024-01-05 10:00:00"))
      .toDF("user_id", "event_id", "event_type", "w")
      .withColumn("ts", to_timestamp_ntz(col("w"))).drop("w")
      .write.parquet(path)
    val after = graft.streaming.StreamingHotTopics
      .eventsSchemaFor(spark, path, None)
    assert(after("ts").dataType === TimestampNTZType)
    // Memoized now: deleting the files does not flip the cached footer type.
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(new java.io.File(path))
    val cached = graft.streaming.StreamingHotTopics
      .eventsSchemaFor(spark, path, None)
    assert(cached("ts").dataType === TimestampNTZType)
  }
}
