package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** sf1-scale plan pins for the rec family.
  *
  * Both round-7 sf1 regressions were invisible to the sf0.001 plan digests
  * and the sf0.1 bench: (1) a lineage cut that lost size stats flipped the
  * profile join broadcast→sort-merge (q23 143→1347 s), visible only in the
  * AQE-FINAL plan at sf1 sizes; (2) AQE coalesced the KB-sized profile
  * exchange feeding a high-fanout join to ONE partition, so the scoring
  * stage ran single-task (q21 ran 222 s serial) — visible only in runtime
  * task counts. This tool runs the rec lanes against a REAL sf1 directory
  * and pins both signals:
  *
  *  - the AQE-final physical plan must contain ≥1 BroadcastHashJoin and
  *    (for these lanes, whose only large join is the broadcast-side
  *    profile join) ZERO SortMergeJoins;
  *  - the widest stage of each lane must run ≥ [[MinMaxStageTasks]] tasks
  *    (the serial-collapse tripwire);
  *
  * and writes a normalized digest + the raw counts per lane to a JSON
  * artifact (bench/plans_sf1_r{N}.json, diffable with tools/plans_diff.py)
  * so either bug class diffs loudly in future rounds. Exit code 1 on any
  * violated pin.
  *
  *   sbt "runMain graft.tools.ScalePins /tmp/sf1 bench/plans_sf1_r8.json"
  */
object ScalePins {

  /** q23 is the exact all-days contract lane (output ∝ users × days ×
    * in-range news); the capped lanes are its documented scale posture.
    * All five must hold the broadcast + parallel-scoring shape.
    *
    * Each lane pins its EXPECTED SortMergeJoin count rather than an
    * absolute zero: q246's two SMJs are the `invertedCosineX` size-table
    * joins over the CAPPED pair frame — small-frame sorts (the lane runs
    * ~3.4 s at sf1, 4× faster than uncapped q22), and hint-forcing them to
    * broadcast would pin a choice that is only correct at small scale (the
    * size tables grow with user/news count; the q70/q98 reasoning in
    * [[PlanDigest]]). What must diff loudly is a CHANGE in the count —
    * the round-7 regression was 0→N on the profile join.
    */
  private val Lanes = Seq(
    "q21_rec_dot" -> 0, "q22_rec_cosine" -> 0, "q23_rec_lists" -> 0,
    "q245_rec_lists_capped" -> 0, "q246_rec_cosine_capped" -> 2)

  /** The serial-collapse bug ran the scoring stage with 1 task; a healthy
    * sf1 scoring stage runs ≥ cores (pinned repartition in Stage
    * .sharedStage). 8 leaves headroom for AQE coalescing the tail.
    */
  private val MinMaxStageTasks = 8

  private class StageTally extends SparkListener {
    private val q = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
      q.add(s.stageInfo.numTasks); ()
    }
    def reset(): Unit = q.clear()
    def counts: Seq[Int] = {
      import scala.jdk.CollectionConverters._
      q.iterator().asScala.toSeq
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/tmp/sf1"
    val outPath = if (args.length > 1) args(1) else "bench/plans_sf1.json"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val big = graft.runtime.GraftScale.configure(sfDir)
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "30s")
    if (big) {
      builder.config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        (cpus.toInt * 8).toString)
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tally = new StageTally
    spark.sparkContext.addSparkListener(tally)

    def jq(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case '\r' => "\\r"; case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

    var violations = 0
    val entries = Lanes.map { case (name, expectedSmj) =>
      val fn = graft.SparkEntry.queries(name)
      tally.reset()
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      // Execute the dataframe's OWN QueryExecution so the AQE-final plan is
      // introspectable afterwards (a .write would plan a separate command).
      df.queryExecution.toRdd.count()
      val sec = (System.nanoTime() - t0) / 1e9
      // listener events are posted asynchronously; drain before reading
      Thread.sleep(1500)
      val plan = df.queryExecution.executedPlan.toString()
      val canon = PlanDigest.normalize(plan, sfDir)
      val digest = PlanDigest.sha(canon)
      // Counts run over the WHOLE plan text (final + initial sections +
      // nested cached-stage plans) — splitting out the final section is
      // fragile with nested AdaptiveSparkPlan blocks. The counts are
      // therefore consistent-but-inflated; the per-lane baseline encodes
      // today's value and any drift (either section) diffs loudly.
      val bhj = "BroadcastHashJoin".r.findAllIn(plan).length
      val smj = "SortMergeJoin".r.findAllIn(plan).length
      val maxTasks = if (tally.counts.isEmpty) 0 else tally.counts.max
      val bad = bhj < 1 || smj != expectedSmj || maxTasks < MinMaxStageTasks
      if (bad) {
        violations += 1
        System.err.println(s"[scalepins] VIOLATION $name: bhj=$bhj smj=$smj " +
          s"maxStageTasks=$maxTasks (need bhj>=1, smj=$expectedSmj, " +
          s"maxTasks>=$MinMaxStageTasks)")
      } else {
        println(f"[scalepins] OK $name: bhj=$bhj smj=$smj " +
          f"maxStageTasks=$maxTasks ${sec}%.1f s")
      }
      name -> (digest, canon, bhj, smj, maxTasks, sec)
    }
    val json = entries.map { case (n, (d, canon, bhj, smj, mt, sec)) =>
      s"${jq(n)}: {${jq("digest")}: ${jq(d)}, ${jq("bhj")}: $bhj, " +
        s"${jq("smj")}: $smj, ${jq("maxStageTasks")}: $mt, " +
        f"${jq("sec")}: $sec%.2f, ${jq("plan")}: ${jq(canon)}}"
    }.mkString("{\n", ",\n", "\n}")
    Option(Paths.get(outPath).getParent).foreach(p => Files.createDirectories(p))
    Files.writeString(Paths.get(outPath), json)
    println(s"[scalepins] wrote ${entries.size} lanes to $outPath; " +
      s"violations=$violations")
    spark.stop()
    if (violations > 0) sys.exit(1)
  }
}
