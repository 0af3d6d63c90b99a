package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for a comma-separated list of declared
  * queries to `<outDir>/<query>_<suffix>.txt` — the plan evidence the
  * optimization rounds commit under plans/rN (judge checks plan claims
  * against these files). Uses the same session shape as Bench so join
  * strategies and partition counts match what the bench runs.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> SPARK_GRAFT_CPUS=32 \
  *   runMain graft.tools.ExplainDump <outDir> <suffix> <q1,q2,...>
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args(2).split(",").toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val big = graft.runtime.GraftScale.configure(sfDir)
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    if (big)
      builder.config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        (cpus.toInt * 8).toString)
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      graft.runtime.Stage.newQueryScope()
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val w = new java.io.PrintWriter(s"$outDir/${name}_$suffix.txt", "UTF-8")
      try w.println(plan) finally w.close()
      println(s"[explaindump] wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
