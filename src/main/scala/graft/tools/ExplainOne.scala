package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only single-query plan inspector: executes ONE declared query at a
  * given SF dir (noop sink, same as Bench) and prints the FINAL adaptive
  * executed plan plus wall time — the ground truth for "which join strategy
  * did AQE actually pick at this scale", which the sf0.001 plan digests
  * cannot show. Not part of the driver contract.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.tools.ExplainOne <queryName>
  */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
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
    spark.range(1000).selectExpr("sum(id)").collect()
    graft.runtime.Stage.newQueryScope()
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    val t0 = System.nanoTime()
    // Drive df's OWN QueryExecution (toRdd → count): a write(noop) runs a
    // separate cloned execution, and printing df.queryExecution afterwards
    // would show a fresh, never-executed AdaptiveSparkPlan (isFinalPlan=
    // false, pre-AQE join strategies) — the opposite of this tool's
    // purpose. toRdd computes every output column without materializing
    // rows on the driver.
    val n = df.queryExecution.toRdd.count()
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"[explain] $name took $secs%.1f s at $sfDir ($n rows)")
    println(df.queryExecution.executedPlan.toString)
  }
}
