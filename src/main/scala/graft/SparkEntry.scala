package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + FIXTURES.md.
  *
  * `queries` is the engine's declared surface: one entry per implemented
  * operator/pipeline from SURVEY.md §2, each paired (where ANSI-SQL
  * expressible) with a DuckDB oracle in `oracleSql` that computes the same
  * result over the same parquet tables. Column names and rounding are kept
  * identical on both sides so the driver's sorted-hash compare matches.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The HotTopics pipeline (reference E3) end-to-end: click-window
    * aggregation + per-day ranked topics.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q19_hot_topics")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    val raw = RelationalQueries.queries ++ TextQueries.queries ++ RecQueries.queries ++
      ExtQueries.queries ++ TextRankQueries.queries ++ ScaleQueries.queries ++
      CurationQueries.queries ++ MiningQueries.queries ++ ParityQueries.queries ++
      SurfaceQueries.queries ++ SemanticQueries.queries ++ ReleaseQueries.queries
    // Scope boundary: entering a query releases the previous query's
    // scoped caches (graft.runtime.Stage) — queries run sequentially under
    // the driver contract.
    raw.map { case (name, fn) =>
      name -> ((s: SparkSession, d: String) => {
        graft.runtime.Stage.newQueryScope()
        fn(s, d)
      })
    }
  }

  def oracleSql: Map[String, String] =
    RelationalQueries.oracle ++ TextQueries.oracle ++ RecQueries.oracle ++
      ExtQueries.oracle ++ TextRankQueries.oracle ++ ScaleQueries.oracle ++
      CurationQueries.oracle ++ MiningQueries.oracle ++ ParityQueries.oracle ++
      SurfaceQueries.oracle ++ SemanticQueries.oracle ++ ReleaseQueries.oracle
}
