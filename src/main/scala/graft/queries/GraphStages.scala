package graft.queries

import graft.io.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Session-shared graph stages consumed by lanes in DIFFERENT query
  * modules (r13): each is a deterministic function of the dataset, built
  * once per (session, dataset) through [[graft.runtime.Stage]] exactly
  * like the dedup signature/shingle stages — the Spark rendering of the
  * reference's staged intermediate files. Sharing changes no lane's
  * output: every consumer read the identical frame before, it just
  * re-derived it per invocation.
  */
object GraphStages {

  /** Co-click news-news edges (a < b, distinct): the user-keyed wedge
    * self-join both q110 (triangles) and q184 (clustering coefficient)
    * open with. The self-join is the expensive stage of both lanes —
    * |Σ per-user deg²| rows before the distinct.
    */
  def coClickEdges(s: SparkSession, d: String): DataFrame =
    graft.runtime.Stage.shared(s, s"co-click-edges:$d") {
      val co = Tables.clicks(s, d)
        .select(col("userId"), col("newsId")).distinct()
      graft.runtime.Stage.persistShared(
        co.select(col("userId"), col("newsId").as("a"))
          .join(co.select(col("userId"), col("newsId").as("b")), "userId")
          .filter(col("a") < col("b"))
          .select(col("a"), col("b")).distinct())
    }

  /** Symmetrized user↔news bipartite click edges with namespaced ids
    * (user = 2·userId, news = 2·newsId + 1) — the graph q101 (PageRank)
    * and q237 (personalized PageRank) both iterate over.
    */
  def bipartiteClickEdges(s: SparkSession, d: String): DataFrame =
    graft.runtime.Stage.shared(s, s"bipartite-click-edges:$d") {
      val e0 = Tables.clicks(s, d)
        .select((col("userId") * 2).as("u"), (col("newsId") * 2 + 1).as("v"))
        .distinct()
      graft.runtime.Stage.persistShared(
        e0.select(col("u").as("src"), col("v").as("dst"))
          .union(e0.select(col("v").as("src"), col("u").as("dst"))))
    }
}
