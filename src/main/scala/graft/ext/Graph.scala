package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed whole-graph algorithms beyond the per-document graphs of
  * TextRank (whose graphs never cross a row boundary and stay in a UDF).
  * Like [[Dedup.connectedComponents]], iteration follows the BSP shape —
  * one shuffle join per superstep, eager `localCheckpoint` re-rooting so
  * the plan stays one join deep and AQE keeps re-planning each round.
  */
object Graph {

  /** Fixed-iteration PageRank over a directed edge list `(src, dst)`.
    *
    * r₀ = 1/N;  rₜ₊₁(v) = (1−d)/N + d·Σ_{(u,v)∈E} rₜ(u)/outdeg(u).
    *
    * The vertex set is the set of edge SOURCES — callers symmetrize
    * undirected graphs first (then every vertex has outdeg ≥ 1 and there is
    * no dangling-mass term, keeping the recurrence exactly mirrorable in
    * the SQL oracle). Fixed `iters` rather than an ε-test: cross-engine
    * comparison needs the identical number of supersteps on both sides.
    *
    * Scale shape: `edges ⋈ ranks` is the only non-trivial shuffle per
    * round, partitioned by vertex id; degree is joined once up front and
    * rides the checkpointed edge frame. Rounds are data-independent (no
    * convergence probe actions). Billions of edges ⇒ each round is one
    * shuffle of |E| rows — the standard Pregel-without-Pregel formulation.
    */
  def pageRank(edges: DataFrame, iters: Int, damping: Double): DataFrame = {
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    // (src, dst, deg): the static per-round probe side, checkpointed once.
    val e = edges.join(deg, "src").localCheckpoint()
    val nodes = deg.select(col("src").as("id")).localCheckpoint()
    val n = nodes.count()
    val base = (1.0 - damping) / n
    var ranks = nodes.select(col("id"), lit(1.0 / n).as("r"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      val contribs = e.join(ranks, col("src") === col("id"))
        .groupBy(col("dst"))
        .agg(sum(col("r") / col("deg")).as("m"))
      ranks = nodes.join(contribs, col("id") === col("dst"), "left")
        .select(col("id"),
          (lit(base) + lit(damping) * coalesce(col("m"), lit(0.0))).as("r"))
        .localCheckpoint()
    }
    graft.runtime.Stage.scopedPersist(ranks)
  }
}
