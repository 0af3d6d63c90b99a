package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed whole-graph algorithms beyond the per-document graphs of
  * TextRank (whose graphs never cross a row boundary and stay in a UDF).
  * Like [[Dedup.connectedComponents]], iteration follows the BSP shape —
  * one shuffle join per superstep, eager re-rooting (localCheckpoint by
  * default; pass `reroot = Reroot.Reliable(dir)` for fault-tolerant
  * checkpoints — see graft.runtime.Reroot) so the plan stays one join deep
  * and AQE keeps re-planning each round.
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
  def pageRank(edges: DataFrame, iters: Int, damping: Double,
               reroot: graft.runtime.Reroot = graft.runtime.Reroot.Local): DataFrame = {
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    // (src, dst, deg): the static per-round probe side, checkpointed once.
    val e = reroot(edges.join(deg, "src"))
    val nodes = reroot(deg.select(col("src").as("id")))
    // 1/N and the teleport base ride a one-row broadcast aggregate (the
    // q164/q177 fold pattern) — no standalone count() action; the round-0
    // checkpoint bakes the value in, so later rounds re-aggregate only the
    // tiny checkpointed node frame inside their own job.
    val nRow = nodes.agg(count(lit(1)).cast("double").as("_n"))
    // rank frame is loop-carried: rolling() deletes each superseded
    // round's reliable checkpoint once the next materializes
    val roll = graft.runtime.Reroot.rolling(reroot)
    var ranks = roll(nodes.crossJoin(broadcast(nRow))
      .select(col("id"), (lit(1.0) / col("_n")).as("r")))
    for (_ <- 1 to iters) {
      val contribs = e.join(ranks, col("src") === col("id"))
        .groupBy(col("dst"))
        .agg(sum(col("r") / col("deg")).as("m"))
      ranks = roll(nodes.join(contribs, col("id") === col("dst"), "left")
        .crossJoin(broadcast(nRow))
        .select(col("id"),
          (lit(1.0 - damping) / col("_n")
            + lit(damping) * coalesce(col("m"), lit(0.0))).as("r")))
    }
    graft.runtime.Stage.scopedPersist(ranks)
  }

  /** Personalized PageRank: identical recurrence to [[pageRank]] except the
    * teleport mass returns to the SEED set (1/|S| per seed, 0 elsewhere)
    * instead of uniformly — the similarity/recommendation variant ("nodes
    * near these"). Same per-round shape: one |E|-row shuffle; the seed
    * vector is joined once up front and rides the checkpointed node frame.
    *
    * edges: (src, dst). seeds: one `id` column (must be graph vertices).
    * Returns (id, r).
    */
  def personalizedPageRank(edges: DataFrame, seeds: DataFrame,
                           iters: Int, damping: Double,
                           reroot: graft.runtime.Reroot = graft.runtime.Reroot.Local): DataFrame = {
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val e = reroot(edges.join(deg, "src"))
    val nodes = deg.select(col("src").as("id"))
    // 1/|S| rides a one-row broadcast aggregate (the q164/q177 pattern) —
    // the teleport vector is one lazy plan, no driver-side count action.
    val nSeeds = seeds.agg(count(lit(1)).cast("double").as("_ns"))
    val sVec = reroot(nodes
      .join(seeds.select(col("id"), lit(1).as("_m")), Seq("id"), "left")
      .crossJoin(broadcast(nSeeds))
      .select(col("id"),
        when(col("_m").isNotNull, lit(1.0) / col("_ns"))
          .otherwise(lit(0.0)).as("s")))
    var ranks = sVec.select(col("id"), col("s").as("r"))
    // rank frame is loop-carried: rolling() deletes each superseded
    // round's reliable checkpoint once the next materializes
    val roll = graft.runtime.Reroot.rolling(reroot)
    for (_ <- 1 to iters) {
      val contribs = e.join(ranks, col("src") === col("id"))
        .groupBy(col("dst"))
        .agg(sum(col("r") / col("deg")).as("m"))
      ranks = roll(sVec.join(contribs, col("id") === col("dst"), "left")
        .select(col("id"),
          (lit(1.0 - damping) * col("s")
            + lit(damping) * coalesce(col("m"), lit(0.0))).as("r")))
    }
    graft.runtime.Stage.scopedPersist(ranks)
  }

  /** Exact triangle count over an undirected graph given as canonical
    * edges `(a, b)` with `a < b`, by degree-ordered orientation: every
    * edge points low-degree → high-degree (ties by id), wedges enumerate
    * only from out-edges, and each triangle is counted exactly once at its
    * orientation-minimal vertex. Wedge work is bounded by Σ outdeg² ≤
    * O(arboricity·|E|) instead of the hot vertex's deg² — the difference
    * between feasible and not on a power-law graph at scale.
    */
  def triangleCount(edges: DataFrame): Long =
    triangleCountAgg(edges).head().getLong(0)

  /** [[triangleCount]] as a LAZY one-row aggregate (`n_triangles`): the
    * form query consumers compose with their other aggregates via
    * `crossJoin(broadcast(...))`, so the triangle count rides the
    * consumer's single action instead of a standalone driver-side
    * `count()` job.
    */
  def triangleCountAgg(edges: DataFrame): DataFrame = {
    val deg = edges.select(explode(array(col("a"), col("b"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("deg"))
    val withDeg = edges
      .join(deg.select(col("v").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("deg").as("db")), "b")
    val aFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val oriented = graft.runtime.Stage.scopedPersist(withDeg.select(
      when(aFirst, col("a")).otherwise(col("b")).as("src"),
      when(aFirst, col("b")).otherwise(col("a")).as("dst")))
    val wedges = oriented.select(col("src"), col("dst").as("w1"))
      .join(oriented.select(col("src"), col("dst").as("w2")), "src")
      .filter(col("w1") < col("w2"))
    val closing = oriented.select(
      least(col("src"), col("dst")).as("w1"),
      greatest(col("src"), col("dst")).as("w2"))
    wedges.join(closing, Seq("w1", "w2"), "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
  }
}
