package graft

import graft.functions.KeywordExpressions.keywordDot
import graft.sim.{Scoring, Similarities}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The cross→inverted optimizer rewrite (SURVEY.md §4): a reference-shaped
  * crossJoin + keyword_dot + `score > 0` plan must optimize into the
  * inverted-index equi-join + aggregation, with identical results.
  */
class PlansSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def profiles() = {
    val left = Seq(
      (1L, Seq(("alpha", 0.5), ("beta", 1.5))),
      (2L, Seq(("gamma", 2.0))),
      (3L, Seq(("nothing", 1.0)))
    ).toDF("lid", "kw")
      .select($"lid", $"kw".cast("array<struct<word:string,value:double>>").as("keywords"))
    val right = Seq(
      (10L, Seq(("alpha", 2.0), ("delta", 9.0))),
      (11L, Seq(("beta", 1.0), ("gamma", 3.0))),
      (12L, Seq(("epsilon", 4.0)))
    ).toDF("rid", "kw")
      .select($"rid", $"kw".cast("array<struct<word:string,value:double>>").as("keywords"))
    (left, right)
  }

  test("CrossScoreToInvertedJoin: cross+guard plan rewrites to join+aggregate with equal results") {
    val (left, right) = profiles()
    val crossDf = Scoring.crossScore(left, "lid", right, "rid",
      (a, b) => keywordDot(a, b))

    // expected via the faithful UDF cross (no rule involved)
    val expected = Scoring.crossScore(left, "lid", right, "rid",
      (a, b) => Similarities.dotCol(a, b))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

    val before = crossDf.queryExecution.optimizedPlan
    val after = graft.plans.CrossScoreToInvertedJoin(before)
    assert(after ne before)
    val planStr = after.toString
    assert(!planStr.contains("Cross"), s"cross join survived:\n$planStr")
    assert(planStr.contains("Aggregate"))
    assert(planStr.contains("Generate explode"))

    val got = org.apache.spark.sql.graft.bridge.ofRows(spark, after)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got.keySet === expected.keySet)
    got.foreach { case (k, v) =>
      assert(math.abs(v - expected(k)) < 1e-9, s"pair $k: $v vs ${expected(k)}")
    }
    // the no-shared-word pair (3, 12) must appear in neither
    assert(!got.contains((3L, 12L)))
  }

  test("rule installed via experimental.extraOptimizations fires end-to-end") {
    val (left, right) = profiles()
    val prev = spark.experimental.extraOptimizations
    try {
      spark.experimental.extraOptimizations = prev :+ graft.plans.CrossScoreToInvertedJoin
      val df = Scoring.crossScore(left, "lid", right, "rid", (a, b) => keywordDot(a, b))
      val plan = df.queryExecution.optimizedPlan.toString
      assert(!plan.contains("Cross"), s"rule did not fire:\n$plan")
      assert(plan.contains("Aggregate"))
      val got = df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      assert(got.keySet === Set((1L, 10L), (1L, 11L), (2L, 11L)))
      assert(math.abs(got((1L, 10L)) - 1.0) < 1e-12)  // alpha: 0.5*2.0
      assert(math.abs(got((1L, 11L)) - 1.5) < 1e-12)  // beta: 1.5*1.0
      assert(math.abs(got((2L, 11L)) - 6.0) < 1e-12)  // gamma: 2.0*3.0
    } finally spark.experimental.extraOptimizations = prev
  }

  test("rule does NOT fire without the score > 0 guard (zero-score pairs would be dropped)") {
    val (left, right) = profiles()
    val noGuard = left.select($"lid", $"keywords".as("_lk"))
      .crossJoin(right.select($"rid", $"keywords".as("_rk")))
      .select($"lid", $"rid", keywordDot($"_lk", $"_rk").as("score"))
    val before = noGuard.queryExecution.optimizedPlan
    val after = graft.plans.CrossScoreToInvertedJoin(before)
    assert(after.toString.contains("Join Cross") || after == before)
  }

  test("q224 LATERAL top-k decorrelates: ranked join, never a per-row nested loop") {
    graft.runtime.Stage.newQueryScope()
    val p = SparkEntry.queries("q224_lateral_topk")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    // Catalyst rewrites the correlated ORDER BY/LIMIT subquery into a
    // window ranking + equi-join; a LocalLimit per row or a cartesian
    // product here would mean decorrelation failed.
    assert(p.contains("Window"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("q229 vocab join broadcasts: the corpus token scan never re-shuffles for the vocab") {
    graft.runtime.Stage.newQueryScope()
    val p = SparkEntry.queries("q229_vocab_oov")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"))
  }

  test("q242 per-side norms are computed below the join, once per row, never per pair") {
    import org.apache.spark.sql.catalyst.expressions.Sqrt
    import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
    graft.runtime.Stage.newQueryScope()
    val plan = SparkEntry.queries("q242_hard_negatives")(spark, "/root/testdata/sf0.001")
      .queryExecution.optimizedPlan
    def hasSqrt(p: LogicalPlan): Boolean =
      p.expressions.exists(_.find(_.isInstanceOf[Sqrt]).isDefined)
    val join = plan.collectFirst { case j: Join => j }.get
    // the O(dim) sqrt-norm must appear in each side's projection UNDER the
    // theta-join — otherwise every candidate row pays it once per query row
    assert(join.children.forall(_.collect {
      case p: LogicalPlan if hasSqrt(p) => p
    }.nonEmpty), "each join side must compute its own norm below the join")
    // and NOTHING above the join recomputes a norm: the cosine projection
    // references only the precomputed _qn/_cn columns
    // pre-order prefix up to the join = the node chain above it (the plan
    // is linear between root and the single join)
    val aboveJoin = plan.collect { case p => p }.takeWhile(_ ne join)
    assert(!aboveJoin.exists(hasSqrt),
      "no sqrt may run above the join (per-pair recomputation)")
  }

  test("sharedStage pins partition count and key against AQE coalescing") {
    // THE q21/q22 sf1 serial-collapse pin: a shared stage that feeds a
    // high-fanout join must carry its parallelism ITSELF — AQE sizes
    // stages by input exchanges (blind to join fan-out) and coalesced the
    // KB-sized profile stream to one partition, running the 143M-row word
    // join + pair aggregation in a single 222 s task. The fix caches the
    // cut stage behind an explicit-N repartition on the scoring key: an
    // InMemoryRelation's partitioning can neither be elided by the planner
    // nor rewritten by AQE.
    val prof = (1L to 500L).flatMap(u => (1 to 8).map(w => (u, s"w${(u + w) % 50}", 0.5)))
      .toDF("userId", "word", "value")
    val staged = graft.runtime.Stage.sharedStage(prof, col("userId"))
    assert(staged.rdd.getNumPartitions ===
      spark.sessionState.conf.numShufflePartitions,
      "stage must hold exactly numShufflePartitions partitions")
    assert(staged.queryExecution.optimizedPlan.toString.contains("InMemoryRelation"),
      "stage must be cached (partitioning pinned for every consumer)")
    assert(staged.count() === 4000)
    staged.unpersist()
  }

  test("sharedCut output keeps real size stats; joins above the cut broadcast") {
    // THE q23 sf1 regression pin: a checkpoint-backed cut (LogicalRDD)
    // reports defaultSizeInBytes — effectively infinite — so every join
    // above a shared stage degrades to SortMergeJoin (measured 143 s →
    // 1347 s at sf1 when the TF-IDF profile joins lost their broadcasts).
    // The parquet round-trip must (a) carry the true on-disk size and
    // (b) let a small cut stage auto-broadcast with NO explicit hint.
    val small = (1L to 100L).map(i => (i, s"w$i", i * 0.5))
      .toDF("id", "word", "value")
    val cut = graft.runtime.Stage.sharedCut(small)
    assert(cut.collect().length === 100, "round-trip preserves rows")
    val sz = cut.queryExecution.optimizedPlan.stats.sizeInBytes
    val default = BigInt(spark.sessionState.conf.defaultSizeInBytes)
    assert(sz > 0 && sz < default / 1024,
      s"cut stage must carry real stats, got $sz (default $default)")
    val big = (1L to 10000L).map(i => (i % 100 + 1, i)).toDF("id", "x")
    val joined = big.join(cut, "id")
    val phys = joined.queryExecution.executedPlan.toString
    assert(phys.contains("BroadcastHashJoin"),
      s"join above a small cut stage must broadcast, plan was:\n$phys")
    assert(!phys.contains("SortMergeJoin"),
      "no SortMergeJoin may appear above a megabyte-scale cut stage")
  }
}
