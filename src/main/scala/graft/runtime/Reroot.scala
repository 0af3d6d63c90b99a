package graft.runtime

import org.apache.spark.sql.DataFrame

/** Plan re-rooting strategy for iterative BSP operators
  * ([[graft.ext.Dedup.connectedComponents]], [[graft.ext.Graph]] PageRank
  * variants). Each superstep must cut lineage — otherwise the logical plan
  * grows by two joins per round and re-analysis cost is quadratic in the
  * round count — but WHERE the cut's blocks live is a deployment decision,
  * not an algorithm one:
  *
  *  - [[Reroot.Local]] (default): `localCheckpoint` into executor
  *    block-manager memory/disk. Fastest; on a multi-executor cluster an
  *    executor loss forfeits the blocks and fails the job (the loop would
  *    restart from scratch). The right choice for short loops, local mode,
  *    and any run whose restart cost is acceptable.
  *  - [[Reroot.Reliable]]: `checkpoint` into a fault-tolerant directory
  *    (HDFS/object store). Each round pays a write + read of the frame, but
  *    executor loss recomputes only from the last checkpoint — the right
  *    choice for long iterations on preemptible/large clusters.
  *
  * Both produce a plain `LogicalRDD` root, so AQE stays free to re-plan
  * each round's shuffles (unlike `persist`, whose cached-plan output
  * partitioning is pinned).
  */
sealed trait Reroot {
  def apply(df: DataFrame): DataFrame
}

object Reroot {

  /** Deployment default: `Reliable(dir)` when `SPARK_GRAFT_CHECKPOINT_DIR`
    * is set (cluster/preemptible runs point it at HDFS or an object store),
    * else `Local`. Every iterative query lane resolves its strategy through
    * here, so flipping a whole deployment to fault-tolerant checkpoints is
    * one env var — no code change, and the local driver gate keeps the
    * fast path.
    */
  def fromEnv(): Reroot =
    sys.env.get("SPARK_GRAFT_CHECKPOINT_DIR").map(Reliable.apply).getOrElse(Local)

  /** Executor-memory lineage cut (`localCheckpoint`, eager). */
  case object Local extends Reroot {
    def apply(df: DataFrame): DataFrame = df.localCheckpoint()
  }

  /** Fault-tolerant lineage cut (`checkpoint`, eager) rooted at `dir`.
    * Sets the context's checkpoint directory on first use; passing two
    * different dirs to one SparkContext keeps the first (Spark's
    * checkpoint dir is context-global) — callers on a shared session
    * should treat the dir as session-scoped configuration.
    */
  final case class Reliable(dir: String) extends Reroot {
    def apply(df: DataFrame): DataFrame = {
      val sc = df.sparkSession.sparkContext
      if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(dir)
      df.checkpoint()
    }
  }

  /** Wrap a strategy for a LOOP-CARRIED frame (labels, ranks): round N's
    * cut supersedes round N−1's, so once round N has materialized, the
    * previous round's reliable checkpoint files are deleted eagerly.
    * Without this, `spark.cleaner.referenceTracking.cleanCheckpoints`
    * defaults to false and a 25-round CC loop leaves ~25 full copies of
    * the label frame in the checkpoint store for the app lifetime. The
    * final round's files are never deleted (the returned frame reads from
    * them). Frames checkpointed ONCE per run (symmetrized edges, degree)
    * must keep using the base strategy — they are live for every round.
    * For [[Local]] this is the identity: superseded localCheckpoint blocks
    * are already reclaimed by the ContextCleaner when their RDDs go
    * unreferenced.
    */
  def rolling(base: Reroot): Reroot = base match {
    case r: Reliable => new RollingReliable(r)
    case other       => other
  }

  private final class RollingReliable(base: Reliable) extends Reroot {
    private var prev: Seq[String] = Nil
    def apply(df: DataFrame): DataFrame = {
      val out = base(df)
      // base() is eager: out's data is fully materialized in its OWN
      // rdd-* files before the superseded round's files are removed, so
      // a later recompute of out never reaches back past its checkpoint.
      val conf = df.sparkSession.sparkContext.hadoopConfiguration
      prev.foreach { p =>
        val path = new org.apache.hadoop.fs.Path(p)
        try { path.getFileSystem(conf).delete(path, true); () }
        catch { case e: java.io.IOException =>
          System.err.println(s"[reroot] superseded checkpoint cleanup failed for $p: $e") }
      }
      prev = checkpointFiles(out.rdd)
      out
    }
  }

  /** All reliable-checkpoint files reachable in an RDD's dependency DAG.
    * For a just-checkpointed frame the DAG contains exactly its own file
    * (the plan was re-rooted to a LogicalRDD over the checkpointed RDD).
    */
  private def checkpointFiles(r: org.apache.spark.rdd.RDD[_]): Seq[String] =
    (r.getCheckpointFile.toSeq ++
      r.dependencies.flatMap(d => checkpointFiles(d.rdd))).distinct
}
