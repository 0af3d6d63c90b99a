package graft.runtime

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel
import scala.collection.mutable

/** Cross-query materialized-stage registry.
  *
  * The reference pipelines are explicitly staged: keyword profiles are
  * written to files once and re-read by every later stage and loop day
  * (`DocumentModel.loadDocumentDataSet`, /root/reference/TF_IDF.java:109,127,
  * 156,176 — the E1a artifacts). This object is the Spark-native equivalent:
  * a deterministic shared stage (TF-IDF profiles, minhash signatures,
  * shingle sets, streaming count tables) is built and persisted once per
  * (session, dataset) and reused by every query that consumes it, instead of
  * re-deriving the identical DataFrame per query. The first consumer pays
  * the materialization cost.
  *
  * Two lifetimes:
  *  - `shared`: session-lifetime memoization for stage outputs reused
  *    across queries (small, profile-sized tables). Keyed by
  *    `spark.sessionUUID` (stable and unique per session — identity hashes
  *    can collide or be reused after GC) and evicted when the session's
  *    application ends, so long-lived JVMs don't accumulate entries bound
  *    to dead SparkContexts.
  *  - `scopedPersist`: caches private to one query (self-join inputs,
  *    multi-branch intermediates). Registered here and released when the
  *    next query begins — without this, a 50-query run accumulates every
  *    query's intermediates in the block manager and spends its time in GC
  *    and eviction instead of work.
  *
  * Queries run sequentially under the driver contract (Verify/Bench), so a
  * coarse lock is enough.
  */
object Stage {
  private val cache = mutable.Map[String, Any]()
  private val scoped = mutable.Buffer[DataFrame]()
  private val hooked = mutable.Set[String]()

  /** Memoized shared stage: first caller builds (persisting what it returns
    * via [[persistShared]]); later callers get the same object. Key must
    * include everything the build depends on (dataset dir, parameters) —
    * the session is keyed automatically by its UUID.
    */
  def shared[T](spark: SparkSession, key: String)(build: => T): T =
    synchronized {
      val uuid = sessionTag(spark)
      if (!hooked.contains(uuid)) {
        hooked += uuid
        // Evict this session's entries when its application stops: a cached
        // DataFrame bound to a stopped SparkContext is unusable and pins
        // block-manager metadata.
        spark.sparkContext.addSparkListener(new SparkListener {
          override def onApplicationEnd(e: SparkListenerApplicationEnd): Unit =
            evictSession(uuid)
        })
      }
      cache.getOrElseUpdate(s"$uuid:$key", build).asInstanceOf[T]
    }

  /** Stable per-session cache key prefix: `sessionUUID` is unique for the
    * session's lifetime and never reused, unlike identity hash codes.
    */
  // SparkSession.sessionUUID is private[sql], so mint our own stable tag:
  // a weak identity map + monotonic counter. Unlike raw identity hashes,
  // tags are unique for the JVM lifetime and never reused after a session
  // is GC'd (the weak entry dies with the session; a new session gets a
  // fresh counter value).
  private val sessionTags =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, String]())
  private val tagCounter = new java.util.concurrent.atomic.AtomicLong(0)

  private def sessionTag(spark: SparkSession): String =
    sessionTags.computeIfAbsent(spark, _ => s"s${tagCounter.incrementAndGet()}")

  /** Drop every cached stage belonging to `sessionUUID`. */
  def evictSession(sessionUUID: String): Unit = synchronized {
    cache.keys.filter(_.startsWith(sessionUUID + ":")).toList
      .foreach(cache.remove)
    hooked -= sessionUUID
  }

  /** Drop everything (test harness hook). */
  def clear(): Unit = synchronized {
    cache.clear(); hooked.clear()
    scoped.foreach(_.unpersist(blocking = false)); scoped.clear()
  }

  /** Storage level for stage caches, chosen by input scale.
    *
    * SER for large runs: cached row objects on the heap are what turned a
    * 243-query sf1 run into a GC storm (deserialized MEMORY_AND_DISK
    * blocks held ~GBs of boxed rows across queries; execution sorts then
    * OOM'd a heap the memory manager thought was free). Serialized blocks
    * cost one deserialization per read but shrink the resident footprint
    * several-fold and make eviction byte-accurate — the same reasoning a
    * multi-tenant cluster deployment uses for long-lived shared caches.
    * Deserialized for small runs: at bench SF the caches are KBs–MBs and
    * the per-read deserialization is pure overhead (an unconditional SER
    * switch cost a broad ~1.3× at sf0.1). Bench/Verify/Profile set the
    * property from the dataset's on-disk size (see `GraftScale.configure`).
    *
    * When the property is ABSENT (an entry point that never called
    * `GraftScale.configure`), default to SER: the failure mode of a wrong
    * deserialized choice is an OOM/GC storm at scale, while a wrong SER
    * choice is a bounded small-data slowdown. Only an explicit "false"
    * (a configured small run) picks the deserialized level.
    */
  private def cacheLevel: StorageLevel =
    if (sys.props.get("graft.stage.ser").contains("false"))
      StorageLevel.MEMORY_AND_DISK
    else StorageLevel.MEMORY_AND_DISK_SER

  /** Persist a DataFrame for the session lifetime (shared-stage outputs).
    *
    * INVARIANT: the frame's lineage must not reference any scoped cache.
    * Spark's non-cascading unpersist invalidates dependent cache entries
    * and lazily rebuilds them WITHOUT the removed cache — so a shared
    * persist built over a [[scopedPersist]] input loses its buffers at the
    * next query scope and silently re-runs its full raw lineage on every
    * later read (measured 6.7 s → 35 s per read on the sf1 BPE stage).
    * Stages that need scoped build inputs must cut lineage via
    * [[sharedCut]] instead.
    */
  def persistShared(df: DataFrame): DataFrame =
    df.persist(cacheLevel)

  /** Eager lineage-cut persistence for shared-stage outputs whose BUILD
    * uses scoped caches: materializes now (while the scoped inputs are
    * alive and warm) into a checkpoint, so the result is self-contained
    * data with no plan-cache dependency to invalidate. Routed through the
    * deployment [[Reroot]] strategy — fault-tolerant `checkpoint(dir)`
    * under SPARK_GRAFT_CHECKPOINT_DIR, else an eager `localCheckpoint` at
    * the stage cache level (serialized at scale, same as every other
    * stage cache). Eager costs nothing net: shared stages are materialized
    * by their first consumer anyway; this just moves the job inside the
    * build, before the scoped inputs are released.
    */
  def sharedCut(df: DataFrame): DataFrame =
    Reroot.fromEnv() match {
      case Reroot.Local => df.localCheckpoint(true, cacheLevel)
      case r            => r(df)
    }

  /** Persist a DataFrame for the CURRENT query only; released when the next
    * query begins.
    */
  def scopedPersist(df: DataFrame): DataFrame = synchronized {
    val p = df.persist(cacheLevel)
    scoped += p
    p
  }

  /** Called at query entry (SparkEntry wraps every declared query): drop the
    * previous query's scoped caches.
    */
  def newQueryScope(): Unit = synchronized {
    scoped.foreach(_.unpersist(blocking = false))
    scoped.clear()
  }
}
