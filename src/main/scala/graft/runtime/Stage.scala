package graft.runtime

import org.apache.spark.sql.DataFrame
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
  *    across queries (small, profile-sized tables).
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

  /** Memoized shared stage: first caller builds (persisting what it returns
    * via [[persistShared]]); later callers get the same object. Key must
    * include everything the build depends on (dataset dir, parameters).
    */
  def shared[T](key: String)(build: => T): T =
    synchronized { cache.getOrElseUpdate(key, build).asInstanceOf[T] }

  /** Persist a DataFrame for the session lifetime (shared-stage outputs). */
  def persistShared(df: DataFrame): DataFrame =
    df.persist(StorageLevel.MEMORY_AND_DISK)

  /** Persist a DataFrame for the CURRENT query only; released when the next
    * query begins.
    */
  def scopedPersist(df: DataFrame): DataFrame = synchronized {
    val p = df.persist(StorageLevel.MEMORY_AND_DISK)
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
