package graft.runtime

/** Per-JVM scratch directories under java.io.tmpdir for the round-trip and
  * sentinel lanes.
  *
  * Two fixes over the old fixed `/tmp/graft_<lane>_<hash(dataset)>`
  * convention: (1) a random per-JVM token in every path, so two concurrent
  * graft processes working the same dataset dir cannot overwrite each
  * other's scratch mid-read, and hash-colliding dataset paths cannot alias
  * into one dir; (2) reclamation of dirs leaked by crashed JVMs — the exit
  * hook can't run on SIGKILL, so the first `dir()` call of a run also
  * sweeps sibling `graft_*` scratch (other tokens) older than [[StaleMs]].
  *
  * Plan digests are unaffected: [[graft.tools.PlanDigest.normalize]]
  * already rewrites every `/tmp/...` and `file:...` literal to PATH.
  */
object Scratch {
  private val jvmTag = java.util.UUID.randomUUID().toString.take(8)
  private val root = System.getProperty("java.io.tmpdir")
  private val created =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private val swept = new java.util.concurrent.atomic.AtomicBoolean(false)

  /** Age after which an unowned scratch dir is presumed leaked by a dead
    * JVM. Directory mtime only updates on direct child add/remove, so a
    * long concurrent run's dirs can look idle for its whole duration —
    * 24h clears any realistic run length while still reclaiming day-old
    * crash leaks.
    */
  private val StaleMs = 24L * 3600 * 1000

  sys.addShutdownHook {
    created.forEach(p => delete(new java.io.File(p)))
  }

  /** Scratch dir for (lane, dataset): `graft_<lane>_<jvmTag>_<dsTag>`.
    * Not created on disk — every caller writes with mode(overwrite).
    */
  def dir(lane: String, datasetDir: String): String = {
    if (swept.compareAndSet(false, true)) sweepStale()
    val tag = Integer.toHexString(datasetDir.hashCode).replace('-', '_')
    val p = s"$root/graft_${lane}_${jvmTag}_$tag"
    created.add(p)
    p
  }

  private def delete(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(delete)
    f.delete()
    ()
  }

  private def sweepStale(): Unit = {
    val cutoff = System.currentTimeMillis() - StaleMs
    val kids = new java.io.File(root).listFiles()
    if (kids != null) kids.foreach { f =>
      if (f.isDirectory && f.getName.startsWith("graft_")
          && !f.getName.contains(jvmTag) && f.lastModified < cutoff) {
        delete(f)
      }
    }
  }
}
