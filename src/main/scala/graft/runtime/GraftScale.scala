package graft.runtime

/** Scale-adaptive harness knobs.
  *
  * The settings that save a large-SF run in one local JVM — fine-grained
  * initial shuffle partitions so no single sort partition outgrows the
  * heap, serialized stage caches so 200+ queries of cached stages don't
  * become a GC storm — are pure overhead when the dataset is small (an
  * unconditional switch cost a broad ~1.3× at the sf0.1 bench). Engage
  * them only when the dataset's on-disk footprint says memory pressure is
  * real. On a real cluster the same decision is made per deployment:
  * partitions are sized to executor memory at the actual data scale, not
  * pinned to one number for every workload.
  */
object GraftScale {

  /** On-disk parquet bytes above which a run is treated as
    * memory-pressuring for a single local JVM: sf0.1 is ~17 MB, sf1
    * ~170 MB (roughly ×10 in memory once decompressed and decoded — the
    * scale where the 8 GB default heap first OOM'd).
    */
  val LargeBytes: Long = 64L << 20

  def dirBytes(dir: String): Long = {
    def walk(f: java.io.File): Long =
      if (f.isDirectory) Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
      else f.length()
    walk(new java.io.File(dir))
  }

  /** Returns whether `sfDir` is a large run and publishes
    * `graft.stage.ser` so [[Stage]] caches pick the serialized level.
    * Call before any query builds a plan.
    */
  def configure(sfDir: String): Boolean = {
    val big = dirBytes(sfDir) >= LargeBytes
    System.setProperty("graft.stage.ser", big.toString)
    big
  }
}
