package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** `foreachBatch` — the programmable-sink half of the streaming output API
  * (the reference's Flink `SinkFunction` analogue; the declarative sinks are
  * covered by the memory/file sinks the other streaming queries use).
  *
  * The recipe here is the standard exactly-once upsert onto a
  * non-transactional store: every micro-batch owns the `batch=<id>`
  * subdirectory and OVERWRITES it. After a failure, Structured Streaming
  * replays the last uncommitted batch with the SAME batchId — the rewrite
  * lands in the same directory, so replays repair rather than duplicate.
  * Consumers read the whole tree; partition discovery exposes `batch` as a
  * column to drop.
  */
object ForeachBatchSink {

  /** The (df, batchId) => Unit function to pass to `writeStream.foreachBatch`. */
  def idempotentParquet(out: String)(df: DataFrame, batchId: Long): Unit =
    df.write.mode("overwrite").parquet(s"$out/batch=$batchId")

  /** End-to-end run of the sink: stream the purchase events through
    * foreachBatch into a per-batch-overwrite parquet tree under /tmp, then
    * read the tree back as the ledger. One ingestion per (session, dataset)
    * via the stage registry; the output tree is cleared first so a rerun
    * re-lands every batch instead of double-counting a previous run's.
    */
  def sharedPurchaseLedger(spark: SparkSession, dir: String): DataFrame =
    graft.runtime.Stage.shared(spark, s"foreachbatch-ledger:$dir") {
      val out = graft.runtime.Scratch.dir("ledger", dir)
      val p = new org.apache.hadoop.fs.Path(out)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)

      val stream = StreamingHotTopics.eventsStream(spark, dir)
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("value"))

      val q = stream.writeStream
        .outputMode("append")
        .foreachBatch(idempotentParquet(s"$out/data") _)
        .option("checkpointLocation", s"$out/_ckpt")
        .start()
      try q.processAllAvailable()
      finally q.stop()

      // partition discovery exposes batch=<id>; drop it — the ledger is the
      // union of every batch's (repaired) output.
      graft.runtime.Stage.persistShared(
        spark.read.parquet(s"$out/data").drop("batch"))
    }
}
