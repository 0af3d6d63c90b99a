package graft.streaming

import org.apache.spark.sql.DataFrame

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
}
