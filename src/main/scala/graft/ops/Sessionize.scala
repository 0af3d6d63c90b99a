package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization — the event-stream operator every training-data
  * /behavior pipeline needs (no reference analogue; extension surface like
  * ext.Dedup). Two formulations, cross-validated against each other under
  * DuckDB oracles:
  *
  *  - this hand-rolled lag/cumsum form (portable window algebra: one shuffle
  *    on the key, one in-partition sort, no state store) — q54;
  *  - Spark's built-in `session_window` (same merge rule; in streaming it
  *    runs on the session-state store) — q60.
  *
  * Merge rule (frozen to match `session_window`): an event extends the
  * current session iff its gap to the previous event is STRICTLY LESS than
  * `gapSeconds`; gap >= gapSeconds starts a new session. Comparison is in
  * exact epoch micros.
  *
  * Scale: the window form shuffles each key's events once and never
  * materializes a session in memory; skewed keys cost what their event count
  * costs (same bound as any per-key sort).
  */
object Sessionize {

  /** Assign per-key session ordinals (1-based, in time order). Ordering ties
    * broken by `tieCol` so results are deterministic across engines.
    */
  def sessionize(df: DataFrame, keyCol: String, tsCol: String, tieCol: String,
                 gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol).asc, col(tieCol).asc)
    val prev = lag(col(tsCol), 1).over(w)
    val isNew = when(prev.isNull ||
      unix_micros(col(tsCol)) - unix_micros(prev) >= gapSeconds * 1000000L, 1)
      .otherwise(0)
    df.withColumn("_new_session", isNew)
      .withColumn("session_id", sum(col("_new_session"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("_new_session")
  }

  /** Per-session stats: (key, session_id, n_events, t_start, t_end). */
  def sessionStats(df: DataFrame, keyCol: String, tsCol: String, tieCol: String,
                   gapSeconds: Long): DataFrame =
    sessionize(df, keyCol, tsCol, tieCol, gapSeconds)
      .groupBy(col(keyCol), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("t_start"),
        max(col(tsCol)).as("t_end"))
}
