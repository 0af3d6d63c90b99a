package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Session-window aggregation over an event frame (SURVEY.md §2.8 upgrade
  * path): works identically on a batch frame and a `readStream` frame —
  * the session-window operator is the state-store generalization of
  * `ops.Sessionize`'s lag/cumsum form (same merge rule; both under
  * equivalent oracles via q54/q60).
  *
  * Streaming semantics: append mode + event-time watermark; a session is
  * emitted once the watermark passes its close (last event + gap). State
  * per open session only — the streaming-scale answer when the event log
  * is unbounded and the batch sort-per-key is not an option.
  */
object StreamingSessions {

  /** Per-(user, session) stats: (user_id, t_start, t_end, n_events), where
    * t_end is the last event's time (window end minus the gap).
    * `events` needs (user_id, ts) columns; may be batch or streaming.
    */
  def sessionAgg(events: DataFrame, gap: String = "30 minutes",
                 watermarkDelay: String = "0 seconds"): DataFrame = {
    val withWm =
      if (events.isStreaming) events.withWatermark("ts", watermarkDelay)
      else events
    withWm
      .groupBy(session_window(col("ts"), gap).as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("sw.start").as("t_start"),
        (col("sw.end") - expr(s"INTERVAL $gap")).as("t_end"),
        col("n_events"))
  }
}
