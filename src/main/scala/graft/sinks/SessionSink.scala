package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained finalized-session store — the landing
  * store of [[graft.streaming.Streams.sessionAgg]] and the state
  * behind the q149 live session stats.
  *
  * Rows are uniquely keyed by (user_id, start_us): the streaming
  * session operator emits each session exactly once, on finalization,
  * and the payload (n_events, dur_us, converted) is a deterministic
  * aggregate of the session's events — so a replayed batch re-emits
  * identical rows and SET UNION collapses them (the [[TransitionSink]]
  * contract). */
object SessionSink {

  private[graft] def partial(sessions: DataFrame): DataFrame =
    sessions.select(col("user_id"), col("start_us"), col("n_events"),
      col("dur_us"), col("converted")).distinct()

  private def reconcile(segs: DataFrame): DataFrame = segs.distinct()

  /** foreachBatch hook: append batch N's sessions as segment seq=N. */
  def writer(path: String)(batch: DataFrame, batchId: Long): Unit =
    AdditiveSegments.write(partial(batch), path, batchId)

  /** Merge-on-read: the full distinct session set. */
  def read(spark: SparkSession, path: String): DataFrame =
    AdditiveSegments.read(spark, path, reconcile)

  def compact(spark: SparkSession, path: String): Unit =
    AdditiveSegments.compact(spark, path, reconcile)
}
