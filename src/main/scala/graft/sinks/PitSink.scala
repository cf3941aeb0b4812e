package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained point-in-time read set — the landing store
  * of [[graft.streaming.Streams.pitReads]] and the state behind the
  * q145 live PIT join.
  *
  * Rows are uniquely keyed by (user_id, event_id): a purchase reads its
  * as-of state exactly once, and the (version, k) payload is a
  * deterministic function of the ordered prefix — replayed batches
  * re-emit identical rows, SET UNION collapses them (the
  * [[TransitionSink]] contract). */
object PitSink {

  private[graft] def partial(reads: DataFrame): DataFrame =
    reads.select(col("user_id"), col("event_id"), col("ts_us"),
      col("state_version"), col("state_k")).distinct()

  private def reconcile(segs: DataFrame): DataFrame = segs.distinct()

  /** foreachBatch hook: append batch N's reads as segment seq=N. */
  def writer(path: String)(batch: DataFrame, batchId: Long): Unit =
    AdditiveSegments.write(partial(batch), path, batchId)

  /** Merge-on-read: the full distinct read set. */
  def read(spark: SparkSession, path: String): DataFrame =
    AdditiveSegments.read(spark, path, reconcile)

  def compact(spark: SparkSession, path: String): Unit =
    AdditiveSegments.compact(spark, path, reconcile)
}
