package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained dwell-attribution set — the landing store
  * of [[graft.streaming.Streams.dwellPairs]] and the state behind the
  * q144 live dwell report.
  *
  * [[TransitionSink]]'s reconcile contract with a payload: rows are
  * uniquely keyed by (user_id, from_id) — each event owns at most one
  * dwell, and the gap is a deterministic function of the ordered stream
  * — so a replayed batch re-emits identical rows and SET UNION
  * collapses them. The per-type report derives at read time (the gap
  * sum is grid-collapsible, but the stored rows are what replay
  * idempotence is keyed on). */
object DwellSink {

  private[graft] def partial(pairs: DataFrame): DataFrame =
    pairs.select(col("user_id"), col("from_id"), col("from_type"),
      col("gap_us")).distinct()

  private def reconcile(segs: DataFrame): DataFrame = segs.distinct()

  /** foreachBatch hook: append batch N's dwells as segment seq=N. */
  def writer(path: String)(batch: DataFrame, batchId: Long): Unit =
    AdditiveSegments.write(partial(batch), path, batchId)

  /** Merge-on-read: the full distinct dwell set. */
  def read(spark: SparkSession, path: String): DataFrame =
    AdditiveSegments.read(spark, path, reconcile)

  def compact(spark: SparkSession, path: String): Unit =
    AdditiveSegments.compact(spark, path, reconcile)
}
