package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained funnel-advance set — the landing store of
  * [[graft.streaming.Streams.funnelAdvance]] and the state behind the
  * q140 live funnel.
  *
  * Same reconcile contract as [[TransitionSink]]: SET UNION over rows
  * uniquely keyed by (user_id, step) — the fold emits each step at most
  * once per user, a replayed batch re-emits the SAME rows
  * (flatMapGroupsWithState is deterministic given batch + checkpointed
  * state), and duplicates collapse on read. The store is tiny by
  * construction (≤ 3 rows per ever-converted user), so compaction is
  * cheap and the funnel report derives at read time — materializing the
  * three counts incrementally would be redundant state over a 1-row
  * answer. */
object FunnelSink {

  private[graft] def partial(steps: DataFrame): DataFrame =
    steps.select(col("user_id"), col("step")).distinct()

  private def reconcile(segs: DataFrame): DataFrame = segs.distinct()

  /** foreachBatch hook: append batch N's advances as segment seq=N
    * (replay-idempotent — see [[AdditiveSegments]]). */
  def writer(path: String)(batch: DataFrame, batchId: Long): Unit =
    AdditiveSegments.write(partial(batch), path, batchId)

  /** Merge-on-read: the full distinct (user, step) set. */
  def read(spark: SparkSession, path: String): DataFrame =
    AdditiveSegments.read(spark, path, reconcile)

  def compact(spark: SparkSession, path: String): Unit =
    AdditiveSegments.compact(spark, path, reconcile)
}
