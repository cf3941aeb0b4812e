package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained user-activity set — the streaming twin of
  * the q118 cohort matrix, instantiating [[AdditiveSegments]] with the
  * distinct (user_id, day) pairs of each batch.
  *
  * The reconciling aggregate is SET UNION (distinct), which is
  * IDEMPOTENT, not merely additive — a strictly stronger replay story
  * than the counting sinks: vocab/phrase df-additivity requires each
  * document to arrive in exactly one micro-batch, but here the same
  * (user, day) activity may arrive in ANY number of batches (a user's
  * events routinely straddle batch boundaries, and at-least-once
  * delivery may duplicate whole events) and the merged state is still
  * exact — duplicates collapse on read, per segment and across
  * segments. Segment size is bounded by the batch's distinct active
  * (user, day) pairs — ≤ active users per batch window, tiny relative
  * to event volume; compaction on a cadence bounds the merge fan-in
  * exactly as for the counting sinks.
  *
  * The cohort matrix itself (min day per user → offset cells) is NOT
  * maintained incrementally on purpose: a later batch can reveal an
  * EARLIER first-seen day (late data), which would re-cohort the user —
  * history-dependent, the same exclusion that pushed q116 to a
  * version chain. The stored state is the activity SET (idempotent,
  * order-free); the matrix derives from it at read time, and the
  * derivation's cost is bounded by the set size, not event volume. */
object RetentionSink {

  private[graft] def partial(batch: DataFrame): DataFrame =
    // a timestampless event is no evidence of activity (the q118
    // batch side applies the same refusal, so stream ≡ batch holds)
    batch.filter(col("ts").isNotNull)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()

  private def reconcile(segs: DataFrame): DataFrame = segs.distinct()

  /** foreachBatch hook: append batch N's distinct activity pairs as
    * segment seq=N (replay-idempotent — see [[AdditiveSegments]]). */
  def writer(path: String)(batch: DataFrame, batchId: Long): Unit =
    AdditiveSegments.write(partial(batch), path, batchId)

  /** Merge-on-read: the full distinct (user_id, day) activity set. */
  def read(spark: SparkSession, path: String): DataFrame =
    AdditiveSegments.read(spark, path, reconcile)

  def compact(spark: SparkSession, path: String): Unit =
    AdditiveSegments.compact(spark, path, reconcile)
}
