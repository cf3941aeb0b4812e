package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained transition-pair set — the landing store of
  * [[graft.streaming.Streams.transitionPairs]] and the state behind the
  * q133 live transition matrix.
  *
  * The reconciling aggregate is SET UNION over rows uniquely keyed by
  * (user_id, from_id): the stateful engine emits each event as the
  * `from` side of at most one pair, so a replayed batch re-emits the
  * SAME pair rows (flatMapGroupsWithState is deterministic given batch
  * + checkpointed state) and duplicates collapse on read — the
  * RetentionSink idempotence contract, not the counting sinks'
  * one-doc-one-batch admission. Segment size is bounded by the batch's
  * emitted pairs (≤ its events); compaction on a cadence bounds the
  * merge fan-in. The matrix (per-src normalization) is derived at read
  * time from the grid-sized aggregate, exactly like the q122 cohort
  * matrix — storing it incrementally would be redundant state over a
  * ≤|types|² frame. */
object TransitionSink {

  private[graft] def partial(pairs: DataFrame): DataFrame =
    pairs.select(col("user_id"), col("from_id"), col("to_id"),
      col("src"), col("dst")).distinct()

  private def reconcile(segs: DataFrame): DataFrame = segs.distinct()

  /** foreachBatch hook: append batch N's pairs as segment seq=N
    * (replay-idempotent — see [[AdditiveSegments]]). */
  def writer(path: String)(batch: DataFrame, batchId: Long): Unit =
    AdditiveSegments.write(partial(batch), path, batchId)

  /** Merge-on-read: the full distinct pair set. */
  def read(spark: SparkSession, path: String): DataFrame =
    AdditiveSegments.read(spark, path, reconcile)

  def compact(spark: SparkSession, path: String): Unit =
    AdditiveSegments.compact(spark, path, reconcile)
}
