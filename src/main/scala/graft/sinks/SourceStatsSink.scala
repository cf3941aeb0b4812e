package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained per-source corpus statistics — the live
  * "dataset card" a streaming ingest keeps current, and the third
  * [[AdditiveSegments]] instantiation (after the phrase index and the
  * vocabulary): per-batch (source, n_docs, n_tokens) partials, both
  * decomposable sums, additive under the one-doc-one-batch admission
  * contract. Segments are SOURCES-sized — trivially tiny — so this is
  * the cheapest possible always-on statistic; `mixturePlan` runs q84's
  * α=0.5 tempered token-budget planner directly over the reconciled
  * table, giving the training-mix decision an always-current input
  * without a corpus rescan.
  */
object SourceStatsSink {

  private[graft] def partial(batch: DataFrame): DataFrame =
    graft.functions.TextOps.sourceStatsAggregate(batch)

  private def reconcile(segs: DataFrame): DataFrame =
    segs.groupBy(col("source"))
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))

  /** foreachBatch hook: append batch N's partial as segment seq=N
    * (replay-idempotent — see [[AdditiveSegments]]). */
  def writer(path: String)(batch: DataFrame, batchId: Long): Unit =
    AdditiveSegments.write(partial(batch), path, batchId)

  /** Merge-on-read: the full (source, n_docs, n_tokens) table. */
  def read(spark: SparkSession, path: String): DataFrame =
    AdditiveSegments.read(spark, path, reconcile)

  /** The q84-shaped planning view over the live statistics. */
  def mixturePlan(spark: SparkSession, path: String, budget: Long): DataFrame =
    graft.functions.TextOps.temperedPlan(read(spark, path), budget)

  def compact(spark: SparkSession, path: String): Unit =
    AdditiveSegments.compact(spark, path, reconcile)
}
