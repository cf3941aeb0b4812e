package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained corpus vocabulary — the streaming twin of
  * the q82 batch build, instantiating [[AdditiveSegments]] with the
  * per-token (freq, df) aggregate (both decomposable sums).
  *
  * df stays additive under the same contract as the phrase index: a
  * document's tokens arrive in exactly one micro-batch (upstream dedup
  * admission provides exactly this). Segment size is bounded by the
  * batch's distinct-token count — for natural text that converges to
  * the VOCABULARY size (Heaps' law), so segments stay tiny however
  * large the batches; compaction on a cadence bounds the read-side
  * merge fan-in. A tokenizer-training job reads `topK` — identical in
  * shape and ordering to the q82 batch result.
  */
object VocabSink {

  private[graft] def partial(batch: DataFrame): DataFrame =
    graft.functions.TextOps.vocabAggregate(batch)

  private def reconcile(segs: DataFrame): DataFrame =
    segs.groupBy(col("token"))
      .agg(sum(col("freq")).as("freq"), sum(col("df")).as("df"))

  /** foreachBatch hook: append batch N's partial as segment seq=N
    * (replay-idempotent — see [[AdditiveSegments]]). */
  def writer(path: String)(batch: DataFrame, batchId: Long): Unit =
    AdditiveSegments.write(partial(batch), path, batchId)

  /** Merge-on-read: the full (token, freq, df) table. */
  def read(spark: SparkSession, path: String): DataFrame =
    AdditiveSegments.read(spark, path, reconcile)

  /** read() tolerating a segment-less table (cold-start streams whose
    * batches so far tokenized to nothing). */
  def readOpt(spark: SparkSession, path: String): Option[DataFrame] =
    AdditiveSegments.readOpt(spark, path, reconcile)

  /** The q82-shaped view: deterministic top-k with dense ranks. */
  def topK(spark: SparkSession, path: String, k: Int = 200): DataFrame =
    graft.functions.TextOps.vocabTopK(read(spark, path), k)

  def compact(spark: SparkSession, path: String): Unit =
    AdditiveSegments.compact(spark, path, reconcile)
}
