package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained phrase inverted index — the streaming twin
  * of the q65 batch build, and the ADDITIVE counterpart of
  * [[MergeParquetSink]] (whose newest-row-wins reconcile fits dim
  * tables, not count accumulation).
  *
  * Layout: `path/seq=N/` holds batch N's per-phrase PARTIAL aggregate
  * (df, occ, min_doc, max_doc, id_sum). All five are decomposable
  * aggregates, so the read side reconciles with one groupBy(phrase):
  * sum(df), sum(occ), min(min_doc), max(max_doc), sum(id_sum) — the
  * merge-on-read trick applied to counts instead of versions.
  *
  * df stays additive under ONE contract: a document's phrases arrive in
  * exactly one micro-batch (each doc admitted once — upstream dedup
  * admission, e.g. `DedupOps.streamingDedupWriter`, provides exactly
  * this). Replays are idempotent the same way the merge sink's are:
  * each batch writes to its own `seq=batchId` dir with ErrorIfExists,
  * so a restarted batch re-write no-ops instead of double-counting.
  *
  * `compact` folds all segments into one (seq=COMPACT_SEQ via staging +
  * atomic rename, crash-recoverable like the merge sink's), bounding
  * read-side merge cost on a cadence.
  *
  * Scale: each segment is a per-batch aggregate — segment size is
  * bounded by the batch's distinct-phrase count, not the corpus; the
  * read-side merge shuffles one narrow row per (segment, phrase).
  * Reference analog: the ES index the reference's publisher queries
  * (PublishDaoImpl.java) — here the index is a first-class table the
  * engine maintains itself.
  */
object PhraseIndexSink {

  /** q65's per-phrase aggregate over one batch of (doc_id, text) — the
    * SAME code the batch query runs (shared builder, cannot drift). */
  private[graft] def partial(batch: DataFrame): DataFrame =
    graft.functions.TextOps.phraseAggregate(batch)

  /** All five columns are decomposable, so segments merge with one
    * groupBy(phrase): sum(df), sum(occ), min/max, sum(id_sum). */
  private def reconcile(segs: DataFrame): DataFrame =
    segs.groupBy(col("phrase"))
      .agg(sum(col("df")).as("df"), sum(col("occ")).as("occ"),
        min(col("min_doc")).as("min_doc"), max(col("max_doc")).as("max_doc"),
        sum(col("id_sum")).as("id_sum"))

  /** foreachBatch hook: append batch N's partial as segment seq=N
    * (replay-idempotent — see [[AdditiveSegments]]). */
  def writer(path: String)(batch: DataFrame, batchId: Long): Unit =
    AdditiveSegments.write(partial(batch), path, batchId)

  /** Merge-on-read. `minDf` mirrors q65's published df floor. */
  def read(spark: SparkSession, path: String, minDf: Long = 0L): DataFrame =
    AdditiveSegments.read(spark, path, reconcile).filter(col("df") >= minDf)

  def compact(spark: SparkSession, path: String): Unit =
    AdditiveSegments.compact(spark, path, reconcile)
}
