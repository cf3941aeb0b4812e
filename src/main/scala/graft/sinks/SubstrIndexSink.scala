package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained exact-substring index — q156's lifecycle
  * twin of the q154 batch scan. Two sub-stores per table path:
  *
  *  - `pos`: each batch's positional grams (doc_id, pos, h) as an
  *    [[IngestSegments]] row store (overwrite-by-batch-id replay
  *    contract, rename-before-delete compaction; the span probe dedups
  *    on (doc_id, pos) — h is functionally determined by them — so a
  *    crash-window duplicate can never split an island or inflate its
  *    n_grams), and
  *  - `counts`: each batch's gram-count partial (h, n) as
  *    [[AdditiveSegments]] (sum-reconciled; counts cannot tolerate
  *    duplicates, so that lifecycle's delete-before-rename protocol
  *    applies).
  *
  * Ingest cost tracks the BATCH — its own grams plus a count partial
  * bounded by the batch's distinct grams — and the corpus is never
  * rewritten. The span probe reads the reconciled counts (n ≥ 2 ⇒
  * duplicated anywhere in the corpus so far), joins the stored
  * positions on the 8-byte hash, and runs q154's island merge —
  * hash-equal to the batch answer under the one-doc-one-batch
  * admission contract (a document's grams all land in one segment, so
  * per-gram counts are exact sums across segments; q102/q103's df
  * argument). Per-batch grams are persisted across the two writes so
  * the text is tokenized/hashed once per batch.
  */
object SubstrIndexSink {

  /** q154's witness length — the stored layout's geometry; a retune
    * requires a rebuild (positions and counts are L-specific). */
  private val L = 8

  private def reconcile(segs: DataFrame): DataFrame =
    segs.groupBy(col("h")).agg(sum(col("n")).as("n"))

  /** foreachBatch hook: positions segment + count partial, both keyed
    * by batchId (replay-idempotent in both sub-stores). */
  def writer(path: String)(batch: DataFrame, batchId: Long): Unit = {
    val g = graft.functions.DedupOps.gramPositions(batch, L).persist()
    try {
      g.write.mode("overwrite").parquet(s"$path/pos/ingest=$batchId")
      AdditiveSegments.write(
        g.groupBy(col("h")).agg(count(lit(1)).as("n")),
        s"$path/counts", batchId)
    } finally g.unpersist(false)
  }

  /** The full-corpus duplicated spans — q154's output shape, computed
    * from the stored index instead of re-scanning any text. */
  def spans(spark: SparkSession, path: String): DataFrame =
    IngestSegments.readLive(spark, s"$path/pos") match {
      case None =>
        spark.range(0).select(col("id").as("doc_id"),
          col("id").as("span_start"), col("id").as("span_end"),
          col("id").as("n_grams"))
      case Some(pos) =>
        val dup = AdditiveSegments.read(spark, s"$path/counts", reconcile)
          .filter(col("n") >= 2).select(col("h"))
        graft.functions.DedupOps.islandSpans(
          pos.select(col("doc_id"), col("pos"), col("h"))
            .dropDuplicates("doc_id", "pos")
            .join(dup, "h"), L)
    }

  /** q161: span provenance served from the stored index — the position
    * store IS the positional gram frame accumulated batch by batch
    * (under the one-doc-one-batch admission contract, deduped on
    * (doc_id, pos) against crash-window replays), so the q157 shape
    * runs over it directly and the corpus is never re-tokenized. The
    * reconciled counts store is not needed here: provenance's own
    * per-(gram, doc) aggregate over the stored positions yields n_occ
    * as a free sum, and recomputing it keeps the twin hash-equal to
    * q157 by construction rather than by a second reconciliation
    * proof. */
  def provenance(spark: SparkSession, path: String): DataFrame =
    IngestSegments.readLive(spark, s"$path/pos") match {
      case None =>
        spark.range(0).select(col("id").as("doc_id"),
          col("id").as("span_start"), col("id").as("span_end"),
          col("id").as("partner_doc"), col("id").as("n_occ"))
      case Some(pos) =>
        graft.functions.DedupOps.spanProvenanceFromGrams(
          pos.select(col("doc_id"), col("pos"), col("h"))
            .dropDuplicates("doc_id", "pos"), L)
    }

  def compact(spark: SparkSession, path: String): Unit = {
    IngestSegments.compact(spark, s"$path/pos",
      fold = _.dropDuplicates("doc_id", "pos").drop("ingest"), Seq.empty)
    AdditiveSegments.compact(spark, s"$path/counts", reconcile)
  }
}
