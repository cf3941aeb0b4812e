package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained benchmark gram-hash REGISTRY — q164's
  * lifecycle twin of q162's batch decontamination, the q156 convention
  * applied to the eval side: eval suites evolve (new benchmarks land,
  * contamination windows extend), and re-deriving the gram vocabulary
  * from every raw benchmark document per decontamination run re-pays
  * the tokenize+hash for the whole registry when only one batch is
  * new. Here each benchmark ingest batch writes its own distinct gram
  * hashes as an [[IngestSegments]] row segment, and decontamination is
  * served from the stored set.
  *
  * The registry is a SET, which buys the simplest possible lifecycle:
  * replay/crash-window duplicates across segments are semantically
  * invisible (the serving router distincts before broadcasting — the
  * same `.distinct()` the batch path already owed), so the row-store
  * protocol (overwrite-by-batch-id replay, rename-before-delete
  * compaction, duplicate-tolerant reads) applies with a plain
  * dedup fold and no additive reconciliation at all — contrast
  * [[SubstrIndexSink]], whose counts store cannot tolerate duplicates.
  *
  * Ingest cost tracks the BATCH (its own distinct grams); the registry
  * is never rewritten and the training corpus is never touched by any
  * registry maintenance. Reference behavior: the dim-table upsert
  * lifecycle (reference `app/OdsBaseDbApp.scala:89-130` routes dim
  * changes into an incrementally-maintained store the serving join
  * reads) — re-expressed for the decontamination registry.
  */
object BenchRegistrySink {

  /** q162's decontamination witness length — registry geometry; a
    * retune requires a rebuild (stored hashes are L-specific). */
  private val L = 4

  /** The q162 benchmark cut — the ONE shared boundary constant
    * (graft.functions.DedupOps.DecontamBenchCut); the writer filters
    * it so lifecycle batches can feed the raw mixed table, and the
    * serving side filters train with the same value, so a one-sided
    * retune cannot make docs both registry members and cut targets. */
  private def BenchCut: Long = graft.functions.DedupOps.DecontamBenchCut

  /** foreachBatch hook: the batch's benchmark docs reduce to their
    * distinct gram hashes — batch-bounded work, keyed by batchId
    * (replay-idempotent: a replayed batch overwrites its own segment
    * with identical content). */
  def writer(path: String)(batch: DataFrame, batchId: Long): Unit =
    graft.functions.DedupOps
      .gramPositions(batch.filter(col("doc_id") < BenchCut), L)
      .select(col("h")).distinct()
      .write.mode("overwrite").parquet(s"$path/ingest=$batchId")

  /** The live registry — gram hashes accumulated batch by batch, with
    * possible cross-segment duplicates (a gram shared by two benchmark
    * batches, or a compaction-race double-read); consumers distinct.
    * Empty frame when nothing is stored yet: an empty registry cuts
    * nothing, so decontamination passes every doc through — the
    * correct cold-start semantic. */
  def registry(spark: SparkSession, path: String): DataFrame =
    IngestSegments.readLive(spark, path) match {
      case None => spark.range(0).select(col("id").as("h"))
      case Some(rows) => rows.select(col("h"))
    }

  def compact(spark: SparkSession, path: String): Unit =
    IngestSegments.compact(spark, path,
      fold = _.dropDuplicates("h").drop("ingest"), Seq.empty)
}
