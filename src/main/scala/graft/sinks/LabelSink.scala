package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Live dedup-cluster labels — the streaming twin of q115's
  * incremental clustering, for a pipeline whose near-dup EDGES arrive
  * per micro-batch (the index probes produce exactly these:
  * `DedupOps.probeLshIndex` new↔indexed pairs plus the in-batch pair
  * pass). State is a VERSION CHAIN, not additive segments: batch N's
  * table is written as `seq=N`, computed by one
  * `DedupOps.contractionStep` from the latest committed version BELOW
  * N — so labels are a deterministic function of (predecessor, batch
  * edges) and an at-least-once foreachBatch retry recomputes the
  * identical table and overwrites its own `seq=N` (the same replay
  * contract every index family keeps, realized through determinism
  * instead of segment overwrite). Crash mid-write leaves a torn dir
  * without `_SUCCESS`, which [[committedSeqs]] never reads — the
  * replay heals it. Reading the chain head needs no merge: unlike the
  * additive sinks there is nothing to reconcile, the head IS the
  * state.
  *
  * Why not fold labels additively: label maintenance is
  * history-DEPENDENT (a later batch can relabel earlier rows), which
  * is exactly what [[AdditiveSegments]]' decomposable-sum contract
  * excludes; the version chain keeps idempotence by making each
  * version a pure function of its predecessor.
  *
  * Scale note: each version rewrites the label table once
  * (dup-doc-sized, far below corpus-sized) plus a hash-min loop over
  * the CONTRACTED batch graph only — the q115 cost shape, measured in
  * ScaleProbe's incremental_cc row. [[compact]] bounds disk to the
  * chain head plus the replayable tail. */
object LabelSink {

  private[graft] def committedSeqs(spark: SparkSession, path: String): Seq[Long] =
    Hfs.childDirs(spark, path, "seq=")
      .map(_.stripPrefix("seq=").toLong)
      .filter(id => Hfs.exists(spark, s"$path/seq=$id/_SUCCESS"))
      .sorted

  /** The current label table — the newest committed version; empty
    * before the first commit. */
  def read(spark: SparkSession, path: String): DataFrame =
    committedSeqs(spark, path).lastOption
      .map(id => spark.read.parquet(s"$path/seq=$id"))
      .getOrElse(graft.functions.DedupOps.emptyLabels(spark))

  /** foreachBatch hook: advance the chain by this batch's edge frame
    * `(doc_a, doc_b)`. Reads the latest committed version STRICTLY
    * below batchId (a retry must see the same predecessor its first
    * attempt saw, never its own torn or committed output), applies one
    * contraction step, writes `seq=batchId` in overwrite mode. */
  def writer(path: String)(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val prev = committedSeqs(spark, path).filter(_ < batchId).lastOption
      .map(id => spark.read.parquet(s"$path/seq=$id"))
      .getOrElse(graft.functions.DedupOps.emptyLabels(spark))
    val (plan, release) = graft.functions.DedupOps.contractionStep(prev, batch)
    try plan.write.mode("overwrite").parquet(s"$path/seq=$batchId")
    finally release()
  }

  /** Drop every committed version except the last TWO. The head alone
    * is not enough: if the HEAD batch's checkpoint commit hadn't
    * landed when we compacted, Structured Streaming replays it — and
    * the replay recomputes the head FROM ITS PREDECESSOR, which must
    * therefore still exist (the version-chain analog of
    * IngestSegments' keep-the-newest-batch-segment rule). Batches
    * older than the head can never come back, so their versions are
    * dead weight. Ascending deletes: a crash mid-compact leaves the
    * newest versions standing. Torn (never committed) dirs are left
    * for their replay to overwrite. */
  def compact(spark: SparkSession, path: String): Unit = {
    val ids = committedSeqs(spark, path)
    ids.dropRight(2).sorted.foreach(id =>
      Hfs.deleteRecursive(spark, s"$path/seq=$id"))
  }
}
