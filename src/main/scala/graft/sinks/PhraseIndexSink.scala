package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
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

  /** foreachBatch hook: append batch N's partial as segment seq=N.
    * Replay idempotence keys on the COMMIT marker, not bare directory
    * existence: a crashed first attempt can leave a seq dir without
    * `_SUCCESS` (the committer's abort removes only `_temporary`), and
    * treating that as done would silently drop the batch's counts — so
    * an uncommitted leftover is cleared and rewritten, and only a
    * marker-complete segment makes the replay a no-op. */
  def writer(path: String)(batch: DataFrame, batchId: Long): Unit = {
    val seg = s"$path/seq=$batchId"
    val spark = batch.sparkSession
    if (Hfs.exists(spark, s"$seg/_SUCCESS")) return
    Hfs.deleteRecursive(spark, seg)
    partial(batch).write.mode(SaveMode.ErrorIfExists).parquet(seg)
  }

  private val StagingPrefix = "__compact_staging_"

  /** Merge-on-read: one groupBy(phrase) over all segments. `minDf`
    * mirrors q65's published df floor. If a COMPLETE compaction staging
    * exists (compact crashed mid-swap), the fold stands in for every
    * segment with seq ≤ its target — summing the survivors alone would
    * silently undercount, and summing staging + folded survivors would
    * double-count. */
  def read(spark: SparkSession, path: String, minDf: Long = 0L): DataFrame = {
    val segs = Hfs.childDirs(spark, path, "seq=")
    val staged = Hfs.childDirs(spark, path, StagingPrefix)
      .filter(st => Hfs.exists(spark, s"$path/$st/_SUCCESS"))
    val live = staged.headOption match {
      case Some(st) =>
        val target = st.stripPrefix(StagingPrefix).toLong
        st +: segs.filter(_.stripPrefix("seq=").toLong > target)
      case None => segs
    }
    require(live.nonEmpty, s"no index segments under $path")
    readSegments(spark, path, live).filter(col("df") >= minDf)
  }

  private def readSegments(spark: SparkSession, path: String,
      segs: Seq[String]): DataFrame =
    spark.read.parquet(segs.map(sd => s"$path/$sd"): _*)
      .groupBy(col("phrase"))
      .agg(sum(col("df")).as("df"), sum(col("occ")).as("occ"),
        min(col("min_doc")).as("min_doc"), max(col("max_doc")).as("max_doc"),
        sum(col("id_sum")).as("id_sum"))

  /** Fold every segment into ONE — kept at the MAX existing seq, which
    * is what makes compaction replay-safe: Structured Streaming can only
    * re-run the newest (possibly checkpoint-uncommitted) batch id, and
    * that id's dir still exists after the fold, so the replayed write
    * no-ops; every older id is checkpoint-committed and never replayed.
    * Staging + atomic rename (staging name carries the target seq so a
    * crash between delete and rename is adopted on the next compact). */
  def compact(spark: SparkSession, path: String): Unit = {
    val stagingPrefix = StagingPrefix
    // A staging dir WITH _SUCCESS is a complete fold of every segment
    // with seq <= its target — a crash anywhere in the swap is recovered
    // by finishing it for EXACTLY that range: segments appended AFTER the
    // staging was written (the stream resumed before anyone re-ran
    // compact) have seq > target and must survive the recovery, or
    // their checkpoint-committed, never-replayed batches would be lost.
    // A staging without _SUCCESS is a partial write and is discarded.
    Hfs.childDirs(spark, path, stagingPrefix).foreach { st =>
      val full = s"$path/$st"
      val target = st.stripPrefix(stagingPrefix).toLong
      if (Hfs.exists(spark, s"$full/_SUCCESS")) {
        Hfs.childDirs(spark, path, "seq=")
          .filter(_.stripPrefix("seq=").toLong <= target)
          .foreach(sd => Hfs.deleteRecursive(spark, s"$path/$sd"))
        Hfs.rename(spark, full, s"$path/seq=$target")
      } else Hfs.deleteRecursive(spark, full)
    }
    val segs = Hfs.childDirs(spark, path, "seq=")
    if (segs.size <= 1) return
    val maxSeq = segs.map(_.stripPrefix("seq=").toLong).max
    val staging = s"$path/$stagingPrefix$maxSeq"
    // fold EXACTLY the snapshotted segment list — a batch landing after
    // the listing keeps its own segment and is not in the fold, so it is
    // neither lost nor double-counted
    val merged = readSegments(spark, path, segs).localCheckpoint(true)
    merged.write.mode(SaveMode.ErrorIfExists).parquet(staging)
    segs.foreach(sd => Hfs.deleteRecursive(spark, s"$path/$sd"))
    Hfs.rename(spark, staging, s"$path/seq=$maxSeq")
  }
}
