package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** The segment lifecycle shared by every ADDITIVE merge-on-read store
  * (phrase index, vocabulary): per-batch partial aggregates land in
  * `path/seq=N` dirs, the read side reconciles them with one groupBy,
  * and compaction folds segments with a crash-recoverable staging
  * swap. Parameterized by the store's `reconcile` (the groupBy+agg
  * that merges partials — every aggregate in it must be decomposable)
  * so the replay/recovery reasoning is written once.
  *
  * Replay idempotence keys on the COMMIT marker, not bare directory
  * existence: a crashed first attempt can leave a seq dir without
  * `_SUCCESS` (the committer's abort removes only `_temporary`), and
  * treating that as done would silently drop the batch's counts — so
  * an uncommitted leftover is cleared and rewritten, and only a
  * marker-complete segment makes the replay a no-op.
  */
private[sinks] object AdditiveSegments {

  private val StagingPrefix = "__compact_staging_"

  /** foreachBatch hook body: append the batch's partial as seq=batchId. */
  def write(partial: DataFrame, path: String, batchId: Long): Unit = {
    val seg = s"$path/seq=$batchId"
    val spark = partial.sparkSession
    if (Hfs.exists(spark, s"$seg/_SUCCESS")) return
    Hfs.deleteRecursive(spark, seg)
    partial.write.mode(SaveMode.ErrorIfExists).parquet(seg)
  }

  /** Merge-on-read over the LIVE segment set. If a COMPLETE compaction
    * staging exists (compact crashed mid-swap), the fold stands in for
    * every segment with seq ≤ its target — summing the survivors alone
    * would silently undercount, and summing staging + folded survivors
    * would double-count. */
  def read(spark: SparkSession, path: String,
      reconcile: DataFrame => DataFrame): DataFrame = {
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
    readSegments(spark, path, live, reconcile)
  }

  private def readSegments(spark: SparkSession, path: String,
      segs: Seq[String], reconcile: DataFrame => DataFrame): DataFrame =
    reconcile(spark.read.parquet(segs.map(sd => s"$path/$sd"): _*))

  /** Fold every segment into ONE — kept at the MAX existing seq, which
    * is what makes compaction replay-safe: Structured Streaming can only
    * re-run the newest (possibly checkpoint-uncommitted) batch id, and
    * that id's dir still exists after the fold, so the replayed write
    * no-ops; every older id is checkpoint-committed and never replayed.
    * Staging + atomic rename (staging name carries the target seq so a
    * crash between delete and rename is adopted on the next compact). */
  def compact(spark: SparkSession, path: String,
      reconcile: DataFrame => DataFrame): Unit = {
    // A staging dir WITH _SUCCESS is a complete fold of every segment
    // with seq <= its target — a crash anywhere in the swap is recovered
    // by finishing it for EXACTLY that range: segments appended AFTER the
    // staging was written (the stream resumed before anyone re-ran
    // compact) have seq > target and must survive the recovery, or
    // their checkpoint-committed, never-replayed batches would be lost.
    // A staging without _SUCCESS is a partial write and is discarded.
    Hfs.childDirs(spark, path, StagingPrefix).foreach { st =>
      val full = s"$path/$st"
      val target = st.stripPrefix(StagingPrefix).toLong
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
    val staging = s"$path/$StagingPrefix$maxSeq"
    // fold EXACTLY the snapshotted segment list — a batch landing after
    // the listing keeps its own segment and is not in the fold, so it is
    // neither lost nor double-counted
    val merged = readSegments(spark, path, segs, reconcile).localCheckpoint(true)
    merged.write.mode(SaveMode.ErrorIfExists).parquet(staging)
    segs.foreach(sd => Hfs.deleteRecursive(spark, s"$path/$sd"))
    Hfs.rename(spark, staging, s"$path/seq=$maxSeq")
  }
}
