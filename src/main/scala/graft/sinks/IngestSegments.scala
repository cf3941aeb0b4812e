package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The per-ingest segment lifecycle shared by the three persistent
  * dedup indexes (MinHash-LSH bands/docs, embedding-LSH bands/vecs,
  * chunk-hash index): each ingest — a bulk bootstrap (negative id) or
  * a streaming micro-batch (batchId ≥ 0, overwrite-on-replay) — owns a
  * `tablePath/ingest=N` directory, and compaction folds old segments
  * into one negative-id segment to bound directory/file count after
  * thousands of micro-batches (the small-files problem every per-batch
  * store accrues).
  *
  * Compaction contract: fold every segment EXCEPT the newest
  * non-negative ingest — the only one Structured Streaming can still
  * replay (older batch ids are checkpoint-committed and can never come
  * back), so its overwrite-by-ingest replay contract survives
  * untouched. The fold lands at ingest -(K+2) (K = max folded id):
  * negative, so no future batch overwrites it, and ≤ -2, so the
  * recommended bootstrap id -1 stays free. Crash-safe via the
  * [[AdditiveSegments]] staging discipline: the fold writes to a
  * staging dir first; a staging WITH _SUCCESS is adopted by the next
  * compact (delete every ingest ≤ its K, rename), one WITHOUT is
  * discarded — and [[readLive]] treats a complete staging as standing
  * in for every ingest ≤ K, so a reader racing a crashed swap still
  * sees every indexed row exactly once.
  *
  * Unlike [[AdditiveSegments]] (additive counts, merge-on-read), these
  * tables are row stores: the fold is a caller-supplied per-table
  * function (dedup exact rows for band tables; latest-version-per-key
  * for doc/vector tables — the fold input carries the `ingest` column
  * so recency can be resolved, and cross-segment recency survives the
  * fold because every surviving segment id is > K > -(K+2)).
  */
object IngestSegments {

  private val StagingPrefix = "__compact_staging_"

  private def foldId(k: Long): Long = -(math.max(k, 0L) + 2)

  /** (live ingest ids, completed staging (dirName, K) if present). */
  def liveSegments(spark: SparkSession,
      tablePath: String): (Seq[Long], Option[(String, Long)]) = {
    val ids = Hfs.childDirs(spark, tablePath, "ingest=")
      .map(_.stripPrefix("ingest=").toLong)
    val staged = Hfs.childDirs(spark, tablePath, StagingPrefix)
      .filter(st => Hfs.exists(spark, s"$tablePath/$st/_SUCCESS"))
    staged.headOption match {
      case Some(st) =>
        val k = st.stripPrefix(StagingPrefix).toLong
        (ids.filter(_ > k), Some((st, k)))
      case None => (ids, None)
    }
  }

  /** The live row set with a LONG `ingest` column on every row (the
    * staging's rows get their future fold id). None when the table has
    * no readable rows yet (absent, or only footerless empty segments). */
  def readLive(spark: SparkSession, tablePath: String): Option[DataFrame] = {
    val (liveIds, staging) = liveSegments(spark, tablePath)
    def tryRead(f: => DataFrame): Option[DataFrame] =
      try Some(f) catch {
        case e: org.apache.spark.sql.AnalysisException
            if e.getCondition == "PATH_NOT_FOUND" ||
              e.getCondition == "UNABLE_TO_INFER_SCHEMA" => None
      }
    val segs =
      if (liveIds.isEmpty) None
      else tryRead(spark.read.option("basePath", tablePath)
        .parquet(liveIds.map(id => s"$tablePath/ingest=$id"): _*)
        .withColumn("ingest", col("ingest").cast("long")))
    val st = staging.flatMap { case (dir, k) =>
      tryRead(spark.read.parquet(s"$tablePath/$dir")
        .withColumn("ingest", lit(foldId(k))))
    }
    (segs, st) match {
      case (Some(a), Some(b)) => Some(a.unionByName(b))
      case (a, b) => a.orElse(b)
    }
  }

  /** Fold old segments of one table (see object doc for the contract).
    * `fold` receives the folded segments' rows WITH the long `ingest`
    * column and returns the rows to keep (ingest dropped — the fold
    * directory's id speaks for them); `partitionCols` preserves the
    * table's directory layout (e.g. bmod bucketing). */
  def compact(spark: SparkSession, tablePath: String,
      fold: DataFrame => DataFrame, partitionCols: Seq[String]): Unit = {
    Hfs.childDirs(spark, tablePath, StagingPrefix).foreach { st =>
      val full = s"$tablePath/$st"
      val k = st.stripPrefix(StagingPrefix).toLong
      if (Hfs.exists(spark, s"$full/_SUCCESS")) {
        Hfs.childDirs(spark, tablePath, "ingest=")
          .filter(_.stripPrefix("ingest=").toLong <= k)
          .foreach(sd => Hfs.deleteRecursive(spark, s"$tablePath/$sd"))
        Hfs.rename(spark, full, s"$tablePath/ingest=${foldId(k)}")
      } else Hfs.deleteRecursive(spark, full)
    }
    val ids = Hfs.childDirs(spark, tablePath, "ingest=")
      .map(_.stripPrefix("ingest=").toLong)
    val maxBatch = ids.filter(_ >= 0).sorted.lastOption
    val folded = ids.filterNot(maxBatch.contains)
    // folded.max < 0 (only bootstraps foldable) would put the fold id
    // inside the folded range and the adoption rule would eat it
    if (folded.size <= 1 || folded.max < 0) return
    val k = folded.max
    val src =
      try spark.read.option("basePath", tablePath)
        .parquet(folded.map(id => s"$tablePath/ingest=$id"): _*)
        .withColumn("ingest", col("ingest").cast("long"))
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if e.getCondition == "UNABLE_TO_INFER_SCHEMA" => return
      }
    val staging = s"$tablePath/$StagingPrefix$k"
    val w = fold(src).write.mode("errorifexists")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(staging)
    folded.foreach(id => Hfs.deleteRecursive(spark, s"$tablePath/ingest=$id"))
    Hfs.rename(spark, staging, s"$tablePath/ingest=${foldId(k)}")
  }
}
