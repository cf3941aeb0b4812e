package graft.sinks

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  * untouched. The fold id is strictly below every existing id (so it
  * can never collide with a live directory nor be overwritten by a
  * future batch), and the fold dir carries a `_FOLD` marker so a bulk
  * bootstrap can be refused the id ([[guardBuild]]).
  *
  * Crash safety is RENAME-BEFORE-DELETE: the fold is written to a
  * staging dir, renamed LIVE, and only then are the folded segments
  * deleted. Nothing is ever deleted before its content is serving, so
  * a staging dir is always redundant derived data — a crashed compact
  * is recovered by discarding any staging and refolding. The price is
  * that a reader racing the delete phase can see a row in both the
  * fold and a not-yet-deleted source segment; every consumer of these
  * tables is duplicate-tolerant by construction (probes `distinct`
  * hashes, candidate pairs dedup on (new, dup_of) and cap with
  * dense_rank, doc/vector scoring resolves latest-version-per-key —
  * and the fold id sits BELOW every surviving segment id, so recency
  * still resolves to the same row). This is exactly where the protocol
  * differs from [[AdditiveSegments]]: additive counts CANNOT tolerate
  * duplicates (double-counting), so that lifecycle must delete before
  * rename and carry the staging-stand-in read rule; these row stores
  * can, and buy a simpler recovery for it.
  *
  * The fold itself is a caller-supplied per-table function (dedup
  * exact rows for band tables; latest-version-per-key for doc/vector
  * tables — the fold input carries the `ingest` column so recency can
  * be resolved inside the fold).
  */
object IngestSegments {

  private val StagingPrefix = "__compact_staging_"
  private val FoldMarker = "_FOLD"

  /** Live ingest ids of a table (staging dirs are never part of the
    * readable state — see the object doc). */
  def liveSegments(spark: SparkSession, tablePath: String): Seq[Long] =
    Hfs.childDirs(spark, tablePath, "ingest=")
      .map(_.stripPrefix("ingest=").toLong)

  /** The live row set with a LONG `ingest` column on every row. None
    * when the table has no readable rows yet (absent, or only
    * footerless empty segments). A segment dir deleted between the
    * listing and the read (a compact's delete phase racing this
    * reader) surfaces as PATH_NOT_FOUND — retried with a fresh listing
    * rather than misread as an empty index, which would admit every
    * duplicate in the racing batch. Residual window: the retry covers
    * the eager planning step only — a delete landing between planning
    * and the consuming ACTION fails that job with FileNotFoundException,
    * which a streaming batch retry re-plans and survives (transient,
    * never silent). Do NOT enable spark.sql.files.ignoreMissingFiles on
    * index paths: it would turn that failure into silently-missing
    * index rows. */
  def readLive(spark: SparkSession, tablePath: String): Option[DataFrame] =
    readLiveWithIds(spark, tablePath).map(_._1)

  /** readLive plus the EXACT segment-id listing the returned frame was
    * planned over — for callers whose downstream logic branches on the
    * segment count (e.g. PqOps skips its latest-wins window on a
    * single-segment index): a second listing could disagree with the
    * frame under a concurrent ingest/compact (TOCTOU), this cannot. */
  def readLiveWithIds(spark: SparkSession,
      tablePath: String): Option[(DataFrame, Seq[Long])] = {
    var lastRace: org.apache.spark.sql.AnalysisException = null
    for (_ <- 0 until 3) {
      val ids = liveSegments(spark, tablePath)
      if (ids.isEmpty) return None
      try {
        return Some((spark.read.option("basePath", tablePath)
          .parquet(ids.map(id => s"$tablePath/ingest=$id"): _*)
          .withColumn("ingest", col("ingest").cast("long")), ids))
      } catch {
        case e: org.apache.spark.sql.AnalysisException
            if e.getCondition == "UNABLE_TO_INFER_SCHEMA" =>
          return None // real segments, all footerless-empty
        case e: org.apache.spark.sql.AnalysisException
            if e.getCondition == "PATH_NOT_FOUND" =>
          lastRace = e // concurrent compact delete — re-list and retry
      }
    }
    throw lastRace
  }

  /** Align write tasks with the directory layout before a partitionBy
    * write: without it every write task can open a file in EVERY value
    * dir it sees rows for — tasks × dirs files per segment, the
    * small-files debt every later probe's file listing pays
    * ([[readLivePrunedWithIds]] bounds WHICH dirs are listed; this
    * bounds how many files each dir holds). One hash shuffle on the
    * layout key caps the segment at one file per dir. A pathological
    * hot value serializes into one write task — acceptable for these
    * hash/sign layouts whose values are engineered near-uniform; a
    * general-purpose writer would split with a REBALANCE-style
    * partitioning instead. */
  def alignToLayout(df: DataFrame, cols: String*): DataFrame =
    df.repartition(cols.map(col): _*)

  /** [[readLiveWithIds]] restricted to the partition directories the
    * caller will actually read: lists each live segment's child dirs
    * once (one listStatus per segment), keeps those `keepDir` accepts
    * (names like `bucket=37`), and plans the scan over ONLY those leaf
    * dirs — basePath-rooted, so the partition columns survive. Listing
    * cost then scales with segments + kept dirs, not total dirs: a
    * probe of 37 of 4096 buckets must not pay a 4096-dir file listing
    * per segment, which is exactly what handing Spark the segment
    * roots does. Returns the FULL live id listing (not just segments
    * that contributed dirs) so recency-window branching stays correct
    * when a key's versions straddle segments. None when the table is
    * absent, empty, or no segment has a kept dir — callers that probe
    * treat all three as "nothing indexed under these buckets". Same
    * delete-race retry contract as [[readLiveWithIds]] — but the race
    * needs its OWN detector here: a folded segment deleted between the
    * id listing and its childDirs lists EMPTY (childDirs of a missing
    * path returns empty, not an error), so unlike the root-planned
    * read there is no PATH_NOT_FOUND to catch, and planning over the
    * survivors would silently drop the folded rows — the
    * admit-every-duplicate failure the retry contract exists to
    * prevent. Detector: [[compact]] renames its fold LIVE before any
    * delete starts, so whenever a delete could have corrupted the
    * per-segment listings, a SECOND id listing taken after them must
    * contain the fold — an id absent from the first. Any new id →
    * stale listing → re-list. (A fold already present in the first
    * listing makes corrupted folded-segment listings harmless: their
    * rows are serving from the fold, and consumers are
    * duplicate-tolerant by the object contract.) */
  def readLivePrunedWithIds(spark: SparkSession, tablePath: String,
      keepDir: String => Boolean): Option[(DataFrame, Seq[Long])] = {
    var lastRace: Exception = null
    for (_ <- 0 until 3) {
      val ids = liveSegments(spark, tablePath)
      if (ids.isEmpty) return None
      compactRaceHookForTests()
      val dirs = ids.flatMap(id =>
        Hfs.childDirs(spark, s"$tablePath/ingest=$id", "")
          .filter(keepDir).map(d => s"$tablePath/ingest=$id/$d"))
      val recheck = liveSegments(spark, tablePath)
      if (!recheck.toSet.subsetOf(ids.toSet)) {
        lastRace = new IllegalStateException(
          s"segment listing of $tablePath kept going stale under " +
            s"concurrent compaction (last: ${ids.sorted.mkString(",")} -> " +
            s"${recheck.sorted.mkString(",")})")
      } else if (dirs.isEmpty) return None
      else try {
        return Some((spark.read.option("basePath", tablePath)
          .parquet(dirs: _*)
          .withColumn("ingest", col("ingest").cast("long")), ids))
      } catch {
        case e: org.apache.spark.sql.AnalysisException
            if e.getCondition == "UNABLE_TO_INFER_SCHEMA" =>
          return None // kept dirs exist but are all footerless-empty
        case e: org.apache.spark.sql.AnalysisException
            if e.getCondition == "PATH_NOT_FOUND" =>
          lastRace = e // concurrent compact delete — re-list and retry
      }
    }
    throw lastRace
  }

  /** Test seam for the compaction race above: invoked between the id
    * listing and the per-segment child listings, where a concurrent
    * [[compact]] is otherwise impossible to interleave
    * deterministically. Production no-op. */
  private[graft] var compactRaceHookForTests: () => Unit = () => ()

  /** TOMBSTONE convention — retraction support for the row stores
    * (the reference's CDC `D` route, `app/OdsBaseDbApp.scala:102-106`,
    * applied to the persistent indexes: a doc deleted upstream must
    * leave the stores, or every stored-road report silently counts
    * ghost docs forever).
    *
    * A retractable table carries per row a LOGICAL ingest column
    * (`ing` = the writing batch's id, persisted as DATA) and writes
    * retractions as TOMBSTONE rows in the SAME segment id space, each
    * marked by a table-chosen indicator (a sentinel the schema can
    * never produce, or an explicit boolean). Latest-wins per key: a
    * row is live iff no tombstone for its key has `ing` ≥ the row's —
    * so a later re-ingest (CDC insert-after-delete) resurrects the
    * key. `ing` MUST be a data column, not the directory id: a
    * compaction fold keeps rows under a directory id below every live
    * segment, and comparing by directory id would let any live
    * tombstone kill every folded row — including ones that survived
    * that very tombstone inside the fold.
    *
    * Folds apply the resolution to DROP dead rows but KEEP the
    * tombstones themselves (deduped to the newest per key, `ing`
    * preserved): re-applying a kept tombstone is idempotent by the
    * `ing` comparison, which is what keeps the rename-before-delete
    * crash window safe — a reader racing a compact's delete phase sees
    * fold + leftover source segments, and both resolve every row to
    * the SAME verdict (duplicate tolerance extends to tombstones).
    * Dropping an absorbed tombstone instead would transiently
    * RESURRECT the retracted rows still readable in a not-yet-deleted
    * source segment — wrong rows, not tolerable duplicates. Tombstones
    * are retracted-key-sized and parquet-RLE-friendly; they retire
    * with the store rebuild.
    *
    * The resolve plans the store scan twice (tombstone aggregate +
    * live rows) — the tombstone side prunes to nothing on row-group
    * stats when no retraction ever happened — and BROADCASTS the
    * per-key tombstone aggregate (retracted-key-sized; Catalyst's
    * file-size estimate would otherwise refuse). A retraction wave
    * past the broadcast budget is a rebuild-the-store event, not a
    * serving regime: the hint then fails LOUDLY at the driver, never
    * silently degrades. */
  def resolveTombstones(rows: DataFrame, keyCol: String, ingCol: String,
      isTomb: Column): DataFrame =
    applyTombstones(rows.filter(!isTomb),
      rows.filter(isTomb).select(col(keyCol), col(ingCol)), keyCol, ingCol)

  /** [[resolveTombstones]] for stores whose tombstones live in a
    * SEPARATE tiny side table instead of the store's own rows — the
    * partition-pruned corpora (bucket/cell ANN layouts): a tombstone
    * cannot know which partition dir its victim's row lives in, so an
    * in-store tombstone under one bucket would be invisible to a probe
    * pruned to other buckets and a deleted vector would keep serving.
    * The side table is retracted-key-sized, unpartitioned, read whole
    * by every probe. `tombs` rows are (keyCol, ingCol); same
    * latest-wins semantics and broadcast bound as the in-store form. */
  def applyTombstones(rows: DataFrame, tombs: DataFrame, keyCol: String,
      ingCol: String): DataFrame = {
    val t = tombs.groupBy(col(keyCol)).agg(max(col(ingCol)).as("__tomb_ing"))
    rows.join(broadcast(t), Seq(keyCol), "left")
      .filter(col("__tomb_ing").isNull || col(ingCol) > col("__tomb_ing"))
      .drop("__tomb_ing")
  }

  /** The tombstone-keeping compaction fold shared by the single-key
    * retractable row stores (substring positions, benchmark registry —
    * LabelSink's two-endpoint edge fold stays bespoke): resolve the
    * fold input latest-wins, project the live schema, dedup
    * crash-window copies, and union the tombstones back (newest per
    * key, `ing` preserved) via the caller's schema-shaping `mkTomb`.
    * One definition so a future change to the keep-tombstones
    * crash-window rule cannot drift between stores. */
  def foldWithTombstones(src: DataFrame, keyCol: String, ingCol: String,
      isTomb: Column, liveCols: Seq[String], dedupCols: Seq[String],
      mkTomb: DataFrame => DataFrame): DataFrame = {
    val live = resolveTombstones(src, keyCol, ingCol, isTomb)
      .select(liveCols.map(col): _*)
      .dropDuplicates(dedupCols)
    val tombs = src.filter(isTomb)
      .groupBy(col(keyCol)).agg(max(col(ingCol)).as(ingCol))
    live.unionByName(mkTomb(tombs))
  }

  /** Side-table tombstone segment writer: the batch's retracted keys
    * as (keyCol, ing = batchId) rows at `tablePath/ingest=batchId` —
    * overwrite-by-own-id, content independent of store state, so
    * replay idempotence is trivial. */
  def writeTombstones(batch: DataFrame, tablePath: String, keyCol: String,
      batchId: Long): Unit =
    batch.select(col(keyCol)).distinct()
      .withColumn("ing", lit(batchId))
      .write.mode("overwrite").parquet(s"$tablePath/ingest=$batchId")

  /** The live tombstone side table — (keyCol, ing) rows, possibly
    * duplicated across segments ([[applyTombstones]]' max makes that
    * harmless). Empty when no retraction ever happened. */
  def readTombstones(spark: SparkSession, tablePath: String,
      keyCol: String): DataFrame =
    readLive(spark, tablePath) match {
      case None =>
        spark.range(0).select(col("id").as(keyCol), col("id").as("ing"))
      case Some(rows) => rows.select(col(keyCol), col("ing"))
    }

  /** Fold the tombstone side table to the newest tombstone per key. */
  def compactTombstones(spark: SparkSession, tablePath: String,
      keyCol: String): Unit =
    compact(spark, tablePath,
      fold = _.groupBy(col(keyCol)).agg(max(col("ing")).as("ing")),
      partitionCols = Seq.empty)

  /** The bmod bucket count is LAYOUT GEOMETRY, not a free parameter: a
    * probe computing bucket ids with a different modulus than the one
    * the directories were written with silently misses indexed rows
    * (re-admitting duplicates), and new segments would mix two layouts
    * in one table. Writers call this — it pins the count beside the
    * table on first use and returns the pinned value ever after, so
    * retuning the module default against an existing index changes
    * nothing until a rebuild. */
  def ensureBuckets(spark: SparkSession, tablePath: String, default: Int): Int =
    Hfs.readString(spark, s"$tablePath/__buckets") match {
      case Some(s) => s.trim.toInt
      case None =>
        Hfs.writeString(spark, s"$tablePath/__buckets", default.toString)
        default
    }

  /** Probe-side twin of [[ensureBuckets]]: read-only (a probe against a
    * missing index must not create metadata), defaulting for layouts
    * that predate the pin. */
  def readBuckets(spark: SparkSession, tablePath: String, default: Int): Int =
    Hfs.readString(spark, s"$tablePath/__buckets")
      .map(_.trim.toInt).getOrElse(default)

  /** Refuse a bulk-bootstrap ingest id that is non-negative (streaming
    * batch space — batch N's overwrite would clobber the bootstrap) or
    * already taken by a compaction fold (the overwrite would silently
    * destroy the folded index). Re-running a bootstrap on its OWN id
    * stays legal — that is the replay contract. */
  def guardBuild(spark: SparkSession, tablePath: String, ingestId: Long): Unit = {
    require(ingestId < 0,
      s"bulk-build ingest ids are negative (batch ids are >= 0), got $ingestId")
    require(!Hfs.exists(spark, s"$tablePath/ingest=$ingestId/$FoldMarker"),
      s"ingest=$ingestId of $tablePath is a compaction fold — writing over it " +
        "would destroy the folded index; pick a fresh negative id")
  }

  /** Fold old segments of one table (see the object doc for the
    * protocol). `fold` receives the folded segments' rows WITH the long
    * `ingest` column and returns the rows to keep; `partitionCols`
    * preserves the table's directory layout (e.g. bmod bucketing). */
  def compact(spark: SparkSession, tablePath: String,
      fold: DataFrame => DataFrame, partitionCols: Seq[String]): Unit = {
    // any staging — complete or not — is derived data from segments
    // that were never deleted; discard and refold
    Hfs.childDirs(spark, tablePath, StagingPrefix)
      .foreach(st => Hfs.deleteRecursive(spark, s"$tablePath/$st"))
    val ids = liveSegments(spark, tablePath)
    val maxBatch = ids.filter(_ >= 0).sorted.lastOption
    val folded = ids.filterNot(maxBatch.contains)
    if (folded.size <= 1) return
    val foldId = math.min(ids.min, -1L) - 1 // strictly below every live id
    val src =
      try spark.read.option("basePath", tablePath)
        .parquet(folded.map(id => s"$tablePath/ingest=$id"): _*)
        .withColumn("ingest", col("ingest").cast("long"))
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if e.getCondition == "UNABLE_TO_INFER_SCHEMA" => return
      }
    val staging = s"$tablePath/$StagingPrefix$foldId"
    // the fold rewrites the bulk of the table — align it with the
    // layout too, or the fold segment re-accrues tasks x dirs files
    val folded0 = fold(src)
    val w = (if (partitionCols.nonEmpty) alignToLayout(folded0, partitionCols: _*)
             else folded0).write.mode("errorifexists")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(staging)
    Hfs.writeString(spark, s"$staging/$FoldMarker", "")
    Hfs.rename(spark, staging, s"$tablePath/ingest=$foldId") // fold is LIVE
    // ASCENDING delete order is load-bearing: a crash mid-delete must
    // leave the NEWEST ids as the survivors, or a stale older version
    // of a key could outrank the fold's latest-version row in the
    // ingest-desc recency windows (and the next refold would bake the
    // stale row in). Filesystem listing order is unspecified — sort.
    folded.sorted.foreach(id =>
      Hfs.deleteRecursive(spark, s"$tablePath/ingest=$id"))
  }
}
