package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** S8/ST8: the keyed idempotent serving-table sink — the engine-native
  * form of the reference's "ES bulk with explicit doc _id into a per-day
  * index" (util/MyEsUtils.scala:41-56, doc-id choice
  * app/DwdDauApp.scala:167-180, app/DwdOrderApp.scala:244-251).
  *
  * Contract: replaying a batch (at-least-once upstream) leaves the table
  * unchanged; a newer version of a key replaces the older one; rows land
  * in their own dt partition (fixing the reference's head-row index-name
  * defect, SURVEY.md §3.2 step 5).
  *
  * Mechanics: union the incoming batch with the current table, keep the
  * newest row per key (version column, batch rows win ties), and rewrite
  * ONLY the dt partitions the batch touches (dynamic partition
  * overwrite). At 100 TB the rewrite is bounded by the day's partition
  * size, not the table size; a Delta/Iceberg MERGE is the drop-in
  * upgrade.
  */
object KeyedParquetSink {

  /** NOTE on the partition-scoped merge: only dt partitions present in
    * the incoming batch participate, so keys must be STABLE WITHIN dt
    * (include dt in keyCols, as the reference's per-day ES indexes do —
    * its doc _id is also only unique per index). If a key can legitimately
    * move between days, use [[MergeParquetSink]], whose read-side merge
    * resolves keys globally. */
  def upsert(batch: DataFrame, path: String, keyCols: Seq[String],
      dtCol: String, versionCol: String): Unit = {
    val spark = batch.sparkSession
    val cols = batch.columns
    val incoming = batch.withColumn("__is_new", lit(1))

    val existing =
      try {
        val cur = spark.read.parquet(path)
        // only partitions touched by this batch participate in the merge
        val touched = incoming.select(col(dtCol)).distinct()
        Some(cur.join(broadcast(touched), Seq(dtCol), "left_semi")
          .select(cols.toIndexedSeq.map(col): _*).withColumn("__is_new", lit(0)))
      } catch {
        // ONLY path-not-found means first write; any other failure (e.g.
        // corrupt footer) must abort, not silently clobber the table
        case e: org.apache.spark.sql.AnalysisException
            if e.getCondition == "PATH_NOT_FOUND" => None
      }

    val unioned = existing.fold(incoming)(e => incoming.unionByName(e))
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(versionCol).desc, col("__is_new").desc)
    val merged = unioned
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(cols.toIndexedSeq.map(col): _*)
      // localCheckpoint: materialize BEFORE the overwrite starts, or the
      // dynamic overwrite would delete the files it is still reading.
      .localCheckpoint()

    // per-write dynamic overwrite (not session conf: mutating the session
    // would silently change OTHER writers' overwrite semantics)
    merged.write
      .mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(dtCol)
      .parquet(path)
  }

  /** foreachBatch adapter. */
  def writer(path: String, keyCols: Seq[String], dtCol: String,
      versionCol: String)(batch: DataFrame, batchId: Long): Unit =
    if (!batch.isEmpty) upsert(batch, path, keyCols, dtCol, versionCol)

  /** S10: delete-by-query — rows matching `cond` removed; only touched dt
    * partitions are rewritten. Returns rows deleted. */
  def deleteWhere(spark: org.apache.spark.sql.SparkSession, path: String,
      dtCol: String, cond: org.apache.spark.sql.Column): Long = {
    val cur = spark.read.parquet(path)
    val touched = cur.filter(cond).select(col(dtCol)).distinct()
    if (touched.isEmpty) return 0L
    val scoped = cur.join(broadcast(touched), Seq(dtCol), "left_semi")
    // NULL-safe: a predicate evaluating to NULL means "not matched" — the
    // row must be RETAINED (and not counted). Bare filter(!cond) would
    // silently drop NULL-evaluating rows without counting them.
    val hit = coalesce(cond, lit(false))
    val deleted = scoped.filter(hit).count()
    scoped.filter(!hit)
      .select(cur.columns.toIndexedSeq.map(col): _*)
      .localCheckpoint()
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(dtCol).parquet(path)
    deleted
  }

  /** S10: update-by-query over the serving table (the ES painless
    * conditional update, EsTest.scala:178-195, as a relational
    * read-modify-write): rows matching `cond` get `set` applied; only dt
    * partitions containing matches are rewritten. */
  def updateWhere(spark: org.apache.spark.sql.SparkSession, path: String,
      dtCol: String, cond: org.apache.spark.sql.Column,
      set: Map[String, org.apache.spark.sql.Column]): Long = {
    val cur = spark.read.parquet(path)
    val touched = cur.filter(cond).select(col(dtCol)).distinct()
    val nTouched = touched.count()
    if (nTouched == 0) return 0L
    val scoped = cur.join(broadcast(touched), Seq(dtCol), "left_semi")
    val updated = set.foldLeft(scoped) { case (df, (c, v)) =>
      df.withColumn(c, when(cond, v).otherwise(col(c)))
    }
    val matched = scoped.filter(cond).count()
    updated.select(cur.columns.toIndexedSeq.map(col): _*)
      .localCheckpoint()
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(dtCol).parquet(path)
    matched
  }
}
