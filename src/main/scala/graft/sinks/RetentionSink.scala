package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained user-activity set — the streaming twin of
  * the q118 cohort matrix. USER-RETRACTABLE since r17 (the GDPR-shaped
  * user_info CDC delete, reference `app/OdsBaseDbApp.scala:121-139`):
  * a deleted user's (user, day) activity must leave the cohort matrix,
  * which an AdditiveSegments set store could never serve.
  *
  * An [[IngestSegments]] row store (user_id, day, tomb, ing). The
  * reconciling semantics stay SET UNION over the RESOLVED rows — a
  * (user, day) pair may arrive in ANY number of batches (a user's
  * events straddle batch boundaries; at-least-once delivery duplicates
  * whole events) and duplicates collapse on read. Retraction is
  * latest-wins per USER: a tombstone kills every activity row of the
  * user with ing ≤ it; activity re-ingested later (higher ing — the
  * user re-signed-up) re-accumulates from scratch, which also
  * re-cohorts them at read time (first-seen day derives from the LIVE
  * set — exactly the GDPR semantics: the old history is gone, the new
  * account is a new cohort member).
  *
  * The cohort matrix itself stays derive-at-read (see the pre-r17
  * note, unchanged): a later batch can reveal an earlier first-seen
  * day, so the stored state is the activity set, never the matrix. */
object RetentionSink {

  private[graft] def partial(batch: DataFrame): DataFrame =
    // a timestampless event is no evidence of activity (the q118
    // batch side applies the same refusal, so stream ≡ batch holds)
    batch.filter(col("ts").isNotNull)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()

  /** foreachBatch hook: append batch N's distinct activity pairs as
    * ingest=N (overwrite-by-own-id, replay-idempotent). */
  def writer(path: String)(batch: DataFrame, batchId: Long): Unit =
    partial(batch)
      .withColumn("tomb", lit(false)).withColumn("ing", lit(batchId))
      .write.mode("overwrite").parquet(s"$path/ingest=$batchId")

  /** User retraction hook: `batch` carries the deleted user_ids. */
  def retract(path: String)(batch: DataFrame, batchId: Long): Unit =
    batch.select(col("user_id")).distinct()
      .select(col("user_id"), lit(null).cast("date").as("day"),
        lit(true).as("tomb"), lit(batchId).as("ing"))
      .write.mode("overwrite").parquet(s"$path/ingest=$batchId")

  /** Merge-on-read: the LIVE distinct (user_id, day) activity set. */
  def read(spark: SparkSession, path: String): DataFrame =
    IngestSegments.readLive(spark, path) match {
      case None =>
        throw new IllegalArgumentException(s"no index segments under $path")
      case Some(raw) =>
        IngestSegments.resolveTombstones(raw, "user_id", "ing", col("tomb"),
            IngestSegments.TombStat.NeverTrue("tomb"))
          .select(col("user_id"), col("day")).distinct()
    }

  /** Fold: dead activity drops, tombstones are KEPT (newest per
    * user) — the [[IngestSegments]] crash-window argument. */
  def compact(spark: SparkSession, path: String): Unit =
    IngestSegments.compact(spark, path,
      fold = IngestSegments.foldWithTombstones(_, "user_id", "ing",
        col("tomb"),
        liveCols = Seq("user_id", "day", "tomb", "ing"),
        dedupCols = Seq("user_id", "day"),
        mkTomb = _.select(col("user_id"), lit(null).cast("date").as("day"),
          lit(true).as("tomb"), col("ing"))),
      Seq.empty)
}
