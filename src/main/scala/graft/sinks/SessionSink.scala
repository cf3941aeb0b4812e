package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained finalized-session store — the landing
  * store of [[graft.streaming.Streams.sessionAgg]] and the state
  * behind the q149 live session stats. USER-RETRACTABLE since r17:
  * the GDPR-shaped request (the reference routes user_info as a dim
  * whose CDC `D` op deletes the user, `app/OdsBaseDbApp.scala:121-139`)
  * must remove every session of a user from the served stats.
  *
  * An [[IngestSegments]] row store (user_id, start_us, n_events,
  * dur_us, converted, tomb, ing) — the BenchRegistrySink shape: set
  * semantics (rows uniquely keyed by (user_id, start_us); the
  * streaming session operator emits each session exactly once on
  * finalization with a deterministic payload, so replay/crash-window
  * duplicates collapse under distinct), explicit `tomb` flag (every
  * payload column is a legitimate value, no sentinel exists), resolve
  * latest-wins per USER: a tombstone kills every session row of the
  * user with ing ≤ it; re-ingested sessions (higher ing — the user
  * signed up again, or a backfill restored them) serve again.
  *
  * No additive sub-store and no negative partials: the read derives
  * the summary from the resolved row set, so deletion needs only the
  * tombstone — the same only-rows-can-serve-deletion argument as the
  * phrase ledger, with the store already row-shaped. */
object SessionSink {

  private[graft] def partial(sessions: DataFrame): DataFrame =
    sessions.select(col("user_id"), col("start_us"), col("n_events"),
      col("dur_us"), col("converted")).distinct()

  /** foreachBatch hook: append batch N's sessions as ingest=N
    * (overwrite-by-own-id — a replayed batch rewrites identical
    * content; the TransitionSink determinism contract). */
  def writer(path: String)(batch: DataFrame, batchId: Long): Unit =
    partial(batch)
      .withColumn("tomb", lit(false)).withColumn("ing", lit(batchId))
      .write.mode("overwrite").parquet(s"$path/ingest=$batchId")

  /** User retraction hook: `batch` carries the deleted user_ids; one
    * tombstone row per user. */
  def retract(path: String)(batch: DataFrame, batchId: Long): Unit =
    batch.select(col("user_id")).distinct()
      .select(col("user_id"), lit(0L).as("start_us"),
        lit(0L).as("n_events"), lit(0L).as("dur_us"),
        lit(0L).as("converted"), lit(true).as("tomb"),
        lit(batchId).as("ing"))
      .write.mode("overwrite").parquet(s"$path/ingest=$batchId")

  /** Merge-on-read: the LIVE distinct session set. */
  def read(spark: SparkSession, path: String): DataFrame =
    IngestSegments.readLive(spark, path) match {
      case None =>
        throw new IllegalArgumentException(s"no index segments under $path")
      case Some(raw) =>
        IngestSegments.resolveTombstones(raw, "user_id", "ing", col("tomb"),
            IngestSegments.TombStat.NeverTrue("tomb"))
          .select(col("user_id"), col("start_us"), col("n_events"),
            col("dur_us"), col("converted"))
          .distinct()
    }

  /** Fold: dead sessions drop, tombstones are KEPT (newest per user) —
    * the [[IngestSegments]] crash-window argument. */
  def compact(spark: SparkSession, path: String): Unit =
    IngestSegments.compact(spark, path,
      fold = IngestSegments.foldWithTombstones(_, "user_id", "ing",
        col("tomb"),
        liveCols = Seq("user_id", "start_us", "n_events", "dur_us",
          "converted", "tomb", "ing"),
        dedupCols = Seq("user_id", "start_us"),
        mkTomb = _.select(col("user_id"), lit(0L).as("start_us"),
          lit(0L).as("n_events"), lit(0L).as("dur_us"),
          lit(0L).as("converted"), lit(true).as("tomb"), col("ing"))),
      Seq.empty)
}
