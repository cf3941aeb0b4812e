package graft

import org.apache.spark.sql.functions._

/** User-level retraction for the behavioral stores (r17): a user_info
  * CDC delete (the GDPR-shaped request — reference
  * `app/OdsBaseDbApp.scala:121-139` routes user_info as a dim whose
  * `D` op deletes the row) must remove the user from the served
  * retention matrix and session stats, survive folds, and resurrect
  * on re-ingest. */
class UserRetractSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("retention: a deleted user leaves the activity set; re-signup re-cohorts from the live set; folds carry tombstones") {
    val dir = java.nio.file.Files.createTempDirectory("graft-retret").toString
    val w = sinks.RetentionSink.writer(dir) _
    val r = sinks.RetentionSink.retract(dir) _
    def activity() = sinks.RetentionSink.read(spark, dir)
      .select(col("user_id"), col("day").cast("string"))
      .as[(Long, String)].collect().toSet
    def ev(rows: (Long, Long, String)*) = rows
      .map { case (e, u, t) => (e, u, ts(t)) }
      .toDF("event_id", "user_id", "ts")
    // user 7's activity straddles batches (legal for set semantics)
    w(ev((1L, 7L, "2024-01-01 10:00:00"), (2L, 8L, "2024-01-01 11:00:00")), 0L)
    w(ev((3L, 7L, "2024-01-02 10:00:00"), (4L, 9L, "2024-01-02 12:00:00")), 1L)
    w(ev((5L, 8L, "2024-01-03 10:00:00")), 2L)
    sinks.RetentionSink.compact(spark, dir) // folds 0+1, 2 = tail
    assert(activity() == Set((7L, "2024-01-01"), (7L, "2024-01-02"),
      (8L, "2024-01-01"), (8L, "2024-01-03"), (9L, "2024-01-02")))
    // GDPR delete of user 7 (+ a never-seen user 99: no-op): every
    // (7, day) pair dies, whether it lives in the fold or the tail
    r(Seq(7L, 99L).toDF("user_id"), 3L)
    assert(activity() == Set((8L, "2024-01-01"), (8L, "2024-01-03"),
      (9L, "2024-01-02")))
    // the cohort matrix re-derives without the user
    val m = operators.Analytics.cohortMatrixOf(
        sinks.RetentionSink.read(spark, dir))
      .as[(String, Int, Long)].collect().toSet
    assert(m == Set(("2024-01-01", 0, 1L), ("2024-01-01", 2, 1L),
      ("2024-01-02", 0, 1L)))
    // re-signup: user 7 is active again on a LATER day only — they
    // must re-cohort at the new first-seen day, not the deleted one
    w(ev((6L, 7L, "2024-01-03 09:00:00")), 4L)
    assert(activity().contains((7L, "2024-01-03")) &&
      !activity().contains((7L, "2024-01-01")),
      "old history stays deleted; the new account starts fresh")
    // fold with the tombstone crossing the boundary, re-kill in tail
    sinks.RetentionSink.compact(spark, dir)
    assert(activity().contains((7L, "2024-01-03")))
    r(Seq(7L).toDF("user_id"), 5L)
    assert(!activity().exists(_._1 == 7L),
      "a post-fold re-retraction must kill the resurrected activity")
  }

  test("sessions: a deleted user's sessions leave the summary exactly; replay is idempotent") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sessret").toString
    val w = sinks.SessionSink.writer(dir) _
    val r = sinks.SessionSink.retract(dir) _
    def sess(rows: (Long, Long, Long, Long, Long)*) = rows
      .toDF("user_id", "start_us", "n_events", "dur_us", "converted")
    def summary() = operators.Analytics.sessionSummaryOf(
        sinks.SessionSink.read(spark, dir))
      .select("n_sessions", "n_converted").as[(Long, Long)].collect().head
    w(sess((7L, 1000L, 3L, 60L, 1L), (8L, 2000L, 2L, 30L, 0L)), 0L)
    w(sess((7L, 9000L, 1L, 0L, 0L)), 1L)
    w(sess((7L, 9000L, 1L, 0L, 0L)), 1L) // replay: identical content
    assert(summary() == ((3L, 1L)))
    r(Seq(7L).toDF("user_id"), 2L)
    assert(summary() == ((1L, 0L)),
      "every session of the deleted user must leave the summary")
    // resurrection restores the full re-ingested set; fold keeps it
    w(sess((7L, 1000L, 3L, 60L, 1L), (7L, 9000L, 1L, 0L, 0L)), 3L)
    assert(summary() == ((3L, 1L)))
    sinks.SessionSink.compact(spark, dir)
    assert(summary() == ((3L, 1L)))
  }
}
