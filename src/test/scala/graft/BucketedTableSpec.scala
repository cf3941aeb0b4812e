package graft

import graft.operators.Bucketing
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The live bucketed fact table: delta-segment ingest + horizon-pointer
  * fold. Content preservation, replay idempotence, both crash windows,
  * cold-start fold, and the post-fold co-location claim. */
class BucketedTableSpec extends SparkSpec {
  import spark.implicits._

  private def rows(from: Long, until: Long): DataFrame =
    (from until until).map(i => (i, s"p$i")).toDF("k", "payload")

  private def content(loc: String, base: String): Set[(Long, String)] = {
    val (main, tail) = Bucketing.bucketedSnapshot(spark, loc, base)
    tail.fold(main)(main.unionByName(_))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
  }

  private def expect(from: Long, until: Long): Set[(Long, String)] =
    (from until until).map(i => (i, s"p$i")).toSet

  private def tmpLoc(): String =
    java.nio.file.Files.createTempDirectory("graft-btspec").toString

  test("bootstrap + delta ingest + fold preserves content; replay is idempotent; fold empties the tail") {
    val loc = tmpLoc(); val base = "btspec_a"
    Bucketing.bootstrapBucketed(rows(0, 100), loc, base, "k", 4)
    Bucketing.ingestBucketedDelta(rows(100, 110), loc, 0L)
    Bucketing.ingestBucketedDelta(rows(110, 120), loc, 1L)
    assert(content(loc, base) == expect(0, 120))
    // at-least-once replay of batch 1 replaces its own segment
    Bucketing.ingestBucketedDelta(rows(110, 120), loc, 1L)
    assert(content(loc, base) == expect(0, 120))
    Bucketing.foldBucketedDeltas(spark, loc, base)
    val (main, tail) = Bucketing.bucketedSnapshot(spark, loc, base)
    assert(tail.isEmpty, "fold must empty the delta tail")
    assert(main.collect().map(r => (r.getLong(0), r.getString(1))).toSet ==
      expect(0, 120))
    // a second fold with nothing to do is a no-op (version unchanged)
    val meta1 = graft.sinks.Hfs.readString(spark, s"$loc/__meta").get
    Bucketing.foldBucketedDeltas(spark, loc, base)
    assert(graft.sinks.Hfs.readString(spark, s"$loc/__meta").get == meta1)
    // post-fold co-location: a self-join on the bucket key plans as a
    // SortMergeJoin with no exchange under it
    import org.apache.spark.sql.execution.exchange.Exchange
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    val j = main.hint("merge").as("a")
      .join(main.hint("merge").as("b"), col("a.k") === col("b.k"))
    j.collect()
    val all = walkPlan(j.queryExecution.executedPlan)
    val smj = all.collectFirst { case s: SortMergeJoinExec => s }
    assert(smj.nonEmpty, j.queryExecution.executedPlan.toString)
    assert(!walkPlan(smj.get).exists(_.isInstanceOf[Exchange]),
      s"exchange under post-fold join:\n${smj.get}")
  }

  test("crash windows: pre-flip garbage main and post-flip stale delta are cleaned, never read") {
    val loc = tmpLoc(); val base = "btspec_b"
    Bucketing.bootstrapBucketed(rows(0, 50), loc, base, "k", 4)
    Bucketing.ingestBucketedDelta(rows(50, 60), loc, 0L)
    Bucketing.foldBucketedDeltas(spark, loc, base) // now v1, horizon=0
    // post-flip straggler: a folded segment resurfaces (crash between
    // the meta flip and the delete) — horizon must exclude it
    rows(900, 910).write.parquet(s"$loc/delta/ingest=0")
    assert(content(loc, base) == expect(0, 60))
    // pre-flip garbage: a crashed fold's orphan main version
    rows(950, 960).write.parquet(s"$loc/main_v7")
    assert(content(loc, base) == expect(0, 60))
    // next fold cleans both and folds the real new delta
    Bucketing.ingestBucketedDelta(rows(60, 70), loc, 1L)
    Bucketing.foldBucketedDeltas(spark, loc, base)
    assert(content(loc, base) == expect(0, 70))
    assert(!graft.sinks.Hfs.exists(spark, s"$loc/main_v7"),
      "orphan main version must be deleted")
    assert(graft.sinks.IngestSegments.liveSegments(spark, s"$loc/delta").isEmpty,
      "all delta segments folded or cleaned")
  }

  test("cold start: a delta-only table folds by bootstrapping from its deltas") {
    val loc = tmpLoc(); val base = "btspec_c"
    val w = Bucketing.streamingBucketedIngestWriter(loc, base, "k", 4,
      foldEvery = 2L) _
    w(rows(0, 10), 0L)
    w(rows(10, 20), 1L) // fold fires here, cold (no bootstrap ever ran)
    val (main, tail) = Bucketing.bucketedSnapshot(spark, loc, base)
    assert(tail.isEmpty)
    assert(main.collect().map(r => (r.getLong(0), r.getString(1))).toSet ==
      expect(0, 20))
    w(rows(20, 30), 2L)
    assert(content(loc, base) == expect(0, 30))
    w(rows(30, 40), 3L) // second fold, warm path
    val (m2, t2) = Bucketing.bucketedSnapshot(spark, loc, base)
    assert(t2.isEmpty)
    assert(m2.collect().map(r => (r.getLong(0), r.getString(1))).toSet ==
      expect(0, 40))
  }

  test("real stream: checkpointed query drives the writer across a restart; snapshot is exactly-once") {
    val in = java.nio.file.Files.createTempDirectory("bt_in").toString
    val ckpt = java.nio.file.Files.createTempDirectory("bt_ckpt").toString
    val loc = tmpLoc(); val base = "btspec_s"
    def startQuery() = spark.readStream
      .format("csv").schema("k LONG, payload STRING").load(in)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (b: DataFrame, id: Long) =>
        Bucketing.streamingBucketedIngestWriter(loc, base, "k", 4,
          foldEvery = 2L)(b, id)
      }
      .start()
    def csv(name: String, from: Long, until: Long): Unit =
      java.nio.file.Files.writeString(java.nio.file.Path.of(s"$in/$name"),
        (from until until).map(i => s"$i,p$i").mkString("", "\n", "\n"))
    csv("a.csv", 0, 10)
    val q1 = startQuery(); q1.processAllAvailable(); q1.stop()
    // data lands while the query is down; the restart resumes batch ids
    // from the checkpoint, so fold cadence and replay both carry over
    csv("b.csv", 10, 20)
    csv("c.csv", 20, 30)
    val q2 = startQuery(); q2.processAllAvailable(); q2.stop()
    assert(content(loc, base) == expect(0, 30))
  }

  test("randomized ingest/fold/replay sequence always snapshots to the exact row set") {
    val rnd = new scala.util.Random(8)
    val loc = tmpLoc(); val base = "btspec_r"
    Bucketing.bootstrapBucketed(rows(0, 20), loc, base, "k", 4)
    var next = 20L
    var batch = 0L
    val reference = scala.collection.mutable.Set[(Long, String)]()
    reference ++= expect(0, 20)
    for (_ <- 0 until 12) {
      rnd.nextInt(3) match {
        case 0 => // ingest a fresh batch
          val sz = 1 + rnd.nextInt(15)
          Bucketing.ingestBucketedDelta(rows(next, next + sz), loc, batch)
          reference ++= expect(next, next + sz)
          // remember the batch's rows in case of a replay below
          replayable(batch) = (next, next + sz)
          next += sz; batch += 1
        case 1 if batch > 0 => // at-least-once replay of the LAST batch
          // (only the newest batch can replay — older ids are
          // checkpoint-committed, the IngestSegments contract)
          val (f, u) = replayable(batch - 1)
          Bucketing.ingestBucketedDelta(rows(f, u), loc, batch - 1)
        case _ =>
          Bucketing.foldBucketedDeltas(spark, loc, base)
      }
      assert(content(loc, base) == reference.toSet,
        s"divergence after step (batch=$batch)")
    }
    Bucketing.foldBucketedDeltas(spark, loc, base)
    val (_, tail) = Bucketing.bucketedSnapshot(spark, loc, base)
    assert(tail.isEmpty)
    assert(content(loc, base) == reference.toSet)
  }
  private val replayable = scala.collection.mutable.Map[Long, (Long, Long)]()

  test("torn delta segment (no commit marker) is excluded from snapshot and fold until its replay heals it") {
    val loc = tmpLoc(); val base = "btspec_t"
    Bucketing.bootstrapBucketed(rows(0, 20), loc, base, "k", 4)
    Bucketing.ingestBucketedDelta(rows(20, 30), loc, 0L)
    // simulate a crash mid-ingest of batch 1: data on disk, no marker
    rows(30, 40).write.parquet(s"$loc/delta/ingest=1")
    for (m <- Seq("_SUCCESS", graft.sinks.Hfs.CommitMarker))
      graft.sinks.Hfs.deleteRecursive(spark, s"$loc/delta/ingest=1/$m")
    assert(content(loc, base) == expect(0, 30), "torn segment must not be read")
    Bucketing.foldBucketedDeltas(spark, loc, base)
    assert(content(loc, base) == expect(0, 30))
    assert(graft.sinks.Hfs.exists(spark, s"$loc/delta/ingest=1"),
      "fold must not delete a torn segment — its replay still has to land")
    // the stream replays batch 1 (overwrite) — now committed and visible
    Bucketing.ingestBucketedDelta(rows(30, 40), loc, 1L)
    assert(content(loc, base) == expect(0, 40))
    Bucketing.foldBucketedDeltas(spark, loc, base)
    assert(content(loc, base) == expect(0, 40))
  }

  test("cold-start fold refuses to discard a crashed bulk bootstrap's main") {
    val loc = tmpLoc(); val base = "btspec_u"
    // a bulk bootstrap that crashed after writing main_v0 but before
    // its meta commit: breadcrumb + main dir, no pointer
    graft.sinks.Hfs.writeString(spark, s"$loc/__bootstrap_attempt", "bulk")
    rows(0, 10).write.parquet(s"$loc/main_v0")
    Bucketing.ingestBucketedDelta(rows(10, 20), loc, 0L)
    val e = intercept[IllegalArgumentException] {
      Bucketing.foldBucketedDeltas(spark, loc, base, Some(("k", 4)))
    }
    assert(e.getMessage.contains("bulk bootstrap"))
    // the operator re-runs the bootstrap; everything proceeds normally
    Bucketing.bootstrapBucketed(rows(0, 10), loc, base, "k", 4)
    Bucketing.foldBucketedDeltas(spark, loc, base, Some(("k", 4)))
    assert(content(loc, base) == expect(0, 20))
  }

  test("empty micro-batch ingest writes nothing and folds cleanly") {
    val loc = tmpLoc(); val base = "btspec_e"
    Bucketing.bootstrapBucketed(rows(0, 10), loc, base, "k", 2)
    Bucketing.ingestBucketedDelta(rows(0, 0), loc, 0L)
    assert(!graft.sinks.Hfs.exists(spark, s"$loc/delta/ingest=0"))
    assert(content(loc, base) == expect(0, 10))
    Bucketing.foldBucketedDeltas(spark, loc, base)
    assert(content(loc, base) == expect(0, 10))
  }

  test("guards: re-bootstrap over a live table and negative delta ids are refused") {
    val loc = tmpLoc(); val base = "btspec_d"
    Bucketing.bootstrapBucketed(rows(0, 10), loc, base, "k", 2)
    intercept[IllegalArgumentException] {
      Bucketing.bootstrapBucketed(rows(0, 10), loc, base, "k", 2)
    }
    intercept[IllegalArgumentException] {
      Bucketing.ingestBucketedDelta(rows(10, 20), loc, -1L)
    }
  }
}
