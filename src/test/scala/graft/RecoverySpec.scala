package graft

import java.nio.file.Files

import graft.streaming.Streams
import org.apache.spark.sql.functions._

/** ST2/ST8: checkpoint-based recovery — stop a stream mid-input, restart
  * from the same checkpoint, and the output contains every input exactly
  * once (no dupes from replay, no losses), mirroring the reference's
  * process-then-commit contract (util/MyOffsetUtils.scala:20-36) with
  * the stronger engine guarantee. */
class RecoverySpec extends SparkSpec {

  test("file-source stream survives restart from checkpoint without dupes or losses") {
    val in = Files.createTempDirectory("rec_in").toString
    val ckpt = Files.createTempDirectory("rec_ckpt").toString
    val out = Files.createTempDirectory("rec_out").toString

    def startQuery() = spark.readStream
      .format("text").load(in).toDF("value")
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.write.mode("append").parquet(s"$out/sink")
      }
      .start()

    Files.writeString(java.nio.file.Path.of(s"$in/a.txt"), "r1\nr2\n")
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop()

    // new data while the query is down; restart resumes from checkpoint
    Files.writeString(java.nio.file.Path.of(s"$in/b.txt"), "r3\nr4\n")
    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()

    val got = spark.read.parquet(s"$out/sink")
      .select("value").collect().map(_.getString(0)).sorted.toSeq
    assert(got == Seq("r1", "r2", "r3", "r4"))
  }

  test("orderedFold (transitionPairs) resumes its buffer AND tail across a kill-and-restart mid-lifecycle") {
    // The round-12 gap: RecoverySpec covered dedup/sink restarts, but
    // no test killed a SEQUENCE operator (flatMapGroupsWithState with
    // the shared ordered-replay state) between cuts. This one stops the
    // query at a point where user 1 holds BOTH kinds of state — a tail
    // (last emitted event, e2) and an UNRIPE buffered event (e3, not
    // yet passed by the watermark) — plus user 2 holding a tail only,
    // then restarts from the checkpoint and proves every cross-restart
    // pair is emitted exactly once:
    //   u1: (e1→e2) before the kill; (e2→e3) needs tail+buffer restored;
    //       (e3→e4) chains a post-restart arrival onto the flushed one;
    //   u2: (e21→e22) pairs across the restart via the tail alone.
    import spark.implicits._
    val in = Files.createTempDirectory("of_in").toString
    val ckpt = Files.createTempDirectory("of_ckpt").toString
    val out = Files.createTempDirectory("of_out").toString
    def ev(uid: Long, ts: String, id: Long, tp: String) =
      (uid, java.sql.Timestamp.valueOf(ts), id, tp)
    val schema = Seq((0L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
      0L, "")).toDF("user_id", "ts", "event_id", "event_type").schema
    def startQuery() = {
      val events = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(in)
        .as[Streams.TransEvent]
      Streams.transitionPairs(events, "10 minutes").toDF()
        .writeStream
        .option("checkpointLocation", ckpt)
        .format("parquet").option("path", s"$out/sink")
        .start()
    }
    def cut(name: String, rows: Seq[(Long, java.sql.Timestamp, Long, String)]): Unit = {
      rows.toDF("user_id", "ts", "event_id", "event_type")
        .coalesce(1).write.mode("overwrite").parquet(s"$in/__stage")
      // rename into place so the file source never lists a torn write
      val part = graft.sinks.Hfs.childFiles(spark, s"$in/__stage")
        .filter(f => f.startsWith("part-") && f.endsWith(".parquet")).head
      graft.sinks.Hfs.rename(spark, s"$in/__stage/$part", s"$in/$name")
      graft.sinks.Hfs.deleteRecursive(spark, s"$in/__stage")
    }
    // cut 1: u1 e1/e2 ripe once the max ts (10:30) sets wm = 10:20;
    // e3 (10:30) stays BUFFERED (strict ripe line needs ts < wm);
    // u2 e21 also unripe at first, ripe nowhere — tail after flush.
    cut("c0.parquet", Seq(
      ev(1L, "2024-01-01 10:00:00", 1L, "view"),
      ev(1L, "2024-01-01 10:02:00", 2L, "cart"),
      ev(1L, "2024-01-01 10:30:00", 3L, "buy"),
      ev(2L, "2024-01-01 10:29:00", 21L, "view")))
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop() // KILL: u1 state = tail e2 + buffer [e3]; u2 buffer [e21]
    val afterKill = spark.read.parquet(s"$out/sink")
      .as[Streams.TransPair].collect().toSet
    assert(afterKill == Set(Streams.TransPair(1L, 1L, 2L, "view", "cart")),
      s"pre-kill output wrong: $afterKill")
    // cuts 2+3 arrive while the query is DOWN; restart must resume the
    // buffer (e3/e21 flush against the restored watermark) and the tail
    // (e2 pairs with e3 — impossible unless state survived the kill)
    cut("c1.parquet", Seq(
      ev(1L, "2024-01-01 11:00:00", 4L, "pay"),
      ev(2L, "2024-01-01 11:01:00", 22L, "cart")))
    cut("c2.parquet", Seq( // watermark pusher: ripens everything above
      ev(9L, "2024-01-01 23:00:00", 99L, "noise")))
    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()
    val got = spark.read.parquet(s"$out/sink")
      .as[Streams.TransPair].collect().toSeq
    val want = Set(
      Streams.TransPair(1L, 1L, 2L, "view", "cart"),
      Streams.TransPair(1L, 2L, 3L, "cart", "buy"),   // tail + buffer
      Streams.TransPair(1L, 3L, 4L, "buy", "pay"),    // flushed + new
      Streams.TransPair(2L, 21L, 22L, "view", "cart")) // tail across kill
    assert(got.toSet == want, s"got=$got")
    assert(got.size == want.size, s"a cross-restart pair duplicated: $got")
  }

  test("dedup stream replays idempotently: restarting over the same files adds nothing") {
    val in = Files.createTempDirectory("rec2_in").toString
    val ckpt = Files.createTempDirectory("rec2_ckpt").toString
    val out = Files.createTempDirectory("rec2_out").toString
    Files.writeString(java.nio.file.Path.of(s"$in/a.csv"),
      "m1,2024-01-01 10:00:00\nm1,2024-01-01 11:00:00\nm2,2024-01-01 10:00:00\n")

    def run(): Unit = {
      val raw = spark.readStream.format("csv")
        .schema("mid STRING, ts TIMESTAMP").load(in)
      val q = Streams.dauDedup(raw)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.withColumn("dt", col("dt").cast("string"))
            .write.mode("append").parquet(s"$out/sink")
        }
        .start()
      q.processAllAvailable(); q.stop()
    }
    run(); run() // second run must be a no-op (offsets committed)
    val got = spark.read.parquet(s"$out/sink").select("mid").collect().map(_.getString(0)).sorted.toSeq
    assert(got == Seq("m1", "m2"))
  }

  test("q156 substring index through a REAL checkpointed stream: kill mid-corpus, resume, spans ≡ batch") {
    import spark.implicits._
    val in = Files.createTempDirectory("rec3_in").toString
    val ckpt = Files.createTempDirectory("rec3_ckpt").toString
    val idx = Files.createTempDirectory("rec3_idx").toString

    // docs with cross-file duplicated runs: the shared 10-token run
    // lands in files that arrive in DIFFERENT micro-batches, so span
    // detection requires counts accumulated across the restart
    val run10 = (1 to 10).map(i => s"r$i").mkString(" ")
    def uniq(seed: Int, n: Int) = (1 to n).map(j => s"u${seed}x$j").mkString(" ")
    def doc(id: Long, text: String) = s"$id\t$text"
    Files.writeString(java.nio.file.Path.of(s"$in/a.txt"),
      doc(0L, uniq(0, 4) + " " + run10) + "\n" + doc(1L, uniq(1, 12)) + "\n")

    def startQuery() = {
      val parsed = spark.readStream.format("text").load(in)
        .select(split(col("value"), "\t").as("kv"))
        .select(col("kv")(0).cast("long").as("doc_id"), col("kv")(1).as("text"))
      parsed.writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, bid: Long) =>
          graft.sinks.SubstrIndexSink.writer(idx)(batch, bid)
        }
        .start()
    }
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop() // killed mid-corpus: only file a is indexed
    // the run's second occurrence arrives AFTER the restart
    Files.writeString(java.nio.file.Path.of(s"$in/b.txt"),
      doc(2L, run10 + " " + uniq(2, 6)) + "\n")
    val q2 = startQuery()
    q2.processAllAvailable()
    graft.sinks.SubstrIndexSink.compact(spark, idx)
    q2.stop()

    val allDocs = Seq(
      (0L, uniq(0, 4) + " " + run10),
      (1L, uniq(1, 12)),
      (2L, run10 + " " + uniq(2, 6))).toDF("doc_id", "text")
    val want = graft.functions.DedupOps.substringSpansOver(allDocs, 8)
      .as[(Long, Long, Long, Long)].collect().toSet
    val got = graft.sinks.SubstrIndexSink.spans(spark, idx)
      .as[(Long, Long, Long, Long)].collect().toSet
    // the 10-token run: 3 dup starts per occurrence, at offsets 5 and 1
    assert(want == Set((0L, 5L, 14L, 3L), (2L, 1L, 10L, 3L)),
      s"fixture construction drifted: $want")
    assert(got == want,
      "spans across a kill-and-restart must equal the batch scan")
  }

  test("q167 retraction through a REAL checkpointed stream: kill between ingest and a MIXED insert+delete batch, resume, spans ≡ batch on the live corpus") {
    import spark.implicits._
    val in = Files.createTempDirectory("rec5_in").toString
    val ckpt = Files.createTempDirectory("rec5_ckpt").toString
    val idx = Files.createTempDirectory("rec5_idx").toString

    val run10 = (1 to 10).map(i => s"r$i").mkString(" ") // docs 0, 2
    val runB = (1 to 10).map(i => s"b$i").mkString(" ")  // docs 6, 8
    val rep8 = (1 to 8).map(i => s"s$i").mkString(" ")   // twice in doc 4
    def uniq(seed: Int, n: Int) = (1 to n).map(j => s"u${seed}x$j").mkString(" ")
    def line(id: Long, op: String, text: String) = s"$id\t$op\t$text"
    Files.writeString(java.nio.file.Path.of(s"$in/a.txt"),
      line(0L, "I", uniq(0, 4) + " " + run10) + "\n" +
        line(2L, "I", run10 + " " + uniq(2, 5)) + "\n" +
        line(4L, "I", rep8 + " q0 " + rep8) + "\n")

    def startQuery() = {
      val parsed = spark.readStream.format("text").load(in)
        .select(split(col("value"), "\t").as("kv"))
        .select(col("kv")(0).cast("long").as("doc_id"),
          col("kv")(1).as("op"), col("kv")(2).as("text"))
      parsed.writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, bid: Long) =>
          graft.sinks.SubstrIndexSink.cdc(idx)(batch, bid)
        }
        .start()
    }
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop() // killed after the pure-ingest batch
    // the restart batch MIXES inserts (the runB pair) with the delete
    // of doc 2 — run10's only partner, so doc 0's span must die via
    // the negative count partial computed across the restart
    Files.writeString(java.nio.file.Path.of(s"$in/b.txt"),
      line(6L, "I", runB + " " + uniq(6, 3)) + "\n" +
        line(8L, "I", uniq(8, 2) + " " + runB) + "\n" +
        line(2L, "D", "x") + "\n")
    val q2 = startQuery()
    q2.processAllAvailable()
    graft.sinks.SubstrIndexSink.compact(spark, idx)
    q2.stop()

    val live = Seq(
      (0L, uniq(0, 4) + " " + run10),
      (4L, rep8 + " q0 " + rep8),
      (6L, runB + " " + uniq(6, 3)),
      (8L, uniq(8, 2) + " " + runB)).toDF("doc_id", "text")
    val want = graft.functions.DedupOps.substringSpansOver(live, 8)
      .as[(Long, Long, Long, Long)].collect().toSet
    // fixture sanity: runB spans present, run10's NOT (partner deleted)
    assert(want.exists(_._1 == 6L) && !want.exists(_._1 == 0L),
      s"fixture construction drifted: $want")
    val got = graft.sinks.SubstrIndexSink.spans(spark, idx)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == want,
      "spans after a kill + mixed insert/delete batch must equal the " +
        "batch scan on the live corpus")
  }

  test("q168 registry retraction through a REAL checkpointed stream: kill, then a mixed admit+retire batch, cut ≡ batch q162 on the live suite") {
    import spark.implicits._
    val in = Files.createTempDirectory("rec6_in").toString
    val ckpt = Files.createTempDirectory("rec6_ckpt").toString
    val reg = Files.createTempDirectory("rec6_reg").toString

    val leakA = (1 to 5).map(i => s"a$i").mkString(" ") // bench doc 0
    val leakB = (1 to 5).map(i => s"b$i").mkString(" ") // bench doc 1
    def uniq(seed: Int, n: Int) = (1 to n).map(j => s"u${seed}x$j").mkString(" ")
    def line(id: Long, op: String, text: String) = s"$id\t$op\t$text"
    Files.writeString(java.nio.file.Path.of(s"$in/a.txt"),
      line(0L, "I", uniq(0, 3) + " " + leakA) + "\n")

    def startQuery() = {
      val parsed = spark.readStream.format("text").load(in)
        .select(split(col("value"), "\t").as("kv"))
        .select(col("kv")(0).cast("long").as("doc_id"),
          col("kv")(1).as("op"), col("kv")(2).as("text"))
      parsed.writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, bid: Long) =>
          graft.sinks.BenchRegistrySink.cdc(reg)(batch, bid)
        }
        .start()
    }
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop() // killed with only bench doc 0 registered
    // restart batch: admit bench doc 1 AND retire bench doc 0
    Files.writeString(java.nio.file.Path.of(s"$in/b.txt"),
      line(1L, "I", leakB + " " + uniq(1, 7)) + "\n" +
        line(0L, "D", "x") + "\n")
    val q2 = startQuery()
    q2.processAllAvailable()
    graft.sinks.BenchRegistrySink.compact(spark, reg)
    q2.stop()

    // the live suite is bench doc 1 alone: only leakB cuts
    val liveDocs = Seq(
      (1L, leakB + " " + uniq(1, 7)),
      (20L, leakA + " " + uniq(2, 6) + " " + leakB),
      (21L, uniq(3, 9))).toDF("doc_id", "text")
    val want = graft.functions.DedupOps.substringDecontamOver(liveDocs, 4)
      .as[(Long, String, Long)].collect().toSet
    assert(want.exists(r => r._1 == 20L && r._3 == 5L),
      s"fixture construction drifted: $want")
    val train = liveDocs.filter(col("doc_id") >= 20)
    val got = graft.functions.DedupOps.removalFromSpans(train,
      graft.functions.DedupOps.decontamSpansFromRegistry(
        graft.sinks.BenchRegistrySink.registry(spark, reg), train, 4)._1)
      .as[(Long, String, Long)].collect().toSet
    assert(got == want,
      "the cut after a kill + mixed admit/retire batch must equal the " +
        "batch q162 answer on the live suite")
  }

  test("q171 label chain through a REAL checkpointed stream: kill, then a MIXED edge+delete batch, labels ≡ closure on the live graph") {
    import spark.implicits._
    val in = Files.createTempDirectory("rec7_in").toString
    val ckpt = Files.createTempDirectory("rec7_ckpt").toString
    val tbl = Files.createTempDirectory("rec7_tbl").toString + "/labels"

    // chain 0-1-2-3 arrives pre-kill; the restart batch deletes the cut
    // vertex 2 (split!) AND adds edge (3,4) — the recompute must read
    // edge provenance accumulated across the restart
    def line(a: Long, b: Long, op: String) = s"$a\t$b\t$op"
    Files.writeString(java.nio.file.Path.of(s"$in/a.txt"),
      line(0L, 1L, "I") + "\n" + line(1L, 2L, "I") + "\n" +
        line(2L, 3L, "I") + "\n")

    def startQuery() = {
      val parsed = spark.readStream.format("text").load(in)
        .select(split(col("value"), "\t").as("kv"))
        .select(col("kv")(0).cast("long").as("doc_a"),
          col("kv")(1).cast("long").as("doc_b"), col("kv")(2).as("op"))
      parsed.writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, bid: Long) =>
          graft.sinks.LabelSink.cdc(tbl)(batch, bid)
        }
        .start()
    }
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop()
    assert(graft.sinks.LabelSink.read(spark, tbl)
      .as[(Long, Long)].collect().toSet ==
      Set((0L, 0L), (1L, 0L), (2L, 0L), (3L, 0L)))
    Files.writeString(java.nio.file.Path.of(s"$in/b.txt"),
      line(2L, -1L, "D") + "\n" + line(3L, 4L, "I") + "\n")
    val q2 = startQuery()
    q2.processAllAvailable()
    graft.sinks.LabelSink.compact(spark, tbl)
    q2.stop()
    // live graph: (0,1) and (3,4) — the chain split at the deleted cut
    // vertex, the right half re-titled and extended by the new edge
    assert(graft.sinks.LabelSink.read(spark, tbl)
      .as[(Long, Long)].collect().toSet ==
      Set((0L, 0L), (1L, 0L), (3L, 3L), (4L, 3L)),
      "labels after a kill + mixed edge/delete batch must equal the " +
        "closure on the live graph")
  }

  test("q164 benchmark registry through a REAL checkpointed stream: kill mid-registry, resume, cut ≡ batch q162") {
    import spark.implicits._
    val in = Files.createTempDirectory("rec4_in").toString
    val ckpt = Files.createTempDirectory("rec4_ckpt").toString
    val reg = Files.createTempDirectory("rec4_reg").toString

    // two benchmark docs land in DIFFERENT micro-batches around the
    // kill; the training doc leaks a run from EACH, so the correct cut
    // needs registry grams accumulated across the restart
    val leakA = (1 to 5).map(i => s"a$i").mkString(" ")
    val leakB = (1 to 5).map(i => s"b$i").mkString(" ")
    def uniq(seed: Int, n: Int) = (1 to n).map(j => s"u${seed}x$j").mkString(" ")
    def doc(id: Long, text: String) = s"$id\t$text"
    Files.writeString(java.nio.file.Path.of(s"$in/a.txt"),
      doc(0L, uniq(0, 3) + " " + leakA) + "\n" +
        doc(20L, leakA + " " + uniq(2, 6) + " " + leakB) + "\n" +
        doc(21L, uniq(3, 9)) + "\n")

    def startQuery() = {
      val parsed = spark.readStream.format("text").load(in)
        .select(split(col("value"), "\t").as("kv"))
        .select(col("kv")(0).cast("long").as("doc_id"), col("kv")(1).as("text"))
      parsed.writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, bid: Long) =>
          graft.sinks.BenchRegistrySink.writer(reg)(batch, bid)
        }
        .start()
    }
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop() // killed mid-registry: only bench doc 0 is stored
    Files.writeString(java.nio.file.Path.of(s"$in/b.txt"),
      doc(1L, leakB + " " + uniq(1, 7)) + "\n")
    val q2 = startQuery()
    q2.processAllAvailable()
    graft.sinks.BenchRegistrySink.compact(spark, reg)
    q2.stop()

    val allDocs = Seq(
      (0L, uniq(0, 3) + " " + leakA),
      (1L, leakB + " " + uniq(1, 7)),
      (20L, leakA + " " + uniq(2, 6) + " " + leakB),
      (21L, uniq(3, 9))).toDF("doc_id", "text")
    val want = graft.functions.DedupOps.substringDecontamOver(allDocs, 4)
      .as[(Long, String, Long)].collect().toSet
    // both leaked runs must be cut (5 tokens each — doc 20's answer
    // needs the post-restart bench doc's grams too)
    assert(want.exists(r => r._1 == 20L && r._3 == 10L),
      s"fixture construction drifted: $want")
    val train = allDocs.filter(col("doc_id") >= 20)
    val got = graft.functions.DedupOps.removalFromSpans(train,
      graft.functions.DedupOps.decontamSpansFromRegistry(
        graft.sinks.BenchRegistrySink.registry(spark, reg), train, 4)._1)
      .as[(Long, String, Long)].collect().toSet
    assert(got == want,
      "the cut across a kill-and-restart must equal the batch q162 answer")
  }
}
