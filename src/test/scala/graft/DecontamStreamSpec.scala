package graft

import java.nio.file.Files

import graft.functions.DedupOps
import org.apache.spark.sql.functions._

/** Streaming decontamination admission (q75's Bloom+exact gate per
  * micro-batch): contaminated docs are dropped across batch cuts exactly
  * as the batch-side q75 decision would drop them. */
class DecontamStreamSpec extends SparkSpec {
  import spark.implicits._

  private val benchA = ("held out benchmark question about prime factorization " * 6).trim
  private val benchB = ("another eval suite item on chain of thought arithmetic " * 6).trim
  // contaminated: embeds a full benchA passage inside novel text
  private val leaked =
    "training document that copied held out benchmark question about prime factorization verbatim"
  private val clean1 = ("ordinary web text about cooking pasta with garlic and oil " * 6).trim
  private val clean2 = ("a different clean document describing bicycle maintenance " * 6).trim

  test("streaming admission ≡ batch q75 decision across batch cuts; empty bench admits all") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("decontam_stream").toString
    val bench = Seq((0L, benchA), (1L, benchB)).toDF("doc_id", "text")
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val writer = DedupOps.streamingDecontaminationWriter(bench, dir)
    val q = in.toDF().toDF("doc_id", "text").writeStream
      .option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch(writer)
      .start()
    try {
      in.addData((10L, leaked), (11L, clean1))
      q.processAllAvailable()
      in.addData((12L, clean2), (13L, benchB)) // verbatim benchmark doc
      q.processAllAvailable()
    } finally q.stop()
    val admitted = spark.read.parquet(s"$dir/admitted")
      .select(col("doc_id")).as[Long].collect().toSet
    assert(admitted == Set(11L, 12L),
      s"only the clean docs may pass the gate, got $admitted")
    // at-least-once replay: re-running batch 0 must REPLACE ingest=0,
    // not append a second copy of its admitted rows
    try writer(Seq((10L, leaked), (11L, clean1)).toDF("doc_id", "text"), 0L)
    finally writer.release()
    val replayed = spark.read.parquet(s"$dir/admitted")
      .select(col("doc_id")).as[Long].collect().toSeq
    assert(replayed.sorted == Seq(11L, 12L),
      s"replaying a batch must be a no-op, got $replayed")

    // empty benchmark set: nothing is contaminated, everything admits
    val dir2 = Files.createTempDirectory("decontam_stream_empty").toString
    val noBench = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val emptyWriter = DedupOps.streamingDecontaminationWriter(noBench, dir2)
    try emptyWriter(Seq((20L, leaked), (21L, clean1)).toDF("doc_id", "text"), 0L)
    finally emptyWriter.release()
    val all = spark.read.parquet(s"$dir2/admitted")
      .select(col("doc_id")).as[Long].collect().toSet
    assert(all == Set(20L, 21L))
  }

  test("q164 registry lifecycle: fold + live tail + replayed tail serve a cut ≡ batch q162; an empty registry passes every doc untouched") {
    val docs = graft.Tables.t(spark, sf0001, "documents")
      .select(col("doc_id"), col("text"), col("source"))
    val loc = Files.createTempDirectory("graft-benchreg").toString
    // four batch cuts over the raw mixed table (the writer extracts the
    // benchmark slice itself): 0+1 folded, 2 live, 3 appended as the
    // tail and REPLAYED — registry reads are set-semantics, so the
    // replay must be invisible
    def cut(b: Long) = docs.filter(pmod(col("doc_id"), lit(4)) === b)
    val w = graft.sinks.BenchRegistrySink.writer(loc) _
    w(cut(0), 0L); w(cut(1), 1L); w(cut(2), 2L)
    graft.sinks.BenchRegistrySink.compact(spark, loc)
    assert(graft.sinks.IngestSegments.liveSegments(spark, loc)
      .count(_ < 0) == 1, "registry must carry exactly one fold segment")
    w(cut(3), 3L)
    w(cut(3), 3L) // at-least-once replay of the tail
    val train = docs.filter(col("doc_id") >= 20)
    val (spans, route) = DedupOps.decontamSpansFromRegistry(
      graft.sinks.BenchRegistrySink.registry(spark, loc), train, 4)
    assert(route == "broadcast",
      s"a stored eval registry is broadcast-sized at fixture scale, got $route")
    val got = DedupOps.removalFromSpans(train, spans)
      .as[(Long, String, Long)].collect().toSet
    val want = DedupOps.substringDecontamOver(docs, 4)
      .as[(Long, String, Long)].collect().toSet
    assert(want.exists(_._3 > 0) && got == want,
      "the stored-registry cut must hash-equal the batch q162 answer")

    // cold start: an empty registry cuts nothing — every training doc
    // passes through byte-identical with zero removed tokens
    val empty = Files.createTempDirectory("graft-benchreg-empty").toString
    val (noSpans, _) = DedupOps.decontamSpansFromRegistry(
      graft.sinks.BenchRegistrySink.registry(spark, empty), train, 4)
    val untouched = DedupOps.removalFromSpans(train, noSpans)
    assert(untouched.filter(col("n_removed") =!= 0L).count() == 0)
    assert(untouched.count() == train.count())
  }
}
