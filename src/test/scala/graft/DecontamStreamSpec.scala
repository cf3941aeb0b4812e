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
}
