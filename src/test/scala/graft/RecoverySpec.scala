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
}
