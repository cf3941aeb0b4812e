package graft

import java.nio.file.Files

import graft.operators.CdcRouter
import graft.sinks.MergeParquetSink
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Integration: the reference's dim-store maintenance (S6, Redis
  * `DIM:<TABLE>:<id>` upserts + deletes) flowing as a STREAM through the
  * merge-on-read sink — inserts/updates append delta segments, CDC
  * deletes append tombstones, and the read-side merge serves the latest
  * dim image; no partition is ever rewritten on the hot path. */
class CdcMergeDimSpec extends SparkSpec {
  import spark.implicits._

  private def cdc(table: String, typ: String, id: Int, extra: String = "") =
    s"""{"database":"gmall","table":"$table","type":"$typ","ts":1645434731,
       |"data":{"id":$id$extra}}""".stripMargin.replaceAll("\n", "")

  test("streamed CDC dim upserts + deletes through MergeParquetSink") {
    implicit val sqlCtx = spark.sqlContext
    val path = Files.createTempDirectory("cdc_merge").toString + "/dims"
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]

    def dimWriter(batch: DataFrame, batchId: Long): Unit = {
      if (batch.isEmpty) return
      val dim = CdcRouter.dims(
        CdcRouter.decode(sources.Envelopes.parseCdc(batch)), Seq("user_info"))
        .withColumn("dt", lit("2024-01-01"))
        .withColumn("ver", lit(batchId))
      val upserts = dim.filter(col("op") =!= "D").drop("op")
      val deletes = dim.filter(col("op") === "D").select(col("key"), col("dt"), col("ver"))
      if (!upserts.isEmpty) MergeParquetSink.upsert(upserts, path, "dt")
      if (!deletes.isEmpty)
        MergeParquetSink.delete(deletes, path, "dt",
          upserts.drop(Nil: _*), "ver") // schema template: key, value, dt, ver
    }

    val q = in.toDF().toDF("value").writeStream
      .foreachBatch(dimWriter _).start()
    try {
      in.addData(cdc("user_info", "insert", 1, ""","name":"a""""),
        cdc("user_info", "insert", 2, ""","name":"b""""))
      q.processAllAvailable()
      in.addData(cdc("user_info", "update", 1, ""","name":"a2"""")) // newer image
      q.processAllAvailable()
      in.addData(cdc("user_info", "delete", 2))
      q.processAllAvailable()

      val served = MergeParquetSink.read(spark, path, Seq("key"), "ver")
        .select(col("key"), get_json_object(col("value"), "$.name").as("name"))
        .as[(String, String)].collect().toMap
      assert(served == Map("DIM:USER_INFO:1" -> "a2")) // 2 deleted, 1 updated
    } finally q.stop()
  }
}
