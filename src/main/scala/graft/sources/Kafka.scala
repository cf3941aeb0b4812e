package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.Row

/** Kafka source/sink surface (SURVEY.md §2.1 S1-S5).
  *
  * The reference hand-rolls consumers/producers + Redis offset hashes
  * (util/MykafkaUtils.scala:41-128, util/MyOffsetUtils.scala:20-63);
  * Structured Streaming's Kafka connector subsumes every piece:
  * - S1/S2 subscribe + explicit offsets → options below; recovery offsets
  *   come from the checkpoint WAL (ST2's whole subsystem deleted);
  * - S3/S4 sticky vs keyed produce → absence/presence of the `key` column;
  * - S5 flush barrier → epoch commit of the sink (implicit).
  *
  * NOTE: this environment has no Kafka broker and no connector jar, so
  * these builders are code-complete but locally unexercised (SURVEY.md §5
  * note); every pipeline is tested through its MemoryStream/file twin,
  * which differs only in this module.
  */
object Kafka {

  /** S1/S2: value-bearing stream from a topic. `startingOffsets` is
    * "earliest" | "latest" | a per-partition JSON map (S2); ignored on
    * restart in favor of the checkpoint. */
  def readStream(spark: SparkSession, bootstrap: String, topic: String,
      startingOffsets: String = "latest"): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      .load()
      .select(
        col("key").cast("string").as("key"),
        col("value").cast("string").as("value"),
        col("topic"), col("partition"), col("offset"),
        col("timestamp").as("kafka_ts"))

  /** Batch twin of S1 (spark.read for reprocessing a bounded range). */
  def readBatch(spark: SparkSession, bootstrap: String, topic: String,
      startingOffsets: String = "earliest",
      endingOffsets: String = "latest"): DataFrame =
    spark.read
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      .option("endingOffsets", endingOffsets)
      .load()
      .select(col("key").cast("string"), col("value").cast("string"),
        col("topic"), col("partition"), col("offset"))

  /** S3/S4: produce `value` (+ optional `key` for hash partitioning; a
    * `topic` column routes rows dynamically — P10's DWD_<TABLE>_<op>). */
  def writeStream(df: DataFrame, bootstrap: String, checkpoint: String,
      topic: Option[String] = None,
      trigger: Trigger = Trigger.ProcessingTime("5 seconds")): DataStreamWriter[Row] = {
    val w = df.writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
    topic.fold(w)(t => w.option("topic", t))
  }
}
