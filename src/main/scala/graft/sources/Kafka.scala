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
  * the `.load()` paths are code-complete but locally unexercisable
  * (SURVEY.md §5 note); every pipeline is tested through its
  * MemoryStream/file twin, which differs only in this module. What IS
  * unit-tested (KafkaConfigSpec) is everything a broker would receive:
  * the exact connector option maps (one typo'd key here would only
  * surface at deployment), the per-partition offsets JSON, the source
  * projection's casts, and the writer's format/trigger/option wiring —
  * all options flow through the pure builders below, so the tested maps
  * ARE the emitted maps, not a parallel copy.
  */
object Kafka {

  /** The exact option map a streaming subscribe emits — S1/S2's wire
    * surface. `startingOffsets` is "earliest" | "latest" | a
    * per-partition JSON map ([[offsetsJson]]); the connector ignores it
    * on restart in favor of the checkpoint. */
  private[graft] def sourceOptions(bootstrap: String, topic: String,
      startingOffsets: String): Map[String, String] = Map(
    "kafka.bootstrap.servers" -> bootstrap,
    "subscribe" -> topic,
    "startingOffsets" -> startingOffsets)

  /** Batch-read options: the streaming map plus the bounded range end. */
  private[graft] def batchOptions(bootstrap: String, topic: String,
      startingOffsets: String, endingOffsets: String): Map[String, String] =
    sourceOptions(bootstrap, topic, startingOffsets) +
      ("endingOffsets" -> endingOffsets)

  /** Sink options: bootstrap + checkpoint, plus the static topic when
    * one is given (absent ⇒ rows must carry a `topic` column — P10's
    * dynamic DWD_<table>_<op> routing). */
  private[graft] def sinkOptions(bootstrap: String, checkpoint: String,
      topic: Option[String]): Map[String, String] =
    Map("kafka.bootstrap.servers" -> bootstrap,
      "checkpointLocation" -> checkpoint) ++
      topic.map("topic" -> _)

  /** S2's explicit-offset form: the per-partition JSON the connector
    * parses for startingOffsets/endingOffsets —
    * `{"topic":{"0":42,"1":-1}}` (-2 = earliest, -1 = latest). This is
    * the reference's Redis offset hash (util/MyOffsetUtils.scala:20-63)
    * re-expressed as the connector's native reprocessing knob;
    * partitions are emitted in ascending order so the string is
    * deterministic. Topic names are validated against Kafka's own
    * legal charset ([a-zA-Z0-9._-], ≤249 chars) instead of being
    * JSON-escaped: a name Kafka itself would reject must fail here,
    * loudly, not be smuggled into the option string. */
  def offsetsJson(topic: String, partitionOffsets: Map[Int, Long]): String = {
    require(partitionOffsets.nonEmpty,
      s"offsetsJson($topic): empty partition map — the connector " +
        "rejects a topic key with no partitions")
    require(topic.nonEmpty && topic.length <= 249 &&
      topic.forall(c => c.isLetterOrDigit && c < 128 || c == '.' ||
        c == '_' || c == '-'),
      s"offsetsJson: '$topic' is not a legal Kafka topic name")
    partitionOffsets.toSeq.sortBy(_._1)
      .map { case (p, o) => s""""$p":$o""" }
      .mkString(s"""{"$topic":{""", ",", "}}")
  }

  /** The source projection applied to the connector's raw frame: key
    * and value arrive as BINARY and deserialize to UTF-8 strings here
    * (the reference's StringDeserializer consumer config,
    * util/MykafkaUtils.scala:70-78). Factored so KafkaConfigSpec can
    * pin the output schema against a frame with the connector's exact
    * raw schema. */
  private[graft] def sourceProjection(raw: DataFrame): DataFrame =
    raw.select(
      col("key").cast("string").as("key"),
      col("value").cast("string").as("value"),
      col("topic"), col("partition"), col("offset"),
      col("timestamp").as("kafka_ts"))

  private[graft] def batchProjection(raw: DataFrame): DataFrame =
    raw.select(col("key").cast("string"), col("value").cast("string"),
      col("topic"), col("partition"), col("offset"))

  /** S1/S2: value-bearing stream from a topic. */
  def readStream(spark: SparkSession, bootstrap: String, topic: String,
      startingOffsets: String = "latest"): DataFrame =
    sourceProjection(spark.readStream
      .format("kafka")
      .options(sourceOptions(bootstrap, topic, startingOffsets))
      .load())

  /** Batch twin of S1 (spark.read for reprocessing a bounded range). */
  def readBatch(spark: SparkSession, bootstrap: String, topic: String,
      startingOffsets: String = "earliest",
      endingOffsets: String = "latest"): DataFrame =
    batchProjection(spark.read
      .format("kafka")
      .options(batchOptions(bootstrap, topic, startingOffsets, endingOffsets))
      .load())

  /** S3/S4: produce `value` (+ optional `key` for hash partitioning; a
    * `topic` column routes rows dynamically — P10's DWD_<TABLE>_<op>). */
  def writeStream(df: DataFrame, bootstrap: String, checkpoint: String,
      topic: Option[String] = None,
      trigger: Trigger = Trigger.ProcessingTime("5 seconds")): DataStreamWriter[Row] =
    df.writeStream
      .format("kafka")
      .options(sinkOptions(bootstrap, checkpoint, topic))
      .trigger(trigger)
}
