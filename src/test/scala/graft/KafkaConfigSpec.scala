package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.sources.Kafka

/** The Kafka plumbing gate this sandbox CAN run (no broker, no
  * connector jar): every option map, the explicit-offsets JSON, the
  * source projection's casts, and the writer's format/trigger wiring
  * are asserted EXACTLY, against the connector's documented option
  * keys. Kafka.scala routes all of its reader/writer configuration
  * through the same pure builders tested here, so a typo'd option key
  * (`startingOffets`, `boostrap.servers`, a missed `kafka.` prefix)
  * fails THIS suite instead of surviving to a real deployment — the
  * one residual risk VERDICT r12 named for the S1-S5 rows. */
class KafkaConfigSpec extends SparkSpec {

  test("S1/S2 source options: the connector's exact keys and values") {
    assert(Kafka.sourceOptions("h1:9092,h2:9092", "ODS_BASE_LOG", "earliest") ===
      Map(
        "kafka.bootstrap.servers" -> "h1:9092,h2:9092",
        "subscribe" -> "ODS_BASE_LOG",
        "startingOffsets" -> "earliest"))
  }

  test("batch options: streaming map plus the bounded range end") {
    val m = Kafka.batchOptions("b:9092", "t", "earliest", "latest")
    assert(m === Map(
      "kafka.bootstrap.servers" -> "b:9092",
      "subscribe" -> "t",
      "startingOffsets" -> "earliest",
      "endingOffsets" -> "latest"))
  }

  test("sink options: static topic present iff given") {
    assert(Kafka.sinkOptions("b:9092", "/ckpt/dwd", Some("DWD_PAGE_LOG")) ===
      Map("kafka.bootstrap.servers" -> "b:9092",
        "checkpointLocation" -> "/ckpt/dwd",
        "topic" -> "DWD_PAGE_LOG"))
    // dynamic routing (P10): no topic option — rows carry a topic column
    assert(Kafka.sinkOptions("b:9092", "/ckpt/dyn", None) ===
      Map("kafka.bootstrap.servers" -> "b:9092",
        "checkpointLocation" -> "/ckpt/dyn"))
  }

  test("offsetsJson: deterministic per-partition JSON with sentinels") {
    // partitions ascending regardless of map order; -1/-2 are the
    // connector's latest/earliest sentinels and must pass through
    assert(Kafka.offsetsJson("ODS_BASE_LOG", Map(3 -> -1L, 0 -> 42L, 1 -> -2L)) ===
      """{"ODS_BASE_LOG":{"0":42,"1":-2,"3":-1}}""")
    // the string must be real JSON, not JSON-shaped: machine-parse it
    val node = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(Kafka.offsetsJson("a.b-c_9", Map(0 -> 7L)))
    assert(node.get("a.b-c_9").get("0").asLong() === 7L)
  }

  test("offsetsJson refuses what Kafka itself would reject") {
    intercept[IllegalArgumentException](Kafka.offsetsJson("t", Map.empty))
    intercept[IllegalArgumentException](
      Kafka.offsetsJson("""bad"topic""", Map(0 -> 1L)))
    intercept[IllegalArgumentException](Kafka.offsetsJson("", Map(0 -> 1L)))
    intercept[IllegalArgumentException](
      Kafka.offsetsJson("x" * 250, Map(0 -> 1L)))
  }

  /** The connector's raw output schema, verbatim from the Kafka source
    * docs (key/value BINARY — the projection must deserialize). */
  private def rawKafkaFrame = {
    val schema = StructType(Seq(
      StructField("key", BinaryType),
      StructField("value", BinaryType),
      StructField("topic", StringType),
      StructField("partition", IntegerType),
      StructField("offset", LongType),
      StructField("timestamp", TimestampType),
      StructField("timestampType", IntegerType)))
    spark.createDataFrame(
      java.util.Arrays.asList(
        Row("k1".getBytes("UTF-8"), """{"mid":"m1"}""".getBytes("UTF-8"),
          "ODS_BASE_LOG", 0, 17L,
          java.sql.Timestamp.valueOf("2026-01-01 00:00:00"), 0)),
      schema)
  }

  test("source projection: binary key/value decode to UTF-8 strings") {
    val out = graft.sources.Kafka.sourceProjection(rawKafkaFrame)
    assert(out.schema.map(f => (f.name, f.dataType)) === Seq(
      ("key", StringType), ("value", StringType), ("topic", StringType),
      ("partition", IntegerType), ("offset", LongType),
      ("kafka_ts", TimestampType)))
    val r = out.collect()(0)
    assert(r.getString(0) === "k1")
    assert(r.getString(1) === """{"mid":"m1"}""")
    assert(r.getString(2) === "ODS_BASE_LOG" && r.getLong(4) === 17L)
  }

  test("batch projection drops the timestamp, keeps the offset triple") {
    val out = graft.sources.Kafka.batchProjection(rawKafkaFrame)
    assert(out.columns.toSeq === Seq("key", "value", "topic", "partition", "offset"))
    assert(out.collect()(0).getString(1) === """{"mid":"m1"}""")
  }

  /** Reflection into the classic DataStreamWriter's private wiring —
    * the ONLY way to see what .format/.options/.trigger actually set
    * without a broker to start the query against. Field names are
    * pinned to the repo's fixed Spark build (4.1.x); a Spark upgrade
    * that renames them fails this test loudly, which is the point. */
  private def writerInternals(w: org.apache.spark.sql.streaming.DataStreamWriter[Row])
      : (String, Trigger, Map[String, String]) = {
    def field(name: String): Any = {
      val f = w.getClass.getDeclaredField(name)
      f.setAccessible(true)
      f.get(w)
    }
    (field("source").asInstanceOf[String],
      field("trigger").asInstanceOf[Trigger],
      field("extraOptions").asInstanceOf[scala.collection.Map[String, String]]
        .toMap)
  }

  test("writeStream wires format=kafka, trigger, and the sink options") {
    // writeStream demands a STREAMING frame; the rate source gives one
    // without a broker (no query is ever started — the wiring is the
    // thing under test, and it is set before start())
    val df = spark.readStream.format("rate").load()
      .select(col("value").cast("string").as("key"),
        col("value").cast("string").as("value"))
    val (src, trig, opts) = writerInternals(
      Kafka.writeStream(df, "b:9092", "/ckpt/x", Some("T"),
        Trigger.ProcessingTime("5 seconds")))
    assert(src === "kafka")
    assert(trig === Trigger.ProcessingTime(5000L))
    // the writer stores options in a CaseInsensitiveMap (lowercased
    // keys) — compare case-folded, which is also the semantics the
    // connector resolves them with
    assert(opts.map { case (k, v) => k.toLowerCase -> v } ===
      Map("kafka.bootstrap.servers" -> "b:9092",
        "checkpointlocation" -> "/ckpt/x", "topic" -> "T"))
    // dynamic-topic form: no topic option reaches the writer
    val (_, _, dynOpts) = writerInternals(
      Kafka.writeStream(df.withColumn("topic", lit("DWD_X")), "b:9092", "/ckpt/y"))
    assert(!dynOpts.contains("topic"))
  }
}
