package graft.streaming

import graft.operators.LogFanout
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming twins of the batch operators (SURVEY.md §2.8).
  * Each takes/returns DataFrames so tests can drive them with
  * MemoryStream (no Kafka broker in this environment; the Kafka
  * source/sink differs only in `.format("kafka")` options).
  *
  * What the reference hand-rolls with Redis becomes engine state:
  * - offsets (ST2, util/MyOffsetUtils.scala) → checkpoint WAL, free;
  * - DAU dedup set w/ intended-24h TTL (ST5, app/DwdDauApp.scala:83-100)
  *   → watermark + dropDuplicates (state actually expires, unlike the
  *   reference's unexpiring Redis set);
  * - cross-batch join cache w/ 24h setex (ST4, app/DwdOrderApp.scala:
  *   185-231) → watermarked stream-stream inner join, state store TTL =
  *   watermark delay.
  */
object Streams {

  /** A6/ST5: exactly-once admission of the first event per (mid, dt).
    * Input needs event-time `ts` (timestamp) and key `mid`. State is
    * dropped once the watermark passes dt+delay — the 24h TTL the
    * reference intended but never set. */
  def dauDedup(pageLogs: DataFrame, delay: String = "24 hours"): DataFrame =
    pageLogs
      .withColumn("dt", to_date(col("ts")))
      .withWatermark("ts", delay)
      .dropDuplicates("mid", "dt")

  /** J2/ST4: order_info ⋈ order_detail where sides may arrive up to
    * `delay` apart — inner 1:N join on order_id, state bounded by
    * watermarks on both sides (the reference's 24h Redis setex,
    * app/DwdOrderApp.scala:203-230, with correct expiry). Both inputs
    * need an event-time `ts` column. */
  def orderWideJoin(info: DataFrame, detail: DataFrame,
      delay: String = "24 hours"): DataFrame = {
    val i = info
      .withColumnRenamed("order_id", "info_order_id")
      .withColumnRenamed("ts", "info_ts")
      .withWatermark("info_ts", delay)
    val d = detail
      .withColumnRenamed("order_id", "detail_order_id")
      .withColumnRenamed("ts", "detail_ts")
      .withWatermark("detail_ts", delay)
    i.join(d,
      expr(s"""info_order_id = detail_order_id AND
               detail_ts BETWEEN info_ts - INTERVAL '$delay'
                             AND info_ts + INTERVAL '$delay'"""))
  }

  /** ST7 upgrade: tumbling event-time window aggregation with watermark
    * (the reference only group-bys a derived `hr` string, no lateness
    * handling). Same buckets as Relational.windowedAgg's date_trunc. */
  def hourlyAgg(events: DataFrame, delay: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("event_type"), col("n"), col("total_value"))

  /** ST10/P10: CDC routing with per-batch config refresh — the fact/dim
    * table lists are re-read from `configPath` on EVERY micro-batch (the
    * reference re-reads Redis sets each batch, app/OdsBaseDbApp.scala:
    * 80-93), so routing reconfigures hot without restarting the query.
    * Config file: one CSV line per table, `name,kind` with kind ∈
    * {fact, dim}. */
  def cdcRouteBatchWriter(configPath: String, outDir: String)
      (batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val conf = spark.read.schema("name STRING, kind STRING").csv(configPath)
      .collect().map(r => r.getString(0) -> r.getString(1))
    val facts = conf.collect { case (n, "fact") => n }.toSeq
    val dims = conf.collect { case (n, "dim") => n }.toSeq
    val routed = graft.operators.CdcRouter.route(batch, facts, dims)
    routed("fact").write.mode("append").parquet(s"$outDir/fact")
    routed("dim").write.mode("append").parquet(s"$outDir/dim")
  }

  /** P6/S3: the 5-way fan-out as a single foreachBatch — one parse, one
    * persist, five filtered sinks; per-sink parquet dirs play the five
    * Kafka topics. Idempotent per epoch (overwrite by batch id would be
    * the exactly-once upgrade; tests use append + dedup-by-key). */
  def fanoutBatchWriter(outDir: String)(batch: DataFrame, batchId: Long): Unit = {
    val parsed = graft.sources.Envelopes.parseLog(batch).persist()
    try {
      LogFanout.errors(parsed).write.mode("append").parquet(s"$outDir/error")
      LogFanout.pages(parsed).write.mode("append").parquet(s"$outDir/page")
      LogFanout.displays(parsed).write.mode("append").parquet(s"$outDir/display")
      LogFanout.actions(parsed).write.mode("append").parquet(s"$outDir/action")
      LogFanout.starts(parsed).write.mode("append").parquet(s"$outDir/start")
    } finally parsed.unpersist()
  }
}
