package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Input envelope schemas for the two reference streams (FIXTURES.md §1-2):
  * the nested behavior-log JSON (ref app/OdsBaseLogApp.scala:97-184) and
  * the Maxwell-style CDC JSON (ref app/OdsBaseDbApp.scala:100-128).
  *
  * Schemas are declared explicitly — never inferred on the hot path
  * (SURVEY.md §1.4). Malformed records surface as null structs
  * (PERMISSIVE), which the fan-out routes to the error sink rather than
  * crashing the stream.
  */
object Envelopes {

  val displaySchema: StructType = StructType(Seq(
    StructField("display_type", StringType),
    StructField("item", StringType),
    StructField("item_type", StringType),
    StructField("order", StringType),
    StructField("pos_id", StringType)))

  val actionSchema: StructType = StructType(Seq(
    StructField("action_id", StringType),
    StructField("item", StringType),
    StructField("item_type", StringType),
    StructField("ts", LongType)))

  /** Nested behavior-log envelope: common + optional page/start/err +
    * displays/actions arrays (ref app/OdsBaseLogApp.scala:97-184). */
  val logSchema: StructType = StructType(Seq(
    StructField("common", StructType(Seq(
      StructField("ar", StringType),   // → province_id
      StructField("ba", StringType),   // → brand
      StructField("ch", StringType),   // → channel
      StructField("is_new", StringType),
      StructField("md", StringType),   // → model
      StructField("mid", StringType),
      StructField("os", StringType),   // → operate_system
      StructField("uid", StringType),  // → user_id
      StructField("vc", StringType)))),// → version_code
    StructField("page", StructType(Seq(
      StructField("page_id", StringType),
      StructField("item", StringType),
      StructField("item_type", StringType),
      StructField("during_time", LongType),
      StructField("last_page_id", StringType),
      StructField("source_type", StringType)))),
    StructField("displays", ArrayType(displaySchema)),
    StructField("actions", ArrayType(actionSchema)),
    StructField("start", StructType(Seq(
      StructField("entry", StringType),
      StructField("open_ad_id", StringType),
      StructField("loading_time", LongType),
      StructField("open_ad_ms", LongType),
      StructField("open_ad_skip_ms", LongType)))),
    StructField("err", StructType(Seq(
      StructField("error_code", LongType),
      StructField("msg", StringType)))),
    StructField("ts", LongType)))

  /** Maxwell CDC envelope. `data` stays a raw JSON string (extracted with
    * get_json_object) so each routed table can apply its own schema
    * downstream — the reference keeps it dynamic the same way
    * (app/OdsBaseDbApp.scala:113-128). */
  val cdcMetaSchema: StructType = StructType(Seq(
    StructField("database", StringType),
    StructField("table", StringType),
    StructField("type", StringType),
    StructField("ts", LongType)))

  /** Parse a DataFrame with a string `value` column of behavior-log JSON.
    * Malformed documents land in `j._corrupt` (PERMISSIVE + corrupt-record
    * column) — without it, from_json yields an all-null struct and corrupt
    * rows would silently vanish from every output instead of reaching the
    * error sink. */
  def parseLog(raw: DataFrame, valueCol: String = "value"): DataFrame =
    raw.withColumn("j",
      from_json(col(valueCol), logSchema.add("_corrupt", StringType),
        Map("columnNameOfCorruptRecord" -> "_corrupt")))

  /** Parse a CDC stream: envelope meta + raw `data` JSON string + `id`
    * (the dim/fact primary key, extracted once for routing). The id is
    * pulled from the already-extracted `data` payload, not the full
    * envelope — `$.data.id` over the whole value re-parsed every record
    * a third time on the ingest hot path. */
  def parseCdc(raw: DataFrame, valueCol: String = "value"): DataFrame =
    raw
      // corrupt-record capture, same as parseLog: an unparseable
      // envelope yields an all-null meta struct, and without `_corrupt`
      // the record would silently vanish in decode()'s op filter
      // instead of reaching the error sink (CdcRouter.undecodable)
      .withColumn("m",
        from_json(col(valueCol), cdcMetaSchema.add("_corrupt", StringType),
          Map("columnNameOfCorruptRecord" -> "_corrupt")))
      .withColumn("data", get_json_object(col(valueCol), "$.data"))
      .select(
        col(valueCol),
        col("m.database").as("database"),
        col("m.table").as("table"),
        col("m.type").as("type"),
        col("m.ts").as("cdc_ts"),
        col("m._corrupt").as("_corrupt"),
        col("data"),
        get_json_object(col("data"), "$.id").as("id"))
}
