package graft.operators

import graft.functions.Scalars
import graft.model._
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** The gmall-shaped typed pipelines — the reference's two DWD jobs
  * rebuilt on Dataset/DataFrame joins (SURVEY.md §3.1-3.2).
  *
  * Dim tables arrive as DataFrames with a JSON `value` per key (what
  * CdcRouter.dims emits / the reference stores in Redis,
  * app/OdsBaseDbApp.scala:121-139); the per-record Redis GETs
  * (app/DwdDauApp.scala:116-135, the reference's throughput bound) become
  * broadcast hash joins — zero per-row round trips at any scale.
  *
  * `asOf` replaces the reference's wall-clock LocalDate.now() age
  * (app/DwdDauApp.scala:125-127) for determinism.
  */
object Gmall {

  private val userSchema = "id STRING, gender STRING, birthday STRING"
  private val provinceSchema =
    "id STRING, name STRING, iso_code STRING, iso_3166_2 STRING, area_code STRING"

  /** Parse a dim route output (key `DIM:<TABLE>:<id>`, value JSON) into a
    * dim table with the given schema — LATEST version per key, exactly
    * the overwrite semantics of the reference's Redis SET per dim key:
    * newest cdc_ts wins (tombstone wins an equal-ts tie), and a winning
    * tombstone drops the KEY — not merely its own row, which was the
    * previous behavior's bug: a key's earlier upsert survived its later
    * delete, and repeated upserts of one key fanned out every broadcast
    * join against the dim. The window is keyed per dim id over a
    * dim-sized frame — no corpus-scaled cost. */
  def dimTable(dims: DataFrame, schema: String): DataFrame = {
    // the order must be TOTAL: Maxwell's ts is second-granular, so two
    // upserts of one key routinely tie on (cdc_ts, tombstone-flag) and
    // row_number would pick whichever row the shuffle surfaced first —
    // the served dim value could flip between a run and its replay. The
    // value tiebreak is arbitrary but DETERMINISTIC; a Kafka-sourced
    // deployment that needs true arrival order threads the offset
    // through dims()'s select and orders on it here instead.
    val newest = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key"))
      .orderBy(col("cdc_ts").desc_nulls_last,
        when(col("op") === "D", 1).otherwise(0).desc,
        col("value").desc_nulls_last)
    dims.withColumn("__rn", row_number().over(newest))
      .filter(col("__rn") === 1 && col("value").isNotNull)
      .select(from_json(col("value"),
        org.apache.spark.sql.types.StructType.fromDDL(schema)).as("d"))
      // a corrupt/truncated dim VALUE parses to an id-less struct (the
      // envelope was fine, so CdcRouter's quarantine never saw it):
      // unkeyable here too — dropping it beats serving an all-null
      // noise row that no join can ever hit
      .filter(col("d.id").isNotNull)
      .select(col("d.*"))
  }

  /** The two dim projections, ONE copy each (dauPipeline joins on the
    * dim's native string key; the order-wide beans carry long keys —
    * try_cast, because a non-numeric id from external CDC JSON under
    * ANSI mode would otherwise throw inside the broadcast build and
    * kill the pipeline; an uncastable id becomes a null key, which a
    * left join simply never matches). */
  private def userDim(users: DataFrame, longKey: Boolean): DataFrame =
    users.select(
      (if (longKey) expr("try_cast(id AS BIGINT)") else col("id")).as("user_id"),
      col("gender"), col("birthday"))

  private def provinceDim(provinces: DataFrame, longKey: Boolean): DataFrame =
    provinces.select(
      (if (longKey) expr("try_cast(id AS BIGINT)") else col("id")).as("province_id"),
      col("name"), col("iso_code"), col("iso_3166_2"), col("area_code"))

  /** Age with the dim-miss/dim-junk degrade: try_cast, NOT cast — under
    * ANSI (Spark 4's default) a malformed birthday string from the CDC
    * payload would throw mid-batch, the exact crash the -1 sentinel
    * exists to prevent; try_cast folds "unparseable" into the same
    * degrade path as "missing". */
  private def ageOrSentinel(asOf: String) =
    coalesce(Scalars.ageAt(expr("try_cast(birthday AS DATE)"),
      lit(asOf).cast("date")), lit(-1L)).as("user_age")

  /** DwdDauApp twin: session-entry filter (P11) → first-visit-per-day
    * dedup (A6 batch twin) → user/province broadcast enrichment (J1) →
    * dt/hr derivation (F1/F2). */
  def dauPipeline(pages: Dataset[PageLog], users: DataFrame,
      provinces: DataFrame, asOf: String): Dataset[DauInfo] = {
    import pages.sparkSession.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("mid"), col("dt"))
      .orderBy(col("ts"), col("page_id")) // page_id tiebreak: same-ms events stay deterministic
    pages.toDF()
      .filter(col("last_page_id").isNull) // P11: session entries only (codegen'd, no deserialization)
      .withColumn("dt", Scalars.millisToDate(col("ts")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .join(broadcast(userDim(users, longKey = false)), Seq("user_id"), "left")
      .join(broadcast(provinceDim(provinces, longKey = false)),
        Seq("province_id"), "left")
      .select(
        col("mid"), col("user_id"), col("province_id"), col("channel"),
        col("is_new"), col("model"), col("operate_system"), col("version_code"),
        col("brand"), col("page_id"), col("page_item"), col("page_item_type"),
        col("during_time"), col("sourceType"), col("ts"),
        col("gender").as("user_gender"),
        // -1 sentinel on dim miss: the reference NPEs here (SURVEY J1
        // "inner-join semantics with NPE on miss"); we degrade instead of
        // crashing the non-nullable bean encoder
        ageOrSentinel(asOf),
        col("name").as("province_name"),
        col("iso_code").as("province_iso_code"),
        col("iso_3166_2").as("province_3166_2"),
        col("area_code").as("province_area_code"),
        col("dt"), Scalars.millisToHour(col("ts")).as("hr"))
      .as[DauInfo]
  }

  /** Dim enrichment + F3 date/hour split over an already-joined
    * info⋈detail frame — ONE builder shared by the batch pipeline below
    * and the streaming topology's foreachBatch (GmallEndToEndSpec's
    * composed run), so the two paths cannot drift. Input must carry the
    * join-output columns (detail_id, order_id, the info/detail fields). */
  private[graft] def enrichOrderWide(joined: DataFrame, users: DataFrame,
      provinces: DataFrame, asOf: String): Dataset[OrderWide] = {
    import joined.sparkSession.implicits._
    joined
      .join(broadcast(userDim(users, longKey = true)), Seq("user_id"), "left")
      .join(broadcast(provinceDim(provinces, longKey = true)),
        Seq("province_id"), "left")
      .select(
        col("detail_id"), col("order_id"), col("sku_id"), col("order_price"),
        col("sku_num"), col("sku_name"), col("split_total_amount"),
        col("province_id"), col("order_status"), col("user_id"),
        col("total_amount"), col("create_time"),
        Scalars.splitDate(col("create_time")).as("create_date"),
        Scalars.splitHour(col("create_time")).as("create_hour"),
        col("name").as("province_name"),
        col("iso_code").as("province_iso_code"),
        col("iso_3166_2").as("province_3166_2"),
        col("area_code").as("province_area_code"),
        col("gender").as("user_gender"),
        ageOrSentinel(asOf)) // -1 on dim miss/junk, see dauPipeline
      .as[OrderWide]
  }

  /** DwdOrderApp twin (batch): order_info ⋈ order_detail on order id
    * (J2/J3), dim enrichment, F3 date/hour split. The streaming twin is
    * Streams.orderWideJoin + [[enrichOrderWide]] per batch. */
  def orderWidePipeline(info: Dataset[OrderInfo], detail: Dataset[OrderDetail],
      users: DataFrame, provinces: DataFrame, asOf: String): Dataset[OrderWide] = {
    val joined = detail.toDF()
      .withColumnRenamed("id", "detail_id")
      .withColumnRenamed("create_time", "detail_create_time")
      .join(info.toDF().withColumnRenamed("id", "order_id"), Seq("order_id"))
    enrichOrderWide(joined, users, provinces, asOf)
  }

  def parseUsers(dims: DataFrame): DataFrame = dimTable(
    dims.filter(col("key").startsWith("DIM:USER_INFO:")), userSchema)

  def parseProvinces(dims: DataFrame): DataFrame = dimTable(
    dims.filter(col("key").startsWith("DIM:BASE_PROVINCE:")), provinceSchema)
}
