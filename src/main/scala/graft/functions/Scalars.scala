package graft.functions

import graft.Tables.t
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar-function surface (SURVEY.md §2.3 F1-F8). The reference's
  * versions are inline lambdas; ours are Column builders over codegen'd
  * built-ins. The two non-obvious ones:
  *
  * - ageAt (F4): the reference uses Period.between(birthday,
  *   LocalDate.now()) — wall-clock-dependent, so untestable
  *   (app/DwdOrderApp.scala:112-115). Ours takes an explicit `asOf` and
  *   computes calendar age via year/month/day comparison, exactly
  *   reproducible in ANSI SQL.
  * - genderLabel (F7): the reference maps F/M/other to labels with a slur
  *   for the default branch (PublisherServiceImpl.java:49); we keep the
  *   F/M labels and use a neutral default.
  */
object Scalars {

  type Q = (SparkSession, String) => DataFrame

  /** F1: epoch millis → 'yyyy-MM-dd'. */
  def millisToDate(ms: Column): Column =
    date_format(timestamp_millis(ms), "yyyy-MM-dd")

  /** F2: epoch millis → zero-padded hour 'HH'. */
  def millisToHour(ms: Column): Column =
    date_format(timestamp_millis(ms), "HH")

  /** F3: 'yyyy-MM-dd HH:mm:ss' string → (date, hour) columns. */
  def splitDate(dtStr: Column): Column = substring(dtStr, 1, 10)
  def splitHour(dtStr: Column): Column = substring(dtStr, 12, 2)

  /** F4: calendar age at `asOf` (deterministic; see header). A birth
    * date AFTER asOf has no calendar age — NULL, not a negative count:
    * the raw subtraction yields values like -1 that collide with
    * callers' dim-miss sentinels (Gmall.ageOrSentinel folds exactly
    * this NULL into its -1 degrade path), and arbitrary negatives would
    * leak junk CDC birthdays past that contract. */
  def ageAt(birth: Column, asOf: Column): Column =
    when(birth > asOf, lit(null).cast("long"))
      .otherwise((year(asOf) - year(birth) -
        when(month(birth) > month(asOf) ||
          (month(birth) === month(asOf) && dayofmonth(birth) > dayofmonth(asOf)), 1)
          .otherwise(0)).cast("long")) // long: DuckDB year() arithmetic is BIGINT

  /** F7: gender code decode with neutral default. */
  def genderLabel(g: Column): Column =
    when(g === "F", "female").when(g === "M", "male").otherwise("other")

  /** md5 hex of raw bytes — the ONE copy (the media stub and the real
    * image decoder must stay checksum-compatible by contract, and the
    * bucketed-table partition fragments hash with it too; three inline
    * restatements were the drift risk). */
  private[graft] def md5Hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(bytes).map("%02x".format(_)).mkString

  /** F8: row → JSON string payload (fastjson toJSONString twin). */
  def toJsonPayload(cols: Column*): Column = to_json(struct(cols: _*))

  /** F4 over the fixtures: order "age" in whole years at a fixed asOf,
    * grouped — exercises the calendar-boundary arithmetic end-to-end. */
  val orderAge: Q = (s, d) =>
    t(s, d, "orders")
      .withColumn("age_years", ageAt(col("o_orderdate"), lit("2024-06-01").cast("date")))
      .groupBy(col("age_years"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("total_price"))

  /** F1/F2/F8 round-trip: timestamps → epoch millis → derived dt/hr plus
    * a JSON payload of the row (P2's inverse). */
  val epochRoundtrip: Q = (s, d) =>
    t(s, d, "events")
      .filter(col("event_id") < 100)
      .withColumn("ms", unix_millis(col("ts")))
      .select(
        col("event_id"),
        millisToDate(col("ms")).as("dt"),
        millisToHour(col("ms")).as("hr"),
        toJsonPayload(col("event_id"), col("event_type")).as("payload"))

  val queries: Map[String, Q] = Map(
    "q32_order_age" -> orderAge,
    "q33_epoch_roundtrip" -> epochRoundtrip,
  )

  val oracles: Map[String, String] = Map(
    // the future-date NULL branch mirrors ageAt structurally; no
    // fixture order post-dates 2024, so content is unchanged
    "q32_order_age" ->
      """SELECT CASE WHEN o_orderdate > DATE '2024-06-01' THEN NULL
        | ELSE year(DATE '2024-06-01') - year(o_orderdate)
        |  - CASE WHEN month(o_orderdate) > month(DATE '2024-06-01')
        |          OR (month(o_orderdate) = month(DATE '2024-06-01')
        |              AND day(o_orderdate) > day(DATE '2024-06-01'))
        |         THEN 1 ELSE 0 END END AS age_years,
        | count(*) AS n_orders, round(sum(o_totalprice),2) AS total_price
        |FROM orders GROUP BY 1""".stripMargin,
    // payload via to_json, not raw concatenation: a quote/backslash in
    // event_type must escape exactly as Spark's to_json does, and a
    // NULL event_type is OMITTED from the object (to_json's rule),
    // not turned into a NULL payload by || propagation
    "q33_epoch_roundtrip" ->
      """SELECT event_id,
        | strftime(epoch_ms(CAST(epoch_ms(ts) AS BIGINT)), '%Y-%m-%d') AS dt,
        | strftime(epoch_ms(CAST(epoch_ms(ts) AS BIGINT)), '%H') AS hr,
        | CASE WHEN event_type IS NULL
        |   THEN '{"event_id":' || event_id || '}'
        |   ELSE '{"event_id":' || event_id || ',"event_type":'
        |     || to_json(event_type) || '}' END AS payload
        |FROM events WHERE event_id < 100""".stripMargin,
  )
}
