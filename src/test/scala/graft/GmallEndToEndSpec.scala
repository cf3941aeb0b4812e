package graft

import graft.model._
import graft.operators.{CdcRouter, Gmall, LogFanout}
import graft.sinks.KeyedParquetSink
import org.apache.spark.sql.functions._

/** Full gmall-shaped fidelity run: raw log JSON + raw CDC JSON through
  * fan-out, routing, typed beans, dim enrichment, the order-wide join and
  * the idempotent serving sink — the reference's whole topology
  * (SURVEY.md §0 diagram) in one batch pass. */
class GmallEndToEndSpec extends SparkSpec {
  import spark.implicits._

  private def log(mid: String, uid: String, ar: String, ts: Long,
      lastPage: String = null) = {
    val lp = if (lastPage == null) "" else s""","last_page_id":"$lastPage""""
    s"""{"common":{"ar":"$ar","uid":"$uid","mid":"$mid","ch":"app","is_new":"0",
       |"md":"M1","os":"OS1","vc":"v1","ba":"B1"},
       |"page":{"page_id":"home","during_time":100$lp},"ts":$ts}"""
      .stripMargin.replaceAll("\n", "")
  }

  private def cdc(table: String, typ: String, dataJson: String, ts: Long = 1L) =
    s"""{"database":"gmall","table":"$table","type":"$typ","ts":$ts,"data":$dataJson}"""

  private val facts = Seq("order_info", "order_detail")
  private val dims = Seq("user_info", "base_province")
  // 2022-02-21 07:xx UTC
  private val t0 = 1645429200000L

  test("log -> fanout -> typed DAU pipeline with dim enrichment") {
    val rawLogs = Seq(
      log("mid1", "1", "11", t0),                    // session entry, first of day
      log("mid1", "1", "11", t0 + 1000),             // second entry, deduped
      log("mid1", "1", "11", t0 + 2000, "home"),     // not an entry (last_page set)
      log("mid2", "2", "12", t0 + 3000)).toDF("value")
    val rawCdc = Seq(
      cdc("user_info", "insert", """{"id":1,"gender":"F","birthday":"1990-06-15"}"""),
      cdc("user_info", "insert", """{"id":2,"gender":"M","birthday":"2000-01-01"}"""),
      cdc("base_province", "insert",
        """{"id":11,"name":"P11","iso_code":"ISO-11","iso_3166_2":"A-11","area_code":"110"}"""),
      cdc("base_province", "insert",
        """{"id":12,"name":"P12","iso_code":"ISO-12","iso_3166_2":"A-12","area_code":"120"}"""))
      .toDF("value")

    val pages = LogFanout.fanout(rawLogs)("page").as[PageLog]
    val dimRows = CdcRouter.route(rawCdc, facts, dims)("dim")
    val dau = Gmall.dauPipeline(pages,
      Gmall.parseUsers(dimRows), Gmall.parseProvinces(dimRows), "2022-02-21")
      .collect().sortBy(_.mid)

    assert(dau.map(_.mid).toSeq == Seq("mid1", "mid2")) // dedup kept one per mid/day
    val m1 = dau(0)
    assert(m1.user_gender == "F" && m1.user_age == 31L)
    assert(m1.province_name == "P11" && m1.province_iso_code == "ISO-11")
    assert(m1.dt == "2022-02-21" && m1.hr == "07")
    assert(dau(1).user_gender == "M" && dau(1).province_name == "P12")
  }

  test("dim miss degrades to null enrichment + age sentinel instead of crashing") {
    val rawLogs = Seq(log("mid9", "99", "77", t0)).toDF("value") // no dims loaded
    val pages = LogFanout.fanout(rawLogs)("page").as[PageLog]
    val empty = CdcRouter.route(Seq.empty[String].toDF("value"), facts, dims)("dim")
    val dau = Gmall.dauPipeline(pages,
      Gmall.parseUsers(empty), Gmall.parseProvinces(empty), "2022-02-21").collect()
    assert(dau.length == 1)
    assert(dau(0).user_gender == null && dau(0).province_name == null)
    assert(dau(0).user_age == -1L) // sentinel (reference NPEs here)
  }

  test("CDC -> fact route -> typed order-wide join -> idempotent serving sink") {
    val rawCdc = Seq(
      cdc("order_info", "insert",
        """{"id":100,"province_id":11,"order_status":"1001","user_id":1,
          |"total_amount":60.0,"create_time":"2022-02-21 07:10:00"}""".stripMargin.replaceAll("\n", "")),
      cdc("order_detail", "insert",
        """{"id":1000,"order_id":100,"sku_id":5,"order_price":20.0,"sku_num":2,
          |"sku_name":"widget","create_time":"2022-02-21 07:10:00",
          |"split_total_amount":40.0}""".stripMargin.replaceAll("\n", "")),
      cdc("order_detail", "insert",
        """{"id":1001,"order_id":100,"sku_id":6,"order_price":20.0,"sku_num":1,
          |"sku_name":"bolt","create_time":"2022-02-21 07:10:00",
          |"split_total_amount":20.0}""".stripMargin.replaceAll("\n", "")),
      cdc("user_info", "insert", """{"id":1,"gender":"F","birthday":"1990-06-15"}"""),
      cdc("base_province", "insert",
        """{"id":11,"name":"P11","iso_code":"ISO-11","iso_3166_2":"A-11","area_code":"110"}"""))
      .toDF("value")

    val routed = CdcRouter.route(rawCdc, facts, dims)
    val factRows = routed("fact")
    val info = factRows.filter(col("topic") === "DWD_ORDER_INFO_I")
      .select(from_json(col("value"), org.apache.spark.sql.types.StructType.fromDDL(
        "id LONG, province_id LONG, order_status STRING, user_id LONG, total_amount DOUBLE, create_time STRING")).as("d"))
      .select(col("d.*")).as[OrderInfo]
    val detail = factRows.filter(col("topic") === "DWD_ORDER_DETAIL_I")
      .select(from_json(col("value"), org.apache.spark.sql.types.StructType.fromDDL(
        "id LONG, order_id LONG, sku_id LONG, order_price DOUBLE, sku_num LONG, sku_name STRING, create_time STRING, split_total_amount DOUBLE")).as("d"))
      .select(col("d.*")).as[OrderDetail]

    val wide = Gmall.orderWidePipeline(info, detail,
      Gmall.parseUsers(routed("dim")), Gmall.parseProvinces(routed("dim")),
      "2022-02-21")
    val rows = wide.collect().sortBy(_.detail_id)
    assert(rows.length == 2) // 1:N join
    assert(rows.map(_.split_total_amount).sum == 60.0)
    assert(rows.forall(r => r.province_name == "P11" && r.user_gender == "F"
      && r.user_age == 31L && r.create_date == "2022-02-21" && r.create_hour == "07"))

    // serving sink: keyed by detail_id, replay is a no-op (ST8)
    val path = java.nio.file.Files.createTempDirectory("ow").toString + "/order_wide"
    val batch = wide.toDF().withColumn("ver", lit(1L))
    KeyedParquetSink.upsert(batch, path, Seq("detail_id"), "create_date", "ver")
    KeyedParquetSink.upsert(batch, path, Seq("detail_id"), "create_date", "ver")
    assert(spark.read.parquet(path).count() == 2)
  }

  test("dimTable keeps the newest version per key; a later tombstone drops the KEY") {
    val rawCdc = Seq(
      cdc("user_info", "insert", """{"id":1,"gender":"F","birthday":"1990-06-15"}""", ts = 1),
      cdc("user_info", "update", """{"id":1,"gender":"M","birthday":"1990-06-15"}""", ts = 2),
      cdc("user_info", "insert", """{"id":2,"gender":"F","birthday":"2000-01-01"}""", ts = 1),
      cdc("user_info", "delete", """{"id":2}""", ts = 2),
      // delete then RE-insert: the newer image must win back the key
      cdc("user_info", "insert", """{"id":3,"gender":"F","birthday":"1980-01-01"}""", ts = 1),
      cdc("user_info", "delete", """{"id":3}""", ts = 2),
      cdc("user_info", "insert", """{"id":3,"gender":"M","birthday":"1980-01-01"}""", ts = 3))
      .toDF("value")
    val users = Gmall.parseUsers(CdcRouter.route(rawCdc, facts, dims)("dim"))
      .select("id", "gender").as[(String, String)].collect().toMap
    assert(users == Map("1" -> "M", "3" -> "M"),
      s"latest-per-key with tombstone-drops-key expected, got $users")
  }
}
