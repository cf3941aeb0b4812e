package graft

import graft.operators.CdcRouter

/** P9-P10: intended op mapping (incl. the delete the reference drops via
  * its duplicate-case bug, app/OdsBaseDbApp.scala:105), fact/dim routing,
  * dynamic topic/key construction, tombstones. */
class CdcRouterSpec extends SparkSpec {
  import spark.implicits._

  private def cdc(table: String, typ: String, id: Int, extra: String = "") =
    s"""{"database":"gmall","table":"$table","type":"$typ","ts":1645434731,
       |"data":{"id":$id$extra}}""".stripMargin.replaceAll("\n", "")

  private val facts = Seq("order_info", "order_detail")
  private val dims = Seq("user_info", "base_province")

  test("op decode: bootstrap-insert/insert→I, update→U, delete→D, other dropped") {
    val raw = Seq(
      cdc("order_info", "insert", 1),
      cdc("order_info", "bootstrap-insert", 2),
      cdc("order_info", "update", 3),
      cdc("order_info", "delete", 4),
      cdc("order_info", "truncate", 5)).toDF("value")
    val decoded = CdcRouter.decode(graft.sources.Envelopes.parseCdc(raw))
    val ops = decoded.select("id", "op").as[(String, String)].collect().toMap
    assert(ops == Map("1" -> "I", "2" -> "I", "3" -> "U", "4" -> "D"))
  }

  test("fact route builds DWD_<TABLE>_<op> topics; dim tables excluded") {
    val raw = Seq(
      cdc("order_info", "insert", 10, ""","user_id":42"""),
      cdc("user_info", "insert", 42)).toDF("value")
    val r = CdcRouter.route(raw, facts, dims)
    val f = r("fact").collect()
    assert(f.length == 1)
    assert(f(0).getAs[String]("topic") == "DWD_ORDER_INFO_I")
    assert(f(0).getAs[String]("key") == "10")
    assert(f(0).getAs[String]("value").contains("\"user_id\""))
  }

  test("dim route builds DIM:<TABLE>:<id> keys; delete becomes tombstone") {
    val raw = Seq(
      cdc("user_info", "insert", 42, ""","gender":"F""""),
      cdc("user_info", "delete", 43),
      cdc("order_info", "insert", 1)).toDF("value")
    val d = CdcRouter.route(raw, facts, dims)("dim").collect()
    assert(d.length == 2)
    val byKey = d.map(r => r.getAs[String]("key") -> r.getAs[String]("value")).toMap
    assert(byKey("DIM:USER_INFO:42").contains("\"gender\""))
    assert(byKey("DIM:USER_INFO:43") == null) // tombstone, not dropped
  }

  test("malformed CDC JSON and missing type are dropped, not crashed on") {
    val raw = Seq(
      """{"table": "order_info""",                         // truncated
      """{"database":"g","table":"order_info","ts":1}""",  // no type
      cdc("order_info", "insert", 7)).toDF("value")
    val r = CdcRouter.route(raw, facts, dims)
    assert(r("fact").count() == 1) // only the well-formed insert routes
  }

  test("tables in neither list are dropped") {
    val raw = Seq(cdc("spu_info", "insert", 9)).toDF("value")
    val r = CdcRouter.route(raw, facts, dims)
    assert(r("fact").count() == 0 && r("dim").count() == 0)
  }
}
