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

  test("tables in neither list are quarantined to the error route, never dropped") {
    val row = cdc("spu_info", "insert", 9)
    val raw = Seq(row).toDF("value")
    val r = CdcRouter.route(raw, facts, dims)
    assert(r("fact").count() == 0 && r("dim").count() == 0)
    // a new table emitting before the config catches up must be
    // recoverable — once the batch commits, a dropped row is gone
    assert(r("error").as[String].collect().toSeq == Seq(row))
  }

  test("corrupt and unknown-type envelopes reach the error sink, not the void") {
    val junk = """{"database":"gmall","table":"order_in""" // truncated JSON
    val raw = Seq(
      cdc("order_info", "insert", 1),
      cdc("order_info", "truncate", 2), // valid JSON, unknown CDC type
      junk).toDF("value")
    val parsed = graft.sources.Envelopes.parseCdc(raw)
    val errs = CdcRouter.undecodable(parsed).as[String].collect().toSet
    assert(errs == Set(cdc("order_info", "truncate", 2), junk),
      s"exactly the undecodable envelopes must be quarantined, got $errs")
    // partition property: decodable ∪ undecodable == every input row
    assert(CdcRouter.decode(parsed).count() + errs.size == 3)
  }

  test("partially-corrupt envelope (valid type, bad ts) routes ONLY to the error sink") {
    // PERMISSIVE from_json sets _corrupt on the non-numeric ts while
    // still extracting table/type — without decode()'s _corrupt filter
    // this row lands in BOTH the fact route and the quarantine, and a
    // quarantine-replay workflow double-applies the op.
    val torn =
      """{"database":"gmall","table":"order_info","type":"insert","ts":"not-a-number","data":{"id":5}}"""
    val raw = Seq(cdc("order_info", "insert", 1), torn).toDF("value")
    val parsed = graft.sources.Envelopes.parseCdc(raw)
    val decoded = CdcRouter.decode(parsed)
    val errs = CdcRouter.undecodable(parsed).as[String].collect().toSet
    assert(errs == Set(torn), s"torn envelope must be quarantined, got $errs")
    assert(decoded.count() == 1, "torn envelope must NOT also decode")
    assert(decoded.select("id").as[String].collect().toSeq == Seq("1"))
    // still an exact partition
    assert(decoded.count() + errs.size == 2)
  }

  test("dim row without an extractable id is quarantined to the error route, not silently dropped") {
    val noId = """{"database":"gmall","table":"user_info","type":"insert",""" +
      """"ts":1645434731,"data":{"name":"composite-key row"}}"""
    val raw = Seq(cdc("user_info", "insert", 7), noId).toDF("value")
    val r = CdcRouter.route(raw, facts, dims)
    // the keyed dim route carries only the keyable row
    val dimKeys = r("dim").select("key").as[String].collect()
    assert(dimKeys.toSeq == Seq("DIM:USER_INFO:7"))
    // the unkeyable one reaches the error output whole — nothing vanishes
    val errs = r("error").as[String].collect()
    assert(errs.contains(noId))
    assert(r("dim").count() + r("error").count() == 2)
  }

  test("cdc writer pins its batch's config: replay ignores a hot config change") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("cdc_pin").toString
    def setConf(kind: String): Unit =
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$dir/conf.csv"), s"order_info,$kind\n")
    setConf("fact")
    val batch = Seq(cdc("order_info", "insert", 7)).toDF("value")
    val w = streaming.Streams.cdcRouteBatchWriter(s"$dir/conf.csv", s"$dir/out") _
    w(batch, 0L)
    assert(spark.read.parquet(s"$dir/out/fact/batch=0").count() == 1)
    // the config moves the table across kinds while the query is down;
    // the REPLAY of batch 0 must keep the pinned old routing — without
    // the pin, fact no-ops on its marker and dim recomputes under the
    // new config: the same rows in BOTH sinks
    setConf("dim")
    w(batch, 0L)
    assert(!sinks.Hfs.exists(spark, s"$dir/out/dim/batch=0"),
      "replayed batch must not re-route under the new config")
    // the NEXT batch picks up the new config (hot reload still works)
    w(batch, 1L)
    assert(spark.read.parquet(s"$dir/out/dim/batch=1").count() == 1)
    assert(!sinks.Hfs.exists(spark, s"$dir/out/fact/batch=1"))
  }

  test("cdc writer trims config whitespace and fails loudly on unknown kinds") {
    val dir = java.nio.file.Files.createTempDirectory("cdc_conf").toString
    val batch = Seq(cdc("order_info", "insert", 8)).toDF("value")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/conf.csv"), "order_info, Fact\n")
    streaming.Streams.cdcRouteBatchWriter(s"$dir/conf.csv", s"$dir/out")(batch, 0L)
    assert(spark.read.parquet(s"$dir/out/fact/batch=0").count() == 1,
      "' Fact' must route after trim + case-normalization")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/conf.csv"), "order_info,fct\n")
    val e = intercept[IllegalArgumentException] {
      streaming.Streams.cdcRouteBatchWriter(s"$dir/conf.csv", s"$dir/out2")(batch, 0L)
    }
    assert(e.getMessage.contains("fct"),
      "a typo'd kind silently unrouting a table would be CDC data loss")
  }

  test("cdc writer fails loudly on a table listed with BOTH kinds (double-publish)") {
    val dir = java.nio.file.Files.createTempDirectory("cdc_dup").toString
    val batch = Seq(cdc("order_info", "insert", 9)).toDF("value")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/conf.csv"),
      "order_info,fact\norder_info,dim\n")
    val e = intercept[IllegalArgumentException] {
      streaming.Streams.cdcRouteBatchWriter(s"$dir/conf.csv", s"$dir/out")(batch, 0L)
    }
    assert(e.getMessage.contains("order_info"),
      "a fact+dim double listing silently double-processed every row")
  }

  test("config pin round-trips a table name containing a comma") {
    // name,kind pin encoding truncated `a,b` at the first comma and the
    // mangled kind matched neither route — the exact data-loss mode the
    // pin exists to prevent; kind-first encoding makes names comma-safe
    val dir = java.nio.file.Files.createTempDirectory("cdc_comma").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/conf.csv"), "\"weird,name\",fact\n")
    val batch = Seq(cdc("weird,name", "insert", 3)).toDF("value")
    val w = streaming.Streams.cdcRouteBatchWriter(s"$dir/conf.csv", s"$dir/out") _
    w(batch, 0L)
    assert(spark.read.parquet(s"$dir/out/fact/batch=0").count() == 1,
      "comma-named table must route on the fresh path")
    // force the REPLAY path: delete the fact segment but keep the pin;
    // the pinned config must still route the comma-named table
    sinks.Hfs.deleteRecursive(spark, s"$dir/out/fact/batch=0")
    w(batch, 0L)
    assert(spark.read.parquet(s"$dir/out/fact/batch=0").count() == 1,
      "comma-named table must survive the pin round-trip on replay")
  }

  test("a foreign/legacy pin fails loudly instead of silently unrouting") {
    // a pin this writer wrote always decodes kind-first to fact/dim; a
    // legacy name-first pin (`order_info,fact`) or corrupt bytes decode
    // to a kind matching neither route — tolerating that silently
    // unroutes EVERY table on replay, the exact CDC data loss the pin
    // exists to prevent
    val dir = java.nio.file.Files.createTempDirectory("cdc_foreign").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/conf.csv"), "order_info,fact\n")
    val batch = Seq(cdc("order_info", "insert", 5)).toDF("value")
    sinks.Hfs.writeString(spark, s"$dir/out/__config/batch=0", "order_info,fact")
    val e = intercept[IllegalArgumentException] {
      streaming.Streams.cdcRouteBatchWriter(s"$dir/conf.csv", s"$dir/out")(batch, 0L)
    }
    assert(e.getMessage.contains("order_info"),
      "the offending pin line must be named in the failure")
    assert(!sinks.Hfs.exists(spark, s"$dir/out/fact/batch=0") &&
      !sinks.Hfs.exists(spark, s"$dir/out/dim/batch=0"),
      "no output may be published under an unreadable pin")
  }

  test("config with a newline-bearing table name fails loudly at pin time") {
    val dir = java.nio.file.Files.createTempDirectory("cdc_nl").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/conf.csv"), "\"bad\nname\",fact\n")
    val batch = Seq(cdc("order_info", "insert", 4)).toDF("value")
    // line-split CSV tears the quoted name into two rows (one with a
    // blank kind), so either the unknown-kind require or the newline
    // guard fires — what matters is that it fails LOUDLY instead of
    // pinning a config that silently unroutes the table on replay
    intercept[IllegalArgumentException] {
      streaming.Streams.cdcRouteBatchWriter(s"$dir/conf.csv", s"$dir/out")(batch, 0L)
    }
    ()
  }
}
