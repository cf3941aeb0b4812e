package graft

import graft.operators.LogFanout
import graft.sources.Envelopes

/** P1-P8 over FIXTURES.md §1-shaped JSON: err short-circuit, optional
  * page/start independence, array flatten incl. null/empty arrays,
  * malformed JSON routing, short→long field mapping. */
class LogFanoutSpec extends SparkSpec {
  import spark.implicits._

  private val full =
    """{"common":{"ar":"110000","uid":"42","os":"Android 11","ch":"xiaomi",
      |"is_new":"1","md":"Xiaomi 9","mid":"mid_001","vc":"v2.1.134","ba":"Xiaomi"},
      |"page":{"page_id":"good_detail","item":"35","item_type":"sku_id",
      |"during_time":12998,"last_page_id":"home","source_type":"promotion"},
      |"displays":[{"display_type":"promotion","item":"4","item_type":"sku_id",
      |"pos_id":"1","order":"1"},{"display_type":"query","item":"9",
      |"item_type":"sku_id","pos_id":"2","order":"2"}],
      |"actions":[{"action_id":"cart_add","item":"35","item_type":"sku_id",
      |"ts":1645429962261}],
      |"ts":1645429962000}""".stripMargin.replaceAll("\n", "")

  private val errRec =
    """{"common":{"mid":"mid_err"},"page":{"page_id":"home"},
      |"err":{"error_code":2633,"msg":"boom"},"ts":1}""".stripMargin.replaceAll("\n", "")

  private val startRec =
    """{"common":{"mid":"mid_s","uid":"7"},"start":{"entry":"icon",
      |"open_ad_id":"5","loading_time":7631,"open_ad_ms":283,
      |"open_ad_skip_ms":0},"ts":1645429962000}""".stripMargin.replaceAll("\n", "")

  private val pageOnly =
    """{"common":{"mid":"mid_p"},"page":{"page_id":"home","during_time":5},
      |"ts":2}""".stripMargin.replaceAll("\n", "")

  private val malformed = """{"common":{"""

  private def fan(rows: String*) =
    LogFanout.fanout(rows.toSeq.toDF("value"))

  test("err record routes whole to error output and nowhere else") {
    val f = fan(errRec)
    assert(f("error").as[String].collect().toSeq == Seq(errRec))
    assert(f("page").count() == 0)     // err short-circuits page extraction
    assert(f("start").count() == 0)
  }

  test("malformed JSON routes to error output, never crashes") {
    val f = fan(malformed, pageOnly)
    assert(f("error").as[String].collect().toSeq == Seq(malformed))
    assert(f("page").count() == 1)
  }

  test("page record maps short common keys to long names") {
    val p = fan(full)("page").collect()(0)
    assert(p.getAs[String]("province_id") == "110000")
    assert(p.getAs[String]("user_id") == "42")
    assert(p.getAs[String]("operate_system") == "Android 11")
    assert(p.getAs[String]("brand") == "Xiaomi")
    assert(p.getAs[String]("page_id") == "good_detail")
    assert(p.getAs[String]("last_page_id") == "home")
    assert(p.getAs[Long]("during_time") == 12998L)
    assert(p.getAs[String]("sourceType") == "promotion")
    assert(p.getAs[Long]("ts") == 1645429962000L)
  }

  test("displays flatten 1:N with parent fields replicated") {
    val d = fan(full)("display").collect()
    assert(d.length == 2)
    assert(d.map(_.getAs[String]("display_item")).sorted.toSeq == Seq("4", "9"))
    assert(d.forall(_.getAs[String]("mid") == "mid_001"))
    assert(d.forall(_.getAs[String]("page_id") == "good_detail"))
  }

  test("actions flatten carries element-level ts") {
    val a = fan(full)("action").collect()
    assert(a.length == 1)
    assert(a(0).getAs[Long]("action_ts") == 1645429962261L)
    assert(a(0).getAs[String]("action_id") == "cart_add")
  }

  test("page and start are independent optionals; empty arrays yield no rows") {
    val f = fan(startRec, pageOnly)
    assert(f("start").count() == 1)
    assert(f("page").count() == 1)   // pageOnly
    assert(f("display").count() == 0)
    assert(f("action").count() == 0)
    val s = f("start").collect()(0)
    assert(s.getAs[String]("entry") == "icon")
    assert(s.getAs[Long]("loading_time_ms") == 7631L)
  }

  test("every non-error input appears in exactly the expected outputs (partition property)") {
    val f = fan(full, errRec, startRec, pageOnly, malformed)
    assert(f("error").count() == 2)
    assert(f("page").count() == 2)
    assert(f("start").count() == 1)
    // parse branch: no row lost, no row duplicated across err/clean
    val parsed = Envelopes.parseLog(Seq(full, errRec, startRec, pageOnly, malformed).toDF("value"))
    assert(parsed.count() == 5)
  }
}
