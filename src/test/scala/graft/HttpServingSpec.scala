package graft

import java.net.{HttpURLConnection, URI}

import scala.io.Source

import graft.operators.Publisher
import graft.serving.Http

/** End-to-end HTTP serving: a real com.sun.net.httpserver bound to an
  * ephemeral port over the sf0.001 warehouse; both endpoints must return
  * the byte-exact JSON of the spec-proven Publisher payloads, and bad
  * requests must surface as 400s, not stack traces. */
class HttpServingSpec extends SparkSpec {

  private def get(url: String): (Int, String) = {
    val conn = URI.create(url).toURL.openConnection().asInstanceOf[HttpURLConnection]
    conn.setConnectTimeout(5000)
    conn.setReadTimeout(60000)
    val code = conn.getResponseCode
    val is = if (code >= 400) conn.getErrorStream else conn.getInputStream
    val body = Source.fromInputStream(is, "UTF-8").mkString
    is.close()
    (code, body)
  }

  test("both endpoints serve the Publisher payloads as JSON; bad params are 400s") {
    Graft.init(spark, sf0001)
    val srv = Http.start(spark, 0)
    try {
      val base = s"http://127.0.0.1:${srv.getAddress.getPort}"

      val (dc, dau) = get(s"$base/dauRealtime?td=2024-01-15")
      assert(dc == 200)
      assert(dau == Http.dauJson(Publisher.dauRealtimeSql(spark, "2024-01-15")))
      assert(dau.startsWith("""{"dauTotal":""") && dau.contains(""""dauTd":{"""))

      val (sc, stats) = get(s"$base/statsByItem?itemName=small+widget&t=segment")
      assert(sc == 200)
      assert(stats == Http.statsJson(
        Publisher.statsByItemSql(spark, Seq("small", "widget"), "segment")))
      assert(stats.startsWith("""[{"name":"""))

      assert(get(s"$base/dauRealtime")._1 == 400) // missing td
      assert(get(s"$base/dauRealtime?td=not-a-day")._1 == 400)
      assert(get(s"$base/statsByItem?itemName=small&t=bogus")._1 == 400)
      // SQL-injection-shaped token is rejected by the same require that
      // guards the programmatic twin
      assert(get(s"$base/statsByItem?itemName=x%27%3B%20DROP--&t=segment")._1 == 400)
      // a WELL-FORMED but impossible date passes the shape regex and
      // fails in LocalDate.parse — still a bad parameter, not a 500
      assert(get(s"$base/dauRealtime?td=2024-13-40")._1 == 400)
      // itemName decoding to only separators would otherwise build
      // WHERE-less SQL and surface as a parser 500
      assert(get(s"$base/statsByItem?itemName=%2B%2B&t=segment")._1 == 400)
      // read-only contract: a non-GET is refused BEFORE any Spark work
      val conn = URI.create(s"$base/dauRealtime?td=2024-01-15").toURL
        .openConnection().asInstanceOf[HttpURLConnection]
      conn.setRequestMethod("DELETE")
      assert(conn.getResponseCode == 405)
      conn.disconnect()
    } finally srv.stop(0)
  }

  test("json writer escapes quotes, backslashes and control chars") {
    assert(Http.jstr("a\"b\\c\nd") == "\"a\\\"b\\\\c\\u000ad\"")
  }

  /** Scheduler-pool soak: Spark's FairSchedulableBuilder creates a Pool
    * per unseen `spark.scheduler.pool` name and never removes it, so an
    * unbounded name scheme leaks one rootPool entry per request on a
    * long-lived server. Drive 10× poolThreads requests (concurrently,
    * so multiple executor threads actually serve) and assert the name
    * set Spark SAW stays bounded by the executor thread count. The
    * shared test session runs FIFO (scheduler.mode is a context-startup
    * config), so the observation point is the job-start properties —
    * the exact value FairSchedulableBuilder keys pools on — rather
    * than FAIR rootPool children. */
  test("pool-name soak: 10× poolThreads requests create ≤ poolThreads pool names") {
    Graft.init(spark, sf0001)
    val seen = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val p = js.properties.getProperty("spark.scheduler.pool")
        if (p != null && p.startsWith("req-")) seen.add(p): Unit
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val srv = Http.start(spark, 0)
    try {
      val base = s"http://127.0.0.1:${srv.getAddress.getPort}"
      get(s"$base/dauRealtime?td=2024-01-15") // warm plans/caches once
      val nReq = 10 * Http.poolThreads
      val clients = java.util.concurrent.Executors.newFixedThreadPool(8)
      try {
        val futs = (1 to nReq).map { _ =>
          clients.submit(new java.util.concurrent.Callable[Int] {
            override def call(): Int = get(s"$base/dauRealtime?td=2024-01-15")._1
          })
        }
        assert(futs.map(_.get()).forall(_ == 200))
      } finally clients.shutdown()
      org.apache.spark.graft.ListenerBusHook.drain(spark.sparkContext)
      assert(seen.size > 0, "soak must observe req- pool names on real jobs")
      assert(seen.size <= Http.poolThreads,
        s"pool-name set ${seen} exceeds the executor thread count " +
          s"${Http.poolThreads} — FAIR-mode rootPool would leak one Pool " +
          "per extra name for the server's lifetime")
      import scala.jdk.CollectionConverters._
      seen.asScala.foreach(n => assert(n.matches("req-\\d+"), s"odd pool name $n"))
    } finally {
      srv.stop(0)
      spark.sparkContext.removeSparkListener(listener)
    }
  }
}
