package graft.serving

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.SparkSession

import graft.operators.Publisher

/** The thin HTTP layer that closes the serving story: the reference
  * exposes its two analytics endpoints over REST
  * (publish-realtime/.../controller/publishController.java:26-47); the
  * engine side of those payloads lives in [[graft.operators.Publisher]]
  * (spec-proven against the SQL-first twins), and this binds them to a
  * port with the JDK's built-in server — zero dependencies, because the
  * serving layer's job here is routing + JSON, not a web framework.
  *
  *   GET /dauRealtime?td=2024-01-02
  *     → {"dauTotal":N,"dauTd":{"HH":n,…},"dauYd":{"HH":n,…}}
  *   GET /statsByItem?itemName=green+metallic&t=segment|band
  *     → [{"name":…,"value":…},…]
  *
  * Query execution is Spark-distributed; only the assembled ≤24-row
  * payload crosses the HTTP boundary. Bad parameters → 400 with a
  * plain-text reason; non-GET methods → 405 before any Spark work (the
  * reference leaves Spring's defaults; we make the contract explicit).
  * [[main]] starts the session with spark.scheduler.mode=FAIR and each
  * request runs in its own scheduler pool, so concurrent requests'
  * jobs interleave instead of FIFO head-of-line blocking — callers
  * passing their own session to [[start]] get the same behavior iff
  * their session enabled FAIR (Graft.localSession's knob). */
object Http {

  /** Minimal JSON writer — the payloads are flat maps/arrays of strings,
    * longs and doubles; doubles print via Double.toString (round-trips
    * exactly, matches the payload specs). */
  private[graft] def jstr(s: String): String = {
    val b = new StringBuilder("\"")
    s.foreach {
      case '"' => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case c if c < ' ' => b.append(f"\\u${c.toInt}%04x")
      case c => b.append(c)
    }
    b.append('"').toString
  }

  private def jmap(m: Map[String, Long]): String =
    m.toSeq.sorted.map { case (k, v) => s"${jstr(k)}:$v" }
      .mkString("{", ",", "}")

  private[graft] def dauJson(p: Publisher.DauRealtime): String =
    s"""{"dauTotal":${p.dauTotal},"dauTd":${jmap(p.dauTd)},"dauYd":${jmap(p.dauYd)}}"""

  private[graft] def statsJson(items: Seq[Publisher.StatItem]): String =
    items.map(i => s"""{"name":${jstr(i.name)},"value":${i.value}}""")
      .mkString("[", ",", "]")

  private def params(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getRawQuery).getOrElse("").split("&")
      .filter(_.contains("="))
      .map { kv =>
        val Array(k, v) = kv.split("=", 2)
        java.net.URLDecoder.decode(k, "UTF-8") ->
          java.net.URLDecoder.decode(v, "UTF-8")
      }.toMap

  private def respond(ex: HttpExchange, code: Int, body: String,
      ctype: String = "application/json"): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", ctype)
    ex.sendResponseHeaders(code, bytes.length)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }

  /** HTTP executor thread count — also bounds the scheduler-pool name
    * set (at most this many requests run concurrently). */
  private[graft] val poolThreads = 4

  /** Scheduler-pool name for the CURRENT handler thread. Keyed off the
    * thread id, not an arrival-sequence counter: the pool property is
    * per-thread anyway, the fixed executor has exactly [[poolThreads]]
    * threads for the server's lifetime (handle() lets ONLY non-SOE
    * VirtualMachineErrors escape — on those the JVM is dying anyway —
    * so no thread of a healthy server ever dies and gets
    * replaced), and two
    * CONCURRENT requests by definition run on distinct threads — so
    * the name set stays bounded by poolThreads AND concurrent requests
    * never share a pool. The previous `seq % poolThreads` scheme kept
    * the set bounded but could alias two concurrent requests into one
    * FIFO pool (arrival order ≠ thread occupancy); HttpServingSpec's
    * soak test pins both properties via job-start properties. */
  private[graft] def poolName(): String =
    s"req-${Thread.currentThread().getId}"

  private def handle(ex: HttpExchange, spark: SparkSession)(
      f: Map[String, String] => String): Unit =
    try {
      // read-only contract, enforced: a non-GET must not burn a
      // multi-second Spark job before being told no
      if (ex.getRequestMethod != "GET")
        respond(ex, 405, "method not allowed (read-only endpoint)", "text/plain")
      else {
        // per-request scheduler pool: under FAIR mode (Http.main turns
        // it on) concurrent requests' jobs interleave instead of
        // head-of-line blocking behind the slowest query — the pool
        // property is per-thread, cleared in finally because the HTTP
        // executor reuses threads across requests. Pool names come from
        // a BOUNDED set (one per executor thread): Spark's
        // FairSchedulableBuilder creates a Pool per unseen name and
        // never removes it, so unique per-request names would leak one
        // rootPool entry per request on a long-lived server. Distinct
        // names per CONCURRENT request is all fairness needs — see
        // poolName() for why thread-id keying gives exactly that.
        spark.sparkContext.setLocalProperty("spark.scheduler.pool", poolName())
        try respond(ex, 200, f(params(ex)))
        finally spark.sparkContext.setLocalProperty("spark.scheduler.pool", null)
      }
    } catch {
      // DateTimeException: a well-FORMED but invalid date (2024-13-40)
      // passes the shape regex and fails only in LocalDate.parse — still
      // a bad PARAMETER, not a server error
      case e @ (_: IllegalArgumentException | _: java.time.DateTimeException) =>
        safeRespond(ex, 400, Option(e.getMessage).getOrElse("bad request"))
      case e: InterruptedException =>
        // someone is shutting this thread down — restore the flag so the
        // pool sees it, and best-effort close the exchange via the 500
        Thread.currentThread().interrupt()
        safeRespond(ex, 500, "server shutting down")
      // VirtualMachineErrors OTHER than SOE (OOM, InternalError) mean
      // the JVM may be corrupted — propagate rather than keep a broken
      // server answering 500s. (The thread death does leak one
      // FAIR-scheduler rootPool entry via poolName()'s replacement
      // thread id, but the JVM is going down anyway.)
      case e: StackOverflowError =>
        // fully unwound by the time we are here — a per-request failure
        // (deep expression tree), not JVM corruption
        safeRespond(ex, 500, Option(e.getMessage).getOrElse("error"))
      case e: VirtualMachineError => throw e
      // Everything else — NonFatal AND the non-VM Errors (LinkageError,
      // ExceptionInInitializerError from a class whose static init
      // failed once) — is a per-request failure on an intact JVM.
      // Letting any of them kill the handler thread would mint a
      // replacement with a FRESH thread id, and every later request on
      // it registers a new FAIR-scheduler pool that
      // FairSchedulableBuilder never removes: one leaked rootPool entry
      // per death, unbounded if the error recurs per request — the
      // bounded-set invariant poolName() documents.
      case e: Throwable =>
        safeRespond(ex, 500, Option(e.getMessage).getOrElse("error"))
    }

  /** respond() for the error paths: a client that hung up mid-error
    * makes respond itself throw (broken pipe, or headers already sent by
    * the aborted 200) — from a catch clause that would escape handle()
    * and kill the handler thread, the exact leak the Throwable catch
    * above exists to prevent. Error responses are best-effort. */
  private def safeRespond(ex: HttpExchange, code: Int, body: String): Unit =
    // finally close(): if sendResponseHeaders itself throws (headers
    // already sent by an aborted 200), respond()'s own close never runs
    // and the connection would hang open until the client times out
    try respond(ex, code, body, "text/plain")
    catch { case _: Throwable => () }
    finally { try ex.close() catch { case _: Throwable => () } }

  private def need(p: Map[String, String], k: String): String =
    p.getOrElse(k, throw new IllegalArgumentException(s"missing param $k"))

  /** Start serving on `port` (0 = ephemeral; read the bound port off the
    * returned server). Assumes `Graft.init(spark, dir)` has registered
    * the views the SQL-first payload queries read. */
  def start(spark: SparkSession, port: Int): HttpServer = {
    val srv = HttpServer.create(new InetSocketAddress(port), 0)
    srv.createContext("/dauRealtime", (ex: HttpExchange) => handle(ex, spark) { p =>
      dauJson(Publisher.dauRealtimeSql(spark, need(p, "td")))
    })
    srv.createContext("/statsByItem", (ex: HttpExchange) => handle(ex, spark) { p =>
      // Publisher's own nonEmpty require covers every caller; splitting
      // here just turns the router's view of it into the same 400
      val toks = need(p, "itemName").split("[+ ]").filter(_.nonEmpty).toSeq
      statsJson(Publisher.statsByItemSql(spark, toks, need(p, "t")))
    })
    // small pool, not the serial default: the payload is tiny but each
    // request runs a multi-second Spark job — serial dispatch would
    // head-of-line-block every client behind the slowest query
    srv.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(poolThreads))
    srv.start()
    srv
  }

  /** Standalone serving entry: `runMain graft.serving.Http <sfDir> [port]`. */
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val port = args.lift(1).map(_.toInt).getOrElse(8070)
    // the ONE shared local-session recipe — a hand-rolled builder here
    // missed spark.sql.session.timeZone=UTC, so /dauRealtime's
    // day/hour bucketing depended on the host timezone (every other
    // main already goes through localSession for exactly this reason)
    val spark = graft.Graft.localSession(4, fairScheduler = true)
    graft.Graft.init(spark, dir)
    val srv = start(spark, port)
    println(s"[serve] listening on ${srv.getAddress}")
  }
}
