package graft

import graft.functions.TextOps
import org.apache.spark.sql.functions._

/** PII scrub (q80) redaction semantics on crafted strings — the cases
  * the fixture-suffix oracle can't exercise (multiple hits, partial
  * near-matches that must NOT redact, pattern interaction order). The
  * cross-engine parity of the patterns themselves is the driver's
  * DuckDB hash compare; this spec pins what "redacted" means. */
class PiiSpec extends SparkSpec {
  import spark.implicits._

  private def scrub(s: String): String =
    Seq(s).toDF("t").select(TextOps.scrubPii(col("t"))).as[String].head()

  test("each pattern class redacts, repeatedly, and tags are typed") {
    assert(scrub("mail a.b+c_d%e@sub.example.co and x@y.io now") ==
      "mail <EMAIL> and <EMAIL> now")
    assert(scrub("hosts 10.0.0.1 and 192.168.255.254 up") ==
      "hosts <IP> and <IP> up")
    assert(scrub("call +1 555-123-4567 or +49 171-234-5678") ==
      "call <PHONE> or <PHONE>")
  }

  test("near-misses survive: bare domains, over-long octet runs, local numbers") {
    // no local-part @: not an email; version strings with a 5th octet
    // keep their tail; phone without the +CC prefix is out of scope
    // (documented pattern contract, not an accident)
    assert(scrub("see example.com for 1.2.3.4.5 call 555-123-4567") ==
      "see example.com for <IP>.5 call 555-123-4567")
  }

  test("email pass runs before the IP pass so dotted hosts are consumed whole") {
    // a dotted-quad inside an email host is eaten by the email pass —
    // were the IP pass first it would leave "u@<IP>.example.com"
    assert(scrub("u@10.0.0.1.example.com then 10.0.0.1") == "<EMAIL> then <IP>")
    assert(scrub("u123@example.com ip 10.0.0.1") == "<EMAIL> ip <IP>")
  }

  test("scrubPii streams unchanged: the same column redacts a MemoryStream micro-batch") {
    // map-only → batch/stream unification is free; this pins it stays
    // that way (a stateful rewrite of scrubPii would break this test)
    implicit val sqlCtx = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
    val q = in.toDF().select(TextOps.scrubPii(col("value")).as("red"))
      .writeStream.format("memory").queryName("pii_out").outputMode("append").start()
    try {
      in.addData("a@b.io from 10.0.0.1", "clean row")
      q.processAllAvailable()
      val out = spark.table("pii_out").as[String].collect().sorted.toSeq
      assert(out == Seq("<EMAIL> from <IP>", "clean row"))
    } finally q.stop()
  }

  test("q80 over the fixtures: every row detects exactly one hit per class; prefix passes through") {
    val rows = TextOps.piiScrub(spark, sf0001)
    val n = rows.count()
    assert(n > 0)
    assert(rows.filter(col("n_emails") === 1 && col("n_ips") === 1 &&
      col("n_phones") === 1).count() == n,
      "the constructed suffix must contribute exactly one match per class on every row")
    val joined = Tables.t(spark, sf0001, "documents")
      .join(rows, "doc_id")
    assert(joined.filter(!col("redacted").startsWith(col("text"))).count() == 0,
      "original text must pass through byte-identical ahead of the redacted suffix")
    assert(joined.filter(!col("redacted")
      .endsWith("@example.com at <IP> or <PHONE>")).count() == n,
      "the email tag replaces the user@host pair, so no row may keep '@example.com'")
    assert(joined.filter(col("redacted").endsWith(" at <IP> or <PHONE>")).count() == n)
  }
}
