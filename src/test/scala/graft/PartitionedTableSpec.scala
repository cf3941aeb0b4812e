package graft

import graft.operators.Bucketing
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The range-partitioned composition of the bucketed lifecycle: one
  * lifecycle per partition value, folds scoped to partitions with live
  * deltas, frozen partitions byte-untouched. */
class PartitionedTableSpec extends SparkSpec {
  import spark.implicits._

  private def rows(part: String, from: Long, until: Long): DataFrame =
    (from until until).map(i => (i, part, s"p$i")).toDF("k", "pt", "payload")

  /** MULTISET of the snapshot (sorted seq, not a set): the lifecycle
    * contract is "no row lost, none read TWICE" — a set compare would
    * silently absorb a double-read regression. */
  private def content(loc: String, base: String): Seq[(Long, String, String)] =
    Bucketing.partitionedSnapshot(spark, loc, base)
      .map(_.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq.sorted)
      .getOrElse(Seq.empty)

  private def expect(part: String, from: Long, until: Long): Seq[(Long, String, String)] =
    (from until until).map(i => (i, part, s"p$i"))

  private def union(parts: Seq[(Long, String, String)]*): Seq[(Long, String, String)] =
    parts.flatten.sorted

  private def tmpLoc(): String =
    java.nio.file.Files.createTempDirectory("graft-ptspec").toString

  test("fold touches only partitions with deltas; frozen partition's files stay identical") {
    val loc = tmpLoc(); val base = "ptspec_a"
    // day1 and day2 arrive and fold — both now frozen mains
    Bucketing.ingestPartitionedDelta(
      rows("day1", 0, 20).unionByName(rows("day2", 100, 120)), loc, "pt", 0L)
    Bucketing.foldPartitionedDeltas(spark, loc, base, "k", 4)
    assert(content(loc, base) ==
      union(expect("day1", 0, 20), expect("day2", 100, 120)))
    def day1Files(): Seq[String] =
      graft.sinks.Hfs.childFiles(spark, s"$loc/p=day1/main_v0").sorted
    val frozen = day1Files()
    assert(frozen.nonEmpty)
    // only day2 gets new data; the fold must not open day1 at all
    Bucketing.ingestPartitionedDelta(rows("day2", 120, 130), loc, "pt", 1L)
    Bucketing.foldPartitionedDeltas(spark, loc, base, "k", 4)
    assert(day1Files() == frozen,
      "frozen partition's main files changed — the fold opened an untouched partition")
    assert(content(loc, base) ==
      union(expect("day1", 0, 20), expect("day2", 100, 130)))
  }

  test("snapshot reads all three partition states at once: frozen main, main+tail, cold delta-only") {
    val loc = tmpLoc(); val base = "ptspec_b"
    Bucketing.ingestPartitionedDelta(
      rows("a", 0, 10).unionByName(rows("b", 100, 110)), loc, "pt", 0L)
    Bucketing.foldPartitionedDeltas(spark, loc, base, "k", 4)
    // b gains an unfolded tail; c has never folded (cold delta-only)
    Bucketing.ingestPartitionedDelta(
      rows("b", 110, 115).unionByName(rows("c", 200, 205)), loc, "pt", 1L)
    assert(content(loc, base) ==
      union(expect("a", 0, 10), expect("b", 100, 115), expect("c", 200, 205)))
    // fold resolves every state; content unchanged
    Bucketing.foldPartitionedDeltas(spark, loc, base, "k", 4)
    assert(content(loc, base) ==
      union(expect("a", 0, 10), expect("b", 100, 115), expect("c", 200, 205)))
  }

  test("streaming writer routes partitions and folds on cadence across a checkpointed restart") {
    val in = java.nio.file.Files.createTempDirectory("pt_in").toString
    val ckpt = java.nio.file.Files.createTempDirectory("pt_ckpt").toString
    val loc = tmpLoc(); val base = "ptspec_s"
    def startQuery() = spark.readStream
      .format("csv").schema("k LONG, pt STRING, payload STRING").load(in)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (b: DataFrame, id: Long) =>
        Bucketing.streamingPartitionedIngestWriter(loc, base, "pt", "k", 4,
          foldEvery = 2L)(b, id)
      }
      .start()
    def csv(name: String, part: String, from: Long, until: Long): Unit =
      java.nio.file.Files.writeString(java.nio.file.Path.of(s"$in/$name"),
        (from until until).map(i => s"$i,$part,p$i").mkString("", "\n", "\n"))
    csv("a.csv", "d1", 0, 10)
    val q1 = startQuery(); q1.processAllAvailable(); q1.stop()
    csv("b.csv", "d1", 10, 20)
    csv("c.csv", "d2", 100, 110)
    val q2 = startQuery(); q2.processAllAvailable(); q2.stop()
    assert(content(loc, base) ==
      union(expect("d1", 0, 20), expect("d2", 100, 110)))
  }

  test("partition values differing only by case or dash coexist — no dir or catalog-table aliasing") {
    val loc = tmpLoc(); val base = "ptspec_c2"
    // all four would collide under naive '-'→'_' + the case-insensitive
    // catalog; distinct key ranges make any loss/duplication visible
    val batch = rows("acme-corp", 0, 5)
      .unionByName(rows("acme_corp", 10, 15))
      .unionByName(rows("Acme", 20, 25))
      .unionByName(rows("acme", 30, 35))
    Bucketing.ingestPartitionedDelta(batch, loc, "pt", 0L)
    val all = union(expect("acme-corp", 0, 5), expect("acme_corp", 10, 15),
      expect("Acme", 20, 25), expect("acme", 30, 35))
    assert(content(loc, base) == all)
    Bucketing.foldPartitionedDeltas(spark, loc, base, "k", 2)
    assert(content(loc, base) == all,
      "fold must not alias near-colliding partitions' catalog tables")
    // and a second round into ONE of the colliding pair stays isolated
    Bucketing.ingestPartitionedDelta(rows("acme-corp", 5, 8), loc, "pt", 1L)
    Bucketing.foldPartitionedDeltas(spark, loc, base, "k", 2)
    assert(content(loc, base) ==
      union(expect("acme-corp", 0, 8), expect("acme_corp", 10, 15),
        expect("Acme", 20, 25), expect("acme", 30, 35)))
  }

  test("guards: null and unsafe partition values are refused loudly") {
    val loc = tmpLoc()
    val withNull = Seq((1L, Some("x"), "p"), (2L, None, "q"))
      .toDF("k", "pt", "payload")
    intercept[IllegalArgumentException] {
      Bucketing.ingestPartitionedDelta(withNull, loc, "pt", 0L)
    }
    intercept[IllegalArgumentException] {
      Bucketing.ingestPartitionedDelta(rows("bad/value", 0, 5), loc, "pt", 0L)
    }
  }
}
