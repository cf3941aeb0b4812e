package graft

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The q50 merge-form as-of join (union + running last) is equivalent to
  * the naive join-then-rank composition on seeded random data, including
  * the boundary cases: order exactly at the event instant (ASOF is ≤,
  * included) and events before any order (dropped, inner semantics). */
class AsofEquivalenceSpec extends SparkSpec {
  import spark.implicits._

  test("merge form == join-then-rank on 2000 random events / 300 random orders") {
    val rnd = new scala.util.Random(13)
    val dayMs = 86400000L
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val events = (1 to 2000).map { i =>
      (i.toLong, rnd.nextInt(40).toLong,
        new Timestamp(t0 + (rnd.nextInt(30) * dayMs) + rnd.nextInt(86400000)))
    }.toDF("event_id", "user_id", "ts")
    val orders = (1 to 300).map { i =>
      (i.toLong, rnd.nextInt(40).toLong,
        new Date(t0 + rnd.nextInt(35) * dayMs))
    }.toDF("o_orderkey", "o_custkey", "o_orderdate")

    // boundary: one order at exactly an event's instant (midnight)
    val events2 = events.unionByName(
      Seq((9001L, 999L, Timestamp.valueOf("2024-01-10 00:00:00")))
        .toDF("event_id", "user_id", "ts"))
    val orders2 = orders.unionByName(
      Seq((9002L, 999L, Date.valueOf("2024-01-10")))
        .toDF("o_orderkey", "o_custkey", "o_orderdate"))

    val o2 = orders2.groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("last_order"))

    // naive composition: join full history ≤ ts, rank, keep rn=1
    val wNaive = Window.partitionBy(col("event_id")).orderBy(col("o_orderdate").desc)
    val naive = events2
      .join(o2, col("user_id") === col("o_custkey") && col("o_orderdate") <= col("ts"))
      .withColumn("rn", row_number().over(wNaive))
      .filter(col("rn") === 1)
      .select(col("event_id"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("asof_date"),
        col("last_order"))
      .as[(Long, String, Long)].collect().toSet

    // merge form: same construction as Analytics.asofJoin
    val o = o2.select(col("o_custkey").as("user_id"),
      col("o_orderdate").cast("timestamp").as("t"), lit(0).as("kind"),
      lit(null).cast("long").as("event_id"),
      col("o_orderdate").as("odate"), col("last_order"))
    val e = events2.select(col("user_id"), col("ts").as("t"), lit(1).as("kind"),
      col("event_id"), lit(null).cast("date").as("odate"),
      lit(null).cast("long").as("last_order"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("t"), col("kind"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val merged = o.unionByName(e)
      .withColumn("asof_odate", last(col("odate"), ignoreNulls = true).over(w))
      .withColumn("asof_order", last(col("last_order"), ignoreNulls = true).over(w))
      .filter(col("kind") === 1 && col("asof_odate").isNotNull)
      .select(col("event_id"),
        date_format(col("asof_odate"), "yyyy-MM-dd").as("asof_date"),
        col("asof_order").as("last_order"))
      .as[(Long, String, Long)].collect().toSet

    assert(naive.nonEmpty)
    assert(merged == naive)
    // the midnight boundary pair resolved with ≤ semantics
    assert(merged.contains((9001L, "2024-01-10", 9002L)))
  }
}
