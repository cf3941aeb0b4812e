package graft

import graft.operators.Bucketing
import org.apache.spark.sql.functions._

/** Bucketed co-located join: same results as the plain join, with the
  * shuffle provably gone from the physical plan. */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed fact-fact join is shuffle-free and result-identical") {
    val o = Tables.t(spark, sf0001, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val l = Tables.t(spark, sf0001, "lineitem")
      .select(col("l_orderkey").as("o_orderkey"), col("l_extendedprice"))
    Bucketing.writeBucketed(o, "orders_b", "o_orderkey", 4)
    Bucketing.writeBucketed(l, "lineitem_b", "o_orderkey", 4)
    try {
      val joined = Bucketing.bucketedJoin(spark, "orders_b", "lineitem_b", "o_orderkey")
      // disable broadcast so the test exercises the SMJ path the 100 TB
      // plan would take
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val j2 = Bucketing.bucketedJoin(spark, "orders_b", "lineitem_b", "o_orderkey")
        assert(Bucketing.isShuffleFree(j2), j2.queryExecution.executedPlan.toString)
        val plain = o.join(l, "o_orderkey").count()
        assert(j2.count() == plain)
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      assert(joined.columns.contains("l_extendedprice"))
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
