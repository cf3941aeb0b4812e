package graft

import org.apache.spark.sql.functions._

/** The engine is equally usable SQL-first: fixture tables as views,
  * §2 queries as Spark SQL text, results identical to the DataFrame
  * forms (same Catalyst plans underneath). */
class SqlSurfaceSpec extends SparkSpec {
  import spark.implicits._

  private def registerViews(): Unit =
    Seq("events", "orders", "lineitem", "customer", "nation", "part",
      "documents").foreach { n =>
      Tables.t(spark, sf0001, n).createOrReplaceTempView(n)
    }

  test("DAU hourly via pure SQL equals the DataFrame pipeline") {
    registerViews()
    val sql = spark.sql(
      """WITH entries AS (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY user_id, date_format(ts, 'yyyy-MM-dd')
        |    ORDER BY ts, event_id) AS rn
        |  FROM events)
        |SELECT date_format(ts, 'yyyy-MM-dd') AS dt,
        |       date_format(ts, 'HH') AS hr, count(*) AS dau
        |FROM entries WHERE rn = 1 GROUP BY dt, hr""".stripMargin)
      .as[(String, String, Long)].collect().toSet
    val df = operators.Relational.dauHourly(spark, sf0001)
      .as[(String, String, Long)].collect().toSet
    assert(sql == df)
  }

  test("order-wide join via pure SQL equals the DataFrame pipeline") {
    registerViews()
    val sql = spark.sql(
      """SELECT l_orderkey AS order_id, l_linenumber AS detail_id,
        |       o_custkey AS user_id, c_name AS user_name,
        |       n_name AS province_name,
        |       date_format(o_orderdate, 'yyyy-MM-dd') AS create_date,
        |       l_extendedprice * (1 - l_discount) AS split_total_amount
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey""".stripMargin).count()
    val df = operators.Relational.orderWide(spark, sf0001).count()
    assert(sql == df && sql > 0)
  }

  test("Graft.init makes a session SQL-ready in one call") {
    Graft.init(spark, sf0001)
    val n = spark.sql(
      "SELECT count(*) FROM orders JOIN lineitem ON o_orderkey = l_orderkey")
      .as[Long].collect()(0)
    assert(n > 0)
    val sig = spark.sql("SELECT minhash_signature(text) FROM documents LIMIT 1")
      .as[Seq[Long]].collect()(0)
    assert(sig.length == 32)
  }

  test("custom expressions compose with SQL aggregation") {
    registerViews()
    expressions.GraftExtensions.register(spark)
    val dupGroups = spark.sql(
      """SELECT simhash64(text) AS sh, count(*) AS n
        |FROM documents GROUP BY 1 HAVING count(*) >= 1""".stripMargin).count()
    assert(dupGroups > 0)
  }
}
