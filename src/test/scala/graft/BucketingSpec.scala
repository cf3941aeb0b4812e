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

  /** The q97 claim, tree-walked (walkPlan: the shared SparkSpec
    * helper): the orderkey join is a SortMergeJoin
    * whose subtree holds NO exchange — both sides arrive bucketed
    * (co-location). With `requireSortFree` the subtree must hold no
    * Sort either: that needs spark.sql.legacy.bucketedTableScan.
    * outputOrdering=true (off by default since Spark 3.0 — see the
    * bucketedRevenue scaladoc), which the one-file-per-bucket layout
    * makes sound. */
  private def assertColocatedJoin(df: org.apache.spark.sql.DataFrame,
      requireSortFree: Boolean = false): Unit = {
    import org.apache.spark.sql.execution.SortExec
    import org.apache.spark.sql.execution.exchange.Exchange
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    df.collect()
    val all = walkPlan(df.queryExecution.executedPlan)
    val smj = all.collectFirst { case j: SortMergeJoinExec => j }
    assert(smj.nonEmpty,
      s"expected a SortMergeJoin:\n${df.queryExecution.executedPlan}")
    val sub = walkPlan(smj.get)
    assert(!sub.exists(_.isInstanceOf[Exchange]),
      s"exchange under the bucketed join:\n${smj.get}")
    if (requireSortFree)
      assert(!sub.exists(_.isInstanceOf[SortExec]),
        s"sort under the bucketed join (multi-file bucket?):\n${smj.get}")
  }

  test("q97: stored bucketed pair matches the plain parquet join; join subtree is exchange-free (and sort-free under the ordering conf)") {
    val df = Bucketing.bucketedRevenue(spark, sf0001)
    val got = df.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val o = Tables.t(spark, sf0001, "orders")
    val l = Tables.t(spark, sf0001, "lineitem")
    val expect = o.join(l, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == expect)
    assertColocatedJoin(df)
    // the layout writes exactly one file per bucket, so enabling the
    // ordering conf must elide the per-partition Sorts too
    val orderingConf = "spark.sql.legacy.bucketedTableScan.outputOrdering"
    spark.conf.set(orderingConf, "true")
    try assertColocatedJoin(Bucketing.bucketedRevenue(spark, sf0001),
      requireSortFree = true)
    finally spark.conf.set(orderingConf, "false")
  }

  test("q97: fresh-catalog re-registration reuses the on-disk layout without rewriting") {
    val (oName, lName) = Bucketing.ensureBucketedPair(spark, sf0001)
    def listing(tbl: String): Seq[String] = {
      val loc = spark.sql(s"DESCRIBE TABLE EXTENDED $tbl")
        .filter(col("col_name") === "Location")
        .collect()(0).getString(1)
      graft.sinks.Hfs.childFiles(spark, loc).sorted
    }
    val before = (listing(oName), listing(lName))
    // the in-memory-catalog twin of a metastore loss: external DROP
    // keeps the files; ensure must re-register via DDL, not rebuild
    spark.sql(s"DROP TABLE $oName")
    spark.sql(s"DROP TABLE $lName")
    val (o2, l2) = Bucketing.ensureBucketedPair(spark, sf0001)
    assert((o2, l2) == (oName, lName))
    assert((listing(o2), listing(l2)) == before,
      "re-registration must not rewrite the bucketed files")
    assertColocatedJoin(Bucketing.bucketedRevenue(spark, sf0001))
  }

  test("writeBucketed lands exactly one file per bucket (the sorted-scan precondition)") {
    val (oName, lName) = Bucketing.ensureBucketedPair(spark, sf0001)
    for (tbl <- Seq(oName, lName)) {
      val loc = spark.sql(s"DESCRIBE TABLE EXTENDED $tbl")
        .filter(col("col_name") === "Location")
        .collect()(0).getString(1)
      // bucket id is the _NNNNN suffix parquet bucketed writes encode in
      // the file name; >1 file for one id would silently re-enable the
      // under-join Sort that the ordering conf elides
      val byBucket = graft.sinks.Hfs.childFiles(spark, loc)
        .filter(_.endsWith(".parquet"))
        .groupBy(f => f.split("_").last.takeWhile(_ != '.'))
      assert(byBucket.nonEmpty && byBucket.values.forall(_.size == 1),
        s"multi-file bucket in $tbl: $byBucket")
    }
  }

  test("q97 layout: an orderkey point read prunes to one bucket") {
    val (oName, _) = Bucketing.ensureBucketedPair(spark, sf0001)
    // the planner AUTO-DISABLES bucketed scans it sees no join/agg
    // benefit in (autoBucketedScan, on by default) — which also forfeits
    // bucket pruning; a point-read serving path turns it off
    val autoConf = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    spark.conf.set(autoConf, "false")
    try {
      val df = spark.table(oName).filter(col("o_orderkey") === 42L)
      assert(df.queryExecution.executedPlan.toString
          .contains("SelectedBucketsCount: 1 out of 8"),
        df.queryExecution.executedPlan.toString)
      assert(df.count() <= 1)
    } finally spark.conf.set(autoConf, "true")
  }
}
