package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed co-located joins — the 100 TB fact⋈fact tool (SURVEY §2
  * preamble): write both sides bucketed+sorted on the join key once, and
  * every subsequent join on that key is shuffle-free (SortMergeJoin with
  * no Exchange). Works against Spark's built-in session catalog (no Hive
  * needed); at cluster scale the same API writes to the shared metastore.
  */
object Bucketing {

  type Q = (SparkSession, String) => DataFrame

  /** Write `df` as a bucketed, sorted table — managed, or EXTERNAL when
    * `path` is given. The repartition(buckets, key) BEFORE the write
    * aligns each task with exactly one bucket (repartition's hash-pmod
    * IS the bucket-id function), so every bucket lands as one file and
    * the SORTED BY metadata is usable at read time (the
    * bucketedTableScan.outputOrdering conf's one-file precondition). */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int, path: Option[String] = None): Unit = {
    val w = df.repartition(buckets, col(key)).write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

  /** Join two bucketed tables on their bucket key — planner elides both
    * Exchanges when bucket counts line up. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)

  /** True iff the physical plan contains no shuffle exchange — ANY
    * partitioning (hash, range, single-partition, round-robin), not just
    * the literal hash form: matching only "Exchange hashpartitioning"
    * certified an orderBy's range-partition shuffle as shuffle-free.
    * BroadcastExchange is NOT a shuffle and stays allowed. */
  def isShuffleFree(df: DataFrame): Boolean = {
    val plan = df.queryExecution.executedPlan.toString
    // strip the two non-shuffle exchange spellings, then look: a
    // ReusedExchange over a broadcast would otherwise read as a
    // shuffle (and the previous un-stripped first disjunct was dead —
    // the stripped check alone is complete)
    !plan.replace("BroadcastExchange ", "")
      .replace("ReusedExchange ", "")
      .contains("Exchange ")
  }

  // ---------------------------------------------------------------------
  // Stored bucketed layout per sf dir — the co-located-join lifecycle as
  // a first-class stored "index", like the ANN/dedup families: built once
  // (an ingest job at 100 TB), then every orderkey join against it is
  // exchange-free. q97 runs THROUGH this layout and hash-compares against
  // the plain-SQL oracle, so the layout is driver-oracle-verified, not
  // spec-only.
  // ---------------------------------------------------------------------

  /** Freshness fingerprint folding BOTH fact fixtures (a regenerated
    * orders.parquet must invalidate the pair even if lineitem is
    * unchanged) — sanitized to identifier-safe chars because it names
    * catalog TABLES, not just directories. */
  private def pairTag(s: SparkSession, d: String): String = {
    val stats = Seq("orders", "lineitem").map { n =>
      val (len, mtime) = graft.sinks.Hfs.stat(s, s"$d/$n.parquet")
      s"${len}_$mtime"
    }
    s"${Integer.toHexString(d.hashCode)}_${stats.mkString("_")}"
  }

  /** Bucket count is a build-time knob (8 matches the fixture scale; a
    * cluster build would use thousands). Encoded in the location so a
    * re-ensure at a different count can never read a stale layout. */
  private def pairLoc(tag: String, buckets: Int): String =
    s"${sys.props("java.io.tmpdir")}/graft-bkt/$tag-b$buckets"

  /** Ensure both fact tables exist as bucketed+sorted EXTERNAL tables
    * for `d` and return their catalog names. Two cold-start paths:
    *
    *  - no files yet → [[writeBucketed]], whose task/bucket alignment
    *    makes every bucket one file, so the scan's SORTED BY metadata
    *    holds — without it Spark sees multi-file buckets and re-sorts
    *    under the join.
    *  - files present but catalog empty (fresh JVM over the in-memory
    *    catalog — the session-catalog twin of a metastore restore) →
    *    re-register with CREATE TABLE … CLUSTERED/SORTED BY … LOCATION;
    *    the data is not rewritten.
    *
    * A crash mid-write leaves no _SUCCESS → the next ensure rebuilds in
    * overwrite mode; the catalog entry only ever points at a completed
    * layout. */
  def ensureBucketedPair(s: SparkSession, d: String,
      buckets: Int = 8): (String, String) = synchronized {
    val tag = pairTag(s, d)
    val loc = pairLoc(tag, buckets)
    val specs = Seq(("orders", "o_orderkey"), ("lineitem", "l_orderkey"))
    val names = specs.map { case (src, key) =>
      val name = s"graft_bkt_${src}_${tag}_b$buckets"
      if (!s.catalog.tableExists(name)) {
        val tableLoc = s"$loc/$src"
        if (graft.sinks.Hfs.exists(s, s"$tableLoc/_SUCCESS")) {
          val ddl = t(s, d, src).schema.toDDL
          s.sql(s"CREATE TABLE $name ($ddl) USING PARQUET " +
            s"CLUSTERED BY ($key) SORTED BY ($key) INTO $buckets BUCKETS " +
            s"LOCATION '$tableLoc'")
        } else
          writeBucketed(t(s, d, src), name, key, buckets, Some(tableLoc))
      }
      name
    }
    (names.head, names(1))
  }

  /** q97: revenue by order priority THROUGH the stored bucketed pair —
    * the orders⋈lineitem join runs as a SortMergeJoin with no Exchange
    * (both sides bucketed on their orderkey, equal bucket counts), so
    * the only shuffle in the plan is the 5-row priority aggregate's.
    * The per-partition Sorts under the SMJ are also elidable — the
    * layout guarantees one file per bucket, so enabling
    * spark.sql.legacy.bucketedTableScan.outputOrdering (off by default
    * since Spark 3.0: the planner won't pay the files-per-bucket check)
    * removes them; the query does not flip session confs itself, so the
    * default plan keeps the two narrow in-partition sorts and ZERO wide
    * operators. The merge hints pin the strategy the 100 TB plan needs:
    * a fact⋈fact join is never broadcastable, and without the hint the
    * sf-sized fixture would take BHJ and prove nothing. BucketingSpec
    * asserts the exchange-free subtree (sort-free under the conf), the
    * re-register-from-files path, and bucket-pruned point reads; the
    * oracle takes the plain parquet-scan road, so the layout's CONTENT
    * is hash-verified too. */
  val bucketedRevenue: Q = (s, d) => {
    val (o, l) = ensureBucketedPair(s, d)
    s.table(o).hint("merge")
      .join(s.table(l).hint("merge"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
  }

  val queries: Map[String, Q] = Map(
    "q97_bucketed_join" -> bucketedRevenue)

  val oracles: Map[String, String] = Map(
    "q97_bucketed_join" ->
      """SELECT o_orderpriority, count(*) AS n_items,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderpriority""".stripMargin)
}
