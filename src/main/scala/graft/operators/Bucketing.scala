package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed co-located joins — the 100 TB fact⋈fact tool (SURVEY §2
  * preamble): write both sides bucketed+sorted on the join key once, and
  * every subsequent join on that key is shuffle-free (SortMergeJoin with
  * no Exchange). Works against Spark's built-in session catalog (no Hive
  * needed); at cluster scale the same API writes to the shared metastore.
  */
object Bucketing {

  /** Write `df` as a bucketed, sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

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
}
