package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every implemented operator's `(SparkSession, sfDir) =>
  * DataFrame` query and its DuckDB oracle SQL from the per-category
  * modules. Column names are aligned between the Spark plan and the
  * oracle SQL (the driver sorts columns by name before hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the DAU pipeline (session-entry dedup → hourly histogram). */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.dauHourly(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.Relational.queries ++
      streaming.OrderWideStream.queries ++
      operators.Bucketing.queries ++
      operators.Publisher.queries ++
      operators.Analytics.queries ++
      functions.TextOps.queries ++
      functions.SimilarityOps.queries ++
      functions.PqOps.queries ++
      functions.DedupOps.queries ++
      functions.Multimodal.queries ++
      functions.Scalars.queries ++
      functions.Aggregators.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → driver rows-only check. */
  def oracleSql: Map[String, String] =
    operators.Relational.oracles ++
      streaming.OrderWideStream.oracles ++
      operators.Bucketing.oracles ++
      operators.Publisher.oracles ++
      operators.Analytics.oracles ++
      functions.TextOps.oracles ++
      functions.SimilarityOps.oracles ++
      functions.PqOps.oracles ++
      functions.DedupOps.oracles ++
      functions.Multimodal.oracles ++
      functions.Scalars.oracles ++
      functions.Aggregators.oracles
}
