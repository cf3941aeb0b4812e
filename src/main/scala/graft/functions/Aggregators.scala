package graft.functions

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** User-facing typed aggregation surface (SURVEY.md §2.9: the reference
  * has no UDAF interface; its dedup-admission "aggregate" is a Redis
  * side effect). `DistinctSet` is the exact-DAU set as a mergeable typed
  * Aggregator — partial sets merge map-side like any Catalyst partial
  * agg; `approx_count_distinct` remains the sketch path at 100 TB. */
object Aggregators {

  type Q = (SparkSession, String) => DataFrame

  /** Exact distinct-count of a string key as a typed Aggregator. */
  object DistinctSet extends Aggregator[String, Set[String], Long] {
    override def zero: Set[String] = Set.empty
    override def reduce(b: Set[String], a: String): Set[String] =
      if (a == null) b else b + a
    override def merge(b1: Set[String], b2: Set[String]): Set[String] = b1 | b2
    override def finish(r: Set[String]): Long = r.size.toLong
    override def bufferEncoder: Encoder[Set[String]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** DAU per day via the typed Aggregator (column form through udaf). */
  val dauViaAggregator: Q = (s, d) => {
    val distinctMids = udaf(DistinctSet)
    t(s, d, "events")
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("dt"))
      .agg(distinctMids(col("user_id").cast("string")).as("dau"))
  }

  val queries: Map[String, Q] = Map("q39_dau_udaf" -> dauViaAggregator)

  val oracles: Map[String, String] = Map(
    "q39_dau_udaf" ->
      """SELECT strftime(ts,'%Y-%m-%d') AS dt,
        | count(DISTINCT user_id) AS dau
        |FROM events GROUP BY 1""".stripMargin,
  )
}
