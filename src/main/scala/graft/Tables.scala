package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated star-schema parquet fixtures under
  * `/root/testdata/sf*` (see TESTDATA.md). Parquet carries its schema in
  * the footer, so no inference happens; Catalyst pushes filters and
  * column pruning into the scan.
  */
object Tables {

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    name match {
      case "events" => events(spark, dir)
      case _        => spark.read.parquet(s"$dir/$name.parquet")
    }

  /** `events.parquet` stores `ts` as parquet TIMESTAMP(NANOS), which Spark
    * rejects by default ([PARQUET_TYPE_ILLEGAL]). We read nanos as a long
    * and floor-convert to microseconds — the same truncation DuckDB
    * applies when it reads TIMESTAMP_NS, so oracle comparisons agree.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else raw
  }
}
