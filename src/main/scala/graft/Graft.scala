package graft

import org.apache.spark.sql.SparkSession

/** One-call user entry point: make a SparkSession into a graft warehouse —
  * fixture tables as views, custom functions registered — so
  * `spark.sql("SELECT simhash64(text), count(*) FROM documents GROUP BY 1")`
  * works immediately (the SQL-first twin of the SparkEntry query API).
  */
object Graft {

  val tableNames: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Register every fixture table under `dir` as a temp view and install
    * the custom SQL functions. The one deliberate conf change happens
    * here, at session setup: events.parquet needs [[Tables.nanosConf]]
    * (TIMESTAMP(NANOS) footers), and init is the declared place a session
    * becomes a graft warehouse. */
  def init(spark: SparkSession, dir: String): SparkSession = {
    spark.conf.set(Tables.nanosConf, "true")
    tableNames.foreach(n => Tables.t(spark, dir, n).createOrReplaceTempView(n))
    expressions.GraftExtensions.register(spark)
    spark
  }
}
