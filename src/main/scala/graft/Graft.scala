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

  /** The ONE local-session recipe every main (Bench / Verify / PlanDump /
    * ScaleProbe) builds from — `parallelism` sets master threads AND
    * shuffle partitions. The four copies this replaces had to be edited
    * in lockstep (Tables.nanosConf's docstring enumerated them all). */
  def localSession(parallelism: Int, logLevel: String = "ERROR"): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$parallelism]")
      .config("spark.sql.shuffle.partitions", parallelism.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config(Tables.nanosConf, "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel(logLevel)
    spark
  }
}
