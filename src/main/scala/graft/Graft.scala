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
    * ScaleProbe / Http) builds from — `parallelism` sets master threads
    * AND shuffle partitions. The four copies this replaces had to be
    * edited in lockstep (Tables.nanosConf's docstring enumerated them
    * all). `fairScheduler` turns on spark.scheduler.mode=FAIR for
    * serving entry points (concurrent requests' jobs interleave via
    * per-request pools instead of FIFO head-of-line blocking); it is a
    * SparkContext-creation-time conf, so it only takes effect when this
    * call actually creates the context — a batch main never sets it. */
  def localSession(parallelism: Int, logLevel: String = "ERROR",
      fairScheduler: Boolean = false): SparkSession = {
    val b = SparkSession.builder()
      .master(s"local[$parallelism]")
      .config("spark.sql.shuffle.partitions", parallelism.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config(Tables.nanosConf, "true")
      .config("spark.ui.enabled", "false")
    val spark = (if (fairScheduler) b.config("spark.scheduler.mode", "FAIR")
      else b).getOrCreate()
    spark.sparkContext.setLogLevel(logLevel)
    spark
  }
}
