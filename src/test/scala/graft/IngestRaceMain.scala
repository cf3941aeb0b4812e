package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Forked-JVM driver for the REAL prober-vs-compactor IngestSegments
  * race ([[IngestRaceSpec]]): args = (baseDir, tablePath, role).
  *
  * The table holds a FIXED 40-key row set (bucket = k % 4) duplicated
  * across segments, so churn never changes the distinct answer:
  *
  *  - `compactor`: seeds two segments BEFORE the barrier, then loops
  *    {write a fresh duplicate segment; compact (fold + rename +
  *    delete)} — every cycle exercises the rename-before-delete window
  *    and the stale-listing window against the live prober.
  *  - `prober`: loops [[graft.sinks.IngestSegments.readLivePrunedWithIds]]
  *    pruned to buckets {0, 2} and requires the distinct key set to be
  *    EXACTLY the expected 20 keys every time. A silently smaller set
  *    is the admit-every-duplicate misread the retry contract exists
  *    to prevent — printed as MISREAD and exit 1. A LOUD failure
  *    (retry exhaustion, or a delete landing between planning and the
  *    action) is the contract's permitted outcome — counted and
  *    continued, exactly as a streaming batch retry would re-plan.
  *
  * Prints `PROBES <n> LOUD <m>` / `CYCLES <n>` for the spec's
  * liveness assertions. */
object IngestRaceMain {

  private val Keys = 40L
  private val KeepBuckets = Set("bucket=0", "bucket=2")
  private val Expected: Set[Long] =
    (0L until Keys).filter(k => k % 4 == 0 || k % 4 == 2).toSet

  private def writeSegment(spark: SparkSession, path: String, id: Long): Unit =
    graft.sinks.IngestSegments.alignToLayout(
        spark.range(Keys).select(col("id").as("k"),
          pmod(col("id"), lit(4)).cast("int").as("bucket")),
        "bucket")
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$path/ingest=$id")

  private def isLoudRace(e: Throwable): Boolean = {
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: chain(t.getCause)
    chain(e).exists {
      case _: java.io.FileNotFoundException => true
      case t: IllegalStateException =>
        t.getMessage != null && t.getMessage.contains("stale")
      case t: org.apache.spark.sql.AnalysisException =>
        t.getCondition == "PATH_NOT_FOUND"
      case t => t.getMessage != null &&
        t.getMessage.contains("FileNotFoundException")
    }
  }

  def main(args: Array[String]): Unit = {
    val Array(base, path, role) = args
    val spark = SparkSession.builder()
      .master("local[2]").appName(s"ingest-race-$role")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "2")
      .getOrCreate()
    try {
      def awaitFile(f: String): Unit = {
        val deadline = System.currentTimeMillis() + 60000
        while (!graft.sinks.Hfs.exists(spark, f)) {
          if (System.currentTimeMillis() > deadline)
            sys.error(s"$f never appeared")
          Thread.sleep(10)
        }
      }
      if (role == "compactor") { // seed before anyone probes
        writeSegment(spark, path, 0L)
        writeSegment(spark, path, 1L)
      } else {
        // warm the probe path (JVM + codegen + listing) against the
        // seeded, quiet table so the timed window measures races, not
        // cold-start — a cold first probe eats seconds of the window
        awaitFile(s"$base/ready-compactor")
        graft.sinks.IngestSegments
          .readLivePrunedWithIds(spark, path, KeepBuckets.contains)
          .foreach(_._1.select(col("k")).distinct().collect())
      }
      graft.sinks.Hfs.writeString(spark, s"$base/ready-$role", "r")
      awaitFile(s"$base/go")
      val t0 = System.currentTimeMillis()
      role match {
        case "compactor" =>
          var i = 2L
          // churn window shorter than the prober's: the tail of the
          // probe loop runs against a quiet table, so exact probes are
          // guaranteed even on a box where every in-churn probe loses
          // its race loudly
          while (System.currentTimeMillis() < t0 + 10000) {
            writeSegment(spark, path, i)
            graft.sinks.IngestSegments.compact(spark, path,
              fold = _.select(col("k"), col("bucket")).distinct(),
              partitionCols = Seq("bucket"))
            i += 1
            Thread.sleep(400)
          }
          println(s"CYCLES ${i - 2}")
        case "prober" =>
          var probes = 0
          var loud = 0
          while (System.currentTimeMillis() < t0 + 15000) {
            try {
              graft.sinks.IngestSegments
                .readLivePrunedWithIds(spark, path, KeepBuckets.contains) match {
                case None => sys.error(s"MISREAD: probe saw an empty table")
                case Some((df, _)) =>
                  val got = df.select(col("k")).distinct()
                    .collect().map(_.getLong(0)).toSet
                  if (got != Expected)
                    sys.error(s"MISREAD: ${got.size}/${Expected.size} keys, " +
                      s"missing ${(Expected -- got).toSeq.sorted.take(5)}")
                  probes += 1
              }
            } catch {
              case e: Exception if isLoudRace(e) => loud += 1
            }
          }
          println(s"PROBES $probes LOUD $loud")
      }
    } finally spark.stop()
  }
}
