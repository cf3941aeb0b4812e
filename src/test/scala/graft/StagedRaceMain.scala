package graft

import org.apache.spark.sql.SparkSession

/** Forked-JVM driver for the REAL two-process StagedLayout race
  * ([[StagedRaceSpec]]): args = (baseDir, path, procId).
  *
  * Protocol: signal readiness (`$base/ready-<id>`), spin-wait for the
  * test's `$base/go` barrier so both JVMs enter ensure() together,
  * then race a deliberately slow build (payload + 2 s sleep + __done)
  * on the SHARED path. On return, re-read the served layout and
  * REQUIRE it complete — a torn serve (missing marker or payload) is
  * exactly the failure mode under test — then print `SERVED <payload>`
  * so the spec can assert both processes served one identical copy.
  * The payload names the builder, deliberately violating the
  * input-determined contract: it is what makes the winner observable
  * and a mixed/torn state detectable. */
object StagedRaceMain {
  def main(args: Array[String]): Unit = {
    val Array(base, path, id) = args
    val spark = SparkSession.builder()
      .master("local[2]").appName(s"staged-race-$id")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      graft.sinks.Hfs.writeString(spark, s"$base/ready-$id", "r")
      val deadline = System.currentTimeMillis() + 60000
      while (!graft.sinks.Hfs.exists(spark, s"$base/go")) {
        if (System.currentTimeMillis() > deadline)
          sys.error("GO barrier never appeared")
        Thread.sleep(10)
      }
      val served = graft.sinks.StagedLayout.ensure(spark, path)(
        graft.sinks.Hfs.readString(spark, s"$path/__done").nonEmpty) { st =>
        graft.sinks.Hfs.writeString(spark, s"$st/payload", s"built-by-$id")
        Thread.sleep(2000) // widen the overlap window
        graft.sinks.Hfs.writeString(spark, s"$st/__done", "ok")
      }
      val done = graft.sinks.Hfs.readString(spark, s"$served/__done")
      val payload = graft.sinks.Hfs.readString(spark, s"$served/payload")
      require(done.contains("ok") && payload.exists(_.nonEmpty),
        s"TORN SERVE: done=$done payload=$payload")
      println(s"SERVED ${payload.get}")
    } finally spark.stop()
  }
}
