package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM; sbt Test/fork=true). */
object TestSession {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = TestSession.spark
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  val sf0001 = "/root/testdata/sf0.001"

  /** Full SparkPlan traversal that descends AQE wrappers, query stages,
    * and reused exchanges (plain SparkPlan.collect treats
    * QueryStageExec as a leaf) — the ONE shared copy: a Spark upgrade
    * that adds a wrapper node must be handled here, not in six
    * per-suite clones that would silently walk truncated plans. */
  protected def walkPlan(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    val next = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case r: ReusedExchangeExec => Seq(r.child)
      case other => other.children
    }
    p +: next.flatMap(walkPlan)
  }

  /** The executed plan's parquet scan whose root paths mention
    * `pathFragment` — how the pruning specs single out the INDEX scan
    * from the batch/query side's. */
  protected def scanOf(df: org.apache.spark.sql.DataFrame,
      pathFragment: String): org.apache.spark.sql.execution.FileSourceScanExec =
    walkPlan(df.queryExecution.executedPlan).collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
        if f.relation.location.rootPaths
          .exists(_.toString.contains(pathFragment)) => f
    }.getOrElse(fail(s"no parquet scan of $pathFragment in the plan"))

  /** The `column=value` partition values the given scans actually
    * SELECTED — the shared pin behind every listing-time-pruning spec
    * ("the partitions the scan read ⊆ the probed set"). Asserts every
    * selected file sits under a `column=` partition dir (a file outside
    * one means the probe read an unpartitioned root). One copy: six
    * suites pin six index layouts with it. */
  protected def partitionValuesOf(
      scans: Seq[org.apache.spark.sql.execution.FileSourceScanExec],
      column: String): Set[Long] =
    scans.flatMap(_.selectedPartitions.toPartitionArray)
      .map(_.urlEncodedPath)
      .map { f =>
        val m = s"/$column=(\\d+)/".r.findFirstMatchIn(f)
        assert(m.isDefined, s"probe read outside $column partitions: $f")
        m.get.group(1).toLong
      }.toSet

  /** [[partitionValuesOf]] over EVERY scan of a plan — for probes whose
    * whole plan reads one layout (the one-shot ANN probe). */
  protected def readPartitionValues(df: org.apache.spark.sql.DataFrame,
      column: String): Set[Long] =
    partitionValuesOf(
      walkPlan(df.queryExecution.executedPlan).collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }, column)
}
