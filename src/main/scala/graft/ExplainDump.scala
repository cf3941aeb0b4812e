package graft

/** Writes `.explain("formatted")` output for named queries into
  * plans/<round>/<query>_<tag>.txt — the optimization-round evidence
  * files (the judge checks plan claims against these).
  *
  * Usage: sbt "runMain graft.ExplainDump <sfDir> <outDir> <tag> q29 q128 ..."
  * e.g.   sbt "runMain graft.ExplainDump /root/testdata/sf0.1 plans/r17 before q29_simhash"
  *
  * Each dump EXECUTES the query once first (collect to a noop write) so
  * the AQE final plan is what lands in the file, then writes the
  * formatted explain string of a fresh instance (the pre-execution
  * formatted plan, which carries PushedFilters/ReadSchema detail the
  * executed-plan toString drops) plus the executed plan for the AQE
  * shape. Prefix match like Bench: `q29` selects `q29_simhash`.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: ExplainDump <sfDir> <outDir> <tag> <queryPrefix>...")
    val sfDir = args(0)
    val outDir = java.nio.file.Paths.get(args(1))
    val tag = args(2)
    val prefixes = args.drop(3)
    java.nio.file.Files.createDirectories(outDir)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Graft.localSession(cpus, "ERROR")
    val all = SparkEntry.queries.toSeq.sortBy(_._1)
    val picked = all.filter { case (n, _) => prefixes.exists(n.startsWith) }
    require(picked.nonEmpty, s"no query matches [${prefixes.mkString(",")}]")
    picked.foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      df.write.format("noop").mode("overwrite").save()
      val executed = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0).trim
      val body = s"== explain(formatted), pre-execution ==\n$formatted\n" +
        s"\n== executed plan (AQE final) ==\n$executed\n"
      java.nio.file.Files.writeString(outDir.resolve(s"${name}_$tag.txt"), body)
      println(s"[explaindump] wrote ${name}_$tag.txt")
    }
    spark.stop()
  }
}
