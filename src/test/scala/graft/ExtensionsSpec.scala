package graft

import graft.expressions.GraftExtensions
import org.apache.spark.sql.functions._

/** SQL-registered custom functions return exactly what the Column API
  * returns. */
class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("simhash64 and minhash_signature callable from SQL") {
    GraftExtensions.register(spark)
    Seq((1L, "the quick brown fox jumps over the lazy dog"))
      .toDF("id", "text").createOrReplaceTempView("docs_ext")
    val viaSql = spark.sql(
      """SELECT simhash64(text) AS sh,
        |       minhash_signature(text, 8, 3) AS sig FROM docs_ext""".stripMargin)
      .as[(Long, Seq[Long])].collect()(0)
    val viaColumn = spark.table("docs_ext").select(
      graft.expressions.TextHashes.simhash64(col("text")),
      graft.expressions.TextHashes.minhash_signature(col("text"), 8, 3))
      .as[(Long, Seq[Long])].collect()(0)
    assert(viaSql == viaColumn)
  }
}
