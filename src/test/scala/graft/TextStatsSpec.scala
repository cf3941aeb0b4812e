package graft

import graft.expressions.TextHashes
import graft.functions.TextOps
import org.apache.spark.sql.functions._

/** The fused TextStats expression is bit-equivalent to the composable
  * HOF pipelines it replaces in q21/q24, including the degenerate
  * inputs (empty text, punct-only, repeated spaces, uppercase-as-punct). */
class TextStatsSpec extends SparkSpec {
  import spark.implicits._

  test("fused quality score == composed HOF form on the sf0.001 corpus") {
    val fused = TextOps.qualityScore(spark, sf0001).orderBy("doc_id").collect().toSeq
    val hof = TextOps.qualityScoreHof(spark, sf0001).orderBy("doc_id").collect().toSeq
    assert(fused == hof)
  }

  test("fused lang-id == HOF lang-id on the sf0.001 corpus") {
    val fused = TextOps.langId(spark, sf0001)
      .select("doc_id", "detected_lang").as[(Long, String)].collect().toSeq.sorted
    val hof = Tables.t(spark, sf0001, "documents")
      .select(col("doc_id"), TextOps.langIdCol(col("text")).as("detected_lang"))
      .as[(Long, String)].collect().toSeq.sorted
    assert(fused == hof)
  }

  test("random strings: fused == HOF over 500 seeded samples (incl. unicode)") {
    val rnd = new scala.util.Random(7)
    val alphabet = "abz019 !,.ÄΩ🙂" // lowercase, digits, space, punct, astral
    def randText() = (0 until rnd.nextInt(60))
      .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    val rows = (1 to 500).map(i => (i.toLong, randText()))
    val df = rows.toDF("doc_id", "text")
    val fused = df
      .withColumn("st", TextHashes.text_stats(col("text"), Seq(TextOps.stopwords)))
      .select(col("doc_id"), col("st")(0), col("st")(1), col("st")(2), col("st")(3))
      .as[(Long, Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    val tk = split(col("text"), " ")
    val hof = df.select(col("doc_id"),
        length(col("text")).cast("long"),
        size(tk).cast("long"),
        length(regexp_replace(col("text"), "[a-z0-9 ]", "")).cast("long"),
        size(filter(tk, t => t.isin(TextOps.stopwords: _*))).cast("long"))
      .as[(Long, Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(fused == hof)
  }

  test("edge cases match split-with-empties and the [a-z0-9 ] punct class") {
    val rows = Seq("", "!!!", "a  b", "AB c9", "the the of")
      .toDF("t")
      .select(TextHashes.text_stats(col("t"), Seq(Seq("a", "b", "the"))).as("st"))
      .as[Seq[Long]].collect().toSeq
    assert(rows == Seq(
      Seq(0L, 1L, 0L, 0L), // "" splits to [""]
      Seq(3L, 1L, 3L, 0L), // punct-only
      Seq(4L, 3L, 0L, 2L), // double space -> empty middle token; a,b hit
      Seq(5L, 2L, 2L, 0L), // uppercase letters count as punct
      Seq(10L, 3L, 0L, 2L))) // 'of' not in set; 'the' twice
  }
}
