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

  test("dedup_fingerprint and sig_sorted_shingles callable from SQL") {
    GraftExtensions.register(spark)
    Seq((1L, "the quick brown fox jumps over the lazy dog"))
      .toDF("id", "text").createOrReplaceTempView("docs_ext_fp")
    val viaSql = spark.sql(
      """SELECT dedup_fingerprint(text, 8, 3) AS fp,
        |       sig_sorted_shingles(text, 8, 3).sig AS sig,
        |       sig_sorted_shingles(text, 8, 3).hs AS hs
        |FROM docs_ext_fp""".stripMargin)
      .as[(Seq[Long], Seq[Long], Seq[Long])].collect()(0)
    val viaColumn = spark.table("docs_ext_fp").select(
      graft.expressions.TextHashes.dedup_fingerprint(col("text"), 8, 3),
      graft.expressions.TextHashes.sig_sorted_shingles(col("text"), 8, 3)
        .getField("sig"),
      graft.expressions.TextHashes.sig_sorted_shingles(col("text"), 8, 3)
        .getField("hs"))
      .as[(Seq[Long], Seq[Long], Seq[Long])].collect()(0)
    assert(viaSql == viaColumn)
    assert(viaSql._1.size == 10 && viaSql._2.size == 8) // [f, sz, 8 mins]
  }

  test("shingle_hashes, repetition_stats and sorted_intersect_count callable from SQL") {
    GraftExtensions.register(spark)
    Seq((1L, "a b c d e a b c"), (2L, "c d e f g h i j"))
      .toDF("id", "text").createOrReplaceTempView("docs_ext2")
    val viaSql = spark.sql(
      """SELECT shingle_hashes(text) AS hs,
        |       repetition_stats(text) AS rep FROM docs_ext2 ORDER BY id""".stripMargin)
      .as[(Seq[Long], Seq[Long])].collect().toSeq
    val viaColumn = spark.table("docs_ext2").orderBy("id").select(
      graft.expressions.TextHashes.shingle_hashes(col("text"), 3),
      graft.expressions.TextHashes.repetition_stats(col("text")))
      .as[(Seq[Long], Seq[Long])].collect().toSeq
    assert(viaSql == viaColumn)
    // the SQL form of the q28/q29 verify tier: merge-intersect == set intersect
    val inter = spark.sql(
      """SELECT sorted_intersect_count(sort_array(a.hs), sort_array(b.hs)) AS i,
        |       size(array_intersect(a.hs, b.hs)) AS j
        |FROM (SELECT shingle_hashes(text) hs FROM docs_ext2 WHERE id = 1) a,
        |     (SELECT shingle_hashes(text) hs FROM docs_ext2 WHERE id = 2) b""".stripMargin)
      .as[(Long, Int)].collect()(0)
    assert(inter._1 == inter._2.toLong && inter._1 > 0)
  }

  test("SQL surface rejects wrong arity and casts int arrays instead of garbage counts") {
    GraftExtensions.register(spark)
    Seq((1L, "a b")).toDF("id", "text").createOrReplaceTempView("docs_ext4")
    // extra args must be an error, not silently dropped (the per-session
    // path used args.head and computed simhash64(text) for any arity)
    intercept[Exception] {
      spark.sql("SELECT simhash64(text, 7) FROM docs_ext4").collect()
    }
    // int-array literals: without declared input types, toLongArray read
    // packed 4-byte ints with an 8-byte stride — garbage counts, no
    // error; the declared long-array type makes analysis insert casts
    val n = spark.sql(
      "SELECT sorted_intersect_count(array(1, 2, 3), array(2, 3, 4)) AS i")
      .as[Long].collect()(0)
    assert(n === 2L)
  }

  test("token_ngrams callable from SQL, default width 3") {
    GraftExtensions.register(spark)
    Seq((1L, "a b c d e")).toDF("id", "text")
      .createOrReplaceTempView("docs_ext3")
    val viaSql = spark.sql(
      """SELECT token_ngrams(text) AS t3,
        |       token_ngrams(text, 2) AS t2 FROM docs_ext3""".stripMargin)
      .as[(Seq[String], Seq[String])].collect()(0)
    val viaColumn = spark.table("docs_ext3").select(
      graft.expressions.TextHashes.token_ngrams(col("text"), 3),
      graft.expressions.TextHashes.token_ngrams(col("text"), 2))
      .as[(Seq[String], Seq[String])].collect()(0)
    assert(viaSql == viaColumn)
    assert(viaSql._1 == Seq("a b c", "b c d", "c d e"))
    assert(viaSql._2 == Seq("a b", "b c", "c d", "d e"))
  }

  test("sorted_intersect_count rejects null elements loudly instead of counting garbage") {
    GraftExtensions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT sorted_intersect_count(array(1L, NULL, 3L), array(1L, 3L))")
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else t.getMessage +: msgs(t.getCause)
    assert(msgs(e).exists(m => m != null && m.contains("null element")),
      s"expected the precondition failure to surface, got: ${msgs(e)}")
  }

  test("sign_band_vals bands a malformed embedding as all-zeros, like the composition") {
    val planes = Seq(Seq(1.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0)) // dims = 3
    val rows = Seq(
      (1L, Seq(1.0, 2.0)),               // too short: would have crashed
      (2L, Seq(1.0, 2.0, 3.0, 4.0)),     // too long: silently truncated before
      (3L, Seq[Any](1.0, null, 3.0))) // null element: garbage read before
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("v", ArrayType(DoubleType, containsNull = true))))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r =>
        org.apache.spark.sql.Row(r._1, r._2))), schema)
    val out = df.select(col("id"),
      graft.expressions.VectorHashes.sign_band_vals(col("v"), planes, 2).as("b"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(out.values.forall(_ == Seq(0L)),
      s"malformed vectors must band to all-zero values, got $out")
  }
}
