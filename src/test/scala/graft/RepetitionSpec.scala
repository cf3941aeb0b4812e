package graft

import graft.functions.TextOps
import org.apache.spark.sql.functions._

/** q59 (Gopher-style repetition stats) edge cases and an independent
  * recomputation on fixture docs, plus q60 mixture-sampling properties. */
class RepetitionSpec extends SparkSpec {
  import spark.implicits._

  test("q60 mixture sampling: deterministic, rate-tracking, full-keep for rate-1 langs") {
    val r1 = TextOps.mixtureSample(spark, sf0001)
      .as[(String, Long, Long, Long)].collect().toSet
    val r2 = TextOps.mixtureSample(spark, sf0001)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(r1 == r2, "hash sampling must be run-deterministic")
    val byLang = r1.map(r => r._1 -> r).toMap
    // rate-1.0 languages keep everything
    Seq("zh", "es", "de", "fr").foreach { l =>
      val (_, total, kept, _) = byLang(l)
      assert(kept == total, s"$l: rate-1.0 must keep all ($kept/$total)")
    }
    // en down-samples near its 0.4 target (binomial tolerance on ~200 docs)
    val (_, enTotal, enKept, _) = byLang("en")
    val rate = enKept.toDouble / enTotal
    assert(rate > 0.25 && rate < 0.55, s"en realized rate $rate far from 0.4")
  }

  test("edge cases: single-token and fully-repetitive docs") {
    val dir = java.nio.file.Files.createTempDirectory("rep").toString
    Seq((1L, "solo"), (2L, "ha ha ha ha"), (3L, "a b a b a b"))
      .toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val got = TextOps.repetitionStats(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got(1L) == ((1L, 1L, 0L, 0L)))       // no n-grams at all
    assert(got(2L) == ((4L, 1L, 3L, 2L)))       // "ha ha" x3, "ha ha ha" x2
    assert(got(3L) == ((6L, 2L, 3L, 2L)))       // "a b" x3, "a b a" x2
  }

  test("fused RepetitionStats expression == interpreted HOF pipeline") {
    val docs = Tables.t(spark, sf0001, "documents").select("doc_id", "text")
    val fused = TextOps.repetitionStats(spark, sf0001)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val hof = TextOps.repetitionStatsHof(docs)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(fused == hof,
      s"diff=${(fused -- hof).take(3)} / ${(hof -- fused).take(3)}")
  }

  test("fixture docs match an independent driver-side recomputation") {
    val docs = Tables.t(spark, sf0001, "documents")
      .select("doc_id", "text").as[(Long, String)].collect().take(100)
    val got = TextOps.repetitionStats(spark, sf0001)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    docs.foreach { case (id, text) =>
      val toks = text.split(" ", -1)
      val bgs = toks.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSeq
      val tgs = toks.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSeq
      def top(xs: Seq[String]) =
        if (xs.isEmpty) 0L else xs.groupBy(identity).values.map(_.size).max.toLong
      assert(got(id) == ((toks.length.toLong, toks.distinct.length.toLong,
        top(bgs), top(tgs))), s"doc $id")
    }
  }
}
