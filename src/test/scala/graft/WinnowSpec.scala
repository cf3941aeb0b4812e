package graft

import graft.functions.TextOps
import org.apache.spark.sql.functions._

/** Winnowing (q56) properties on real fixture docs: the scheme's defining
  * guarantee is that two docs sharing a substring of length ≥ k+w−1 = 11
  * chars share a fingerprint, which holds iff selection picks the min of
  * every w-window of the gram-hash sequence. Checked against an
  * independent driver-side recomputation. */
class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private val K = 8; private val W = 4; private val P = 1000000007L

  private def gramHashes(text: String): Vector[Long] =
    (0 to text.length - K).map { i =>
      text.substring(i, i + K).foldLeft(5381L)((h, c) => (h * 33 + c.toInt) % P)
    }.toVector

  private def winnow(text: String): Set[Long] = {
    val gh = gramHashes(text)
    (0 to gh.length - W).map(i => gh.slice(i, i + W).min).toSet
  }

  test("q56 equals an independent driver-side winnowing on the fixture docs") {
    val docs = Tables.t(spark, sf0001, "documents")
      .select("doc_id", "text").as[(Long, String)].collect()
    val got = TextOps.winnowFingerprint(spark, sf0001)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got.size == docs.count(_._2.length >= K + W - 1))
    docs.filter(_._2.length >= K + W - 1).foreach { case (id, text) =>
      val fps = winnow(text)
      assert(got(id) == ((fps.size.toLong, fps.sum)),
        s"doc $id: engine ${got(id)} vs recomputed (${fps.size}, ${fps.sum})")
    }
  }

  test("fused WinnowFingerprints expression == interpreted HOF pipeline (bit-identical arrays)") {
    val docs = Tables.t(spark, sf0001, "documents").select("doc_id", "text")
    val fused = docs.filter(length(col("text")) >= 11)
      .select(col("doc_id"),
        graft.expressions.TextHashes.winnow_fingerprints(col("text")).as("fps"))
      .as[(Long, Seq[Long])].collect().toMap
    val hof = TextOps.winnowFingerprintHof(docs)
      .as[(Long, Seq[Long])].collect().toMap
    assert(fused.keySet == hof.keySet)
    fused.foreach { case (id, fps) =>
      assert(fps == hof(id), s"doc $id: fused $fps vs HOF ${hof(id)}")
    }
    // codegen actually engaged (no CodegenFallback boxing)
    val plan = docs.filter(length(col("text")) >= 11)
      .select(graft.expressions.TextHashes.winnow_fingerprints(col("text")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("WholeStageCodegen") || !plan.contains("Fallback"), plan)
  }

  test("shared substring of length >= k+w-1 implies a shared fingerprint") {
    val shared = "abcdefghijk" // exactly k+w-1 = 11 chars
    val a = s"prefix one $shared tail xxxx"
    val b = s"completely different words $shared other ending"
    assert(winnow(a).intersect(winnow(b)).nonEmpty)
    // and each window of W consecutive gram hashes contributed its min
    for (text <- Seq(a, b)) {
      val gh = gramHashes(text); val fps = winnow(text)
      (0 to gh.length - W).foreach { i =>
        assert(fps.contains(gh.slice(i, i + W).min))
      }
    }
  }
}
