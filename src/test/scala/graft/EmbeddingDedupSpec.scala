package graft

import graft.functions.SimilarityOps
import org.apache.spark.sql.functions._

/** Guards q54 (banded hyperplane-LSH embedding dedup): its banding must
  * recall every exact cosine-≥-0.35 pair on both driver fixtures (the
  * planes and data are deterministic, so recall is a fixed number per
  * corpus — measured 1.0 at 16 bands × 2 bits), and its candidates must
  * come from an equality join, never an all-pairs comparison. */
class EmbeddingDedupSpec extends SparkSpec {
  import spark.implicits._

  private def exactPairs(dir: String) = {
    val e = Tables.t(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        round(SimilarityOps.cosine(col("a.v"), col("b.v")), 6).as("cosine"))
      .filter(col("cosine") >= 0.35)
      .as[(Long, Long, Double)].collect().toSet
  }

  test("q54 banding recalls the full exact pair set on sf0.001 AND the driver's sf0.01") {
    for (dir <- Seq(sf0001, "/root/testdata/sf0.01")) {
      val got = SimilarityOps.embeddingDupsBucketed(spark, dir)
        .as[(Long, Long, Double)].collect().toSet
      val exact = exactPairs(dir)
      assert(exact.size > 200, s"$dir fixture should have a few hundred ≥0.35 pairs")
      val missed = exact -- got
      assert(missed.isEmpty, s"$dir: banding missed ${missed.size} pairs, e.g. ${missed.take(5)}")
      // q54's semantics are band-collision ∩ cosine≥t, so got ⊆ exact too:
      val extra = got -- exact
      assert(extra.isEmpty, s"$dir: pairs outside the exact set: ${extra.take(5)}")
    }
  }

  test("candidates come from an equality join on (band, value), not an all-pairs comparison") {
    val planes = SimilarityOps.hyperplanes(64, 32)
    val e = Tables.t(spark, sf0001, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val banded = e.select(col("vec_id"),
      explode(SimilarityOps.signBands(col("v"), planes, 2)).as("b"))
    val cand = banded.as("a").join(banded.as("b"),
      col("a.b") === col("b.b") && col("a.vec_id") < col("b.vec_id"))
    cand.collect()
    val exec = cand.queryExecution.executedPlan.toString
    assert(!exec.contains("CartesianProduct") && !exec.contains("BroadcastNestedLoop"),
      s"band join degenerated to all-pairs:\n$exec")
  }

  test("signBands packs every plane exactly once and bit-agrees with bucketOf") {
    // 32 planes / 2-bit bands: band b bit i == bucketOf bit (2b+i) for the
    // same family — reassembling band values must reproduce the 32-bit
    // signature bucketOf computes over the identical planes.
    val planes = SimilarityOps.hyperplanes(64, 32)
    val e = Tables.t(spark, sf0001, "embeddings").limit(50)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val sig = e.select(col("vec_id"),
        SimilarityOps.bucketOf(col("v"), planes).as("sig"))
      .as[(Long, Long)].collect().toMap
    val rebuilt = e.select(col("vec_id"),
        explode(SimilarityOps.signBands(col("v"), planes, 2)).as("b"))
      .select(col("vec_id"), col("b.band"), col("b.bv"))
      .as[(Long, Int, Long)].collect()
      .groupBy(_._1).map { case (id, bs) =>
        id -> bs.map { case (_, band, bv) => bv << (2 * band) }.reduce(_ | _)
      }
    rebuilt.foreach { case (id, s) =>
      assert(s == sig(id), s"vec $id: band reassembly $s != signature ${sig(id)}")
    }
  }
}
