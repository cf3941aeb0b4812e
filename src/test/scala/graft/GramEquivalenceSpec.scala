package graft

import graft.expressions.{GramBuffer, GramGridAgg}
import graft.functions.SimilarityOps
import org.apache.spark.sql.functions._

/** Pins [[graft.expressions.GramGridAgg]] (the q141 engine) bit-exactly
  * to the round-11 explode form it replaced, plus the 128-bit cell
  * arithmetic the fixture can't reach. */
class GramEquivalenceSpec extends SparkSpec {
  import spark.implicits._

  test("q141 aggregator ≡ explode form, bit-exact, on the sf0.001 fixture") {
    val emb = Tables.t(spark, sf0001, "embeddings")
    val agg = SimilarityOps.embeddingGramOver(emb)
      .as[(Long, Long, Double)].collect().sortBy(r => (r._1, r._2))
    val exp = SimilarityOps.embeddingGramExplodeOver(emb)
      .as[(Long, Long, Double)].collect().sortBy(r => (r._1, r._2))
    assert(agg.length == exp.length && agg.length > 0)
    agg.zip(exp).foreach { case (a, e) =>
      assert(a._1 == e._1 && a._2 == e._2)
      // BIT equality, not tolerance — both forms sum the same exact
      // integers and round once at the end
      assert(java.lang.Double.doubleToRawLongBits(a._3) ==
        java.lang.Double.doubleToRawLongBits(e._3),
        s"cell (${a._1},${a._2}): agg=${a._3} explode=${e._3}")
    }
  }

  test("null elements and null rows match the explode form's sum-skips-null semantics") {
    val rows = Seq(
      Some(Seq(Some(1.0), Some(2.0), Some(3.0))),
      Some(Seq(Some(0.5), None, Some(-1.5))), // null element
      None, // null row
      Some(Seq(Some(-2.0), Some(4.0), Some(0.25))))
      .toDF("embedding")
      .select(col("embedding").cast("array<double>").as("embedding"))
    val agg = SimilarityOps.embeddingGramOver(rows)
      .as[(Long, Long, Double)].collect().toSet
    val exp = SimilarityOps.embeddingGramExplodeOver(rows)
      .as[(Long, Long, Double)].collect().toSet
    assert(agg == exp, s"agg=$agg exp=$exp")
    assert(agg.size == 6) // d=3 triangle
  }

  test("empty table yields the empty (i, j, gram) grid in both forms") {
    val empty = spark.range(0)
      .select(expr("array(0.0d)").as("embedding")).filter(lit(false))
    assert(SimilarityOps.embeddingGramOver(empty).count() == 0)
    assert(SimilarityOps.embeddingGramExplodeOver(empty).count() == 0)
  }

  test("128-bit cells: sums past int64 stay exact (the 100 TB envelope the fixture can't reach)") {
    val buf = new GramBuffer(-1, null, null)
    buf.init(1) // one cell
    // 10^14-scale products: 10^5 adds of 9.2e13 pass Long.MaxValue
    val p = 92000000000000L
    var k = 0
    while (k < 200000) { buf.add(0, p); k += 1 }
    val want = BigInt(p) * 200000 // 1.84e19 > 9.2e18 = Long.MaxValue
    assert(want > BigInt(Long.MaxValue))
    assert(buf.cellDouble(0) == want.toDouble)
    // negative direction too
    var m = 0
    while (m < 400000) { buf.add(0, -p); m += 1 }
    val want2 = want - BigInt(p) * 400000
    assert(want2 < BigInt(Long.MinValue))
    assert(buf.cellDouble(0) == want2.toDouble)
    // merge path: two overflowed buffers combine exactly
    val b2 = new GramBuffer(-1, null, null)
    b2.init(1)
    var n = 0
    while (n < 300000) { b2.add(0, p); n += 1 }
    val merged = GramGridAgg(
      org.apache.spark.sql.graftbridge.Bridge.expression(lit(1)))
      .merge(buf, b2)
    assert(merged.cellDouble(0) == (want2 + BigInt(p) * 300000).toDouble)
  }

  test("heterogeneous row dimensionality is refused loudly, not silently misaligned") {
    val rows = Seq(Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0)).toDF("embedding")
    val e = intercept[Exception] {
      SimilarityOps.embeddingGramOver(rows).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("dimensionality")), s"got: $e")
  }
}
