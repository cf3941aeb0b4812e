package graft

import graft.functions.SimilarityOps
import org.apache.spark.sql.functions._

/** q58 int8 quantization invariants: codes stay in [-127, 127], and the
  * per-dim floor error is under one quantization step, so the
  * reconstruction RMSE is bounded by scale/127. */
class QuantSpec extends SparkSpec {
  import spark.implicits._

  test("codes bounded, rmse under one quant step") {
    val rows = SimilarityOps.embeddingQuant(spark, sf0001)
      .as[(Long, Double, Long, Double)].collect()
    assert(rows.length > 0)
    rows.foreach { case (id, scale, qnorm2, rmse) =>
      assert(scale > 0)
      // 64 dims × 127² is the hard ceiling on the quantized norm
      assert(qnorm2 <= 64L * 127 * 127, s"vec $id qnorm2 $qnorm2")
      assert(rmse >= 0 && rmse <= scale / 127.0 + 1e-9,
        s"vec $id: rmse $rmse exceeds one quant step ${scale / 127.0}")
    }
  }

  test("quantized codes reconstruct within one step per dimension") {
    val e = Tables.t(spark, sf0001, "embeddings").limit(50)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("scale", expr("array_max(transform(v, x -> abs(x)))"))
      .filter(col("scale") > 0)
      .withColumn("qv",
        expr("transform(v, x -> cast(floor(x * 127.0 / scale) AS BIGINT))"))
      .select(col("vec_id"), col("v"), col("scale"), col("qv"))
      .as[(Long, Seq[Double], Double, Seq[Long])].collect()
    e.foreach { case (id, v, scale, qv) =>
      v.zip(qv).foreach { case (x, q) =>
        assert(q >= -127 && q <= 127, s"vec $id code $q out of range")
        val err = math.abs(x - q * scale / 127.0)
        assert(err < scale / 127.0 + 1e-12, s"vec $id dim error $err")
      }
    }
  }
}
