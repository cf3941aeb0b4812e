package graft

import org.apache.spark.sql.functions._

/** HLL sketch (q18) tracks exact distincts tightly, and the multimodal
  * decode plumbing produces the stub's deterministic output. */
class ApproxSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct within 5% of exact per day") {
    val approx = operators.Relational.approxDau(spark, sf0001)
      .as[(String, Long)].collect().toMap
    val exact = operators.Relational.dauTotal(spark, sf0001)
      .as[(String, Long)].collect().toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (dt, n) =>
      assert(math.abs(approx(dt) - n) <= math.max(1, n * 0.05), s"day $dt: $n vs ${approx(dt)}")
    }
  }

  test("multimodal decode: per-partition batch path matches the stub applied per row") {
    val media = functions.Multimodal.mediaTable(spark, sf0001)
      .select(col("doc_id"), col("payload"))
      .as[functions.Multimodal.MediaRow]
    val viaPartitions = functions.Multimodal.decodeBatchPartitions(media)
      .collect().map(d => d.doc_id -> ((d.width, d.height, d.checksum))).toMap
    val direct = media.collect().map { r =>
      val m = functions.Multimodal.decodeStub(r.payload)
      r.doc_id -> ((m.width, m.height, m.checksum))
    }.toMap
    assert(viaPartitions == direct)
    assert(direct.nonEmpty)
  }
}
