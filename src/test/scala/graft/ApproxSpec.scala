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

  test("media features: frame-sample -> resize -> extract is deterministic and shaped") {
    import functions.Multimodal._
    val payload = ("abcdefgh" * 40).getBytes("UTF-8")
    val frames = frameSample(payload, 4, 64)
    assert(frames.length == 4 && frames.forall(_.length <= 64))
    assert(resizeStub(payload, 16).length == 16)
    assert(resizeStub("ab".getBytes, 8).length == 8) // zero-padded
    val f1 = featuresFromPayload(payload, 16)
    val f2 = featuresFromPayload(payload, 16)
    assert(f1.toSeq == f2.toSeq && f1.length == 16)
    assert(f1.forall(x => x >= -1.01f && x <= 1.01f))
    // distinct payloads → distinct features
    val g = featuresFromPayload(("zzzzzzzz" * 40).getBytes("UTF-8"), 16)
    assert(f1.toSeq != g.toSeq)
    // end-to-end over fixtures
    val out = functions.Multimodal.mediaFeaturesQ(spark, sf0001)
    assert(out.count() == 500 && out.columns.toSeq ==
      Seq("doc_id", "n_frames", "feature_norm"))
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
