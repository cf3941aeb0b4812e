package graft

import org.apache.spark.sql.functions._

/** HLL sketch (q18) tracks exact distincts tightly, and the multimodal
  * decode plumbing produces the stub's deterministic output. */
class ApproxSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct within 5% of exact per day; q18 emission stays in-bound") {
    // q18 now emits (dt, dau_exact, within_bound) so DuckDB can oracle it;
    // assert the emission AND the tighter 5% envelope on the raw sketch.
    val q18 = operators.Relational.approxDau(spark, sf0001)
      .as[(String, Long, Boolean)].collect()
    val exact = operators.Relational.dauTotal(spark, sf0001)
      .as[(String, Long)].collect().toMap
    assert(q18.map(_._1).toSet == exact.keySet)
    q18.foreach { case (dt, n, ok) =>
      assert(n == exact(dt), s"day $dt: dau_exact $n vs ${exact(dt)}")
      assert(ok, s"day $dt: sketch left the 15% envelope")
    }
    val raw = Tables.t(spark, sf0001, "events")
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("dt"))
      .agg(approx_count_distinct(col("user_id")).as("a"))
      .as[(String, Long)].collect().toMap
    exact.foreach { case (dt, n) =>
      assert(math.abs(raw(dt) - n) <= math.max(1, n * 0.05), s"day $dt: $n vs ${raw(dt)}")
    }
  }

  test("approx_percentile tracks exact quantiles per group (the 100 TB quantile path)") {
    // q48 computes EXACT interpolated quantiles (full sort state per
    // group); at scale the sketch form is the right tool — bound its
    // error against the exact oracle-checked result here.
    val exact = operators.Analytics.quantiles(spark, sf0001)
      .as[(String, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val approx = Tables.t(spark, sf0001, "events")
      .groupBy(col("event_type"))
      .agg(
        expr("approx_percentile(value, 0.25, 1000)").as("p25"),
        expr("approx_percentile(value, 0.5, 1000)").as("p50"),
        expr("approx_percentile(value, 0.75, 1000)").as("p75"))
      .as[(String, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (g, (e25, e50, e75)) =>
      val (a25, a50, a75) = approx(g)
      Seq((e25, a25), (e50, a50), (e75, a75)).foreach { case (e, a) =>
        assert(math.abs(a - e) <= math.max(1.0, math.abs(e)) * 0.05,
          s"group $g: approx $a vs exact $e")
      }
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
