package graft

import graft.operators.Analytics
import org.apache.spark.sql.functions._

/** q57 packing invariants: every document lands in exactly one chunk,
  * chunks are contiguous in doc order within their shard, and every
  * chunk except a shard's last spans at least the token budget (a doc's
  * first token decides its bin, so a bin stops accepting docs only once
  * the running total has crossed the next budget boundary). The window
  * must partition by shard — packing never funnels the corpus through
  * one partition. */
class SequencePackSpec extends SparkSpec {
  import spark.implicits._

  private val Budget = 2048L

  test("q57: lossless, contiguous, and budget-bounded per shard") {
    val bins = Analytics.sequencePack(spark, sf0001)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    val docs = Tables.t(spark, sf0001, "documents")
      .select(col("doc_id"), (col("doc_id") % 8).as("shard"),
        size(split(col("text"), " ")).cast("long").as("n"))
      .as[(Long, Long, Long)].collect()
    // lossless: every doc counted exactly once
    assert(bins.map(_._3).sum == docs.length)
    assert(bins.map(_._4).sum == docs.map(_._3).sum)
    bins.groupBy(_._1).foreach { case (shard, sbins) =>
      val ordered = sbins.sortBy(_._2)
      // bins are dense 0..n-1 and doc-id ranges don't interleave
      assert(ordered.map(_._2).toSeq == ordered.indices.map(_.toLong))
      ordered.sliding(2).foreach {
        case Array(a, b) => assert(a._6 < b._5,
          s"shard $shard: bin ${a._2} range overlaps bin ${b._2}")
        case _ => ()
      }
      // every non-final bin spans ≥ budget tokens once its last doc lands
      // (fill + the spillover of its final doc crosses the boundary)
      ordered.init.zip(ordered.tail).foreach { case (a, b) =>
        assert(a._4 + docsTok(docs, shard, b._5) > Budget,
          s"shard $shard bin ${a._2}: closed below budget")
      }
    }
  }

  private def docsTok(docs: Array[(Long, Long, Long)], shard: Long,
      docId: Long): Long =
    docs.collectFirst { case (id, s, n) if id == docId && s == shard => n }.get

  test("streaming packStream closed chunks == batch q57 minus each shard's open chunk") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.t(spark, sf0001, "documents")
      .select((col("doc_id") % 8).as("shard"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n"))
      .as[(Long, Long, Long)].collect().sortBy(_._2)
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long, Long)]
    val q = graft.streaming.Streams.packStream(in.toDS())
      .writeStream.format("memory").queryName("packed")
      .outputMode("append").start()
    try {
      // three arbitrary batch cuts — chunk boundaries must not care
      docs.grouped(docs.length / 3 + 1).foreach { b =>
        in.addData(b.toIndexedSeq); q.processAllAvailable()
      }
      val streamed = spark.table("packed")
        .as[graft.streaming.Streams.PackedBin].collect()
        .map(b => (b.shard, b.bin, b.n_docs, b.tok_filled, b.first_doc, b.last_doc))
        .toSet
      val batch = Analytics.sequencePack(spark, sf0001)
        .as[(Long, Long, Long, Long, Long, Long)].collect()
      val batchClosed = batch.groupBy(_._1).values
        .flatMap(sbins => sbins.sortBy(_._2).init).toSet
      assert(streamed == batchClosed,
        s"missing=${(batchClosed -- streamed).take(3)} extra=${(streamed -- batchClosed).take(3)}")
    } finally q.stop()
  }

  test("q68 greedy no-split: lossless, within-budget, and maximal") {
    val bins = Analytics.packGreedy(spark, sf0001)
      .select(col("shard"), col("bin"), col("n_docs"), col("tok_filled"),
        col("first_doc"), col("last_doc"))
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    val docs = Tables.t(spark, sf0001, "documents")
      .select(col("doc_id"), (col("doc_id") % 8).as("shard"),
        size(split(col("text"), " ")).cast("long").as("n"))
      .as[(Long, Long, Long)].collect()
    // lossless: every doc in exactly one bin, every token accounted for
    assert(bins.map(_._3).sum == docs.length)
    assert(bins.map(_._4).sum == docs.map(_._3).sum)
    bins.groupBy(_._1).foreach { case (shard, sbins) =>
      val ordered = sbins.sortBy(_._2)
      assert(ordered.map(_._2).toSeq == ordered.indices.map(_.toLong))
      // no-split: a bin only exceeds the budget when it holds exactly
      // one (oversize) document
      ordered.foreach { b =>
        assert(b._4 <= Budget || b._3 == 1L,
          s"shard $shard bin ${b._2}: multi-doc bin over budget")
      }
      // greedy maximality: the next bin's first doc would NOT have fit
      ordered.init.zip(ordered.tail).foreach { case (a, b) =>
        assert(a._4 + docsTok(docs, shard, b._5) > Budget,
          s"shard $shard bin ${a._2}: closed early (next doc fit)")
      }
      // contiguity in doc order
      ordered.sliding(2).foreach {
        case Array(a, b) => assert(a._6 < b._5)
        case _ => ()
      }
    }
  }

  test("q57 plan: the packing window partitions by shard (no global window)") {
    val df = Analytics.sequencePack(spark, sf0001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert("Window .*partitionBy|Window \\[.*windowspecdefinition\\(shard".r
      .findFirstIn(plan).isDefined ||
      plan.contains("windowspecdefinition(shard"),
      s"window must be partitioned by shard:\n$plan")
  }
}
