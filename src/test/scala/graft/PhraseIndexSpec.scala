package graft

import graft.functions.TextOps
import org.apache.spark.sql.functions._

/** Phrase inverted index (q65), index-backed search (q66), and the exact
  * global-decile gate (q67). The load-bearing assertion is the q66
  * equivalence: posting-list lookup through the index must coincide with
  * a substring containment scan of the raw corpus — the same
  * cross-validation the DuckDB oracle runs, proven here in-engine so the
  * property is pinned at spec granularity too.
  */
class PhraseIndexSpec extends SparkSpec {

  test("fused TokenNgrams == interpreted HOF trigram twin") {
    val docs = Tables.t(spark, sf0001, "documents")
    val fused = docs.select(col("doc_id"),
      graft.expressions.TextHashes.token_ngrams(col("text"), 3).as("tgs"))
    val hof = docs
      .withColumn("toks", split(col("text"), " "))
      .select(col("doc_id"), TextOps.trigramPhrasesHof.as("tgs"))
    assert(fused.exceptAll(hof).count() === 0)
    assert(hof.exceptAll(fused).count() === 0)
    // multiplicity and order preserved, not a distinct set
    val n = docs.select(sum(greatest(
      size(split(col("text"), " ")) - 2, lit(0)))).head.getLong(0)
    assert(fused.select(sum(size(col("tgs")))).head.getLong(0) === n)
  }

  test("q65: df/occ/posting checksums are internally consistent") {
    val idx = TextOps.phraseIndex(spark, sf0001).cache()
    val bad = idx.filter(
      col("df") > col("occ") ||
        col("min_doc") > col("max_doc") ||
        // sum of df distinct ids is bounded by df × the extremes
        col("id_sum") < col("df") * col("min_doc") ||
        col("id_sum") > col("df") * col("max_doc") ||
        col("df") < 3)
    assert(bad.count() === 0)
    assert(idx.count() > 0)
    // phrases are unique index keys
    assert(idx.count() === idx.select(col("phrase")).distinct().count())
    idx.unpersist()
  }

  test("q66: index posting lookup == substring containment scan") {
    val viaIndex = TextOps.phraseSearch(spark, sf0001)
    val phrases = viaIndex.select(col("phrase")).distinct()
    val docs = Tables.t(spark, sf0001, "documents")
    val viaScan = docs
      .crossJoin(broadcast(phrases))
      .filter(contains(concat(lit(" "), col("text"), lit(" ")),
        concat(lit(" "), col("phrase"), lit(" "))))
      .select(col("phrase"), col("doc_id"))
    assert(viaIndex.exceptAll(viaScan).count() === 0)
    assert(viaScan.exceptAll(viaIndex).count() === 0)
    assert(viaIndex.count() > 0)
  }

  test("streaming index: batched ingest == batch q65; replay and compact are no-ops") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("phraseidx").toString
    val docs = Tables.t(spark, sf0001, "documents")
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().sortBy(_._1)
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = in.toDS().toDF("doc_id", "text")
      .writeStream
      .foreachBatch(graft.sinks.PhraseIndexSink.writer(dir) _)
      .outputMode("append").start()
    try {
      docs.grouped(docs.length / 3 + 1).foreach { b =>
        in.addData(b.toIndexedSeq); q.processAllAvailable()
      }
    } finally q.stop()
    val batch = TextOps.phraseIndex(spark, sf0001)
    def readIdx() = graft.sinks.PhraseIndexSink.read(spark, dir, minDf = 3)
    assert(readIdx().exceptAll(batch).count() === 0)
    assert(batch.exceptAll(readIdx()).count() === 0)
    // replayed batch: overwrite-by-own-id rewrites identical content
    // (the r17 row-ledger protocol — IngestSegments, not seq= markers)
    val firstCut = docs.grouped(docs.length / 3 + 1).next()
    graft.sinks.PhraseIndexSink.writer(dir)(
      firstCut.toIndexedSeq.toDF("doc_id", "text"), 0L)
    assert(readIdx().exceptAll(batch).count() === 0)
    // compact folds all but the replayable newest batch (fold + tail)
    graft.sinks.PhraseIndexSink.compact(spark, dir)
    assert(graft.sinks.Hfs.childDirs(spark, dir, "ingest=").size === 2)
    assert(readIdx().exceptAll(batch).count() === 0)
    assert(batch.exceptAll(readIdx()).count() === 0)
    // a crashed compact's leftover staging is derived data from
    // segments that were never deleted — discarded and refolded
    graft.sinks.Hfs.mkdirs(spark, s"$dir/__compact_staging_-99")
    graft.sinks.PhraseIndexSink.compact(spark, dir)
    assert(graft.sinks.Hfs.childDirs(spark, dir, "__compact_staging_").isEmpty)
    assert(readIdx().exceptAll(batch).count() === 0)
  }

  test("phrase retraction: a deleted doc leaves df/occ AND the min/max posting bounds; resurrection restores them") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("phraseret").toString
    val w = graft.sinks.PhraseIndexSink.writer(dir) _
    val r = graft.sinks.PhraseIndexSink.retract(dir) _
    // doc 1 is the MIN and doc 9 the MAX posting of "a b c" — exactly
    // the aggregates no additive store could repair after a delete
    val d1 = (1L, "a b c x1 a b c")
    val d5 = (5L, "a b c y1 y2")
    val d9 = (9L, "z1 a b c")
    def idx() = graft.sinks.PhraseIndexSink.read(spark, dir)
      .filter(col("phrase") === "a b c")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet
    w(Seq(d1, d5).toDF("doc_id", "text"), 0L)
    w(Seq(d9).toDF("doc_id", "text"), 1L)
    assert(idx() == Set(("a b c", 3L, 4L, 1L, 9L, 15L)))
    // retract the min doc: min_doc must move UP to 5 (second-min)
    r(Seq(1L).toDF("doc_id"), 2L)
    assert(idx() == Set(("a b c", 2L, 2L, 5L, 9L, 14L)),
      "min_doc must re-derive from the surviving per-doc rows")
    // fold with the tombstone, then retract the max in the live tail
    graft.sinks.PhraseIndexSink.compact(spark, dir)
    assert(idx() == Set(("a b c", 2L, 2L, 5L, 9L, 14L)))
    r(Seq(9L).toDF("doc_id"), 3L)
    assert(idx() == Set(("a b c", 1L, 1L, 5L, 5L, 5L)),
      "max_doc must re-derive after a live-tail retraction")
    // resurrection: a higher-ing re-ingest restores doc 1's postings
    w(Seq(d1).toDF("doc_id", "text"), 4L)
    assert(idx() == Set(("a b c", 2L, 3L, 1L, 5L, 6L)))
  }

  test("q73 chunks: full token coverage, stride-exact overlap, hash = content") {
    import spark.implicits._
    val chunks = TextOps.chunkSplit(spark, sf0001)
      .select(col("doc_id"), col("chunk_idx"), col("chunk_len"))
      .as[(Long, Long, Long)].collect()
    val toks = Tables.t(spark, sf0001, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
      .as[(Long, Long)].collect().toMap
    chunks.groupBy(_._1).foreach { case (doc, cs) =>
      val n = toks(doc)
      val ordered = cs.sortBy(_._2)
      // dense indices; every chunk is full-width except possibly the tail
      assert(ordered.map(_._2).toSeq == ordered.indices.map(_.toLong))
      ordered.init.foreach(c => assert(c._3 == 32L || c._2 * 24 + c._3 == n))
      // the last chunk reaches the end of the doc exactly
      val last = ordered.last
      assert(last._2 * 24 + last._3 == n, s"doc $doc: tail not covered")
      // number of chunks matches the stride recurrence
      assert(ordered.length == ((n - 1) / 24 + 1), s"doc $doc: chunk count")
    }
  }

  test("q74 buckets: lossless doc count, power-of-two bounds, fill in (0,1]") {
    import spark.implicits._
    val out = TextOps.lengthBuckets(spark, sf0001)
      .select(col("bucket"), col("n_docs"), col("tok_total"),
        col("pad_waste"), col("fill"))
      .as[(Long, Long, Long, Long, Double)].collect()
    val n = Tables.t(spark, sf0001, "documents").count()
    assert(out.map(_._2).sum == n)
    out.foreach { case (bucket, nd, tok, pad, fill) =>
      assert((bucket & (bucket - 1)) == 0L, s"bucket $bucket not a power of two")
      assert(pad == nd * bucket - tok, s"bucket $bucket: waste identity")
      assert(fill > 0.0 && fill <= 1.0, s"bucket $bucket: fill $fill")
      // every doc fits its bucket; above the floor bucket none would
      // have fit one bucket lower (n_tokens > bucket/2 per doc)
      assert(tok <= nd * bucket, s"bucket $bucket: mass over capacity")
      if (bucket > 16L)
        assert(tok > nd * bucket / 2, s"bucket $bucket: doc fits lower bucket")
    }
  }

  test("q67: value-threshold decile keeps ceil(N/10) up to boundary ties") {
    val docs = Tables.t(spark, sf0001, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .cache()
    val n = docs.count()
    val out = TextOps.decileFilter(spark, sf0001).cache()
    val kept = out.agg(sum(col("n_kept"))).head.getLong(0)
    val thr = out.agg(max(col("threshold"))).head.getLong(0)
    // every doc at-or-above the threshold is kept, none below
    assert(kept === docs.filter(col("n_tokens") >= thr).count())
    // the kept set stays within the decile budget, and the threshold is
    // maximal: admitting the next distinct value would blow the budget
    val target = (n + 9) / 10
    assert(kept <= target)
    val below = docs.filter(col("n_tokens") < thr).agg(max(col("n_tokens"))).head
    if (!below.isNullAt(0))
      assert(docs.filter(col("n_tokens") >= below.getLong(0)).count() > target)
    out.unpersist(); docs.unpersist()
  }
}
