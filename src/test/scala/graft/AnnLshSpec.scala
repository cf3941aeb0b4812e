package graft

import graft.functions.SimilarityOps
import org.apache.spark.sql.functions._

/** Random-hyperplane LSH: engineered near-neighbors of the query land in
  * nearby buckets (recall), and the candidate filter genuinely prunes. */
class AnnLshSpec extends SparkSpec {

  test("stored LSH layout at a non-default width: 32-dim build, probe from query length") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new java.util.Random(67)
    def rv() = Array.fill(32)(rnd.nextGaussian()).toSeq
    val base = rv()
    val rows = (0L, base) +:
      ((1 to 3).map(i => (i.toLong, base.map(x => x + 0.03 * rnd.nextGaussian()))) ++
        (4 to 60).map(i => (i.toLong, rv())))
    val dir = java.nio.file.Files.createTempDirectory("graft-lsh32").toString
    functions.SimilarityOps.buildAnnLshIndex(
      rows.toDF("vec_id", "v"), dir, bits = 8, dims = 32)
    // probe regenerates the 32-dim plane family from the STORED pin
    val top = functions.SimilarityOps.probeAnnLshIndex(
        spark, dir, base.toArray, bits = 8, probe = 2, k = 3)
      .select("neighbor_id").as[Long].collect().toSet
    assert(top == Set(1L, 2L, 3L), s"32-dim near-dups lost: $top")
    // a width-mismatched query is refused loudly — regenerating the
    // family from the query's own length probed wrong buckets and
    // returned null-scored noise with no error
    intercept[IllegalArgumentException] {
      functions.SimilarityOps.probeAnnLshIndex(
        spark, dir, Array.fill(64)(0.1), bits = 8, probe = 2, k = 3)
    }
  }
  import spark.implicits._

  /** Bucket ids of every partition an executed probe actually READ.
    * Pruning moved from a PartitionFilters predicate to LISTING time
    * (only the probed dirs are handed to the reader), so the honest
    * pin is the selected-partition set — it covers both mechanisms. */
  private def readBucketSet(df: org.apache.spark.sql.DataFrame): Set[Long] =
    readPartitionValues(df, "bucket")

  /** The ≤37-of-256 bucket set a probe of fixture vec 0 at hamming ≤ 2
    * may read, recomputed exactly as the probe does (stored planes). */
  private def probedSetOfVec0: Set[Long] = {
    val qv = graft.Tables.t(spark, sf0001, "embeddings")
      .filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>"))
      .collect()(0).getSeq[Double](0).toArray
    val planes = SimilarityOps.hyperplanes(64, 8)
    val qb = planes.zipWithIndex.map { case (h, i) =>
      if (qv.zip(h).map { case (a, b) => a * b }.sum > 0) 1L << i else 0L
    }.reduce(_ | _)
    (0L until 256L).filter(b => java.lang.Long.bitCount(b ^ qb) <= 2).toSet
  }

  private val rnd = new java.util.Random(7)
  private def noisy(base: Array[Double], eps: Double) =
    base.map(x => x + eps * rnd.nextGaussian())

  test("probing a missing index fails loudly instead of answering 0 neighbors") {
    // a typo'd or never-built path has no geometry pin, so
    // probedBucketSet falls back to the query width without error — the
    // read itself must stay LOUD (the empty-kept branch reads the root),
    // or a misconfigured caller gets a plausible empty result forever
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      functions.SimilarityOps.probeAnnLshIndex(
        spark, "/tmp/graft-no-such-index", Array.fill(16)(1.0),
        bits = 4, probe = 1, k = 3).collect()
    }
    assert(e.getCondition == "PATH_NOT_FOUND", e.toString)
  }

  test("engineered cluster: all near-duplicates of the query share its probe range") {
    val base = Array.fill(64)(rnd.nextGaussian())
    val rows =
      (1 to 5).map(i => (i.toLong, noisy(base, 0.01))) ++      // near-dups of query
        (6 to 50).map(i => (i.toLong, Array.fill(64)(rnd.nextGaussian())))
    val df = ((0L, base) +: rows).toDF("vec_id", "v")
    val planes = SimilarityOps.hyperplanes(64, 8)
    val buckets = df.withColumn("bucket", SimilarityOps.bucketOf(col("v"), planes))
      .select("vec_id", "bucket").as[(Long, Long)].collect().toMap
    val qb = buckets(0L)
    (1 to 5).foreach { i =>
      val ham = java.lang.Long.bitCount(buckets(i.toLong) ^ qb)
      assert(ham <= 2, s"near-dup $i at hamming $ham")
    }
  }

  test("lsh top-k over the fixtures matches an independent driver-side recomputation") {
    val emb = graft.Tables.t(spark, sf0001, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .as[(Long, Seq[Double])].collect().toMap
    val planes = SimilarityOps.hyperplanes(64, 8)
    def bucket(v: Seq[Double]): Long =
      planes.zipWithIndex.map { case (h, i) =>
        val dot = v.zip(h).foldLeft(0.0)((a, p) => a + p._1 * p._2)
        if (dot > 0) 1L << i else 0L
      }.reduce(_ | _)
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).foldLeft(0.0)((acc, p) => acc + p._1 * p._2)
      val na = math.sqrt(a.foldLeft(0.0)((acc, x) => acc + x * x))
      val nb = math.sqrt(b.foldLeft(0.0)((acc, x) => acc + x * x))
      dot / (na * nb)
    }
    val qv = emb(0L); val qb = bucket(qv)
    val expected = emb.toSeq
      .filter { case (id, v) => id != 0L && java.lang.Long.bitCount(bucket(v) ^ qb) <= 2 }
      .map { case (id, v) =>
        (id, BigDecimal(cos(v, qv)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) }
      .sortBy { case (id, c) => (-c, id) }
      .take(10).map(_._1)
    val lsh = SimilarityOps.annLsh(spark, sf0001)
      .select("neighbor_id").as[Long].collect().toSeq
    assert(lsh == expected)
  }

  test("stored bucket layout: probe equals full-scan form and is partition-pruned") {
    val full = SimilarityOps.annLsh(spark, sf0001)
      .select("neighbor_id", "cosine").as[(Long, Double)].collect().toSeq
    val stored = SimilarityOps.annLshTopK(spark, sf0001)
    stored.collect()
    val got = stored.select("neighbor_id", "cosine")
      .as[(Long, Double)].collect().toSeq
    assert(got == full)
    val read = readBucketSet(stored)
    assert(read.nonEmpty && read.subsetOf(probedSetOfVec0),
      s"probe read unprobed buckets: ${read -- probedSetOfVec0}")
  }

  test("q105 ingest lifecycle: fold+tail probe ≡ one-shot batch probe, pruned per segment") {
    // the lifecycle build runs on first use (q105's ensure); the result
    // must equal q38's batch answer row-for-row — same oracle by design
    val live = SimilarityOps.annLshTopKStream(spark, sf0001)
    val liveRows = live.select("neighbor_id", "cosine")
      .as[(Long, Double)].collect().toSeq
    val batch = SimilarityOps.annLshTopK(spark, sf0001)
      .select("neighbor_id", "cosine").as[(Long, Double)].collect().toSeq
    assert(liveRows == batch,
      s"lifecycle probe diverged from batch layout:\n$liveRows\nvs\n$batch")
    // the state under the probe is genuinely fold + tail: compaction
    // folded ingests 0+1 into a negative-id segment, ingest 2 survives
    // as the replayable live tail
    val tag = live.inputFiles.headOption.map(f =>
      f.substring(0, f.indexOf("/corpus/"))).getOrElse(fail("no input files"))
    val segs = graft.sinks.IngestSegments
      .liveSegments(spark, s"$tag/corpus").sorted
    assert(segs.size == 2 && segs.head < 0 && segs.last == 2L,
      s"expected fold + tail segments, got $segs")
    // and the probe genuinely pruned: every partition it actually read
    // must lie in the ≤37-of-256 probed set (query = vec 0, hamming
    // ≤ 2), across BOTH live segments — the pruning happens at listing
    // time now, so this files-read pin is the whole check
    val readBuckets = readBucketSet(live)
    assert(readBuckets.nonEmpty && readBuckets.subsetOf(probedSetOfVec0),
      s"probe read unprobed buckets: ${readBuckets -- probedSetOfVec0}")
  }

  test("a torn lifecycle build (missing __done) is cleared and rebuilt, not served") {
    // first use built the state (previous test or this one); simulate a
    // crash mid-build by removing the marker AND corrupting the corpus
    // — the ensure must rebuild from scratch and the answer must still
    // equal the batch probe
    val before = SimilarityOps.annLshTopKStream(spark, sf0001)
      .select("neighbor_id", "cosine").as[(Long, Double)].collect().toSeq
    val tag = SimilarityOps.annLshTopKStream(spark, sf0001).inputFiles.headOption
      .map(f => f.substring("file:".length, f.indexOf("/corpus/")))
      .getOrElse(fail("no input files"))
    val done = java.nio.file.Paths.get(s"$tag/__done")
    assert(java.nio.file.Files.deleteIfExists(done))
    // corrupt a segment so serving the torn state would be WRONG, not
    // just lucky: drop the tail segment entirely
    val tail = java.nio.file.Paths.get(s"$tag/corpus/ingest=2")
    assert(java.nio.file.Files.exists(tail))
    org.apache.commons.io.FileUtils.deleteDirectory(tail.toFile)
    val rebuilt = SimilarityOps.annLshTopKStream(spark, sf0001)
      .select("neighbor_id", "cosine").as[(Long, Double)].collect().toSeq
    assert(rebuilt == before, "torn state must be rebuilt, not served")
    assert(java.nio.file.Files.exists(done), "rebuild must re-mark __done")
  }

  test("lifecycle probe resolves the LATEST version of a re-ingested vector") {
    import spark.implicits._
    val rnd = new java.util.Random(11)
    def rv() = Array.fill(16)(rnd.nextGaussian()).toSeq
    val q = rv()
    def noisy(eps: Double) = q.map(x => x + eps * rnd.nextGaussian())
    val dir = java.nio.file.Files.createTempDirectory("graft-annstream").toString
    // ingest 0: vec 7 is FAR from the query; ingest 1 re-ingests vec 7
    // NEAR it (plus filler so buckets are populated)
    val far = (1 to 16).map(_ => rnd.nextGaussian() * 2).toSeq
    SimilarityOps.ingestAnnSegment(
      (Seq((0L, q), (7L, far)) ++ (20L to 40L).map(i => (i, rv())))
        .toDF("vec_id", "v"), dir, 0L, bits = 4, dims = 16)
    SimilarityOps.ingestAnnSegment(
      Seq((7L, noisy(0.01))).toDF("vec_id", "v"), dir, 1L, bits = 4, dims = 16)
    val got = SimilarityOps.probeAnnLshIndexLive(
        spark, dir, q.toArray, bits = 4, probe = 2, k = 5)
      .as[(Long, Double)].collect().toMap
    assert(got.contains(7L), s"re-ingested near-dup missing: $got")
    assert(got(7L) > 0.99,
      s"probe scored a STALE version of vec 7 (cos ${got(7L)}); " +
        "latest-wins resolution must pick ingest 1's vector")
  }

  test("retraction: a deleted vector never surfaces whatever buckets are probed; resurrection restores it; folds apply and keep tombstones") {
    import spark.implicits._
    val rnd = new java.util.Random(17)
    def rv() = Array.fill(16)(rnd.nextGaussian()).toSeq
    val q = rv()
    def near(eps: Double) = q.map(x => x + eps * rnd.nextGaussian())
    val dir = java.nio.file.Files.createTempDirectory("graft-annret").toString
    // vec 7 is engineered NEAR the query (same bucket, top score) —
    // exactly the row a pruned probe is guaranteed to read
    SimilarityOps.ingestAnnSegment(
      (Seq((0L, q), (7L, near(0.01))) ++ (20L to 40L).map(i => (i, rv())))
        .toDF("vec_id", "v"), dir, 0L, bits = 4, dims = 16)
    SimilarityOps.ingestAnnSegment(
      (41L to 50L).map(i => (i, rv())).toDF("vec_id", "v"),
      dir, 1L, bits = 4, dims = 16)
    def got() = SimilarityOps.probeAnnLshIndexLive(
        spark, dir, q.toArray, bits = 4, probe = 4, k = 100)
      .as[(Long, Double)].collect().toMap
    assert(got().contains(7L))
    // retract 7 + a never-ingested 999 (no-op): 7 must vanish even
    // though its bucket is still probed — the side table is
    // bucket-blind by design
    SimilarityOps.retractAnnVecs(dir)(
      Seq((7L, ""), (999L, "")).toDF("vec_id", "x"), 2L)
    assert(!got().contains(7L), "a deleted vector surfaced from the probe")
    // fold applies the tombstone (dead rows drop) and keeps it
    SimilarityOps.compactAnnLshIndex(spark, dir)
    assert(!got().contains(7L), "compaction resurrected a deleted vector")
    // resurrection: a higher-ing re-ingest outranks the tombstone
    SimilarityOps.ingestAnnSegment(
      Seq((7L, near(0.01))).toDF("vec_id", "v"), dir, 3L, bits = 4, dims = 16)
    assert(got().contains(7L), "a re-ingested vector must serve again")
    // re-kill in the live tail, then fold — still dead
    SimilarityOps.retractAnnVecs(dir)(Seq((7L, "")).toDF("vec_id", "x"), 4L)
    assert(!got().contains(7L))
    SimilarityOps.compactAnnLshIndex(spark, dir)
    assert(!got().contains(7L))
  }

  test("an ingest declaring a different vector width is refused BEFORE writing") {
    import spark.implicits._
    val rnd = new java.util.Random(13)
    def rv(d: Int) = Array.fill(d)(rnd.nextGaussian()).toSeq
    val dir = java.nio.file.Files.createTempDirectory("graft-anndrift").toString
    SimilarityOps.ingestAnnSegment(
      (0L to 5L).map(i => (i, rv(16))).toDF("vec_id", "v"),
      dir, 0L, bits = 4, dims = 16)
    // width drift = a different hyperplane family = buckets that lie to
    // every future probe; must refuse, and must not leave the segment
    val e = intercept[IllegalArgumentException] {
      SimilarityOps.ingestAnnSegment(
        (10L to 15L).map(i => (i, rv(32))).toDF("vec_id", "v"),
        dir, 1L, bits = 4, dims = 32)
    }
    assert(e.getMessage.contains("indexed width 16"))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$dir/corpus/ingest=1")),
      "the refused ingest must not have written its segment")
    // the index still serves: probe resolves over ingest 0 only
    val got = SimilarityOps.probeAnnLshIndexLive(
      spark, dir, rv(16).toArray, bits = 4, probe = 4, k = 3)
    assert(got.count() > 0)
  }
}
