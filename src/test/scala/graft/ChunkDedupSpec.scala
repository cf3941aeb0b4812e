package graft

import graft.functions.TextOps
import org.apache.spark.sql.functions._

/** Chunk-level dedup (q81) invariants the DuckDB hash compare states
  * but doesn't explain: exact-dup docs collapse to empty, the kept
  * chunk mass is conserved globally, and a shared span is kept exactly
  * once — at its globally first position. */
class ChunkDedupSpec extends SparkSpec {
  import spark.implicits._

  test("fixture run: chunk mass conserved; kept = distinct chunk texts; dup docs go empty") {
    val out = TextOps.chunkDedup(spark, sf0001)
      .select("doc_id", "n_chunks", "n_kept", "clean_md5")
      .as[(Long, Long, Long, String)].collect()
    val docs = Tables.t(spark, sf0001, "documents")
      .select("doc_id", "text").as[(Long, String)].collect()
    assert(out.length == docs.length, "one output row per document")
    // global conservation: Σ n_kept == number of DISTINCT 24-token spans
    val distinctChunks = docs.flatMap { case (_, t) =>
      t.split(" ", -1).grouped(24).map(_.mkString(" "))
    }.toSet
    assert(out.map(_._3).sum == distinctChunks.size.toLong,
      "every distinct span kept exactly once, none invented")
    // the fixtures carry no EXACT-identical docs (their engineered dups
    // are jaccard-0.5 rewrites), so whole-doc collapse is exercised on
    // the synthetic corpus below; here pin the untouched-doc invariant:
    // a doc whose spans are all globally unique reassembles to itself
    val outMap = out.map(r => r._1 -> r).toMap
    val chunkCounts = docs.flatMap { case (_, t) =>
      t.split(" ", -1).grouped(24).map(_.mkString(" "))
    }.groupBy(identity).view.mapValues(_.length)
    val untouched = docs.filter { case (_, t) =>
      t.split(" ", -1).grouped(24).forall(c => chunkCounts(c.mkString(" ")) == 1)
    }
    assert(untouched.nonEmpty)
    untouched.foreach { case (id, t) =>
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(outMap(id)._4 == md,
        s"doc $id has only unique spans and must reassemble byte-identical")
    }
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("streaming chunk admission: two ordered batch cuts equal the batch q81 keeper rule") {
    val tmp = java.nio.file.Files.createTempDirectory("chunk_idx").toString
    val boiler = (1 to 24).map(i => s"b$i").mkString(" ")
    val b1 = Seq(
      (1L, boiler + " " + (1 to 24).map(i => s"x$i").mkString(" ")),
      (2L, boiler)).toDF("doc_id", "text")
    val b2 = Seq(
      (3L, boiler + " " + (1 to 24).map(i => s"y$i").mkString(" ")),
      (4L, (1 to 24).map(i => s"x$i").mkString(" "))).toDF("doc_id", "text")
    val w = TextOps.streamingChunkDedupWriter(s"$tmp/index", s"$tmp/out") _
    w(b1, 0L); w(b2, 1L)
    val streamed = spark.read.parquet(s"$tmp/out/admitted")
      .select(col("doc_id"), col("n_chunks"), col("n_kept"),
        md5(col("clean_text").cast("binary")).as("m"))
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // batch twin over the union — doc_ids increase with the batch cuts,
    // so the global (doc_id, ci) keeper picks the same survivors
    val union = java.nio.file.Files.createTempDirectory("chunk_union").toString
    b1.unionByName(b2).write.parquet(s"$union/documents.parquet")
    val batch = TextOps.chunkDedup(spark, union)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(streamed == batch,
      s"streamed cuts diverge from the batch keeper:\n$streamed\nvs\n$batch")
    // semantics spot-check: doc 2 is pure boilerplate (all spans seen in
    // doc 1's first chunk) → empty; doc 4 repeats doc 1's tail → empty
    assert(streamed(2L)._2 == 0L && streamed(4L)._2 == 0L)
    assert(streamed(3L) == ((2L, 1L, md5hex((1 to 24).map(i => s"y$i").mkString(" ")))))
  }

  test("replaying a batch overwrites its own segment and is not poisoned by it") {
    val tmp = java.nio.file.Files.createTempDirectory("chunk_replay").toString
    val doc = Seq((1L, (1 to 48).map(i => s"r$i").mkString(" ")))
      .toDF("doc_id", "text")
    val w = TextOps.streamingChunkDedupWriter(s"$tmp/index", s"$tmp/out") _
    w(doc, 0L)
    val first = spark.read.parquet(s"$tmp/out/admitted")
      .select("doc_id", "n_kept").as[(Long, Long)].collect().toSet
    assert(first == Set(1L -> 2L))
    // at-least-once retry of the SAME batch: its own ingest=0 segment is
    // already on disk — the probe must ignore it, and the rewrite must
    // replace, not append
    w(doc, 0L)
    val second = spark.read.parquet(s"$tmp/out/admitted")
      .select("doc_id", "n_kept").as[(Long, Long)].collect().toSet
    assert(second == first, s"replay changed the admitted output: $second")
    val segs = spark.read.parquet(s"$tmp/index/chunks")
      .select("ingest").distinct().as[Long].collect().toSeq
    assert(segs == Seq(0L), s"replay must not mint extra segments: $segs")
  }

  test("chunk probe partition-prunes the index to the batch's buckets; index side never shuffled") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.{Exchange, ReusedExchangeExec}
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    def walk(p: SparkPlan): Seq[SparkPlan] = walkPlan(p)
    val tmp = java.nio.file.Files.createTempDirectory("chunk_prune").toString
    // 40 docs of globally-unique spans spread hashes over most bmod dirs
    val corpus = (0 until 40).map(i =>
      (i.toLong, (1 to 48).map(j => s"t${i}_$j").mkString(" "))).toDF("doc_id", "text")
    TextOps.buildChunkIndex(corpus, s"$tmp/index")
    val dirs = new java.io.File(s"$tmp/index/chunks/ingest=-1").listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("bmod="))
    // one batch doc re-using doc 5's first span: its bucket set is tiny
    val batch = Seq((100L, (1 to 24).map(j => s"t5_$j").mkString(" ")))
      .toDF("doc_id", "text")
    val batchH = TextOps.chunkGrid(batch)
      .select(md5(col("chunk").cast("binary")).as("h")).distinct()
    val seen = TextOps.probeChunkIndex(spark, s"$tmp/index", batchH, excludeIngest = 99L)
    assert(seen.count() == 1L, "the shared span must be reported as indexed")
    val all = walk(seen.queryExecution.executedPlan)
    val scan = scanOf(seen, "chunk_prune")
    // pruning happens at LISTING time now (readLivePrunedWithIds hands
    // the reader only the batch's bmod dirs), so the pin is on the
    // partitions the scan actually selected: all inside the batch's
    // bmod set, and a strict subset of the index's bucket directories
    val batchBmods = batchH
      .select(pmod(xxhash64(col("h")),
        lit(TextOps.chunkIndexBuckets.toLong)).as("bmod"))
      .distinct().collect().map(_.getLong(0)).toSet
    val readBmods = partitionValuesOf(Seq(scan), "bmod")
    assert(readBmods.nonEmpty && readBmods.subsetOf(batchBmods),
      s"index scan read beyond the batch's bmods: ${readBmods -- batchBmods}")
    assert(readBmods.size < dirs,
      "probe must read a strict subset of the index's bucket directories")
    // the join is batch-broadcast, and the index side reaches the join
    // without any exchange (the only shuffle sits above, in the distinct)
    val join = all.collectFirst { case j: BroadcastHashJoinExec => j }
      .getOrElse(fail("probe join must be a BroadcastHashJoin"))
    val indexSide = Seq(join.left, join.right).find(side =>
      walk(side).exists(_.isInstanceOf[FileSourceScanExec]))
      .getOrElse(fail("neither join side reads the index"))
    assert(!walk(indexSide).exists(_.isInstanceOf[Exchange]),
      "no exchange may sit between the index scan and the probe join")
  }

  test("bootstrap index survives batch 0: probe sees it, segment write doesn't clobber it") {
    // the id-collision hazard: bulk builds land at ingest=-1, so batch 0's
    // replay filter (ingest != 0) keeps the bootstrap visible and batch
    // 0's overwrite of ingest=0 cannot delete it
    val tmp = java.nio.file.Files.createTempDirectory("chunk_boot").toString
    val span = (1 to 24).map(i => s"s$i").mkString(" ")
    val fresh = (1 to 24).map(i => s"f$i").mkString(" ")
    TextOps.buildChunkIndex(Seq((1L, span)).toDF("doc_id", "text"), s"$tmp/index")
    val w = TextOps.streamingChunkDedupWriter(s"$tmp/index", s"$tmp/out") _
    // batch 0: one bootstrap-indexed span (must be dropped) + one new one
    w(Seq((10L, span + " " + fresh)).toDF("doc_id", "text"), 0L)
    val admitted = spark.read.parquet(s"$tmp/out/admitted")
      .select("doc_id", "n_chunks", "n_kept").as[(Long, Long, Long)].collect().toSet
    assert(admitted == Set((10L, 2L, 1L)),
      s"batch 0 must see the bootstrap segment and drop the indexed span: $admitted")
    val segs = spark.read.parquet(s"$tmp/index/chunks")
      .select("ingest").distinct().as[Long].collect().toSet
    assert(segs == Set(-1L, 0L),
      s"bootstrap segment must survive batch 0's overwrite: $segs")
    intercept[IllegalArgumentException] {
      TextOps.buildChunkIndex(Seq((1L, span)).toDF("doc_id", "text"),
        s"$tmp/index", ingestId = 3L)
    }
  }

  private def span(tag: String) = (1 to 24).map(i => s"${tag}$i").mkString(" ")

  private def batchHashes(texts: String*) = {
    import org.apache.spark.sql.DataFrame
    val df: DataFrame = texts.zipWithIndex
      .map { case (t, i) => (900L + i, t) }.toDF("doc_id", "text")
    TextOps.chunkGrid(df).select(md5(col("chunk").cast("binary")).as("h")).distinct()
  }

  private def ingestDirs(idx: String): Set[Long] =
    graft.sinks.Hfs.childDirs(spark, s"$idx/chunks", "ingest=")
      .map(_.stripPrefix("ingest=").toLong).toSet

  test("compaction folds all but the newest batch; probe and replay semantics unchanged") {
    val tmp = java.nio.file.Files.createTempDirectory("chunk_compact").toString
    val idx = s"$tmp/index"
    TextOps.buildChunkIndex(Seq((1L, span("s"))).toDF("doc_id", "text"), idx) // ingest=-1
    val w = TextOps.streamingChunkDedupWriter(idx, s"$tmp/out") _
    w(Seq((10L, span("a"))).toDF("doc_id", "text"), 0L)
    w(Seq((20L, span("s") + " " + span("b"))).toDF("doc_id", "text"), 1L)
    def probeAll() = TextOps.probeChunkIndex(spark, idx,
      batchHashes(span("s"), span("a"), span("b")), excludeIngest = 2L)
      .as[String].collect().toSet
    val before = probeAll()
    assert(before.size == 3, s"all three spans indexed pre-compaction: $before")
    TextOps.compactChunkIndex(spark, idx)
    // folded {-1, 0} -> K=0 -> ingest=-2; newest batch (1) survives
    assert(ingestDirs(idx) == Set(-2L, 1L), s"unexpected dirs: ${ingestDirs(idx)}")
    assert(probeAll() == before, "compaction must not change probe results")
    // replay of the SURVIVING batch: its own segment still excluded, the
    // folded bootstrap span still visible -> identical admitted output
    w(Seq((20L, span("s") + " " + span("b"))).toDF("doc_id", "text"), 1L)
    val admitted = spark.read.parquet(s"$tmp/out/admitted/ingest=1")
      .select("doc_id", "n_chunks", "n_kept").as[(Long, Long, Long)].collect().toSet
    assert(admitted == Set((20L, 2L, 1L)), s"replay after compaction diverged: $admitted")
    // idempotent: nothing left to fold but the fold itself + newest
    TextOps.compactChunkIndex(spark, idx)
    assert(ingestDirs(idx) == Set(-2L, 1L))
  }

  test("a crashed compaction loses nothing: staging is derived, delete leftovers tolerated") {
    val tmp = java.nio.file.Files.createTempDirectory("chunk_crash").toString
    val idx = s"$tmp/index"
    val chunksPath = s"$idx/chunks"
    TextOps.buildChunkIndex(Seq((1L, span("s"))).toDF("doc_id", "text"), idx)
    val w = TextOps.streamingChunkDedupWriter(idx, s"$tmp/out") _
    w(Seq((10L, span("a"))).toDF("doc_id", "text"), 0L)
    w(Seq((20L, span("b"))).toDF("doc_id", "text"), 1L)
    def probeAll() = TextOps.probeChunkIndex(spark, idx,
      batchHashes(span("s"), span("a"), span("b")), excludeIngest = 2L)
      .as[String].collect().toSet
    val healthy = probeAll()
    assert(healthy.size == 3)
    // crash shape 1 — fold written, rename never happened: the staging
    // is redundant derived data (nothing was deleted before it), so
    // probes ignore it and the next compact discards and refolds
    spark.read.option("basePath", chunksPath)
      .parquet(s"$chunksPath/ingest=-1", s"$chunksPath/ingest=0")
      .select(col("h"), col("bmod")).dropDuplicates("h")
      .write.partitionBy("bmod").parquet(s"$chunksPath/__compact_staging_-2")
    assert(probeAll() == healthy, "a pre-rename staging must be invisible")
    TextOps.compactChunkIndex(spark, idx)
    assert(ingestDirs(idx) == Set(-2L, 1L), s"refold failed: ${ingestDirs(idx)}")
    assert(graft.sinks.Hfs.childDirs(spark, chunksPath, "__compact_staging_").isEmpty)
    assert(probeAll() == healthy)
    // crash shape 2 — fold live but a folded source dir survived the
    // crash (delete phase interrupted): duplicate rows are tolerated by
    // the probe's distinct, and the next compact folds the leftover away
    TextOps.buildChunkIndex(Seq((1L, span("s"))).toDF("doc_id", "text"), idx,
      ingestId = -9L) // stands in for a not-yet-deleted folded source
    assert(probeAll() == healthy, "duplicate rows must not change probe results")
    TextOps.compactChunkIndex(spark, idx)
    // {-9, -2} fold to min-1 = -10; batch 1 survives
    assert(ingestDirs(idx) == Set(-10L, 1L), s"leftover not folded: ${ingestDirs(idx)}")
    assert(probeAll() == healthy)
    // a bootstrap aimed at a FOLD id must be refused, not clobber it
    intercept[IllegalArgumentException] {
      TextOps.buildChunkIndex(Seq((1L, span("s"))).toDF("doc_id", "text"), idx,
        ingestId = -10L)
    }
  }

  test("bucket modulus is layout geometry: build and probe derive it from the STORED pin, not the module default") {
    val tmp = java.nio.file.Files.createTempDirectory("chunk_bkt").toString
    // pin a NON-default modulus before the build (the operator-retunes-
    // the-constant scenario, inverted so the default can't mask drift)
    graft.sinks.Hfs.writeString(spark, s"$tmp/index/chunks/__buckets", "8")
    val corpus = (0 until 20).map(i =>
      (i.toLong, (1 to 48).map(j => s"b${i}_$j").mkString(" "))).toDF("doc_id", "text")
    TextOps.buildChunkIndex(corpus, s"$tmp/index")
    // every written partition obeys the pinned modulus
    val dirs = graft.sinks.Hfs.childDirs(spark, s"$tmp/index/chunks/ingest=-1", "bmod=")
      .map(_.stripPrefix("bmod=").toLong)
    assert(dirs.nonEmpty && dirs.forall(_ < 8L),
      s"segment dirs must use the stored modulus 8, got $dirs")
    // and the probe (computing bmods with the SAME stored value) still
    // finds every indexed hash — a drifted probe would miss most and
    // re-admit duplicates
    TextOps.streamingChunkDedupWriter(s"$tmp/index", s"$tmp/out")(corpus, 0L)
    val readmitted = spark.read.parquet(s"$tmp/out/admitted/ingest=0")
      .filter(col("n_kept") > 0).count()
    assert(readmitted == 0L,
      "an already-indexed corpus must re-admit nothing — bucket drift between build and probe")
  }

  test("a boilerplate span shared by distinct docs survives only in the first doc") {
    val boiler = (1 to 24).map(i => s"b$i").mkString(" ")
    val docs = Seq(
      (10L, boiler + " " + (1 to 24).map(i => s"x$i").mkString(" ")),
      (20L, boiler + " " + (1 to 24).map(i => s"y$i").mkString(" ")),
      (30L, (1 to 24).map(i => s"z$i").mkString(" "))).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("chunk_dedup").toString
    docs.write.parquet(s"$dir/documents.parquet")
    val out = TextOps.chunkDedup(spark, dir)
      .select("doc_id", "n_chunks", "n_kept").as[(Long, Long, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(10L) == ((2L, 2L)), "first doc keeps the boilerplate and its tail")
    assert(out(20L) == ((2L, 1L)), "second doc loses the boilerplate, keeps its tail")
    assert(out(30L) == ((1L, 1L)))
  }
}
