package graft

import graft.functions.{DedupOps, SimilarityOps, TextOps}
import org.apache.spark.sql.functions._

/** Invariants behind the corpus-statistics trio the DuckDB hash compare
  * states but doesn't explain: the vocabulary table conserves token
  * mass (q82), the mixture plan is a proper distribution whose targets
  * honor the budget (q84), and the per-source contamination rollup
  * agrees with q61's per-doc detection (q83). */
class CorpusStatsSpec extends SparkSpec {
  import spark.implicits._

  test("q69 overlap: a phrase present in EVERY source is excluded from pairs and sizes") {
    // the df-cap: an everywhere-phrase adds a constant +1 to every
    // pair and size — zero ranking information for the full
    // C(#sources, 2) fanout. Each 3-token doc contributes exactly one
    // trigram, so the phrase universe here is fully controlled.
    val docs = Seq(
      (1L, "s1", "aa bb cc"),   // ubiquitous: in all three sources
      (2L, "s1", "xx yy zz"),
      (3L, "s1", "s1 only p"),
      (4L, "s2", "aa bb cc"),
      (5L, "s2", "xx yy zz"),
      (6L, "s3", "aa bb cc"),
      (7L, "s3", "s3 only p")).toDF("doc_id", "source", "text")
    val out = TextOps.sourceOverlapOf(docs)
      .select("source_a", "source_b", "shared", "n_a", "n_b", "jaccard")
      .as[(String, String, Long, Long, Long, Double)].collect().toSet
    // without the cap, (s1,s3) and (s2,s3) rows would exist with
    // shared=1 via "aa bb cc"; with it, the ONLY informative overlap is
    // s1∩s2 = {"xx yy zz"}, sized over informative phrases (s1 has 2)
    assert(out == Set(("s1", "s2", 1L, 2L, 1L, 0.5)),
      s"everywhere-phrase must be excluded from the report, got $out")
  }

  test("q114 embedding drift: centroid norms and cosines match the hand computation") {
    // cut 0 centroid = (1,0), cut 1 centroid = (0,1) (the zero vector
    // pulls the (0,2) member down), corpus centroid = (0.5,0.5) —
    // both cuts sit at 45°: cos = 1/√2, norms exactly 1
    val emb = Seq(
      (0L, Seq(1.0, 0.0)), (0L, Seq(1.0, 0.0)),
      (1L, Seq(0.0, 2.0)), (1L, Seq(0.0, 0.0))).toDF("cut", "v")
    val out = SimilarityOps.embeddingDriftOf(emb)
      .select("cut", "n_vecs", "centroid_norm", "cos_to_corpus")
      .as[(Long, Long, Double, Double)].collect().toSet
    val c = BigDecimal(1.0 / math.sqrt(2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out == Set((0L, 2L, 1.0, c), (1L, 2L, 1.0, c)),
      s"drift stats off: $out")
    // cuts collinear with the corpus centroid read cosine exactly 1 —
    // scale differences are invisible to the drift statistic by design
    // (norm growth is reported separately via centroid_norm)
    val coll = Seq((0L, Seq(1.0, 1.0)), (1L, Seq(3.0, 3.0)))
      .toDF("cut", "v")
    val cos = SimilarityOps.embeddingDriftOf(coll)
      .select("cos_to_corpus").as[Double].collect().toSeq
    assert(cos == Seq(1.0, 1.0), s"collinear cuts must read 1.0: $cos")
    // an all-zero cut centroid has no direction: cosine is NULL in both
    // engines, never 0/0 (Spark NULL vs DuckDB IEEE inf would split the
    // hash gate on exactly the degenerate input a monitor must flag)
    val degen = Seq((0L, Seq(1.0, 1.0)), (1L, Seq(0.0, 0.0)))
      .toDF("cut", "v")
    val byCut = SimilarityOps.embeddingDriftOf(degen)
      .select("cut", "cos_to_corpus").as[(Long, Option[Double])]
      .collect().toMap
    assert(byCut(1L).isEmpty, s"zero cut must read NULL: $byCut")
    assert(byCut(0L).contains(1.0)) // the only mass IS the corpus mean
  }

  test("q109 drift: TV distance matches the hand-computed exact fractions") {
    // s1 = {a:2, b:1} (n=3), s2 = {a:1, c:3} (n=4); corpus = {a:3, b:1,
    // c:3} (n=7). TV(s1‖corpus) = ½(|2/3−3/7| + |1/3−1/7| + 3/7) = 3/7;
    // TV(s2‖corpus) = ½(|1/4−3/7| + 1/7 + |3/4−3/7|) = 9/28. The absent
    // tokens (c for s1, b for s2) are covered by the closed-form
    // n_s·(n−cov) term — this fixture exercises it on both sides.
    val docs = Seq((1L, "s1", "a a b"), (2L, "s2", "a c c c"))
      .toDF("doc_id", "source", "text")
    val out = TextOps.sourceDriftOf(docs)
      .select("source", "n_tokens", "vocab_seen", "tv_drift")
      .as[(String, Long, Long, Double)].collect().toSet
    val want = Set(
      ("s1", 3L, 2L, BigDecimal(3.0 / 7.0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble),
      ("s2", 4L, 2L, BigDecimal(9.0 / 28.0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    assert(out == want, s"drift drifted: $out vs $want")
    // a source identical to the whole corpus has zero drift
    val uni = Seq((1L, "s1", "x y"), (2L, "s2", "x y"))
      .toDF("doc_id", "source", "text")
    val zeros = TextOps.sourceDriftOf(uni)
      .select("tv_drift").as[Double].collect().toSeq
    assert(zeros == Seq(0.0, 0.0), s"uniform mixture must have 0 drift: $zeros")
  }

  test("q110 novelty: first-cut attribution and per-cut shares match hand counts") {
    // cut = doc_id % 3. cut0 "a b a": all 2 types novel, share 1.
    // cut1 "a c": c is new (share 1/2); cut2 "c d": d is new (share 1/2).
    val docs = Seq((0L, "s", "a b a"), (1L, "s", "a c"), (2L, "s", "c d"))
      .toDF("doc_id", "source", "text")
    val out = TextOps.noveltyRateOf(docs)
      .select("cut", "n_tokens", "n_types", "novel_types", "novel_share")
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    val want = Set((0L, 3L, 2L, 2L, 1.0), (1L, 2L, 2L, 1L, 0.5),
      (2L, 2L, 2L, 1L, 0.5))
    assert(out == want, s"novelty drifted: $out vs $want")
  }

  test("q82 vocab: frequency mass conserved, df bounded by freq, rank dense by (freq, token)") {
    val vocab = TextOps.vocabBuild(spark, sf0001)
      .select("token", "freq", "df", "rank")
      .as[(String, Long, Long, Long)].collect().sortBy(_._4)
    val totalTokens = Tables.t(spark, sf0001, "documents")
      .select(sum(size(split(col("text"), " "))).cast("long")).as[Long].head()
    // the sf fixtures' vocabulary is far below the 200 cap, so the
    // table IS the whole vocabulary and must conserve the token mass
    assert(vocab.length < 200, "fixture vocab must sit below the top-k cap")
    assert(vocab.map(_._2).sum == totalTokens, "Σ freq == corpus token count")
    assert(vocab.forall(v => v._3 >= 1 && v._3 <= v._2), "1 <= df <= freq")
    assert(vocab.map(_._4).toSeq == (1L to vocab.length).toSeq, "dense ranks")
    assert(vocab.sortBy(v => (-v._2, v._1)).map(_._4).toSeq ==
      vocab.map(_._4).toSeq.sorted, "rank order is (freq desc, token asc)")
  }

  test("q84 mixture plan: weights a distribution, targets honor the budget, epochs consistent") {
    val plan = TextOps.tokenBudgetPlan(spark, sf0001)
      .select("source", "avail_tokens", "mix_weight", "target_tokens", "epochs")
      .as[(String, Long, Double, Long, Double)].collect()
    assert(plan.length > 1)
    assert(math.abs(plan.map(_._3).sum - 1.0) < 1e-4, "tempered weights sum to 1")
    // floor() per source can only undershoot the budget, by < #sources
    val budget = 1000000L
    assert(plan.map(_._4).sum <= budget &&
      plan.map(_._4).sum > budget - plan.length, "Σ target within floor slack")
    plan.foreach { case (src, avail, _, target, epochs) =>
      // raw quotient since the r15 q143-class sweep
      assert(epochs == target.toDouble / avail,
        s"$src epochs must equal target/avail exactly")
    }
    // α = 0.5 upweights small sources: every source's tempered weight
    // must sit at or above its natural (α = 1) mass share
    val mass = plan.map(_._2).sum.toDouble
    val minSrc = plan.minBy(_._2)
    assert(minSrc._3 >= minSrc._2 / mass - 1e-9,
      "temperature sampling must not downweight the smallest source")
  }

  test("streaming vocab: batch cuts + replay + compact reconcile to the q82 batch result") {
    val tmp = java.nio.file.Files.createTempDirectory("vocab_sink").toString
    val docs = Tables.t(spark, sf0001, "documents").select("doc_id", "text")
    val w = sinks.VocabSink.writer(s"$tmp/vocab") _
    w(docs.filter(col("doc_id") % 2 === 0), 0L)
    w(docs.filter(col("doc_id") % 2 === 1), 1L)
    w(docs.filter(col("doc_id") % 2 === 1), 1L) // replay must no-op
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("token", "freq", "df", "rank")
        .as[(String, Long, Long, Long)].collect().toSet
    val expected = rows(TextOps.vocabBuild(spark, sf0001))
    assert(rows(sinks.VocabSink.topK(spark, s"$tmp/vocab")) == expected,
      "merged segments must equal the batch vocabulary")
    sinks.VocabSink.compact(spark, s"$tmp/vocab")
    // the additive sub-store lives at agg/ since the r17 rows-ledger
    // split (retraction support)
    val segs = new java.io.File(s"$tmp/vocab/agg").listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("seq="))
    assert(segs == 1, s"compact must fold to one segment, got $segs")
    assert(rows(sinks.VocabSink.topK(spark, s"$tmp/vocab")) == expected,
      "compaction must preserve the vocabulary exactly")
  }

  test("vocab retraction: negative partials telescope to the live corpus; ghost tokens leave; double-retract subtracts once") {
    val tmp = java.nio.file.Files.createTempDirectory("vocab_ret").toString
    val p = s"$tmp/vocab"
    val w = sinks.VocabSink.writer(p) _
    val r = sinks.VocabSink.retract(p) _
    def vocab() = sinks.VocabSink.read(spark, p)
      .as[(String, Long, Long)].collect().toSet
    // "ghost" lives ONLY in doc 2 — its retraction must remove the
    // token entirely, not leave a zero row
    w(Seq((1L, "aa aa bb"), (2L, "ghost aa")).toDF("doc_id", "text"), 0L)
    w(Seq((3L, "bb cc")).toDF("doc_id", "text"), 1L)
    w(Seq((4L, "cc cc aa")).toDF("doc_id", "text"), 2L)
    sinks.VocabSink.compact(spark, p)
    assert(vocab() == Set(("aa", 4L, 3L), ("bb", 2L, 2L),
      ("cc", 3L, 2L), ("ghost", 1L, 1L)))
    // retract doc 2 + a never-ingested doc 99 (no-op)
    r(Seq(2L, 99L).toDF("doc_id"), 3L)
    assert(vocab() == Set(("aa", 3L, 2L), ("bb", 2L, 2L), ("cc", 3L, 2L)),
      "ghost token must leave; aa loses doc 2's occurrences exactly")
    // double-retract: a dead doc resolves to zero live rows — the
    // subtraction must NOT happen twice
    r(Seq(2L).toDF("doc_id"), 4L)
    assert(vocab() == Set(("aa", 3L, 2L), ("bb", 2L, 2L), ("cc", 3L, 2L)))
    // resurrect doc 2 (higher-ing re-ingest), fold, re-retract in tail
    w(Seq((2L, "ghost aa")).toDF("doc_id", "text"), 5L)
    assert(vocab() == Set(("aa", 4L, 3L), ("bb", 2L, 2L),
      ("cc", 3L, 2L), ("ghost", 1L, 1L)))
    sinks.VocabSink.compact(spark, p)
    r(Seq(2L).toDF("doc_id"), 6L)
    assert(vocab() == Set(("aa", 3L, 2L), ("bb", 2L, 2L), ("cc", 3L, 2L)),
      "post-fold live-tail retraction must subtract the resurrected copy")
  }

  test("source-stats retraction: a fully-retracted source leaves the card and the mixture plan renormalizes") {
    val tmp = java.nio.file.Files.createTempDirectory("stats_ret").toString
    val p = s"$tmp/stats"
    val w = sinks.SourceStatsSink.writer(p) _
    val r = sinks.SourceStatsSink.retract(p) _
    def stats() = sinks.SourceStatsSink.read(spark, p)
      .as[(String, Long, Long)].collect().toSet
    w(Seq((1L, "web", "a b c"), (2L, "niche", "x y"))
      .toDF("doc_id", "source", "text"), 0L)
    w(Seq((3L, "web", "d e")).toDF("doc_id", "source", "text"), 1L)
    assert(stats() == Set(("web", 2L, 5L), ("niche", 1L, 2L)))
    // retire the niche source (its only doc): the card row must GO
    r(Seq(2L).toDF("doc_id"), 2L)
    assert(stats() == Set(("web", 2L, 5L)),
      "a zeroed source must leave the card, not linger as a 0 row")
    val plan = sinks.SourceStatsSink.mixturePlan(spark, p, 1000L)
      .select("source", "mix_weight").as[(String, Double)].collect().toMap
    assert(plan == Map("web" -> 1.0),
      "the tempered denominator must renormalize to the live sources")
    // partial retraction: web loses doc 3's tokens only
    r(Seq(3L).toDF("doc_id"), 3L)
    assert(stats() == Set(("web", 1L, 3L)))
  }

  test("streaming novelty: cuts + replay + compact reconcile to q110; fold keeps first-cut attribution") {
    val tmp = java.nio.file.Files.createTempDirectory("novelty_sink").toString
    val docs = Tables.t(spark, sf0001, "documents").select("doc_id", "text")
    val w = sinks.NoveltySink.writer(s"$tmp/nov") _
    def cut(b: Long) = docs.filter(pmod(col("doc_id"), lit(3)) === b)
    w(cut(0), 0L); w(cut(1), 1L); w(cut(1), 1L) // replay must no-op
    w(cut(2), 2L)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("cut", "n_tokens", "n_types", "novel_types", "novel_share")
        .as[(Long, Long, Long, Long, Double)].collect().toSet
    val expected = rows(TextOps.noveltyRate(spark, sf0001))
    assert(rows(sinks.NoveltySink.report(spark, s"$tmp/nov")) == expected,
      "merged segments must equal the q110 batch report")
    // the load-bearing fold property: compaction merges cut 0 and 1
    // rows into ONE segment, and min(cut) attribution must survive it —
    // a fold that dropped or renumbered cut would hand cut 1 the types
    // cut 0 introduced
    sinks.NoveltySink.compact(spark, s"$tmp/nov")
    val segs = new java.io.File(s"$tmp/nov").listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("seq="))
    assert(segs == 1, s"compact must fold to one segment, got $segs")
    assert(rows(sinks.NoveltySink.report(spark, s"$tmp/nov")) == expected,
      "compaction must preserve first-cut attribution exactly")
  }

  test("streaming drift: cuts + replay + compact reconcile to q109") {
    val tmp = java.nio.file.Files.createTempDirectory("drift_sink").toString
    val docs = Tables.t(spark, sf0001, "documents")
      .select("doc_id", "source", "text")
    val w = sinks.DriftSink.writer(s"$tmp/drift") _
    def cut(b: Long) = docs.filter(pmod(col("doc_id"), lit(3)) === b)
    w(cut(0), 0L); w(cut(1), 1L); w(cut(1), 1L) // replay must no-op
    w(cut(2), 2L)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("source", "n_tokens", "vocab_seen", "tv_drift")
        .as[(String, Long, Long, Double)].collect().toSet
    val expected = rows(TextOps.sourceDrift(spark, sf0001))
    assert(rows(sinks.DriftSink.report(spark, s"$tmp/drift")) == expected,
      "merged segments must equal the q109 batch report")
    sinks.DriftSink.compact(spark, s"$tmp/drift")
    assert(rows(sinks.DriftSink.report(spark, s"$tmp/drift")) == expected,
      "compaction must preserve the drift report exactly")
  }

  test("q86 stratified sample: at most k per source, dense ranks, reproducible") {
    def run() = TextOps.stratifiedSample(spark, sf0001)
      .select("source", "doc_id", "rk").as[(String, Long, Long)].collect().toSet
    val sample = run()
    assert(sample.nonEmpty)
    sample.groupBy(_._1).foreach { case (src, rows) =>
      assert(rows.size <= 5, s"$src over k")
      assert(rows.map(_._3) == (1L to rows.size).toSet, s"$src ranks not dense")
    }
    assert(run() == sample, "hash-ordered sampling must be reproducible")
    // the gate is the semantics: every sampled doc's hash is below it
    val docs = Tables.t(spark, sf0001, "documents")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    sample.foreach { case (_, id, _) =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id:${docs(id)}".getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(h < "40", s"doc $id escaped the hash gate: $h")
    }
  }

  test("property: vocab segments reconcile to the batch aggregate under ANY batch cut") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // random corpora from a tiny vocabulary (forces shared tokens) cut
    // into a random number of batches, one doc per batch at most once —
    // the additive contract's whole domain
    val genDoc = for {
      n <- Gen.choose(1, 12)
      toks <- Gen.listOfN(n, Gen.oneOf("a", "b", "c", "dd", "e"))
    } yield toks.mkString(" ")
    val prop = Prop.forAllNoShrink(
      Gen.choose(1, 4).flatMap(k =>
        Gen.listOfN(10, genDoc).map(docs => (k, docs)))) { case (k, texts) =>
      val tmp = java.nio.file.Files.createTempDirectory("vocab_prop").toString
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      (0 until k).foreach { b =>
        sinks.VocabSink.writer(s"$tmp/v")(
          docs.filter(col("doc_id") % k === b), b.toLong)
      }
      val merged = sinks.VocabSink.read(spark, s"$tmp/v")
        .as[(String, Long, Long)].collect().toSet
      val direct = TextOps.vocabAggregate(docs)
        .as[(String, Long, Long)].collect().toSet
      merged == direct
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: chunk dedup conserves mass and reassembles unique-span docs byte-identically") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // docs of 24-token spans drawn from a small span pool — guaranteed
    // cross-doc span collisions — plus unique filler spans
    val pool = (0 until 4).map(p => (1 to 24).map(i => s"p${p}_$i").mkString(" "))
    val genDoc = Gen.choose(1, 3).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(Gen.choose(0, 3).map(pool), Gen.const("U"))))
    val prop = Prop.forAllNoShrink(Gen.listOfN(8, genDoc)) { parts =>
      val texts = parts.zipWithIndex.map { case (spans, i) =>
        spans.zipWithIndex.map {
          case ("U", j) => (1 to 24).map(t => s"u${i}_${j}_$t").mkString(" ")
          case (s, _) => s
        }.mkString(" ")
      }
      val tmp = java.nio.file.Files.createTempDirectory("chunk_prop").toString
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      docs.toDF("doc_id", "text").write.parquet(s"$tmp/documents.parquet")
      val out = TextOps.chunkDedup(spark, tmp)
        .select("doc_id", "n_kept", "clean_md5")
        .as[(Long, Long, String)].collect().map(r => r._1 -> r).toMap
      val distinctSpans = docs.flatMap(_._2.split(" ", -1).grouped(24).map(_.mkString(" "))).toSet
      val massOk = out.values.map(_._2).sum == distinctSpans.size.toLong
      val spanCounts = docs.flatMap(_._2.split(" ", -1).grouped(24).map(_.mkString(" ")))
        .groupBy(identity).view.mapValues(_.size)
      val uniqueOk = docs.forall { case (id, t) =>
        val spans = t.split(" ", -1).grouped(24).map(_.mkString(" ")).toSeq
        !spans.forall(s => spanCounts(s) == 1) || {
          val md = java.security.MessageDigest.getInstance("MD5")
            .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
          out(id)._3 == md
        }
      }
      massOk && uniqueOk
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("streaming source stats: batch cuts + replay + compact reconcile; live mixture plan == q84") {
    val tmp = java.nio.file.Files.createTempDirectory("src_stats").toString
    val docs = Tables.t(spark, sf0001, "documents").select("doc_id", "source", "text")
    val w = sinks.SourceStatsSink.writer(s"$tmp/stats") _
    w(docs.filter(col("doc_id") % 3 === 0), 0L)
    w(docs.filter(col("doc_id") % 3 === 1), 1L)
    w(docs.filter(col("doc_id") % 3 === 1), 1L) // replay must no-op
    w(docs.filter(col("doc_id") % 3 === 2), 2L)
    def plan(df: org.apache.spark.sql.DataFrame) =
      df.select("source", "avail_tokens", "mix_weight", "target_tokens", "epochs")
        .as[(String, Long, Double, Long, Double)].collect().toSet
    val live = plan(sinks.SourceStatsSink.mixturePlan(spark, s"$tmp/stats", 1000000L))
    assert(live == plan(TextOps.tokenBudgetPlan(spark, sf0001)),
      "live mixture plan must equal the q84 batch plan")
    sinks.SourceStatsSink.compact(spark, s"$tmp/stats")
    assert(plan(sinks.SourceStatsSink.mixturePlan(spark, s"$tmp/stats", 1000000L)) == live)
  }

  test("q83 per-source rollup agrees with q61's per-doc detection") {
    val perDoc = DedupOps.decontaminate(spark, sf0001)
      .select("doc_id").as[Long].collect().toSet
    val docs = Tables.t(spark, sf0001, "documents")
      .filter(col("doc_id") >= 20)
      .select("doc_id", "source").as[(Long, String)].collect()
    val expected = docs.groupBy(_._2).map { case (src, rows) =>
      src -> ((rows.length.toLong, rows.count(r => perDoc(r._1)).toLong))
    }
    val report = DedupOps.contaminationReport(spark, sf0001)
      .select("source", "n_docs", "n_contaminated", "contamination_rate")
      .as[(String, Long, Long, Double)].collect()
    assert(report.map(r => r._1 -> ((r._2, r._3))).toMap == expected)
    report.foreach { r =>
      // raw quotient since the r15 q143-class sweep (a 6-decimal round
      // could land on an exact half-way where the engines disagree)
      assert(r._4 == r._3.toDouble / r._2.toDouble, s"rate mismatch for ${r._1}")
    }
    // benchmark docs must not count themselves as contaminated corpus
    assert(report.map(_._2).sum == docs.length.toLong)
  }

  test("fused ordered_pairs is bit-identical to the HOF composition, codegen and interpreted") {
    import org.apache.spark.sql.functions.{col, expr}
    // arrays of every parity incl. the n<2 degenerates the explode drops
    val rows = Seq(
      Seq("a", "b", "c", "d"), Seq("s1", "s2", "s3"),
      Seq("x", "y"), Seq("only"), Seq.empty[String])
    val df = rows.toDF("srcs")
    val fused = df.select(
      graft.expressions.TextHashes.ordered_pairs(col("srcs")).as("p"))
    val hof = df.select(expr(
      """flatten(transform(srcs, (x, i) ->
        |  transform(slice(srcs, i + 2, size(srcs)),
        |    y -> named_struct('sa', x, 'sb', y))))""".stripMargin).as("p"))
    val get = (d: org.apache.spark.sql.DataFrame) =>
      d.collect().map(_.getSeq[org.apache.spark.sql.Row](0).map(r =>
        (r.getString(0), r.getString(1))).toList).toList
    assert(get(fused) == get(hof))
    assert(get(fused).head == List(("a","b"), ("a","c"), ("a","d"),
      ("b","c"), ("b","d"), ("c","d")))
    // interpreted eval path (no codegen) must agree too
    val e = graft.expressions.OrderedPairs(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq("p", "q", "r"),
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType)))
    val arr = e.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    assert(arr.numElements() == 3)
  }
}
