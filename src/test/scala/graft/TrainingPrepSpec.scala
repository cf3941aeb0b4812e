package graft

import org.apache.spark.sql.functions._

/** Behavior + plan-shape pins for the round-6 training-prep additions:
  * unigram-LM quality scoring (q88), deterministic training-order
  * assignment (q90), and the cube/unpivot reshape surface (q91/q92).
  * The DuckDB oracle already proves fixture-level equality; these tests
  * pin the operator-level invariants the oracle can't see (seed
  * sensitivity, permutation density, plan shapes) on synthetic frames.
  */
class TrainingPrepSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  // ---- q88 unigram-LM quality -------------------------------------

  test("lm score: identical docs score identically; in-model text outranks gibberish") {
    val d = docs(
      1L -> "the cat sat on the mat",
      2L -> "the cat sat on the mat",
      3L -> "zq xv jkw qqq zzz plf") // every token a hapax
    val out = functions.TextOps.lmScore(d)
      .as[(Long, Double)].collect().toMap
    assert(out(1L) == out(2L), "same text must give the bit-identical score")
    assert(out(1L) > out(3L), "hapax-only gibberish must score lowest")
    assert(out.values.forall(s => s > 0.0 && s <= 1.0),
      s"smoothed mean probabilities live in (0,1]: $out")
  }

  test("lm score: a one-token doc of the hottest token attains the corpus max") {
    val d = docs(
      1L -> "a a a a a a a a",
      2L -> "a b",
      3L -> "b c d")
    val out = functions.TextOps.lmScore(d).as[(Long, Double)].collect().toMap
    assert(out(1L) == out.values.max,
      "a doc made only of the modal token maximizes mean probability")
  }

  test("lm score plan: model side broadcast, corpus rows never sort") {
    val df = functions.TextOps.lmQuality(spark, sf0001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.contains("BroadcastHashJoin"),
      s"the vocabulary-sized model must broadcast into the token stream:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"no corpus-side sort-merge join may appear:\n$plan")
  }

  // ---- streaming quality gate (q88's stream twin) ------------------

  test("quality gate: a one-batch stream reproduces the q88 batch scores exactly") {
    val tmp = java.nio.file.Files.createTempDirectory("qgate1").toString
    val d = Tables.t(spark, sf0001, "documents").select("doc_id", "text")
    functions.TextOps.streamingQualityGateWriter(
      s"$tmp/vocab", s"$tmp/out", minScore = 0.0)(d, 0L)
    val admitted = spark.read.parquet(s"$tmp/out/admitted/ingest=0")
      .select("doc_id", "lm_score").as[(Long, Double)].collect().toMap
    val batch = functions.TextOps.lmScore(d)
      .as[(Long, Double)].collect().toMap
    assert(admitted == batch,
      "single-batch streaming scores must be bit-identical to the batch query")
  }

  test("quality gate: threshold admits exactly the at-or-above-score docs; replay no-ops") {
    val tmp = java.nio.file.Files.createTempDirectory("qgate2").toString
    val d = Tables.t(spark, sf0001, "documents").select("doc_id", "text")
    val scores = functions.TextOps.lmScore(d).as[(Long, Double)].collect()
    val cut = scores.map(_._2).sorted.apply(scores.length / 2) // median
    val w = functions.TextOps.streamingQualityGateWriter(
      s"$tmp/vocab", s"$tmp/out", minScore = cut) _
    w(d, 0L)
    w(d, 0L) // retried batch must overwrite, not duplicate
    val admitted = spark.read.parquet(s"$tmp/out/admitted/ingest=0")
      .select("doc_id").as[Long].collect().toSet
    val expected = scores.filter(_._2 >= cut).map(_._1).toSet
    assert(admitted == expected)
    // the replayed segment must not double the model either
    val freqTotal = sinks.VocabSink.read(spark, s"$tmp/vocab")
      .agg(sum(col("freq"))).as[Long].head()
    val tokTotal = d.select(sum(size(split(col("text"), " "))).cast("long"))
      .as[Long].head()
    assert(freqTotal == tokTotal, "replay must leave one copy of the batch's tokens")
  }

  test("quality gate: compaction cadence bounds segment fan-in; scores and replay unaffected") {
    val tmp = java.nio.file.Files.createTempDirectory("qgate_compact").toString
    val d = Tables.t(spark, sf0001, "documents").select("doc_id", "text")
    val parts = (0 until 3).map(i => d.filter(col("doc_id") % 3 === i))
    val w = functions.TextOps.streamingQualityGateWriter(
      s"$tmp/vocab", s"$tmp/out", minScore = 0.0, compactEvery = 2) _
    w(parts(0), 0L); w(parts(1), 1L); w(parts(2), 2L) // compact fires at batch 1
    def segCount = new java.io.File(s"$tmp/vocab").listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("seq="))
    assert(segCount <= 2,
      s"cadence 2 must fold batches 0-1 into one segment (+ batch 2's own), got $segCount")
    def admitted2 = spark.read.parquet(s"$tmp/out/admitted/ingest=2")
      .select("doc_id", "lm_score").as[(Long, Double)].collect().toMap
    val exp2 = functions.TextOps.lmScoreAgainst(parts(2), functions.TextOps.lmModel(d))
      .as[(Long, Double)].collect().toMap
    assert(admitted2 == exp2,
      "scoring through the folded model must equal the unfolded full model")
    // replay of the NEWEST batch (the only one streaming can re-run)
    // after a fold: segment write no-ops, admitted rows overwrite equal
    w(parts(2), 2L)
    val freqTotal = sinks.VocabSink.read(spark, s"$tmp/vocab")
      .agg(sum(col("freq"))).as[Long].head()
    val tokTotal = d.select(sum(size(split(col("text"), " "))).cast("long"))
      .as[Long].head()
    assert(freqTotal == tokTotal, "replay after compaction must not double any batch")
    assert(admitted2 == exp2)
  }

  test("quality gate drives from a real stream: per-batch admission through foreachBatch") {
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("qgate_ms").toString
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = in.toDF().toDF("doc_id", "text").writeStream
      .option("checkpointLocation", s"$tmp/ckpt")
      .foreachBatch(functions.TextOps.streamingQualityGateWriter(
        s"$tmp/vocab", s"$tmp/out", minScore = 0.0) _)
      .start()
    try {
      in.addData((1L, "the cat sat"), (2L, "the cat ran"))
      q.processAllAvailable()
      in.addData((3L, "the cat sat")) // scores against the merged model
      q.processAllAvailable()
    } finally q.stop()
    val admitted = spark.read.parquet(s"$tmp/out/admitted")
      .select("doc_id", "lm_score").as[(Long, Double)].collect().toMap
    assert(admitted.keySet == Set(1L, 2L, 3L))
    // doc 3 repeats batch 0's commonest trigram, so under the merged
    // 9-token model it must outscore both earlier docs (scored when the
    // model knew only 6 tokens and "sat"/"ran" were rarer)
    assert(admitted(3L) > admitted(1L) && admitted(3L) > admitted(2L),
      s"prefix-model scoring must value in-model repeats higher: $admitted")
  }

  test("quality gate: later batches score against the corpus-so-far model") {
    val tmp = java.nio.file.Files.createTempDirectory("qgate3").toString
    val d = Tables.t(spark, sf0001, "documents").select("doc_id", "text")
    val b0 = d.filter(col("doc_id") % 2 === 0)
    val b1 = d.filter(col("doc_id") % 2 === 1)
    val w = functions.TextOps.streamingQualityGateWriter(
      s"$tmp/vocab", s"$tmp/out", minScore = 0.0) _
    w(b0, 0L); w(b1, 1L)
    def admitted(i: Int) = spark.read.parquet(s"$tmp/out/admitted/ingest=$i")
      .select("doc_id", "lm_score").as[(Long, Double)].collect().toMap
    val exp0 = functions.TextOps.lmScore(b0).as[(Long, Double)].collect().toMap
    val exp1 = functions.TextOps.lmScoreAgainst(b1,
        functions.TextOps.lmModel(d).select(col("token"), col("cnt")))
      .as[(Long, Double)].collect().toMap
    assert(admitted(0) == exp0, "batch 0 sees only its own tokens as the model")
    assert(admitted(1) == exp1, "batch 1 sees the b0+b1 merged model")
  }

  test("quality gate: a cold-start batch that tokenizes to nothing cannot wedge the stream") {
    // non-empty batch, but every doc's text is null → empty vocab
    // partial → no segment written; read()'s no-segments failure here
    // would fail every replay identically, permanently wedging the
    // stream. The gate must complete the batch (empty admission) and
    // score later batches normally.
    val tmp = java.nio.file.Files.createTempDirectory("qgate_cold").toString
    val w = functions.TextOps.streamingQualityGateWriter(
      s"$tmp/vocab", s"$tmp/out", minScore = 0.0) _
    val nullTexts = Seq((1L, null: String), (2L, null: String)).toDF("doc_id", "text")
    w(nullTexts, 0L)            // must not throw
    w(nullTexts, 0L)            // replay must no-op identically
    assert(new java.io.File(s"$tmp/out/admitted/ingest=0").exists(),
      "the batch must complete with an (empty) admitted segment")
    // the stream proceeds: a later real batch trains and admits
    val real = Seq((3L, "the cat sat"), (4L, "the cat ran")).toDF("doc_id", "text")
    w(real, 1L)
    val admitted = spark.read.parquet(s"$tmp/out/admitted/ingest=1")
      .select("doc_id").as[Long].collect().toSet
    assert(admitted == Set(3L, 4L))
  }

  // ---- q90 training-order assignment ------------------------------

  test("training order is a dense permutation: (shard,pos) unique, pos dense per shard") {
    val d = docs((1L to 500L).map(i => i -> s"doc $i"): _*)
    val out = functions.TextOps.orderAssign(d, "seedA")
      .select("shard", "pos", "doc_id")
      .as[(String, Long, Long)].collect()
    assert(out.length == 500)
    assert(out.map(r => (r._1, r._2)).distinct.length == 500,
      "(shard, pos) must be unique — it IS the training order")
    out.groupBy(_._1).foreach { case (shard, rows) =>
      val ps = rows.map(_._2).sorted
      assert(ps.head == 1L && ps.last == ps.length.toLong,
        s"positions in shard $shard must be dense 1..n, got ${ps.take(5).toSeq}...")
    }
  }

  test("training order is seed-sensitive and per-seed deterministic") {
    val d = docs((1L to 200L).map(i => i -> s"doc $i"): _*)
    def order(seed: String) = functions.TextOps.orderAssign(d, seed)
      .select("doc_id", "shard", "pos").as[(Long, String, Long)]
      .collect().sortBy(_._1).toSeq
    val a1 = order("seedA"); val a2 = order("seedA"); val b = order("seedB")
    assert(a1 == a2, "same seed must reproduce the identical assignment")
    assert(a1 != b, "a new seed must be a new permutation")
  }

  test("training order plan: the window is shard-partitioned, never single-partition") {
    val df = functions.TextOps.trainingOrder(spark, sf0001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.contains("Window"), s"expected the per-shard window:\n$plan")
    assert(plan.contains("hashpartitioning(shard"),
      s"the window's exchange must key on shard (256-way parallel):\n$plan")
    assert(!plan.contains("SinglePartition"),
      s"a global-order window would collapse to one partition:\n$plan")
  }

  test("training order shard width: every width is a dense permutation with the pinned plan") {
    // the 100 TB knob: 2 hex chars = 256 shards (default), 3 = 4 096 —
    // widening must only re-key, never change the plan shape or break
    // the (shard, pos) total order
    val d = docs((1L to 400L).map(i => i -> s"doc $i"): _*)
    for (w <- Seq(1, 2, 3)) {
      val df = functions.TextOps.orderAssign(d, "seedW", shardHexChars = w)
      val out = df.select("shard", "pos", "doc_id")
        .as[(String, Long, Long)].collect()
      assert(out.length == 400, s"width $w must keep every doc")
      assert(out.map(r => (r._1, r._2)).distinct.length == 400,
        s"(shard, pos) must stay unique at width $w")
      assert(out.forall(_._1.length == w), s"shard keys must be $w hex chars")
      out.groupBy(_._1).foreach { case (shard, rows) =>
        val ps = rows.map(_._2).sorted
        assert(ps.head == 1L && ps.last == ps.length.toLong,
          s"positions in shard $shard must be dense 1..n at width $w")
      }
      // plan pin at every width: shard-keyed exchange, no collapse
      val plan = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      assert(plan.contains("hashpartitioning(shard"),
        s"width $w window must key on shard:\n$plan")
      assert(!plan.contains("SinglePartition"),
        s"width $w must not collapse to one partition:\n$plan")
    }
    // widths refine consistently: the width-3 shard is a prefix
    // extension of the width-2 shard for every doc (same md5 key)
    val s2 = functions.TextOps.orderAssign(d, "seedW", 2)
      .select("doc_id", "shard").as[(Long, String)].collect().toMap
    val s3 = functions.TextOps.orderAssign(d, "seedW", 3)
      .select("doc_id", "shard").as[(Long, String)].collect().toMap
    assert(s3.forall { case (id, sh) => sh.startsWith(s2(id)) },
      "wider shards must refine (prefix-extend) narrower ones")
    intercept[IllegalArgumentException] {
      functions.TextOps.orderAssign(d, "seedW", 0)
    }
    ()
  }

  // ---- q91 cube / q92 unpivot -------------------------------------

  test("cube contains rollup plus the cross slices rollup omits") {
    val cube = operators.Analytics.cubePricing(spark, sf0001)
      .collect().map(r => (r.get(0), r.get(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    val rollup = operators.Analytics.rollupPricing(spark, sf0001)
      .collect().map(r => (r.get(0), r.get(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    rollup.foreach { case (k, v) =>
      assert(cube(k) == v, s"cube must agree with rollup on $k")
    }
    // the slice rollup cannot express: linestatus totals with flag rolled up
    val statusTotals = graft.Tables.t(spark, sf0001, "lineitem")
      .groupBy(col("l_linestatus"))
      .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("sum_qty"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    statusTotals.foreach { case (status, v) =>
      assert(cube((null, status)) == v,
        s"cube's (null, $status) slice must equal the direct groupBy")
    }
  }

  test("cube plan: one Expand feeding a partial-then-final aggregate — no per-set rescan") {
    val df = operators.Analytics.cubePricing(spark, sf0001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.contains("Expand"), s"grouping sets must ride one Expand:\n$plan")
    val scans = "FileScan parquet".r.findAllIn(plan).length
    assert(scans == 1, s"all four grouping sets must share ONE lineitem scan, got $scans")
    // a map-side PARTIAL aggregate must exist and sit BELOW the
    // exchange (plans print top-down, so below = a LARGER string
    // index than the Exchange): the shuffle then carries |groups|×4
    // rows, not corpus×4
    val partialIdx = plan.indexOf("partial_count")
    assert(partialIdx >= 0, s"expected partial_count map-side functions:\n$plan")
    val exchangeIdx = plan.indexOf("Exchange")
    assert(exchangeIdx >= 0 && exchangeIdx < partialIdx,
      s"the partial aggregate must sit below the exchange " +
        s"(exchange@$exchangeIdx, partial@$partialIdx):\n$plan")
  }

  test("q93 plan: exact + sketch quantiles from a single events scan, no join") {
    val df = operators.Analytics.approxQuantiles(spark, sf0001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val scans = "FileScan parquet".r.findAllIn(plan).length
    assert(scans == 1, s"all nine aggregates must share one scan, got $scans:\n$plan")
    assert(!plan.contains("Join"), s"no join may appear:\n$plan")
  }

  test("unpivot is the exact wide→long reshape of the aggregate") {
    val wide = graft.Tables.t(spark, sf0001, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_price"),
        round(sum(col("l_discount")), 4).as("sum_disc"))
      .collect()
      .flatMap(r => Seq(
        (r.getString(0), "sum_qty", r.getDouble(1)),
        (r.getString(0), "sum_price", r.getDouble(2)),
        (r.getString(0), "sum_disc", r.getDouble(3)))).toSet
    val long = operators.Analytics.unpivotPricing(spark, sf0001)
      .as[(String, String, Double)].collect().toSet
    assert(long == wide)
  }
}
