package graft

import graft.operators.Analytics
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Semantics pins for the q127-q131 additions: hand-placed transition
  * fixtures, SCD2 version chains, and — the load-bearing one — the
  * distributed-rank NTILE engine pinned against Spark's own native
  * ntile window, which is exactly what the DuckDB oracle runs. */
class JourneyOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- q127 event transitions ----

  test("q127: hand-placed transition matrix; same-ts order resolves by event_id; null-ts events refused") {
    val ev = Seq(
      (1L, 1L, "2024-01-01 00:00:01", "view"),
      (2L, 1L, "2024-01-01 00:00:02", "click"),
      (3L, 1L, "2024-01-01 00:00:03", "purchase"),
      // user 2: two views sharing a timestamp — event_id orders them,
      // so the transition is view→view, then a null-ts event that must
      // not create or break any pair
      (4L, 2L, "2024-01-01 00:00:01", "view"),
      (5L, 2L, "2024-01-01 00:00:01", "view"),
      (6L, 2L, null, "click"))
      .toDF("event_id", "user_id", "ts", "event_type")
      .withColumn("ts", col("ts").cast("timestamp"))
    val got = Analytics.eventTransitionsOver(ev)
      .as[(String, String, Long, Double)].collect()
      .map { case (s0, d0, n, p) => (s0, d0) -> ((n, p)) }.toMap
    assert(got == Map(
      ("view", "click") -> ((1L, 0.5)),
      ("view", "view") -> ((1L, 0.5)),
      ("click", "purchase") -> ((1L, 1.0))), s"got $got")
  }

  // ---- q129 SCD2 history ----

  test("q129: version chain per key — lead closes each version, the open row is current, non-upsert ops and null-ts changes are excluded") {
    def p(k: Int) = s"""{"k": $k}"""
    val ev = Seq(
      (1L, 1L, "2024-01-01 10:00:00", "signup", p(1)),
      (2L, 1L, "2024-01-02 10:00:00", "click", p(2)),
      (3L, 1L, "2024-01-03 10:00:00", "view", p(3)),
      // a purchase is NOT an upsert op — must not open a version
      (4L, 1L, "2024-01-02 12:00:00", "purchase", p(99)),
      // user 2: same-ts changes order by event_id
      (5L, 2L, "2024-02-01 00:00:00", "click", p(10)),
      (6L, 2L, "2024-02-01 00:00:00", "click", p(11)),
      // a timestampless change cannot be versioned
      (7L, 2L, null, "click", p(12)))
      .toDF("event_id", "user_id", "ts", "event_type", "props")
      .withColumn("ts", col("ts").cast("timestamp"))
    val got = Analytics.scd2HistoryOver(ev)
      .as[(Long, Long, Long, String, Option[String], Int)].collect().toSet
    assert(got == Set(
      (1L, 1L, 1L, "2024-01-01 10:00:00", Some("2024-01-02 10:00:00"), 0),
      (1L, 2L, 2L, "2024-01-02 10:00:00", Some("2024-01-03 10:00:00"), 0),
      (1L, 3L, 3L, "2024-01-03 10:00:00", None, 1),
      (2L, 1L, 10L, "2024-02-01 00:00:00", Some("2024-02-01 00:00:00"), 0),
      (2L, 2L, 11L, "2024-02-01 00:00:00", None, 1)), s"got $got")
  }

  // ---- the q128 rank/NTILE engine ----

  test("ntileOfRank reproduces Spark's native ntile for every (n, k) in a sweep — including n < k and uneven splits") {
    for (n <- Seq(1L, 3L, 4L, 5L, 7L, 10L, 23L, 100L); k <- Seq(2, 5, 7)) {
      val df = spark.range(1, n + 1).toDF("r")
      val native = df.select(col("r"),
        ntile(k).over(Window.orderBy(col("r"))).cast("long").as("b"))
        .as[(Long, Long)].collect().toMap
      val formula = df.select(col("r"),
        Analytics.ntileOfRank(col("r"), n, k).as("b"))
        .as[(Long, Long)].collect().toMap
      assert(formula == native, s"n=$n k=$k: formula $formula != native $native")
    }
  }

  test("withGlobalRank over a multi-partition frame equals single-partition row_number — asc, desc, and tie-broken orders") {
    val rnd = new scala.util.Random(7)
    val rows = (1L to 500L).map(i => (i, rnd.nextInt(20), rnd.nextDouble()))
    val df = rows.toDF("id", "grp", "x").repartition(8)
    for ((sort, label) <- Seq(
        Seq(col("x"), col("id")) -> "asc",
        Seq(col("x").desc, col("id")) -> "desc",
        // heavy ties on grp — tiebreak id must make the rank unique
        Seq(col("grp"), col("id")) -> "ties")) {
      val got = Analytics.withGlobalRank(df, "rk", sort: _*)
        .select(col("id"), col("rk")).as[(Long, Long)].collect().toMap
      val want = df.select(col("id"),
        row_number().over(Window.orderBy(sort: _*)).cast("long").as("rk"))
        .as[(Long, Long)].collect().toMap
      assert(got == want, s"order=$label diverged")
    }
  }

  test("q128: hand-built seven-user RFM grid; a purchaseless user sets the recency reference but never ranks") {
    def ev(id: Long, u: Long, day: String, t: String, v: Double) =
      (id, u, s"$day 12:00:00", t, v)
    val rows = Seq(
      ev(1, 1, "2024-01-09", "purchase", 10.0),
      ev(2, 2, "2024-01-08", "purchase", 5.0),
      ev(3, 2, "2024-01-08", "purchase", 5.0),
      ev(4, 3, "2024-01-07", "purchase", 30.0),
      ev(5, 4, "2024-01-06", "purchase", 1.0),
      ev(6, 4, "2024-01-06", "purchase", 1.0),
      ev(7, 4, "2024-01-06", "purchase", 1.0),
      ev(8, 5, "2024-01-05", "purchase", 20.0),
      ev(9, 6, "2024-01-04", "purchase", 2.0),
      ev(10, 7, "2024-01-03", "purchase", 7.0),
      // user 99 never purchases — excluded from the ranking, but its
      // view is the newest event and therefore the recency reference
      ev(11, 99, "2024-01-10", "view", 0.0))
      .toDF("event_id", "user_id", "ts", "event_type", "value")
      .withColumn("ts", col("ts").cast("timestamp"))
    val got = Analytics.rfmSegmentsOver(rows)
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    // n=7, k=5 → quintile sizes 2,2,1,1,1 on each axis (hand-walked in
    // the scaladoc order: recency asc / freq desc / monetary desc, all
    // tie-broken by user_id)
    assert(got == Set(
      (1L, 2L, 2L, 1L, 10.0), // u1
      (1L, 1L, 2L, 1L, 10.0), // u2
      (2L, 2L, 1L, 1L, 30.0), // u3
      (2L, 1L, 4L, 1L, 3.0), // u4
      (3L, 3L, 1L, 1L, 20.0), // u5
      (4L, 4L, 5L, 1L, 2.0), // u6
      (5L, 5L, 3L, 1L, 7.0)), s"got $got") // u7
  }

  test("q128 boundary-bucket rewrite == independent native-ntile reference over random purchase sets, incl. n < 5 and heavy ties") {
    // The r17 rewrite labels quintiles by comparing against the ≤12
    // collected NTILE boundary rows instead of joining three per-row
    // rank frames; this sweep pins bucket-for-bucket equality against
    // Spark's native ntile window (what the DuckDB oracle runs) on
    // random corpora covering n < k, n = k, uneven splits and massed
    // value ties (same day / same frequency / same monetary).
    val rnd = new scala.util.Random(41)
    for (nUsers <- Seq(1, 3, 5, 23, 200)) {
      val rows = (1 to nUsers).flatMap { u =>
        val nEv = 1 + rnd.nextInt(4)
        (1 to nEv).map { i =>
          // tight day range + coarse values force cross-user ties
          (u.toLong * 100 + i, u.toLong,
            f"2024-01-${1 + rnd.nextInt(5)}%02d 12:00:00",
            "purchase", (1 + rnd.nextInt(3)).toDouble)
        }
      }
      val ev = rows.toDF("event_id", "user_id", "ts", "event_type", "value")
        .withColumn("ts", col("ts").cast("timestamp"))
      val got = Analytics.rfmSegmentsOver(ev)
        .as[(Long, Long, Long, Long, Double)].collect().toSet
      // independent reference: per-user RFM via plain windows (single
      // partition is fine at test scale), native ntile per metric
      val per = ev.groupBy(col("user_id"))
        .agg(max(to_date(col("ts"))).as("last_day"),
          count(lit(1)).as("frequency"),
          sum(floor(col("value") * lit(1000000.0))).as("micros"))
        .crossJoin(ev.agg(max(to_date(col("ts"))).as("ref_day")))
        .select(col("user_id"),
          datediff(col("ref_day"), col("last_day")).as("recency_days"),
          col("frequency"), col("micros"))
      val want = per
        .withColumn("r_q", ntile(5).over(
          Window.orderBy(col("recency_days"), col("user_id"))).cast("long"))
        .withColumn("f_q", ntile(5).over(
          Window.orderBy(col("frequency").desc, col("user_id"))).cast("long"))
        .withColumn("m_q", ntile(5).over(
          Window.orderBy(col("micros").desc, col("user_id"))).cast("long"))
        .groupBy(col("r_q"), col("f_q"), col("m_q"))
        .agg(count(lit(1)).as("n_users"),
          (sum(col("micros").cast("decimal(38,0)")).cast("double") /
            lit(1000000.0)).as("total_monetary"))
        .as[(Long, Long, Long, Long, Double)].collect().toSet
      assert(got == want, s"nUsers=$nUsers: got $got want $want")
    }
  }

  // ---- q130 profiler / q131 constraints ----

  test("q130: planted nulls and duplicates are counted; min/max order natively before the string cast") {
    val docs = Seq(
      (1L, "beta text", "en", "web", 9L),
      (2L, null.asInstanceOf[String], "en", "web", 0L),
      (3L, "alpha", null.asInstanceOf[String], "book", 5L),
      (10L, "alpha", "zh", "web", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = Analytics.profileOver(docs)
      .as[(String, Long, Long, Long, String, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.keySet ==
      Set("doc_id", "text", "lang", "source", "n_chars"))
    // native long order: min 1, max 10 (a string-order max would be "3")
    assert(got("doc_id") == (("doc_id", 4L, 0L, 4L, "1", "10")))
    assert(got("text") == (("text", 4L, 1L, 2L, "alpha", "beta text")))
    assert(got("lang") == (("lang", 4L, 1L, 2L, "en", "zh")))
    assert(got("source") == (("source", 4L, 0L, 2L, "book", "web")))
    assert(got("n_chars") == (("n_chars", 4L, 0L, 3L, "0", "9")))
  }

  test("q131: each planted violation trips exactly its own rule; a clean table passes") {
    val docs = Seq(
      (1L, "good text", "en", "web", 9L),
      (1L, "dup id", "en", "web", 6L), // duplicate doc_id
      (2L, "short", "xx", "web", 5L), // unknown lang
      (3L, "", "en", "web", 0L), // empty text (n_chars consistent)
      (4L, "late", "en", "web", 99L)) // n_chars wrong
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val ev = Seq(
      (1L, "2024-01-01 00:00:00", "view", 1.0),
      (2L, null.asInstanceOf[String], "view", 1.0), // null ts
      (3L, "2024-01-01 00:00:00", "purchase", -5.0)) // negative value
      .toDF("event_id", "ts", "event_type", "value")
      .withColumn("ts", col("ts").cast("timestamp"))
    val got = Analytics.constraintReportOver(docs, ev)
      .as[(String, Long, Int)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == Map(
      "doc_id_unique" -> ((1L, 0)),
      "n_chars_matches_text" -> ((1L, 0)),
      "lang_known" -> ((1L, 0)),
      "text_nonempty" -> ((1L, 0)),
      "event_ts_nonnull" -> ((1L, 0)),
      "event_value_nonneg" -> ((1L, 0))), s"got $got")
    val clean = Analytics.constraintReportOver(
      Seq((7L, "ok", "en", "web", 2L))
        .toDF("doc_id", "text", "lang", "source", "n_chars"),
      Seq((9L, "2024-01-01 00:00:00", "view", 3.0))
        .toDF("event_id", "ts", "event_type", "value")
        .withColumn("ts", col("ts").cast("timestamp")))
      .as[(String, Long, Int)].collect()
    assert(clean.forall(r => r._2 == 0L && r._3 == 1), s"got ${clean.toSeq}")
  }

  // ---- q126 DSIR resample ----

  test("q126: the Gumbel key reorders selection by weight + hash noise — a plain-Scala re-derivation agrees row for row") {
    // a tiny corpus where weights differ strongly (en-ish vs not);
    // texts sized so every doc stays in the top-m window (m=100 > n)
    val docs = Seq(
      (1L, "the cat sat on the mat", "en"),
      (2L, "der hund lief im park heute", "de"),
      (3L, "the dog ran in the park", "en"),
      (4L, "el gato grande come pescado fresco", "es"))
      .toDF("doc_id", "text", "lang")
    val got = functions.TextOps.dsirResampleOver(docs)
      .as[(Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val weights = functions.TextOps.dsirWeightsOver(docs)
      .as[(Long, Double)].collect().toMap
    assert(got.keySet == weights.keySet) // m > n: nothing cut
    got.foreach { case (id, (w, key)) =>
      assert(w == weights(id))
      val h = java.lang.Math.floorMod(id * 2654435761L, 1000003L)
      val u = (h + 0.5) / 1000003.0
      val expect = BigDecimal(w - math.log(-math.log(u)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(key - expect) < 1e-9, s"doc $id: $key vs $expect")
    }
  }

  test("q126: the top-m cut keeps exactly the m largest keys with doc_id tie order") {
    // 300 one-token docs -> identical weights, keys differ only by the
    // hash uniform; m=100 must keep the 100 largest keys exactly
    val docs = (1L to 300L).map(i => (i, "tok", "en"))
      .toDF("doc_id", "text", "lang")
    val got = functions.TextOps.dsirResampleOver(docs)
      .as[(Long, Double, Double)].collect()
    assert(got.length == 100)
    // every doc's weight is exactly 0.0 here (identical one-token docs),
    // so the key is just the rounded Gumbel term — mirror the ROUNDED
    // ordering with the id tiebreak, exactly what both engines cut on
    val all = (1L to 300L).map { id =>
      val h = java.lang.Math.floorMod(id * 2654435761L, 1000003L)
      val g = -math.log(-math.log((h + 0.5) / 1000003.0))
      id -> BigDecimal(g).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val wantIds = all.sortBy { case (id, k) => (-k, id) }.take(100)
      .map(_._1).toSet
    assert(got.map(_._1).toSet == wantIds)
  }

  // ---- q132 PMI bigrams ----

  test("q132: hand-counted PMI — an exclusive pair outranks a promiscuous one; the min-count floor prunes") {
    // "aa bb" always together (5 times, exclusive); "cc" pairs with
    // many partners; "dd ee" appears 4 times -> under the floor
    val texts =
      Seq.fill(5)("aa bb") ++
        Seq("cc x1", "cc x2", "cc x3", "cc x4", "cc x5") ++
        Seq.fill(5)("cc zz") ++
        Seq.fill(4)("dd ee")
    val docs = texts.zipWithIndex
      .map { case (t0, i) => (i.toLong, t0, "en") }
      .toDF("doc_id", "text", "lang")
    val got = functions.TextOps.pmiBigramsOver(docs)
      .as[(String, String, Long, Double)].collect()
    val pairs = got.map(r => (r._1, r._2) -> r._3).toMap
    assert(pairs.contains(("aa", "bb")) && pairs(("aa", "bb")) == 5L)
    assert(pairs.contains(("cc", "zz")) && pairs(("cc", "zz")) == 5L)
    assert(!pairs.contains(("dd", "ee")), "floor failed")
    assert(!pairs.contains(("cc", "x1")), "floor failed")
    // N = 38 tokens; PMI(aa,bb) = ln(5*38/(5*5)) > PMI(cc,zz) =
    // ln(5*38/(10*5)) — exclusivity wins at equal pair count
    val byPair = got.map(r => (r._1, r._2) -> r._4).toMap
    assert(byPair(("aa", "bb")) > byPair(("cc", "zz")))
    val n = texts.map(_.split(" ").length).sum
    val expect = BigDecimal(math.log(5.0 * n / (5.0 * 5.0)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(byPair(("aa", "bb")) - expect) < 1e-9)
  }

  // ---- q136 point-in-time state join ----

  test("q136: a purchase sees the LATEST prior change row — a null-k change IS a state, same-ts ties break by event_id, pre-state purchases get version 0") {
    def p(k: Int) = s"""{"k": $k}"""
    val ev = Seq(
      // user 1: purchase BEFORE any change → version 0, null state
      (1L, 1L, "2024-01-01 09:00:00", "purchase", p(99)),
      (2L, 1L, "2024-01-01 10:00:00", "signup", p(1)),
      // the LATEST change carries no k — q129's current row has k=null,
      // and the PIT read must report THAT, not an earlier non-null k
      // (the ignore-nulls formulation would silently say k=1 here)
      (3L, 1L, "2024-01-02 10:00:00", "click", "{}"),
      (4L, 1L, "2024-01-03 10:00:00", "purchase", p(99)),
      // user 2: a change at the purchase's OWN ts — visible iff its
      // event_id is smaller (the (ts, event_id) total order decides)
      (5L, 2L, "2024-02-01 00:00:00", "view", p(7)),
      (6L, 2L, "2024-02-01 00:00:00", "purchase", null),
      (7L, 2L, "2024-02-01 00:00:00", "click", p(8)),
      // null-ts rows are refused outright
      (8L, 2L, null, "purchase", null))
      .toDF("event_id", "user_id", "ts", "event_type", "props")
      .withColumn("ts", col("ts").cast("timestamp"))
    val got = Analytics.pitStateJoinOver(ev)
      .as[(Long, Long, String, Long, Option[Long])].collect().toSet
    assert(got == Set(
      (1L, 1L, "2024-01-01 09:00:00", 0L, None),
      (4L, 1L, "2024-01-03 10:00:00", 2L, None),
      (6L, 2L, "2024-02-01 00:00:00", 1L, Some(7L))), s"got $got")
  }

  // ---- q137 winsorization ----

  test("q137: bounds equal an independent interpolated-quantile derivation — integral h, fractional h, and the n=1 degenerate") {
    // A: n=21 → h05 = 2.0 exactly (no interpolation), h95 = 20.0
    // B: n=4  → h05 = 1.15, h95 = 3.85 (both interpolated)
    // C: n=1  → both bounds ARE the value; nothing clips
    val va = (1 to 21).map(_.toDouble * 10)
    val vb = Seq(1.0, 2.0, 4.0, 8.0)
    val ev = (va.map(("A", _)) ++ vb.map(("B", _)) ++ Seq(("C", 42.0)))
      .zipWithIndex
      .map { case ((t0, v), i) => (i.toLong, t0, v) }
      .toDF("event_id", "event_type", "value")
    def ref(vs: Seq[Double], p: Double): Double = {
      val s0 = vs.sorted
      val h = (s0.size - 1).toDouble * p + 1.0
      val lo = s0(math.floor(h).toInt - 1)
      val hi = s0(math.ceil(h).toInt - 1)
      BigDecimal(lo + (h - math.floor(h)) * (hi - lo))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val got = Analytics.winsorizeOver(ev)
      .as[(String, Long, Long, Long, Double, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    for ((t0, vs) <- Seq("A" -> va, "B" -> vb, "C" -> Seq(42.0))) {
      val (lo, hi) = (ref(vs, 0.05), ref(vs, 0.95))
      val (_, n, nLo, nHi, sumW, gLo, gHi) = got(t0)
      assert(gLo == lo && gHi == hi, s"$t0: bounds ($gLo,$gHi) != ($lo,$hi)")
      assert(n == vs.size)
      assert(nLo == vs.count(_ < lo) && nHi == vs.count(_ > hi),
        s"$t0: clip counts ($nLo,$nHi)")
      val expSum = BigDecimal(vs.map(v => math.min(math.max(v, lo), hi)).sum)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(sumW - expSum) < 1e-9, s"$t0: $sumW != $expSum")
    }
    // the hand-checked fractional bound: 4 + 0.85·(8−4) = 7.4
    assert(got("B")._7 == 7.4 && got("B")._6 == 1.15)
  }

  // ---- q138 dwell time ----

  test("q138: each event owns the gap to its user's next event, capped at 30 min; tails have no dwell; null-ts refused") {
    val ev = Seq(
      (1L, 1L, "2024-01-01 00:00:00", "view"),     // → click: 10 s
      (2L, 1L, "2024-01-01 00:00:10", "click"),    // → purchase: 2 h → capped 1800 s
      (3L, 1L, "2024-01-01 02:00:10", "purchase"), // tail: no dwell
      (4L, 2L, "2024-01-01 00:00:00", "view"),     // same-ts pair orders by id: 0 s
      (5L, 2L, "2024-01-01 00:00:00", "view"),     // tail
      (6L, 2L, null, "click"))                     // refused
      .toDF("event_id", "user_id", "ts", "event_type")
      .withColumn("ts", col("ts").cast("timestamp"))
    val got = Analytics.dwellTimeOver(ev)
      .as[(String, Long, Long, Option[Double], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    assert(got("view") == (("view", 3L, 2L, Some(10.0), Some(5.0))),
      s"got ${got("view")}")
    assert(got("click") == (("click", 1L, 1L, Some(1800.0), Some(1800.0))),
      s"got ${got("click")}")
    assert(got("purchase") == (("purchase", 1L, 0L, None, None)),
      s"got ${got("purchase")}")
  }

  // ---- q141 embedding Gram ----

  test("q141: quantized Gram equals an independent integer computation — upper triangle only, floor quantization, exact sums") {
    val vecs = Seq(
      Seq(0.5f, -0.25f, 1.0f),
      Seq(-0.1f, 0.7f, 0.33f),
      Seq(0.0f, -1.0f, 0.999999f))
    val emb = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding")
    val res = functions.SimilarityOps.embeddingGramOver(emb)
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val q = vecs.map(_.map(x => math.floor(x.toDouble * 1000000.0).toLong))
    val want = (for (i <- 0 to 2; j <- i to 2) yield
      (i.toLong, j.toLong) ->
        q.map(v => BigInt(v(i)) * BigInt(v(j))).sum.toDouble).toMap
    assert(res == want, s"got $res\nwant $want")
    assert(res.keys.forall { case (i, j) => j >= i }, "lower triangle leaked")
  }

  // ---- q142 co-purchase ----

  test("q142: baskets pair as sorted distinct C(n,2); singleton and over-cap baskets are refused; duplicate parts collapse") {
    val li = Seq(
      // order 1: parts {3, 1, 3} → distinct sorted {1, 3} → one pair
      (1L, 3L), (1L, 1L), (1L, 3L),
      // order 2: {1, 3, 5} → (1,3) (1,5) (3,5)
      (2L, 1L), (2L, 3L), (2L, 5L),
      // order 3: singleton — refused
      (3L, 9L)) ++
      // order 4: 40 distinct parts — OVER the 32 cap, refused entirely
      (100L to 139L).map((4L, _))
    val got = operators.Analytics
      .coPurchaseOver(li.toDF("l_orderkey", "l_partkey"))
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 3L, 2L), (1L, 5L, 1L), (3L, 5L, 1L)),
      s"got $got")
    // truncation ACCOUNTING (the hotBuckets convention): the refused
    // mega-basket is counted and named with its true distinct size —
    // never silently absent; under-cap baskets never appear
    val over = operators.Analytics
      .overCapBaskets(li.toDF("l_orderkey", "l_partkey"))
      .as[(Long, Long)].collect().toSeq
    assert(over == Seq((4L, 40L)), s"over-cap accounting: $over")
    // duplicate part rows must not inflate the accounting size: order 1
    // has 3 rows but 2 distinct parts, far under the cap
    assert(!over.exists(_._1 == 1L))
  }

  // ---- q143 user features ----

  test("q143: closed-form mean gap, argmax last_type, 30-day purchase window edge, n=1 null gap, null-ts refused") {
    val ev = Seq(
      // user 1: three events over 2 days; last event decides last_type
      // by (ts, id) — two share the final ts, larger id wins
      (1L, 1L, "2024-01-01 00:00:00", "view", 1.0),
      (2L, 1L, "2024-01-02 00:00:00", "purchase", 10.0),
      (3L, 1L, "2024-01-03 00:00:00", "click", 0.0),
      (4L, 1L, "2024-01-03 00:00:00", "view", 0.0),
      // user 2: single event — mean gap NULL, zero tenure
      (5L, 2L, "2024-01-30 12:00:00", "purchase", 5.0),
      // user 3: purchase EXACTLY 30 days before ref — outside (<30)
      (6L, 3L, "2023-12-31 23:00:00", "purchase", 7.0),
      (7L, 3L, null, "purchase", 99.0)) // refused
      .toDF("event_id", "user_id", "ts", "event_type", "value")
      .withColumn("ts", col("ts").cast("timestamp"))
    // ref_day = 2024-01-30
    val got = operators.Analytics.userFeaturesOver(ev)
      .as[(Long, Long, Long, Long, Long, Long, Option[Double], String,
        Long, Option[Double])].collect().map(r => r._1 -> r).toMap
    // user 1: gap = 2 days / 3 = 57600 s; purchase on 01-02 is 28 d
    // before ref → inside the window
    assert(got(1L) == ((1L, 4L, 3L, 3L, 27L, 2L, Some(57600.0), "view",
      1L, Some(10.0))), s"got ${got(1L)}")
    assert(got(2L) == ((2L, 1L, 1L, 1L, 0L, 0L, None, "purchase",
      1L, Some(5.0))), s"got ${got(2L)}")
    // 2023-12-31 → ref 2024-01-30 is exactly 30 days: excluded
    assert(got(3L) == ((3L, 1L, 1L, 1L, 30L, 0L, None, "purchase",
      0L, None)), s"got ${got(3L)}")
  }

  // ---- q146 Gopher rules ----

  test("q146: each planted violation trips exactly its own rule; a clean doc passes all seven") {
    val clean = ("the quick brown fox jumps over the lazy dog and runs " +
      "to a forest in the night ") * 4
    val docs = Seq(
      (1L, clean.split(" ").take(60).mkString(" ")), // passes everything
      (2L, "tiny doc the of"),                       // word_count fails (mean 3.0 is INCLUSIVE)
      (3L, ("x " * 60).trim),            // mean (1.0) + stopword_floor fail
      // 8 '#' symbols over 60 words = 0.133 > 0.1 — symbol_ratio only
      (4L, (("# " * 8) + ("wonderful the of and " * 13)).trim),
      // 60 digit-only words: alpha_frac 4/64 — alpha_words only
      (5L, ("123 456 789 " * 20) + "the of and alpha"))
      .toDF("doc_id", "text")
    val got = functions.TextOps.gopherRulesOver(docs)
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(got("word_count") == 4L, s"got $got")       // doc 2 fails
    assert(got("mean_word_length") == 4L, s"got $got") // doc 3 fails
    assert(got("symbol_ratio") == 4L, s"got $got")     // doc 4 fails
    assert(got("stopword_floor") == 4L, s"got $got")   // doc 3 fails
    assert(got("alpha_words") == 4L, s"got $got")      // doc 5 fails
    assert(got("bullet_lines") == 5L && got("ellipsis_lines") == 5L)
  }

  test("q146: bullet and ellipsis line fractions count LINES, not words") {
    val bullets = (1 to 9).map(i => s"- item $i").mkString("\n") + "\nplain"
    val dots = "a line...\nanother...\nplain one\nlast line here"
    val docs = Seq((1L, bullets), (2L, dots)).toDF("doc_id", "text")
    val got = functions.TextOps.gopherRulesOver(docs)
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> r._3).toMap
    // doc 1: 9/10 bullet lines = 0.9, NOT < 0.9 → fails; doc 2 passes
    assert(got("bullet_lines") == 1L, s"got $got")
    // doc 2: 2/4 ellipsis lines = 0.5 ≥ 0.3 → fails; doc 1 passes
    assert(got("ellipsis_lines") == 1L, s"got $got")
  }

  // ---- q147 session stats ----

  test("q147: the 30-minute gap cuts sessions; duration/means are exact; conversion marks the session, not the user") {
    val ev = Seq(
      // user 1, session A: 3 events over 10 min, one purchase
      (1L, 1L, "2024-01-01 10:00:00", "view"),
      (2L, 1L, "2024-01-01 10:05:00", "purchase"),
      (3L, 1L, "2024-01-01 10:10:00", "click"),
      // 31-minute silence → session B: 1 event, no purchase
      (4L, 1L, "2024-01-01 10:41:00", "view"),
      // user 2: a 30:00 gap exactly is NOT > 30 min → same session
      (5L, 2L, "2024-01-01 00:00:00", "view"),
      (6L, 2L, "2024-01-01 00:30:00", "view"),
      (7L, 2L, null, "purchase"))                    // refused
      .toDF("event_id", "user_id", "ts", "event_type")
      .withColumn("ts", col("ts").cast("timestamp"))
    val got = operators.Analytics.sessionStatsOver(ev)
      .as[(Long, Double, Double, Long, Double)].collect().head
    // sessions: (3 ev, 600 s, conv), (1 ev, 0 s), (2 ev, 1800 s);
    // conversion_rate is the RAW 1/3 quotient since the r15 q143-class
    // sweep (a 6-decimal round could land on a reachable half-way)
    assert(got == ((3L, 2.0, 800.0, 1L, 1.0 / 3)), s"got $got")
  }

  // ---- q148 time to convert ----

  test("q148: duration spans first view → FIRST qualified purchase; unqualified purchases never convert") {
    val ev = Seq(
      // user 1 converts: view 10:00 → click 10:05 → purchase 10:20,
      // then a later purchase that must NOT win (first conversion only)
      (1L, 1L, "2024-01-01 10:00:00", "view"),
      (2L, 1L, "2024-01-01 10:05:00", "click"),
      (3L, 1L, "2024-01-01 10:20:00", "purchase"),
      (4L, 1L, "2024-01-01 11:00:00", "purchase"),
      // user 2: purchase before any click — no conversion
      (5L, 2L, "2024-01-01 09:00:00", "view"),
      (6L, 2L, "2024-01-01 09:10:00", "purchase"),
      // user 3: click before view — the click never qualifies
      (7L, 3L, "2024-01-01 08:00:00", "click"),
      (8L, 3L, "2024-01-01 08:10:00", "view"),
      (9L, 3L, "2024-01-01 08:20:00", "purchase"))
      .toDF("event_id", "user_id", "ts", "event_type")
      .withColumn("ts", col("ts").cast("timestamp"))
    val got = operators.Analytics.timeToConvertOver(ev)
      .as[(Long, Double, Double, Double)].collect().head
    assert(got == ((1L, 1200.0, 1200.0, 1200.0)), s"got $got")
  }

  // ---- q150 also-bought shelf ----

  test("q150: the shelf is symmetric, top-3 by count with partner-id ties, and rides the capped pair counts") {
    // baskets: {1,2} ×3, {1,3} ×2, {1,4}, {1,5} — part 1's shelf must
    // rank 2 (n=3), 3 (n=2), then the TIE between 4 and 5 breaks to 4
    val li = (Seq.fill(3)(Seq(1L, 2L)) ++ Seq.fill(2)(Seq(1L, 3L)) ++
      Seq(Seq(1L, 4L), Seq(1L, 5L)))
      .zipWithIndex.flatMap { case (parts, o) => parts.map((o.toLong, _)) }
      .toDF("l_orderkey", "l_partkey")
    val got = operators.Analytics.alsoBoughtOver(li)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got.filter(_._1 == 1L) == Set(
      (1L, 1L, 2L, 3L), (1L, 2L, 3L, 2L), (1L, 3L, 4L, 1L)), s"got $got")
    // symmetry: part 2 sees part 1 back
    assert(got.contains((2L, 1L, 1L, 3L)), s"got $got")
  }

  // ---- q139 negative sampling ----

  test("q139: the candidate stream is the deterministic hash — interactions excluded, collisions keep min j, rank caps at 5") {
    val orders = Seq((100L, 1L), (101L, 2L), (102L, 2L))
      .toDF("o_orderkey", "o_custkey")
    val nParts = 7L
    val part = (1L to nParts).toDF("p_partkey")
    def hash(c: Long, j: Long): Long =
      1L + ((c * 2654435761L + j * 97003L) % 1000003L) % nParts
    // make customer 1 interact with its first two distinct candidates —
    // the sampler must skip PAST them and still find 5 negatives
    val c1 = (0L to 9L).map(j => hash(1L, j)).distinct.take(2)
    val lineitem = (c1.map((100L, _)) :+ ((101L, hash(2L, 0L))))
      .toDF("l_orderkey", "l_partkey")
    val inter = Map(1L -> c1.toSet, 2L -> Set(hash(2L, 0L)))
    val expect = (for (c <- Seq(1L, 2L)) yield {
      val ded = (0L to 9L).map(j => (hash(c, j), j))
        .groupBy(_._1).map { case (p0, js) => (p0, js.map(_._2).min) }
      ded.toSeq.filterNot { case (p0, _) => inter(c)(p0) }
        .sortBy(_._2).take(5).zipWithIndex
        .map { case ((p0, _), i) => (c, (i + 1).toLong, p0) }
    }).flatten.toSet
    val got = Analytics.negativeSampleOver(orders, lineitem, part)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == expect, s"got $got\nexpect $expect")
  }
}
