package graft

/** Every SparkEntry query runs at sf0.001 and returns a sane result;
  * every oracle key refers to an existing query. Value-level correctness
  * is covered by tools/selfcheck.py (DuckDB) — this spec is the fast
  * regression net. */
class QueriesSpec extends SparkSpec {

  // queries whose sf0.001 result may legitimately be empty
  private val mayBeEmpty = Set("q10_range_bool", "q28_minhash_lsh")

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, sf0001)
      assert(df.columns.nonEmpty)
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("every oracle key has a matching query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("anyTerm scoring: a corpus-absent term contributes exactly 0, never NaN") {
    // df = 0 makes the unguarded addend tf × (n/df) = 0 × Inf = NaN —
    // unreachable under the conjunctive filter (no row survives a
    // never-matching term) but REACHABLE under q100's OR filter, where
    // Spark and DuckDB would then disagree on NaN ordering. The guard
    // must zero the absent term's addend.
    import spark.implicits._
    val docs = Seq((1L, "spark rocks"), (2L, "plain text")).toDF("doc_id", "text")
    val got = operators.Relational
      .tfIdfMatch(docs, Seq("spark", "zzz_absent"), anyTerm = true)
      .as[(Long, Double)].collect().toMap
    assert(!got.values.exists(_.isNaN), s"NaN leaked into scores: $got")
    // n=2, df_spark=1, tf=1 → 1 × (2/1) = 2.0; the absent term adds 0
    assert(got == Map(1L -> 2.0), s"got $got")
  }
}
