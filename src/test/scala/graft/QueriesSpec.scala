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
}
