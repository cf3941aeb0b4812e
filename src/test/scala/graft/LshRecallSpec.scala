package graft

import graft.functions.DedupOps
import org.apache.spark.sql.functions._

/** Guards the property that lets q28_minhash_lsh carry a brute-force SQL
  * oracle: because the pipeline's verify step recomputes EXACT shingle
  * Jaccard on every surviving candidate, its output equals the quadratic
  * exact-Jaccard result exactly when banding recall is 1.0 on the
  * ≥-threshold pairs. Banding is deterministic (xxhash64 + fixed
  * constants), so this either holds for a given corpus or it doesn't —
  * we assert it on the driver fixtures. */
class LshRecallSpec extends SparkSpec {
  import spark.implicits._

  test("minhashLsh output == exact shingle-Jaccard over the full corpus (sf0.001 AND the driver's sf0.01)") {
    // guard BOTH fixtures: the driver's correctness gate compares q28 at
    // sf0.01, so recall=1.0 must hold on that corpus, not just the tiny one
    for (dir <- Seq(sf0001, "/root/testdata/sf0.01")) {
      val lsh = DedupOps.minhashLsh(spark, dir)
        .select("doc_a", "doc_b", "jaccard").as[(Long, Long, Double)].collect().toSet

      // Brute-force exact: distinct shingle strings, pairwise via equality
      // join (same construction as q41 but unsliced).
      val sh = Tables.t(spark, dir, "documents")
        .select(col("doc_id"),
          explode(array_distinct(DedupOps.shingles3(split(col("text"), " ")))).as("shingle"))
      val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
      val inter = sh.as("a").join(sh.as("b"),
          col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("i"))
      val exact = inter
        .join(sizes.as("sa"), col("doc_a") === col("sa.doc_id"))
        .join(sizes.as("sb"), col("doc_b") === col("sb.doc_id"))
        .withColumn("jaccard", round(col("i") / (col("sa.sz") + col("sb.sz") - col("i")), 4))
        .filter(col("jaccard") >= 0.5)
        .select("doc_a", "doc_b", "jaccard").as[(Long, Long, Double)].collect().toSet

      assert(exact.nonEmpty, s"$dir should contain engineered near-dups")
      assert(lsh == exact, s"LSH/exact divergence at $dir")
    }
  }

  test("at shuffle scale the band self-join reuses one exchange (scan runs once)") {
    // At broadcast sizes the small side legitimately recomputes the
    // (then-cheap) scan; the 100 TB shape is the shuffle join, where
    // ReuseExchange must fire. Force it by disabling auto-broadcast.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val sig = Tables.t(spark, sf0001, "documents")
        .select(col("doc_id"),
          graft.expressions.TextHashes.minhash_signature(col("text"), 32, 3).as("sig"))
        .filter(size(col("sig")) > 0)
      val banded = sig.select(col("doc_id"),
        explode(DedupOps.lshBands(col("sig"), 32, 4)).as("b"))
      val cand = banded.as("a").join(banded.as("b"),
        col("a.b") === col("b.b") && col("a.doc_id") < col("b.doc_id"))
      cand.collect() // AQE finalizes (and can only reuse) during execution
      val plan = cand.queryExecution.executedPlan.toString
      assert(plan.contains("ReusedExchange"),
        s"expected the shuffle self-join to reuse the band exchange:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("minhashLsh frees its candidate cache before returning") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    DedupOps.minhashLsh(spark, sf0001).count()
    // The only persisted blocks allowed to survive are the result's own
    // localCheckpoint (one RDD, result-sized); the dup-pair cache used
    // during the query must be unpersisted by the time it returns.
    val after = spark.sparkContext.getPersistentRDDs
      .filterNot { case (id, _) => before.contains(id) }
    assert(after.size <= 1,
      s"expected at most the result checkpoint to remain cached, got: " +
        after.values.map(_.toString).mkString("; "))
  }
}
