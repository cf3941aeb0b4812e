package graft

import graft.functions.DedupOps
import org.apache.spark.sql.functions._

/** Guards the property that lets q29_simhash carry the brute-force SQL
  * oracle (q28's): the pipeline verifies exact shingle Jaccard on every
  * candidate, so its output equals the quadratic exact result exactly
  * when candidate recall is 1.0 on the ≥ 0.5-Jaccard pairs. Since round
  * 6 candidates come from the TWO-TIER key union (simhashTieredKeys):
  * radius-4 SimHash pigeonhole blocks (deterministic for hamming ≤ 4)
  * plus q28's MinHash bands for the far tail — the round-5 single-tier
  * hamming-12 blocks had ~400 distinct keys and degenerated to
  * near-quadratic enumeration. SimHash/MinHash are deterministic
  * (xxhash64 per token), so recall either holds for a corpus or it
  * doesn't — assert it on ALL THREE driver fixtures (measured max
  * hamming over true pairs: 9 at sf0.001, 5 at sf0.01, 12 at sf0.1;
  * recall is a per-corpus property, so every fixture the driver can run
  * must be pinned). */
class SimhashRecallSpec extends SparkSpec {
  import spark.implicits._

  /** Truth source over shingle STRINGS — fully independent of the
    * TextHashes expressions, used for the smaller fixtures. */
  private def exactPairs(dir: String) = {
    val sh = Tables.t(spark, dir, "documents")
      .select(col("doc_id"),
        explode(array_distinct(DedupOps.shingles3(split(col("text"), " ")))).as("shingle"))
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    sh.as("a").join(sh.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("i"))
      .join(sizes.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("doc_b") === col("sb.doc_id"))
      .withColumn("jaccard", round(col("i") / (col("sa.sz") + col("sb.sz") - col("i")), 4))
      .filter(col("jaccard") >= 0.5)
      .select("doc_a", "doc_b", "jaccard").as[(Long, Long, Double)].collect().toSet
  }

  /** Truth source over shingle HASHES (sorted-merge intersect) for the
    * sf0.1 leg — minutes faster in the 4-thread test JVM; fair because
    * DedupSpec separately proves ShingleHashes ≡ xxhash64 over the
    * distinct shingle-string set, so the two formulations agree modulo
    * 64-bit collisions (the argument the verify tier itself rests on). */
  private def exactPairsHashed(dir: String) = {
    val docs = Tables.t(spark, dir, "documents")
      .select(col("doc_id"), sort_array(
        graft.expressions.TextHashes.shingle_hashes(col("text"), 3)).as("hs"))
      .filter(size(col("hs")) > 0)
    docs.as("a").join(docs.as("b"), col("a.doc_id") < col("b.doc_id"))
      .withColumn("inter", graft.expressions.VectorHashes
        .sorted_intersect_count(col("a.hs"), col("b.hs")))
      .withColumn("jaccard", round(col("inter") /
        (size(col("a.hs")) + size(col("b.hs")) - col("inter")), 4))
      .filter(col("jaccard") >= 0.5)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("jaccard"))
      .as[(Long, Long, Double)].collect().toSet
  }

  test("simhash pairs == exact shingle-Jaccard over the full corpus (all three driver fixtures)") {
    // sf0.1 is the leg that caught the fixture-tuned hammingMax=9
    // silently missing 5 of 256 true pairs — recall is per-corpus, so
    // every fixture the driver can run gets pinned
    for ((dir, truth) <- Seq(
        sf0001 -> exactPairs _,
        "/root/testdata/sf0.01" -> exactPairs _,
        "/root/testdata/sf0.1" -> exactPairsHashed _)) {
      val sim = DedupOps.simhashNearDupPairs(spark, dir)
        .select("doc_a", "doc_b", "jaccard").as[(Long, Long, Double)].collect().toSet
      val exact = truth(dir)
      assert(exact.nonEmpty, s"$dir should contain engineered near-dups")
      assert(sim == exact, s"SimHash/exact divergence at $dir: " +
        s"missed=${(exact -- sim).take(5)} extra=${(sim -- exact).take(5)}")
    }
  }

  test("two-tier keys: tier key sets disjoint, key space stays wide") {
    for (dir <- Seq(sf0001, "/root/testdata/sf0.01")) {
      val docs = Tables.t(spark, dir, "documents")
      val keys = DedupOps.simhashTieredKeys(docs)
      // the degenerate round-5 scheme collapsed to ~400 keys regardless
      // of corpus size; the union's key count must track the corpus
      // (band hashes are ~unique per doc) — pin ≥ 4 keys/doc
      val nDocs = docs.count()
      val nKeys = keys.select(col("b")).distinct().count()
      assert(nKeys >= 4 * nDocs, s"$dir: key space collapsed: $nKeys keys / $nDocs docs")
      // rebuild each tier's key set from the same building blocks: the
      // leading tag literal (0 = block pair, 1 = band) must keep the
      // hash domains disjoint on the fixture (an overlap would be a
      // 64-bit collision — harmless to results, but a systematic one
      // would mean the tag got dropped), and their union must be
      // exactly what simhashTieredKeys emits (pins builder drift)
      val fp = docs.select(col("doc_id"),
        graft.expressions.TextHashes.simhash64(col("text")).as("f"),
        graft.expressions.TextHashes.minhash_signature(col("text"), 32, 3).as("sig"))
      val t0k = fp.select(explode(DedupOps.simhashBlockPairs(col("f"), 6)).as("bk"))
        .select(xxhash64(lit(0), col("bk.bi"), col("bk.bj"),
          col("bk.vi"), col("bk.vj")).as("b")).distinct()
      val t1k = fp.filter(size(col("sig")) > 0)
        .select(explode(DedupOps.lshBands(col("sig"), 32, 5)).as("bk"))
        .select(xxhash64(lit(1), col("bk.band"), col("bk.bhash")).as("b")).distinct()
      assert(t0k.join(t1k, "b").count() == 0, s"$dir: tier key sets overlap")
      assert(t0k.union(t1k).distinct().count() == nKeys,
        s"$dir: spec's rebuilt key union drifted from simhashTieredKeys")
    }
  }

  test("pigeonhole blocking: candidates come from an equality join, not an all-pairs comparison") {
    // the result is a localCheckpoint; re-derive the candidate subplan
    // instead: block-pair self-join on the combo key must be an equi-join
    val fp = Tables.t(spark, sf0001, "documents")
      .select(col("doc_id"), graft.expressions.TextHashes.simhash64(col("text")).as("f"))
    val blocked = fp.select(col("doc_id"), col("f"),
      explode(DedupOps.simhashBlockPairs(col("f"), 12)).as("b"))
    val cand = blocked.as("a").join(blocked.as("b"),
      col("a.b") === col("b.b") && col("a.doc_id") < col("b.doc_id"))
    cand.collect()
    val exec = cand.queryExecution.executedPlan.toString
    assert(!exec.contains("CartesianProduct") && !exec.contains("BroadcastNestedLoop"),
      s"block join degenerated to all-pairs:\n$exec")
  }

  test("block pairs cover every 2-combination and agree with the single-block values") {
    val df = Seq(0x123456789abcdef0L, -1L, Long.MinValue).toDF("f")
      .select(col("f"), explode(DedupOps.simhashBlockPairs(col("f"), 12)).as("b"))
      .select(col("f"), col("b.bi"), col("b.bj"), col("b.vi"), col("b.vj"))
      .as[(Long, Int, Int, Long, Long)].collect()
    val single = Seq(0x123456789abcdef0L, -1L, Long.MinValue).toDF("f")
      .select(col("f"), explode(DedupOps.simhashBlocks(col("f"), 12)).as("b"))
      .select(col("f"), col("b.blk"), col("b.bval"))
      .as[(Long, Int, Long)].collect()
      .map { case (f, i, v) => (f, i) -> v }.toMap
    df.groupBy(_._1).foreach { case (f, rows) =>
      assert(rows.length == 66, s"expected C(12,2)=66 combos for $f")
      assert(rows.map(r => (r._2, r._3)).toSet ==
        (for { i <- 0 until 12; j <- (i + 1) until 12 } yield (i, j)).toSet)
    }
    df.foreach { case (f, i, j, vi, vj) =>
      assert(vi == single((f, i)) && vj == single((f, j)),
        s"pair ($i,$j) of $f disagrees with single blocks")
    }
  }

  test("simhashBlocks partitions all 64 bits: block values reassemble the fingerprint") {
    val df = Seq(0x123456789abcdef0L, -1L, 0L, Long.MinValue, 0x0fedcba987654321L)
      .toDF("f")
      .select(col("f"), explode(DedupOps.simhashBlocks(col("f"), 11)).as("b"))
    // widths: 64 = 9*6 + 2*5 → recompute each block's lo offset and OR back
    val rows = df.select(col("f"), col("b.blk"), col("b.bval"))
      .as[(Long, Int, Long)].collect()
    val base = 64 / 11; val extra = 64 % 11
    val bounds = (0 until 11).scanLeft(0)((lo, i) => lo + base + (if (i < extra) 1 else 0))
    rows.groupBy(_._1).foreach { case (f, bs) =>
      assert(bs.length == 11)
      val rebuilt = bs.map { case (_, blk, bval) => bval << bounds(blk) }.reduce(_ | _)
      assert(rebuilt == f, s"blocks do not reassemble $f")
    }
  }
}
