package graft

import graft.functions.SimilarityOps
import org.apache.spark.sql.functions._

/** Guards q54 (banded hyperplane-LSH embedding dedup). The banding is
  * parameterized for SELECTIVITY (16 bands × 8 bits over 128 planes):
  * candidates must stay a small fraction of all pairs — the previous
  * 2-bit bands emitted ~4× MORE join rows than brute force, which is
  * the one thing an LSH join must never do. The price, pinned here, is
  * honest LSH recall at the fixtures' weak t=0.35 (69° apart is barely
  * better than random for sign bits); at a production near-dup
  * threshold the same banding recalls everything, proven on seeded
  * synthetic dup pairs. q54's oracle replicates the banding, so these
  * parameters are a recall/cost choice, not a correctness one. */
class EmbeddingDedupSpec extends SparkSpec {
  import spark.implicits._

  private def exactPairs(dir: String) = {
    val e = Tables.t(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        round(SimilarityOps.cosine(col("a.v"), col("b.v")), 6).as("cosine"))
      .filter(col("cosine") >= 0.35)
      .as[(Long, Long, Double)].collect().toSet
  }

  test("q54 emits band-collision ∩ exact-cosine pairs: a subset of the exact set, recall ≥ pinned floor") {
    // planes and fixtures are deterministic, so recall is a fixed number
    // per corpus: measured 0.3035 (sf0.001) / 0.3100 (sf0.01) at t=0.35.
    // The floor is set just below; a parameter change that collapses
    // recall (e.g. 16-bit bands → 0.004 measured offline) trips it.
    for (dir <- Seq(sf0001, "/root/testdata/sf0.01")) {
      val got = SimilarityOps.embeddingDupsBucketed(spark, dir)
        .as[(Long, Long, Double)].collect().toSet
      val exact = exactPairs(dir)
      assert(exact.size > 200, s"$dir fixture should have a few hundred ≥0.35 pairs")
      val extra = got -- exact
      assert(extra.isEmpty, s"$dir: pairs outside the exact set: ${extra.take(5)}")
      val recall = (got & exact).size.toDouble / exact.size
      info(s"$dir: recall ${f"$recall%.4f"} (${got.size}/${exact.size})")
      assert(recall >= 0.20, s"$dir: recall $recall below pinned floor 0.20")
    }
  }

  test("the candidate join is selective: raw join rows ≤ 15% of all pairs (2-bit bands were 400%)") {
    val planes = SimilarityOps.hyperplanes(64, 128)
    val e = Tables.t(spark, "/root/testdata/sf0.01", "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val n = e.count()
    val banded = e.select(col("vec_id"),
      explode(SimilarityOps.signBands(col("v"), planes, 8)).as("b"))
    val raw = banded.as("a").join(banded.as("b"),
        col("a.b") === col("b.b") && col("a.vec_id") < col("b.vec_id"))
      .count()
    val allPairs = n * (n - 1) / 2
    info(s"raw candidate rows: $raw of $allPairs all-pairs (${f"${100.0 * raw / allPairs}%.1f"}%)")
    assert(raw <= allPairs * 0.15,
      s"band join emitted $raw raw rows — more than 15% of $allPairs pairs; " +
        "the banding has degenerated toward (or past) brute force")
  }

  test("a generous maxBucket leaves q54's fixture result unchanged (recall intact)") {
    val capped = SimilarityOps.embeddingDupsBucketed(spark, sf0001, maxBucket = Some(64))
      .as[(Long, Long, Double)].collect().toSet
    val exact = SimilarityOps.embeddingDupsBucketed(spark, sf0001)
      .as[(Long, Long, Double)].collect().toSet
    assert(exact.nonEmpty && capped == exact,
      s"capped path diverged: missing ${(exact -- capped).take(3)}, extra ${(capped -- exact).take(3)}")
  }

  test("maxBucket bounds a 300-identical-vector hot cluster at C(cap,2) + star edges") {
    // identical vectors agree on every band, so all 16 (band, bv)
    // buckets hold the same 300 ids: uncapped enumeration is C(300,2) =
    // 44 850 verified pairs; the cap bounds it at C(cap,2) full pairs +
    // one star edge per overflow row — and every admitted pair still
    // passes the exact cosine ≥ t verify (cosine 1.0 here)
    val dir = java.nio.file.Files.createTempDirectory("emb_hot").toString
    val n = 300
    val v = Array.tabulate(64)(i => math.sin(i + 1.0)).toSeq
    (0 until n).map(i => (i.toLong, v)).toDF("vec_id", "embedding")
      .write.parquet(s"$dir/embeddings.parquet")
    val cap = 8
    val got = SimilarityOps.embeddingDupsBucketed(spark, dir, maxBucket = Some(cap))
    assert(got.count() == cap * (cap - 1) / 2 + (n - cap),
      "capped hot cluster must emit exactly the full-pair core plus star edges")
    assert(got.agg(min(col("cosine"))).as[Double].head() == 1.0)
  }

  test("production-threshold recall: every seeded synthetic dup pair (cos ≥ .9) collides on some band") {
    // 100 base gaussians (dim 64) + perturbed copies at cosine ≈ .98:
    // per-plane agreement .936, band collision .936^8 ≈ .59, miss
    // probability (1-.59)^16 ≈ 7e-7 per pair — and the fixed seed makes
    // the measured 100/100 a frozen fact, not a coin flip.
    val rnd = new java.util.Random(12345L)
    def gauss() = Array.fill(64)(rnd.nextGaussian())
    def unit(a: Array[Double]) = {
      val n = math.sqrt(a.map(x => x * x).sum); a.map(_ / n)
    }
    val rows = (0 until 100).flatMap { i =>
      val base = unit(gauss())
      val dup = unit(base.zip(unit(gauss())).map { case (x, g) => x + 0.2 * g })
      Seq((i.toLong, base.toSeq), (i.toLong + 100, dup.toSeq))
    }
    val e = rows.toDF("vec_id", "v")
    val planes = SimilarityOps.hyperplanes(64, 128)
    val banded = e.select(col("vec_id"),
      explode(SimilarityOps.signBands(col("v"), planes, 8)).as("b"))
    val cand = banded.as("a").join(banded.as("b"),
        col("a.b") === col("b.b") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("va"), col("b.vec_id").as("vb"))
      .distinct()
      .as[(Long, Long)].collect().toSet
    val truePairs = (0L until 100L).map(i => (i, i + 100))
    // guard the premise: the perturbation really produced ≥0.9-cosine dups
    val cos = e.as("a").join(e.as("b"),
        col("a.vec_id") + 100 === col("b.vec_id"))
      .select(SimilarityOps.cosine(col("a.v"), col("b.v")).as("c"))
      .as[Double].collect()
    assert(cos.forall(_ >= 0.9), s"perturbation too strong: min cosine ${cos.min}")
    val missed = truePairs.filterNot(cand.contains)
    assert(missed.isEmpty,
      s"banding missed ${missed.size}/100 production-grade dup pairs: ${missed.take(5)}")
  }

  test("candidates come from an equality join on (band, value), not an all-pairs comparison") {
    val planes = SimilarityOps.hyperplanes(64, 128)
    val e = Tables.t(spark, sf0001, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val banded = e.select(col("vec_id"),
      explode(SimilarityOps.signBands(col("v"), planes, 8)).as("b"))
    val cand = banded.as("a").join(banded.as("b"),
      col("a.b") === col("b.b") && col("a.vec_id") < col("b.vec_id"))
    cand.collect()
    val exec = cand.queryExecution.executedPlan.toString
    assert(!exec.contains("CartesianProduct") && !exec.contains("BroadcastNestedLoop"),
      s"band join degenerated to all-pairs:\n$exec")
  }

  test("fused sign_band_vals ≡ signBands composition (bit-identical band values)") {
    // the fused expression accumulates each dot in the same fp order as
    // the zip_with+aggregate composition, so every sign decision — and
    // thus every band value — must agree exactly
    val planes = SimilarityOps.hyperplanes(64, 128)
    val e = Tables.t(spark, sf0001, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val fused = e.select(col("vec_id"),
        posexplode(graft.expressions.VectorHashes.sign_band_vals(
          col("v"), planes.toSeq.map(_.toSeq), 8)).as(Seq("band", "bv")))
      .as[(Long, Int, Long)].collect().toSet
    val composed = e.select(col("vec_id"),
        explode(SimilarityOps.signBands(col("v"), planes, 8)).as("b"))
      .select(col("vec_id"), col("b.band"), col("b.bv"))
      .as[(Long, Int, Long)].collect().toSet
    assert(fused == composed,
      s"diverging rows e.g. ${(fused diff composed).take(3)} vs ${(composed diff fused).take(3)}")
  }

  test("fused cosine_sim/dot_product ≡ dot/norm/cosine composition (bit-identical)") {
    // same accumulation order ⇒ the fused one-pass form must equal the
    // interpreted HOF composition on every pair, BEFORE any rounding
    val e = Tables.t(spark, sf0001, "embeddings").limit(60)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val pairs = e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
    val diverging = pairs.select(
        SimilarityOps.cosine(col("a.v"), col("b.v")).as("composed"),
        graft.expressions.VectorHashes.cosine_sim(col("a.v"), col("b.v")).as("fused"),
        SimilarityOps.dot(col("a.v"), col("b.v")).as("dcomposed"),
        graft.expressions.VectorHashes.dot_product(col("a.v"), col("b.v")).as("dfused"))
      .filter(col("composed") =!= col("fused") || col("dcomposed") =!= col("dfused"))
      .count()
    assert(diverging == 0L)
  }

  test("fused pair math NULL semantics match the zip_with composition") {
    // length mismatch: zip_with pads with NULL and the aggregate
    // collapses to NULL — the fused forms must return NULL, not garbage
    graft.expressions.GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT cosine_sim(array(1.0d, 2.0d), array(1.0d)) AS c,
        |       dot_product(array(1.0d, 2.0d), array(1.0d)) AS d,
        |       dot_product(array(1.0d, 2.0d), CAST(NULL AS ARRAY<DOUBLE>)) AS n,
        |       dot_product(array(1.0d, CAST(NULL AS DOUBLE)), array(1.0d, 2.0d)) AS e,
        |       cosine_sim(array(1.0d, CAST(NULL AS DOUBLE)), array(1.0d, 2.0d)) AS f
        |""".stripMargin).collect()(0)
    assert((0 until 5).forall(row.isNullAt),
      "length mismatch, null array, and null ELEMENT must all yield NULL " +
        "(the zip_with composition nulls the whole fold)")
  }

  test("fused bucketOf bit-equals the HOF composition on fixture vectors") {
    val planes = SimilarityOps.hyperplanes(64, 8)
    val e = Tables.t(spark, sf0001, "embeddings").limit(100)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val mismatches = e.select(
        SimilarityOps.bucketOf(col("v"), planes).as("fused"),
        SimilarityOps.bucketOfComposed(col("v"), planes).as("composed"))
      .filter(col("fused") =!= col("composed")).count()
    assert(mismatches == 0L,
      "one-band SignBandVals must pack the same sign bits as the HOF fold")
  }

  test("signBands packs every plane exactly once and bit-agrees with bucketOf") {
    // 32 planes / 2-bit bands: band b bit i == bucketOf bit (2b+i) for the
    // same family — reassembling band values must reproduce the 32-bit
    // signature bucketOf computes over the identical planes.
    val planes = SimilarityOps.hyperplanes(64, 32)
    val e = Tables.t(spark, sf0001, "embeddings").limit(50)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val sig = e.select(col("vec_id"),
        SimilarityOps.bucketOf(col("v"), planes).as("sig"))
      .as[(Long, Long)].collect().toMap
    val rebuilt = e.select(col("vec_id"),
        explode(SimilarityOps.signBands(col("v"), planes, 2)).as("b"))
      .select(col("vec_id"), col("b.band"), col("b.bv"))
      .as[(Long, Int, Long)].collect()
      .groupBy(_._1).map { case (id, bs) =>
        id -> bs.map { case (_, band, bv) => bv << (2 * band) }.reduce(_ | _)
      }
    rebuilt.foreach { case (id, s) =>
      assert(s == sig(id), s"vec $id: band reassembly $s != signature ${sig(id)}")
    }
  }

  test("q70 hybrid: pairs == q54's, jaccard == exact shingle jaccard per pair") {
    val hybrid = SimilarityOps.hybridDedup(spark, sf0001).cache()
    val q54 = SimilarityOps.embeddingDupsBucketed(spark, sf0001)
      .select(col("vec_a"), col("vec_b"), col("cosine"))
    // tier 1 unchanged: same pair set and cosines as q54
    assert(hybrid.select(col("vec_a"), col("vec_b"), col("cosine"))
      .exceptAll(q54).count() === 0)
    assert(q54.exceptAll(
      hybrid.select(col("vec_a"), col("vec_b"), col("cosine"))).count() === 0)
    // tier 2: jaccard matches a direct exact computation over shingle sets
    val sh = Tables.t(spark, sf0001, "documents").select(col("doc_id"),
      graft.expressions.TextHashes.shingle_hashes(col("text"), 3).as("sh"))
    val direct = hybrid.select(col("vec_a"), col("vec_b"))
      .join(sh.select(col("doc_id").as("vec_a"), col("sh").as("sa")), "vec_a")
      .join(sh.select(col("doc_id").as("vec_b"), col("sh").as("sb")), "vec_b")
      .select(col("vec_a"), col("vec_b"),
        round(size(array_intersect(col("sa"), col("sb"))) /
          (size(col("sa")) + size(col("sb"))
            - size(array_intersect(col("sa"), col("sb")))), 4).as("jaccard"))
    val joined = hybrid.select(col("vec_a"), col("vec_b"), col("jaccard"))
      .join(direct.withColumnRenamed("jaccard", "expected"),
        Seq("vec_a", "vec_b"))
    assert(joined.filter(col("jaccard") =!= col("expected")).count() === 0)
    assert(hybrid.count() > 0)
    hybrid.unpersist()
  }
}
