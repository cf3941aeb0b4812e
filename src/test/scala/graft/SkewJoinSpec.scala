package graft

import graft.operators.SkewJoin
import org.apache.spark.sql.functions._

/** Salted join ≡ plain join, and the salt genuinely spreads a hot key. */
class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted join result equals the plain equi-join on skewed data") {
    // 10k rows, 90% on one hot key
    val big = spark.range(10000)
      .select(when(col("id") % 10 =!= 0, lit(1L)).otherwise(col("id")).as("k"),
        col("id").as("v"))
    val small = Seq((1L, "hot"), (20L, "cold"), (30L, "cold2")).toDF("k", "label")
    val plain = big.join(small, Seq("k"))
      .select("k", "v", "label").as[(Long, Long, String)].collect().toSet
    val salted = SkewJoin.saltedJoin(big, small, "k", 8)
      .select("k", "v", "label").as[(Long, Long, String)].collect().toSet
    assert(salted == plain)
    assert(plain.count(_._1 == 1L) == 9000)
  }

  test("salt column distributes the hot key across buckets") {
    val big = spark.range(8000).select(lit(1L).as("k"), col("id").as("v"))
      .withColumn("__salt", (xxhash64(monotonically_increasing_id()) % 8 + 8) % 8)
    val buckets = big.groupBy("__salt").count().as[(Long, Long)].collect().toMap
    assert(buckets.size == 8)
    assert(buckets.values.max < 8000 * 0.25) // no bucket holds the whole key
  }

  test("salted join shuffles on (key, salt) — the salt reaches the exchange") {
    // the STRUCTURAL pin behind the bench's skew extras: if a refactor
    // dropped __salt from the join keys, semantics would survive (the
    // spec above) but the hot key would collapse back into one shuffle
    // partition — visible only as a silent perf cliff. Assert the
    // executed plan's hash partitioning actually carries the salt.
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    val big = spark.range(20000).select(lit(1L).as("k"), col("id").as("v"))
    val small = Seq((1L, "hot")).toDF("k", "label")
    val prevB = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = SkewJoin.saltedJoin(big, small, "k", 8)
      joined.count()
      val saltedExchanges = walkPlan(joined.queryExecution.executedPlan)
        .collect { case e: ShuffleExchangeExec => e.outputPartitioning }
        .collect { case h: HashPartitioning => h.expressions.map(_.sql) }
        .filter(_.exists(_.contains("__salt")))
      assert(saltedExchanges.nonEmpty,
        "no exchange partitions by __salt — the hot key is not being spread")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
  }

  test("salting spreads the hot key's shuffle rows and beats the plain join (retry-on-contention)") {
    // promotes the measured-but-unasserted bench extras row
    // (skew_salted < skew_plain) to a gate, in two layers:
    //
    //  1. a DETERMINISTIC spread pin — the fact the timing rides on:
    //     under the plain hash partitioning one partition receives the
    //     entire ~95%-hot key, under (k, __salt) no partition holds
    //     more than ~1/8 of it. Row counts, no wall clock, immune to
    //     box noise.
    //  2. the wall-clock ordering itself, RETRIED up to 3 attempts:
    //     this was the suite's one contention-fragile assertion (r16:
    //     failed under 32-core suite self-contention, passed 4/4
    //     isolated, bench extras quietly agreed at 1.32 vs 1.99 s). A
    //     real salting regression is structural and loses every
    //     attempt; a contended box loses at most the contended ones.
    val n = 1200000L
    val parts = 32
    val big = spark.range(n).select(
      when(pmod(col("id"), lit(20)) =!= 0, lit(1L))
        .otherwise(pmod(xxhash64(col("id")), lit(50000))).as("k"),
      col("id").as("v")).persist()
    big.count()
    val small = spark.range(50000).select(col("id").as("k"),
      concat(lit("dim_"), col("id")).as("label"))
    def maxPartRows(df: org.apache.spark.sql.DataFrame): Long =
      df.mapPartitions(it => Iterator.single(it.size.toLong))(
        org.apache.spark.sql.Encoders.scalaLong).collect().max
    val plainSpread = maxPartRows(big.repartition(parts, col("k")))
    val saltedSpread = maxPartRows(big
      .withColumn("__salt", (xxhash64(monotonically_increasing_id()) % 8 + 8) % 8)
      .repartition(parts, col("k"), col("__salt")))
    assert(plainSpread > (n * 9) / 10,
      s"fixture drifted: the hot key no longer concentrates ($plainSpread)")
    assert(saltedSpread < n / 4,
      s"salting no longer spreads the hot key ($saltedSpread rows in one " +
        "partition) — the shuffle would collapse back to one task")
    val prevB = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevS = spark.conf.get("spark.sql.adaptive.skewJoin.enabled")
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
      def run(f: => Unit): Double = math.min(time(f), time(f))
      val attempts = (1 to 3).iterator.map { _ =>
        val plain = run(big.join(small, "k")
          .write.format("noop").mode("overwrite").save())
        val salted = run(SkewJoin.saltedJoin(big, small, "k", 8)
          .write.format("noop").mode("overwrite").save())
        (salted, plain)
      }
      assert(attempts.exists { case (s, p) => s < p },
        "salted join lost to the plain shuffle join on ALL 3 attempts " +
          "(min-of-2 each) — beyond contention; salting has regressed")
    } finally {
      big.unpersist(false)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", prevS)
    }
  }
}
