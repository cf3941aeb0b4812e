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

  test("salting beats the plain shuffle join on a hot-key corpus (the bench extras ordering)") {
    // promotes the measured-but-unasserted bench extras row
    // (skew_salted < skew_plain) to a gate. Min-of-2 wall clocks with a
    // 95%-hot 1.2M-row build: plain concentrates ~1.14M rows in ONE
    // sort-merge partition, salted spreads them 8 ways — the gap is
    // structural (~2×), far beyond box noise on min-of-2.
    val n = 1200000L
    val big = spark.range(n).select(
      when(pmod(col("id"), lit(20)) =!= 0, lit(1L))
        .otherwise(pmod(xxhash64(col("id")), lit(50000))).as("k"),
      col("id").as("v")).persist()
    big.count()
    val small = spark.range(50000).select(col("id").as("k"),
      concat(lit("dim_"), col("id")).as("label"))
    val prevB = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevS = spark.conf.get("spark.sql.adaptive.skewJoin.enabled")
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
      def run(f: => Unit): Double = math.min(time(f), time(f))
      val plain = run(big.join(small, "k")
        .write.format("noop").mode("overwrite").save())
      val salted = run(SkewJoin.saltedJoin(big, small, "k", 8)
        .write.format("noop").mode("overwrite").save())
      assert(salted < plain,
        f"salted join ($salted%.2f s) must beat the plain shuffle join " +
          f"($plain%.2f s) on a 95%%-hot key — salting has regressed")
    } finally {
      big.unpersist(false)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", prevS)
    }
  }
}
