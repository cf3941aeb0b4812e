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
}
