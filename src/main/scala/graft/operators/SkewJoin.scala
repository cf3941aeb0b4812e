package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling join utility (the 100 TB story's hot-key tool; SURVEY
  * §2 preamble on salting + AQE).
  *
  * AQE's skew-join split handles most skew automatically (enabled in
  * every session here); explicit salting remains the tool when one build
  * side must stay a shuffle join and a handful of keys dominate —
  * replicate the small side `salt` ways, scatter the big side's rows
  * uniformly across the replicas, join on (key, salt). Semantics are
  * identical to the plain equi-join (spec-verified); the shuffle's
  * largest partition shrinks by ~`salt`×.
  */
object SkewJoin {

  /** Inner equi-join of `big` (skewed) with `small` on `key`, salted
    * `salt` ways. `small` is replicated `salt` times — keep it the
    * dimension side. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salt: Int,
      joinType: String = "inner"): DataFrame = {
    require(salt >= 1)
    // right/full would emit one row per salt replica for unmatched small
    // rows — semantically wrong; only these types preserve semantics
    require(Set("inner", "left", "left_outer", "left_semi").contains(joinType),
      s"saltedJoin supports inner/left/left_semi, got $joinType")
    // withColumn would silently OVERWRITE a caller's real __salt column
    // (and the trailing drop would then destroy it) — collide loudly
    require(!big.columns.contains("__salt") && !small.columns.contains("__salt"),
      "saltedJoin: input already has a __salt column — rename it first")
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salt.toLong)))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0L), lit((salt - 1).toLong))))
    saltedBig.join(saltedSmall, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
