package graft

import org.apache.spark.sql.types._

/** The fixture contract: the driver REGENERATES /root/testdata each
  * round, and physical types have drifted between generations (round 6:
  * events.ts flipped TIMESTAMP(NANOS) → tz-naive µs). This suite makes
  * the NEXT drift fail here, by name, instead of as an analysis
  * exception deep inside whichever query touches the changed column
  * first. On failure: fix centrally in Tables.scala (the loader
  * normalizes generations), never per query.
  */
class FixtureContractSpec extends SparkSpec {

  private def schemaOf(name: String) =
    Tables.t(spark, sf0001, name).schema.map(f => f.name -> f.dataType).toMap

  // temporal columns may arrive tz-naive (NTZ) or instant-typed (LTZ)
  // depending on the generator; every consumer here handles both under
  // the session's pinned UTC
  private def temporal(dt: DataType): Boolean =
    dt == TimestampType || dt == TimestampNTZType || dt == DateType

  test("events: ts is NORMALIZED to LTZ by Tables.events; numeric/id types stable") {
    val s = schemaOf("events")
    // strictly TimestampType: Tables.events' normalization contract —
    // unix_millis/unix_micros (q33/q87) reject NTZ
    assert(s("ts") == TimestampType,
      s"Tables.events must normalize every fixture generation to LTZ, got ${s("ts")}")
    assert(s("event_id") == LongType && s("user_id") == LongType &&
      s("value") == DoubleType && s("event_type") == StringType &&
      s("props") == StringType, s"events schema drifted: $s")
  }

  test("documents/embeddings: the LLM-pipeline tier's column contract") {
    val d = schemaOf("documents")
    assert(d("doc_id") == LongType && d("text") == StringType &&
      d("lang") == StringType && d("source") == StringType,
      s"documents schema drifted: $d")
    val e = schemaOf("embeddings")
    assert(e("vec_id") == LongType, s"embeddings schema drifted: $e")
    assert(e("embedding") == ArrayType(FloatType, containsNull = true) ||
      e("embedding") == ArrayType(FloatType, containsNull = false),
      s"embedding must stay array<float> (the fused cosine/band " +
        s"expressions bind to FloatType), got ${e("embedding")}")
  }

  test("documents.text stays non-null pure ASCII — the media-oracle byte/char equivalence") {
    import org.apache.spark.sql.functions._
    // q31/q49's DuckDB oracles read CHARACTERS (ascii(substring)) where
    // the Spark side reads BYTES (payload(i) & 0xff): the two agree iff
    // every text is single-byte ASCII — and the media pipeline's stub
    // digests assume non-null. A regeneration that breaks either must
    // fail HERE by name, not deep inside a hash compare.
    val bad = Tables.t(spark, sf0001, "documents")
      .filter(col("text").isNull ||
        octet_length(col("text")) =!= length(col("text")))
      .count()
    assert(bad == 0L,
      s"$bad documents rows are null or non-ASCII — the q31/q49 " +
        "byte-vs-char oracle equivalence no longer holds")
  }

  test("star schema: join keys keep their integral types; money stays double") {
    val l = schemaOf("lineitem"); val o = schemaOf("orders")
    val c = schemaOf("customer"); val p = schemaOf("part")
    assert(l("l_orderkey") == LongType && o("o_orderkey") == LongType &&
      l("l_partkey") == LongType && p("p_partkey") == LongType &&
      o("o_custkey") == LongType && c("c_custkey") == LongType,
      "a join-key type drift would silently change join/shuffle semantics")
    assert(l("l_quantity") == DoubleType &&
      l("l_extendedprice") == DoubleType && o("o_totalprice") == DoubleType,
      "money columns are double in the fixtures (q76 carries the decimal twin)")
    assert(temporal(l("l_shipdate")) && temporal(o("o_orderdate")),
      s"temporal columns must stay timestamp/date-shaped: " +
        s"${l("l_shipdate")}, ${o("o_orderdate")}")
  }
}
