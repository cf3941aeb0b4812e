package graft.expressions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SparkSessionExtensions entry point: registers the engine's custom
  * expressions as SQL functions, so `spark.sql("SELECT simhash64(text)
  * ...")` works next to the Column API. Activate with
  * `.config("spark.sql.extensions", "graft.expressions.GraftExtensions")`
  * or `.withExtensions(new GraftExtensions)`.
  *
  * ONE builder table serves both the extension path (`injectFunction`)
  * and the per-session path (`register`) — the two used to duplicate
  * every arm and had already drifted (the per-session simhash64 took
  * `args.head`, silently discarding extra arguments the extension path
  * rejected).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.builders.foreach { case (name, cls, build) =>
      ext.injectFunction((
        new FunctionIdentifier(name), new ExpressionInfo(cls.getName, name),
        build))
    }
}

object GraftExtensions {

  private def intArg(e: Expression, name: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$name expects an integer literal, got $other")
  }

  /** name → (expression class for ExpressionInfo, arity-checked builder). */
  val builders: Seq[(String, Class[_], Seq[Expression] => Expression)] = Seq(
    ("minhash_signature", classOf[MinHashSignature], {
      case Seq(text) => MinHashSignature(text, 32, 3)
      case Seq(text, p) => MinHashSignature(text, intArg(p, "perms"), 3)
      case Seq(text, p, w) =>
        MinHashSignature(text, intArg(p, "perms"), intArg(w, "width"))
      case _ => throw new IllegalArgumentException(
        "minhash_signature(text[, perms[, width]])")
    }),
    ("simhash64", classOf[SimHash64], {
      case Seq(text) => SimHash64(text)
      case _ => throw new IllegalArgumentException("simhash64(text)")
    }),
    ("winnow_fingerprints", classOf[WinnowFingerprints], {
      case Seq(text) => WinnowFingerprints(text, 8, 4, 1000000007L)
      case Seq(text, k, w) =>
        WinnowFingerprints(text, intArg(k, "k"), intArg(w, "w"), 1000000007L)
      case _ => throw new IllegalArgumentException(
        "winnow_fingerprints(text[, k, w])")
    }),
    ("shingle_hashes", classOf[ShingleHashes], {
      case Seq(text) => ShingleHashes(text, 3)
      case Seq(text, w) => ShingleHashes(text, intArg(w, "width"))
      case _ => throw new IllegalArgumentException("shingle_hashes(text[, width])")
    }),
    ("dedup_fingerprint", classOf[DedupFingerprint], {
      case Seq(text) => DedupFingerprint(text, 32, 3)
      case Seq(text, p) => DedupFingerprint(text, intArg(p, "perms"), 3)
      case Seq(text, p, w) =>
        DedupFingerprint(text, intArg(p, "perms"), intArg(w, "width"))
      case _ => throw new IllegalArgumentException(
        "dedup_fingerprint(text[, perms[, width]])")
    }),
    ("sig_sorted_shingles", classOf[SigSortedShingles], {
      case Seq(text) => SigSortedShingles(text, 32, 3)
      case Seq(text, p) => SigSortedShingles(text, intArg(p, "perms"), 3)
      case Seq(text, p, w) =>
        SigSortedShingles(text, intArg(p, "perms"), intArg(w, "width"))
      case _ => throw new IllegalArgumentException(
        "sig_sorted_shingles(text[, perms[, width]])")
    }),
    ("repetition_stats", classOf[RepetitionStats], {
      case Seq(text) => RepetitionStats(text)
      case _ => throw new IllegalArgumentException("repetition_stats(text)")
    }),
    ("token_ngrams", classOf[TokenNgrams], {
      case Seq(text) => TokenNgrams(text, 3)
      case Seq(text, w) => TokenNgrams(text, intArg(w, "width"))
      case _ => throw new IllegalArgumentException("token_ngrams(text[, width])")
    }),
    ("ordered_pairs", classOf[OrderedPairs], {
      case Seq(a) => OrderedPairs(a)
      case _ => throw new IllegalArgumentException("ordered_pairs(array<string>)")
    }),
    ("sorted_intersect_count", classOf[SortedIntersectCount], {
      case Seq(a, b) => SortedIntersectCount(a, b)
      case _ => throw new IllegalArgumentException(
        "sorted_intersect_count(sorted_array, sorted_array)")
    }),
    ("dot_product", classOf[DotProduct], {
      case Seq(a, b) => DotProduct(a, b)
      case _ => throw new IllegalArgumentException(
        "dot_product(array<double>, array<double>)")
    }),
    ("cosine_sim", classOf[CosineSim], {
      case Seq(a, b) => CosineSim(a, b)
      case _ => throw new IllegalArgumentException(
        "cosine_sim(array<double>, array<double>)")
    }))

  /** Per-session registration for an already-built session (tests, REPL)
    * — same builders, so behavior cannot drift from the extension path. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg: FunctionRegistry = spark.sessionState.functionRegistry
    builders.foreach { case (name, _, build) =>
      reg.createOrReplaceTempFunction(name, build, "built-in")
    }
  }
}
