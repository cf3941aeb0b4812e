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
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression, name: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$name expects an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_signature"),
      (args: Seq[Expression]) => args match {
        case Seq(text) => MinHashSignature(text, 32, 3)
        case Seq(text, p) => MinHashSignature(text, intArg(p, "perms"), 3)
        case Seq(text, p, w) =>
          MinHashSignature(text, intArg(p, "perms"), intArg(w, "width"))
        case _ => throw new IllegalArgumentException(
          "minhash_signature(text[, perms[, width]])")
      }))
    ext.injectFunction((
      new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (args: Seq[Expression]) => args match {
        case Seq(text) => SimHash64(text)
        case _ => throw new IllegalArgumentException("simhash64(text)")
      }))
    ext.injectFunction((
      new FunctionIdentifier("winnow_fingerprints"),
      new ExpressionInfo(classOf[WinnowFingerprints].getName, "winnow_fingerprints"),
      (args: Seq[Expression]) => args match {
        case Seq(text) => WinnowFingerprints(text, 8, 4, 1000000007L)
        case Seq(text, k, w) =>
          WinnowFingerprints(text, intArg(k, "k"), intArg(w, "w"), 1000000007L)
        case _ => throw new IllegalArgumentException(
          "winnow_fingerprints(text[, k, w])")
      }))
    ext.injectFunction((
      new FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
      (args: Seq[Expression]) => args match {
        case Seq(text) => ShingleHashes(text, 3)
        case Seq(text, w) => ShingleHashes(text, intArg(w, "width"))
        case _ => throw new IllegalArgumentException("shingle_hashes(text[, width])")
      }))
    ext.injectFunction((
      new FunctionIdentifier("repetition_stats"),
      new ExpressionInfo(classOf[RepetitionStats].getName, "repetition_stats"),
      (args: Seq[Expression]) => args match {
        case Seq(text) => RepetitionStats(text)
        case _ => throw new IllegalArgumentException("repetition_stats(text)")
      }))
    ext.injectFunction((
      new FunctionIdentifier("token_ngrams"),
      new ExpressionInfo(classOf[TokenNgrams].getName, "token_ngrams"),
      (args: Seq[Expression]) => args match {
        case Seq(text) => TokenNgrams(text, 3)
        case Seq(text, w) => TokenNgrams(text, intArg(w, "width"))
        case _ => throw new IllegalArgumentException("token_ngrams(text[, width])")
      }))
    ext.injectFunction((
      new FunctionIdentifier("sorted_intersect_count"),
      new ExpressionInfo(classOf[SortedIntersectCount].getName, "sorted_intersect_count"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => SortedIntersectCount(a, b)
        case _ => throw new IllegalArgumentException(
          "sorted_intersect_count(sorted_array, sorted_array)")
      }))
  }
}

object GraftExtensions {
  /** Per-session registration for an already-built session (tests, REPL). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg: FunctionRegistry = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("minhash_signature",
      args => args match {
        case Seq(t) => MinHashSignature(t, 32, 3)
        case Seq(t, Literal(p: Int, _)) => MinHashSignature(t, p, 3)
        case Seq(t, Literal(p: Int, _), Literal(w: Int, _)) => MinHashSignature(t, p, w)
        case _ => throw new IllegalArgumentException(
          "minhash_signature(text[, perms[, width]])")
      }, "built-in")
    reg.createOrReplaceTempFunction("simhash64",
      args => SimHash64(args.head), "built-in")
    reg.createOrReplaceTempFunction("winnow_fingerprints",
      args => args match {
        case Seq(t) => WinnowFingerprints(t, 8, 4, 1000000007L)
        case Seq(t, Literal(k: Int, _), Literal(w: Int, _)) =>
          WinnowFingerprints(t, k, w, 1000000007L)
        case _ => throw new IllegalArgumentException(
          "winnow_fingerprints(text[, k, w])")
      }, "built-in")
    reg.createOrReplaceTempFunction("shingle_hashes",
      args => args match {
        case Seq(t) => ShingleHashes(t, 3)
        case Seq(t, Literal(w: Int, _)) => ShingleHashes(t, w)
        case _ => throw new IllegalArgumentException("shingle_hashes(text[, width])")
      }, "built-in")
    reg.createOrReplaceTempFunction("repetition_stats",
      args => RepetitionStats(args.head), "built-in")
    reg.createOrReplaceTempFunction("token_ngrams",
      args => args match {
        case Seq(t) => TokenNgrams(t, 3)
        case Seq(t, Literal(w: Int, _)) => TokenNgrams(t, w)
        case _ => throw new IllegalArgumentException("token_ngrams(text[, width])")
      }, "built-in")
    reg.createOrReplaceTempFunction("sorted_intersect_count",
      args => args match {
        case Seq(a, b) => SortedIntersectCount(a, b)
        case _ => throw new IllegalArgumentException(
          "sorted_intersect_count(sorted_array, sorted_array)")
      }, "built-in")
  }
}
