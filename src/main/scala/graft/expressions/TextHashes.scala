package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused custom Catalyst expressions for the dedup tier.
  *
  * The composable versions in DedupOps (split → transform → xxhash64 →
  * rotate/xor → array_min) are correct but run as interpreted
  * higher-order functions — ~0.8 ms/doc. These expressions do the same
  * math in one tight pass over the tokens (~10 µs/doc), which is what a
  * 100 TB dedup scan needs. Each implements `doGenCode` as a static call
  * into TextHashRuntime, so the whole stage stays inside
  * WholeStageCodegen (no CodegenFallback row boxing). Semantics are
  * bit-identical to the HOF pipeline (proven by DedupSpec equivalence
  * tests):
  * - token split = split(text, ' ') keeping empties (Spark split semantics)
  * - shingle hash = xxhash64(concat_ws(' ', tok_i..tok_{i+w-1})), seed 42
  * - perm_p(h) = rotateLeft(h, p+1) XOR goldenRatio*(p+1)  (signed min)
  * - simhash vote = ±1 per token hash bit, bit set iff vote > 0
  */
object TextHashes {

  def column(e: Expression): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(e)

  def minhash_signature(c: Column, perms: Int = 32, width: Int = 3): Column =
    column(MinHashSignature(expression(c), perms, width))

  def simhash64(c: Column): Column = column(SimHash64(expression(c)))

  def shingle_hashes(c: Column, width: Int = 3): Column =
    column(ShingleHashes(expression(c), width))

  def shingle_hashes_pos(c: Column, width: Int): Column =
    column(ShingleHashesPos(expression(c), width))

  def dedup_fingerprint(c: Column, perms: Int = 32, width: Int = 3): Column =
    column(DedupFingerprint(expression(c), perms, width))

  def sig_sorted_shingles(c: Column, perms: Int = 32, width: Int = 3): Column =
    column(SigSortedShingles(expression(c), perms, width))

  def text_stats(c: Column, sets: Seq[Seq[String]]): Column =
    column(TextStats(expression(c), sets))

  def winnow_fingerprints(c: Column, k: Int = 8, w: Int = 4,
      mod: Long = 1000000007L): Column =
    column(WinnowFingerprints(expression(c), k, w, mod))

  def repetition_stats(c: Column): Column =
    column(RepetitionStats(expression(c)))

  def token_ngrams(c: Column, width: Int = 3): Column =
    column(TokenNgrams(expression(c), width))

  def ordered_pairs(c: Column): Column = column(OrderedPairs(expression(c)))

  private def expression(c: Column): Expression =
    org.apache.spark.sql.graftbridge.Bridge.expression(c)
}

/** Static single-pass implementations — called from both interpreted
  * eval and generated Java (doGenCode). */
object TextHashRuntime {

  val SPACE: UTF8String = UTF8String.fromString(" ")

  def permConst(p: Int): Long =
    -7046029254386353131L * (p + 1) // 0x9E3779B97F4A7C15 wrapped

  def minhash(text: UTF8String, perms: Int, width: Int): ArrayData = {
    val toks = text.split(SPACE, -1)
    val n = toks.length - width + 1
    if (n <= 0) return new GenericArrayData(Array.emptyLongArray)
    val mins = Array.fill(perms)(Long.MaxValue)
    // permConst depends only on p — hoist the perms multiplies out of
    // the tokens × perms inner loop (the file's hottest path)
    val consts = Array.tabulate(perms)(permConst)
    var i = 0
    while (i < n) {
      val h = shingleHash(toks, i, width)
      var p = 0
      while (p < perms) {
        val v = java.lang.Long.rotateLeft(h, p + 1) ^ consts(p)
        if (v < mins(p)) mins(p) = v
        p += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** ALL shingle hashes in POSITION order (no dedup) — the positional
    * twin of shingleHashes for span-level dedup (q154): element i is
    * the hash of the width-gram starting at token i+1. Same token
    * split and shingle hash, so posexplode over this ≡ the
    * xxhash64(concat_ws(' ', slice(toks, i, w))) HOF composition
    * (TextOpsSpec pins it bit-exact). */
  def shingleHashesPos(text: UTF8String, width: Int): ArrayData = {
    val toks = text.split(SPACE, -1)
    val n = toks.length - width + 1
    if (n <= 0) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](n)
    var i = 0
    while (i < n) { out(i) = shingleHash(toks, i, width); i += 1 }
    new GenericArrayData(out)
  }

  def shingleHashes(text: UTF8String, width: Int): ArrayData = {
    val toks = text.split(SPACE, -1)
    val n = toks.length - width + 1
    if (n <= 0) return new GenericArrayData(Array.emptyLongArray)
    val seen = new java.util.LinkedHashSet[java.lang.Long](n * 2)
    var i = 0
    while (i < n) {
      seen.add(shingleHash(toks, i, width))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  def simhash(text: UTF8String): Long = {
    val toks = text.split(SPACE, -1)
    val votes = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      val h = XxHash64Function.hash(toks(i), StringType, 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) != 0L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** One pass over the text: [n_chars, n_tokens, n_punct, hits_0, ...]
    * where n_punct counts chars outside [a-z0-9 ] (the q21 regex class)
    * and hits_i counts space-split tokens present in word set i. */
  def textStats(text: UTF8String,
      sets: Array[java.util.HashSet[UTF8String]]): ArrayData = {
    val toks = text.split(SPACE, -1)
    val out = new Array[Long](3 + sets.length)
    out(0) = text.numChars()
    out(1) = toks.length
    // iterate CODE POINTS (not UTF-16 units) so an astral char counts
    // once, matching regexp_replace/length and the DuckDB oracle
    val str = text.toString
    var punct = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      if (!((cp >= 'a' && cp <= 'z') || (cp >= '0' && cp <= '9') || cp == ' '))
        punct += 1
      i += Character.charCount(cp)
    }
    out(2) = punct
    var t = 0
    while (t < toks.length) {
      var s = 0
      while (s < sets.length) {
        if (sets(s).contains(toks(t))) out(3 + s) += 1
        s += 1
      }
      t += 1
    }
    new GenericArrayData(out)
  }

  /** Winnowing fingerprints in one pass: gram hash = djb2-style
    * polynomial (h*33 + codepoint) mod `mod` over k consecutive CODE
    * POINTS (matching ascii(substr(text, j, 1)) per position), then the
    * min of every w-window of the gram-hash sequence, deduped in
    * first-occurrence order — bit-identical to the HOF pipeline in
    * TextOps.winnowFingerprint's docstring (WinnowSpec equivalence). */
  def winnow(text: UTF8String, k: Int, w: Int, mod: Long): ArrayData = {
    val cps = text.toString.codePoints().toArray
    val nG = cps.length - k + 1
    if (nG < w) return new GenericArrayData(Array.emptyLongArray)
    val gh = new Array[Long](nG)
    var i = 0
    while (i < nG) {
      var h = 5381L
      var j = 0
      while (j < k) { h = (h * 33 + cps(i + j)) % mod; j += 1 }
      gh(i) = h
      i += 1
    }
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    val nW = nG - w + 1
    i = 0
    while (i < nW) {
      var m = gh(i)
      var j = 1
      while (j < w) { if (gh(i + j) < m) m = gh(i + j); j += 1 }
      seen.add(m)
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  /** Repetition stats in one pass: [n_tokens, n_distinct, top_bigram_n,
    * top_trigram_n] — same token split as everywhere (split(text, ' ')
    * keeping empties); n-gram keys join tokens with a single space, so
    * counts equal the HOF concat form exactly (RepetitionSpec). */
  def repetitionStats(text: UTF8String): ArrayData = {
    val toks = text.split(SPACE, -1)
    val n = toks.length
    val distinct = new java.util.HashSet[UTF8String](n * 2)
    var i = 0
    while (i < n) { distinct.add(toks(i)); i += 1 }
    def topGram(width: Int): Long = {
      if (n < width) return 0L
      val counts = new java.util.HashMap[UTF8String, Int](n * 2)
      var best = 0
      var j = 0
      while (j <= n - width) {
        val parts = new Array[UTF8String](width)
        var k = 0
        while (k < width) { parts(k) = toks(j + k); k += 1 }
        val g = UTF8String.concatWs(SPACE, parts: _*)
        val c = counts.merge(g, 1, (a, b) => a + b)
        if (c > best) best = c
        j += 1
      }
      best.toLong
    }
    new GenericArrayData(Array(n.toLong, distinct.size.toLong,
      topGram(2), topGram(3)))
  }

  /** C(n,2) ordered pairs of a string array as (sa, sb) rows, i < j in
    * array order — bit-identical to the HOF
    * flatten(transform(srcs, (x,i) -> transform(slice(srcs, i+2, n),
    * y -> struct(x, y)))) composition (CorpusStatsSpec equivalence). */
  def orderedPairs(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val out = new Array[Any](n * (n - 1) / 2)
    var k = 0
    var i = 0
    while (i < n) {
      // null elements loudly, like sortedIntersectCount's require: the
      // contract is a sorted distinct source SET (collect_set output —
      // never null-bearing), and passing a null through would emit
      // (NULL, b) pairs that aggregate as real source pairs downstream
      require(!a.isNullAt(i),
        s"ordered_pairs: null element at $i — input must be a distinct " +
          "non-null source set (collect_set can never produce one)")
      val x = a.getUTF8String(i)
      var j = i + 1
      while (j < n) {
        out(k) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](x, a.getUTF8String(j)))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** All word `width`-grams as space-joined strings, in order, with
    * multiplicity (q65 counts occurrences — no dedup here). Same token
    * split as everywhere. */
  def tokenNgrams(text: UTF8String, width: Int): ArrayData = {
    val toks = text.split(SPACE, -1)
    val n = toks.length - width + 1
    if (n <= 0) return new GenericArrayData(Array.empty[AnyRef])
    val out = new Array[AnyRef](n)
    var i = 0
    while (i < n) {
      val parts = new Array[UTF8String](width)
      var k = 0
      while (k < width) { parts(k) = toks(i + k); k += 1 }
      out(i) = UTF8String.concatWs(SPACE, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** The q29 fingerprint trio — simhash64 + distinct-shingle count +
    * MinHash signature — in ONE pass: one token split, one shingle-hash
    * sweep feeding BOTH the distinct set and the perm minima, one
    * token-hash sweep for the simhash votes. The separate expressions
    * split the text three times and hash the shingles twice; and
    * because simhashTieredKeys evaluates its fingerprint projection
    * once per tier branch of a union, the waste doubled — measured as
    * ~80% of q29's cost sitting in candidate enumeration (PLANS.md
    * round-10 tier split). Layout: [f, sz, min_0..min_{perms-1}]
    * (length 2 for sub-width docs — sz 0, no signature), decoded by
    * element_at/slice; bit-equivalence to the three separate fused
    * expressions is DedupSpec-pinned. */
  def dedupFingerprint(text: UTF8String, perms: Int, width: Int): ArrayData = {
    val toks = text.split(SPACE, -1)
    val votes = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      val h = XxHash64Function.hash(toks(i), StringType, 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) != 0L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var f = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) f |= (1L << b)
      b += 1
    }
    val n = toks.length - width + 1
    if (n <= 0) return new GenericArrayData(Array(f, 0L))
    val consts = Array.tabulate(perms)(permConst)
    val mins = Array.fill(perms)(Long.MaxValue)
    val seen = new java.util.HashSet[java.lang.Long](n * 2)
    i = 0
    while (i < n) {
      val h = shingleHash(toks, i, width)
      seen.add(h)
      var p = 0
      while (p < perms) {
        val v = java.lang.Long.rotateLeft(h, p + 1) ^ consts(p)
        if (v < mins(p)) mins(p) = v
        p += 1
      }
      i += 1
    }
    val out = new Array[Long](2 + perms)
    out(0) = f
    out(1) = seen.size.toLong
    System.arraycopy(mins, 0, out, 2, perms)
    new GenericArrayData(out)
  }

  /** The ingest-path pair — MinHash signature + SORTED distinct shingle
    * hashes — in one pass: one split, one shingle sweep feeding both
    * the perm minima and the distinct set, plus the sort the consumers
    * (linear-merge SortedIntersectCount) need exactly once per doc.
    * Struct{sig: array<bigint>, hs: array<bigint>}; bit-identical to
    * minhash_signature ⊕ sort_array(shingle_hashes) (DedupSpec). */
  def sigSortedShingles(text: UTF8String, perms: Int, width: Int)
      : org.apache.spark.sql.catalyst.InternalRow = {
    val toks = text.split(SPACE, -1)
    val n = toks.length - width + 1
    if (n <= 0)
      return new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](new GenericArrayData(Array.emptyLongArray),
          new GenericArrayData(Array.emptyLongArray)))
    val consts = Array.tabulate(perms)(permConst)
    val mins = Array.fill(perms)(Long.MaxValue)
    val seen = new java.util.HashSet[java.lang.Long](n * 2)
    var i = 0
    while (i < n) {
      val h = shingleHash(toks, i, width)
      seen.add(h)
      var p = 0
      while (p < perms) {
        val v = java.lang.Long.rotateLeft(h, p + 1) ^ consts(p)
        if (v < mins(p)) mins(p) = v
        p += 1
      }
      i += 1
    }
    val hs = new Array[Long](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { hs(j) = it.next(); j += 1 }
    java.util.Arrays.sort(hs) // = sort_array asc over non-null longs
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](new GenericArrayData(mins), new GenericArrayData(hs)))
  }

  private def shingleHash(toks: Array[UTF8String], i: Int, width: Int): Long = {
    val parts = new Array[UTF8String](width)
    var k = 0
    while (k < width) { parts(k) = toks(i + k); k += 1 }
    XxHash64Function.hash(
      UTF8String.concatWs(SPACE, parts: _*), StringType, 42L)
  }
}

/** MinHash signature of word `width`-gram shingles: array of `perms`
  * signed minima. Empty/too-short docs → empty array. */
case class MinHashSignature(child: Expression, perms: Int, width: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  require(perms >= 1 && perms <= 63 && width >= 1)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(input: Any): Any =
    TextHashRuntime.minhash(input.asInstanceOf[UTF8String], perms, width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.TextHashRuntime.minhash($c, $perms, $width);")

  override protected def withNewChildInternal(c: Expression): MinHashSignature =
    copy(child = c)
}

/** [[TextHashRuntime.dedupFingerprint]] as an expression: the q29
  * fingerprint trio in one tokenization pass, array<bigint> layout
  * [simhash, n_distinct_shingles, minhash_0..minhash_{perms-1}]. */
case class DedupFingerprint(child: Expression, perms: Int, width: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  require(perms >= 1 && perms <= 63 && width >= 1)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "dedup_fingerprint"

  override def nullSafeEval(input: Any): Any =
    TextHashRuntime.dedupFingerprint(input.asInstanceOf[UTF8String], perms, width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.TextHashRuntime.dedupFingerprint($c, $perms, $width);")

  override protected def withNewChildInternal(c: Expression): DedupFingerprint =
    copy(child = c)
}

/** [[TextHashRuntime.sigSortedShingles]] as an expression —
  * struct{sig, hs} for the persistent-index ingest path, one
  * tokenization instead of minhash_signature ⊕
  * sort_array(shingle_hashes)'s two. */
case class SigSortedShingles(child: Expression, perms: Int, width: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  require(perms >= 1 && perms <= 63 && width >= 1)

  override def dataType: DataType = StructType(Seq(
    StructField("sig", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("hs", ArrayType(LongType, containsNull = false), nullable = false)))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sig_sorted_shingles"

  override def nullSafeEval(input: Any): Any =
    TextHashRuntime.sigSortedShingles(input.asInstanceOf[UTF8String], perms, width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.TextHashRuntime.sigSortedShingles($c, $perms, $width);")

  override protected def withNewChildInternal(c: Expression): SigSortedShingles =
    copy(child = c)
}

/** ALL word `width`-gram shingle hashes in position order — q154's
  * span-dedup scan primitive (ShingleHashes dedups; spans need every
  * occurrence with its start index). */
case class ShingleHashesPos(child: Expression, width: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  require(width >= 1)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingle_hashes_pos"

  override def nullSafeEval(input: Any): Any =
    TextHashRuntime.shingleHashesPos(input.asInstanceOf[UTF8String], width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.TextHashRuntime.shingleHashesPos($c, $width);")

  override protected def withNewChildInternal(c: Expression): ShingleHashesPos =
    copy(child = c)
}

/** Distinct xxhash64 set of the word `width`-gram shingles (same token
  * split and shingle hash as MinHashSignature). Jaccard over these long
  * sets equals Jaccard over the distinct shingle-string sets (modulo
  * 64-bit hash collisions) at a fraction of the compare cost — the
  * verification-stage companion to the signature. */
case class ShingleHashes(child: Expression, width: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  require(width >= 1)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    TextHashRuntime.shingleHashes(input.asInstanceOf[UTF8String], width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.TextHashRuntime.shingleHashes($c, $width);")

  override protected def withNewChildInternal(c: Expression): ShingleHashes =
    copy(child = c)
}

/** Fused text statistics: ONE tokenization + ONE character scan per row
  * replaces the q21/q24 composition of regexp_replace (string rebuild
  * just to count punct) and a split + filter HOF per word set (4 splits
  * per row in lang-id). Output array<bigint>:
  * [n_chars, n_tokens, n_punct, hits_0, hits_1, ...] — one hit count
  * per word set, same token semantics as split(text, ' ') with empties.
  * Equivalence to the composable HOF forms is spec-proven
  * (TextStatsSpec). */
case class TextStats(child: Expression, sets: Seq[Seq[String]])
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "text_stats"

  @transient private lazy val runtimeSets: Array[java.util.HashSet[UTF8String]] =
    sets.map { ws =>
      val hs = new java.util.HashSet[UTF8String](ws.size * 2)
      ws.foreach(w => hs.add(UTF8String.fromString(w)))
      hs
    }.toArray

  override def nullSafeEval(input: Any): Any =
    TextHashRuntime.textStats(input.asInstanceOf[UTF8String], runtimeSets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setsRef = ctx.addReferenceObj("textStatsSets", runtimeSets,
      "java.util.HashSet[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.TextHashRuntime.textStats($c, $setsRef);")
  }

  override protected def withNewChildInternal(c: Expression): TextStats =
    copy(child = c)
}

/** Winnowing fingerprint set (Schleimer et al.) — min-of-each-w-window
  * over k-gram polynomial hashes, distinct, first-occurrence order. */
case class WinnowFingerprints(child: Expression, k: Int, w: Int, mod: Long)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  require(k >= 1 && w >= 1 && mod > 1)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "winnow_fingerprints"

  override def nullSafeEval(input: Any): Any =
    TextHashRuntime.winnow(input.asInstanceOf[UTF8String], k, w, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.TextHashRuntime.winnow($c, $k, $w, ${mod}L);")

  override protected def withNewChildInternal(c: Expression): WinnowFingerprints =
    copy(child = c)
}

/** [n_tokens, n_distinct, top_bigram_n, top_trigram_n] in one pass —
  * the q59 Gopher-rule inputs. */
case class RepetitionStats(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "repetition_stats"

  override def nullSafeEval(input: Any): Any =
    TextHashRuntime.repetitionStats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.TextHashRuntime.repetitionStats($c);")

  override protected def withNewChildInternal(c: Expression): RepetitionStats =
    copy(child = c)
}

/** Word `width`-gram strings with multiplicity — the phrase unit of the
  * q65/q66 inverted index, fused for the same reason as ShingleHashes:
  * the transform(sequence, i -> concat(...)) HOF form interprets
  * ~1.4 ms/doc (measured 7 s for a 5 000-doc single-partition scan at
  * sf0.1) where this runs ~10 µs/doc inside WholeStageCodegen. */
case class TokenNgrams(child: Expression, width: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  require(width >= 1)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "token_ngrams"

  override def nullSafeEval(input: Any): Any =
    TextHashRuntime.tokenNgrams(input.asInstanceOf[UTF8String], width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.TextHashRuntime.tokenNgrams($c, $width);")

  override protected def withNewChildInternal(c: Expression): TokenNgrams =
    copy(child = c)
}

/** All ordered element pairs (i < j) of a string array as (sa, sb)
  * structs — the q69 pair-explosion unit. The HOF composition
  * (flatten(transform(slice...))) is CodegenFallback: interpreted,
  * allocating a lambda frame per element, on a frame with one row per
  * DISTINCT PHRASE — millions at corpus scale. One fused pass builds
  * the C(n,2) rows directly. Input is the sorted distinct source set,
  * so output order (i before j) preserves the sa < sb contract. */
case class OrderedPairs(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("sa", StringType, nullable = true),
    StructField("sb", StringType, nullable = true))), containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ordered_pairs"

  override def nullSafeEval(input: Any): Any =
    TextHashRuntime.orderedPairs(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.TextHashRuntime.orderedPairs($c);")

  override protected def withNewChildInternal(c: Expression): OrderedPairs =
    copy(child = c)
}

/** 64-bit SimHash over whitespace tokens (xxhash64 seed 42 per token,
  * majority vote per bit). */
case class SimHash64(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(
      TextHashRuntime.simhash(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.TextHashRuntime.simhash($c);")

  override protected def withNewChildInternal(c: Expression): SimHash64 =
    copy(child = c)
}
