package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Fused custom Catalyst expressions for the embedding/set tier — same
  * rationale as TextHashes: the composable Column forms (zip_with +
  * aggregate dots, array_intersect) are correct but interpreted
  * per-element; these do the identical math in one tight primitive-array
  * pass and stay inside WholeStageCodegen.
  *
  * - SignBandVals: all hyperplane dot products of one banding family in
  *   a single pass (q54's banding ran 128 interpreted HOF dots/row —
  *   ~ms/row; fused is ~µs/row). Accumulation order matches the
  *   zip_with+aggregate composition term for term, so sign decisions —
  *   and therefore band values — are bit-identical
  *   (EmbeddingDedupSpec equivalence test).
  * - SortedIntersectCount: |A ∩ B| of two SORTED distinct long arrays
  *   by linear merge — replaces size(array_intersect(...)), which
  *   builds a hash set per pair, in the dedup verify tiers where pairs
  *   vastly outnumber documents (sort once per doc, merge per pair).
  */
object VectorHashes {

  def column(e: Expression): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(e)

  private def expression(c: Column): Expression =
    org.apache.spark.sql.graftbridge.Bridge.expression(c)

  def sign_band_vals(v: Column, planes: Seq[Seq[Double]], bandBits: Int): Column =
    column(SignBandVals(expression(v), planes, bandBits))

  def sorted_intersect_count(a: Column, b: Column): Column =
    column(SortedIntersectCount(expression(a), expression(b)))

  def vec_dots(v: Column, mat: Seq[Seq[Double]], offset: Int = 0): Column =
    column(VecDots(expression(v), mat, offset))

  def dot_product(a: Column, b: Column): Column =
    column(DotProduct(expression(a), expression(b)))

  def cosine_sim(a: Column, b: Column): Column =
    column(CosineSim(expression(a), expression(b)))
}

object VectorRuntime {

  /** Band values of a sign-bit hyperplane family: band b's value packs
    * the sign bits of planes [b·bandBits, (b+1)·bandBits). planesFlat is
    * row-major (plane p occupies [p·dims, (p+1)·dims)). The inner dot
    * accumulates left to right from 0.0 — the exact fp operation order
    * of aggregate(zip_with(v, plane, _*_), 0.0, _+_). */
  def signBandVals(v: ArrayData, planesFlat: Array[Double], dims: Int,
      bandBits: Int): ArrayData = {
    val nPlanes = planesFlat.length / dims
    val out = new Array[Long](nPlanes / bandBits)
    // malformed embedding — wrong length or a null element: in the
    // composition twin every per-plane dot is NULL (zip_with pads /
    // nulls the product) and `when(dot > 0, ...)` falls through to 0,
    // so every bit stays unset. Mirror that with all-zero bands instead
    // of crashing on a short vector, silently truncating a long one, or
    // reading garbage through toDoubleArray on a null-bearing one
    // (dotProduct/cosineSim below guard the same two hazards).
    if (v.numElements != dims || anyNullElement(v))
      return new GenericArrayData(out)
    val x = v.toDoubleArray()
    var p = 0
    while (p < nPlanes) {
      var acc = 0.0
      val off = p * dims
      var i = 0
      while (i < dims) { acc += x(i) * planesFlat(off + i); i += 1 }
      // Spark SQL comparison semantics: NaN is GREATER than any value,
      // so the composable `dot > 0` sets the bit for a NaN dot product
      // while Java's `NaN > 0` is false — match Spark or the fused and
      // composition twins band a NaN-bearing vector differently
      if (acc > 0 || java.lang.Double.isNaN(acc))
        out(p / bandBits) |= 1L << (p % bandBits)
      p += 1
    }
    new GenericArrayData(out)
  }

  /** dot(a,b), accumulating left to right from 0.0 — the exact fp
    * operation order of aggregate(zip_with(a, b, _*_), 0.0, _+_), so the
    * fused and composed forms are bit-identical. zip_with semantics on
    * length mismatch: the shorter side pads with NULL → the composed
    * aggregate returns NULL; mirror that (embedding fixtures are
    * uniform-dims, but the twins must agree on malformed input too). */
  /** Any NULL element → NULL result, as in the composition (a null
    * multiplicand nulls its product, and one null term nulls the whole
    * left-fold sum) — toDoubleArray on a null-bearing array would
    * silently read garbage instead. */
  private def anyNullElement(a: ArrayData): Boolean = {
    var i = 0
    while (i < a.numElements) { if (a.isNullAt(i)) return true; i += 1 }
    false
  }

  def dotProduct(a: ArrayData, b: ArrayData): Any = {
    if (a.numElements != b.numElements) return null
    if (anyNullElement(a) || anyNullElement(b)) return null
    val x = a.toDoubleArray(); val y = b.toDoubleArray()
    var acc = 0.0
    var i = 0
    while (i < x.length) { acc += x(i) * y(i); i += 1 }
    acc
  }

  /** cosine(a,b) = dot/(norm(a)*norm(b)) with every partial sum
    * accumulated left to right — bit-identical to the
    * dot(a,b)/(norm(a)*norm(b)) composition (and to DuckDB's
    * list_cosine_similarity modulo its own fp order, which the oracle
    * rounding already absorbs). Zero-norm input divides to NaN/Infinity
    * exactly as the composition does. */
  def cosineSim(a: ArrayData, b: ArrayData): Any = {
    if (a.numElements != b.numElements) return null
    if (anyNullElement(a) || anyNullElement(b)) return null
    val x = a.toDoubleArray(); val y = b.toDoubleArray()
    var d = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < x.length) {
      d += x(i) * y(i); na += x(i) * x(i); nb += y(i) * y(i); i += 1
    }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  /** All dot products of one vector WINDOW against the rows of a
    * literal matrix, in one pass: out(r) = Σ_d v(offset+d)·mat(r)(d),
    * each sum accumulated left to right from 0.0 — the exact fp
    * operation order of aggregate(zip_with(slice(v, offset+1, dims),
    * row, _*_), 0.0, _+_), so the fused form is bit-identical to the
    * HOF composition (PqSpec pins it). matFlat is row-major. NULL when
    * the window runs past the vector or crosses a null element — the
    * composition's zip_with-pads-with-NULL collapse. */
  def vecDots(v: ArrayData, matFlat: Array[Double], dims: Int,
      offset: Int): Any = {
    if (v.numElements < offset + dims) return null
    var i = offset
    while (i < offset + dims) { if (v.isNullAt(i)) return null; i += 1 }
    val rows = matFlat.length / dims
    val out = new Array[Double](rows)
    var r = 0
    while (r < rows) {
      var acc = 0.0
      val off = r * dims
      var d = 0
      while (d < dims) { acc += v.getDouble(offset + d) * matFlat(off + d); d += 1 }
      out(r) = acc
      r += 1
    }
    new GenericArrayData(out)
  }

  /** Intersection size of two ascending-sorted distinct long arrays.
    * A null ELEMENT violates the precondition but passes analysis
    * (ArrayType(LongType) admits containsNull) and toLongArray would
    * read the slot as garbage bytes in the unsafe path — reject LOUDLY
    * rather than return a silently-wrong count. */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Long = {
    require(!anyNullElement(a) && !anyNullElement(b),
      "sorted_intersect_count: null element in input array")
    val x = a.toLongArray(); val y = b.toLongArray()
    var i = 0; var j = 0; var c = 0L
    while (i < x.length && j < y.length) {
      if (x(i) < y(j)) i += 1
      else if (x(i) > y(j)) j += 1
      else { c += 1; i += 1; j += 1 }
    }
    c
  }
}

/** array<bigint> of band values for one vector under a literal
  * hyperplane family — the fused twin of SimilarityOps.signBands
  * (which stays as the spec-proven reference composition). */
case class SignBandVals(child: Expression, planes: Seq[Seq[Double]],
    bandBits: Int) extends UnaryExpression with ImplicitCastInputTypes {
  require(planes.nonEmpty && bandBits >= 1 && planes.length % bandBits == 0)
  // a 64-bit band value holds at most 63 sign bits without shift wrap
  require(bandBits <= 63, s"bandBits $bandBits exceeds 63")
  // silent truncation hazard: dims is taken from planes.head, so a
  // LONGER later plane would quietly contribute only its prefix
  require(planes.forall(_.length == planes.head.length),
    "hyperplane family must have uniform dimensionality")

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sign_band_vals"

  private val dims = planes.head.length
  @transient private lazy val flat: Array[Double] = {
    val out = new Array[Double](planes.length * dims)
    var p = 0
    while (p < planes.length) {
      val src = planes(p)
      var i = 0
      while (i < dims) { out(p * dims + i) = src(i); i += 1 }
      p += 1
    }
    out
  }

  override def nullSafeEval(input: Any): Any =
    VectorRuntime.signBandVals(input.asInstanceOf[ArrayData], flat, dims, bandBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("signBandPlanes", flat, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.VectorRuntime.signBandVals($c, $ref, $dims, $bandBits);")
  }

  override protected def withNewChildInternal(c: Expression): SignBandVals =
    copy(child = c)
}

/** array<double> of dot products of one vector window against every row
  * of a LITERAL matrix — the fused twin of the m×ksub interpreted-HOF
  * ADC table on the PQ probe side (PqOps.pqKnnJoin). The composed form
  * is correct but its expression TREE is mat.length aggregate/zip_with
  * nodes per call site — at m=32/ksub=64 that is 2 048 interpreted
  * lambda trees Catalyst must analyze and evaluate per probe row; this
  * is one reference-object lookup and a tight loop. Window semantics
  * (offset/dims) replace the slice() composition so no per-row subarray
  * is allocated. NULL mirrors the composition on malformed windows. */
case class VecDots(child: Expression, mat: Seq[Seq[Double]], offset: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(mat.nonEmpty && offset >= 0)
  // empty ROWS must fail here too: dims = 0 would otherwise surface as
  // a divide-by-zero deep in eval instead of at construction
  require(mat.head.nonEmpty, "matrix rows must be non-empty")
  require(mat.forall(_.length == mat.head.length),
    "matrix rows must have uniform dimensionality")

  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  // nullable even over non-null children: short/null-bearing window → NULL
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vec_dots"

  private val dims = mat.head.length
  @transient private lazy val flat: Array[Double] = {
    val out = new Array[Double](mat.length * dims)
    var r = 0
    while (r < mat.length) {
      val src = mat(r)
      var i = 0
      while (i < dims) { out(r * dims + i) = src(i); i += 1 }
      r += 1
    }
    out
  }

  override def nullSafeEval(input: Any): Any =
    VectorRuntime.vecDots(input.asInstanceOf[ArrayData], flat, dims, offset)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("vecDotsMat", flat, "double[]")
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("vecDots")
      s"""Object $r = graft.expressions.VectorRuntime.vecDots($c, $ref, $dims, $offset);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $r; }
         |""".stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): VecDots =
    copy(child = c)
}

/** Shared shape of the fused pairwise vector-math expressions: one
  * primitive-array pass per pair instead of the zip_with/aggregate
  * composition, which Spark evaluates as CodegenFallback (interpreted,
  * one boxed lambda binding PER ELEMENT — the dedup verify tiers ran
  * ~200 allocations per candidate pair through it). NULL on length
  * mismatch mirrors the composition (zip_with pads the short side with
  * NULL and the aggregate collapses to NULL), hence the boxed runtime
  * return and the explicit isNull reassignment in codegen. */
sealed trait FusedVectorPairMath extends BinaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  // nullable even over non-null children: length mismatch → NULL
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  /** Fully-qualified runtime method (ArrayData, ArrayData) => Any. */
  protected def runtimeCall: String

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("fusedVec")
      s"""Object $r = $runtimeCall($a, $b);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((java.lang.Double) $r).doubleValue(); }
         |""".stripMargin
    })
}

/** dot(a,b) fused — bit-identical to
  * aggregate(zip_with(a, b, _*_), 0.0, _+_). */
case class DotProduct(left: Expression, right: Expression)
    extends FusedVectorPairMath {
  override def prettyName: String = "dot_product"
  override protected def runtimeCall: String =
    "graft.expressions.VectorRuntime.dotProduct"
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorRuntime.dotProduct(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): DotProduct = copy(left = l, right = r)
}

/** cosine(a,b) fused — bit-identical to dot(a,b)/(norm(a)*norm(b)). */
case class CosineSim(left: Expression, right: Expression)
    extends FusedVectorPairMath {
  override def prettyName: String = "cosine_sim"
  override protected def runtimeCall: String =
    "graft.expressions.VectorRuntime.cosineSim"
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorRuntime.cosineSim(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): CosineSim = copy(left = l, right = r)
}

/** |A ∩ B| over two sorted distinct array<bigint> columns. */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  // without declared input types, `sorted_intersect_count(array(1,2))`
  // over array<int> passes analysis and toLongArray's 8-byte-stride
  // reads return GARBAGE counts in the codegen path — declare long
  // arrays so analysis casts or rejects
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sorted_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorRuntime.sortedIntersectCount(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.VectorRuntime.sortedIntersectCount($a, $b);")

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): SortedIntersectCount = copy(left = l, right = r)
}
