package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Custom Catalyst expressions with full codegen for the hot inner loops of
  * the dedup / similarity operators (preference order (b) of the build
  * brief: a native `Expression` beats a UDF beats interpreted HOFs).
  *
  * Each `doGenCode` emits a single static call into the kernels, so the
  * expression participates in whole-stage codegen — the generated code
  * keeps scans, joins and these kernels in one JIT'd loop with no
  * row-boxing or lambda interpretation.
  */
private[graft] object ExprHelpers {
  def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }
  def col(e: Expression): Column = ColumnBridge.column(e)
  def expr(c: Column): Expression = ColumnBridge.expression(c)
}

/** cosine(array<float|double>, array<float|double>) → double, fused single pass. */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable
  private lazy val lf = ExprHelpers.isFloatArray(left)
  private lazy val rf = ExprHelpers.isFloatArray(right)

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.cosine(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], lf, rf)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.VectorKernels.cosine($a, $b, $lf, $rf)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** dot(array<float|double>, array<float|double>) → double. */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable
  private lazy val lf = ExprHelpers.isFloatArray(left)
  private lazy val rf = ExprHelpers.isFloatArray(right)

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.dot(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], lf, rf)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.VectorKernels.dot($a, $b, $lf, $rf)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** LSH bucket id from random hyperplanes (row-major plane matrix literal). */
case class HyperplaneBucket(child: Expression, planes: Array[Double], dim: Int)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  private lazy val vf = ExprHelpers.isFloatArray(child)

  override def nullSafeEval(v: Any): Any =
    VectorKernels.hyperplaneBucket(
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], planes, dim, vf)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[]")
    defineCodeGen(ctx, ev, v =>
      s"graft.expressions.VectorKernels.hyperplaneBucket($v, $planesRef, $dim, $vf)")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** nearest_centroid(array<float|double>) → int index of the cosine-nearest
  * centroid. The centroid matrix (row-major) and its precomputed norms ride
  * along as plan literals (`addReferenceObj`), so IVF cell assignment stays
  * a zero-shuffle narrow projection inside whole-stage codegen.
  */
case class NearestCentroid(
    child: Expression,
    centroids: Array[Double],
    norms: Array[Double],
    dim: Int) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  private lazy val vf = ExprHelpers.isFloatArray(child)

  override def nullSafeEval(v: Any): Any =
    VectorKernels.nearestCentroid(
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], centroids, norms, dim, vf)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("centroids", centroids, "double[]")
    val nRef = ctx.addReferenceObj("norms", norms, "double[]")
    defineCodeGen(ctx, ev, v =>
      s"graft.expressions.VectorKernels.nearestCentroid($v, $cRef, $nRef, $dim, $vf)")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** simhash64(string) → long. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    TextKernels.simhash64(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.expressions.TextKernels.simhash64($v)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** ascii_tokens(string) → array<string> of lowercased [a-z0-9] runs. */
/** Adjacent [a-z]{2} bigrams of a lowercased string — see
  * [[TextKernels.asciiBigrams]].
  */
case class AsciiBigrams(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    TextKernels.asciiBigrams(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.expressions.TextKernels.asciiBigrams($v)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class AsciiTokens(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    TextKernels.asciiTokens(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.expressions.TextKernels.asciiTokens($v)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** char_class_counts(string) → array<long>[5]: one-pass code-point
  * census [alpha, digit, space, punct, other] (see
  * TextKernels.charClassCounts — classes are regex-definable so SQL
  * oracles replay each count).
  */
case class CharClassCounts(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    TextKernels.charClassCounts(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.expressions.TextKernels.charClassCounts($v)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** strip_accents(string) → string: NFD → drop Mn marks → NFC, with an
  * allocation-free ASCII fast path (see TextKernels.stripAccents).
  */
case class StripAccents(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    TextKernels.stripAccents(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.expressions.TextKernels.stripAccents($v)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** jaro_winkler(string, string) → double, the classic-parameter edit
  * similarity (see TextKernels.jaroWinkler; oracle-checked against
  * DuckDB's native jaro_winkler_similarity).
  */
case class JaroWinkler(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    TextKernels.jaroWinkler(
      a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      b.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expressions.TextKernels.jaroWinkler($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** damerau_levenshtein(string, string) → int, the FULL (unrestricted)
  * variant (see TextKernels.damerauLevenshtein).
  */
case class DamerauLevenshtein(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(a: Any, b: Any): Any =
    TextKernels.damerauLevenshtein(
      a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      b.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.expressions.TextKernels.damerauLevenshtein($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** hamming(string, string) → int; -1 on unequal lengths (see
  * TextKernels.hammingDistance).
  */
case class HammingDistance(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(a: Any, b: Any): Any =
    TextKernels.hammingDistance(
      a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      b.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.expressions.TextKernels.hammingDistance($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** hilbert_index(long, long) → long: order-16 Hilbert curve index of two
  * 16-bit-scaled coordinates (see CurveKernels.hilbertXY2D) — the
  * locality-better alternative to the Morton interleave for clustered
  * layouts.
  */
case class HilbertIndex(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    CurveKernels.hilbertXY2D(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.expressions.CurveKernels.hilbertXY2D($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** bigram_repetitive(string) → boolean; one-pass kernel verdict (see
  * TextKernels.bigramRepetitive for why this is not a Column formula).
  */
case class BigramRepetitive(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def nullSafeEval(v: Any): Any =
    TextKernels.bigramRepetitive(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.expressions.TextKernels.bigramRepetitive($v)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** shingle_hashes(string, n) → sorted distinct array<long>. */
case class ShingleHashes(child: Expression, n: Int, ascii: Boolean = false)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    TextKernels.shingleHashes(
      v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n, ascii)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v =>
      s"graft.expressions.TextKernels.shingleHashes($v, $n, $ascii)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** minhash_signature(string, shingleN, k) → array<long> of K minhashes.
  * `ascii` selects the oracle-pinned [[TextKernels.tokenizeAscii]] shingling
  * (same flag as [[ShingleHashes]] — a signature and the shingle set it is
  * verified against must tokenize identically).
  */
case class MinHashSignature(child: Expression, shingleN: Int, k: Int, ascii: Boolean = false)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    TextKernels.minhashSignature(
      v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], shingleN, k, ascii)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v =>
      s"graft.expressions.TextKernels.minhashSignature($v, $shingleN, $k, $ascii)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** inter_count_sorted(array<long>, array<long>) → int — the integer
  * intersection cardinality underlying Jaccard (same linear merge). Emitted
  * where an ORACLE needs exact-integer set arithmetic instead of a rounded
  * ratio (HALF_UP vs HALF_EVEN ties make rounded doubles un-hashable).
  */
case class InterCountSorted(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(a: Any, b: Any): Any =
    TextKernels.interCountSorted(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expressions.TextKernels.interCountSorted($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** jaccard_sorted(array<long>, array<long>) → double (linear merge). */
case class JaccardSorted(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    TextKernels.jaccardSorted(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expressions.TextKernels.jaccardSorted($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Σ|aᵢ−bᵢ| over array<bigint> — see [[VectorKernels.l1Long]] for the
  * exact zip_with-parity semantics (null on length mismatch / null element).
  */
case class L1DistLong(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullSafeEval(a: Any, b: Any): Any = {
    val r = VectorKernels.l1Long(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
    if (r == null) null else r.longValue()
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Long ${ev.value}_r = graft.expressions.VectorKernels.l1Long($a, $b);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.longValue(); }
    """)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Σ aᵢ·bᵢ over array<bigint> — see [[VectorKernels.dotLong]]. */
case class DotLong(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullSafeEval(a: Any, b: Any): Any = {
    val r = VectorKernels.dotLong(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
    if (r == null) null else r.longValue()
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Long ${ev.value}_r = graft.expressions.VectorKernels.dotLong($a, $b);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.longValue(); }
    """)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Σ(aᵢ−bᵢ)² over array<bigint> — see [[VectorKernels.l2sqLong]]. */
case class L2SqLong(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullSafeEval(a: Any, b: Any): Any = {
    val r = VectorKernels.l2sqLong(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
    if (r == null) null else r.longValue()
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Long ${ev.value}_r = graft.expressions.VectorKernels.l2sqLong($a, $b);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.longValue(); }
    """)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** adc_sum(array<bigint> codes, map<bigint,bigint> dmap) → bigint:
  * Σ_m dmap[m·kCode + codes[m]] over m in [0, nSub) — see
  * [[VectorKernels.adcSum]] for the exact element_at-parity semantics
  * (NULL on out-of-range index, null element, or missing key).
  */
case class AdcSum(left: Expression, right: Expression, nSub: Int, kCode: Int)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullSafeEval(codes: Any, dmap: Any): Any = {
    val r = VectorKernels.adcSum(
      codes.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      dmap.asInstanceOf[org.apache.spark.sql.catalyst.util.MapData], nSub, kCode)
    if (r == null) null else r.longValue()
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, dmap) => s"""
      java.lang.Long ${ev.value}_r =
        graft.expressions.VectorKernels.adcSum($codes, $dmap, $nSub, $kCode);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.longValue(); }
    """)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** SQL registration: makes the kernels callable from `spark.sql` text —
  * `SELECT cosine_sim(a.v, b.v) FROM ...` — so the SQL surface and the
  * Column API expose the same operator set.
  */
object SqlFunctions {
  import org.apache.spark.sql.SparkSession

  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("cosine_sim", es => CosineSim(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("dot_product", es => DotProduct(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("simhash64", es => SimHash64(es.head), "built-in")
    reg.createOrReplaceTempFunction("ascii_tokens", es => AsciiTokens(es.head), "built-in")
    reg.createOrReplaceTempFunction("strip_accents", es => StripAccents(es.head), "built-in")
    reg.createOrReplaceTempFunction("char_class_counts",
      es => CharClassCounts(es.head), "built-in")
    reg.createOrReplaceTempFunction("bigram_repetitive",
      es => BigramRepetitive(es.head), "built-in")
    reg.createOrReplaceTempFunction("jaro_winkler", es => JaroWinkler(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("damerau_levenshtein",
      es => DamerauLevenshtein(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("hamming", es => HammingDistance(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("jaccard_sorted", es => JaccardSorted(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("inter_count_sorted",
      es => InterCountSorted(es(0), es(1)), "built-in")
    // the optional trailing boolean is the ascii tokenizer flag — without it
    // the SQL surface couldn't reach the oracle-pinned tokenization the
    // Column API exposes
    def asciiArg(es: Seq[Expression], i: Int): Boolean =
      es.lift(i).exists(_.eval().asInstanceOf[Boolean])
    reg.createOrReplaceTempFunction("shingle_hashes", es =>
      ShingleHashes(es(0), es(1).eval().asInstanceOf[Int], asciiArg(es, 2)), "built-in")
    reg.createOrReplaceTempFunction("minhash_signature", es =>
      MinHashSignature(es(0), es(1).eval().asInstanceOf[Int], es(2).eval().asInstanceOf[Int],
        asciiArg(es, 3)),
      "built-in")
    ()
  }
}

/** Column-API entry points for the custom expressions. */
object functions {
  import ExprHelpers.{col, expr}

  def cosine_sim(a: Column, b: Column): Column = col(CosineSim(expr(a), expr(b)))
  def dot_product(a: Column, b: Column): Column = col(DotProduct(expr(a), expr(b)))
  def l1_dist_long(a: Column, b: Column): Column = col(L1DistLong(expr(a), expr(b)))
  def dot_long(a: Column, b: Column): Column = col(DotLong(expr(a), expr(b)))
  def l2sq_long(a: Column, b: Column): Column = col(L2SqLong(expr(a), expr(b)))
  def adc_sum(codes: Column, dmap: Column, nSub: Int, kCode: Int): Column =
    col(AdcSum(expr(codes), expr(dmap), nSub, kCode))

  /** Bounded-heap per-group top-k under (score asc|desc, id asc) —
    * the scale-safe window replacement; see
    * [[graft.expressions.BoundedTopKAgg]].
    */
  def bounded_top_k(score: Column, id: Column, k: Int, asc: Boolean): Column =
    BoundedTopKAgg.bounded_top_k(score, id, k, asc)
  def hyperplane_bucket(v: Column, planes: Seq[Seq[Double]]): Column = {
    require(planes.nonEmpty)
    val dim = planes.head.length
    col(HyperplaneBucket(expr(v), planes.flatten.toArray, dim))
  }
  def nearest_centroid(v: Column, centroids: Array[Array[Double]]): Column = {
    require(centroids.nonEmpty)
    val dim = centroids.head.length
    val norms = centroids.map(c => math.sqrt(c.map(x => x * x).sum))
    col(NearestCentroid(expr(v), centroids.flatten, norms, dim))
  }
  def simhash64(text: Column): Column = col(SimHash64(expr(text)))
  def ascii_tokens(text: Column): Column = col(AsciiTokens(expr(text)))
  def ascii_bigrams(text: Column): Column = col(AsciiBigrams(expr(text)))
  def strip_accents(text: Column): Column = col(StripAccents(expr(text)))
  def char_class_counts(text: Column): Column = col(CharClassCounts(expr(text)))
  def bigram_repetitive(text: Column): Column = col(BigramRepetitive(expr(text)))
  def jaro_winkler(a: Column, b: Column): Column = col(JaroWinkler(expr(a), expr(b)))
  def damerau_levenshtein(a: Column, b: Column): Column =
    col(DamerauLevenshtein(expr(a), expr(b)))
  def hamming(a: Column, b: Column): Column = col(HammingDistance(expr(a), expr(b)))
  def hilbert_index(a: Column, b: Column): Column =
    col(HilbertIndex(expr(a.cast("long")), expr(b.cast("long"))))
  def shingle_hashes(text: Column, n: Int, ascii: Boolean = false): Column =
    col(ShingleHashes(expr(text), n, ascii))
  def minhash_signature(text: Column, shingleN: Int, k: Int, ascii: Boolean = false): Column =
    col(MinHashSignature(expr(text), shingleN, k, ascii))
  def jaccard_sorted(a: Column, b: Column): Column = col(JaccardSorted(expr(a), expr(b)))
  def inter_count_sorted(a: Column, b: Column): Column =
    col(InterCountSorted(expr(a), expr(b)))

  /** Adjacent word n-grams of a token array as space-joined strings,
    * with the size >= n guard BUNDLED: sequence(0, size-n) on a shorter
    * array would run DESCENDING and silently emit phantom short grams —
    * the trap every ad-hoc copy of this expression has to re-remember.
    */
  def word_ngrams(tk: Column, n: Int): Column = {
    require(n >= 2, s"n-gram width must be >= 2, got $n")
    import org.apache.spark.sql.functions.{array, concat_ws, element_at, lit, sequence, size => fsize, transform => ftransform, when}
    val grams = ftransform(sequence(lit(0), fsize(tk) - n),
      i => concat_ws(" ", (1 to n).map(j => element_at(tk, i + j)): _*))
    when(fsize(tk) >= n, grams).otherwise(array().cast("array<string>"))
  }

  def word_bigrams(tk: Column): Column = word_ngrams(tk, 2)

  /** Spark's own BloomFilterMightContain over a serialized sketch literal
    * (the [[org.apache.spark.sql.DataFrameStatFunctions.bloomFilter]] V1
    * format). The literal is foldable, which is exactly the shape the
    * expression's type check admits; probe values are long keys.
    */
  def might_contain(bloomBytes: Array[Byte], key: Column): Column =
    col(org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
      org.apache.spark.sql.catalyst.expressions.Literal(
        bloomBytes, org.apache.spark.sql.types.BinaryType),
      expr(key.cast("long"))))
}
