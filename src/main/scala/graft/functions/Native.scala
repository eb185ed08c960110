package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.{ColumnBridge => EU}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the engine's hot inner loops.
  *
  * The declarative equivalents (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`
  * for dot products, `aggregate(split(s, ""), ...)` for rolling hashes) are
  * interpreted higher-order functions: per element they allocate lambda-bound
  * rows and box doubles, and they sit outside whole-stage codegen. On the
  * sf0.1 brute-force knn (4M pairs × 64 dims) that was 128 s of the 247 s
  * bench. These expressions generate tight Java loops inside WSCG instead —
  * same fold order, bit-identical results (the DuckDB oracle twins are
  * unchanged and still pass).
  */
object Native {

  /** ⟨a, b⟩ over array<double>, left-fold in index order (= the
    * aggregate/zip_with formula it replaces). */
  def dot(a: Column, b: Column): Column =
    EU.column(DotF64(EU.expression(a), EU.expression(b)))

  /** Polynomial rolling hash h ← (h·mult + codepoint) mod m over a string's
    * codepoints (= aggregate(split(s,""), 0, (h,c) -> (h·mult + ascii(c)) % m)). */
  def polyHash(c: Column, mult: Long = 131L, mod: Long = 2147483647L): Column =
    EU.column(PolyHash(EU.expression(c), mult, mod))

  /** Σ(aᵢ−bᵢ)² over array<double>, left-fold in index order — the squared
    * L2 distance of the PQ codebook argmin ([[graft.ext.Pq]]). */
  def l2sq(a: Column, b: Column): Column =
    EU.column(L2SqF64(EU.expression(a), EU.expression(b)))

  /** PQ ADC dot against flattened codebooks — see [[AdcDotF64]]. */
  def adcDot(query: Column, codes: Column, books: Array[Double],
             subs: Int, subDim: Int, nCodes: Int): Column =
    EU.column(AdcDotF64(EU.expression(query), EU.expression(codes),
      books, subs, subDim, nCodes))

  /** Imperative per-session registration (tests, notebooks). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", exprs => DotF64(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_poly_hash", exprs => PolyHash(exprs.head, 131L, 2147483647L), "built-in")
  }
}

/** `spark.sql.extensions=graft.functions.GraftExtensions` injects the native
  * functions into every session at startup (the supported cluster path;
  * [[Native.register]] is the imperative equivalent). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotF64].getName, "graft_dot"),
      (exprs: Seq[Expression]) => DotF64(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_poly_hash"),
      new ExpressionInfo(classOf[PolyHash].getName, "graft_poly_hash"),
      (exprs: Seq[Expression]) => PolyHash(exprs.head, 131L, 2147483647L)))
  }
}

/** Dot product of two array<double> columns: one fused multiply-add loop in
  * generated code, accumulating left-to-right like the interpreted fold.
  * Length mismatch throws — the DuckDB twins iterate a fixed dimension, so a
  * silently truncated product would diverge between engines on malformed
  * input instead of surfacing it. */
case class DotF64(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements())
      throw new IllegalArgumentException(
        s"graft_dot: array length mismatch ($n vs ${y.numElements()})")
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "graft_dot: array length mismatch (" + $n + " vs " + $b.numElements() + ")");
         |}
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc = $acc + $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Squared L2 distance of two array<double> columns: one fused loop in
  * generated code, accumulating (aᵢ−bᵢ)² left-to-right — the same IEEE
  * sequence as `list_reduce(list_prepend(0.0, list_transform(gs, i ->
  * (a[i]-b[i])*(a[i]-b[i]))), +)` on the DuckDB side. Length mismatch
  * throws (same convention as [[DotF64]]): the DuckDB twin iterates a fixed
  * generate_series(1, PqSubDim), so a silently truncated distance would
  * diverge between engines on malformed input. */
case class L2SqF64(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_l2sq"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements())
      throw new IllegalArgumentException(
        s"graft_l2sq: array length mismatch ($n vs ${y.numElements()})")
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = x.getDouble(i) - y.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "graft_l2sq: array length mismatch (" + $n + " vs " + $b.numElements() + ")");
         |}
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = $a.getDouble($i) - $b.getDouble($i);
         |  $acc = $acc + $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** PQ asymmetric-distance dot: Σ_s ⟨query slice s, codeword(codes[s])⟩ —
  * the scoring kernel of graft.ext.Pq, fused into one codegen loop. The
  * declarative spelling (per subspace: `slice()` allocating an 8-element
  * array + `element_at` over a nested array literal + a dot) allocated two
  * arrays per candidate×subspace; over the ~12M ADC-scored candidates of
  * an sf1 audit that was ~200M allocations in the hot path. Here the
  * codebooks ride along flattened (subspace-major, then code, then dim —
  * bounded at PqSub·PqCodes·PqSubDim doubles) as a referenced object, and
  * the fold order is IDENTICAL to the composed form it replaces: for each
  * s in order, an inner left-to-right 8-dim dot, accumulated left-to-right
  * — bit-equal results, pinned by the unchanged DuckDB oracle. Codes are
  * 1-based, exactly as Pq emits them. */
case class AdcDotF64(query: Expression, codes: Expression,
                     books: Array[Double], subs: Int, subDim: Int, nCodes: Int)
    extends BinaryExpression with ExpectsInputTypes {

  override def left: Expression = query
  override def right: Expression = codes
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), ArrayType(IntegerType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_adc_dot"

  override protected def nullSafeEval(q: Any, c: Any): Any = {
    val qv = q.asInstanceOf[ArrayData]
    val cd = c.asInstanceOf[ArrayData]
    var acc = 0.0
    var s = 0
    while (s < subs) {
      val base = (s * nCodes + cd.getInt(s) - 1) * subDim
      var d = 0.0
      var i = 0
      while (i < subDim) { d += qv.getDouble(s * subDim + i) * books(base + i); i += 1 }
      acc += d
      s += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bk = ctx.addReferenceObj("pqBooks", books, "double[]")
    nullSafeCodeGen(ctx, ev, (q, c) => {
      val acc = ctx.freshName("acc")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val base = ctx.freshName("base")
      s"""
         |double $acc = 0.0;
         |for (int $s = 0; $s < $subs; $s++) {
         |  int $base = ($s * $nCodes + $c.getInt($s) - 1) * $subDim;
         |  double $d = 0.0;
         |  for (int $i = 0; $i < $subDim; $i++) {
         |    $d = $d + $q.getDouble($s * $subDim + $i) * $bk[$base + $i];
         |  }
         |  $acc = $acc + $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(query = newLeft, codes = newRight)
}

/** Rolling hash over a string's unicode codepoints. Matches
  * `aggregate(split(s, ''), 0L, (h, c) -> (h·mult + ascii(c)) % mod)` for all
  * BMP text (split('') yields one UTF-16 unit per char; for BMP chars that IS
  * the codepoint, and `ascii` returns the codepoint) — pinned by
  * NativeSpec's whole-corpus equality check and the text_fingerprint oracle.
  * No overflow for mod ≤ 2³¹: h·131 + 0x10FFFF < 2⁴⁰. */
case class PolyHash(child: Expression, mult: Long, mod: Long)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_poly_hash"

  override protected def nullSafeEval(s: Any): Any = {
    val str = s.asInstanceOf[UTF8String].toString
    var h = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      i += Character.charCount(cp)
      h = (h * mult + cp) % mod
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      s"""
         |java.lang.String $s = $c.toString();
         |long $h = 0L;
         |int $i = 0;
         |while ($i < $s.length()) {
         |  int $cp = $s.codePointAt($i);
         |  $i += java.lang.Character.charCount($cp);
         |  $h = ($h * ${mult}L + $cp) % ${mod}L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
