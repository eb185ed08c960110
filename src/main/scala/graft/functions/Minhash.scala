package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused shingle → MinHash signature kernel.
  *
  * Input: the document's token array. Output: the `perms.length` MinHash
  * minima over the document's word-`k`-shingle set, where shingle hash =
  * [[PolyHash]] (mult 131 mod 2³¹−1) of the space-joined shingle string and
  * permutation i maps h → (h·aᵢ + bᵢ) mod p. `null` when the document has
  * fewer than `k` tokens (no shingles — the row is dropped upstream either
  * way).
  *
  * Why native (same grounds as [[DotF64]]/[[PolyHash]]): the composed
  * pipeline — `transform`+`slice`+`concat_ws` to build shingle STRINGS,
  * `explode` to (doc, shingle) grain, then a 32-way min-aggregate — pays an
  * interpreted higher-order-function chain per row AND a full shuffle of the
  * corpus at SHINGLE grain (tokens × docs rows) just to group the minima
  * back per doc. This expression computes the identical 32 minima in one
  * whole-stage-codegen loop at DOCUMENT grain: no shingle strings are ever
  * materialized (the rolling hash streams over token codepoints with a
  * virtual separator), no explode, no shuffle — the signature stage becomes
  * map-only, and the first exchange in the LSH pipeline moves 8 band rows
  * per doc instead of every shingle. MinHash needs no `array_distinct`
  * first: min over the shingle multiset equals min over the set.
  *
  * Equality with the composed pipeline is pinned corpus-wide in NativeSpec.
  */
case class ShingleMinhash(child: Expression, k: Int, perms: Seq[(Long, Long)],
                          mult: Long, mod: Long)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_shingle_minhash"

  @transient private lazy val as: Array[Long] = perms.map(_._1).toArray
  @transient private lazy val bs: Array[Long] = perms.map(_._2).toArray

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val toks = v.asInstanceOf[ArrayData]
    val n = toks.numElements()
    if (n < k) return null
    val m = as.length
    val mins = Array.fill(m)(Long.MaxValue)
    var s = 0
    while (s <= n - k) {
      var h = 0L
      var j = 0
      while (j < k) {
        if (j > 0) h = (h * mult + 32L) % mod // the ' ' separator codepoint
        val str = toks.getUTF8String(s + j).toString
        var i = 0
        while (i < str.length) {
          val cp = str.codePointAt(i)
          i += Character.charCount(cp)
          h = (h * mult + cp) % mod
        }
        j += 1
      }
      var p = 0
      while (p < m) {
        val perm = (h * as(p) + bs(p)) % mod
        if (perm < mins(p)) mins(p) = perm
        p += 1
      }
      s += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("mhA", as, "long[]")
    val bRef = ctx.addReferenceObj("mhB", bs, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val mins = ctx.freshName("mins")
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val j = ctx.freshName("j")
      val str = ctx.freshName("str")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      val p = ctx.freshName("p")
      val perm = ctx.freshName("perm")
      s"""
         |int $n = $c.numElements();
         |if ($n < $k) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $mins = new long[${as.length}];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $s = 0; $s <= $n - $k; $s++) {
         |    long $h = 0L;
         |    for (int $j = 0; $j < $k; $j++) {
         |      if ($j > 0) $h = ($h * ${mult}L + 32L) % ${mod}L;
         |      java.lang.String $str = $c.getUTF8String($s + $j).toString();
         |      int $i = 0;
         |      while ($i < $str.length()) {
         |        int $cp = $str.codePointAt($i);
         |        $i += java.lang.Character.charCount($cp);
         |        $h = ($h * ${mult}L + $cp) % ${mod}L;
         |      }
         |    }
         |    for (int $p = 0; $p < ${as.length}; $p++) {
         |      long $perm = ($h * $aRef[$p] + $bRef[$p]) % ${mod}L;
         |      if ($perm < $mins[$p]) $mins[$p] = $perm;
         |    }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Minhash {
  import org.apache.spark.sql.graft.{ColumnBridge => EU}

  /** MinHash signature column (array of `perms.size` minima) from a token
    * array column; null when the doc has fewer than `k` tokens. */
  def shingleMinhash(tokens: Column, k: Int, perms: Seq[(Long, Long)],
                     mult: Long = 131L, mod: Long = 2147483647L): Column =
    EU.column(ShingleMinhash(EU.expression(tokens), k, perms, mult, mod))
}
