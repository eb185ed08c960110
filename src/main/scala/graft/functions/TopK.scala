package graft.functions

import java.nio.ByteBuffer
import scala.collection.mutable.ArrayBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.{ColumnBridge => EU}
import org.apache.spark.sql.types._

/** Bounded top-k aggregate: keep the k best (score, id) pairs per group,
  * ordered score DESC then id ASC.
  *
  * Why it exists: Spark's only built-in top-k-per-group shape is
  * row_number-over-window + filter, which SORTS EVERY ROW of every group —
  * on the 4M-pair knn that sort was ~4 s of a 4.5 s query, and at 100 TB
  * the full pair set would hit the shuffle. This aggregate is partial-merge
  * combinable (ObjectHashAggregate): each map task emits at most k entries
  * per group, so the shuffle carries k·|groups| rows instead of |pairs|.
  * The result is bit-identical to the window formulation because the
  * ordering (score desc, id asc) is total. */
case class TopKByScore(
    score: Expression, id: Expression, k: Int,
    dedupIds: Boolean = false,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Double, Long)]] {

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))))
  override def prettyName: String = "graft_top_k"

  /** true when a is strictly better than b: higher score, tie → lower id. */
  @inline private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def createAggregationBuffer(): ArrayBuffer[(Double, Long)] =
    new ArrayBuffer[(Double, Long)](k + 1)

  override def update(buf: ArrayBuffer[(Double, Long)], input: InternalRow): ArrayBuffer[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) insert(buf, (s.asInstanceOf[Double], i.asInstanceOf[Long]))
    buf
  }

  /** The buffer is kept sorted WORST-FIRST (ascending under [[better]]), so
    * the hot path — a candidate that doesn't beat the current worst once
    * the buffer is full — is a single comparison against buf(0). The naive
    * find-the-worst linear scan this replaces cost O(k) compares on EVERY
    * candidate: at k=80 over the 12M ADC-scored PQ candidates of the sf1
    * audit that was ~1G comparisons of pure overhead. Accepts (rare after
    * warm-up: O(k·log n) of the n candidates) pay one binary search plus
    * one ArrayBuffer shift. */
  private def insert(buf: ArrayBuffer[(Double, Long)], e: (Double, Long)): Unit = {
    if (buf.size >= k && !better(e, buf(0))) return // common case: reject
    if (dedupIds) {
      // spilled-list mode: a candidate pair can arrive once per shared
      // cell with an IDENTICAL score — the id is the key. O(size) scan,
      // but only reached by candidates that beat the current worst.
      var j = 0
      while (j < buf.size) {
        if (buf(j)._2 == e._2) return // same pair, same score — keep first
        j += 1
      }
    }
    // insertion point: first index whose element beats e (all before are
    // worse than e) — binary search over the worst-first order
    var lo = 0
    var hi = buf.size
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (better(buf(mid), e)) hi = mid else lo = mid + 1
    }
    buf.insert(lo, e)
    if (buf.size > k) buf.remove(0) // evict the worst
  }

  override def merge(a: ArrayBuffer[(Double, Long)], b: ArrayBuffer[(Double, Long)]): ArrayBuffer[(Double, Long)] = {
    b.foreach(insert(a, _))
    a
  }

  override def eval(buf: ArrayBuffer[(Double, Long)]): Any = {
    val sorted = buf.sortWith(better)
    new GenericArrayData(sorted.map { case (s, i) =>
      InternalRow(s, i)
    }.toArray[Any])
  }

  override def serialize(buf: ArrayBuffer[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new ArrayBuffer[(Double, Long)](k + 1)
    (0 until n).foreach(_ => buf += ((bb.getDouble, bb.getLong)))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), id = newChildren(1))
}

object TopKByScore {
  /** Aggregate column: array of the k best (score, id) structs, best first. */
  def topK(score: Column, id: Column, k: Int): Column =
    EU.column(TopKByScore(EU.expression(score), EU.expression(id), k)
      .toAggregateExpression())

  /** [[topK]] keeping at most one entry per id — the spilled-list tail's
    * pair dedup folded into the map-side-combinable aggregate, so the
    * shuffle still carries ≤ k rows per group instead of paying a separate
    * pair-keyed dedup exchange over the full candidate set. */
  def topKDistinct(score: Column, id: Column, k: Int): Column =
    EU.column(TopKByScore(EU.expression(score), EU.expression(id), k,
      dedupIds = true).toAggregateExpression())
}
