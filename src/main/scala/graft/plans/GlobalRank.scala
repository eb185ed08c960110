package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeSet, BoundReference, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project, UnaryNode}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.plans.physical.{Distribution, OrderedDistribution, Partitioning}
import org.apache.spark.sql.execution.{SortExec, SparkPlan, SparkStrategy, UnaryExecNode}

/** Custom Catalyst operator: GLOBAL ORDERED RANK.
  *
  * Appends three generated columns to its child — global row number over a
  * total order, global rank (ties share the tie-group head's row number), and
  * the total row count — without ever funnelling the data through a single
  * partition, and without doing ANY work at query-construction time.
  *
  * Why a custom logical operator instead of composing built-ins (the decision
  * rule in README "Extension points"): Spark's built-in windows can only
  * express a global ordering as `Window.orderBy` with no partition — a
  * single-task sort. The composed two-pass alternative (range-partition,
  * count per partition, broadcast offsets back) is semantically right but has
  * no lazy composition: materializing per-partition counts needs an action,
  * so EVERY query that merely embeds a ranked view pays the rank's jobs at
  * DataFrame-construction time — even queries that never read the rank
  * columns (a `COUNT(*)` over a ranked silver view ran three rank pipelines).
  * Only an operator that is planned like any other relational node gives
  * both: laziness (work happens at execution, inside the same Spark jobs) and
  * optimizer participation ([[PruneGlobalRank]] deletes the operator wholesale
  * when nothing references its generated columns — the rank-aware twin of
  * column pruning).
  *
  * Physical contract ([[GlobalOrderedRankExec]]):
  *  - requiredChildDistribution = OrderedDistribution(order): EnsureRequirements
  *    plants a range exchange below (same sampling machinery as a global
  *    ORDER BY — contiguous key ranges per partition, equal keys co-located).
  *  - pass 1 counts rows per partition by streaming the exchange's shuffle
  *    output UNSORTED (deliberately no requiredChildOrdering: a sorted count
  *    pass would pay the sort twice). ≤ numPartitions longs come back to the
  *    driver — control-plane metadata, not data.
  *  - pass 2 sorts within partitions (Spark's own external-sort operator,
  *    spill-safe) and streams rows out appending
  *    `rn = partition offset + local index + 1`,
  *    `rank = rn of the current tie-group's first row` (ties cannot span
  *    partitions — equal keys share a partition by range-partitioner
  *    construction), and `total`. The shuffle files persist between the two
  *    passes, so pass 2 never recomputes the upstream pipeline.
  *
  * At 100 TB: one upstream execution, one shuffle write, two shuffle reads,
  * per-partition sorts, zero driver data movement — the plan shape a
  * distributed ORDER BY already commits to, reused for ranking.
  */
case class GlobalOrderedRank(
    order: Seq[SortOrder],
    rnAttr: Attribute,
    rankAttr: Attribute,
    totAttr: Attribute,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rnAttr :+ rankAttr :+ totAttr
  override def producedAttributes: AttributeSet = AttributeSet(Seq(rnAttr, rankAttr, totAttr))
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): GlobalOrderedRank =
    copy(child = newChild)
}

/** Plans [[GlobalOrderedRank]] — registered via
  * `spark.experimental.extraStrategies` (public API) in [[GlobalRank.install]]. */
object GlobalRankStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GlobalOrderedRank(order, rn, rank, tot, child) =>
      GlobalOrderedRankExec(order, rn, rank, tot, planLater(child)) :: Nil
    case _ => Nil
  }
}

/** Deletes a [[GlobalOrderedRank]] whose generated columns nobody reads.
  * The node neither filters rows nor changes existing columns, so under a
  * Project/Aggregate that ignores rn/rank/total it is a no-op — and with it
  * goes its range shuffle + sort. This is what makes embedding ranked views
  * free for rank-agnostic consumers (row counts, freshness probes): the
  * optimizer — not the caller — decides whether the rank pipeline runs. */
object PruneGlobalRank extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    // only operators that DEFINE their own output (the child's schema change
    // is invisible above them); Filter/Sort etc. would leak the schema change
    case p: Project if prunable(p, p.child) => p.withNewChildren(Seq(stripped(p.child)))
    case a: Aggregate if prunable(a, a.child) => a.withNewChildren(Seq(stripped(a.child)))
  }
  private def prunable(parent: LogicalPlan, child: LogicalPlan): Boolean = child match {
    case g: GlobalOrderedRank => parent.references.intersect(g.producedAttributes).isEmpty
    case _ => false
  }
  private def stripped(child: LogicalPlan): LogicalPlan =
    child.asInstanceOf[GlobalOrderedRank].child
}

case class GlobalOrderedRankExec(
    order: Seq[SortOrder],
    rnAttr: Attribute,
    rankAttr: Attribute,
    totAttr: Attribute,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rnAttr :+ rankAttr :+ totAttr
  override def producedAttributes: AttributeSet = AttributeSet(Seq(rnAttr, rankAttr, totAttr))
  override def requiredChildDistribution: Seq[Distribution] = OrderedDistribution(order) :: Nil
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = order
  override protected def withNewChildInternal(newChild: SparkPlan): GlobalOrderedRankExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val childRdd = child.execute() // exchange output: cached by ShuffleExchangeExec
    val n = childRdd.getNumPartitions
    // pass 1: row count per partition, reading raw (unsorted) shuffle output
    val counts = sparkContext.runJob(childRdd, (it: Iterator[InternalRow]) => {
      var c = 0L; while (it.hasNext) { it.next(); c += 1L }; c
    })
    val offsets = counts.scanLeft(0L)(_ + _) // offsets(i) = rows before partition i
    val total = offsets(n)
    // pass 2: per-partition external sort (shuffle files reused, upstream NOT
    // recomputed), then stream-emit with global positions
    val sorted = SortExec(order, global = false, child = child).execute()
    val orderLocal = order
    val childOutput = child.output
    val outputLocal = output
    sorted.mapPartitionsWithIndex { (idx, iter) =>
      val keyProj = UnsafeProjection.create(orderLocal.map(_.child), childOutput)
      val keyOrd = GenerateOrdering.generate(orderLocal.zipWithIndex.map { case (o, i) =>
        o.copy(child = BoundReference(i, o.child.dataType, o.child.nullable))
      })
      val outProj = UnsafeProjection.create(outputLocal, outputLocal)
      val join = new JoinedRow
      val extra = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(3)
      extra.update(2, total)
      var localIdx = 0L
      var tieHead = 0L
      var prevKey: InternalRow = null
      iter.map { row =>
        val rn = offsets(idx) + localIdx + 1L
        val key = keyProj(row)
        if (prevKey == null || keyOrd.compare(prevKey, key) != 0) {
          tieHead = rn
          prevKey = key.copy()
        }
        localIdx += 1L
        extra.update(0, rn)
        extra.update(1, tieHead)
        outProj(join(row, extra))
      }
    }
  }
}

/** Public face: attach the operator to a DataFrame + one-time registration. */
object GlobalRank {
  import org.apache.spark.sql.{Column, DataFrame}
  import org.apache.spark.sql.catalyst.expressions.{Ascending, AttributeReference, Expression}
  import org.apache.spark.sql.graft.ColumnBridge
  import org.apache.spark.sql.types.LongType

  /** Idempotently register the strategy + prune rule on a session (public
    * `ExperimentalMethods` API — works without a spark.sql.extensions conf). */
  def install(spark: SparkSession): Unit = synchronized {
    val exp = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].experimental
    if (!exp.extraStrategies.contains(GlobalRankStrategy))
      exp.extraStrategies = exp.extraStrategies :+ GlobalRankStrategy
    if (!exp.extraOptimizations.contains(PruneGlobalRank))
      exp.extraOptimizations = exp.extraOptimizations :+ PruneGlobalRank
  }

  /** `df` + three generated columns (`rnName`, `rankName`, `totName`) ranking
    * over `sortCols` globally. Construction does zero work. */
  def withRankColumns(df: DataFrame, sortCols: Seq[Column],
                      rnName: String, rankName: String, totName: String): DataFrame = {
    val spark = df.sparkSession
    install(spark)
    val order = sortCols.map(ColumnBridge.convertedExpression).map {
      case s: SortOrder => s
      case e: Expression => SortOrder(e, Ascending)
    }
    val node = GlobalOrderedRank(
      order,
      AttributeReference(rnName, LongType, nullable = false)(),
      AttributeReference(rankName, LongType, nullable = false)(),
      AttributeReference(totName, LongType, nullable = false)(),
      df.queryExecution.analyzed)
    ColumnBridge.ofRows(spark, node)
  }
}
