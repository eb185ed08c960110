package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, HintInfo, Join, JoinHint, LogicalPlan, SHUFFLE_MERGE}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** The statistics catalog injected into CATALYST — the optimizer-rule form
  * of [[graft.ext.Sketch.advisedJoin]]: once a profile is installed on the
  * session, every PLAIN join (no user hints) whose two sides each bottom
  * out in one profiled table gets its strategy decided by the PROFILE'S
  * row counts instead of Spark's file-size heuristic. `advisedJoin` asks
  * the caller to opt in per join; this rule upgrades the whole session —
  * `left.join(right, …)` written anywhere in the library plans against
  * maintained statistics ([[graft.engine.Pipeline.runStatsIncrement]]
  * keeps them fresh batch-to-batch).
  *
  * Decision, mirroring `advisedJoin`: broadcast the smaller side when its
  * profile-rows × output-schema-width estimate fits the session's
  * `autoBroadcastJoinThreshold` (the width uses the side's PRUNED output,
  * so column pruning is credited); otherwise pin SHUFFLE_MERGE —
  * overriding the file-size heuristic in BOTH directions, because at
  * 100 TB the profile knows post-compaction row counts and
  * fresh-partition sizes that scan estimation does not. A join where
  * either side's table is unknown to the profile is left untouched: no
  * stats, no opinion.
  *
  * Mechanics: runs in `experimental.extraOptimizations` (after the main
  * optimizer batches, so analyzer-resolved user hints are already folded
  * into `Join.hint` — the `JoinHint(None, None)` guard means user intent
  * always wins), rewriting only the hint field; physical join selection
  * then honors it like any user hint, and AQE will not demote a hinted
  * strategy. The registry is per-session and explicitly installed —
  * a session without a profile plans exactly as before. */
class StatsHintRule(session: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val counts = StatsHint.countsFor(session)
    if (counts.isEmpty) plan
    else plan.transformUp {
      case j @ Join(l, r, _, _, JoinHint(None, None)) =>
        (estimate(l, counts), estimate(r, counts)) match {
          case (Some(el), Some(er)) =>
            val threshold = conf.autoBroadcastJoinThreshold
            if (er <= el && er <= threshold)
              j.copy(hint = JoinHint(None, Some(HintInfo(Some(BROADCAST)))))
            else if (el < er && el <= threshold)
              j.copy(hint = JoinHint(Some(HintInfo(Some(BROADCAST))), None))
            else
              j.copy(hint = JoinHint(Some(HintInfo(Some(SHUFFLE_MERGE))), None))
          case _ => j
        }
    }
  }

  /** Profile-rows × pruned-output-width estimate for one join side, defined
    * only when the side bottoms out in exactly one profiled table. */
  private def estimate(side: LogicalPlan,
                       counts: Map[String, Long]): Option[Long] =
    side.collectLeaves() match {
      case Seq(lr: LogicalRelation) => lr.relation match {
        case fs: HadoopFsRelation =>
          fs.location.rootPaths.headOption
            .map(_.getName.stripSuffix(".parquet"))
            .flatMap(counts.get)
            .map(_ * side.output.map(_.dataType.defaultSize.toLong).sum)
        case _ => None
      }
      case _ => None
    }
}

object StatsHint {
  private val registries =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, Map[String, Long]]()

  private[plans] def countsFor(spark: SparkSession): Map[String, Long] =
    Option(registries.get(spark)).getOrElse(Map.empty)

  /** Install (or refresh) a profile on the session and register the rule
    * once. `profile` is any frame with (table_name, n_rows) — the output of
    * [[graft.ext.Sketch.tableProfile]] or the MAINTAINED
    * [[graft.ext.Sketch.finalizeStats]]; collecting it is control-plane
    * (one row per profiled column). */
  def install(spark: SparkSession, profile: DataFrame): Unit = synchronized {
    registries.put(spark, graft.ext.Sketch.rowCounts(profile))
    val exp =
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].experimental
    if (!exp.extraOptimizations.exists(_.isInstanceOf[StatsHintRule]))
      exp.extraOptimizations = exp.extraOptimizations :+ new StatsHintRule(spark)
  }

  /** Drop the session's profile — the rule stays registered but no-ops. */
  def uninstall(spark: SparkSession): Unit = registries.remove(spark)
}
