package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.{Num, Sources}
import Num._

/** Event-stream analytics over the `events` table (event_id, ts, user_id,
  * event_type, value, props-JSON) — the batch twins of [[graft.streaming]]:
  * identical semantics, expressed as one-pass windowed plans so the oracle
  * can verify them; the streaming module re-derives the same results
  * incrementally.
  *
  * Scale shape: everything here shuffles once on a dense key (hour bucket,
  * user_id) and stays in whole-stage codegen. Session windows are the only
  * genuinely order-dependent operator: they need one sort within each
  * user partition (Spark's window exec does partial sort, not global).
  */
object Events {

  val SessionGapMinutes = 30
  val SlideMinutes = 15
  val WindowMinutes = 60
  val RollingDays = 7

  /** Hourly tumbling window per event type: the canonical streaming agg in
    * batch form. Bucketing via date_trunc keeps the oracle trivial. */
  def tumblingHourly(spark: SparkSession, dir: String): DataFrame =
    Sources.events(spark, dir)
      .groupBy(date_trunc("hour", col("ts")).as("window_start"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        r2(dsum(col("value"))).as("total_value"))

  /** Sliding 60-minute windows every 15 minutes (each event lands in 4
    * windows, epoch-aligned exactly like Spark's `window(ts, 1h, 15m)`).
    * Expressed as an explicit explode over the 4 slide offsets so the
    * window-assignment rule is one integer formula both engines share. */
  def slidingHourly(spark: SparkSession, dir: String): DataFrame = {
    val slideUs = SlideMinutes * 60L * 1000000L
    val nSlides = WindowMinutes / SlideMinutes
    val bucket =
      graft.engine.Num.idiv(unix_micros(col("ts")), lit(slideUs)) * slideUs
    Sources.events(spark, dir)
      .select(col("ts"), col("user_id"), col("value"),
        explode(sequence(lit(0), lit(nSlides - 1))).as("i"))
      .select(timestamp_micros((bucket - col("i") * slideUs).cast("long")).as("window_start"),
        col("user_id"), col("value"))
      .groupBy("window_start")
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        r2(dsum(col("value"))).as("total_value"))
  }

  /** Gap-based sessionization: a new session starts after
    * [[SessionGapMinutes]] of per-user inactivity. Two windows over one
    * (user, ts) sort: lag → new-session flag → running-sum session index;
    * then a hash-agg per session. Event-id tiebreak makes ordering total. */
  def sessions(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val gapUs = SessionGapMinutes * 60L * 1000000L
    val prevTs = lag(col("ts"), 1).over(byUser)
    val isNew = when(prevTs.isNull ||
      unix_micros(col("ts")) - unix_micros(prevTs) > gapUs, 1L).otherwise(0L)
    Sources.events(spark, dir)
      .withColumn("session_seq", sum(isNew).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_seq")
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        r2(dsum(col("value"))).as("session_value"))
      .withColumn("duration_sec",
        r2((unix_micros(col("session_end")) - unix_micros(col("session_start"))) / 1e6))
  }

  /** Spark's NATIVE session_window over events in batch mode — window end =
    * last event ts + gap, vs [[sessions]]' last-event end. Verifying this
    * against the oracle's first-principles lag/gap SQL cross-checks the
    * built-in operator's merge semantics, not just our own windows. */
  def sessionWindowsNative(spark: SparkSession, dir: String): DataFrame =
    Sources.events(spark, dir)
      .groupBy(session_window(col("ts"), s"$SessionGapMinutes minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), r2(dsum(col("value"))).as("session_value"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("session_value"))

  /** Per-user daily activity with a [[RollingDays]]-day rolling event count
    * and value sum — a RANGE frame over a day ordinal, so absent days still
    * age out of the window (ROWS would silently span gaps). */
  def userRollingDaily(spark: SparkSession, dir: String): DataFrame = {
    val daily = Sources.events(spark, dir)
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("day_value"))
      .withColumn("day_num", datediff(col("day"), lit("1970-01-01").cast("date")))
    val w = Window.partitionBy("user_id").orderBy("day_num")
      .rangeBetween(-(RollingDays - 1), 0)
    daily.select(
      col("user_id"), col("day"),
      col("n_events"),
      r2(col("day_value")).as("day_value"),
      sum(col("n_events")).over(w).as("rolling_7d_events"),
      r2(dsumOver(col("day_value"), w)).as("rolling_7d_value"))
  }

  /** Per-user activity-SHAPE similarity: Pearson correlation of each
    * user's daily value series against the corpus' aggregate daily series
    * (the "typical" shape) — time-series similarity search in the
    * cohort-analytics form it takes at warehouse scale: who tracks the
    * aggregate curve, who moves against it.
    *
    * The distributed trick is the IMPLICIT-ZERO algebra: a user's series
    * is dense over the corpus' active-day grid with zeros on inactive
    * days, but zeros contribute nothing to Σx, Σx², Σxy — so the per-user
    * sufficient statistics aggregate over the user's ACTIVE days only
    * (one groupBy), while the grid-wide moments (n, Σy, Σy²) are three
    * broadcast scalars. No user×day dense matrix ever materializes:
    * Pearson over the full grid at the cost of a sparse scan. Exactness:
    * every Σ is an order-free decimal sum, products are identical double
    * ops in both engines, variances are clamped at 0 before sqrt so FP
    * cancellation cannot diverge into NaN on one engine only.
    *
    * Scale shape: two source aggs (user-day, day) + one broadcast join on
    * day + one user-grain agg. The reference series is |days| rows —
    * broadcast-sized at any corpus size. */
  def userSeriesCorrelation(spark: SparkSession, dir: String): DataFrame = {
    val ev = Sources.events(spark, dir)
    val daily = ev.groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(dsum(col("value")).as("x"))
    val ref = ev.groupBy(to_date(col("ts")).as("day"))
      .agg(dsum(col("value")).as("y"))
    val g = broadcast(ref.agg(
      count(lit(1)).as("n"),
      sum(col("y").cast(Num.SumDec)).cast("double").as("sy"),
      sum((col("y") * col("y")).cast(Num.SumDec)).cast("double").as("syy")))
    val per = daily.join(broadcast(ref), Seq("day"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_active_days"),
        sum(col("x").cast(Num.SumDec)).cast("double").as("sx"),
        sum((col("x") * col("x")).cast(Num.SumDec)).cast("double").as("sxx"),
        sum((col("x") * col("y")).cast(Num.SumDec)).cast("double").as("sxy"))
    per.crossJoin(g)
      .select(col("user_id"), col("n_active_days"),
        r4(div0(col("n") * col("sxy") - col("sx") * col("sy"),
          sqrt(greatest(col("n") * col("sxx") - col("sx") * col("sx"), lit(0.0)))
            * sqrt(greatest(col("n") * col("syy") - col("sy") * col("sy"), lit(0.0)))))
          .as("pearson_r"))
  }

  /** JSON prop extraction + per-type KPI: exercises the JSON path surface
    * (get_json_object ≡ DuckDB json_extract) without a parse UDF. */
  def typeKpis(spark: SparkSession, dir: String): DataFrame =
    Sources.events(spark, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_events"),
        r2(dsum(col("value"))).as("total_value"),
        r2(sum(col("k")).cast("double") / count(lit(1))).as("avg_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))

  val EventTypes = Seq("click", "error", "purchase", "signup", "view")

  /** Per-user event-type matrix via PIVOT with an explicit value list (the
    * list keeps it one pass — Spark's value-discovery pivot adds a distinct
    * scan, which at 100 TB is a full extra job). Absent cells → 0. */
  def userTypePivot(spark: SparkSession, dir: String): DataFrame = {
    val counts = Sources.events(spark, dir)
      .groupBy("user_id")
      .pivot("event_type", EventTypes)
      .agg(count(lit(1)))
    EventTypes.foldLeft(counts)((df, t) =>
      df.withColumn(t, coalesce(col(t), lit(0L))))
      .withColumn("total_events", EventTypes.map(col).reduce(_ + _))
  }

  /** Weekly cohort retention: users grouped by first-activity week, counted
    * in each later week they return. The triangle matrix every product
    * analytics stack computes — one per-user aggregate for the cohort, one
    * join back (broadcast at |users| ≪ |events|), one (cohort, offset)
    * hash-agg. Retention is n_active / cohort_size, r4 for parity. */
  def weeklyRetention(spark: SparkSession, dir: String): DataFrame = {
    val ev = Sources.events(spark, dir)
    // exact integral division (`div`): the double `/`-then-cast route can
    // round across a week boundary; DuckDB's `//` twin is exact too
    val week = expr("unix_micros(ts) div 604800000000")
    val firstWeek = ev.groupBy("user_id").agg(min(week).as("cohort_week"))
    val active = ev.select(col("user_id"), week.as("week")).distinct()
    val sizes = firstWeek.groupBy("cohort_week").agg(countDistinct("user_id").as("cohort_size"))
    active.join(firstWeek, "user_id")
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
      .agg(countDistinct("user_id").as("n_active"))
      .join(sizes, "cohort_week")
      .withColumn("retention", r4(col("n_active").cast("double") / col("cohort_size")))
      .select("cohort_week", "week_offset", "n_active", "cohort_size", "retention")
  }

  val HistBucketWidth = 50.0
  val HistMaxBucket = 9

  /** Fixed-width value histogram per event type (bucket = min(⌊v/w⌋, max) —
    * last bucket absorbs the tail). Map-side combinable by construction. */
  def valueHistogram(spark: SparkSession, dir: String): DataFrame =
    Sources.events(spark, dir)
      .groupBy(col("event_type"),
        least(floor(col("value") / HistBucketWidth), lit(HistMaxBucket)).as("bucket"))
      .agg(
        count(lit(1)).as("n"),
        r2(min(col("value"))).as("lo"),
        r2(max(col("value"))).as("hi"))

  /** Ordered conversion funnel signup → view → click → purchase: stage i
    * counts users whose first stage-i event follows their first stage-(i−1)
    * event. One conditional-min aggregate per user, then an iterated
    * "first-after" fold — no self-joins, one shuffle on user_id. */
  /** Per-purchase view attribution: every purchase joined (left) to the same
    * user's views in the preceding hour, aggregated to views_1h +
    * last_view_ts. The batch twin of [[graft.streaming.Streams
    * .purchaseViewPairs]] plus the aggregate a report would keep. Plan: one
    * equi-join keyed on user_id (sort-merge; the range predicate filters
    * within the join) then a hash aggregate on the purchase key — state and
    * shuffle are both per-user, never global. */
  def purchaseAttribution(spark: SparkSession, dir: String): DataFrame = {
    val ev = Sources.events(spark, dir)
    val v = ev.where(col("event_type") === "view")
      .select(col("user_id").as("view_user"), col("ts").as("view_ts"))
    val p = ev.where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_event_id"), col("user_id"),
        col("ts").as("purchase_ts"), col("value"))
    p.join(v,
        col("view_user") === col("user_id") &&
          col("view_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR") &&
          col("view_ts") < col("purchase_ts"), "left")
      .groupBy("purchase_event_id", "user_id", "purchase_ts", "value")
      .agg(
        count(col("view_ts")).as("views_1h"),
        max(col("view_ts")).as("last_view_ts"))
  }

  def funnel(spark: SparkSession, dir: String): DataFrame = {
    val stages = Seq("signup", "view", "click", "purchase")
    val ev = Sources.events(spark, dir)
    // stage i's per-user time = min(ts | type = stage_i AND ts ≥ stage_{i−1}
    // time) — iterated against the previous stage's per-user aggregate (at
    // scale each step is one shuffle on user_id over already-aggregated
    // rows; the event scan is filtered to a single type per step).
    val stage0 = ev.where(col("event_type") === stages.head)
      .groupBy("user_id").agg(min("ts").as("reached_ts"))
    val reached = stages.tail.foldLeft(Seq(stages.head -> stage0)) { (acc, s) =>
      val prev = acc.last._2
      val next = ev.where(col("event_type") === s)
        .join(prev.select(col("user_id"), col("reached_ts").as("prev_ts")), "user_id")
        .where(col("ts") >= col("prev_ts"))
        .groupBy("user_id").agg(min("ts").as("reached_ts"))
      acc :+ (s -> next)
    }
    reached.zipWithIndex.map { case ((s, df), i) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).as("stage"), lit(s).as("event_type"), col("n_users"))
    }.reduce(_.unionByName(_))
  }

  /** Anomaly-gate multiplier: flag days with |total − median| > this·MAD. */
  val AnomalyMadK = 3

  /** Robust daily ANOMALY GATE — median/MAD outlier detection on the daily
    * value series, the monitoring-side sibling of the stats-drift gates:
    * mean/stddev baselines let a burst inflate its own threshold, while the
    * median and the median-absolute-deviation have a 50% breakdown point —
    * half the days can be corrupt before the baseline moves.
    *
    * Exactness: daily totals are the established exact DECIMAL sums
    * ([[graft.engine.Num.dsum]]); medians are exact order statistics
    * (lower/upper middle by (value, day) total order, averaged — one IEEE
    * add/divide on identical doubles in both engines); the verdict compares
    * unrounded doubles whose every producing op is correctly rounded —
    * deterministic on any IEEE-754 platform (same disposition as the r10
    * exactness audit's "genuine double data" class).
    *
    * Scale shape: ONE day-grain shuffle with map-side partial aggregation;
    * the day-grain frame is bounded (years × 365 rows — control-plane
    * small at any corpus size), so the two median rank passes ride the
    * distributed [[graft.plans.GlobalRank]] and the scalars broadcast
    * back. */
  def anomalyDays(spark: SparkSession, dir: String): DataFrame =
    anomalyDaysOf(Sources.events(spark, dir))

  /** PRODUCTION ENTRY — [[anomalyDays]] over ANY (ts, value) frame. */
  def anomalyDaysOf(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total"))
    // exact median of `valueCol` under the (valueCol, day) total order
    def medianOf(df: DataFrame, out: String): DataFrame = {
      val ranked = graft.plans.GlobalRank.withRankColumns(df,
        Seq(col("_mv").asc, col("day").asc), "_rn", "_rk", "_tot")
      ranked.where(col("_rn") === Num.idiv(col("_tot") + 1, lit(2L)) ||
          col("_rn") === Num.idiv(col("_tot"), lit(2L)) + 1)
        .agg((sum(col("_mv")) / count(lit(1))).as(out))
    }
    val med = medianOf(daily.select(col("day"), col("total").as("_mv")), "med")
    val dev = daily.crossJoin(broadcast(med))
      .select(col("day"), col("n_events"), col("total"), col("med"),
        abs(col("total") - col("med")).as("dev"))
    val mad = medianOf(dev.select(col("day"), col("dev").as("_mv")), "mad")
    dev.crossJoin(broadcast(mad))
      .select(col("day"), col("n_events"),
        r2(col("total")).as("total_value"),
        r2(col("med")).as("median_value"),
        r2(col("dev")).as("abs_deviation"),
        r2(col("mad")).as("mad"),
        (col("dev") > lit(AnomalyMadK.toDouble) * col("mad")).as("is_anomaly"))
  }
}
