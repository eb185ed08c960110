package graft

import org.apache.spark.sql.functions._
import graft.ext.Events

/** Structural invariants for the event-analytics operators (oracle parity is
  * covered by Verify/compare; these pin properties that hold for ANY data). */
class EventsSpec extends SparkSpec {

  test("sessions partition the event stream: per-session counts sum to total events") {
    val total = graft.engine.Sources.events(spark, sf).count()
    val s = Events.sessions(spark, sf)
    assert(s.agg(sum("n_events")).first().getLong(0) === total)
    assert(s.where(col("duration_sec") < 0).count() === 0)
    assert(s.where(col("session_end") < col("session_start")).count() === 0)
  }

  test("funnel stage counts are non-increasing") {
    val counts = Events.funnel(spark, sf).orderBy("stage")
      .select("n_users").collect().map(_.getLong(0)).toSeq
    assert(counts.size === 4)
    counts.sliding(2).foreach { case Seq(a, b) => assert(b <= a, s"$counts") }
  }

  test("retention at week offset 0 is 1.0 for every cohort") {
    val w0 = Events.weeklyRetention(spark, sf).where(col("week_offset") === 0)
    assert(w0.count() > 0)
    assert(w0.where(col("retention") =!= 1.0).count() === 0)
    // and offsets never exceed the observed span (30 days ≈ 5 weeks)
    val maxOff = Events.weeklyRetention(spark, sf)
      .agg(max("week_offset")).first().getLong(0)
    assert(maxOff <= 5)
  }

  test("histogram buckets partition all events and respect bucket bounds") {
    val h = Events.valueHistogram(spark, sf)
    val total = graft.engine.Sources.events(spark, sf).count()
    assert(h.agg(sum("n")).first().getLong(0) === total)
    val bad = h.where(
      (col("bucket") < Events.HistMaxBucket &&
        (col("lo") < col("bucket") * Events.HistBucketWidth ||
         col("hi") >= (col("bucket") + 1) * Events.HistBucketWidth)) ||
      col("bucket") > Events.HistMaxBucket)
    assert(bad.count() === 0)
  }

  test("purchase attribution: every purchase appears once; views_1h bounded by user's views") {
    val ev = graft.engine.Sources.events(spark, sf)
    val att = graft.ext.Events.purchaseAttribution(spark, sf)
    val nPurch = ev.where(org.apache.spark.sql.functions.col("event_type") === "purchase").count()
    assert(att.count() === nPurch) // left join + purchase-key group keeps all
    val viewsPerUser = ev.where(org.apache.spark.sql.functions.col("event_type") === "view")
      .groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    att.collect().foreach { r =>
      val v = r.getAs[Long]("views_1h")
      assert(v >= 0 && v <= viewsPerUser.getOrElse(r.getAs[Long]("user_id"), 0L))
      if (v == 0) assert(r.isNullAt(r.fieldIndex("last_view_ts")))
    }
  }

  test("sequence packing: offsets are contiguous per lang and seq ids monotone") {
    val packed = graft.ext.Corpus.packSequences(spark, sf).collect()
      .groupBy(_.getAs[String]("lang"))
    packed.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("doc_id"))
      var expected = 0L
      sorted.foreach { r =>
        assert(r.getAs[Long]("start_offset") === expected) // no gaps, no overlap
        expected += r.getAs[Long]("n_bpe_tokens")
        val sid = r.getAs[Long]("seq_id")
        assert(sid === r.getAs[Long]("start_offset") / graft.ext.Corpus.SeqLen)
      }
    }
  }

  test("tumbling + sliding totals agree (each event in exactly 1 and 4 windows)") {
    val t = Events.tumblingHourly(spark, sf).agg(sum("n_events")).first().getLong(0)
    val s = Events.slidingHourly(spark, sf).agg(sum("n_events")).first().getLong(0)
    val total = graft.engine.Sources.events(spark, sf).count()
    assert(t === total)
    assert(s === total * 4)
  }

  test("user series correlation: every user scored, |r| bounded by " +
    "Cauchy-Schwarz, and the single-user degenerate grid gives r = 1") {
    val rows = Events.userSeriesCorrelation(spark, sf).collect()
    val users = graft.engine.Sources.events(spark, sf)
      .select("user_id").distinct().count()
    assert(rows.length.toLong === users, "every active user must be scored")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_active_days") >= 1L)
      val p = r.getAs[Double]("pearson_r")
      assert(p.isNaN || math.abs(p) <= 1.0001,
        s"|r| broke the Cauchy-Schwarz bound: $r")
    }
    // sanity on the formula: if only ONE user existed, their series IS the
    // reference, so r must be exactly 1 on every active-day grid with
    // variance. Emulate by filtering to the most active user's events.
    val top = graft.engine.Sources.events(spark, sf)
      .groupBy("user_id")
      .agg(countDistinct(to_date(col("ts"))).as("days"))
      .orderBy(col("days").desc, col("user_id"))
      .limit(1).collect().head.getLong(0)
    val dir = java.nio.file.Files.createTempDirectory("graft_corr").toString
    graft.engine.Sources.events(spark, sf)
      .where(col("user_id") === top).write.parquet(s"$dir/events.parquet")
    val solo = Events.userSeriesCorrelation(spark, dir).collect()
    assert(solo.length === 1)
    assert(solo.head.getAs[Double]("pearson_r") === 1.0,
      s"self-correlation must be exactly 1: ${solo.head}")
  }

  test("anomaly days: one median/MAD baseline, planted spike day flags, " +
      "robustness — the spike does not move the median verdicts") {
    import spark.implicits._
    val rows = Events.anomalyDays(spark, sf).collect()
    assert(rows.length === 30)
    assert(rows.map(_.getAs[Double]("median_value")).distinct.length === 1)
    assert(rows.map(_.getAs[Double]("mad")).distinct.length === 1)
    val flagged = rows.filter(_.getAs[Boolean]("is_anomaly"))
    assert(flagged.nonEmpty, "no anomalous day — vacuous gate")
    assert(flagged.length < rows.length / 2, "baseline broke down")
    // plant a massive spike on a fresh day: it must flag, and — the robust
    // point — the OTHER days' verdicts must be unchanged (a mean/stddev
    // gate would absorb the spike into its own threshold)
    val base = graft.engine.Sources.events(spark, sf)
    val spike = Seq.tabulate(50)(i =>
      (900000L + i, java.sql.Timestamp.valueOf("2024-02-15 12:00:00"),
        1L, "purchase", 1.0e7, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val withSpike = Events.anomalyDaysOf(base.unionByName(spike)).collect()
    assert(withSpike.length === 31)
    val spikeRow = withSpike
      .find(_.getAs[java.sql.Date]("day").toString == "2024-02-15").get
    assert(spikeRow.getAs[Boolean]("is_anomaly"), s"spike not flagged: $spikeRow")
    val beforeMap = rows.map(r =>
      r.getAs[java.sql.Date]("day").toString -> r.getAs[Boolean]("is_anomaly")).toMap
    withSpike.filter(_.getAs[java.sql.Date]("day").toString != "2024-02-15")
      .foreach { r =>
        val d = r.getAs[java.sql.Date]("day").toString
        assert(beforeMap(d) === r.getAs[Boolean]("is_anomaly"),
          s"spike moved day $d's verdict (baseline not robust)")
      }
  }
}
