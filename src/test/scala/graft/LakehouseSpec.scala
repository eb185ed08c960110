package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.engine.{Cdf, Incremental, Sources}
import graft.sources.{Maintenance, Versioned}

/** Lakehouse-incremental surface: SCD2 invariants, CDF diff semantics,
  * delta-fold aggregate maintenance, compaction, and stats-based file
  * skipping. (The scd2/cdf/incr QUERIES are oracle-verified; these specs pin
  * the structural invariants an oracle hash can't articulate.) */
class LakehouseSpec extends SparkSpec {

  test("scd2: intervals are gapless, versions dense, exactly one current row per user") {
    val h = ext.Scd.userEventTypeHistory(spark, sf).cache()
    val users = h.select("user_id").distinct().count()
    // exactly one open interval per user
    assert(h.where(col("is_current")).count() === users)
    assert(h.where(col("effective_to").isNull && !col("is_current")).isEmpty)
    // consecutive versions chain: effective_to == next effective_from, versions 1..n
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("version")
    val chained = h
      .withColumn("_next_from", lead(col("effective_from"), 1).over(w))
      .withColumn("_next_ver", lead(col("version"), 1).over(w))
    assert(chained.where(col("_next_from").isNotNull &&
      col("effective_to") =!= col("_next_from")).isEmpty)
    assert(chained.where(col("_next_ver").isNotNull &&
      col("_next_ver") =!= col("version") + 1).isEmpty)
    assert(h.where(col("version") === 1).count() === users)
    // no version re-states its predecessor's value (runs are collapsed)
    val adj = h.withColumn("_next_type", lead(col("event_type"), 1).over(w))
    assert(adj.where(col("_next_type").isNotNull &&
      col("_next_type") === col("event_type")).isEmpty)
    h.unpersist()
  }

  test("cdf: diff round-trips — applying the feed to OLD reproduces NEW") {
    val old = Sources.orders(spark, sf)
      .where(col("o_orderdate") < lit(Cdf.CdfOldEnd))
      .groupBy(col("o_custkey").as("customer_key"))
      .agg(count(lit(1)).as("order_count"))
    val neu = Sources.orders(spark, sf)
      .where(col("o_orderdate") >= lit(Cdf.CdfNewStart))
      .groupBy(col("o_custkey").as("customer_key"))
      .agg(count(lit(1)).as("order_count"))
    val feed = Cdf.diff(old, neu, Seq("customer_key")).cache()
    // apply: delete+update keys removed from OLD, insert+update rows added from feed
    val touched = feed.select("customer_key")
    val applied = old.join(touched, Seq("customer_key"), "left_anti")
      .unionByName(feed.where(col("change_type").isin("insert", "update"))
        .select(col("customer_key"), col("new_order_count").as("order_count")))
    assert(applied.unionByName(neu).distinct().count() === neu.count(),
      "applied feed must equal the new snapshot")
    assert(applied.count() === neu.count())
    // feed contains all three change kinds on this fixture's date windows
    val kinds = feed.select("change_type").distinct().collect().map(_.getString(0)).toSet
    assert(kinds === Set("insert", "update", "delete"))
    feed.unpersist()
  }

  test("incr: folding deltas in any batch split matches the direct aggregate") {
    val o = Sources.orders(spark, sf)
    val direct = Incremental.finalize(Incremental.monthlyRevenueState(o))
    val byDate = Incremental.monthlyRevenueFromDeltas(spark, sf)
    // a different (key-striped, order-scrambled) split must give the same result
    val striped = Seq(0, 1, 2).map(k => o.where(pmod(col("o_orderkey"), lit(3)) === k))
    val byKey = Incremental.finalize(Incremental.merge(
      striped.reverse.map(Incremental.monthlyRevenueState)))
    assert(direct.unionByName(byDate).distinct().count() === direct.count())
    assert(direct.unionByName(byKey).distinct().count() === direct.count())
  }

  test("compaction: fragmented version bin-packs into fewer files, data identical") {
    val path = Files.createTempDirectory("graft_compact").toString
    val data = Sources.orders(spark, sf).select("o_orderkey", "o_custkey", "o_totalprice")
    val v1 = Versioned.write(data.repartition(64), path)
    assert(Maintenance.partFileCount(spark, path, v1) === 64)
    val rows = data.count()
    val v2 = Maintenance.compact(spark, path, targetRowsPerFile = rows / 4 + 1)
    assert(v2 === v1 + 1)
    val filesAfter = Maintenance.partFileCount(spark, path, v2)
    assert(filesAfter <= 4, s"expected <=4 files, got $filesAfter")
    // content identical (set equality), fragmented version still time-travelable
    val before = Versioned.read(spark, path, Some(v1))
    val after = Versioned.read(spark, path, Some(v2))
    assert(after.count() === rows)
    assert(before.unionByName(after).distinct().count() === rows)
  }

  test("streaming maintenance: folded state equals the from-scratch aggregate") {
    val dir = Files.createTempDirectory("graft_incr_stream").toString
    // slices must carry the catalog's o_orderdate DATE type (the pinned
    // stream schema) — Sources.orders applies exactly that cast
    val raw = Sources.orders(spark, sf).cache()
    val slices = Seq(
      raw.where(col("o_orderdate") < lit("1997-01-01")),
      raw.where(col("o_orderdate") >= lit("1997-01-01")
        && col("o_orderdate") < lit("1999-01-01")),
      raw.where(col("o_orderdate") >= lit("1999-01-01")))
    Files.createDirectories(java.nio.file.Paths.get(s"$dir/in"))
    val src = Sources.parquetStream(spark, s"$dir/in", "orders")
    val statePath = s"$dir/state"
    val q = graft.streaming.Streams.maintainMonthlyRevenue(src, statePath, s"$dir/ckpt")
    try {
      slices.foreach { s =>
        s.write.mode("append").parquet(s"$dir/in")
        q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = Incremental.finalize(Versioned.read(spark, statePath))
    val direct = Incremental.finalize(Incremental.monthlyRevenueState(raw))
    assert(streamed.count() === direct.count())
    assert(streamed.unionByName(direct).distinct().count() === direct.count(),
      "streamed state must finalize to the exact from-scratch aggregate")
    // every micro-batch committed an atomic, time-travelable state version
    assert(Versioned.latestVersion(spark, statePath).exists(_ >= 3))
    raw.unpersist()
  }

  test("z-order: skipping prunes on BOTH columns; a plain sort only on its leading one") {
    val base = Files.createTempDirectory("graft_zorder").toString
    val data = Sources.orders(spark, sf).select(
      datediff(col("o_orderdate"), lit("1995-01-01").cast("date")).as("o_day"),
      col("o_totalprice"), col("o_orderkey"))
    Maintenance.zorderWrite(data, Seq("o_day", "o_totalprice"), s"$base/z", 16)
    data.repartitionByRange(16, col("o_day")).write.parquet(s"$base/sorted")
    def pruned(path: String, c: String, lo: Double, hi: Double): Int = {
      val scan = spark.read.parquet(path)
      val stats = Maintenance.fileStats(scan, Seq(c))
      Maintenance.candidateFiles(stats, c, lit(lo), lit(hi)).size
    }
    // narrow slices on each dimension (~10% of each domain)
    val dayFiles = pruned(s"$base/z", "o_day", 800, 1000)
    val priceFiles = pruned(s"$base/z", "o_totalprice", 100000, 150000)
    assert(dayFiles < 16, s"z-order must prune on o_day, read $dayFiles/16")
    assert(priceFiles < 16, s"z-order must prune on o_totalprice, read $priceFiles/16")
    // the single-column layout prunes its own key but not the other column
    val sortedDay = pruned(s"$base/sorted", "o_day", 800, 1000)
    val sortedPrice = pruned(s"$base/sorted", "o_totalprice", 100000, 150000)
    assert(sortedDay < 16)
    assert(priceFiles < sortedPrice,
      s"z-order ($priceFiles files) must beat the date-sorted layout " +
        s"($sortedPrice files) on the non-leading column")
    // z-order trades perfect leading-column clustering for multi-column
    // clustering; it may read more o_day files than the dedicated sort
    assert(data.count() === spark.read.parquet(s"$base/z").count())
  }

  test("vacuum deletes expired versions but never the pointer target") {
    val path = Files.createTempDirectory("graft_vacuum").toString + "/t"
    import spark.implicits._
    (1 to 5).foreach(i => Versioned.write(Seq((i, s"v$i")).toDF("k", "s"), path))
    val deleted = Maintenance.vacuum(spark, path, keepLast = 2)
    assert(deleted === Seq(1, 2, 3))
    assert(Versioned.read(spark, path).select("s").first().getString(0) === "v5")
    assert(Versioned.read(spark, path, Some(4)).count() === 1) // kept window
    intercept[Exception](Versioned.read(spark, path, Some(2)).count())
    // rollback pins an old version: vacuum must not delete it
    val p2 = Files.createTempDirectory("graft_vacuum2").toString + "/t"
    (1 to 3).foreach(i => Versioned.write(Seq((i, s"v$i")).toDF("k", "s"), p2))
    Versioned.rollback(spark, p2, 1)
    assert(Maintenance.vacuum(spark, p2, keepLast = 1) === Seq(2))
    assert(Versioned.read(spark, p2).select("s").first().getString(0) === "v1")
    assert(Versioned.read(spark, p2, Some(3)).count() === 1) // newest kept
  }

  test("schema evolution on read: old versions readable through today's schema") {
    val path = Files.createTempDirectory("graft_evolve").toString + "/t"
    import spark.implicits._
    import org.apache.spark.sql.types._
    Versioned.write(Seq((1L, "a")).toDF("k", "s"), path) // v1: two columns
    Versioned.write(Seq((2L, "b", 9)).toDF("k", "s", "score"), path) // v2: adds score (int)
    val today = StructType(Seq( // today: score widened to long, new flag column
      StructField("k", LongType), StructField("s", StringType),
      StructField("score", LongType), StructField("flag", BooleanType)))
    val v1 = Maintenance.readAligned(spark, path, today, Some(1))
    val v2 = Maintenance.readAligned(spark, path, today, Some(2))
    assert(v1.schema === today && v2.schema === today)
    val all = v1.unionByName(v2).orderBy("k").collect()
    assert(all(0).isNullAt(2) && all(0).isNullAt(3)) // v1 rows: typed nulls
    assert(all(1).getLong(2) === 9L && all(1).isNullAt(3)) // v2: cast int→long
  }

  test("stats index prunes files a range predicate cannot touch") {
    val path = Files.createTempDirectory("graft_stats").toString + "/orders"
    // range-layout by date -> disjoint per-file min/max (the clustered case
    // data skipping rewards; an unclustered layout degrades to reading all)
    Sources.orders(spark, sf)
      .select("o_orderkey", "o_orderdate", "o_totalprice")
      .repartitionByRange(8, col("o_orderdate"))
      .write.parquet(path)
    val scan = spark.read.parquet(path)
    val stats = Maintenance.fileStats(scan, Seq("o_orderdate", "o_totalprice")).cache()
    assert(stats.count() === 8)
    assert(stats.agg(sum("row_count")).first().getLong(0) === scan.count())
    // a one-year slice of the fixture's 1995-2001 span must skip most files
    val lo = lit("1997-01-01").cast("date"); val hi = lit("1997-12-31").cast("date")
    val (files, pruned) = Maintenance.skippingRead(spark, stats, "o_orderdate", lo, hi)
    assert(files.nonEmpty && files.size < 8, s"expected pruning, read ${files.size}/8")
    val expected = scan.where(col("o_orderdate").between(lo, hi))
    assert(pruned.count() === expected.count() && expected.count() > 0)
    // an out-of-domain range touches nothing
    val (none, empty) = Maintenance.skippingRead(spark, stats, "o_orderdate",
      lit("2050-01-01").cast("date"), lit("2050-12-31").cast("date"))
    assert(none.isEmpty && empty.isEmpty)
    stats.unpersist()
  }

  test("DynamicOverwrite serializes the session-conf window across threads " +
    "and restores the previous mode") {
    import graft.sources.DynamicOverwrite
    val key = "spark.sql.sources.partitionOverwriteMode"
    val before = spark.conf.get(key)
    val events = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val t1 = new Thread(() => DynamicOverwrite(spark) {
      events.add("a-in:" + spark.conf.get(key))
      Thread.sleep(300)
      events.add("a-out")
    })
    t1.start(); Thread.sleep(60) // t1 holds the scope
    val t2 = new Thread(() => DynamicOverwrite(spark) {
      events.add("b-in:" + spark.conf.get(key))
    })
    t2.start(); t1.join(); t2.join()
    // b must not enter while a holds the window (the interleaving that
    // flips the shared conf back to static mid-insert and truncates tables)
    assert(events.toArray.toSeq ===
      Seq("a-in:dynamic", "a-out", "b-in:dynamic"))
    assert(spark.conf.get(key) === before, "previous mode not restored")
  }
}
