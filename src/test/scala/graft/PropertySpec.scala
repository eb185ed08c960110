package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants on generated data (SURVEY.md §5).
  *
  * scalatestplus isn't on the classpath, so generators are driven directly
  * with fixed seeds — deterministic, and each sample is a real Spark job so a
  * handful of seeds is the right budget anyway.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val rowsGen = Gen.listOfN(60,
    for {
      key <- Gen.choose(1L, 12L)   // few keys → guaranteed duplicate groups
      seq <- Gen.choose(1, 1000)
      payload <- Gen.choose(0.0, 1e6)
    } yield (key, seq, payload))

  test("keep-latest dedup: unique keys out, each survivor carries the group max sequence") {
    for (rows <- samples(rowsGen, 5) if rows.nonEmpty) {
      val df = rows.toDF("key", "seq", "payload")
      val w = Window.partitionBy("key")
        .orderBy(col("seq").desc, col("payload").desc) // payload breaks seq ties
      val deduped = df.withColumn("_rn", row_number().over(w))
        .where(col("_rn") === 1).drop("_rn").cache()
      val n = deduped.count()
      assert(deduped.select("key").distinct().count() == n)
      val maxes = df.groupBy("key").agg(max("seq").as("mx"))
      assert(deduped.join(maxes, "key").where(col("seq") =!= col("mx")).count() == 0)
    }
  }

  private val liGen = Gen.listOfN(50,
    for {
      price <- Gen.choose(1.0, 1e5)
      disc <- Gen.choose(0.0, 1.0)
    } yield (price, disc))

  test("net revenue bounded by extended price for discounts in [0,1]") {
    for (rows <- samples(liGen, 5) if rows.nonEmpty) {
      val bad = rows.toDF("extended_price", "discount_pct")
        .withColumn("net_revenue", col("extended_price") * (lit(1) - col("discount_pct")))
        .where(col("net_revenue") > col("extended_price") || col("net_revenue") < 0)
      assert(bad.count() == 0)
    }
  }

  private val strGen = Gen.listOfN(40, Gen.alphaNumStr.map(_.take(30)))

  test("polyHash concatenation identity: h(a++b) = (h(a)·131^|b| + h(b)) mod P") {
    val P = 2147483647L
    def pow(b: Long, e: Int): Long = (1 to e).foldLeft(1L)((acc, _) => acc * b % P)
    for (strs <- samples(strGen, 3); pair <- strs.sliding(2, 2) if pair.size == 2) {
      val Seq(a, b) = pair
      val rows = Seq((a, b, a + b)).toDF("a", "b", "ab")
        .select(
          graft.functions.Native.polyHash(col("a")).as("ha"),
          graft.functions.Native.polyHash(col("b")).as("hb"),
          graft.functions.Native.polyHash(col("ab")).as("hab"))
        .first()
      val expect = (rows.getLong(0) % P * pow(131L, b.length) % P + rows.getLong(1)) % P
      assert(rows.getLong(2) === expect, s"a=$a b=$b")
    }
  }

  private val skewGen = Gen.listOfN(80,
    for {
      key <- Gen.frequency(6 -> Gen.const(1L), 1 -> Gen.choose(2L, 6L)) // hot key 1
      v <- Gen.choose(0, 1000)
    } yield (key, v))

  test("salted join equals plain join on skewed keys") {
    for (rows <- samples(skewGen, 3) if rows.nonEmpty) {
      val fact = rows.zipWithIndex.map { case ((k, v), i) => (k, v, i.toLong) }
        .toDF("key", "v", "row_id")
      val dim = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (9L, "unmatched"))
        .toDF("key", "name")
      val plain = fact.join(dim, Seq("key")).select("row_id", "name")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      val salted = graft.ext.Skew.saltedJoin(fact, dim, "key", col("row_id"), salts = 4)
        .select("row_id", "name")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(salted === plain)
    }
  }

  test("mergeKeepLatest is idempotent: re-applying the same batch changes nothing") {
    val dir = java.nio.file.Files.createTempDirectory("graft_prop_merge").toString + "/t"
    val batch = Seq((1L, "a", 3L), (2L, "b", 1L), (1L, "c", 5L)).toDF("k", "v", "seq")
    graft.sources.Sinks.mergeKeepLatest(batch, dir, Seq("k"), "seq")
    val once = spark.read.parquet(dir).orderBy("k").collect().map(_.toSeq).toSeq
    graft.sources.Sinks.mergeKeepLatest(batch, dir, Seq("k"), "seq")
    val twice = spark.read.parquet(dir).orderBy("k").collect().map(_.toSeq).toSeq
    assert(once === twice)
    assert(once.map(_.head) === Seq(1L, 2L)) // keeps seq=5 row for key 1
  }

  test("integer-division devices match BigInteger semantics: idiv = truncation " +
      "(= floor for non-negative), fdiv = floor for either sign, isqrt exact") {
    import graft.engine.Num
    // adversarial operands: exact multiples, off-by-one around multiples,
    // huge magnitudes past double precision (> 2^53), tiny divisors
    val interesting = Seq(0L, 1L, 2L, 999999L, 1000000L, 1000001L,
      (1L << 53) - 1, (1L << 53), (1L << 53) + 1, (1L << 62) - 3,
      3037000499L * 3037000499L) // largest long square
    val divisors = Seq(1L, 2L, 3L, 7L, 1000000L, (1L << 31) - 1)
    val negs = interesting.map(-_)
    val cases = for {
      a <- (interesting ++ negs); b <- divisors
    } yield (a, b)
    val df = cases.toDF("a", "b")
      .select(col("a"), col("b"),
        Num.idiv(col("a"), col("b")).as("q"),
        Num.fdiv(col("a"), col("b")).as("f"))
      .collect()
    df.foreach { r =>
      val (a, b) = (r.getAs[Long]("a"), r.getAs[Long]("b"))
      val truncated = a / b // JVM long division IS truncation toward zero
      val floored = Math.floorDiv(a, b)
      assert(r.getAs[Long]("q") === truncated, s"idiv($a, $b)")
      assert(r.getAs[Long]("f") === floored, s"fdiv($a, $b)")
    }
    // isqrt: exact at perfect squares, their neighbors, and past 2^53
    val sq = interesting.filter(_ >= 0)
      .flatMap(x => Seq(x - 1, x, x + 1)).filter(_ >= 0).distinct
    val got = sq.toDF("x").select(col("x"), Num.isqrt(col("x")).as("w")).collect()
    got.foreach { r =>
      val (x, w) = (BigInt(r.getAs[Long]("x")), BigInt(r.getAs[Long]("w")))
      assert(w * w <= x && (w + 1) * (w + 1) > x, s"isqrt($x) = $w")
    }
  }

  test("bm25 saturation kernel: Long arithmetic == BigInt arithmetic across " +
      "the documented operating range (no silent overflow), bounded by the " +
      "k1+1 ceiling, monotone up in tf and down in dl") {
    // the integer saturation from Text.bm25TopKOf / OraclesExt.textBm25TopK:
    // sat_u = 22·tf·1e12 / ((10·tf+3)·1e6 + 9·⌊dl·N·1e6/T⌋)
    def satLong(tf: Long, dl: Long, n: Long, t: Long): Long = {
      val ndl = dl * n * 1000000L / t
      tf * 22000000000000L / ((10L * tf + 3L) * 1000000L + 9L * ndl)
    }
    def satBig(tf: Long, dl: Long, n: Long, t: Long): BigInt = {
      val ndl = BigInt(dl) * n * 1000000 / t
      BigInt(tf) * BigInt("22000000000000") /
        ((BigInt(10) * tf + 3) * 1000000 + 9 * ndl)
    }
    val gen = for {
      n <- Gen.choose(1L, 1000000000L)   // corpus size up to 1e9 docs
      avg <- Gen.choose(1L, 9000L)       // so T = N·avg stays in range
      dl <- Gen.choose(1L, math.max(1L, 9200000000000L / n)) // dl·N ≤ 9.2e12
      tf <- Gen.choose(1L, math.min(dl, 400000L))            // tf·22e12 < 2⁶³
    } yield (tf, dl, n, n * avg)
    val cases = samples(gen, 300)
    assert(cases.size >= 200, "generator starved")
    for ((tf, dl, n, t) <- cases) {
      val s = satLong(tf, dl, n, t)
      assert(BigInt(s) === satBig(tf, dl, n, t),
        s"Long overflow at tf=$tf dl=$dl n=$n t=$t")
      assert(s >= 0 && s <= 2200000L, s"saturation out of range: $s")
      assert(satLong(tf + 1, dl, n, t) >= s, s"not monotone in tf at $tf,$dl")
      assert(satLong(tf, dl + 1, n, t) <= s, s"not antitone in dl at $tf,$dl")
    }
  }
}
