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
}
