package graft

import org.apache.spark.sql.functions._
import graft.engine.Bronze

/** Bronze gates + keep-latest dedup (SURVEY.md §2.2 P3/P4, §2.5 W1). */
class BronzeSpec extends SparkSpec {
  import spark.implicits._

  test("lineitem dedup emits exactly one row per (orderkey, linenumber)") {
    val li = Bronze.lineitem(spark, sf)
    val total = li.count()
    val keys = li.select("l_orderkey", "l_linenumber").distinct().count()
    assert(total == keys && total > 0)
  }

  test("lineitem dedup keeps the latest ship date of each duplicate group") {
    val raw = graft.engine.Sources.lineitem(spark, sf)
      .where(col("l_quantity") > 0 && col("l_extendedprice") > 0)
    val latest = raw.groupBy("l_orderkey", "l_linenumber")
      .agg(max("l_shipdate").as("max_ship"))
    val joined = Bronze.lineitem(spark, sf)
      .join(latest, Seq("l_orderkey", "l_linenumber"))
      .where(col("l_shipdate") =!= col("max_ship"))
    assert(joined.count() == 0)
  }

  test("quality gates reject non-positive quantity and price") {
    val bad = Bronze.lineitem(spark, sf)
      .where(col("l_quantity") <= 0 || col("l_extendedprice") <= 0)
    assert(bad.count() == 0)
  }

  test("null-PK gate drops rows with null keys (synthetic)") {
    val df = Seq((Some(1L), "a"), (None, "b")).toDF("o_orderkey", "payload")
    // same predicate Bronze.orders applies
    assert(df.where(col("o_orderkey").isNotNull).count() == 1)
  }
}
