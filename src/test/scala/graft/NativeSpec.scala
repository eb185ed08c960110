package graft

import org.apache.spark.sql.functions._
import graft.functions.Native

/** The native expressions must be drop-in equal to the interpreted
  * higher-order-function formulas they replaced — checked corpus-wide on the
  * real test tables, not toy literals. */
class NativeSpec extends SparkSpec {

  test("polyHash == aggregate(split) rolling hash on every document") {
    val interp = aggregate(split(col("text"), ""), lit(0L),
      (h, ch) => (h * 131L + ascii(ch)) % 2147483647L)
    val diff = graft.engine.Sources.documents(spark, sf)
      .select(Native.polyHash(col("text")).as("a"), interp.as("b"))
      .where(col("a") =!= col("b")).count()
    assert(diff === 0L)
  }

  test("dot == aggregate(zip_with) fold on every embedding (self dot)") {
    val v = transform(col("embedding"), x => x.cast("double"))
    val interp = aggregate(zip_with(v, v, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    val diff = graft.engine.Sources.embeddings(spark, sf)
      .select(Native.dot(v, v).as("a"), interp.as("b"))
      .where(col("a") =!= col("b")).count() // bitwise: same fold order
    assert(diff === 0L)
  }

  test("SQL registration: graft_dot and graft_poly_hash callable from spark.sql") {
    Native.register(spark)
    val r = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d, graft_poly_hash('abc') AS h"
    ).first()
    assert(r.getDouble(0) === 11.0)
    assert(r.getLong(1) === 1677554L) // pinned cross-engine probe value (round 1)
  }

  test("null handling: null string / null arrays yield null") {
    val r = spark.sql(
      "SELECT graft_poly_hash(CAST(NULL AS STRING)) AS h, graft_dot(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d)) AS d"
    ).first()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }
}
