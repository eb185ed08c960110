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

  test("AdcDotF64 == the slice/element_at composition it replaced, bitwise") {
    import graft.ext.{Pq, Similarity}
    val vecs = Similarity.withNorm(graft.engine.Sources.embeddings(spark, sf))
    val books = Pq.pqCodebooksLocal(vecs)
    // the declarative form the fused kernel replaced (and the form the
    // DuckDB twin replays): per-subspace left-fold of 8-dim dots. NB this
    // is NOT bitwise-equal to dot(query, reconstruction) — that folds all
    // 64 products flat, a different IEEE association (measured: 379/500
    // rows differ in the last ulp) — which is exactly why the kernel must
    // reproduce the subspace-wise association.
    val composed = (0 until Pq.PqSub)
      .foldLeft(lit(0.0): org.apache.spark.sql.Column)((acc, s) =>
      acc + Native.dot(slice(col("v"), s * Pq.PqSubDim + 1, Pq.PqSubDim),
        element_at(typedlit(books(s).map(_.toSeq).toSeq),
          element_at(col("codes"), s + 1))))
    val diff = vecs
      .withColumn("codes", Pq.pqCodesCol(col("v"), books))
      .select(Pq.adcDotCol(col("v"), col("codes"), books).as("a"),
        composed.as("b"))
      .where(col("a") =!= col("b")).count()
    assert(diff === 0L)
  }

  test("length mismatch throws instead of silently truncating (dot and l2sq)") {
    // the DuckDB twins iterate a fixed dimension; a truncated fold would
    // diverge between engines on malformed input — both kernels surface it
    import spark.implicits._
    val df = Seq((Array(1.0, 2.0, 3.0), Array(1.0, 2.0))).toDF("a", "b")
    val eDot = intercept[Exception](df.select(Native.dot(col("a"), col("b"))).first())
    val eL2 = intercept[Exception](df.select(Native.l2sq(col("a"), col("b"))).first())
    def rootMsg(e: Throwable): String = {
      var t = e; while (t.getCause != null) t = t.getCause; String.valueOf(t.getMessage)
    }
    assert(rootMsg(eDot).contains("length mismatch"))
    assert(rootMsg(eL2).contains("length mismatch"))
  }

  test("ShingleMinhash == explode/groupBy minhash pipeline on every document") {
    import graft.ext.{Dedup, Text}
    val docs = graft.engine.Sources.documents(spark, sf)
    // the composed formulation the kernel replaces: shingle strings ->
    // rolling hash -> 32 min-aggregates at (doc, shingle) grain
    val hashed = Dedup.shingles(docs)
      .select(col("doc_id"), Text.rollingHash(col("shingle")).as("h"))
    val mins = Dedup.Perms.zipWithIndex.map { case ((a, b), i) =>
      min((col("h") * a + b) % Dedup.P).as(s"mh$i")
    }
    val composed = hashed.groupBy("doc_id").agg(mins.head, mins.tail: _*)
    val fused = Dedup.minhashSignatures(spark, sf)
    assert(fused.count() === composed.count())
    assert(fused.exceptAll(composed).isEmpty && composed.exceptAll(fused).isEmpty,
      "fused kernel must be bitwise-identical to the composed pipeline")
  }

  test("ShingleMinhash: short docs are null, duplicate shingles don't change minima") {
    import graft.ext.Dedup
    val df = spark.createDataFrame(Seq(
      (1L, "a b"),                 // < K tokens -> null
      (2L, "a b c"),               // one shingle
      (3L, "a b c a b c a b c"))   // same shingle repeated
    ).toDF("doc_id", "text")
    val sig = df.select(col("doc_id"),
      graft.functions.Minhash.shingleMinhash(
        graft.ext.Text.tokens(col("text")), Dedup.ShingleK, Dedup.Perms).as("mh"))
    val rows = sig.orderBy("doc_id").collect()
    assert(rows(0).isNullAt(1))
    val one = rows(1).getSeq[Long](1)
    val rep = rows(2).getSeq[Long](1)
    assert(one.size === Dedup.MinhashK)
    // doc 3's shingle set ⊇ {"a b c"} plus wrap shingles; every min ≤ doc 2's
    one.zip(rep).foreach { case (o, r) => assert(r <= o) }
  }
}
