package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.ext.{Similarity, VectorIndex}

/** Raw embeddings row shape for streaming the fixture through MemoryStream. */
case class EmbRow(vec_id: Long, embedding: Seq[Float])

/** The persisted ANN index ([[graft.ext.VectorIndex]]): build/search parity
  * with the recompute-everything operator, incremental-ingest equivalence
  * under the frozen quantizer, replay idempotence, and the bucketed-store
  * plan shape (oracle parity of `sim_ann_index` itself is Verify's job). */
class VectorIndexSpec extends SparkSpec {

  private def vecsOf(dir: String) =
    Similarity.withNorm(graft.engine.Sources.embeddings(spark, dir))

  private def store(): String =
    Files.createTempDirectory("graft_vidx").toString + "/store"

  test("indexed self-search reproduces annIvfHier bit-for-bit") {
    val got = VectorIndex.annIndexed(spark, sf)
      .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
    val want = Similarity.annIvfHier(spark, sf)
      .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
    assert(got.nonEmpty)
    assert(got === want)
  }

  test("incremental ingest equals bulk load under the frozen quantizer") {
    val s = store()
    val all = vecsOf(sf).persist()
    val a = all.where(col("vec_id") % 2 === 0)
    val b = all.where(col("vec_id") % 2 === 1)
    VectorIndex.build(spark, s, a)
    VectorIndex.ingest(spark, s, b, batchId = 1L)
    val tbl = VectorIndex.listsTable(s)
    val got = spark.table(tbl).select("cl", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // expected: one assignment pass over the WHOLE corpus through the same
    // frozen store model — build-then-ingest must land the identical lists
    val want = VectorIndex.assignment(spark, s, all)
      .select("cl", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === want)
    assert(got.size === all.count())
    // and the ingested half is searchable: every query gets neighbors
    val hits = VectorIndex.search(spark, s, all)
      .select(countDistinct("query_id")).first().getLong(0)
    assert(hits === all.count())
    all.unpersist()
  }

  test("replaying an ingest batch rewrites its partition, never duplicates") {
    val s = store()
    val all = vecsOf(sf).persist()
    val a = all.where(col("vec_id") < 250)
    val b = all.where(col("vec_id") >= 250)
    VectorIndex.build(spark, s, a)
    VectorIndex.ingest(spark, s, b, batchId = 1L)
    val tbl = VectorIndex.listsTable(s)
    val once = spark.table(tbl).count()
    VectorIndex.ingest(spark, s, b, batchId = 1L) // crash-replay of batch 1
    assert(spark.table(tbl).count() === once)
    assert(once === all.count())
    all.unpersist()
  }

  test("streamed vector ingest equals one batch assignment pass") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val s = store()
    val all = vecsOf(sf).persist()
    VectorIndex.build(spark, s, all.where(col("vec_id") < 250))
    val rows = graft.engine.Sources.embeddings(spark, sf)
      .where(col("vec_id") >= 250)
      .select("vec_id", "embedding").as[EmbRow].collect().toSeq
    val (b1, b2) = rows.partition(_.vec_id < 375)
    val in = MemoryStream[EmbRow]
    val ck = Files.createTempDirectory("graft_vidx_ck").toString
    val q = graft.streaming.Streams.vectorIngest(in.toDF(), s, ck)
    try {
      in.addData(b1); q.processAllAvailable()
      in.addData(b2); q.processAllAvailable()
    } finally q.stop()
    val tbl = VectorIndex.listsTable(s)
    val got = spark.table(tbl).select("cl", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = VectorIndex.assignment(spark, s, all).select("cl", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === want)
    // bulk load and each micro-batch keep their own replay partitions
    val batches = spark.table(tbl).select("batch").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(batches === Set(0L, 1L, 2L))
    all.unpersist()
  }

  test("compaction folds partitions behind an atomic floor; dead-batch replays stay invisible") {
    val s = store()
    val all = vecsOf(sf).persist()
    val a = all.where(col("vec_id") < 200)
    val b1 = all.where(col("vec_id") >= 200 && col("vec_id") < 350)
    val b2 = all.where(col("vec_id") >= 350)
    VectorIndex.build(spark, s, a)
    VectorIndex.ingest(spark, s, b1, batchId = 1L)
    VectorIndex.ingest(spark, s, b2, batchId = 2L)
    val before = VectorIndex.search(spark, s, all).orderBy("query_id", "rank")
      .collect().map(_.toSeq).toSeq
    VectorIndex.compact(spark, s, upTo = 2L)
    // one live partition, every row intact, search bit-identical
    val live = VectorIndex.liveLists(spark, s)
    assert(live.select("batch").distinct().collect().map(_.getLong(0)).toSet === Set(-1L))
    assert(live.count() === all.count())
    assert(VectorIndex.search(spark, s, all).orderBy("query_id", "rank")
      .collect().map(_.toSeq).toSeq === before)
    // a crash-replay of a compacted-away batch id lands below the floor:
    // unreadable, search unmoved
    VectorIndex.ingest(spark, s, b1, batchId = 1L)
    assert(VectorIndex.liveLists(spark, s).count() === all.count())
    assert(VectorIndex.search(spark, s, all).orderBy("query_id", "rank")
      .collect().map(_.toSeq).toSeq === before)
    // the next compact sweeps the dead replay dir and is idempotent
    VectorIndex.compact(spark, s, upTo = 2L)
    assert(VectorIndex.liveLists(spark, s).select("batch").distinct()
      .collect().map(_.getLong(0)).toSet === Set(-2L))
    assert(VectorIndex.liveLists(spark, s).count() === all.count())
    val dirs = new java.io.File(s"$s/lists").listFiles()
      .map(_.getName).filter(_.startsWith("batch=")).toSet
    assert(dirs === Set("batch=-2"), s"dead dirs must be swept, got $dirs")
    all.unpersist()
  }

  test("PQ-indexed self-search reproduces annIvfPq bit-for-bit") {
    val got = graft.ext.VectorIndexPq.annIndexedPq(spark, sf)
      .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
    val want = graft.ext.Pq.annIvfPq(spark, sf)
      .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
    assert(got.nonEmpty)
    assert(got === want)
  }

  test("search-only arm: build happens at most once per session, results bit-equal") {
    import graft.ext.VectorIndexPq
    val first = VectorIndexPq.annIndexedPqSearch(spark, sf)
      .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
    // the store's books artifact is written only by build(); its mtime
    // pins whether a second search triggered a rebuild
    val booksDir = new java.io.File(new java.net.URI(
      VectorIndexPq.storeFor(spark, sf)).getPath + "/books")
    assert(booksDir.exists(), s"store books missing at $booksDir")
    val mtime = booksDir.listFiles().map(_.lastModified()).max
    val second = VectorIndexPq.annIndexedPqSearch(spark, sf)
      .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
    assert(booksDir.listFiles().map(_.lastModified()).max === mtime,
      "second search must NOT rebuild the store")
    assert(first === second && first.nonEmpty)
    // and the search output is the same frame annIndexedPq verifies
    val full = VectorIndexPq.annIndexedPq(spark, sf)
      .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
    assert(first === full)
  }

  test("PQ store: lists carry codes+rnorm (no vectors); the durable payload cut is real") {
    import graft.ext.VectorIndexPq
    val s = store()
    VectorIndexPq.build(spark, s, vecsOf(sf))
    val listCols = spark.table(VectorIndexPq.listsTable(s)).schema.fieldNames.toSet
    assert(listCols === Set("cl", "neighbor_id", "codes", "rnorm", "batch"),
      s"PQ lists must carry codes, not vectors: $listCols")
    // the codes column really is PqSub small ints, not a disguised vector
    val row = spark.table(VectorIndexPq.listsTable(s)).select("codes").head()
    val codes = row.getSeq[Int](0)
    assert(codes.length === graft.ext.Pq.PqSub)
    assert(codes.forall(c => c >= 1 && c <= graft.ext.Pq.PqCodes))
    // full vectors live ONLY in the rerank table
    val vecCols = spark.table(VectorIndexPq.vecsTable(s)).schema.fieldNames.toSet
    assert(vecCols === Set("vec_id", "v", "norm", "batch"))
  }

  test("PQ ingest equals bulk load under frozen model+books; replay rewrites, never duplicates") {
    import graft.ext.VectorIndexPq
    val s = store()
    val all = vecsOf(sf).persist()
    val a = all.where(col("vec_id") % 2 === 0)
    val b = all.where(col("vec_id") % 2 === 1)
    VectorIndexPq.build(spark, s, a)
    VectorIndexPq.ingest(spark, s, b, batchId = 1L)
    val n = all.count()
    assert(spark.table(VectorIndexPq.listsTable(s)).count() === n)
    assert(spark.table(VectorIndexPq.vecsTable(s)).count() === n)
    // crash-replay of batch 1: both tables rewrite their partition
    VectorIndexPq.ingest(spark, s, b, batchId = 1L)
    assert(spark.table(VectorIndexPq.listsTable(s)).count() === n)
    assert(spark.table(VectorIndexPq.vecsTable(s)).count() === n)
    // and the folded-in half is searchable: every query gets neighbors
    val hits = VectorIndexPq.search(spark, s, all)
      .select(countDistinct("query_id")).first().getLong(0)
    assert(hits === n)
    all.unpersist()
  }

  test("PQ compaction folds BOTH tables behind one atomic floor; search bit-unchanged") {
    import graft.ext.VectorIndexPq
    val s = store()
    val all = vecsOf(sf).persist()
    VectorIndexPq.build(spark, s, all.where(col("vec_id") < 250))
    VectorIndexPq.ingest(spark, s,
      all.where(col("vec_id") >= 250), batchId = 1L)
    val before = VectorIndexPq.search(spark, s, all).orderBy("query_id", "rank")
      .collect().map(_.toSeq).toSeq
    VectorIndexPq.compact(spark, s, upTo = 1L)
    for (live <- Seq(VectorIndexPq.liveLists(spark, s), VectorIndexPq.liveVecs(spark, s))) {
      assert(live.select("batch").distinct().collect()
        .map(_.getLong(0)).toSet === Set(-1L))
      assert(live.count() === all.count())
    }
    assert(VectorIndexPq.search(spark, s, all).orderBy("query_id", "rank")
      .collect().map(_.toSeq).toSeq === before)
    all.unpersist()
  }

  test("PQ search plan: neither store side exchanges — lists bucketed on cl, " +
    "vectors bucketed on vec_id") {
    import graft.ext.VectorIndexPq
    val s = store()
    VectorIndexPq.build(spark, s, vecsOf(sf))
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // probe join: unbucketed probe frame vs the bucketed lists table
      val probes = spark.read.parquet(s"$s/lists").drop("batch")
        .select(col("cl"), col("neighbor_id").as("query_id"))
      val probeJoin = probes.join(
        spark.table(VectorIndexPq.listsTable(s)).drop("batch"), "cl")
      val p1 = probeJoin.queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode)
      assert(p1.contains("SelectedBucketsCount"),
        "PQ lists scan must be bucketed:\n" + p1.take(1200))
      assert("Exchange hashpartitioning".r.findAllIn(p1).length === 1,
        s"only the probe side may shuffle:\n${p1.take(1500)}")
      // rerank fetch: unbucketed candidate frame vs the bucketed vector table
      val cands = spark.read.parquet(s"$s/lists").drop("batch")
        .select(col("neighbor_id"), col("cl").as("query_id"))
      val fetchJoin = cands.join(
        spark.table(VectorIndexPq.vecsTable(s)).drop("batch")
          .withColumnRenamed("vec_id", "neighbor_id"), "neighbor_id")
      val p2 = fetchJoin.queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode)
      assert(p2.contains("SelectedBucketsCount"),
        "PQ vector scan must be bucketed:\n" + p2.take(1200))
      assert("Exchange hashpartitioning".r.findAllIn(p2).length === 1,
        s"only the candidate side may shuffle:\n${p2.take(1500)}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
  }

  test("probe join reads the store bucketed: no exchange on the corpus side") {
    val s = store()
    VectorIndex.build(spark, s, vecsOf(sf))
    val tbl = VectorIndex.listsTable(s)
    // probe side: a plain (unbucketed) parquet read of the same rows, so
    // ONLY it can satisfy the join's distribution by shuffling; force the
    // sort-merge path — broadcast also leaves the store exchange-free, but
    // SMJ is the shape that matters once the index outgrows broadcast range
    val probes = spark.read.parquet(s"$s/lists").drop("batch")
      .select(col("cl"), col("neighbor_id").as("query_id"),
        col("vb").as("va"), col("nb").as("na"))
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = probes.join(spark.table(tbl).drop("batch"), "cl")
      val p = joined.queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode)
      assert(p.contains("SelectedBucketsCount"),
        "store scan must be bucketed:\n" + p.take(1200))
      val shuffles = "Exchange hashpartitioning".r.findAllIn(p).length
      assert(shuffles === 1,
        s"only the query side may shuffle, got $shuffles:\n${p.take(1500)}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
  }
}
