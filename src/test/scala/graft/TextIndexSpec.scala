package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.ext.{Text, TextIndex}

/** The persisted BM25 index ([[graft.ext.TextIndex]]): build/search parity
  * with the batch operator, split-ingest equivalence (postings + additive
  * stats fold), replay idempotence, atomic compaction, and the
  * bucketed-store plan shape (oracle parity of `text_bm25_indexed` itself
  * is Verify's job — it shares the batch operator's SQL twin). */
class TextIndexSpec extends SparkSpec {

  private def docsOf(dir: String) = graft.engine.Sources.documents(spark, dir)

  private def store(): String =
    Files.createTempDirectory("graft_tidx").toString + "/store"

  private def key(r: org.apache.spark.sql.Row) = (
    r.getAs[Long]("qid"), r.getAs[Int]("rank"), r.getAs[Long]("doc_id"),
    r.getAs[Long]("score_mn"), r.getAs[Long]("n_terms"))

  private def batchWant(dir: String) =
    Text.bm25TopKOf(docsOf(dir), Text.bm25FixtureQueries(docsOf(dir)))
      .collect().map(key).toSeq.sorted

  test("indexed search reproduces the batch BM25 operator bit-for-bit") {
    val got = TextIndex.bm25Indexed(spark, sf).collect().map(key).toSeq.sorted
    assert(got.nonEmpty)
    assert(got === batchWant(sf))
  }

  test("index-backed RM3 reproduces the batch RM3 operator bit-for-bit " +
      "(expansion mass from SUM(tf) over postings == batch token counts)") {
    val docs = docsOf(sf)
    val queries = Text.bm25BoundedQueries(docs)
    val want = Text.bm25Rm3Of(docs, queries).collect().map(key).toSeq.sorted
    val got = TextIndex.bm25Rm3Indexed(spark, sf).collect().map(key).toSeq.sorted
    assert(got.nonEmpty)
    assert(got === want)
  }

  test("search of a nonexistent store path throws instead of creating an " +
      "empty store and returning zero rows") {
    val ghost = store() // never built
    val e = intercept[IllegalArgumentException] {
      TextIndex.search(spark, ghost, Text.bm25FixtureQueries(docsOf(sf)))
    }
    assert(e.getMessage.contains("not found"))
    val fs = new org.apache.hadoop.fs.Path(ghost)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$ghost/postings")),
      "failed search must not create store directories")
  }

  test("split ingest equals bulk load: postings and (N, T) stats fold " +
      "additively, so df/idf and length norms come out identical") {
    val s = store()
    val all = docsOf(sf)
    TextIndex.build(spark, s, all.where(col("doc_id") < 250))
    TextIndex.ingest(spark, s, all.where(col("doc_id") >= 250), batchId = 1L)
    val got = TextIndex.search(spark, s, Text.bm25FixtureQueries(all))
      .collect().map(key).toSeq.sorted
    assert(got.nonEmpty)
    assert(got === batchWant(sf))
  }

  test("replaying an ingest batch rewrites its partitions, never duplicates") {
    val s = store()
    val all = docsOf(sf)
    TextIndex.build(spark, s, all.where(col("doc_id") < 250))
    TextIndex.ingest(spark, s, all.where(col("doc_id") >= 250), batchId = 1L)
    val before = TextIndex.search(spark, s, Text.bm25FixtureQueries(all))
      .collect().map(key).toSeq.sorted
    // crash-replay: the same delta arrives again under the same batch id
    TextIndex.ingest(spark, s, all.where(col("doc_id") >= 250), batchId = 1L)
    val after = TextIndex.search(spark, s, Text.bm25FixtureQueries(all))
      .collect().map(key).toSeq.sorted
    assert(after === before, "replay changed the index")
    // the additive stats did not double-count either
    val n = spark.table(TextIndex.statsTable(s)).agg(sum("n")).first().getLong(0)
    assert(n === all.count(), s"stats double-counted: $n")
  }

  test("compaction folds BOTH tables behind one atomic floor; search " +
      "bit-unchanged; dead partitions swept") {
    val s = store()
    val all = docsOf(sf)
    TextIndex.build(spark, s, all.where(col("doc_id") < 150))
    TextIndex.ingest(spark, s, all.where(col("doc_id") >= 150 &&
      col("doc_id") < 350), batchId = 1L)
    TextIndex.ingest(spark, s, all.where(col("doc_id") >= 350), batchId = 2L)
    val before = TextIndex.search(spark, s, Text.bm25FixtureQueries(all))
      .collect().map(key).toSeq.sorted
    TextIndex.compact(spark, s, upTo = 2L)
    val after = TextIndex.search(spark, s, Text.bm25FixtureQueries(all))
      .collect().map(key).toSeq.sorted
    assert(after === before, "compaction changed search results")
    val fs = new org.apache.hadoop.fs.Path(s)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    for (sub <- Seq("postings", "stats")) {
      val dirs = fs.listStatus(new org.apache.hadoop.fs.Path(s"$s/$sub"))
        .map(_.getPath.getName).filter(_.startsWith("batch=")).toSeq
      assert(dirs === Seq("batch=-1"),
        s"$sub partitions not folded to the compacted generation: $dirs")
    }
  }

  test("streamed document ingest equals bulk indexing: search bit-identical, " +
      "per-batch partitions, stats additive") {
    val s = store()
    val all = docsOf(sf)
    TextIndex.build(spark, s, all.where(col("doc_id") < 200))
    val dir = Files.createTempDirectory("graft_tidx_stream").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$dir/in"))
    val q = graft.streaming.Streams.bm25IndexIngest(
      graft.engine.Sources.parquetStream(spark, s"$dir/in", "documents"),
      s, s"$dir/ckpt")
    try {
      Seq(col("doc_id") >= 200 && col("doc_id") < 400,
          col("doc_id") >= 400).foreach { slice =>
        all.where(slice).coalesce(1).write.mode("append").parquet(s"$dir/in")
        q.processAllAvailable()
      }
    } finally q.stop()
    val got = TextIndex.search(spark, s, Text.bm25FixtureQueries(all))
      .collect().map(key).toSeq.sorted
    assert(got.nonEmpty)
    assert(got === batchWant(sf))
    // bulk load and each micro-batch keep their own replay partitions
    val batches = spark.table(TextIndex.postingsTable(s))
      .select("batch").distinct().collect().map(_.getLong(0)).toSet
    assert(batches === Set(0L, 1L, 2L))
    // the additive stats saw every document exactly once
    val n = spark.table(TextIndex.statsTable(s)).agg(sum("n")).first().getLong(0)
    assert(n === all.count())
  }

  test("search reads the postings store bucketed: no exchange on the " +
      "corpus side of the term join") {
    val s = store()
    TextIndex.build(spark, s, docsOf(sf))
    val tbl = TextIndex.postingsTable(s)
    // probe side: an unbucketed copy of the same term keys; force SMJ so
    // only the probe side CAN shuffle (broadcast also leaves the store
    // exchange-free, but SMJ is the shape at index scale)
    val probes = spark.read.parquet(s"$s/postings").drop("batch")
      .select(col("token"), col("doc_id").as("qid"))
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = probes.join(spark.table(tbl).drop("batch"), "token")
      val p = joined.queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode)
      assert(p.contains("SelectedBucketsCount"),
        "postings scan must be bucketed:\n" + p.take(1200))
      val shuffles = "Exchange hashpartitioning".r.findAllIn(p).length
      assert(shuffles === 1,
        s"only the query side may shuffle, got $shuffles:\n${p.take(1500)}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
  }
}
