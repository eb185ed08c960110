package graft

import org.apache.spark.sql.functions._

/** Streaming-throughput surface: drives the COMPOSED corpus ingest
  * ([[graft.streaming.Streams.corpusIngest]] — PII scrub → LSH near-dup
  * gate against the growing store → LM + NB scoring, all per micro-batch)
  * over the real documents fixture split into N arrival slices, and prints
  * ONE JSON line with per-batch seconds and end-to-end docs/sec.
  *
  * This measures the real structured-streaming path (file source,
  * checkpointed foreachBatch, store probe joins against ALL history so
  * far), not a detached per-batch function call — the number is what a
  * deployment's micro-batch budget must cover. Batch parity with the batch
  * pipeline is StreamingSpec's job; this main only measures.
  *
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_STREAM_BATCHES
  * (default 8), SPARK_GRAFT_CPUS (default 4).
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_STREAM_BATCHES", "8").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // same tail contract as Bench: the JSON line(s) must be the only output
    Session.silenceAllLogs()
    val spark = Session.build(s"local[$cpus]", cpus, "graft-streambench")
    import graft.engine.Sources
    import graft.ext.Text
    import graft.streaming.Streams

    val work = java.nio.file.Files.createTempDirectory("graft_streambench").toString
    val docs = Sources.documents(spark, sfDir).cache()
    val nDocs = docs.count()
    // frozen models, trained offline on the same corpus (deployment shape:
    // the stream scores against a frozen model, it never retrains per batch)
    val (lmM, lmU) = Text.lmModelFrames(docs)
    val (nbM, nbU) = Text.nbModelFrames(docs)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$work/in"))
    val q = Streams.corpusIngest(
      Sources.parquetStream(spark, s"$work/in", "documents"),
      s"$work/store", lmM, lmU, nbM, nbU, s"$work/ckpt")
    // in-order doc_id slices (the near-dup gate's keep-lowest contract is
    // defined for in-order arrival; StreamingSpec proves the semantics)
    val ids = docs.select(min(col("doc_id")), max(col("doc_id"))).head()
    val (lo, hi) = (ids.getLong(0), ids.getLong(1))
    val step = math.max(1L, (hi - lo + nBatches) / nBatches)
    val perBatch = Vector.newBuilder[(Long, Double)]
    val t0 = System.nanoTime()
    try {
      (0 until nBatches).foreach { i =>
        val slice = docs.where(col("doc_id") >= lo + i * step &&
          col("doc_id") < lo + (i + 1) * step)
        val n = slice.count()
        slice.coalesce(1).write.mode("append").parquet(s"$work/in")
        val b0 = System.nanoTime()
        q.processAllAvailable()
        perBatch += ((n, (System.nanoTime() - b0) / 1e9))
      }
    } finally q.stop()
    val totalSecs = (System.nanoTime() - t0) / 1e9
    val batches = perBatch.result()
    // headline value = docs over SUMMED per-batch processing seconds
    // (processAllAvailable only) — total_sec additionally includes the
    // slice count + coalesce(1) parquet staging of each input batch, which
    // is harness overhead, not stream work (ADVICE r12: the old
    // nDocs/total_sec understated absolute throughput; the convention is
    // now uniform across all three arms, so cross-arm comparison holds)
    val procSecs = batches.map(_._2).sum
    val scored = spark.read.parquet(s"$work/store/scored").count()
    def r3(x: Double) = math.floor(x * 1000 + 0.5) / 1000
    val batchJson = batches.zipWithIndex.map { case ((n, s), i) =>
      s""""b$i":{"docs":$n,"sec":${r3(s)}}""" }.mkString(",")
    println(s"""{"metric":"stream_corpus_ingest","unit":"docs_per_sec",""" +
      s""""value":${r3(nDocs / procSecs)},"docs":$nDocs,"kept_scored":$scored,""" +
      s""""batches":$nBatches,"processing_sec":${r3(procSecs)},"total_sec":${r3(totalSecs)},""" +
      s""""per_batch":{$batchJson},"sf":"$sfDir"}""")

    // second arm: the MEDIA fingerprint gate (real PNG decode → aHash →
    // banded probe vs all history, the body shared by the audio/video
    // ingests) — media items/sec under the same in-order slice protocol
    val media = graft.ext.Multimodal.phashCorpus(spark, sfDir).toDF().cache()
    val nMedia = media.count()
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$work/min"))
    val mq = Streams.phashIngest(
      spark.readStream.schema(media.schema).parquet(s"$work/min"),
      s"$work/mstore", s"$work/mckpt")
    val mPerBatch = Vector.newBuilder[(Long, Double)]
    val m0 = System.nanoTime()
    try {
      (0 until nBatches).foreach { i =>
        val slice = media.where(col("media_id") >= lo + i * step &&
          col("media_id") < lo + (i + 1) * step)
        val n = slice.count()
        slice.coalesce(1).write.mode("append").parquet(s"$work/min")
        mPerBatch += ((n, {
          val b0 = System.nanoTime()
          mq.processAllAvailable()
          (System.nanoTime() - b0) / 1e9
        }))
      }
    } finally mq.stop()
    val mSecs = (System.nanoTime() - m0) / 1e9
    val mProcSecs = mPerBatch.result().map(_._2).sum
    val mKept = spark.read.parquet(s"$work/mstore/kept").count()

    // third arm: COUNT-MIN grid maintenance ([[Streams.maintainCmsGrid]] —
    // per-batch bigram counts folding cell-wise into the constant 4×64
    // state). This measures the O(batch)-work-per-micro-batch claim on the
    // real streaming path: per-batch seconds must not grow with history
    // (the state is d·w cells, never the corpus).
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$work/cin"))
    val cq = Streams.maintainCmsGrid(
      Sources.parquetStream(spark, s"$work/cin", "documents"),
      s"$work/cms", s"$work/cckpt")
    val cPerBatch = Vector.newBuilder[(Long, Double)]
    val c0 = System.nanoTime()
    try {
      (0 until nBatches).foreach { i =>
        val slice = docs.where(col("doc_id") >= lo + i * step &&
          col("doc_id") < lo + (i + 1) * step)
        val n = slice.count()
        slice.coalesce(1).write.mode("append").parquet(s"$work/cin")
        cPerBatch += ((n, {
          val b0 = System.nanoTime()
          cq.processAllAvailable()
          (System.nanoTime() - b0) / 1e9
        }))
      }
    } finally cq.stop()
    val cSecs = (System.nanoTime() - c0) / 1e9
    val cProcSecs = cPerBatch.result().map(_._2).sum
    val gridCells = graft.sources.Versioned.read(spark, s"$work/cms").count()
    spark.stop()
    val mBatchJson = mPerBatch.result().zipWithIndex.map { case ((n, s), i) =>
      s""""b$i":{"media":$n,"sec":${r3(s)}}""" }.mkString(",")
    println(s"""{"metric":"stream_phash_ingest","unit":"media_per_sec",""" +
      s""""value":${r3(nMedia / mProcSecs)},"media":$nMedia,"kept":$mKept,""" +
      s""""batches":$nBatches,"processing_sec":${r3(mProcSecs)},"total_sec":${r3(mSecs)},""" +
      s""""per_batch":{$mBatchJson},"sf":"$sfDir"}""")
    val cBatchJson = cPerBatch.result().zipWithIndex.map { case ((n, s), i) =>
      s""""b$i":{"docs":$n,"sec":${r3(s)}}""" }.mkString(",")
    println(s"""{"metric":"stream_cms_fold","unit":"docs_per_sec",""" +
      s""""value":${r3(nDocs / cProcSecs)},"docs":$nDocs,"grid_cells":$gridCells,""" +
      s""""batches":$nBatches,"processing_sec":${r3(cProcSecs)},"total_sec":${r3(cSecs)},""" +
      s""""per_batch":{$cBatchJson},"sf":"$sfDir"}""")
    System.out.flush()
  }
}
