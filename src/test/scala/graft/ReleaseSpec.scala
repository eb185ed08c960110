package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.engine.{Pipeline, Sources}
import graft.ext.{Pii, Sampling, Text}
import graft.streaming.Streams

/** The end-to-end INCREMENTAL corpus release (VERDICT r10 #8 —
  * [[graft.streaming.Streams.releaseIngest]]): a multi-batch streamed
  * release must equal the from-scratch batch pipeline's
  * `corpus_release_manifest` bit-for-bit, each batch must append only its
  * own release partition (O(delta) versioning), and a crash-replayed batch
  * must rewrite, not duplicate. */
class ReleaseSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_id", "lang", "source", "n_contaminated", "contaminated")
      .orderBy("doc_id").collect().map(_.toString).toSeq

  test("two-batch streamed release ≡ from-scratch pipeline release, " +
      "bit-for-bit; versions are O(delta); replay rewrites") {
    // the from-scratch truth: the full batch pipeline's release manifest
    val out = Files.createTempDirectory("graft_rel_pipe").toString
    Pipeline.runCorpusPipeline(spark, sf, out)
    val want = rows(spark.read.parquet(s"$out/corpus_release_manifest"))
    assert(want.nonEmpty, "pipeline released nothing: vacuous")

    // frozen inputs — the scheduled-job half: classifier trained on the
    // scrubbed corpus, eval suite = the corpus's holdout split (both
    // EXACTLY what the batch pipeline derives internally)
    val docs = Sources.documents(spark, sf).cache()
    val scrubbed = Pii.redactedOf(docs)
      .select(col("doc_id"), col("lang"), col("source"),
        col("redacted_text").as("text")).cache()
    val (nbM, nbU) = Text.nbModelFrames(scrubbed)
    val evalDocs = scrubbed.where(
      Sampling.mixHash(col("doc_id")) % 100 >= lit(100 - Text.ContamEvalPct))

    // stream the RAW docs in two in-order batches through the public API
    val dir = Files.createTempDirectory("graft_rel_stream").toString
    val store = s"$dir/store"
    Files.createDirectories(java.nio.file.Paths.get(s"$dir/in"))
    val q = Streams.releaseIngest(
      Sources.parquetStream(spark, s"$dir/in", "documents"),
      sf, store, nbM, nbU, evalDocs, s"$dir/ckpt")
    try {
      Seq(col("doc_id") < 250, col("doc_id") >= 250).foreach { slice =>
        docs.where(slice).coalesce(1).write.mode("append").parquet(s"$dir/in")
        q.processAllAvailable()
      }
    } finally q.stop()

    val got = rows(Streams.releaseManifest(spark, store))
    assert(got.size === want.size,
      s"streamed release ${got.size} rows vs batch ${want.size}")
    assert(got === want)

    // versioning: two versions, deltas sum to the total, and version 0 is
    // exactly batch 0's contribution (an earlier version never rewrites)
    val versions = Streams.releaseVersions(spark, store)
      .orderBy("version").collect()
      .map(r => r.getAs[Long]("version") -> r.getAs[Long]("n_released"))
    assert(versions.map(_._1).toSeq === Seq(0L, 1L))
    assert(versions.map(_._2).sum === want.size.toLong)
    val v0 = rows(Streams.releaseManifest(spark, store, upTo = Some(0L)))
    assert(v0.size.toLong === versions.head._2)
    // batch 0 carried ids < 250, so version 0 is the doc_id-sorted prefix
    assert(v0 === got.take(v0.size), "version 0 is not a prefix of the release")

    // crash-replay of the last batch rewrites its partitions byte-for-byte
    val grams = Text.contamGrams(evalDocs).select("g").distinct()
    Streams.ingestReleaseBatch(docs.where(col("doc_id") >= 250),
      sf, store, 1L, nbM, nbU, grams)
    assert(rows(Streams.releaseManifest(spark, store)) === got,
      "replaying batch 1 changed the release")

    // retention (VERDICT r11 #8): vacuum version 0 — the current manifest
    // and every RETAINED upTo are bit-identical (consolidation moves rows,
    // never drops them), the version LOG survives in full, time travel at
    // the floor ends loudly, and the latest version is refused
    Streams.vacuumReleases(spark, store, upTo = 0L)
    assert(rows(Streams.releaseManifest(spark, store)) === got,
      "vacuum changed the current release")
    assert(rows(Streams.releaseManifest(spark, store, upTo = Some(1L))) === got,
      "vacuum changed a retained version's manifest")
    val vAfter = Streams.releaseVersions(spark, store)
      .orderBy("version").collect()
      .map(r => r.getAs[Long]("version") -> r.getAs[Long]("n_released"))
    assert(vAfter.toSeq === versions.toSeq, "vacuum changed the version log")
    intercept[IllegalArgumentException] {
      Streams.releaseManifest(spark, store, upTo = Some(0L)).collect()
    }
    intercept[IllegalArgumentException] {
      Streams.vacuumReleases(spark, store, upTo = 1L)
    }
    val fsr = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fsr.exists(new org.apache.hadoop.fs.Path(s"$store/release/batch=0")),
      "vacuumed partition still on disk")
    assert(fsr.exists(new org.apache.hadoop.fs.Path(s"$store/release/batch=-1")),
      "consolidated partition missing")
    docs.unpersist(); scrubbed.unpersist()
  }
}
