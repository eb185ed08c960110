package graft

import java.nio.file.Files
import org.apache.spark.sql.Row
import graft.ext.{FpStore, Multimodal}

/** The persisted media-fingerprint store ([[graft.ext.FpStore]]) — the
  * VERDICT r10 #6 acceptance bars: the store-backed cross-modal audit is
  * bit-identical to the decode-everything report, a warm store decodes
  * ZERO bytes (proven by decode counter, not plan-reading), compaction
  * changes nothing, and a missing store FAILS instead of reporting a
  * dup-free corpus. */
class FingerprintStoreSpec extends SparkSpec {

  private def key(r: Row) = (r.getAs[Long]("doc_id"),
    r.getAs[Boolean]("text_dup"), r.getAs[Boolean]("image_dup"),
    r.getAs[Boolean]("audio_dup"), r.getAs[Boolean]("video_dup"),
    r.getAs[Boolean]("any_dup"))

  private def report(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("doc_id").collect().map(key).toSeq

  test("store-backed audit ≡ decode-everything report, bit-for-bit") {
    val got = report(Multimodal.crossModalDupsIndexed(spark, sf))
    val want = report(Multimodal.crossModalDups(spark, sf))
    assert(want.exists(_._6), "fixture has no cross-modal dups: vacuous")
    assert(got === want)
  }

  test("a warm store decodes ZERO bytes: re-ingest is an empty delta and " +
      "the audit itself never touches a codec") {
    val store = Files.createTempDirectory("graft_fpstore").toString
    FpStore.build(spark, store, sf).collect()
    val before = Multimodal.fpDecodeOps.get()
    // second ingest: every media id is already fingerprinted → the
    // anti-join leaves nothing for the decode leaf
    val reingest = FpStore.ingestDelta(spark, store, sf).collect()
    assert(reingest.isEmpty, s"warm re-ingest decoded: ${reingest.toSeq}")
    // the audit: all three media arms ride the fingerprint table
    val audit = Multimodal.crossModalDupsFromStore(
      spark, graft.engine.Sources.documents(spark, sf), store)
    assert(audit.where(org.apache.spark.sql.functions.col("any_dup"))
      .count() > 0)
    assert(Multimodal.fpDecodeOps.get() === before,
      s"warm-store audit ran ${Multimodal.fpDecodeOps.get() - before} decodes")
  }

  test("compaction consolidates batches without changing the audit") {
    val store = Files.createTempDirectory("graft_fpstore_c").toString
    FpStore.build(spark, store, sf).collect()
    val docs = graft.engine.Sources.documents(spark, sf)
    val before = report(Multimodal.crossModalDupsFromStore(spark, docs, store))
    FpStore.compact(spark, store, upTo = 0L)
    assert(report(Multimodal.crossModalDupsFromStore(spark, docs, store))
      === before)
  }

  test("auditing a missing store fails loudly instead of reporting dup-free") {
    val bad = Files.createTempDirectory("graft_fpstore_none").toString + "/nope"
    val e = intercept[IllegalArgumentException] {
      FpStore.fingerprints(spark, bad, "image").count()
    }
    assert(e.getMessage.contains("FpStore not found"))
  }
}
