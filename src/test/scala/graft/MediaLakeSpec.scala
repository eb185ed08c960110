package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.ext.{MediaLake, Multimodal}

/** The real-file media lake ([[graft.ext.MediaLake]]) + the sampling-free
  * byte balancer (VERDICT r11 #1): the binaryFile deployment path must be
  * bit-identical to the synthesized corpora, the balancer must be a plain
  * hash exchange (NO RangePartitioner sampling pass — the measured r11
  * scale liability), and the partitioning must spread bytes. */
class MediaLakeSpec extends SparkSpec {

  test("binaryFile-scanned lake round-trips the corpora: ids and bytes") {
    val root = MediaLake.sessionLake(spark, sf)
    Multimodal.dupModalities.foreach { case (m, corpus, _) =>
      val got = MediaLake.scan(spark, root, m)
        .select(col("media_id"), md5(col("content")).as("h"))
        .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
      val want = corpus(spark, sf).toDF()
        .select(col("media_id"), md5(col("content")).as("h"))
        .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
      assert(got.length === want.length, s"$m file count")
      assert(got === want, s"$m bytes diverged between lake files and corpus")
    }
  }

  test("files-scanned near-dup arms are bit-identical to the synthesized twins") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("media_id_a", "media_id_b").collect().map(_.toSeq).toSeq
    assert(rows(MediaLake.phashPairsFiles(spark, sf))
      === rows(Multimodal.phashPairs(spark, sf)))
    assert(rows(MediaLake.audioDupPairsFiles(spark, sf))
      === rows(Multimodal.audioDupPairs(spark, sf)))
    assert(rows(MediaLake.videoDupPairsFiles(spark, sf))
      === rows(Multimodal.videoDupPairs(spark, sf)))
  }

  test("packed lake: blob-parquet fingerprints are bit-identical to the " +
      "binaryFile scan's, and the packed read plan has NO exchange before " +
      "the decode leaf (the pack laid the bytes out; a shuffle would move " +
      "them again)") {
    val lake = MediaLake.sessionLake(spark, sf)
    val packed = MediaLake.sessionPacked(spark, sf)
    Multimodal.dupModalities.foreach { case (m, _, fp) =>
      def rows(ds: org.apache.spark.sql.Dataset[Multimodal.PhashRow]) =
        ds.collect().map(r => (r.media_id, r.phash)).sortBy(_._1)
      val viaFiles = rows(fp(MediaLake.scan(spark, lake, m)))
      val viaPack = rows(fp(MediaLake.packedScan(spark, packed, m)))
      assert(viaPack.length === viaFiles.length, s"$m fingerprint count")
      assert(viaPack === viaFiles, s"$m fingerprints diverged through pack")
    }
    val plan = Multimodal.phashOf(MediaLake.packedScan(spark, packed, "image"))
      .queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
    assert(!plan.contains("Exchange"),
      "packed decode must be exchange-free:\n" + plan.take(1200))
  }

  test("the byte balancer is a plain hash exchange — no RangePartitioner " +
      "sampling pass anywhere in the plan (the r11 double-evaluation bug)") {
    val planSynth = Multimodal.balancedByBytes(
      Multimodal.phashCorpus(spark, sf), 8)
      .queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
    assert(planSynth.contains("Exchange hashpartitioning"),
      "expected a hash exchange:\n" + planSynth.take(800))
    assert(!planSynth.toLowerCase.contains("rangepartitioning"),
      "balancer must not range-partition (sampling pass):\n" + planSynth.take(800))
    val root = MediaLake.sessionLake(spark, sf)
    val files = spark.read.format("binaryFile").load(s"$root/image")
      .select("path", "length", "content")
    val planFiles = Multimodal.balancedBinaryFiles(files, 8)
      .queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
    assert(planFiles.contains("Exchange hashpartitioning") &&
      !planFiles.toLowerCase.contains("rangepartitioning"),
      "binaryFile balancer must hash-partition:\n" + planFiles.take(800))
  }

  test("the balancer spreads bytes: requested partition count, none empty, " +
      "no partition grossly over mean") {
    val parts = 8
    val sizes = Multimodal.balancedByBytes(Multimodal.phashCorpus(spark, sf), parts)
      .toDF().select(length(col("content")).cast("long").as("n"))
      .rdd.mapPartitions(it => Iterator(it.map(_.getLong(0)).sum))
      .collect()
    assert(sizes.length === parts)
    assert(sizes.forall(_ > 0L), s"empty partition in ${sizes.toSeq}")
    val mean = sizes.sum.toDouble / parts
    assert(sizes.max <= mean * 3,
      s"byte skew: max ${sizes.max} vs mean $mean in ${sizes.toSeq}")
  }

  test("deterministic assignment: two scans partition identically (no " +
      "sampled bounds to drift between runs)") {
    def keyOf(parts: Int) = Multimodal.balancedByBytes(
        Multimodal.audioDupCorpus(spark, sf), parts).toDF()
      .select(col("media_id"), spark_partition_id().as("p"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1).toSeq
    assert(keyOf(8) === keyOf(8))
  }
}
