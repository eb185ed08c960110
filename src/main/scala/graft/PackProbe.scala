package graft

/** Byte-normalized packed-vs-files decode comparison (round-13 open
  * thread: per-query exponents confound blob-size mix with IO shape; MB/s
  * through the SAME fingerprint kernel is the fixture-independent form).
  * For each modality, times the full fingerprint pass (scan → decode →
  * hash, the registered kernels) over (a) the binaryFile lake (one file
  * per blob — per-file open cost) and (b) the packed blob-parquet form
  * ([[graft.ext.MediaLake.pack]]), interleaved A/B in one session, and
  * reports min seconds and MB/s against the modality's total blob bytes.
  *
  * Env: SPARK_GRAFT_SF_DIR (default target/sf1 — the interesting scale),
  * SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_PROBE_PASSES (default 2).
  */
object PackProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/target/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val passes = sys.env.getOrElse("SPARK_GRAFT_PROBE_PASSES", "2").toInt
    Session.silenceAllLogs()
    val spark = Session.build(s"local[$cpus]", cpus, "graft-pack-probe")
    import graft.ext.{MediaLake, Multimodal}
    val lake = MediaLake.sessionLake(spark, sfDir)
    val packed = MediaLake.sessionPacked(spark, sfDir)
    def r3(x: Double) = math.floor(x * 1000 + 0.5) / 1000
    val arms = Multimodal.dupModalities.flatMap { case (m, _, fp) =>
      // sum over zero rows is NULL (ADVICE r13: an empty modality must be
      // annotated, not NPE the whole JSON line)
      val bytes = Option(MediaLake.packedScan(spark, packed, m).toDF()
        .agg(org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.length(
            org.apache.spark.sql.functions.col("content"))))
        .head().get(0)).map(_.asInstanceOf[Long]).getOrElse(0L)
      if (bytes == 0L) Seq(s""""$m":{"blob_mb":0,"empty":true}""") else {
      def time(viaPack: Boolean): Double = {
        val src = if (viaPack) MediaLake.packedScan(spark, packed, m)
                  else MediaLake.scan(spark, lake, m)
        val t0 = System.nanoTime()
        // bounded checksum: raw sum(phash) overflows ANSI long arithmetic
        fp(src).toDF().selectExpr("count(*)", "sum(phash % 1000003)").collect()
        (System.nanoTime() - t0) / 1e9
      }
      time(viaPack = true); time(viaPack = false) // warm both paths
      val (pk, fl) = (Vector.newBuilder[Double], Vector.newBuilder[Double])
      (1 to passes).foreach { _ => pk += time(true); fl += time(false) }
      // a pass that rounds to 0 would divide MB/s by zero — floor at 1ms
      val (pMin, fMin) = (math.max(pk.result().min, 1e-3),
        math.max(fl.result().min, 1e-3))
      val mb = bytes / 1e6
      Seq(s""""$m":{"blob_mb":${r3(mb)},"packed_min_sec":${r3(pMin)},""" +
        s""""files_min_sec":${r3(fMin)},"packed_mb_per_sec":${r3(mb / pMin)},""" +
        s""""files_mb_per_sec":${r3(mb / fMin)},""" +
        s""""packed_speedup":${r3(fMin / pMin)}}""")
      }
    }
    println(s"""{"metric":"pack_probe_mb_per_sec","passes":$passes,""" +
      s""""modalities":{${arms.mkString(",")}},"sf":"$sfDir"}""")
    System.out.flush()
    spark.stop()
  }
}
