package graft

import org.apache.spark.sql.functions._
import graft.ext.Multimodal

/** Decode-floor thread-scaling probe (SCALING_r12 evidence, VERDICT r11 #1).
  *
  * The registered `media_*_files` arms at fixture SF are dominated by
  * per-file FIXED costs (listing 50k file statuses, task setup, the pair
  * join), not decode CPU — a thread sweep over them measures overhead, the
  * same confound the r11 addendum hit with corpus synthesis. This probe
  * isolates the decode floor itself while staying on the REAL deployment
  * path end-to-end: a lake of genuine large PNGs on disk, scanned with
  * `binaryFile`, byte-balanced on the `length` METADATA column
  * ([[Multimodal.balancedBinaryFiles]] — the registered arms' exact read
  * path), fingerprinted by the registered kernel ([[Multimodal.phashOf]] —
  * real `javax.imageio` decode + full pixel scan). Few files × big rasters
  * → decode CPU ≫ fixed costs, so wall-clock vs local[N] measures whether
  * the balancer's partitioning actually fans the decode out.
  *
  * Lake: SPARK_GRAFT_PROBE_FILES (default 6000) PNGs of
  * SPARK_GRAFT_PROBE_PX² (default 512²) pixels — an 8×8 grid of solid
  * tiles at the file id's LCG levels (same generator as the fixture
  * corpora; solid tiles keep the FILES small, ~2 KB, so I/O is noise and
  * the measured work is inflate + the 262k-pixel scan per file). Written
  * once under the session warehouse (marker-skipped after), so every
  * local[N] run times a warm identical lake.
  *
  * Output: one JSON line
  * `{"metric":"decode_probe","threads":N,"files":F,"px":P,
  *   "mins":{"phash_decode":s},"passes":3}` — fold per-N runs with
  * tools/make_parallelism_artifact.py (name them parbench_<N>.json).
  */
object DecodeProbe {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nFiles = sys.env.getOrElse("SPARK_GRAFT_PROBE_FILES", "6000").toInt
    val px = sys.env.getOrElse("SPARK_GRAFT_PROBE_PX", "512").toInt
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "3").toInt
    Session.silenceAllLogs()
    val spark = Session.build(s"local[$cpus]", cpus, "graft-decodeprobe")
    import spark.implicits._

    val root = s"${spark.conf.get("spark.sql.warehouse.dir").stripSuffix("/")}" +
      s"/graft_decodeprobe_${nFiles}_$px"
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(root, "_SUCCESS")
    if (!fs.exists(marker)) {
      spark.range(nFiles).select(col("id")).as[Long].foreachPartition {
        (ids: Iterator[Long]) =>
          val pfs = new org.apache.hadoop.fs.Path(root)
            .getFileSystem(new org.apache.hadoop.conf.Configuration())
          val tile = px / 8
          ids.foreach { id =>
            val img = new java.awt.image.BufferedImage(
              px, px, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val lv = Multimodal.lcgLevels(id, 64)
            val gfx = img.createGraphics()
            var t = 0
            while (t < 64) {
              val g = lv(t)
              gfx.setColor(new java.awt.Color(g, g, g))
              gfx.fillRect((t % 8) * tile, (t / 8) * tile, tile, tile)
              t += 1
            }
            gfx.dispose()
            val out = pfs.create(
              new org.apache.hadoop.fs.Path(root, s"$id.png"), true)
            try out.write(Multimodal.PngCodec.toPng(img)) finally out.close()
          }
      }
      fs.create(marker, true).close()
    }

    def scanned = {
      val files = spark.read.format("binaryFile").load(root)
        .where(col("path").endsWith(".png"))
        .select("path", "length", "content")
      Multimodal.balancedBinaryFiles(files, Multimodal.decodeParts(spark))
        .select(
          regexp_extract(col("path"), "/(\\d+)\\.png$", 1)
            .cast("long").as("media_id"),
          lit("image").as("kind"), col("path").as("uri"),
          lit(px).as("width"), lit(px).as("height"), lit(1).as("n_frames"),
          col("content"))
        .as[Multimodal.MediaFile]
    }
    // warm-up: JVM + codegen + page cache, untimed
    Multimodal.phashOf(scanned).toDF().agg(count(lit(1))).first()
    val samples = (1 to passes).map { _ =>
      val t0 = System.nanoTime()
      // agg over the fingerprints: the decode runs for every file, nothing
      // downstream (no pair join) — this IS the floor. bit_count keeps the
      // checksum ANSI-safe (a raw SUM of full-range 64-bit hashes overflows)
      Multimodal.phashOf(scanned).toDF()
        .agg(sum(bit_count(col("phash"))), count(lit(1))).first()
      (System.nanoTime() - t0) / 1e9
    }
    spark.stop()
    println(s"""{"metric":"decode_probe","threads":$cpus,"files":$nFiles,""" +
      s""""px":$px,"passes":$passes,""" +
      s""""mins":{"phash_decode":${math.floor(samples.min * 1000) / 1000}},""" +
      s""""samples":[${samples.map(s => math.floor(s * 1000) / 1000).mkString(",")}]}""")
  }
}
