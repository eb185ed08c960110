package graft.ext

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.Sources

/** Multimodal (image/audio/video) column plumbing.
  *
  * Design: media lives in the lake as opaque `binary` columns + typed
  * metadata — the schema, partitioning, and batch shape are the real
  * engineering at 100 TB; the codec call is a leaf.
  *
  * Codec status per kind:
  *  - image: REAL PNG. The corpus carries genuine PNG bytes and the decode
  *    leaf runs `javax.imageio` (stock JDK) — actual pixel decode, actual
  *    resample on resize. Pixel content is a deterministic solid gray
  *    (level = top byte of one LCG step of the id) so the decoded luma is
  *    exactly replayable in the DuckDB oracle.
  *  - audio: REAL WAV. The corpus carries genuine RIFF/WAV PCM16 bytes and
  *    the decode leaf runs `javax.sound.sampled` (stock JDK) — actual
  *    container parse, actual frame decode; level stats come from the
  *    decoded samples. Sample content is a deterministic LCG tone so the
  *    decoded levels are exactly replayable in the DuckDB oracle.
  *  - video: DETERMINISTIC STUB ([[FakeCodec]], clearly marked) — the
  *    container ships no video codecs. Swapping in javacv/ffmpeg means
  *    replacing ONLY the codec leaf; every Spark-side shape stays.
  *
  * Scale notes:
  *  - Blobs skew partitions by *bytes*, not rows: [[balancedByBytes]]
  *    range-partitions on cumulative size so a 4 GB video and 4000 thumbnails
  *    don't land on one executor.
  *  - Decoding is batched ([[Multimodal.DecodeBatch]] rows per codec call)
  *    through `mapPartitions` — the JVM twin of `mapInPandas`' Arrow batches:
  *    one native-lib init + one buffer per batch, not per row.
  *  - Feature vectors come back as `Array[Float]` ready for
  *    [[Similarity]]'s ANN; frame sampling explodes video → frame rows
  *    *before* the shuffle so downstream ops parallelize per frame.
  */
object Multimodal {

  val DecodeBatch = 64

  case class MediaFile(media_id: Long, kind: String, uri: String,
                       width: Int, height: Int, n_frames: Int,
                       content: Array[Byte])
  case class MediaFeatures(media_id: Long, kind: String, width: Int, height: Int,
                           n_pixels: Long, mean_luma: Double, embedding: Array[Float])
  case class Frame(media_id: Long, frame_idx: Int, content: Array[Byte])

  /** REAL image codec over `javax.imageio` (ships in the stock JDK).
    * Encode renders a solid-gray RGB frame and emits genuine PNG bytes;
    * decode reads the PNG and measures dims/luma/embedding from the ACTUAL
    * pixels — nothing is inferred from metadata. */
  object PngCodec {
    /** Deterministic gray level for an id: the unsigned top byte of one LCG
      * step — the same generator the fake payloads use, so the DuckDB twin
      * reads it as `((id·A + C) mod 2⁶⁴) ÷ 2⁵⁶`. */
    def grayLevel(id: Long): Int =
      (((id * 6364136223846793005L + 1442695040888963407L) >>> 56) & 0xff).toInt

    def encode(id: Long, w: Int, h: Int): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      val g = grayLevel(id)
      val gfx = img.createGraphics()
      gfx.setColor(new java.awt.Color(g, g, g))
      gfx.fillRect(0, 0, w, h)
      gfx.dispose()
      toPng(img)
    }

    def toPng(img: BufferedImage): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    def decode(bytes: Array[Byte]): BufferedImage =
      ImageIO.read(new ByteArrayInputStream(bytes))

    /** Real pixel scan: mean of (r+g+b)/3 over every pixel, plus an 8-dim
      * column-stripe mean embedding (stripe i = pixels with x ≡ i mod 8). */
    def features(m: MediaFile): MediaFeatures = {
      val img = decode(m.content)
      val (w, h) = (img.getWidth, img.getHeight)
      var lumaSum = 0.0
      val stripe = new Array[Double](8)
      val stripeN = new Array[Long](8)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val l = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3.0
          lumaSum += l
          stripe(x % 8) += l; stripeN(x % 8) += 1
          x += 1
        }
        y += 1
      }
      val emb = Array.tabulate(8)(i =>
        if (stripeN(i) == 0) 0f else (stripe(i) / stripeN(i) / 255.0).toFloat)
      MediaFeatures(m.media_id, m.kind, w, h, w.toLong * h,
        lumaSum / (w.toLong * h), emb)
    }

    /** Real resample: redraw into the target geometry, re-encode as PNG. */
    def resize(m: MediaFile, w1: Int, h1: Int): MediaFile = {
      val img = decode(m.content)
      val scaled = new BufferedImage(w1, h1, BufferedImage.TYPE_INT_RGB)
      val gfx = scaled.createGraphics()
      gfx.drawImage(img, 0, 0, w1, h1, null)
      gfx.dispose()
      m.copy(width = w1, height = h1, content = toPng(scaled))
    }
  }

  /** REAL audio codec over `javax.sound.sampled` (ships in the stock JDK —
    * RIFF/WAV PCM needs no native libs). Encode emits a genuine 16-bit mono
    * PCM WAV whose samples are an LCG byte tone; decode parses the RIFF
    * container through `AudioSystem` and measures level stats from the
    * ACTUAL decoded frames. The sample bytes replay the same LCG stream the
    * fake payload used (steps 1..[[WavCodec.Samples]]), so the DuckDB twin's
    * level arithmetic is unchanged. */
  object WavCodec {
    val Samples = 64
    val SampleRate = 8000

    /** The LCG byte stream for an id: steps 1..n of
      * s ← s·6364136223846793005 + 1442695040888963407, top byte. */
    private def lcgBytes(id: Long, n: Int): Array[Int] = {
      var s = id * 6364136223846793005L + 1442695040888963407L
      Array.fill(n) {
        s = s * 6364136223846793005L + 1442695040888963407L
        ((s >>> 56) & 0xff).toInt
      }
    }

    /** Genuine RIFF/WAV: 44-byte canonical header + PCM16LE mono frames.
      * Sample k = (byte_k − 128)·256, so the decoded 8-bit level is byte_k. */
    def encode(id: Long): Array[Byte] = {
      val data = lcgBytes(id, Samples).flatMap { b =>
        val s = (b - 128) * 256
        Seq((s & 0xff).toByte, ((s >> 8) & 0xff).toByte)
      }
      val out = java.nio.ByteBuffer.allocate(44 + data.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put("RIFF".getBytes("US-ASCII")).putInt(36 + data.length)
        .put("WAVE".getBytes("US-ASCII"))
      out.put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1) // PCM
        .putShort(1) // mono
        .putInt(SampleRate)
        .putInt(SampleRate * 2) // byte rate
        .putShort(2)            // block align
        .putShort(16)           // bits/sample
      out.put("data".getBytes("US-ASCII")).putInt(data.length).put(data)
      out.array()
    }

    /** Real container parse + frame decode: `AudioSystem` reads the RIFF
      * header (format, rate, frame count are taken from the DECODER, not
      * from our metadata), then levels come from the actual PCM samples. */
    def features(m: MediaFile): MediaFeatures = {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(m.content))
      val fmt = ais.getFormat
      require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
        s"unexpected WAV layout: $fmt")
      val nFrames = ais.getFrameLength.toInt
      val raw = ais.readAllBytes()
      val stripe = new Array[Double](8)
      val stripeN = new Array[Long](8)
      var lumaSum = 0.0
      var k = 0
      while (k < nFrames) {
        val lo = raw(2 * k) & 0xff
        val hi = raw(2 * k + 1).toInt // sign-carrying high byte
        val sample = (hi << 8) | lo
        val level = (sample >> 8) + 128 // back to the 8-bit grid
        lumaSum += level
        stripe(k % 8) += level; stripeN(k % 8) += 1
        k += 1
      }
      val emb = Array.tabulate(8)(j =>
        if (stripeN(j) == 0) 0f else (stripe(j) / 255.0).toFloat)
      MediaFeatures(m.media_id, m.kind, m.width, m.height,
        nFrames.toLong, lumaSum / nFrames, emb)
    }
  }

  /** STUB codec boundary for video — deterministic fake, NOT a real
    * decoder (no video codec ships in this container). */
  object FakeCodec {
    /** Synthesize an opaque blob for (id, kind): 16-byte header
      * [w:4][h:4][frames:4][magic:4] + pseudo-random payload. */
    def encode(id: Long, kind: String, w: Int, h: Int, frames: Int): Array[Byte] = {
      val payload = new Array[Byte](16 + 64)
      def putInt(off: Int, v: Int): Unit = {
        payload(off) = (v >> 24).toByte; payload(off + 1) = (v >> 16).toByte
        payload(off + 2) = (v >> 8).toByte; payload(off + 3) = v.toByte
      }
      putInt(0, w); putInt(4, h); putInt(8, frames); putInt(12, 0x47524654) // "GRFT"
      var s = id * 6364136223846793005L + 1442695040888963407L
      (16 until payload.length).foreach { i =>
        s = s * 6364136223846793005L + 1442695040888963407L
        payload(i) = (s >> 56).toByte
      }
      payload
    }

    /** [STUB — replace with a real codec] Parse the fake header + derive a
      * deterministic 8-dim "embedding" and luma stat from the payload.
      * Only video rows reach this path now. */
    def decode(batch: Seq[MediaFile]): Seq[MediaFeatures] = batch.map { m =>
      val lumaBytes = m.content.drop(16)
      val luma = lumaBytes.map(b => (b & 0xff).toDouble).sum / lumaBytes.length
      val emb = Array.tabulate(8) { j =>
        lumaBytes.zipWithIndex.collect { case (b, i) if i % 8 == j => (b & 0xff).toFloat }.sum / 255f
      }
      MediaFeatures(m.media_id, m.kind, m.width, m.height,
        m.width.toLong * m.height * math.max(m.n_frames, 1), luma, emb)
    }
  }

  /** Batch dispatch across the per-kind codecs: PNG and WAV rows decode for
    * real, video goes to the declared stub. One codec entry per batch. */
  private def decodeBatch(batch: Seq[MediaFile]): Seq[MediaFeatures] = {
    val (images, rest) = batch.partition(_.kind == "image")
    val (audio, video) = rest.partition(_.kind == "audio")
    images.map(PngCodec.features) ++ audio.map(WavCodec.features) ++
      FakeCodec.decode(video)
  }

  /** Synthetic media corpus derived from the documents table (deterministic:
    * dims/kind are functions of doc_id). Stands in for `spark.read.format
    * ("binaryFile")` + a metadata join in a real lake. Image rows carry
    * GENUINE PNG bytes; audio/video carry the declared fake container. */
  def mediaCorpus(spark: SparkSession, dir: String): Dataset[MediaFile] = {
    import spark.implicits._
    Sources.documents(spark, dir).select("doc_id").as[Long].map { id =>
      val kind = (id % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      val w = 64 + (id % 8).toInt * 32
      val h = 64 + (id % 5).toInt * 32
      val frames = if (kind == "video") 8 + (id % 4).toInt else 1
      val bytes = kind match {
        case "image" => PngCodec.encode(id, w, h)
        case "audio" => WavCodec.encode(id)
        case _       => FakeCodec.encode(id, kind, w, h, frames)
      }
      MediaFile(id, kind, s"lake://media/$kind/$id", w, h, frames, bytes)
    }
  }

  /** Repartition so each task sees a similar BYTE volume (blob-size skew is
    * the failure mode; row-count balance is meaningless for media). */
  def balancedByBytes(media: Dataset[MediaFile], partitions: Int): Dataset[MediaFile] =
    media.repartitionByRange(partitions, length(col("content")), col("media_id"))

  /** Batched decode/feature-extract: the mapInPandas twin — each partition's
    * rows are fed to the codec [[DecodeBatch]] at a time. Image batches run
    * the REAL `javax.imageio` decode. */
  def extractFeatures(media: Dataset[MediaFile]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.grouped(DecodeBatch).flatMap(decodeBatch))
  }

  /** Batched resize to a bounding box, preserving aspect ratio (the
    * thumbnail/normalization stage before feature extraction). Image rows
    * are resampled FOR REAL (decode → redraw → PNG re-encode); audio/video
    * re-emit the stub container at the new geometry. Same batched
    * `mapPartitions` shape as [[extractFeatures]]: one codec init per
    * batch, not per row. */
  def resize(media: Dataset[MediaFile], maxW: Int, maxH: Int): Dataset[MediaFile] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.grouped(DecodeBatch).flatMap(_.map { m =>
      val scale = math.min(1.0, math.min(maxW.toDouble / m.width, maxH.toDouble / m.height))
      val (w, h) = (math.max(1, (m.width * scale).toInt), math.max(1, (m.height * scale).toInt))
      if (w == m.width && h == m.height) m
      else if (m.kind == "image") PngCodec.resize(m, w, h)
      else if (m.kind == "audio") m.copy(width = w, height = h) // display
      // geometry is metadata for audio; the real WAV stream is untouched
      else m.copy(width = w, height = h,
        content = FakeCodec.encode(m.media_id, m.kind, w, h, m.n_frames))
    }))
  }

  /** Sample every `nth` frame of video rows into per-frame records (explode
    * before shuffle → per-frame parallelism downstream). Non-video rows pass
    * through as their single frame 0. */
  def sampleFrames(media: Dataset[MediaFile], nth: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      (0 until math.max(m.n_frames, 1) by nth).map { i =>
        Frame(m.media_id, i, m.content) // real codec would slice the stream
      }
    }
  }

  /** Bounding box for [[resizeSummary]]'s normalization pass. */
  val ResizeBox = 128

  /** The resize stage as a queryable table: per kind, the post-resize
    * geometry and how many blobs the [[ResizeBox]]² bounding box actually
    * shrank. For images the resample is a REAL decode/redraw/encode; the
    * GEOMETRY (scale factor, floor-to-int, 1-pixel floor) is the verified
    * contract — `n_downscaled` compares against the original dims recomputed
    * from `media_id`, so the check is non-vacuous at every SF. */
  def resizeSummary(spark: SparkSession, dir: String): DataFrame = {
    val origW = lit(64) + (col("media_id") % 8).cast("int") * 32
    val origH = lit(64) + (col("media_id") % 5).cast("int") * 32
    resize(mediaCorpus(spark, dir), ResizeBox, ResizeBox).toDF()
      .groupBy("kind")
      .agg(
        count(lit(1)).as("n_media"),
        sum(col("width").cast("long")).as("sum_width"),
        sum(col("height").cast("long")).as("sum_height"),
        count(when(col("width") < origW || col("height") < origH, 1))
          .as("n_downscaled"))
  }

  /** The media pipeline as a queryable table: features joined back to doc
    * language (metadata join pattern), aggregated per kind. Image stats come
    * from the real PNG pixel scan, audio from the real WAV frame decode
    * (n_pixels = decoded frame count); video from the declared stub. */
  def kindSummary(spark: SparkSession, dir: String): DataFrame = {
    import graft.engine.Num._
    extractFeatures(balancedByBytes(mediaCorpus(spark, dir), 8)).toDF()
      .groupBy("kind")
      .agg(
        count(lit(1)).as("n_media"),
        sum(col("n_pixels")).as("total_pixels"),
        r4(dsum(col("mean_luma")) / count(lit(1))).as("avg_luma"))
  }
}
