package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.Sources

/** Multimodal (image/audio/video) column plumbing.
  *
  * Design: media lives in the lake as opaque `binary` columns + typed
  * metadata — the schema, partitioning, and batch shape are the real
  * engineering at 100 TB; the codec call is a leaf. This container has no
  * image/audio libraries, so the DECODE LEAF IS A DETERMINISTIC STUB
  * ([[FakeCodec]], clearly marked): it "decodes" a header-prefixed synthetic
  * byte format. Swapping in javacv/ffmpeg means replacing ONLY
  * [[FakeCodec.decode]] — every Spark-side shape stays.
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

  /** STUB codec boundary — deterministic fake, NOT a real decoder. */
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
      * deterministic 8-dim "embedding" and luma stat from the payload. */
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

  /** Synthetic media corpus derived from the documents table (deterministic:
    * dims/kind are functions of doc_id). Stands in for `spark.read.format
    * ("binaryFile")` + a metadata join in a real lake. */
  def mediaCorpus(spark: SparkSession, dir: String): Dataset[MediaFile] = {
    import spark.implicits._
    Sources.documents(spark, dir).select("doc_id").as[Long].map { id =>
      val kind = (id % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      val w = 64 + (id % 8).toInt * 32
      val h = 64 + (id % 5).toInt * 32
      val frames = if (kind == "video") 8 + (id % 4).toInt else 1
      MediaFile(id, kind, s"lake://media/$kind/$id", w, h, frames,
        FakeCodec.encode(id, kind, w, h, frames))
    }
  }

  /** Repartition so each task sees a similar BYTE volume (blob-size skew is
    * the failure mode; row-count balance is meaningless for media). */
  def balancedByBytes(media: Dataset[MediaFile], partitions: Int): Dataset[MediaFile] =
    media.repartitionByRange(partitions, length(col("content")), col("media_id"))

  /** Batched decode/feature-extract: the mapInPandas twin — each partition's
    * rows are fed to the codec [[DecodeBatch]] at a time. */
  def extractFeatures(media: Dataset[MediaFile]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.grouped(DecodeBatch).flatMap(FakeCodec.decode))
  }

  /** Batched resize to a bounding box, preserving aspect ratio (the
    * thumbnail/normalization stage before feature extraction). The geometry
    * is real; the pixel resampling is the [[FakeCodec]] stub — a real codec
    * replaces only the `encode` call. Same batched `mapPartitions` shape as
    * [[extractFeatures]]: one codec init per batch, not per row. */
  def resize(media: Dataset[MediaFile], maxW: Int, maxH: Int): Dataset[MediaFile] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.grouped(DecodeBatch).flatMap(_.map { m =>
      val scale = math.min(1.0, math.min(maxW.toDouble / m.width, maxH.toDouble / m.height))
      val (w, h) = (math.max(1, (m.width * scale).toInt), math.max(1, (m.height * scale).toInt))
      if (w == m.width && h == m.height) m
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
    * shrank. The codec byte-work is the stub; the GEOMETRY (scale factor,
    * floor-to-int, 1-pixel floor) is the real contract and is what the
    * DuckDB twin re-derives — `n_downscaled` compares against the
    * original dims recomputed from `media_id`, so the check is
    * non-vacuous at every SF. */
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
    * language (metadata join pattern), aggregated per kind. */
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
