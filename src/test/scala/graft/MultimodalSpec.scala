package graft

import graft.ext.Multimodal
import graft.ext.Multimodal.{FakeCodec, MediaFile, PngCodec, WavCodec}

class MultimodalSpec extends SparkSpec {

  test("media corpus is deterministic; stub blobs round-trip their header") {
    val a = Multimodal.mediaCorpus(spark, sf).collect().sortBy(_.media_id)
    val b = Multimodal.mediaCorpus(spark, sf).collect().sortBy(_.media_id)
    assert(a.length === 500)
    assert(a.zip(b).forall { case (x, y) => x.content.sameElements(y.content) })
    val m = a.find(_.kind == "video").get
    val w = ((m.content(0) & 0xff) << 24) | ((m.content(1) & 0xff) << 16) |
      ((m.content(2) & 0xff) << 8) | (m.content(3) & 0xff)
    assert(w === m.width, "header width must round-trip")
  }

  test("audio blobs are genuine WAVs: real frame decode matches the LCG tone") {
    val audio = Multimodal.mediaCorpus(spark, sf).collect().filter(_.kind == "audio")
    assert(audio.nonEmpty)
    audio.take(25).foreach { m =>
      // RIFF magic, then an actual javax.sound.sampled decode
      assert(new String(m.content.take(4), "US-ASCII") === "RIFF")
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(m.content))
      assert(ais.getFormat.getSampleRate === WavCodec.SampleRate.toFloat)
      assert(ais.getFrameLength === WavCodec.Samples.toLong)
      // decoded levels ARE the LCG byte stream (steps 1..Samples)
      val raw = ais.readAllBytes()
      var s = m.media_id * 6364136223846793005L + 1442695040888963407L
      (0 until WavCodec.Samples).foreach { k =>
        s = s * 6364136223846793005L + 1442695040888963407L
        val expected = ((s >>> 56) & 0xff).toInt
        val sample = ((raw(2 * k + 1).toInt) << 8) | (raw(2 * k) & 0xff)
        assert((sample >> 8) + 128 === expected,
          s"media ${m.media_id} frame $k decoded ${(sample >> 8) + 128} != lcg $expected")
      }
    }
  }

  test("image blobs are genuine PNGs: real decode matches declared dims and gray level") {
    val images = Multimodal.mediaCorpus(spark, sf).collect().filter(_.kind == "image")
    assert(images.nonEmpty)
    images.take(25).foreach { m =>
      // PNG magic bytes, then an actual javax.imageio decode
      assert((m.content(0) & 0xff) === 0x89 && m.content(1) === 'P'.toByte)
      val img = PngCodec.decode(m.content)
      assert(img.getWidth === m.width && img.getHeight === m.height,
        s"decoded dims ${img.getWidth}x${img.getHeight} != declared ${m.width}x${m.height}")
      val g = PngCodec.grayLevel(m.media_id)
      val rgb = img.getRGB(m.width / 2, m.height / 2)
      assert(((rgb >> 16) & 0xff) === g && ((rgb >> 8) & 0xff) === g && (rgb & 0xff) === g)
    }
  }

  test("extractFeatures preserves every row; image stats come from real pixels") {
    val media = Multimodal.mediaCorpus(spark, sf)
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length === 500)
    feats.foreach { f =>
      assert(f.mean_luma >= 0 && f.mean_luma <= 255)
      assert(f.embedding.length === 8)
      f.kind match {
        case "image" =>
          assert(f.n_pixels === f.width.toLong * f.height)
          // solid gray: decoded mean luma IS the gray level
          assert(f.mean_luma === PngCodec.grayLevel(f.media_id).toDouble,
            s"real decode luma ${f.mean_luma} != gray ${PngCodec.grayLevel(f.media_id)}")
        case "audio" => // real decode: size is the DECODED frame count
          assert(f.n_pixels === WavCodec.Samples.toLong)
        case _ => // video stub: geometry × frames
          assert(f.n_pixels >= f.width.toLong * f.height)
          assert(f.n_pixels % (f.width.toLong * f.height) === 0)
      }
    }
  }

  test("decode is batched: codec sees DecodeBatch-sized groups, not single rows") {
    import spark.implicits._
    var batchSizes = Vector.empty[Int]
    val media = Multimodal.mediaCorpus(spark, sf).repartition(2)
    val out = media.mapPartitions(_.grouped(Multimodal.DecodeBatch).flatMap { b =>
      FakeCodec.decode(b).map(_.copy(width = b.size)) // smuggle batch size out
    }).collect()
    val sizes = out.map(_.width).groupBy(identity).view.mapValues(_.length).toMap
    assert(sizes.keySet.max === Multimodal.DecodeBatch,
      s"expected full batches of ${Multimodal.DecodeBatch}, saw $sizes")
  }

  test("sampleFrames explodes videos and passes other kinds through") {
    val media = Multimodal.mediaCorpus(spark, sf)
    val frames = Multimodal.sampleFrames(media, nth = 4).collect()
    val byId = frames.groupBy(_.media_id)
    val videos = media.collect().filter(_.kind == "video")
    videos.foreach { v =>
      val expect = (0 until v.n_frames by 4).size
      assert(byId(v.media_id).length === expect)
    }
    media.collect().filter(_.kind != "video").foreach { m =>
      assert(byId(m.media_id).map(_.frame_idx).toSeq === Seq(0))
    }
  }

  test("resize fits the bounding box, preserves aspect ratio, re-encodes content") {
    val media = graft.ext.Multimodal.mediaCorpus(spark, sf)
    val resized = graft.ext.Multimodal.resize(media, 100, 100).collect()
    val orig = media.collect().map(m => m.media_id -> m).toMap
    assert(resized.length === orig.size)
    resized.foreach { m =>
      val o = orig(m.media_id)
      assert(m.width <= 100 && m.height <= 100)
      assert(m.kind === o.kind && m.n_frames === o.n_frames)
      if (o.width <= 100 && o.height <= 100) {
        assert(m.width === o.width && m.height === o.height) // no upscale
        assert(m.content.sameElements(o.content)) // untouched blob
      } else {
        // aspect preserved within integer truncation of one scale factor
        val scale = math.min(100.0 / o.width, 100.0 / o.height)
        assert(m.width === math.max(1, (o.width * scale).toInt))
        assert(m.height === math.max(1, (o.height * scale).toInt))
        if (m.kind == "image") {
          // real resample: the re-encoded PNG decodes at the NEW dims and
          // keeps the solid gray content
          val img = PngCodec.decode(m.content)
          assert(img.getWidth === m.width && img.getHeight === m.height)
          val g = PngCodec.grayLevel(m.media_id)
          assert((img.getRGB(0, 0) & 0xff) === g)
        } else if (m.kind == "audio") {
          // display geometry is metadata for audio; the real WAV is untouched
          assert(m.content.sameElements(o.content))
          assert(new String(m.content.take(4), "US-ASCII") === "RIFF")
        } else {
          // stub container carries the new dims in its header
          val headerW = ((m.content(0) & 0xff) << 24) | ((m.content(1) & 0xff) << 16) |
            ((m.content(2) & 0xff) << 8) | (m.content(3) & 0xff)
          assert(headerW === m.width)
        }
      }
    }
  }

  test("kindSummary aggregates the three kinds") {
    val rows = Multimodal.kindSummary(spark, sf).collect()
    assert(rows.map(_.getAs[String]("kind")).sorted.toSeq === Seq("audio", "image", "video"))
    assert(rows.map(_.getAs[Long]("n_media")).sum === 500)
  }
}
