package graft

import graft.ext.Multimodal
import graft.ext.Multimodal.{AviCodec, MediaFile, PngCodec, WavCodec}

class MultimodalSpec extends SparkSpec {

  test("media corpus is deterministic; video containers round-trip their geometry") {
    val a = Multimodal.mediaCorpus(spark, sf).collect().sortBy(_.media_id)
    val b = Multimodal.mediaCorpus(spark, sf).collect().sortBy(_.media_id)
    assert(a.length === 500)
    assert(a.zip(b).forall { case (x, y) => x.content.sameElements(y.content) })
    val m = a.find(_.kind == "video").get
    val p = AviCodec.parse(m.content)
    assert(p.width === m.width && p.height === m.height,
      "decoded stream dims must round-trip")
    assert(p.frames.length === m.n_frames && p.totalFrames === m.n_frames)
  }

  test("video blobs are genuine AVIs: real chunk-walk decode matches the LCG frame tone") {
    val videos = Multimodal.mediaCorpus(spark, sf).collect().filter(_.kind == "video")
    assert(videos.nonEmpty)
    videos.take(25).foreach { m =>
      // RIFF/AVI magic, then a real chunk walk + per-pixel palette decode
      assert(new String(m.content.take(4), "US-ASCII") === "RIFF")
      assert(new String(m.content.slice(8, 12), "US-ASCII") === "AVI ")
      val p = AviCodec.parse(m.content)
      var s = m.media_id * 6364136223846793005L + 1442695040888963407L
      (0 until p.frames.length).foreach { k =>
        s = s * 6364136223846793005L + 1442695040888963407L
        val expected = ((s >>> 56) & 0xff).toInt
        val r = AviCodec.raster(p, k)
        // every pixel of the frame decodes to that frame's LCG level
        assert(r.forall(px => p.palette(px & 0xff) === expected),
          s"media ${m.media_id} frame $k decoded levels != lcg $expected")
      }
    }
  }

  test("AviCodec round-trips arbitrary rasters through padding and bottom-up rows") {
    // width 5 forces a 3-byte row pad; a non-solid raster catches any
    // orientation or stride mistake in either direction
    val (w, h) = (5, 3)
    val frames = Array(
      Array.tabulate(w * h)(i => (i * 7 + 3).toByte),
      Array.tabulate(w * h)(i => (200 - i).toByte))
    val bytes = AviCodec.encodeRaster(w, h, frames)
    val p = AviCodec.parse(bytes)
    assert(p.width === w && p.height === h && p.frames.length === 2)
    assert(AviCodec.raster(p, 0).toSeq === frames(0).toSeq)
    assert(AviCodec.raster(p, 1).toSeq === frames(1).toSeq)
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
        case _ => // real AVI decode: geometry × decoded frame count, luma
          // from actual frame bits = mean of LCG steps 1..frames
          assert(f.n_pixels % (f.width.toLong * f.height) === 0)
          val frames = (f.n_pixels / (f.width.toLong * f.height)).toInt
          val expected = Multimodal.lcgLevels(f.media_id, frames).sum.toDouble / frames
          assert(f.mean_luma === expected,
            s"real decode luma ${f.mean_luma} != lcg mean $expected")
      }
    }
  }

  test("decode is batched: codec sees DecodeBatch-sized groups, not single rows") {
    import spark.implicits._
    var batchSizes = Vector.empty[Int]
    val media = Multimodal.mediaCorpus(spark, sf).repartition(2)
    val out = media.mapPartitions(_.grouped(Multimodal.DecodeBatch).flatMap { b =>
      // codec-free probe of the batching mechanics: smuggle batch size out
      b.map(m => Multimodal.MediaFeatures(m.media_id, m.kind, b.size, 0, 0, 0,
        Array.empty[Float]))
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
    // sampled video frames are standalone single-frame AVIs of the REAL
    // frame bits: frame_idx k decodes to the clip's LCG level at step k+1
    videos.take(10).foreach { v =>
      byId(v.media_id).foreach { fr =>
        val p = AviCodec.parse(fr.content)
        assert(p.width === v.width && p.frames.length === 1)
        val lvl = Multimodal.lcgLevels(v.media_id, fr.frame_idx + 1).last
        assert(AviCodec.raster(p, 0).forall(px => p.palette(px & 0xff) === lvl))
      }
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
          // real resample: the re-encoded AVI decodes at the NEW dims with
          // the same per-frame content (solid frames survive NN sampling)
          val p = AviCodec.parse(m.content)
          assert(p.width === m.width && p.height === m.height)
          assert(p.frames.length === o.n_frames)
          val lvl0 = Multimodal.lcgLevels(m.media_id, 1)(0)
          assert(AviCodec.raster(p, 0).forall(px => p.palette(px & 0xff) === lvl0))
        }
      }
    }
  }

  test("kindSummary aggregates the three kinds") {
    val rows = Multimodal.kindSummary(spark, sf).collect()
    assert(rows.map(_.getAs[String]("kind")).sorted.toSeq === Seq("audio", "image", "video"))
    assert(rows.map(_.getAs[Long]("n_media")).sum === 500)
  }

  test("phash: a synthetic near-identical image pair lands within the Hamming gate; " +
      "an unrelated pair does not") {
    import spark.implicits._
    // template + variant share the SAME tile stream except tile 0 lifted by
    // +1 gray level — visually indistinguishable; the third image is an
    // unrelated stream
    val px = Multimodal.PhashTiles * Multimodal.PhashTilePx
    val media = Seq(
      MediaFile(1L, "image", "t", px, px, 1, Multimodal.encodePhashTiles(99L, perturb = false)),
      MediaFile(2L, "image", "v", px, px, 1, Multimodal.encodePhashTiles(99L, perturb = true)),
      MediaFile(3L, "image", "u", px, px, 1, Multimodal.encodePhashTiles(1234L, perturb = false))
    ).toDS()
    val pairs = Multimodal.phashPairsOf(Multimodal.phashOf(media)).collect()
    val near = pairs.find(r => r.getAs[Long]("media_id_a") == 1L &&
      r.getAs[Long]("media_id_b") == 2L)
    assert(near.isDefined, s"planted near-dup pair not in candidates: ${pairs.toSeq}")
    assert(near.get.getAs[Boolean]("is_near"),
      s"hamming=${near.get.getAs[Long]("hamming_dist")} exceeds the gate")
    assert(near.get.getAs[Long]("hamming_dist") <= Multimodal.PhashHammingMax)
    // the unrelated image must not be NEAR either of them (band collisions
    // may make it a candidate; the exact verify rejects it)
    assert(pairs.filter(r => r.getAs[Long]("media_id_b") == 3L ||
      r.getAs[Long]("media_id_a") == 3L).forall(!_.getAs[Boolean]("is_near")))
  }

  test("audio: a re-rendered clip pair lands within the Hamming gate through " +
      "a REAL WAV decode; an unrelated clip does not") {
    import spark.implicits._
    val n = Multimodal.AudioFpWindows * Multimodal.AudioFpWindowSamples
    def clip(id: Long, cid: Long, perturb: Boolean): MediaFile = {
      val lv = Multimodal.lcgLevels(cid, n)
      if (perturb) lv(0) = math.min(255, lv(0) + 1)
      MediaFile(id, "audio", s"u$id", 0, 0, n, Multimodal.WavCodec.encodeLevels(lv))
    }
    val media = Seq(clip(1L, 99L, perturb = false), clip(2L, 99L, perturb = true),
      clip(3L, 1234L, perturb = false)).toDS()
    // the fingerprint must come from the DECODED frames: recompute it from
    // the level stream directly and demand bit-identity with the codec path
    val fps = Multimodal.audioFingerprintOf(media).collect()
      .map(r => r.media_id -> r.phash).toMap
    def expectFp(cid: Long, perturb: Boolean): Long = {
      val lv = Multimodal.lcgLevels(cid, n)
      if (perturb) lv(0) = math.min(255, lv(0) + 1)
      val w = Multimodal.AudioFpWindows
      val ws = Array.tabulate(w)(j =>
        lv.slice(j * n / w, (j + 1) * n / w).map(_.toLong).sum)
      val total = ws.sum
      (0 until w).foldLeft(0L)((h, j) =>
        if (ws(j) * w > total) h | (1L << j) else h)
    }
    assert(fps(1L) === expectFp(99L, perturb = false))
    assert(fps(2L) === expectFp(99L, perturb = true))
    val pairs = Multimodal.phashPairsOf(Multimodal.audioFingerprintOf(media)).collect()
    val near = pairs.find(r => r.getAs[Long]("media_id_a") == 1L &&
      r.getAs[Long]("media_id_b") == 2L)
    assert(near.isDefined, s"planted near-dup clip pair not in candidates: ${pairs.toSeq}")
    assert(near.get.getAs[Boolean]("is_near"),
      s"hamming=${near.get.getAs[Long]("hamming_dist")} exceeds the gate")
    assert(pairs.filter(r => r.getAs[Long]("media_id_b") == 3L ||
      r.getAs[Long]("media_id_a") == 3L).forall(!_.getAs[Boolean]("is_near")))
  }

  test("audio dup scan: map-only fingerprinting, banded candidates, all " +
      "planted pairs detected at the fixture SF") {
    val df = Multimodal.audioDupPairs(spark, sf)
    val p = df.queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(1500))
    val near = df.where(org.apache.spark.sql.functions.col("is_near")).collect()
    val planted = near.filter(r => r.getAs[Long]("media_id_b") -
      r.getAs[Long]("media_id_a") == 4 && r.getAs[Long]("media_id_b") % 10 == 7)
    assert(planted.length === 50, s"expected the 50 planted pairs, got ${planted.length}")
  }

  test("video: a re-rendered clip pair lands within the Hamming gate through " +
      "a REAL AVI chunk-walk decode; an unrelated clip does not") {
    import spark.implicits._
    val (w, h) = (Multimodal.VideoDupW, Multimodal.VideoDupH)
    val n = Multimodal.VideoFpWindows * Multimodal.VideoFpWindowFrames
    def clip(id: Long, cid: Long, perturb: Boolean): MediaFile = {
      val lv = Multimodal.lcgLevels(cid, n)
      if (perturb) lv(0) = math.min(255, lv(0) + 1)
      MediaFile(id, "video", s"u$id", w, h, n,
        Multimodal.AviCodec.encodeRaster(w, h,
          lv.map(l => Array.fill(w * h)(l.toByte))))
    }
    val media = Seq(clip(1L, 99L, perturb = false), clip(2L, 99L, perturb = true),
      clip(3L, 1234L, perturb = false)).toDS()
    // decoded fingerprint must equal the level-stream computation (the
    // raster factor w·h cancels out of the cross-multiplied threshold)
    val fps = Multimodal.videoFingerprintOf(media).collect()
      .map(r => r.media_id -> r.phash).toMap
    def expectFp(cid: Long, perturb: Boolean): Long = {
      val lv = Multimodal.lcgLevels(cid, n)
      if (perturb) lv(0) = math.min(255, lv(0) + 1)
      val wn = Multimodal.VideoFpWindows
      val ws = Array.tabulate(wn)(j =>
        lv.slice(j * n / wn, (j + 1) * n / wn).map(_.toLong).sum)
      val total = ws.sum
      (0 until wn).foldLeft(0L)((hh, j) =>
        if (ws(j) * wn > total) hh | (1L << j) else hh)
    }
    assert(fps(1L) === expectFp(99L, perturb = false))
    assert(fps(2L) === expectFp(99L, perturb = true))
    val pairs = Multimodal.phashPairsOf(Multimodal.videoFingerprintOf(media)).collect()
    val near = pairs.find(r => r.getAs[Long]("media_id_a") == 1L &&
      r.getAs[Long]("media_id_b") == 2L)
    assert(near.isDefined, s"planted near-dup clip pair not in candidates: ${pairs.toSeq}")
    assert(near.get.getAs[Boolean]("is_near"),
      s"hamming=${near.get.getAs[Long]("hamming_dist")} exceeds the gate")
    assert(pairs.filter(r => r.getAs[Long]("media_id_b") == 3L ||
      r.getAs[Long]("media_id_a") == 3L).forall(!_.getAs[Boolean]("is_near")))
  }

  test("video dup scan: map-only fingerprinting, banded candidates, all " +
      "planted pairs detected at the fixture SF") {
    val df = Multimodal.videoDupPairs(spark, sf)
    val p = df.queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(1500))
    val near = df.where(org.apache.spark.sql.functions.col("is_near")).collect()
    val planted = near.filter(r => r.getAs[Long]("media_id_b") -
      r.getAs[Long]("media_id_a") == 4 && r.getAs[Long]("media_id_b") % 10 == 7)
    assert(planted.length === 50, s"expected the 50 planted pairs, got ${planted.length}")
  }

  test("cross-modal report: per-doc verdicts reconcile with each arm's " +
      "reject set; any_dup is their OR; the planted media variants flag " +
      "on all three media arms") {
    import org.apache.spark.sql.functions.col
    val rows = Multimodal.crossModalDups(spark, sf).collect()
    assert(rows.length === 500)
    // planted media variants (id % 10 == 7) near-dup in image+audio+video
    rows.filter(_.getAs[Long]("doc_id") % 10 == 7).foreach { r =>
      assert(r.getAs[Boolean]("image_dup") && r.getAs[Boolean]("audio_dup") &&
        r.getAs[Boolean]("video_dup") && r.getAs[Boolean]("any_dup"), r.toString)
    }
    // text arm reconciles with the registered near-dup filter's complement
    val textKept = graft.ext.Dedup.nearDupFiltered(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    rows.foreach { r =>
      assert(r.getAs[Boolean]("text_dup") === !textKept(r.getAs[Long]("doc_id")),
        s"text verdict mismatch: $r")
      assert(r.getAs[Boolean]("any_dup") === (r.getAs[Boolean]("text_dup") ||
        r.getAs[Boolean]("image_dup") || r.getAs[Boolean]("audio_dup") ||
        r.getAs[Boolean]("video_dup")), s"any_dup is not the OR: $r")
    }
    // the report must add signal over any single arm: some doc is text-
    // unique but media-flagged
    assert(rows.exists(r => !r.getAs[Boolean]("text_dup") &&
      r.getAs[Boolean]("image_dup")),
      "no text-unique media near-dup — the cross-modal gate is vacuous")
  }

  test("phash: hashing is map-only and the candidate join is banded — never all-pairs") {
    val df = Multimodal.phashPairs(spark, sf)
    val p = df.queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(1500))
    // fixture sanity: the planted variants (doc_id % 10 == 7 vs doc_id-4)
    // are all detected at every SF
    val near = df.where(org.apache.spark.sql.functions.col("is_near")).collect()
    val planted = near.filter(r => r.getAs[Long]("media_id_b") -
      r.getAs[Long]("media_id_a") == 4 && r.getAs[Long]("media_id_b") % 10 == 7)
    assert(planted.length === 50, s"expected the 50 planted pairs, got ${planted.length}")
  }

  test("codec init kills the JDK decode-contention classes: in-memory " +
      "ImageIO streams, once-resolved WAV reader (SCALING_r12 ablation)") {
    import graft.ext.Multimodal
    // force codec init, then pin: no disk-backed ImageIO stream caches
    // (pre-fix every PNG encode/decode wrote a temp cache file — measured
    // 9.2x on the sf1 phash arm at local[32])
    Multimodal.PngCodec.grayLevel(0L)
    assert(!javax.imageio.ImageIO.getUseCache,
      "ImageIO must cache streams in memory, not temp files")
    // the WAV path parses a REAL RIFF container through the once-resolved
    // reader (pre-fix AudioSystem's facade took a JVM-global synchronized
    // provider lookup per call — measured 4.8x on the sf1 audio arm)
    val ais = Multimodal.WavCodec.open(Multimodal.WavCodec.encode(7L))
    try {
      assert(ais.getFormat.getSampleSizeInBits === 16)
      assert(ais.getFrameLength === Multimodal.WavCodec.Samples.toLong)
    } finally ais.close()
  }

}
