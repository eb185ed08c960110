package graft

import graft.ext.Multimodal
import graft.ext.Multimodal.{FakeCodec, MediaFile}

class MultimodalSpec extends SparkSpec {

  test("media corpus is deterministic and binary round-trips its header") {
    val a = Multimodal.mediaCorpus(spark, sf).collect().sortBy(_.media_id)
    val b = Multimodal.mediaCorpus(spark, sf).collect().sortBy(_.media_id)
    assert(a.length === 500)
    assert(a.zip(b).forall { case (x, y) => x.content.sameElements(y.content) })
    val m = a.head
    val w = ((m.content(0) & 0xff) << 24) | ((m.content(1) & 0xff) << 16) |
      ((m.content(2) & 0xff) << 8) | (m.content(3) & 0xff)
    assert(w === m.width, "header width must round-trip")
  }

  test("extractFeatures preserves every row and computes bounded stats") {
    val media = Multimodal.mediaCorpus(spark, sf)
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length === 500)
    feats.foreach { f =>
      assert(f.mean_luma >= 0 && f.mean_luma <= 255)
      assert(f.embedding.length === 8)
      assert(f.n_pixels >= f.width.toLong * f.height)
      if (f.kind != "video") assert(f.n_pixels === f.width.toLong * f.height)
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
        // header carries the new dims (re-encoded deterministically)
        val headerW = ((m.content(0) & 0xff) << 24) | ((m.content(1) & 0xff) << 16) |
          ((m.content(2) & 0xff) << 8) | (m.content(3) & 0xff)
        assert(headerW === m.width)
      }
    }
  }

  test("kindSummary aggregates the three kinds") {
    val rows = Multimodal.kindSummary(spark, sf).collect()
    assert(rows.map(_.getAs[String]("kind")).sorted.toSeq === Seq("audio", "image", "video"))
    assert(rows.map(_.getAs[Long]("n_media")).sum === 500)
  }
}
