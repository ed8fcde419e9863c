package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import org.apache.spark.sql.functions._

class MultimodalSpec extends AnyFunSuite with SparkTestSession {

  private def mediaDf = {
    import spark.implicits._
    (0 until 40).map(i => (i.toLong, s"payload-$i".getBytes("UTF-8")))
      .toDF("id", "blob").repartition(3)
  }

  test("frameExtract: window fan-out arithmetic and short-payload drop") {
    import spark.implicits._
    // len 16 -> exactly 1 frame; len 15 -> dropped; len 80 -> frames at 0 and 64
    val df = Seq((1L, "a" * 16), (2L, "b" * 15), (3L, ("c" * 64) + ("d" * 16)))
      .toDF("doc_id", "text")
    val got = Multimodal.frameExtract(df, col("text"), col("doc_id"), stride = 64, flen = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2)).toMap
    assert(got.keySet == Set((1L, 0L), (3L, 0L), (3L, 1L)))
    // frame content is the window bytes: doc 3 frame 1 covers the d-run
    val d16 = java.security.MessageDigest.getInstance("MD5")
      .digest(("d" * 16).getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got((3L, 1L)) == d16)
    val c16 = java.security.MessageDigest.getInstance("MD5")
      .digest(("c" * 16).getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got((3L, 0L)) == c16)
  }

  test("frameExtract plan: map-side fan-out, no shuffle") {
    import spark.implicits._
    val df = Seq((1L, "x" * 200)).toDF("doc_id", "text")
    val p = Multimodal.frameExtract(df, col("text"), col("doc_id"), 64, 16)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
  }

  test("withMeta appends typed metadata via batched decode; deterministic") {
    val out = Multimodal.withMeta(mediaDf, "blob", batchSize = 7)
    assert(out.schema.fieldNames.toSeq == Seq("id", "blob", "meta"))
    assert(out.schema("meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.toSeq == Seq("kind", "width", "height", "nFrames", "sampleRateHz"))
    val rows = out.select("id", "meta.kind", "meta.width").collect()
    assert(rows.length == 40)
    val again = Multimodal.withMeta(mediaDf, "blob", batchSize = 32)
      .select("id", "meta.kind", "meta.width").collect()
    assert(rows.map(_.toString).sorted.toSeq == again.map(_.toString).sorted.toSeq,
      "batch size must not affect results")
  }

  test("withFeatures yields fixed-width float vectors") {
    val out = Multimodal.withFeatures(mediaDf, "blob", dim = 16)
    val vecs = out.select("features").collect().map(_.getSeq[Float](0))
    assert(vecs.forall(_.length == 16))
    assert(vecs.flatten.forall(v => v >= -1.0f && v <= 1.0f))
  }

  test("frameSample explodes sampled frame indices for videos only") {
    val meta = Multimodal.withMeta(mediaDf, "blob")
    val frames = Multimodal.frameSample(meta, "meta", everyN = 10)
    val kinds = frames.select("meta.kind").distinct().collect().map(_.getString(0)).toSet
    assert(kinds.subsetOf(Set("video")))
    frames.select("frame_index", "meta.nFrames").collect().foreach { r =>
      assert(r.getInt(0) >= 0 && r.getInt(0) < r.getInt(1) && r.getInt(0) % 10 == 0)
    }
  }

  test("ImageIoDecoder: real PNG decode reads exact dims; junk degrades to unknown") {
    val pngs = Seq((17, 23, 10, 20, 30), (64, 8, 255, 0, 128), (1, 1, 7, 7, 7))
      .map { case (w, h, r, g, b) => Multimodal.pngBytes(w, h, r, g, b) }
    val metas = Multimodal.ImageIoDecoder.decodeBatch(pngs :+ "not a png".getBytes("UTF-8"))
    assert(metas.take(3).map(m => (m.kind, m.width, m.height)) ==
      Seq(("image", 17, 23), ("image", 64, 8), ("image", 1, 1)))
    assert(metas(3) == Multimodal.MediaMeta("unknown", 0, 0, 0, 0))
  }

  test("ImageIoDecoder features: constant-fill image gives constant grid luminance") {
    // fill (100,150,200): ITU-601 integer luminance = (299*100+587*150+114*200)/1000
    val lum = (299L * 100 + 587L * 150 + 114L * 200) / 1000L
    val feats = Multimodal.ImageIoDecoder.featureBatch(
      Seq(Multimodal.pngBytes(40, 40, 100, 150, 200)), dim = 9).head
    assert(feats.length == 9)
    feats.foreach(f => assert(math.abs(f - lum / 255.0f) < 1e-6f, s"$f vs ${lum / 255.0}"))
    // junk blob -> zero vector, not a throw
    assert(Multimodal.ImageIoDecoder.featureBatch(Seq(Array[Byte](1, 2, 3)), 4).head
      .forall(_ == 0.0f))
  }

  test("withMeta + ImageIoDecoder end-to-end: real codec through the batched seam") {
    import spark.implicits._
    val df = (0 until 20).map(i => (i.toLong, Multimodal.pngBytes(16 + i, 31 - i, i, i, i)))
      .toDF("id", "blob").repartition(3)
    val got = Multimodal.withMeta(df, "blob", Multimodal.ImageIoDecoder, batchSize = 6)
      .select("id", "meta.kind", "meta.width", "meta.height").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getInt(2), r.getInt(3))).toMap
    (0 until 20).foreach(i => assert(got(i.toLong) == (("image", 16 + i, 31 - i))))
  }

  test("imageIoRoundtrip: decoded dims and pixel color equal the formula oracle") {
    import spark.implicits._
    val ids = Seq(0L, 1L, 47L, 48L, 95L, 1000L, 123456L).toDF("doc_id")
    val got = Multimodal.imageIoRoundtrip(ids, "doc_id")(spark).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    got.foreach { case (id, (w, h, r, g, b)) =>
      assert(w == 16 + id % 48 && h == 16 + (id / 48) % 48)
      assert(r == (id * 37) % 256 && g == (id * 59) % 256 && b == (id * 83) % 256)
    }
  }

  test("resizeImages: real pixel resize (Graphics2D) honors plan arithmetic and color") {
    import spark.implicits._
    val df = Seq(
      (1L, Multimodal.pngBytes(80, 40, 10, 200, 30)),   // downscale 4x -> 20x10
      (2L, Multimodal.pngBytes(16, 12, 5, 6, 7)),       // under maxEdge: untouched dims
      (3L, "junk".getBytes("UTF-8"))                    // undecodable: degrade, don't throw
    ).toDF("id", "blob")
    val got = Multimodal.resizeImages(df, "blob", "id", maxEdge = 20)(spark).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getAs[Array[Byte]](3))).toMap
    assert((got(1L)._1, got(1L)._2) == ((20, 10)))
    assert((got(2L)._1, got(2L)._2) == ((16, 12)))
    assert((got(3L)._1, got(3L)._2) == ((0, 0)) && got(3L)._3.isEmpty)
    // the resized blob is a REAL decodable PNG with the constant fill intact
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(got(1L)._3))
    assert(back.getWidth == 20 && back.getHeight == 10)
    val p = back.getRGB(5, 5)
    assert((((p >> 16) & 0xff), ((p >> 8) & 0xff), (p & 0xff)) == ((10, 200, 30)))
  }

  test("image near-dup composition: real decode -> grid features -> LSH cosine pairs") {
    import spark.implicits._
    // 32x32 images of 4x4 cells (8x8 px each, luminance 0 or 255) so the
    // dim=16 feature grid reads each cell exactly: features are 0/1 vectors
    def cellImage(bits: Set[Int]): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(32, 32, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (c <- 0 until 16; y <- 0 until 8; x <- 0 until 8) {
        val v = if (bits(c)) 0xffffff else 0
        img.setRGB((c % 4) * 8 + x, (c / 4) * 8 + y, v)
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val imgs = Seq(
      0L -> cellImage((0 to 7).toSet),          // base
      1L -> cellImage((0 to 6).toSet),          // near-dup of 0: cos = 7/sqrt(56) ~ 0.935
      2L -> cellImage((8 to 15).toSet),         // disjoint: cos 0
      3L -> cellImage(Set(0, 2, 4, 6, 8, 10, 12, 14)) // half-overlap with 0: cos 0.5
    ).toDF("id", "blob").repartition(2)
    val feats = Multimodal.withFeatures(imgs, "blob", dim = 16, Multimodal.ImageIoDecoder)
    // exact all-pairs ground truth at threshold 0.9
    val exact = Similarity.cosinePairs(feats, col("id"), col("features"), 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact == Set((0L, 1L)))
    // the scale path agrees (LSH buckets -> verify; same threshold)
    val lsh = Similarity.lshCosinePairs(feats, col("id"), col("features"), 0.9, dim = 16)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == Set((0L, 1L)))
  }

  test("resizePlan caps the max edge and preserves aspect (ceil)") {
    val planned = Multimodal.resizePlan(Multimodal.withMeta(mediaDf, "blob"), "meta", maxEdge = 256)
    planned.select("meta.width", "meta.height", "target_width", "target_height").collect().foreach { r =>
      val (w, h, tw, th) = (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3))
      assert(tw <= 256 + 1 && th <= 256 + 1)
      assert(tw <= w && th <= h)
      if (math.max(w, h) <= 256) assert(tw == w && th == h)
    }
  }
}
