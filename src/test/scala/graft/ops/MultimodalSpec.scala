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
