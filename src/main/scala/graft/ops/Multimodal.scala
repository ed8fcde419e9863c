package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata; decode / feature-extract /
  * frame-sample run as BATCHED executor-side stages (the JVM analogue of
  * Pandas-UDF-over-mapInPandas: fixed-size batches through a model seam).
  *
  * The decoders themselves are STUBS — the image/audio codec libraries are
  * not in this container — but deterministic fakes with the real batch shape,
  * so schemas, partitioning, batching and downstream operators are genuinely
  * exercised (and swap-in of a real codec is a one-class change).
  */
object Multimodal {

  final case class MediaMeta(kind: String, width: Int, height: Int, nFrames: Int, sampleRateHz: Int)

  trait MediaDecoder extends Serializable {
    /** One batched "codec" call: blobs -> metadata. */
    def decodeBatch(blobs: Seq[Array[Byte]]): Seq[MediaMeta]
    /** One batched feature-extractor call: blobs -> fixed-width embeddings. */
    def featureBatch(blobs: Seq[Array[Byte]], dim: Int): Seq[Array[Float]]
  }

  /** STUB decoder: metadata and features derived deterministically from the
    * bytes (FNV hash), standing in for a real codec/model. */
  object StubDecoder extends MediaDecoder {
    private def fnv(b: Array[Byte], seed: Long): Long = {
      var h = 0xcbf29ce484222325L ^ seed
      var i = 0
      while (i < b.length) { h = (h ^ (b(i) & 0xffL)) * 0x100000001b3L; i += 1 }
      h
    }
    def decodeBatch(blobs: Seq[Array[Byte]]): Seq[MediaMeta] = blobs.map { b =>
      val h = fnv(b, 0)
      val kind = Seq("image", "audio", "video")(math.floorMod(h, 3L).toInt)
      MediaMeta(kind,
        width = 64 + math.floorMod(h >> 8, 1024L).toInt,
        height = 64 + math.floorMod(h >> 18, 1024L).toInt,
        nFrames = if (kind == "video") 1 + math.floorMod(h >> 28, 240L).toInt else 1,
        sampleRateHz = if (kind == "audio") 16000 else 0)
    }
    def featureBatch(blobs: Seq[Array[Byte]], dim: Int): Seq[Array[Float]] = blobs.map { b =>
      Array.tabulate(dim)(d => (math.floorMod(fnv(b, d.toLong), 2048L) - 1024L) / 1024.0f)
    }
  }

  private val metaSchema = Encoders.product[MediaMeta].schema

  /** Append a decoded `meta` struct column, processing `batchSize` blobs per
    * decoder call inside mapPartitions (batched inference shape). */
  def withMeta(df: DataFrame, binCol: String, decoder: MediaDecoder = StubDecoder,
      batchSize: Int = 32)(implicit spark: SparkSession): DataFrame = {
    val schema = df.schema.add("meta", metaSchema)
    implicit val enc: Encoder[Row] = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val idx = df.schema.fieldIndex(binCol)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val metas = decoder.decodeBatch(batch.map(_.getAs[Array[Byte]](idx)))
        batch.zip(metas).map { case (r, m) =>
          Row.fromSeq(r.toSeq :+ Row(m.kind, m.width, m.height, m.nFrames, m.sampleRateHz))
        }
      }
    }
  }

  /** Append a fixed-width `features` array column (batched extractor calls). */
  def withFeatures(df: DataFrame, binCol: String, dim: Int,
      decoder: MediaDecoder = StubDecoder, batchSize: Int = 32)(
      implicit spark: SparkSession): DataFrame = {
    val schema = df.schema.add("features", org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.FloatType, containsNull = false))
    implicit val enc: Encoder[Row] = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val idx = df.schema.fieldIndex(binCol)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val feats = decoder.featureBatch(batch.map(_.getAs[Array[Byte]](idx)), dim)
        batch.zip(feats).map { case (r, f) => Row.fromSeq(r.toSeq :+ f.toSeq) }
      }
    }
  }

  /** Frame sampling plan for video rows: one output row per sampled frame
    * index (declarative — sequence+explode, no decode needed for planning). */
  def frameSample(df: DataFrame, metaCol: String, everyN: Int): DataFrame =
    df.filter(col(s"$metaCol.kind") === "video")
      .withColumn("frame_index",
        explode(sequence(lit(0), col(s"$metaCol.nFrames") - 1, lit(everyN))))

  /** Materialized frame/patch extraction over an opaque payload: one fixed
    * -size window every `stride` positions, each window's bytes hashed — the
    * full fan-out shape of frame extraction (window arithmetic, per-frame
    * rows, content digests) with the codec replaced by a hash, so it is
    * oracle-checkable end to end. Map-side only: sequence+explode fans out to
    * one row per frame with no shuffle; a real decoder slots into the
    * per-window expression. Windows are character-addressed (the synthetic
    * payloads are ASCII; a BLOB-addressed variant is blocked by the oracle
    * engine, which cannot slice blobs). */
  def frameExtract(df: DataFrame, payload: Column, id: Column,
      stride: Int, flen: Int): DataFrame =
    df.select(id.as("id"), payload.as("t"), length(payload).cast("long").as("len"))
      .filter(col("len") >= flen)
      .withColumn("n", ((col("len") - lit(flen)) / lit(stride)).cast("long") + 1)
      .select(col("id"), col("t"),
        explode(sequence(lit(0L), col("n") - 1)).as("frame_idx"))
      .select(col("id"), col("frame_idx"),
        md5(encode(expr(s"substring(t, cast(frame_idx * $stride + 1 as int), $flen)"),
          "UTF-8")).as("frame_hash"))

  /** Resize plan: target dims preserving aspect ratio under a max edge —
    * pure column arithmetic; the actual pixel work happens at decode time. */
  def resizePlan(df: DataFrame, metaCol: String, maxEdge: Int): DataFrame = {
    val w = col(s"$metaCol.width").cast("double")
    val h = col(s"$metaCol.height").cast("double")
    val scale = least(lit(1.0), lit(maxEdge) / greatest(w, h))
    df.withColumn("target_width", ceil(w * scale).cast("int"))
      .withColumn("target_height", ceil(h * scale).cast("int"))
  }
}
