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

  /** REAL image decoder over the JDK's built-in `javax.imageio` — zero added
    * dependencies, so this closes the decode seam for the IMAGE modality
    * (audio/video codecs remain environment-blocked and keep the stub).
    * decodeBatch reads true pixel dimensions from the encoded bytes (PNG/
    * JPEG/BMP/GIF — whatever the JDK reader registry supports); featureBatch
    * computes a real pixel statistic: mean luminance (ITU-R 601 integer
    * weights) over a near-square `dim`-cell grid, normalized to [0,1].
    * Undecodable blobs degrade to kind="unknown" / zero features rather than
    * failing the batch (a poisoned payload must not kill a 100 TB stage). */
  object ImageIoDecoder extends MediaDecoder {
    javax.imageio.ImageIO.setUseCache(false) // no temp-file cache on executors
    // NonFatal, not just IOException: hostile/corrupt headers can surface as
    // runtime exceptions from format readers, and the degrade-don't-die
    // contract has to hold for those too
    private def read(b: Array[Byte]): Option[java.awt.image.BufferedImage] =
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b)))
      catch { case scala.util.control.NonFatal(_) => None }
    def decodeBatch(blobs: Seq[Array[Byte]]): Seq[MediaMeta] = blobs.map { b =>
      read(b) match {
        case Some(img) => MediaMeta("image", img.getWidth, img.getHeight, 1, 0)
        case None      => MediaMeta("unknown", 0, 0, 0, 0)
      }
    }
    def featureBatch(blobs: Seq[Array[Byte]], dim: Int): Seq[Array[Float]] = blobs.map { b =>
      read(b) match {
        case None => Array.fill(dim)(0.0f)
        case Some(img) =>
          val gx = math.ceil(math.sqrt(dim.toDouble)).toInt
          val gy = (dim + gx - 1) / gx
          val (w, h) = (img.getWidth, img.getHeight)
          Array.tabulate(dim) { d =>
            val (cx, cy) = (d % gx, d / gx)
            val (x0, x1) = (cx * w / gx, math.max((cx + 1) * w / gx, cx * w / gx + 1))
            val (y0, y1) = (cy * h / gy, math.max((cy + 1) * h / gy, cy * h / gy + 1))
            if (x0 >= w || y0 >= h) 0.0f
            else {
              var (sum, n) = (0L, 0L)
              var y = y0
              while (y < math.min(y1, h)) {
                var x = x0
                while (x < math.min(x1, w)) {
                  val rgb = img.getRGB(x, y)
                  sum += (299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
                    114L * (rgb & 0xff)) / 1000L
                  n += 1; x += 1
                }
                y += 1
              }
              (sum.toDouble / (n * 255.0)).toFloat
            }
          }
      }
    }
  }

  /** Deterministic PNG fixture bytes: `width`×`height`, constant RGB fill —
    * PNG is lossless, so a decode reads the exact dims and color back. */
  def pngBytes(width: Int, height: Int, r: Int, g: Int, b: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (r << 16) | (g << 8) | b
    var y = 0
    while (y < height) { var x = 0; while (x < width) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** REAL pixel resize executor-side (JDK Graphics2D, zero deps): decode the
    * payload, scale to the aspect-preserving target under `maxEdge` (the same
    * arithmetic as [[resizePlan]]), re-encode as PNG. Map-side only — the
    * 100 TB shape is one batched decode→scale→encode sweep per partition.
    * Undecodable payloads pass through with target dims (0,0) and an empty
    * blob rather than failing the stage. Output: (id, target_width,
    * target_height, resized) with `resized` a PNG binary. */
  def resizeImages(df: DataFrame, binCol: String, idCol: String, maxEdge: Int)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val idx = df.schema.fieldIndex(binCol)
    val idIdx = df.schema.fieldIndex(idCol)
    df.toDF().mapPartitions { it =>
      it.map { row =>
        val id = row.getLong(idIdx)
        val blob = row.getAs[Array[Byte]](idx)
        val img =
          try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(blob)))
          catch { case scala.util.control.NonFatal(_) => None }
        img match {
          case None => (id, 0, 0, Array.emptyByteArray)
          case Some(src) =>
            val (w, h) = (src.getWidth, src.getHeight)
            val scale = math.min(1.0, maxEdge.toDouble / math.max(w, h))
            val (tw, th) = (math.ceil(w * scale).toInt, math.ceil(h * scale).toInt)
            val dst = new java.awt.image.BufferedImage(
              tw, th, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g2 = dst.createGraphics()
            try g2.drawImage(src, 0, 0, tw, th, null) finally g2.dispose()
            val out = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(dst, "png", out)
            (id, tw, th, out.toByteArray)
        }
      }
    }.toDF(idCol, "target_width", "target_height", "resized")
  }

  /** Oracle-checkable REAL resize chain: formula-derived constant-fill PNG →
    * [[resizeImages]]-style decode→Graphics2D scale→re-encode → decode AGAIN
    * and emit what the second decode reads (dims of the resized image +
    * pixel (0,0), preserved exactly by scaling a constant image). The oracle
    * recomputes target dims with the same IEEE double arithmetic
    * (ceil(w · min(1, maxEdge/max(w,h)))) and colors by formula — hash-exact
    * rows prove decode, real pixel scaling, re-encode and re-decode through
    * the actual JDK codec. Map-side only. */
  def imageIoResize(df: DataFrame, idCol: String, maxEdge: Int)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long].mapPartitions { it =>
      it.map { id =>
        val (w, h) = (16 + math.floorMod(id, 48L).toInt, 16 + math.floorMod(id / 48L, 48L).toInt)
        val (r, g, b) = (math.floorMod(id * 37L, 256L).toInt,
          math.floorMod(id * 59L, 256L).toInt, math.floorMod(id * 83L, 256L).toInt)
        val src = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(pngBytes(w, h, r, g, b)))
        val scale = math.min(1.0, maxEdge.toDouble / math.max(src.getWidth, src.getHeight))
        val (tw, th) = (math.ceil(src.getWidth * scale).toInt, math.ceil(src.getHeight * scale).toInt)
        val dst = new java.awt.image.BufferedImage(
          tw, th, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g2 = dst.createGraphics()
        try g2.drawImage(src, 0, 0, tw, th, null) finally g2.dispose()
        val out = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(dst, "png", out)
        val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(out.toByteArray))
        val p0 = back.getRGB(0, 0)
        (id, back.getWidth.toLong, back.getHeight.toLong,
          ((p0 >> 16) & 0xff).toLong, ((p0 >> 8) & 0xff).toLong, (p0 & 0xff).toLong)
      }
    }.toDF(idCol, "target_width", "target_height", "r", "g", "b")
  }

  /** Oracle-checkable REAL-codec roundtrip: for each id, derive
    * (width, height, r, g, b) by fixed integer formulas, ENCODE a constant-
    * fill PNG of exactly that shape executor-side, then DECODE it back with
    * [[ImageIoDecoder]]'s reader and emit what the decoder actually read
    * (dims from the header, color from pixel (0,0)). The oracle recomputes
    * the same formulas relationally — a hash-exact row proves the encode→
    * decode path through the real JDK codec, not a stub. Map-side only
    * (mapPartitions, no shuffle); at 100 TB this is the exact shape of a
    * decode stage: one batched codec call per partition sweep. */
  def imageIoRoundtrip(df: DataFrame, idCol: String)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long].mapPartitions { it =>
      it.map { id =>
        val (w, h) = (16 + math.floorMod(id, 48L).toInt, 16 + math.floorMod(id / 48L, 48L).toInt)
        val (r, g, b) = (math.floorMod(id * 37L, 256L).toInt,
          math.floorMod(id * 59L, 256L).toInt, math.floorMod(id * 83L, 256L).toInt)
        val png = pngBytes(w, h, r, g, b)
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
        val p0 = img.getRGB(0, 0)
        (id, img.getWidth.toLong, img.getHeight.toLong,
          ((p0 >> 16) & 0xff).toLong, ((p0 >> 8) & 0xff).toLong, (p0 & 0xff).toLong)
      }
    }.toDF(idCol, "width", "height", "r", "g", "b")
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
