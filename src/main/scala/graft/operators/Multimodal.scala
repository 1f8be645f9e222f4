package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines: media ride as opaque `binary` columns with typed metadata;
  * decode / feature-extraction / frame-sampling run batch-wise inside
  * `mapPartitions` (the Scala analogue of `mapInPandas` — one JVM call per
  * partition, vectorizable inner loop, no per-row UDF dispatch).
  *
  * Image decode/resize (ImageIO + Graphics2D) and PCM audio decode
  * (javax.sound.sampled) are REAL, JDK-only. Only media without a JDK
  * reader (video codecs, mp3/ogg) falls back to [[StubCodec]]'s
  * deterministic fakes; the Spark-side contract — schemas, batch shape,
  * partitioning, null handling — is identical on both paths, so swapping
  * the stub for a JNI/javacpp codec is a local change.
  */
object Multimodal {

  /** Typed metadata carried alongside each media blob. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image|audio|video
    StructField("content", BinaryType, nullable = true),
    StructField("mime", StringType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("n_frames", IntegerType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true)))

  /** Real image decoding via JDK ImageIO (JPEG/PNG/GIF/BMP — no external
    * dependencies). Returns None for bytes no installed reader understands,
    * so callers can fall back to [[StubCodec]] for media kinds this
    * container has no codec for (audio/video).
    */
  object ImageCodec {
    /** Decode an image: (width, height, mean Rec.601 luma in [0,1]). */
    def imageMeta(bytes: Array[Byte]): Option[(Int, Int, Double)] = {
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        catch { case scala.util.control.NonFatal(_) => null }
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val px = img.getRGB(0, 0, w, h, null, 0, w)
        var sum = 0.0
        var i = 0
        while (i < px.length) {
          val p = px(i)
          sum += 0.299 * ((p >> 16) & 0xff) + 0.587 * ((p >> 8) & 0xff) +
            0.114 * (p & 0xff)
          i += 1
        }
        Some((w, h, sum / (px.length * 255.0)))
      }
    }
  }

  /** Real audio decoding via javax.sound.sampled (WAV/AIFF/AU PCM — JDK
    * only, no external dependencies). Returns None for formats without an
    * installed reader (mp3/ogg/aac), which fall back to [[StubCodec]].
    */
  object AudioCodec {
    /** Decode: (sampleRate, channels, nFrames, rms amplitude in [0,1]). */
    def audioMeta(bytes: Array[Byte]): Option[(Int, Int, Long, Double)] =
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val fmt = in.getFormat
          val nFrames = in.getFrameLength
          val frameSize = fmt.getFrameSize
          val data = in.readAllBytes()
          val bits = fmt.getSampleSizeInBits
          var sumSq = 0.0
          var n = 0
          if (bits == 16) {
            val bb = java.nio.ByteBuffer.wrap(data).order(
              if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
              else java.nio.ByteOrder.LITTLE_ENDIAN)
            while (bb.remaining() >= 2) {
              val s = bb.getShort / 32768.0
              sumSq += s * s
              n += 1
            }
          } else if (bits == 8) {
            var i = 0
            while (i < data.length) {
              val s = (data(i) & 0xff) / 128.0 - 1.0
              sumSq += s * s
              n += 1
              i += 1
            }
          }
          val rms = if (n == 0) 0.0 else math.sqrt(sumSq / n)
          val frames =
            if (nFrames >= 0) nFrames
            else if (frameSize > 0) data.length.toLong / frameSize
            else 0L
          Some((fmt.getSampleRate.toInt, fmt.getChannels, frames, rms))
        } finally in.close()
      } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** STUB codec — deterministic fakes in place of real decoders for the
    * media kinds this container has no library for (audio/video).
    * Every function is pure on the input bytes, so pipelines are
    * reproducible end-to-end in tests.
    */
  object StubCodec {
    /** "Decode" an image: returns (width, height, meanLuma) derived from a
      * stable hash of the bytes. A real impl would call a JPEG/PNG decoder.
      */
    def imageMeta(bytes: Array[Byte]): (Int, Int, Double) = {
      val h = scala.util.hashing.MurmurHash3.bytesHash(bytes, 42)
      val w = 64 + math.floorMod(h, 960)
      val ht = 64 + math.floorMod(h >> 10, 960)
      (w, ht, math.floorMod(h >> 20, 256) / 255.0)
    }

    /** "Extract" a dim-sized feature vector from media bytes (stable hash
      * chain). A real impl would run an encoder model.
      */
    def features(bytes: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var h = scala.util.hashing.MurmurHash3.bytesHash(bytes, 7)
      var i = 0
      while (i < dim) {
        h = scala.util.hashing.MurmurHash3.productHash((h, i))
        out(i) = ((h & 0xffff) / 32768.0f) - 1.0f
        i += 1
      }
      out
    }
  }

  /** Attach decoded image metadata + a feature vector, batch-wise per
    * partition. Media tables should be range-partitioned on media_id
    * upstream so decode work spreads evenly (blobs make row sizes large —
    * at 100 TB keep `spark.sql.files.maxPartitionBytes` small enough that
    * a partition of blobs fits in executor memory).
    *
    * Image bytes decode for REAL through JDK ImageIO ([[ImageCodec]]);
    * bytes no image reader understands (audio/video, corrupt blobs) fall
    * back to the deterministic [[StubCodec]] so pipelines stay total.
    * Feature extraction stays stubbed — no encoder model ships here.
    */
  def decodeAndFeaturize(df: DataFrame, featureDim: Int = 64): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("dec_width", IntegerType, nullable = true),
      StructField("dec_height", IntegerType, nullable = true),
      StructField("dec_mean_luma", DoubleType, nullable = true),
      StructField("features", ArrayType(FloatType), nullable = true)))
    val enc = Encoders.row(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]]("content")
        if (bytes == null) Row.fromSeq(r.toSeq ++ Seq(null, null, null, null))
        else {
          val (w, h, luma) = ImageCodec.imageMeta(bytes)
            .getOrElse(StubCodec.imageMeta(bytes))
          val feats = StubCodec.features(bytes, featureDim)
          Row.fromSeq(r.toSeq ++ Seq(w, h, luma, feats.toSeq))
        }
      }
    }(enc)
  }

  /** Proportionally resize every decodable image so its longer side is at
    * most `maxDim`, re-encoded as PNG — real pixels through JDK
    * Graphics2D, batch-wise per partition like all media ops. Rows whose
    * bytes no image reader understands (audio/video, corrupt) pass through
    * with null resized columns. Already-small images are re-encoded, not
    * upscaled, so the output column is uniformly PNG.
    *
    * @return input columns + (resized BINARY, rs_width INT, rs_height INT)
    */
  def resizeImages(df: DataFrame, maxDim: Int): DataFrame = {
    require(maxDim > 0, s"maxDim must be positive, got $maxDim")
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("resized", BinaryType, nullable = true),
      StructField("rs_width", IntegerType, nullable = true),
      StructField("rs_height", IntegerType, nullable = true)))
    val enc = Encoders.row(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]]("content")
        val img =
          if (bytes == null) null
          else
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            catch { case scala.util.control.NonFatal(_) => null }
        if (img == null) Row.fromSeq(r.toSeq ++ Seq(null, null, null))
        else {
          val scale = math.min(1.0,
            maxDim.toDouble / math.max(img.getWidth, img.getHeight))
          val w = math.max(1, math.round(img.getWidth * scale).toInt)
          val h = math.max(1, math.round(img.getHeight * scale).toInt)
          val dst = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = dst.createGraphics()
          g.setRenderingHint(
            java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, w, h, null)
          g.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(dst, "png", bos)
          Row.fromSeq(r.toSeq ++ Seq(bos.toByteArray, w, h))
        }
      }
    }(enc)
  }

  /** Attach decoded audio metadata, batch-wise: real decode for WAV/AIFF
    * PCM through [[AudioCodec]]; other formats get nulls (callers decide
    * between dropping and stub-backed pipelines).
    *
    * @return input columns + (au_sample_rate INT, au_channels INT,
    *         au_frames BIGINT, au_rms DOUBLE)
    */
  def decodeAudio(df: DataFrame): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("au_sample_rate", IntegerType, nullable = true),
      StructField("au_channels", IntegerType, nullable = true),
      StructField("au_frames", LongType, nullable = true),
      StructField("au_rms", DoubleType, nullable = true)))
    val enc = Encoders.row(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]]("content")
        val meta = if (bytes == null) None else AudioCodec.audioMeta(bytes)
        meta match {
          case Some((sr, ch, fr, rms)) =>
            // Seq[Any]: an unannotated all-numeric Seq weakly unifies to
            // Seq[Double], silently boxing the INT fields as Double
            Row.fromSeq(r.toSeq ++ Seq[Any](sr, ch, fr, rms))
          case None => Row.fromSeq(r.toSeq ++ Seq(null, null, null, null))
        }
      }
    }(enc)
  }

  /** Uniformly sample up to `maxFrames` frame indices per video row —
    * pure relational explode, no decode: downstream stages fetch/decode
    * only the sampled frames (the standard way to avoid decoding whole
    * videos at scale).
    *
    * @return input columns + frame_idx
    */
  def sampleFrameIndices(df: DataFrame, maxFrames: Int): DataFrame = {
    val n = coalesce(col("n_frames"), lit(0))
    val step = greatest(lit(1), ((n + maxFrames - 1) / maxFrames).cast("int"))
    df.where(col("kind") === "video" && n > 0)
      .withColumn("frame_idx",
        explode(sequence(lit(0), n - 1, step)))
  }

  /** Deterministic synthetic media table for tests/demos. */
  def synthetic(spark: SparkSession, n: Int): DataFrame = {
    import scala.jdk.CollectionConverters._
    val rows = (0 until n).map { i =>
      val kind = Seq("image", "audio", "video")(i % 3)
      val bytes = Array.tabulate[Byte](128)(j => ((i * 131 + j * 7) % 251).toByte)
      Row(i.toLong, kind, bytes,
        Map("image" -> "image/jpeg", "audio" -> "audio/wav",
          "video" -> "video/mp4")(kind),
        if (kind == "image") Integer.valueOf(640) else null,
        if (kind == "image") Integer.valueOf(480) else null,
        if (kind == "video") Integer.valueOf(30 + i % 300) else null,
        if (kind == "audio") Integer.valueOf(16000) else null)
    }
    spark.createDataFrame(rows.asJava, mediaSchema)
  }
}
