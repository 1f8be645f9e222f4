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
  * The actual codec calls are STUBBED (this container has no image/audio
  * libraries): [[StubCodec]] produces deterministic fake decodes derived
  * from the bytes. The Spark-side contract — schemas, batch shape,
  * partitioning, null handling — is real and tested; swapping
  * [[StubCodec]] for a JNI/javacpp codec is a local change.
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
