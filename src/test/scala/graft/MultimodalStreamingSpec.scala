package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal
import graft.streaming.StreamingWindowAgg

class MultimodalStreamingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("multimodal: decode+featurize plumbing is deterministic and typed") {
    val media = Multimodal.synthetic(spark, 30)
    val out = Multimodal.decodeAndFeaturize(media, featureDim = 16)
    assert(out.schema.fieldNames.toSeq.takeRight(4) ==
      Seq("dec_width", "dec_height", "dec_mean_luma", "features"))
    val rows = out.orderBy("media_id").collect()
    assert(rows.length == 30)
    val feats = rows.head.getSeq[Float](rows.head.fieldIndex("features"))
    assert(feats.length == 16)
    // deterministic: same input → same decode
    val again = Multimodal.decodeAndFeaturize(media, featureDim = 16)
      .orderBy("media_id").collect()
    assert(again.head.getSeq[Float](again.head.fieldIndex("features")) == feats)
    // decoded dims are bounded as documented
    rows.foreach { r =>
      val w = r.getInt(r.fieldIndex("dec_width"))
      assert(w >= 64 && w < 1024)
    }
  }

  test("multimodal: real JPEG/PNG bytes decode through ImageIO with exact dims and luma") {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.Row
    def imageBytes(format: String, w: Int, h: Int, rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until w; y <- 0 until h) img.setRGB(x, y, rgb)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, format, bos)
      bos.toByteArray
    }
    val gray = 0x808080 // 128,128,128 → Rec.601 luma exactly 128/255
    val rows = Seq(
      Row(0L, "image", imageBytes("png", 37, 21, gray), "image/png",
        null, null, null, null),
      Row(1L, "image", imageBytes("jpg", 64, 48, gray), "image/jpeg",
        null, null, null, null),
      Row(2L, "audio", Array.tabulate[Byte](64)(_.toByte), "audio/wav",
        null, null, null, Integer.valueOf(16000)))
    val df = spark.createDataFrame(rows.asJava, Multimodal.mediaSchema)
    val out = Multimodal.decodeAndFeaturize(df).orderBy("media_id").collect()

    val png = out(0)
    assert(png.getInt(png.fieldIndex("dec_width")) == 37)
    assert(png.getInt(png.fieldIndex("dec_height")) == 21)
    assert(math.abs(png.getDouble(png.fieldIndex("dec_mean_luma")) - 128.0 / 255) < 1e-9)

    val jpg = out(1)
    assert(jpg.getInt(jpg.fieldIndex("dec_width")) == 64)
    assert(jpg.getInt(jpg.fieldIndex("dec_height")) == 48)
    // JPEG is lossy; the solid gray should still come back within ~2%
    assert(math.abs(jpg.getDouble(jpg.fieldIndex("dec_mean_luma")) - 128.0 / 255) < 0.02)

    // non-image bytes fall back to the deterministic stub, not a crash
    val audio = out(2)
    val (sw, sh, sl) = Multimodal.StubCodec.imageMeta(
      Array.tabulate[Byte](64)(_.toByte))
    assert(audio.getInt(audio.fieldIndex("dec_width")) == sw)
    assert(audio.getInt(audio.fieldIndex("dec_height")) == sh)
    assert(audio.getDouble(audio.fieldIndex("dec_mean_luma")) == sl)
  }

  test("multimodal: resize shrinks real pixels proportionally, re-encoded PNG") {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.Row
    def imageBytes(w: Int, h: Int, rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until w; y <- 0 until h) img.setRGB(x, y, rgb)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val rows = Seq(
      Row(0L, "image", imageBytes(200, 100, 0x808080), "image/png",
        null, null, null, null), // landscape, shrinks 2×
      Row(1L, "image", imageBytes(40, 80, 0x402080), "image/png",
        null, null, null, null), // already under maxDim: re-encode only
      Row(2L, "audio", Array.tabulate[Byte](32)(_.toByte), "audio/wav",
        null, null, null, null)) // undecodable → nulls
    val df = spark.createDataFrame(rows.asJava, Multimodal.mediaSchema)
    val out = Multimodal.resizeImages(df, maxDim = 100).orderBy("media_id").collect()

    assert(out(0).getInt(out(0).fieldIndex("rs_width")) == 100)
    assert(out(0).getInt(out(0).fieldIndex("rs_height")) == 50)
    // resized bytes are a real PNG of the claimed dims with preserved color
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
      out(0).getAs[Array[Byte]]("resized")))
    assert(back.getWidth == 100 && back.getHeight == 50)
    assert((back.getRGB(50, 25) & 0xffffff) == 0x808080)

    assert(out(1).getInt(out(1).fieldIndex("rs_width")) == 40)
    assert(out(1).getInt(out(1).fieldIndex("rs_height")) == 80)
    assert(out(2).isNullAt(out(2).fieldIndex("resized")))
    assert(out(2).isNullAt(out(2).fieldIndex("rs_width")))
  }

  test("multimodal: real WAV PCM decodes sample rate, frames, and RMS") {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.Row
    // synthesize a 16-bit mono WAV: 0.25s of a full-scale-half sine at 440Hz
    def wavBytes(rate: Int, seconds: Double, amp: Double): Array[Byte] = {
      val n = (rate * seconds).toInt
      val pcm = new Array[Byte](n * 2)
      val bb = java.nio.ByteBuffer.wrap(pcm)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      for (i <- 0 until n)
        bb.putShort((math.sin(2 * math.Pi * 440 * i / rate) * amp * 32767).toShort)
      val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val rows = Seq(
      Row(0L, "audio", wavBytes(16000, 0.25, 0.5), "audio/wav",
        null, null, null, Integer.valueOf(16000)),
      Row(1L, "audio", Array.tabulate[Byte](64)(_.toByte), "audio/mpeg",
        null, null, null, null)) // no JDK reader → nulls
    val df = spark.createDataFrame(rows.asJava, Multimodal.mediaSchema)
    val out = Multimodal.decodeAudio(df).orderBy("media_id").collect()

    val wav = out(0)
    assert(wav.getInt(wav.fieldIndex("au_sample_rate")) == 16000)
    assert(wav.getInt(wav.fieldIndex("au_channels")) == 1)
    assert(wav.getLong(wav.fieldIndex("au_frames")) == 4000L)
    // RMS of a 0.5-amplitude sine is 0.5/√2 ≈ 0.3536
    assert(math.abs(wav.getDouble(wav.fieldIndex("au_rms")) - 0.5 / math.sqrt(2)) < 0.01)

    assert(out(1).isNullAt(out(1).fieldIndex("au_sample_rate")))
    assert(out(1).isNullAt(out(1).fieldIndex("au_rms")))
  }

  test("multimodal: frame sampling explodes bounded frame indices") {
    val media = Multimodal.synthetic(spark, 30)
    val sampled = Multimodal.sampleFrameIndices(media, maxFrames = 8)
    val counts = sampled.groupBy("media_id").count().collect()
    assert(counts.nonEmpty)
    counts.foreach(r => assert(r.getLong(1) <= 8))
    assert(sampled.columns.contains("frame_idx"))
  }

  test("streaming: stream-stream interval join matches batch join") {
    import spark.implicits._
    val events = graft.core.Tables.t(spark, "/root/testdata/sf0.001", "events")
    val ldir = Files.createTempDirectory("graft-sj-l").toString
    val rdir = Files.createTempDirectory("graft-sj-r").toString
    events.where(col("event_type") === "view")
      .select("user_id", "ts", "event_id")
      .write.mode("overwrite").parquet(ldir)
    events.where(col("event_type") === "purchase")
      .select("user_id", "ts", "event_id")
      .withColumnRenamed("ts", "p_ts")
      .withColumnRenamed("event_id", "p_event_id")
      .write.mode("overwrite").parquet(rdir)
    val ls = spark.read.parquet(ldir).schema
    val rs = spark.read.parquet(rdir).schema

    val joined = StreamingWindowAgg.streamStreamIntervalJoin(
      spark, ldir, ls, rdir, rs, "user_id", "ts", "p_ts",
      upper = "1 DAY", lateness = "1 hour")
    StreamingWindowAgg.runAvailableNow(
      joined.select("event_id", "p_event_id"), "sj_out")

    val got = spark.sql("select * from sj_out").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = spark.read.parquet(ldir).alias("l")
      .join(spark.read.parquet(rdir).alias("r"),
        col("l.user_id") === col("r.user_id") &&
          col("p_ts") >= col("ts") &&
          col("p_ts") <= col("ts") + expr("INTERVAL 1 DAY"))
      .select("event_id", "p_event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.nonEmpty)
    assert(got == batch)
  }

  test("streaming: stateful dedup keeps first event per key") {
    import graft.streaming.StreamingDedup
    val events = graft.core.Tables.t(spark, "/root/testdata/sf0.001", "events")
    val dir = Files.createTempDirectory("graft-dedup").toString
    // duplicate the stream so every user_id appears at least twice
    events.select("user_id", "ts", "event_id")
      .write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
      .withWatermark("ts", "1 hour")
    val deduped = StreamingDedup.firstPerKey(spark, stream, "user_id", "ts")
    StreamingWindowAgg.runAvailableNow(deduped, "dedup_out")
    val got = spark.sql("select * from dedup_out")
    val nKeys = events.select("user_id").distinct().count()
    assert(got.count() == nKeys)
    // each emitted row is that user's earliest event
    val firsts = events.groupBy("user_id")
      .agg(min(struct(col("ts"), col("event_id"))).as("m"))
      .select(col("user_id"), col("m.event_id").as("event_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.collect().foreach { r =>
      assert(firsts(r.getAs[Long]("user_id")) == r.getAs[Long]("event_id"))
    }
  }

  test("streaming: windowed agg over events matches batch computation") {
    val events = graft.core.Tables.t(spark, "/root/testdata/sf0.001", "events")
    val dir = Files.createTempDirectory("graft-stream").toString
    events.write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema

    val stream = StreamingWindowAgg.windowedCounts(
      spark, dir, schema, "ts", "event_type", "value", "1 day", "1 day")
    StreamingWindowAgg.runAvailableNow(stream, "ev_counts")

    val got = spark.sql("select * from ev_counts")
    val batch = events
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n_events"))

    // append mode emits only windows closed w.r.t. the final watermark
    // (max event − 1 day); every emitted row must match the batch result.
    val gotSet = got.collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    val batchSet = batch.collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(gotSet.nonEmpty)
    assert(gotSet.subsetOf(batchSet))
  }
}
