package graft

import java.sql.Timestamp
import java.time.Instant

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOfJoin
import graft.streaming.StreamingAsOf

/** Streaming as-of join: hold-back until the union watermark passes the
  * probe, agreement with the batch operator, and late-probe service from
  * compacted state.
  */
class StreamingAsOfSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def ts(day: Int, hour: Int = 0): Timestamp =
    Timestamp.from(Instant.parse(f"2000-01-${day}%02dT${hour}%02d:00:00Z"))

  test("streaming as-of: hold-back, batch agreement, late probe") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val probeMem = MemoryStream[(String, Timestamp, Int)]
    val buildMem = MemoryStream[(String, Timestamp, Int)]
    val probeDf = probeMem.toDF.toDF("symbol", "event_time", "price")
    val buildDf = buildMem.toDF.toDF("symbol", "event_time", "volume")

    val joined = StreamingAsOf.leftAsOf(
      spark, probeDf, buildDf, "symbol", "event_time", "event_time",
      buildCols = Seq("volume" -> "volume"), delay = "0 seconds")

    val query = joined.writeStream
      .format("memory").queryName("asof_out")
      .outputMode("append").start()
    try {
      // batch 1: day-10 sentinels advance the union watermark to day 10,
      // so probes at-or-under day 10 emit; the day-12 probe must hold back
      probeMem.addData(
        ("A", ts(1, 12), 100), ("A", ts(2), 110), ("A", ts(4), 140),
        ("B", ts(3), 70),
        ("A", ts(12), 9999), // beyond the watermark: held in state
        ("A", ts(10), 999))  // sentinel advances the probe-side watermark
      buildMem.addData(
        ("A", ts(3), 7), ("A", ts(1), 5), // out of order on purpose
        ("B", ts(1), 2),
        ("B", ts(10), 9)) // sentinel advances the build-side watermark
      query.processAllAvailable()
      val afterB1 = spark.sql("select price from asof_out").collect()
        .map(_.getInt(0)).toSet
      assert(!afterB1.contains(9999),
        "a probe beyond the watermark must hold back")
      assert(afterB1 == Set(100, 110, 140, 70, 999))

      // batch 2: day-20 sentinels release the held-back day-12 probe
      probeMem.addData(("C", ts(20), 1))
      buildMem.addData(("C", ts(20), 1))
      query.processAllAvailable()
      val got = spark.sql("select symbol, event_time, price, volume from asof_out")
        .where(col("symbol") =!= "C")
        .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getInt(2),
          if (r.isNullAt(3)) -1 else r.getInt(3))).toSet
      assert(got.contains(("A", ts(12), 9999, 7)), "released with day-3 version")

      // batch oracle over the same rows
      val probeBatch = Seq(
        ("A", ts(1, 12), 100), ("A", ts(2), 110), ("A", ts(4), 140),
        ("B", ts(3), 70), ("A", ts(12), 9999), ("A", ts(10), 999))
        .toDF("symbol", "event_time", "price")
      val buildBatch = Seq(
        ("A", ts(3), 7), ("A", ts(1), 5), ("B", ts(1), 2), ("B", ts(10), 9))
        .toDF("symbol", "event_time", "volume")
      val expected = AsOfJoin.leftAsOf(
          probeBatch, buildBatch, Seq("symbol"), "event_time", "event_time",
          buildCols = Seq("volume" -> "volume"))
        .collect().map(r => (r.getString(r.fieldIndex("symbol")),
          r.getTimestamp(r.fieldIndex("event_time")),
          r.getInt(r.fieldIndex("price")),
          if (r.isNullAt(r.fieldIndex("volume"))) -1
          else r.getInt(r.fieldIndex("volume")))).toSet
      assert(got == expected)
      assert(got.contains(("A", ts(1, 12), 100, 5))) // version at day 1
      assert(got.contains(("A", ts(4), 140, 7)))     // version at day 3

      // batch 3: a probe LATER than the watermark is dropped by the
      // stateful-operator late-row filter (delay = allowed lateness),
      // mirroring the reference's bounded-out-of-orderness contract
      probeMem.addData(("A", ts(2, 6), 555))
      probeMem.addData(("C", ts(21), 1)) // nudge
      buildMem.addData(("C", ts(21), 1))
      query.processAllAvailable()
      assert(spark.sql(
        "select * from asof_out where price = 555").collect().isEmpty)
    } finally query.stop()
  }

  test("float keys group by SQL equality: a -0.0 probe reads 0.0 versions") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val probeMem = MemoryStream[(Double, Timestamp, Int)]
    val buildMem = MemoryStream[(Double, Timestamp, Int)]
    val probeDf = probeMem.toDF.toDF("k", "event_time", "price")
    val buildDf = buildMem.toDF.toDF("k", "event_time", "volume")

    val joined = StreamingAsOf.leftAsOf(
      spark, probeDf, buildDf, "k", "event_time", "event_time",
      buildCols = Seq("volume" -> "volume"), delay = "0 seconds")
    val query = joined.writeStream
      .format("memory").queryName("asof_double")
      .outputMode("append").start()
    try {
      // the -0.0 probe must read the 0.0-keyed version (toString keying
      // would put them in different state groups and emit a null pad),
      // and the NaN probe must read the NaN-keyed version
      probeMem.addData(
        (-0.0, ts(2), 100), (Double.NaN, ts(2), 200),
        (99.0, ts(10), 999)) // sentinel advances the probe watermark
      buildMem.addData(
        (0.0, ts(1), 5), (Double.NaN, ts(1), 7),
        (99.0, ts(10), 9)) // sentinel advances the build watermark
      query.processAllAvailable()
      val got = spark.sql("select price, volume from asof_double")
        .where(col("price") =!= 999)
        .collect().map(r => (r.getInt(0),
          if (r.isNullAt(1)) -1 else r.getInt(1))).toSet
      assert(got == Set((100, 5), (200, 7)))
    } finally query.stop()
  }
}
