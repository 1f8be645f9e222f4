package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.protocol.Op
import graft.streaming.StreamingLeftJoin

/** Streaming unbounded left-join changelog: a left row's null-padded
  * output retracts exactly once, when its first match arrives — the batch
  * engine's left-join delta op sequence observed over a stream.
  */
class StreamingLeftJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("null-pad retracts once when the first match arrives, pairs append") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val lMem = MemoryStream[(String, Long)]
    val rMem = MemoryStream[(String, Long)]
    val l = lMem.toDF.toDF("k", "quantity")
    val r = rMem.toDF.toDF("k", "shipped")
    val out = StreamingLeftJoin.leftJoin(spark, l, r, "k",
      Seq("shipped" -> "shipped"))
    val query = out.writeStream
      .format("memory").queryName("lj_out")
      .outputMode("append").start()
    def drain(): Seq[(String, Long, Any, Int)] = {
      query.processAllAvailable()
      spark.table("lj_out")
        .select("k", "quantity", "shipped", "op")
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.get(2), r.getInt(3)))
        .toSeq
    }
    try {
      // batch 1: left a arrives unmatched -> null-pad; right-only key b
      // emits nothing (left join)
      lMem.addData(("a", 10L))
      rMem.addData(("b", 5L))
      val b1 = drain()
      assert(b1.toSet == Set(("a", 10L, null, Op.Append)))

      // batch 2: first match for a -> retract the null-pad, append the pair
      rMem.addData(("a", 7L))
      val b2 = drain().diff(b1)
      assert(b2.toSet == Set(
        ("a", 10L, null, Op.Retract), ("a", 10L, 7L, Op.Append)))

      // batch 3: second match -> pair only, NO second retraction; and a new
      // left row pairs against the full right history immediately
      rMem.addData(("a", 9L))
      lMem.addData(("a", 20L))
      val b3 = drain().diff(b1 ++ b2)
      assert(b3.toSet == Set(
        ("a", 10L, 9L, Op.Append),
        ("a", 20L, 7L, Op.Append), ("a", 20L, 9L, Op.Append)))

      // batch 4: a late left row for key b pairs immediately (right row
      // buffered from batch 1 — right state serves future lefts)
      lMem.addData(("b", 30L))
      val b4 = drain().diff(b1 ++ b2 ++ b3)
      assert(b4.toSet == Set(("b", 30L, 5L, Op.Append)))
    } finally query.stop()
  }

  test("NULL join keys never match: left emits null-pad, right is dropped") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val lMem = MemoryStream[(Option[String], Long)]
    val rMem = MemoryStream[(Option[String], Long)]
    val l = lMem.toDF.toDF("k", "quantity")
    val r = rMem.toDF.toDF("k", "shipped")
    val out = StreamingLeftJoin.leftJoin(spark, l, r, "k",
      Seq("shipped" -> "shipped"))
    val query = out.writeStream
      .format("memory").queryName("lj_null")
      .outputMode("append").start()
    try {
      lMem.addData((None, 1L))
      rMem.addData((None, 2L))
      query.processAllAvailable()
      val rows = spark.table("lj_null")
        .select("quantity", "shipped", "op").collect()
        .map(r => (r.getLong(0), r.get(1), r.getInt(2))).toSet
      // SQL semantics: NULL = NULL is not a match
      assert(rows == Set((1L, null, Op.Append)))
    } finally query.stop()
  }

  test("float keys group by SQL equality: -0.0 matches 0.0, NaN matches NaN") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val lMem = MemoryStream[(Double, Long)]
    val rMem = MemoryStream[(Double, Long)]
    val l = lMem.toDF.toDF("k", "quantity")
    val r = rMem.toDF.toDF("k", "shipped")
    val out = StreamingLeftJoin.leftJoin(spark, l, r, "k",
      Seq("shipped" -> "shipped"))
    val query = out.writeStream
      .format("memory").queryName("lj_double")
      .outputMode("append").start()
    def drain(): Set[(Long, Any, Int)] = {
      query.processAllAvailable()
      spark.table("lj_double")
        .select("quantity", "shipped", "op").collect()
        .map(r => (r.getLong(0), r.get(1), r.getInt(2))).toSet
    }
    try {
      // batch 1: left -0.0 unmatched, left NaN unmatched -> null-pads
      lMem.addData((-0.0, 1L), (Double.NaN, 2L))
      val b1 = drain()
      assert(b1 == Set((1L, null, Op.Append), (2L, null, Op.Append)))

      // batch 2: right 0.0 must match the -0.0 left row (SQL groups them),
      // right NaN must match the NaN left row (SQL NaN = NaN in join keys)
      rMem.addData((0.0, 10L), (Double.NaN, 20L))
      val b2 = drain().diff(b1)
      assert(b2 == Set(
        (1L, null, Op.Retract), (1L, 10L, Op.Append),
        (2L, null, Op.Retract), (2L, 20L, Op.Append)))
    } finally query.stop()
  }

  test("binary keys group by content, not array identity") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val lMem = MemoryStream[(Array[Byte], Long)]
    val rMem = MemoryStream[(Array[Byte], Long)]
    val l = lMem.toDF.toDF("k", "quantity")
    val r = rMem.toDF.toDF("k", "shipped")
    val out = StreamingLeftJoin.leftJoin(spark, l, r, "k",
      Seq("shipped" -> "shipped"))
    val query = out.writeStream
      .format("memory").queryName("lj_binary")
      .outputMode("append").start()
    def drain(): Set[(Long, Any, Int)] = {
      query.processAllAvailable()
      spark.table("lj_binary")
        .select("quantity", "shipped", "op").collect()
        .map(r => (r.getLong(0), r.get(1), r.getInt(2))).toSet
    }
    try {
      lMem.addData((Array[Byte](1, 2), 1L), (Array[Byte](3), 2L))
      val b1 = drain()
      assert(b1 == Set((1L, null, Op.Append), (2L, null, Op.Append)))

      // a DISTINCT array instance with equal content must match (toString
      // keying would hash by identity and never pair)
      rMem.addData((Array[Byte](1, 2), 10L))
      val b2 = drain().diff(b1)
      assert(b2 == Set((1L, null, Op.Retract), (1L, 10L, Op.Append)))
    } finally query.stop()
  }
}
