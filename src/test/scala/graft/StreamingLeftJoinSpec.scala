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
}
