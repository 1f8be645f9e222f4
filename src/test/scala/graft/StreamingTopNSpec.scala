package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.protocol.Op
import graft.streaming.StreamingTopN

/** Streaming partitioned Top-N changelog: per micro-batch, ranks fill with
  * +I and change hands with -U/+U — the batch engine's snapshot-diff op
  * sequences (EngineTopNTest semantics) observed over a stream.
  */
class StreamingTopNSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("ranks fill with +I and change hands with -U/+U across batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val mem = MemoryStream[(String, String, Double, Long)]
    val df = mem.toDF.toDF("league", "player", "score", "offset")
    val out = StreamingTopN.topN(spark, df, "league", "score", "offset", n = 2)
    val query = out.writeStream
      .format("memory").queryName("topn_out")
      .outputMode("append").start()
    def drain(): Seq[(String, String, Long, Int)] = {
      query.processAllAvailable()
      val rows = spark.table("topn_out")
        .select("league", "player", "rank", "op")
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3)))
        .toSeq
      rows // memory sink accumulates; callers diff against earlier drains
    }
    try {
      // batch 1: two players -> both ranks fill with +I
      mem.addData(("x", "alice", 10.0, 0L), ("x", "bob", 20.0, 1L))
      val b1 = drain()
      assert(b1.toSet == Set(
        ("x", "bob", 1L, Op.Append), ("x", "alice", 2L, Op.Append)))

      // batch 2: carol (15) displaces alice from rank 2 -> -U/+U pair;
      // rank 1 untouched, nothing re-emits for bob
      mem.addData(("x", "carol", 15.0, 2L))
      val b2 = drain().diff(b1)
      assert(b2.toSet == Set(
        ("x", "alice", 2L, Op.CorrectFrom), ("x", "carol", 2L, Op.CorrectTo)))

      // batch 3: duplicate redelivery of carol is collapsed; a second
      // league ranks independently
      mem.addData(("x", "carol", 15.0, 2L), ("y", "dan", 5.0, 3L))
      val b3 = drain().diff(b1 ++ b2)
      assert(b3.toSet == Set(("y", "dan", 1L, Op.Append)))
    } finally query.stop()
  }

  test("NULL partition key does not collide with the string \"null\"") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val mem = MemoryStream[(Option[String], String, Double, Long)]
    val df = mem.toDF.toDF("league", "player", "score", "offset")
    val out = StreamingTopN.topN(spark, df, "league", "score", "offset", n = 1)
    val query = out.writeStream
      .format("memory").queryName("topn_null")
      .outputMode("append").start()
    try {
      mem.addData((None, "anon", 1.0, 0L), (Some("null"), "named", 2.0, 1L))
      query.processAllAvailable()
      val rows = spark.table("topn_null")
        .select("player", "rank", "op").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
      // two distinct partitions -> each player holds rank 1 of its own
      assert(rows == Set(("anon", 1L, Op.Append), ("named", 1L, Op.Append)))
    } finally query.stop()
  }

  test("bigint sort values above 2^53 rank exactly (no double collapse)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val mem = MemoryStream[(String, String, Long, Long)]
    val df = mem.toDF.toDF("league", "player", "score", "offset")
    val out = StreamingTopN.topN(spark, df, "league", "score", "offset", n = 1)
    val query = out.writeStream
      .format("memory").queryName("topn_big")
      .outputMode("append").start()
    try {
      // 2^53 and 2^53+1 collapse to the same Double; the lower tie (bob)
      // would then steal rank 1 from the truly-larger score (alice)
      mem.addData(("x", "bob", 9007199254740992L, 0L),
        ("x", "alice", 9007199254740993L, 1L))
      query.processAllAvailable()
      val rows = spark.table("topn_big")
        .select("player", "rank", "op").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
      assert(rows == Set(("alice", 1L, Op.Append)))
    } finally query.stop()
  }
}
