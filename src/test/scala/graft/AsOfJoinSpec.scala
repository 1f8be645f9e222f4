package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOfJoin

class AsOfJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("leftAsOf: inclusive bound, nulls when no version yet") {
    import spark.implicits._
    val probe = Seq(("k1", 5L), ("k1", 10L), ("k1", 2L), ("k2", 5L))
      .toDF("key", "pt")
    val build = Seq(("k1", 3L, "a"), ("k1", 10L, "b"))
      .toDF("key", "bt", "v")
    val out = AsOfJoin.leftAsOf(probe, build, Seq("key"), "pt", "bt",
        Seq("v" -> "v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(out == Set(
      ("k1", 5L, "a"),
      ("k1", 10L, "b"), // inclusive: version at exactly probe time wins
      ("k1", 2L, null), // before first version
      ("k2", 5L, null)  // key never built
    ))
  }

  test("leftAsOf: buildSeq orders versions within one timestamp") {
    import spark.implicits._
    val probe = Seq(("k", 5L)).toDF("key", "pt")
    val build = Seq(("k", 5L, 1L, "old"), ("k", 5L, 2L, "new"))
      .toDF("key", "bt", "seqno", "v")
    val out = AsOfJoin.leftAsOf(probe, build, Seq("key"), "pt", "bt",
        Seq("v" -> "v"), buildSeq = Some("seqno"))
      .collect().map(_.getString(2)).toSeq
    assert(out == Seq("new"))
  }

  test("leftAsOf: struct carry never mixes fields across versions") {
    import spark.implicits._
    val probe = Seq(("k", 10L)).toDF("key", "pt")
    // newer version has a null field; a per-column carry would leak "x1"
    val build = Seq(("k", 1L, "x1", "y1"), ("k", 5L, null, "y2"))
      .toDF("key", "bt", "x", "y")
    val out = AsOfJoin.leftAsOf(probe, build, Seq("key"), "pt", "bt",
        Seq("x" -> "x", "y" -> "y"))
      .collect().map(r => (r.getString(2), r.getString(3))).toSeq
    assert(out == Seq((null, "y2")))
  }

  test("leftAsOf: NULL keys never match, mirroring SQL equi-join semantics") {
    import spark.implicits._
    val probe = Seq((null.asInstanceOf[String], 5L), ("k1", 5L))
      .toDF("key", "pt")
    val build = Seq((null.asInstanceOf[String], 3L, "nullv"), ("k1", 3L, "a"))
      .toDF("key", "bt", "v")
    val out = AsOfJoin.leftAsOf(probe, build, Seq("key"), "pt", "bt",
        Seq("v" -> "v"))
      .collect().map(r => (r.getString(0), r.getString(2))).toSet
    assert(out == Set((null, null), ("k1", "a")))
  }

  test("innerAsOf drops unmatched probes") {
    import spark.implicits._
    val probe = Seq(("k1", 5L), ("k2", 5L)).toDF("key", "pt")
    val build = Seq(("k1", 3L, "a")).toDF("key", "bt", "v")
    val out = AsOfJoin.innerAsOf(probe, build, Seq("key"), "pt", "bt",
        Seq("v" -> "v"))
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq("k1"))
  }
}
