package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Changelog
import graft.protocol.Op

class ChangelogSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // (offset, op, event day, key, value)
  def changelog = {
    import spark.implicits._
    Seq(
      (0L, Op.Append, 1, "A", 5),
      (1L, Op.Append, 1, "B", 9),
      (2L, Op.CorrectFrom, 2, "A", 5),
      (3L, Op.CorrectTo, 2, "A", 7),
      (4L, Op.Retract, 3, "B", 9),
      (5L, Op.Append, 4, "C", 1)
    ).toDF("offset", "op", "day", "key", "value")
  }

  test("toSnapshot keeps latest non-tombstoned row per key") {
    val snap = Changelog.toSnapshot(changelog, Seq("key"), "day", "offset")
      .select("key", "value").collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(snap == Map("A" -> 7, "C" -> 1)) // B retracted
  }

  test("snapshotAsOf sees the state at a past point in time") {
    val snap = Changelog.snapshotAsOf(
        changelog, Seq("key"), "day", "offset", lit(2))
      .select("key", "value").collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(snap == Map("A" -> 7, "B" -> 9)) // before B's retraction
  }

  test("diffSnapshots emits +I/-D/-U/+U") {
    import spark.implicits._
    val prev = Seq(("A", 1), ("B", 2)).toDF("key", "value")
    val cur = Seq(("A", 9), ("C", 3)).toDF("key", "value")
    val diff = Changelog.diffSnapshots(prev, cur, Seq("key"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet
    assert(diff == Set(
      ("C", 3, Op.Append),
      ("B", 2, Op.Retract),
      ("A", 1, Op.CorrectFrom),
      ("A", 9, Op.CorrectTo)))
  }
}
