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

  test("compactSigned is a netting homomorphism over seeded random changelogs") {
    // net(compactSigned(A) ∪ B) must equal net(A ∪ B) for any split — the
    // property that makes it safe to apply to ANY subset of a buffer's part
    // files during tier compaction. Retracts may outnumber appends (negative
    // groups survive as Retract rows) and meta carries min representatives.
    import spark.implicits._
    val rnd = new scala.util.Random(71)
    val rows = (0 until 200).map { i =>
      (i.toLong,
        rnd.nextInt(4) match {
          case 0 => Op.Retract
          case 1 => Op.CorrectFrom
          case 2 => Op.CorrectTo
          case _ => Op.Append
        },
        1 + rnd.nextInt(3), s"k${rnd.nextInt(6)}", rnd.nextInt(3))
    }
    // Meta representatives are compared EXCLUDING groups that transit
    // through zero (compactSigned's documented caveat: a fully-cancelled
    // group loses its min() carrier, so a later re-append gets a fresh
    // representative) — the VALUE/op multiset must match exactly.
    val meta = Seq("offset")
    def net(df: org.apache.spark.sql.DataFrame) =
      Changelog.compactSigned(df, "op", meta)
        .orderBy("day", "key", "value", "op")
        .select("op", "day", "key", "value")
        .collect().toSeq
    (0 to 200 by 50).foreach { split =>
      val a = rows.take(split).toDF("offset", "op", "day", "key", "value")
      val b = rows.drop(split).toDF("offset", "op", "day", "key", "value")
      val compactedThenRest = Changelog.compactSigned(a, "op", meta).unionByName(b)
      val rawUnion = a.unionByName(b)
      assert(net(compactedThenRest) == net(rawUnion), s"split at $split diverged")
    }
    // idempotence: compacting a compacted frame is a no-op multiset
    val all = rows.toDF("offset", "op", "day", "key", "value")
    assert(net(Changelog.compactSigned(all, "op", meta)) == net(all))
  }
}
