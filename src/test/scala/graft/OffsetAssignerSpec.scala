package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SortExec
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.OffsetAssigner

/** The distributed two-phase offset assignment must be value-identical to
  * the single-partition `row_number().over(Window.orderBy(...))` it replaced
  * (exact reference offsets are golden-tested in EngineSpec) while keeping
  * the physical plan free of any global sort or window — the 100 TB
  * requirement from SURVEY.md §7.2.
  */
class OffsetAssignerSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("matches the window formulation exactly (ties, nulls, start offset)") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val rows = (1 to 997).map { i =>
      (if (i % 31 == 0) null else f"k${rng.nextInt(200)}%03d", rng.nextInt(50), i.toLong)
    }
    val df = rows.toDF("k", "v", "uniq").repartition(8)
    val order = Seq(col("k").asc, col("v").asc, col("uniq").asc)

    val expected = df
      .withColumn("off", (row_number().over(Window.orderBy(order: _*)) - 1 + 100L))
      .select("uniq", "off").as[(Long, Long)].collect().toMap

    val (out, pinned) = OffsetAssigner.assign(df, order, "off", 100L)
    try {
      val got = out.select("uniq", "off").as[(Long, Long)].collect().toMap
      assert(got === expected)
      assert(got.values.min == 100L && got.values.max == 100L + rows.size - 1)
    } finally pinned.foreach(_.unpersist())
  }

  test("physical plan has no global sort and no window") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i % 10, i.toLong)).toDF("k", "uniq")
    val (out, pinned) = OffsetAssigner.assign(df, Seq(col("k").asc, col("uniq").asc), "off", 0L)
    try {
      out.collect() // materialize so executedPlan is final
      val plan = out.queryExecution.executedPlan
      assert(plan.collect { case s: SortExec if s.global => s }.isEmpty,
        s"global sort in plan:\n$plan")
      assert(plan.collect { case w: WindowExec => w }.isEmpty,
        s"window in plan:\n$plan")
    } finally pinned.foreach(_.unpersist())
  }

  test("offsets survive a downstream coalesce(1) packing partitions into one task") {
    // The single-file sink coalesces before writing; with
    // TaskContext.getPartitionId() every parent partition would read base 0.
    import spark.implicits._
    val df = (1 to 50).map(i => (i % 7, i.toLong)).toDF("k", "uniq").repartition(8)
    val (out, pinned) = OffsetAssigner.assign(df, Seq(col("k").asc, col("uniq").asc), "off", 3L)
    try {
      val packed = out.coalesce(1).select("off").as[Long].collect().toSeq
      assert(packed == (3L until 53L)) // consecutive AND in partition-concatenation order
    } finally pinned.foreach(_.unpersist())
  }

  test("empty input yields empty output") {
    import spark.implicits._
    val df = Seq.empty[(String, Long)].toDF("k", "uniq")
    val (out, pinned) = OffsetAssigner.assign(df, Seq(col("k").asc), "off", 5L)
    try assert(out.count() == 0)
    finally pinned.foreach(_.unpersist())
  }
}
