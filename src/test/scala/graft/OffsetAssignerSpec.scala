package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.OffsetAssigner

/** The two-phase distributed offset assignment: consecutive offsets in
  * global sort order with no single-partition funnel, robust to the empty
  * range partitions that skewed sort keys produce (the per-partition count
  * pass reports nothing for them, but the prefix-sum base array must still
  * cover their partition ids).
  */
class OffsetAssignerSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("offsets are consecutive in sort order across range partitions") {
    import spark.implicits._
    val df = spark.createDataset(
      Seq(5, 3, 9, 1, 7, 2, 8, 4, 6, 0).map(i => (i.toLong, s"v$i")))
      .toDF("k", "v").repartition(4)
    val (out, cached) = OffsetAssigner.assign(df, Seq(col("k").asc), "offset", 100L)
    val rows = out.select("k", "offset").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._2)
    assert(rows.map(_._2).toSeq == (100L to 109L))
    assert(rows.map(_._1).toSeq == (0L to 9L)) // offset order == sort order
    cached.foreach(_.unpersist())
  }

  test("skewed duplicate sort keys (empty range partitions) still assign") {
    import spark.implicits._
    // 200 identical keys + 1 outlier: the range sampler collapses most
    // boundary candidates onto the duplicate value, leaving partitions
    // with no rows. Pass B evaluates a base for EVERY partition id — this
    // is the regression test for sizing the base array from the RDD's
    // partition count rather than the max id observed in the count pass.
    val df = spark.createDataset(
      (Seq.fill(200)(7L) :+ 99L).zipWithIndex.map { case (k, i) => (k, i) })
      .toDF("k", "i").repartition(8)
    val (out, cached) = OffsetAssigner.assign(
      df, Seq(col("k").asc, col("i").asc), "offset", 0L)
    val offs = out.select("offset").collect().map(_.getLong(0)).sorted
    assert(offs.toSeq == (0L until 201L))
    // the outlier sorts last, so it must hold the final offset
    assert(out.where(col("k") === 99L).select("offset").collect()
      .map(_.getLong(0)).toSeq == Seq(200L))
    cached.foreach(_.unpersist())
  }
}
