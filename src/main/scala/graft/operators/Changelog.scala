package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.protocol.Op

/** Changelog-stream utilities over the ODF op column
  * (0=append +I, 1=retract -D, 2=correct-from -U, 3=correct-to +U) —
  * the Spark-native equivalents of the reference's RowKind handling
  * (reference ChangelogOperator.scala:10-24 for op mapping; semantics only,
  * no code reuse).
  */
object Changelog {

  /** Collapse a changelog into its current snapshot: the latest row per key
    * (by event time, then changelog order), dropped if that row is a
    * retraction or a correct-from tombstone.
    *
    * One window shuffle on the key — the same shape Catalyst plans for any
    * ranked dedup, spillable and AQE-skew-friendly.
    *
    * @param df       changelog rows
    * @param keys     primary-key columns
    * @param eventCol event-time column name
    * @param seqCol   total-order tiebreaker within one event time (offset)
    * @param opCol    op column name
    */
  def toSnapshot(
      df: DataFrame,
      keys: Seq[String],
      eventCol: String,
      seqCol: String,
      opCol: String = "op"
  ): DataFrame = {
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(eventCol).desc, col(seqCol).desc)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1 &&
        !col(opCol).isin(Op.Retract, Op.CorrectFrom))
      .drop("__rn")
  }

  /** Point-in-time snapshot: state of the changelog as of `asOf` (inclusive). */
  def snapshotAsOf(
      df: DataFrame,
      keys: Seq[String],
      eventCol: String,
      seqCol: String,
      asOf: Column,
      opCol: String = "op"
  ): DataFrame =
    toSnapshot(df.where(col(eventCol) <= asOf), keys, eventCol, seqCol, opCol)

  /** Diff two keyed snapshots into a changelog slice: emits +I for new keys,
    * -D for removed keys, and a -U/+U pair for changed rows. This is the
    * general snapshot-diff primitive behind the engine's Top-N mode.
    */
  def diffSnapshots(
      previous: DataFrame,
      current: DataFrame,
      keys: Seq[String],
      opCol: String = "op"
  ): DataFrame = {
    val cols = current.columns.toSeq
    val keyEq = keys.map(k => col(s"n.$k") <=> col(s"p.$k")).reduce(_ && _)
    val pStruct = struct(cols.map(c => col(s"p.$c")): _*)
    val nStruct = struct(cols.map(c => col(s"n.$c")): _*)
    val j = current.alias("n")
      .join(previous.alias("p"), keyEq, "full_outer")
      .select(
        when(col(s"p.${keys.head}").isNull, lit(null)).otherwise(pStruct).as("old"),
        when(col(s"n.${keys.head}").isNull, lit(null)).otherwise(nStruct).as("new"))
      .where(!(col("old") <=> col("new")))
    def unpack(side: String, op: Int, cond: Column): DataFrame =
      j.where(cond).select(
        cols.map(c => col(s"$side.$c")) :+ lit(op).as(opCol): _*)
    unpack("new", Op.Append, col("old").isNull && col("new").isNotNull)
      .unionByName(unpack("old", Op.Retract, col("new").isNull && col("old").isNotNull))
      .unionByName(unpack("old", Op.CorrectFrom, col("old").isNotNull && col("new").isNotNull))
      .unionByName(unpack("new", Op.CorrectTo, col("old").isNotNull && col("new").isNotNull))
  }
}
