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
    // Presence markers, not key-null checks: a NULL group key is a
    // legitimate row identity (GROUP BY over nullable columns), so side
    // presence must be tracked explicitly through the full outer join.
    val pm = "__present"
    val cur = current.withColumn(pm, lit(true)).alias("n")
    val prev = previous.withColumn(pm, lit(true)).alias("p")
    val keyEq =
      if (keys.isEmpty) lit(true)
      else keys.map(k => col(s"n.$k") <=> col(s"p.$k")).reduce(_ && _)
    val pStruct = struct(cols.map(c => col(s"p.$c")): _*)
    val nStruct = struct(cols.map(c => col(s"n.$c")): _*)
    val j = cur
      .join(prev, keyEq, "full_outer")
      .select(
        when(col(s"p.$pm").isNull, lit(null)).otherwise(pStruct).as("old"),
        when(col(s"n.$pm").isNull, lit(null)).otherwise(nStruct).as("new"))
      .where(!(col("old") <=> col("new")))
    def unpack(side: String, op: Int, cond: Column): DataFrame =
      j.where(cond).select(
        cols.map(c => col(s"$side.$c")) :+ lit(op).as(opCol): _*)
    unpack("new", Op.Append, col("old").isNull && col("new").isNotNull)
      .unionByName(unpack("old", Op.Retract, col("new").isNull && col("old").isNotNull))
      .unionByName(unpack("old", Op.CorrectFrom, col("old").isNotNull && col("new").isNotNull))
      .unionByName(unpack("new", Op.CorrectTo, col("old").isNotNull && col("new").isNotNull))
  }

  /** Compact a changelog multiset to netted SIGNED form: identical rows
    * (metadata excluded) net their +/− ops and survivors re-expand as |net|
    * Append rows (net > 0) or Retract rows (net < 0) carrying min()
    * metadata representatives. Unlike a read-side net (which drops
    * non-positive groups once it sees the whole multiset), negative counts
    * are PRESERVED as retract rows, which makes this a state-compaction
    * homomorphism: net(compactSigned(A) ∪ B) = net(A ∪ B) for any later
    * slice B — so tier compaction may apply it to any subset of a buffer's
    * part files. Bounds retract-heavy buffer state to the LIVE multiset
    * (plus unmatched retracts) instead of raw history.
    *
    * Metadata caveat: a group that nets to ZERO inside the compacted subset
    * is dropped together with its min() representative, so a row fully
    * retracted and later re-appended carries the RE-APPEND's metadata
    * rather than the cancelled predecessor's. That is semantically sound —
    * the predecessor was wholly retracted, and netted metadata is already a
    * synthetic representative (see the read-side net) — but it means meta
    * columns are only stable for groups that never transit through zero.
    */
  def compactSigned(df: DataFrame, opCol: String, metaCols: Seq[String]): DataFrame = {
    if (!df.columns.contains(opCol)) return df
    val meta = metaCols.distinct.filter(df.columns.contains)
    val userCols = df.columns.filterNot(c => c == opCol || meta.contains(c)).toSeq
    val aggExprs = sum(when(col(opCol).isin(Op.Append, Op.CorrectTo), 1L)
      .otherwise(-1L)).as("__net") +: meta.map(c => min(col(c)).as(c))
    df.groupBy(userCols.map(col): _*)
      .agg(aggExprs.head, aggExprs.tail: _*)
      .where(col("__net") =!= 0)
      .withColumn(opCol, explode(transform(
        sequence(lit(1), abs(col("__net"))),
        _ => when(col("__net") > 0, lit(Op.Append)).otherwise(lit(Op.Retract)))))
      .drop("__net")
      .select(df.columns.map(col): _*)
  }

  /** Multiset diff of two snapshots with no row identity: rows are paired by
    * full value equality with multiplicity. Emits (newCount − oldCount)
    * appends or (oldCount − newCount) retracts per distinct row — the
    * correct changelog for updating queries whose rows have no stable key
    * (regular joins, DISTINCT, unfiltered rankings). One shuffle per side
    * plus the diff join; both sides are pre-aggregated to distinct rows so
    * the join input is bounded by distinct-row counts, not raw history.
    */
  def diffMultiset(
      previous: DataFrame,
      current: DataFrame,
      opCol: String = "op"
  ): DataFrame = {
    val cols = current.columns.toSeq
    def counted(df: DataFrame) =
      df.groupBy(cols.map(col): _*).agg(count(lit(1)).as("__n"))
    val keyEq = cols.map(c => col(s"n.$c") <=> col(s"p.$c")).reduce(_ && _)
    val j = counted(current).alias("n")
      .join(counted(previous).alias("p"), keyEq, "full_outer")
      .select(
        cols.map(c => coalesce(col(s"n.$c"), col(s"p.$c")).as(c)) :+
          (coalesce(col("n.__n"), lit(0L)) - coalesce(col("p.__n"), lit(0L))).as("__d"): _*)
      .where(col("__d") =!= 0)
    j.withColumn(opCol,
        explode(transform(
          sequence(lit(1), abs(col("__d"))),
          _ => when(col("__d") > 0, lit(Op.Append)).otherwise(lit(Op.Retract)))))
      .drop("__d")
      .select(cols.map(col) :+ col(opCol): _*)
  }
}
