package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

import graft.protocol.Op

/** Streaming changelog face of the batch engine's invertible aggregate
  * merge ([[graft.engine.IncrementalExecutor]] `runIncrementalAgg`): per
  * group key the keyed state is the previously-visible result row, and the
  * emissions are exactly the snapshot-diff ops — a group's first visible
  * row is +I, a changed row is the -U/+U pair, a died group (its hidden
  * row count reached 0) is -D carrying the stored row. The reference
  * serves this shape through Flink's retractable aggregate functions
  * (reference TransformEngine.scala:64-124 — one entry point for every
  * shape); here the merge algebra stays on the batch engine's tiered
  * state, and Structured Streaming's `flatMapGroupsWithState` carries the
  * per-group diff.
  *
  * Input records are phased so two AvailableNow rounds over one scratch
  * checkpoint reproduce the batch diff: round 1 ingests phase-0 seeds (the
  * previously-visible rows of groups this slice touches — emissions
  * discarded, state committed), round 2 ingests phase-1 merged rows and
  * phase-2 tombstones, whose emissions are precisely the changelog. Each
  * key sees at most one record per phase (visible frames are keyed), so
  * iterator order within a group is immaterial.
  */
object StreamingAggDiff {

  /** phase 0 = seed (previously-visible row), 1 = merged visible row,
    * 2 = group-death tombstone (payload empty — the retract emission
    * carries the state's stored row, not the record's). */
  final case class Phased(phase: Int, key: String, payload: Array[Byte])

  import Payload.{deser, ser}

  /** Group identity = Base64 of the serialized CANONICALIZED key-value
    * vector — total over NULL keys (a legitimate row identity under GROUP
    * BY) and canonical for the engine's aggregate outputs: grouping
    * already normalized -0.0/NaN, and decimal keys share one scale per
    * column. Canonicalization strips container identity that Java
    * serialization would otherwise leak into the key: a struct key read
    * back from parquet state is a GenericRowWithSchema carrying the FILE's
    * StructType while the freshly-merged frame's row carries the PLAN's —
    * value-equal keys, different bytes — which would split one group into
    * two and emit -D/+I where the batch diff emits -U/+U (round-9 ADVICE
    * #3). Rows/arrays/seqs flatten to plain Vectors of canonical leaves;
    * MapType cannot appear in a GROUP BY key (not orderable in SQL).
    */
  def keyOf(keyValues: Seq[Any]): String =
    java.util.Base64.getEncoder.encodeToString(
      ser(keyValues.toVector.map(canonical)))

  private[streaming] def canonical(v: Any): Any = v match {
    case r: Row                       => r.toSeq.toVector.map(canonical)
    case a: Array[Byte]               => a.toVector
    case a: Array[_]                  => a.toVector.map(canonical)
    case s: scala.collection.Seq[_]   => s.toVector.map(canonical)
    // belt-and-suspenders mirrors of grouping's float normalization for
    // nested positions the optimizer may not rewrite
    case d: java.lang.Double if d.isNaN              => java.lang.Double.valueOf(Double.NaN)
    case d: java.lang.Double if d.doubleValue == 0.0 => java.lang.Double.valueOf(0.0)
    case f: java.lang.Float if f.isNaN               => java.lang.Float.valueOf(Float.NaN)
    case f: java.lang.Float if f.floatValue == 0.0f  => java.lang.Float.valueOf(0.0f)
    case other                        => other
  }

  def record(phase: Int, keyValues: Seq[Any], rowValues: Seq[Any]): Phased =
    Phased(phase, keyOf(keyValues),
      if (phase == 2) Array.emptyByteArray else ser(rowValues))

  /** SQL value equality for the changed-row test — mirrors the batch
    * diff's null-safe struct comparison (`<=>`): NaN equals NaN, -0.0
    * equals 0.0, byte arrays compare by content. */
  private def vEq(a: Any, b: Any): Boolean = (a, b) match {
    case (null, null)                     => true
    case (null, _) | (_, null)            => false
    case (x: Array[Byte], y: Array[Byte]) => java.util.Arrays.equals(x, y)
    case (x: java.lang.Double, y: java.lang.Double) =>
      x.doubleValue == y.doubleValue || (x.isNaN && y.isNaN)
    case (x: java.lang.Float, y: java.lang.Float) =>
      x.floatValue == y.floatValue || (x.isNaN && y.isNaN)
    // recurse into containers so nested NaN/-0.0/binary positions keep the
    // batch diff's null-safe semantics (a struct's Row.equals would call
    // plain == on nested doubles, where NaN != NaN)
    case (x: Row, y: Row)       => rowEq(x.toSeq, y.toSeq)
    case (x: Array[_], y: Array[_]) =>
      rowEq(x.toSeq, y.toSeq)
    case (x: scala.collection.Seq[_], y: scala.collection.Seq[_]) =>
      rowEq(x.toSeq, y.toSeq)
    case (x, y) => x == y
  }
  private def rowEq(a: Seq[Any], b: Seq[Any]): Boolean =
    a.length == b.length && a.lazyZip(b).forall(vEq)

  /** Phased records → MULTISET changelog rows for ALL-variant set ops
    * (round-10): per value the keyed state is the previously-visible
    * multiplicity (payload = key values :+ k), a phase-1 record carries
    * the merged multiplicity, and the emission is |Δk| copies of the
    * value with Append (Δ>0) or Retract (Δ<0) — exactly the batch
    * engine's `diffMultiplicity` arithmetic. A phase-2 tombstone (value
    * present before the merge, gone after) retracts the stored
    * multiplicity. Identical duplicated rows are interchangeable under
    * the engine's deterministic emission sort, so the copies' iterator
    * order is immaterial.
    */
  def multiplicityDiff(
      spark: SparkSession,
      phased: DataFrame,
      visibleSchema: StructType,
      opCol: String
  ): DataFrame = {
    val outSchema = StructType(visibleSchema.fields :+
      StructField(opCol, IntegerType, nullable = false))
    def emitCopies(out: scala.collection.mutable.Builder[Row, Vector[Row]],
        vals: Seq[Any], delta: Long): Unit = {
      val op = if (delta > 0) Op.Append else Op.Retract
      var i = 0L
      while (i < math.abs(delta)) { out += Row.fromSeq(vals :+ op); i += 1 }
    }
    def multOf(payload: Array[Byte]): (Seq[Any], Long) = {
      val vals = deser(payload)
      (vals.init, vals.last.asInstanceOf[java.lang.Long].longValue)
    }
    phased.as[Phased](Encoders.product[Phased])
      .groupByKey(_.key)(Encoders.STRING)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        func = (_: String, rows: Iterator[Phased], state: GroupState[Array[Byte]]) => {
          val out = Vector.newBuilder[Row]
          rows.foreach { p =>
            p.phase match {
              case 0 => state.update(p.payload)
              case 1 =>
                val (vals, kNew) = multOf(p.payload)
                val kOld = state.getOption.map(multOf(_)._2).getOrElse(0L)
                if (kNew != kOld) emitCopies(out, vals, kNew - kOld)
                state.update(p.payload)
              case _ =>
                state.getOption.foreach { b =>
                  val (vals, kOld) = multOf(b)
                  if (kOld != 0) emitCopies(out, vals, -kOld)
                }
                state.remove()
            }
          }
          out.result().iterator
        })(Encoders.BINARY, Encoders.row(outSchema))
      .toDF()
  }

  /** Phased records → changelog rows (visible columns + op). */
  def diff(
      spark: SparkSession,
      phased: DataFrame,
      visibleSchema: StructType,
      opCol: String
  ): DataFrame = {
    val outSchema = StructType(visibleSchema.fields :+
      StructField(opCol, IntegerType, nullable = false))
    phased.as[Phased](Encoders.product[Phased])
      .groupByKey(_.key)(Encoders.STRING)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        func = (_: String, rows: Iterator[Phased], state: GroupState[Array[Byte]]) => {
          val out = Vector.newBuilder[Row]
          rows.foreach { p =>
            p.phase match {
              case 0 => state.update(p.payload)
              case 1 =>
                val nv = deser(p.payload)
                state.getOption match {
                  case None => out += Row.fromSeq(nv :+ Op.Append)
                  case Some(old) =>
                    val ov = deser(old)
                    if (!rowEq(ov, nv)) {
                      out += Row.fromSeq(ov :+ Op.CorrectFrom)
                      out += Row.fromSeq(nv :+ Op.CorrectTo)
                    }
                }
                state.update(p.payload)
              case _ =>
                state.getOption.foreach(old =>
                  out += Row.fromSeq(deser(old) :+ Op.Retract))
                state.remove()
            }
          }
          out.result().iterator
        })(Encoders.BINARY, Encoders.row(outSchema))
      .toDF()
  }
}
