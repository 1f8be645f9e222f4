package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.{IntegerType, StructType}

import graft.protocol.Op

/** Streaming unbounded LEFT OUTER equi-join changelog via
  * `flatMapGroupsWithState` — the Structured Streaming face of the batch
  * engine's left-join delta path ([[graft.engine.IncrementalExecutor]]
  * `runLeftDeltaJoin`): a left row emits immediately — null-padded while
  * unmatched — and the arrival of its first matching right row retracts
  * the null-padded row (`-D`) and appends the pairs (`+I`). Spark's native
  * stream-stream outer join requires a watermark time-bound; this operator
  * is the UNBOUNDED variant the reference engine supports, re-expressed as
  * keyed state.
  *
  * State per key is the full row history of both sides (what any unbounded
  * join must keep — Flink's join operator state is the same shape) plus
  * one matched bit per left row; there is no watermark, so state never
  * expires. Inputs are assumed exactly-once appends.
  *
  * NULL join keys follow SQL semantics outside the keyed state: a
  * null-keyed left row can never match (it emits its null-padded row
  * directly, bypassing state), and a null-keyed right row joins nothing
  * and is dropped.
  */
object StreamingLeftJoin {

  /** Tagged union row: left/right payloads ride the same keyed stream. */
  final case class Tagged(key: String, isRight: Boolean, payload: Array[Byte])

  /** @param left  (payload, everMatched) per left row, arrival order
    * @param right payloads of right rows, arrival order */
  final case class JoinState(
      left: List[(Array[Byte], Boolean)],
      right: List[Array[Byte]])

  import Payload.{deser, ser}

  /** Left equi-join of two STREAMING frames as a +I/-D changelog.
    *
    * @param left      streaming frame; all its columns pass through
    * @param right     streaming frame
    * @param keyCol    equi-key column name, present on both sides
    * @param rightCols right columns to attach, as (rightName -> outName)
    * @param opCol     appended op column: `Op.Append` for pairs and
    *                  null-padded rows, `Op.Retract` for a replaced
    *                  null-padded row
    */
  def leftJoin(
      spark: SparkSession,
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      rightCols: Seq[(String, String)],
      opCol: String = "op"
  ): DataFrame = {
    val leftSchema = left.schema
    val outSchema = StructType(leftSchema.fields ++ rightCols.map {
      case (r, out) => right.schema(r).copy(name = out, nullable = true)
    } :+ org.apache.spark.sql.types.StructField(opCol, IntegerType, nullable = false))
    val taggedEnc = Encoders.product[Tagged]
    val nRight = rightCols.size

    // canonical key serialization (not toString): SQL equality groups
    // -0.0 with 0.0, NaN with NaN, and byte arrays by content — toString
    // diverges on all three, which would split one SQL key group into
    // two state groups and emit null-pad churn batch never produces
    val leftKeyed = left.where(col(keyCol).isNotNull).map { r =>
      Tagged(StreamingAggDiff.keyOf(Seq(r.getAs[Any](keyCol))),
        isRight = false, ser(r.toSeq))
    }(taggedEnc)
    val rightKeyed = right.where(col(keyCol).isNotNull).map { r =>
      Tagged(StreamingAggDiff.keyOf(Seq(r.getAs[Any](keyCol))),
        isRight = true,
        ser(rightCols.map { case (rc, _) => r.getAs[Any](rc) }))
    }(taggedEnc)

    val joined = leftKeyed.union(rightKeyed)
      .groupByKey(_.key)(Encoders.STRING)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        func = (_: String, rows: Iterator[Tagged], state: GroupState[JoinState]) => {
          val prev = state.getOption.getOrElse(JoinState(Nil, Nil))
          var newLeft: List[Array[Byte]] = Nil
          var newRight: List[Array[Byte]] = Nil
          rows.foreach { t =>
            if (t.isRight) newRight ::= t.payload else newLeft ::= t.payload
          }
          val ln = newLeft.reverse; val rn = newRight.reverse
          val allRight = prev.right ++ rn
          val nulls = Seq.fill[Any](nRight)(null)

          val out = Vector.newBuilder[Row]
          // new left rows: pairs against everything so far, or null-padded
          ln.foreach { lp =>
            val lv = deser(lp)
            if (allRight.isEmpty) out += Row.fromSeq(lv ++ nulls :+ Op.Append)
            else allRight.foreach(rp =>
              out += Row.fromSeq(lv ++ deser(rp) :+ Op.Append))
          }
          if (rn.nonEmpty) prev.left.foreach { case (lp, everMatched) =>
            val lv = deser(lp)
            // first match retracts the null-padded row this left row
            // emitted when it arrived
            if (!everMatched) out += Row.fromSeq(lv ++ nulls :+ Op.Retract)
            rn.foreach(rp => out += Row.fromSeq(lv ++ deser(rp) :+ Op.Append))
          }

          val keptLeft =
            prev.left.map { case (lp, m) => (lp, m || rn.nonEmpty) } ++
              ln.map(lp => (lp, allRight.nonEmpty))
          state.update(JoinState(keptLeft, allRight))
          out.result().iterator
        })(Encoders.product[JoinState], Encoders.row(outSchema))

    // null-keyed left rows: permanently unmatched, straight to null-pads
    val nullPads = left.where(col(keyCol).isNull).map { r =>
      Row.fromSeq(r.toSeq ++ Seq.fill[Any](nRight)(null) :+ Op.Append)
    }(Encoders.row(outSchema))

    joined.toDF().union(nullPads.toDF())
  }
}
