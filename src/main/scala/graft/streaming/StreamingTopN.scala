package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.{IntegerType, LongType, StructType}

import graft.protocol.Op

/** Streaming partitioned Top-N changelog via `flatMapGroupsWithState` —
  * the Structured Streaming face of the batch engine's snapshot-diff mode:
  * per partition key, maintain the top `n` rows by a sort value, and emit
  * the engine's op sequence as the ranking evolves — `+I` when a rank
  * fills, `-U/+U` when the row holding a rank changes (reference
  * EngineTopNTest semantics, observed per micro-batch instead of per
  * transform invocation).
  *
  * State per key is exactly the current top-N list — bounded by n, never by
  * stream length; total state is O(keys × n). Inputs are assumed
  * exactly-once appends (redelivered (ord, tie) duplicates are collapsed);
  * ranks only fill or improve, so `-D` is unreachable without retraction
  * inputs.
  */
object StreamingTopN {

  /** @param tie unique per row (an offset); breaks equal-ord ties the way
    *   the batch engine's deterministic ORDER BY does. */
  final case class In(key: String, ord: Double, tie: Long, payload: Array[Byte])

  final case class RankState(rows: List[(Double, Long, Array[Byte])])

  import Payload.{deser, ser}

  /** Top `n` rows per `partCol` by `ordCol` DESC (ties by `tieCol` ASC).
    * A NULL partition key is a legitimate identity (it groups as its own
    * partition, as in the batch engine's keyed diff); rows with a NULL ord
    * or tie have no place in the ordering and are excluded.
    * @return input columns + (`rank` LONG, `op` INT) changelog rows
    */
  def topN(
      spark: SparkSession,
      df: DataFrame,
      partCol: String,
      ordCol: String,
      tieCol: String,
      n: Int
  ): DataFrame = {
    import spark.implicits._
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields :+
      org.apache.spark.sql.types.StructField("rank", LongType) :+
      org.apache.spark.sql.types.StructField("op", IntegerType))

    val keyed = df
      .where(col(ordCol).isNotNull && col(tieCol).isNotNull)
      .map { r =>
        In(String.valueOf(r.getAs[Any](partCol)),
          r.getAs[Number](ordCol).doubleValue(),
          r.getAs[Number](tieCol).longValue(),
          ser(r.toSeq))
      }(Encoders.product[In])

    keyed
      .groupByKey(_.key)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        func = (_: String, rows: Iterator[In], state: GroupState[RankState]) => {
          val prev = state.getOption.map(_.rows).getOrElse(Nil)
          val seen = scala.collection.mutable.Set(
            prev.map(t => (t._1, t._2)): _*)
          val fresh = rows.flatMap { t =>
            if (seen.add((t.ord, t.tie))) Some((t.ord, t.tie, t.payload))
            else None // at-least-once redelivery of a buffered row
          }.toList
          val newTop = (prev ++ fresh)
            .sortBy(t => (-t._1, t._2))
            .take(n)
          state.update(RankState(newTop))
          (0 until n).iterator.flatMap { i =>
            val rank = (i + 1).toLong
            (prev.lift(i), newTop.lift(i)) match {
              case (None, Some(nw)) =>
                Seq(Row.fromSeq(deser(nw._3) :+ rank :+ Op.Append))
              case (Some(old), Some(nw)) if (old._1, old._2) != ((nw._1, nw._2)) =>
                Seq(
                  Row.fromSeq(deser(old._3) :+ rank :+ Op.CorrectFrom),
                  Row.fromSeq(deser(nw._3) :+ rank :+ Op.CorrectTo))
              case _ => Nil
            }
          }
        })(Encoders.product[RankState], Encoders.row(outSchema))
      .toDF()
  }
}
