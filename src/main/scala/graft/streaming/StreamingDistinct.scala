package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming DISTINCT changelog via `flatMapGroupsWithState` — the
  * Structured Streaming face of the batch engine's refcount DISTINCT merge
  * ([[graft.engine.IncrementalExecutor]] `runIncrementalAgg`): per distinct
  * value the state is one "seen" bit; a value's FIRST arrival emits its row
  * once, every later duplicate is absorbed. Over append-only histories this
  * IS the DISTINCT changelog — the only support transition is 0 → positive
  * (+I) — so seeding the state with the previously-visible values and then
  * streaming a slice's values emits exactly the batch snapshot diff.
  * (Retractive histories can cross back to 0 and must stay on the batch
  * engine's invertible refcount, which the executor's gate enforces.)
  *
  * The whole row is the key: rows are grouped on their serialized value
  * vector (deterministic for the engine's parquet-decoded types), keeping
  * the operator schema-generic like its [[StreamingLeftJoin]] sibling.
  */
object StreamingDistinct {

  /** key = Base64 of the serialized value vector; payload = same bytes. */
  final case class Keyed(key: String, payload: Array[Byte])

  /** First occurrence per distinct row across the lifetime of the
    * streaming query's state; duplicates absorbed. */
  def firstOccurrence(spark: SparkSession, df: DataFrame): DataFrame = {
    val schema = df.schema
    val keyed = df.map { r =>
      val bytes = Payload.ser(r.toSeq)
      Keyed(java.util.Base64.getEncoder.encodeToString(bytes), bytes)
    }(Encoders.product[Keyed])
    keyed.groupByKey(_.key)(Encoders.STRING)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        func = (_: String, rows: Iterator[Keyed], state: GroupState[Boolean]) => {
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            Iterator.single(Row.fromSeq(Payload.deser(rows.next().payload)))
          }
        })(Encoders.scalaBoolean, Encoders.row(schema))
      .toDF()
  }
}
