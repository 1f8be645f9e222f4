package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming exactly-once dedup by key via `flatMapGroupsWithState` — the
  * custom-state face of the dedup operators: each key remembers it has been
  * seen; duplicates within the retention horizon are dropped. State is
  * per-key and expires on event-time timeout, so memory is bounded by the
  * number of distinct keys inside the watermark horizon (the same state
  * contract as Spark's own dropDuplicates, expressed with explicit state
  * so richer policies — keep-latest, count-limited, content-hash keys —
  * are one edit away).
  */
object StreamingDedup {

  final case class Seen(firstSeenMs: Long)

  /** Keep only the first event per key. `df` must be a streaming Dataset
    * with a watermark on `tsCol` (drives state expiry).
    */
  def firstPerKey(
      spark: SparkSession,
      df: DataFrame,
      keyCol: String,
      tsCol: String
  ): DataFrame = {
    import spark.implicits._
    val keyed = df
      .selectExpr(s"CAST($keyCol AS STRING) AS __key", "struct(*) AS __row",
        s"$tsCol AS __ts")
      .as[(String, org.apache.spark.sql.Row, java.sql.Timestamp)](
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.STRING,
          org.apache.spark.sql.Encoders.row(df.schema),
          org.apache.spark.sql.Encoders.TIMESTAMP))

    val deduped: Dataset[org.apache.spark.sql.Row] = keyed
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        func = (_: String,
            rows: Iterator[(String, org.apache.spark.sql.Row, java.sql.Timestamp)],
            state: GroupState[Seen]) => {
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else if (state.exists) {
            Iterator.empty // key already emitted once
          } else {
            val all = rows.toSeq
            val first = all.minBy(_._3.getTime)
            state.update(Seen(first._3.getTime))
            state.setTimeoutTimestamp(first._3.getTime, "1 hour")
            Iterator.single(first._2)
          }
        })(
        org.apache.spark.sql.Encoders.product[Seen],
        org.apache.spark.sql.Encoders.row(df.schema))

    deduped.toDF()
  }
}
