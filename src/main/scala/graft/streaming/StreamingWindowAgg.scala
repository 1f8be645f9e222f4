package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured Streaming realization of the engine's tumbling-window
  * aggregation: `readStream` over a parquet directory → event-time watermark
  * → windowed aggregate → append-mode sink, `Trigger.AvailableNow` for
  * bounded micro-batch runs.
  *
  * This is the continuous-pipeline face of the same semantics the
  * batch-incremental [[graft.engine.IncrementalExecutor]] implements for the
  * ODF protocol (where request-supplied explicit watermarks and cross-process
  * state restore rule out Spark's internal state store — SURVEY.md §7.2).
  * Deployments that own their scheduling can run this path directly and get
  * Spark-managed state, exactly-once sinks and watermark bookkeeping.
  */
object StreamingWindowAgg {

  /** Windowed counts/sums per (window, key) in append mode (emits once per
    * closed window, like the protocol engine's gated emission).
    *
    * @param inputDir    parquet directory to stream from
    * @param schema      input schema (streaming reads need it up front)
    * @param tsCol       event-time column
    * @param keyCol      grouping key
    * @param valueCol    numeric column to aggregate
    * @param window      e.g. "1 day"
    * @param lateness    allowed lateness, e.g. "1 day"
    */
  def windowedCounts(
      spark: SparkSession,
      inputDir: String,
      schema: StructType,
      tsCol: String,
      keyCol: String,
      valueCol: String,
      window: String,
      lateness: String
  ): DataFrame =
    spark.readStream
      .schema(schema)
      .parquet(inputDir)
      .withWatermark(tsCol, lateness)
      .groupBy(
        org.apache.spark.sql.functions.window(col(tsCol), window).as("w"),
        col(keyCol))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col(valueCol)).as("sum_value"))
      .select(
        col("w.start").as("window_start"),
        col(keyCol),
        col("n_events"),
        col("sum_value"))

  /** Stream-to-stream interval join: right rows join left rows with the
    * same key whose event time falls in [leftTime, leftTime + upper] —
    * the Structured Streaming counterpart of the protocol engine's
    * interval-join mode. Watermarks on both sides bound the join state
    * Spark keeps (left buffer expires once the right watermark passes
    * leftTime + upper, symmetric for the right).
    */
  def streamStreamIntervalJoin(
      spark: SparkSession,
      leftDir: String,
      leftSchema: StructType,
      rightDir: String,
      rightSchema: StructType,
      key: String,
      leftTime: String,
      rightTime: String,
      upper: String,
      lateness: String
  ): DataFrame = {
    val left = spark.readStream.schema(leftSchema).parquet(leftDir)
      .withWatermark(leftTime, lateness)
    val right = spark.readStream.schema(rightSchema).parquet(rightDir)
      .withWatermark(rightTime, lateness)
      .withColumnRenamed(key, s"__r_$key")
    left.join(
      right,
      col(key) === col(s"__r_$key") &&
        col(rightTime) >= col(leftTime) &&
        col(rightTime) <= col(leftTime) + expr(s"INTERVAL $upper"),
      "inner")
  }

  /** Run a bounded micro-batch over everything currently available and
    * write to an in-memory table; returns the finished query.
    */
  def runAvailableNow(df: DataFrame, queryName: String): StreamingQuery = {
    val q = df.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }
}
