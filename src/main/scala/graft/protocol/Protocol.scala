package graft.protocol

import java.time.Instant

/** ODF engine-contract protocol model, mirrored from the reference's observed
  * request/response surface (see /root/repo/SURVEY.md §2.3; reference request
  * YAML shape at /root/reference/src/test/scala/dev/kamu/engine/flink/test/
  * EngineAggregationTest.scala:47-98). Spark-native re-expression — the
  * reference's gRPC/flatbuffer adapter layer is intentionally out of scope;
  * these case classes are the engine API a transport can be bolted onto.
  */

/** Changelog operation codes (reference: Op.scala:5-18). */
object Op {
  val Append: Int = 0      // +I
  val Retract: Int = 1     // -D
  val CorrectFrom: Int = 2 // -U (old value of an update)
  val CorrectTo: Int = 3   // +U (new value of an update)
}

/** Per-dataset names of the four system columns. */
final case class DatasetVocabulary(
    offsetColumn: String = "offset",
    operationTypeColumn: String = "op",
    systemTimeColumn: String = "system_time",
    eventTimeColumn: String = "event_time"
) {
  def systemColumns: Seq[String] =
    Seq(offsetColumn, operationTypeColumn, systemTimeColumn, eventTimeColumn)
}

/** Closed interval of record offsets. */
final case class OffsetInterval(start: Long, end: Long) {
  /** Row count of the closed interval — the one definition shared by the
    * ledger's cumulative `bufferedRows` accumulator and the dispatch
    * gate's slice size, which must measure identical units. */
  def span: Long = end - start + 1L
}

/** An explicit watermark attached to an input slice. */
final case class RequestWatermark(systemTime: Instant, eventTime: Instant)

/** One SQL step; unaliased step is the output (reference TransformEngine.scala:252-262). */
final case class SqlQueryStep(alias: Option[String], query: String)

/** Declares an input alias as a versioned temporal table with a primary key. */
final case class TemporalTable(name: String, primaryKey: Vector[String])

final case class Transform(
    kind: String = "Sql",
    engine: String = "spark",
    version: Option[String] = None,
    queries: Vector[SqlQueryStep] = Vector.empty,
    temporalTables: Vector[TemporalTable] = Vector.empty
)

final case class TransformRequestInput(
    datasetId: String,
    datasetAlias: String,
    queryAlias: String,
    vocab: DatasetVocabulary = DatasetVocabulary(),
    /** None ⇒ no new data this run (watermark-only advance). */
    offsetInterval: Option[OffsetInterval],
    dataPaths: Vector[String],
    schemaFile: String,
    explicitWatermarks: Vector[RequestWatermark] = Vector.empty
)

final case class TransformRequest(
    datasetId: String,
    datasetAlias: String,
    systemTime: Instant,
    vocab: DatasetVocabulary = DatasetVocabulary(),
    transform: Transform,
    queryInputs: Vector[TransformRequestInput],
    nextOffset: Long,
    prevCheckpointPath: Option[String],
    newCheckpointPath: String,
    newDataPath: String
)

sealed trait TransformResponse
object TransformResponse {
  final case class Success(
      newOffsetInterval: Option[OffsetInterval],
      newWatermark: Option[Instant]
  ) extends TransformResponse
  final case class InvalidQuery(message: String) extends TransformResponse
  final case class InternalError(message: String, backtrace: Option[String])
      extends TransformResponse
}

final case class RawQueryRequest(
    inputDataPaths: Vector[String],
    transform: Transform,
    outputDataPath: String,
    /** Pins `now()` in the query; retries of the same request must not see
      * different wall clocks. None ⇒ the engine pins its own single instant
      * for the whole request. */
    systemTime: Option[Instant] = None
)

sealed trait RawQueryResponse
object RawQueryResponse {
  final case class Success(numRecords: Long) extends RawQueryResponse
  final case class InvalidQuery(message: String) extends RawQueryResponse
  final case class InternalError(message: String, backtrace: Option[String])
      extends RawQueryResponse
}
