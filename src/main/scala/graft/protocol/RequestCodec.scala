package graft.protocol

import java.time.Instant

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory

import scala.jdk.CollectionConverters._

/** YAML (de)serialization for the protocol, on Spark's bundled Jackson.
  * Hand-mapped tree walking — no reflection modules needed, and defaults
  * (e.g. vocabulary) apply when fields are omitted, matching the reference's
  * request YAML surface (SURVEY.md §2.3).
  */
object RequestCodec {

  private val mapper = new ObjectMapper(new YAMLFactory())

  private def opt(n: JsonNode, f: String): Option[JsonNode] =
    Option(n.get(f)).filter(!_.isNull)
  private def str(n: JsonNode, f: String): String =
    opt(n, f).map(_.asText()).getOrElse(sys.error(s"missing field '$f'"))
  private def instant(n: JsonNode, f: String): Instant = Instant.parse(str(n, f))
  private def arr(n: JsonNode, f: String): Vector[JsonNode] =
    opt(n, f).map(_.elements().asScala.toVector).getOrElse(Vector.empty)

  private def vocab(n: Option[JsonNode]): DatasetVocabulary = n match {
    case None => DatasetVocabulary()
    case Some(v) =>
      DatasetVocabulary(
        offsetColumn = opt(v, "offsetColumn").map(_.asText()).getOrElse("offset"),
        operationTypeColumn = opt(v, "operationTypeColumn").map(_.asText()).getOrElse("op"),
        systemTimeColumn = opt(v, "systemTimeColumn").map(_.asText()).getOrElse("system_time"),
        eventTimeColumn = opt(v, "eventTimeColumn").map(_.asText()).getOrElse("event_time"))
  }

  private def transform(n: JsonNode): Transform = {
    // single `query` is normalized to queries:[{alias:None}] like the
    // coordinator does (reference EngineRunner.scala:56-68)
    val queries = opt(n, "query") match {
      case Some(q) => Vector(SqlQueryStep(None, q.asText()))
      case None =>
        arr(n, "queries").map { q =>
          SqlQueryStep(opt(q, "alias").map(_.asText()), str(q, "query"))
        }
    }
    Transform(
      kind = opt(n, "kind").map(_.asText()).getOrElse("Sql"),
      engine = opt(n, "engine").map(_.asText()).getOrElse("spark"),
      version = opt(n, "version").map(_.asText()),
      queries = queries,
      temporalTables = arr(n, "temporalTables").map { t =>
        TemporalTable(str(t, "name"),
          arr(t, "primaryKey").map(_.asText()))
      })
  }

  def parseTransformRequest(yaml: String): TransformRequest = {
    val n = mapper.readTree(yaml)
    TransformRequest(
      datasetId = str(n, "datasetId"),
      datasetAlias = str(n, "datasetAlias"),
      systemTime = instant(n, "systemTime"),
      vocab = vocab(opt(n, "vocab")),
      transform = transform(
        opt(n, "transform").getOrElse(sys.error("missing 'transform'"))),
      queryInputs = arr(n, "queryInputs").map { in =>
        TransformRequestInput(
          datasetId = str(in, "datasetId"),
          datasetAlias = opt(in, "datasetAlias").map(_.asText())
            .getOrElse(str(in, "datasetId")),
          queryAlias = str(in, "queryAlias"),
          vocab = vocab(opt(in, "vocab")),
          offsetInterval = opt(in, "offsetInterval").map(oi =>
            OffsetInterval(oi.get("start").asLong(), oi.get("end").asLong())),
          dataPaths = arr(in, "dataPaths").map(_.asText()),
          schemaFile = str(in, "schemaFile"),
          explicitWatermarks = arr(in, "explicitWatermarks").map { w =>
            RequestWatermark(instant(w, "systemTime"), instant(w, "eventTime"))
          })
      },
      nextOffset = opt(n, "nextOffset").map(_.asLong()).getOrElse(0L),
      prevCheckpointPath = opt(n, "prevCheckpointPath").map(_.asText()),
      newCheckpointPath = str(n, "newCheckpointPath"),
      newDataPath = str(n, "newDataPath"))
  }

  def parseRawQueryRequest(yaml: String): RawQueryRequest = {
    val n = mapper.readTree(yaml)
    RawQueryRequest(
      inputDataPaths = arr(n, "inputDataPaths").map(_.asText()),
      transform = transform(
        opt(n, "transform").getOrElse(sys.error("missing 'transform'"))),
      outputDataPath = str(n, "outputDataPath"),
      systemTime = opt(n, "systemTime").map(v => Instant.parse(v.asText())))
  }

  def renderTransformResponse(r: TransformResponse): String = r match {
    case TransformResponse.Success(oi, wm) =>
      val sb = new StringBuilder("kind: Success\n")
      oi.foreach(i =>
        sb.append(s"newOffsetInterval:\n  start: ${i.start}\n  end: ${i.end}\n"))
      wm.foreach(w => sb.append(s"newWatermark: $w\n"))
      sb.toString
    case TransformResponse.InvalidQuery(m) =>
      s"kind: InvalidQuery\nmessage: ${quote(m)}\n"
    case TransformResponse.InternalError(m, bt) =>
      s"kind: InternalError\nmessage: ${quote(m)}\n" +
        bt.map(b => s"backtrace: ${quote(b)}\n").getOrElse("")
  }

  def renderRawQueryResponse(r: RawQueryResponse): String = r match {
    case RawQueryResponse.Success(n) => s"kind: Success\nnumRecords: $n\n"
    case RawQueryResponse.InvalidQuery(m) =>
      s"kind: InvalidQuery\nmessage: ${quote(m)}\n"
    case RawQueryResponse.InternalError(m, bt) =>
      s"kind: InternalError\nmessage: ${quote(m)}\n" +
        bt.map(b => s"backtrace: ${quote(b)}\n").getOrElse("")
  }

  private def quote(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replace("\n", "\\n") + "\""
}
