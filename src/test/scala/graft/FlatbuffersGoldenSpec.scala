package graft

import java.time.Instant

import org.scalatest.funsuite.AnyFunSuite

import graft.protocol._

/** Canonical protocol messages whose FlatBuffers encodings are pinned as
  * committed hex fixtures (src/test/resources/goldens/&lt;name&gt;.fb.hex). The
  * codec
  * has no flatc-generated counterpart to diff against (ODF's generated
  * schema is a Cargo-only dependency, PROTOCOL.md §6), so these bytes ARE
  * the wire contract: any codec change that shifts a slot id, vtable
  * layout, or encoding breaks [[FlatbuffersGoldenSpec]] loudly instead of
  * silently diverging from previously-written payloads.
  *
  * Regenerate (after a DELIBERATE layout change only) with
  * `sbt "Test/runMain graft.FbGoldenGen"`.
  */
object FbGoldenFixtures {

  val goldenDir = "src/test/resources/goldens"

  /** Exercises: optional prevCheckpointPath ABSENT, offsetInterval PRESENT,
    * explicit watermarks, temporal tables, aliased + unaliased steps.
    */
  val transformRequest: TransformRequest = TransformRequest(
    datasetId = "did:odf:fed.deadbeef",
    datasetAlias = "out",
    systemTime = Instant.parse("2000-01-05T12:34:56.789Z"),
    vocab = DatasetVocabulary(),
    transform = Transform(
      kind = "Sql",
      engine = "spark",
      version = Some("0.1.0"),
      queries = Vector(
        SqlQueryStep(Some("step1"), "SELECT event_time, v FROM src"),
        SqlQueryStep(None, "SELECT event_time, v * 2 AS v FROM step1")),
      temporalTables = Vector(TemporalTable("dim", Vector("pk")))),
    queryInputs = Vector(TransformRequestInput(
      datasetId = "did:odf:fed.cafe",
      datasetAlias = "in",
      queryAlias = "src",
      vocab = DatasetVocabulary(),
      offsetInterval = Some(OffsetInterval(10, 19)),
      dataPaths = Vector("/data/a.parquet", "/data/b.parquet"),
      schemaFile = "/data/a.parquet",
      explicitWatermarks = Vector(RequestWatermark(
        Instant.parse("2000-01-05T12:00:00Z"),
        Instant.parse("2000-01-04T00:00:00Z"))))),
    nextOffset = 42,
    prevCheckpointPath = None,
    newCheckpointPath = "/cp/new",
    newDataPath = "/out/slice.parquet")

  /** Success with both optionals PRESENT. */
  val transformResponse: TransformResponse = TransformResponse.Success(
    newOffsetInterval = Some(OffsetInterval(42, 99)),
    newWatermark = Some(Instant.parse("2000-01-04T00:00:00Z")))

  /** Pinned systemTime PRESENT. */
  val rawQueryRequest: RawQueryRequest = RawQueryRequest(
    inputDataPaths = Vector("/data/in.parquet"),
    transform = Transform(
      queries = Vector(SqlQueryStep(None, "SELECT x, TRY_CAST(y AS INT) AS y FROM input"))),
    outputDataPath = "/out/result.parquet",
    systemTime = Some(Instant.parse("2000-01-05T00:00:00Z")))

  val rawQueryResponse: RawQueryResponse = RawQueryResponse.Success(12345L)

  val all: Seq[(String, Array[Byte])] = Seq(
    "transform_request" -> EngineFlatbuffers.writeTransformRequest(transformRequest),
    "transform_response" -> EngineFlatbuffers.writeTransformResponse(transformResponse),
    "rawquery_request" -> EngineFlatbuffers.writeRawQueryRequest(rawQueryRequest),
    "rawquery_response" -> EngineFlatbuffers.writeRawQueryResponse(rawQueryResponse))

  def hex(bytes: Array[Byte]): String =
    bytes.grouped(32).map(_.map(b => f"$b%02x").mkString).mkString("\n") + "\n"

  def unhex(s: String): Array[Byte] =
    s.filterNot(_.isWhitespace).grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  def readGolden(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/goldens/$name.fb.hex")
    require(in != null, s"missing golden fixture $name.fb.hex")
    try unhex(new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8))
    finally in.close()
  }
}

/** Regenerates the committed hex fixtures — run ONLY after a deliberate
  * wire-layout change, and call out the compatibility break in the commit.
  */
object FbGoldenGen {
  def main(args: Array[String]): Unit = {
    val dir = java.nio.file.Paths.get(FbGoldenFixtures.goldenDir)
    java.nio.file.Files.createDirectories(dir)
    FbGoldenFixtures.all.foreach { case (name, bytes) =>
      java.nio.file.Files.writeString(
        dir.resolve(s"$name.fb.hex"), FbGoldenFixtures.hex(bytes))
      println(s"wrote $name.fb.hex (${bytes.length} bytes)")
    }
  }
}

class FlatbuffersGoldenSpec extends AnyFunSuite {
  import FbGoldenFixtures._

  test("encoders reproduce the committed wire bytes exactly") {
    all.foreach { case (name, bytes) =>
      val golden = readGolden(name)
      assert(bytes.sameElements(golden),
        s"$name wire bytes diverged from the committed golden — this is a " +
          "BREAKING protocol change; if deliberate, regenerate with " +
          "`sbt \"Test/runMain graft.FbGoldenGen\"` and document it")
    }
  }

  test("decoders reconstruct the canonical messages from the committed bytes") {
    assert(EngineFlatbuffers.readTransformRequest(
      readGolden("transform_request")) == transformRequest)
    assert(EngineFlatbuffers.readTransformResponse(
      readGolden("transform_response")) == transformResponse)
    assert(EngineFlatbuffers.readRawQueryRequest(
      readGolden("rawquery_request")) == rawQueryRequest)
    assert(EngineFlatbuffers.readRawQueryResponse(
      readGolden("rawquery_response")) == rawQueryResponse)
  }

  test("proto bytes wrapper round-trips the golden payloads") {
    all.foreach { case (_, bytes) =>
      val wrapped = EngineFlatbuffers.ProtoBytes.wrap(bytes)
      assert(EngineFlatbuffers.ProtoBytes.unwrap(wrapped).sameElements(bytes))
    }
  }
}
