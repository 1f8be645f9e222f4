package graft

import java.nio.file.Files
import java.sql.Timestamp
import java.time.Instant

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.GrpcTestClient.{Client => GrpcClient}
import graft.protocol._
import graft.protocol.EngineFlatbuffers.ProtoBytes
import graft.server.GrpcEngineServer

/** Drives the gRPC transport end to end with an independent netty h2c
  * client ([[GrpcTestClient]]): FlatBuffers request → HTTP/2 POST → engine
  * → FlatBuffers response, including the checkpoint chain across sequential
  * RPCs, the engine-error-as-response-message contract, and
  * transport-status edges.
  */
class GrpcEngineServerSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    // pin the young-dataset recompute detour off: short seeded chains here
    // must exercise the same engine paths their assertions were written for
    .config("spark.graft.recomputeYoungFactor", "0")
    .getOrCreate()

  def ts(day: Int, hour: Int = 0): Instant =
    Instant.parse(f"2000-01-${day}%02dT${hour}%02d:00:00Z")
  def t(i: Instant): Timestamp = Timestamp.from(i)

  private def withGrpc[T](f: GrpcClient => T): T = {
    val handle = GrpcEngineServer.start(spark, 0)
    val client = new GrpcClient("127.0.0.1", handle.port)
    try f(client)
    finally { client.close(); handle.close() }
  }

  private def callTransform(c: GrpcClient, req: TransformRequest): TransformResponse = {
    val reply = c.call(GrpcEngineServer.PathTransform,
      GrpcEngineServer.grpcFrame(ProtoBytes.wrap(EngineFlatbuffers.writeTransformRequest(req))))
    assert(reply.status == 0, s"grpc-status ${reply.status}: ${reply.message}")
    EngineFlatbuffers.readTransformResponse(
      ProtoBytes.unwrap(GrpcEngineServer.grpcUnframe(reply.body)))
  }

  private def callRawQuery(c: GrpcClient, req: RawQueryRequest): RawQueryResponse = {
    val reply = c.call(GrpcEngineServer.PathRawQuery,
      GrpcEngineServer.grpcFrame(ProtoBytes.wrap(EngineFlatbuffers.writeRawQueryRequest(req))))
    assert(reply.status == 0, s"grpc-status ${reply.status}: ${reply.message}")
    EngineFlatbuffers.readRawQueryResponse(
      ProtoBytes.unwrap(GrpcEngineServer.grpcUnframe(reply.body)))
  }

  test("raw query executes over gRPC") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-grpc")
    val in1 = s"$dir/in.parquet"
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "name")
      .coalesce(1).write.parquet(in1)
    withGrpc { c =>
      val resp = callRawQuery(c, RawQueryRequest(
        inputDataPaths = Vector(in1),
        transform = Transform(queries =
          Vector(SqlQueryStep(None, "SELECT id, name FROM input WHERE id >= 2"))),
        outputDataPath = s"$dir/out.parquet"))
      assert(resp == RawQueryResponse.Success(2))
    }
    assert(spark.read.parquet(s"$dir/out.parquet").count() == 2)
  }

  test("stateful transform carries checkpoint across sequential RPCs") {
    import spark.implicits._
    import EngineFixtures.Ticker
    val dir = Files.createTempDirectory("graft-grpc2")
    val in1 = s"$dir/in1.parquet"
    graft.engine.ParquetSliceSink.writeSingleFile(
      spark.createDataset(Seq(
        Ticker(0, 0, t(ts(1)), t(ts(1, 1)), "A", 10),
        Ticker(1, 0, t(ts(1)), t(ts(1, 2)), "A", 12),
        Ticker(2, 0, t(ts(1)), t(ts(2, 1)), "A", 20))).toDF(), in1)

    def request(num: Int, slice: Boolean, wm: Instant, prevCp: Option[String]) =
      TransformRequest(
        datasetId = "did:odf:out", datasetAlias = "out",
        systemTime = ts(10 + num),
        vocab = DatasetVocabulary(),
        transform = Transform(queries = Vector(SqlQueryStep(None,
          """SELECT TUMBLE_START(event_time, INTERVAL '1' DAY) as event_time,
            |  symbol, min(price) as `min`, max(price) as `max`
            |FROM tickers
            |GROUP BY TUMBLE(event_time, INTERVAL '1' DAY), symbol""".stripMargin))),
        queryInputs = Vector(TransformRequestInput(
          datasetId = "did:odf:in", datasetAlias = "did:odf:in", queryAlias = "tickers",
          offsetInterval = if (slice) Some(OffsetInterval(0, 2)) else None,
          dataPaths = if (slice) Vector(in1) else Vector.empty,
          schemaFile = in1,
          explicitWatermarks = Vector(RequestWatermark(wm, wm)))),
        nextOffset = num - 1,
        prevCheckpointPath = prevCp,
        newCheckpointPath = s"$dir/cp$num",
        newDataPath = s"$dir/out$num.parquet")

    withGrpc { c =>
      val r1 = callTransform(c, request(1, slice = true, ts(2), None))
      assert(r1 == TransformResponse.Success(Some(OffsetInterval(0, 0)), Some(ts(2))), r1)
      val r2 = callTransform(c, request(2, slice = false, ts(4), Some(s"$dir/cp1")))
      assert(r2 == TransformResponse.Success(Some(OffsetInterval(1, 1)), Some(ts(4))), r2)
    }
    val o2 = spark.read.parquet(s"$dir/out2.parquet").collect()
    assert(o2.length == 1 && o2(0).getAs[Int]("min") == 20 && o2(0).getAs[Int]("max") == 20)
  }

  test("engine errors are response messages with grpc-status 0") {
    val dir = Files.createTempDirectory("graft-grpc3")
    withGrpc { c =>
      val resp = callRawQuery(c, RawQueryRequest(
        inputDataPaths = Vector.empty,
        transform = Transform(queries = Vector(SqlQueryStep(None, "SELEC nonsense FRM"))),
        outputDataPath = s"$dir/out.parquet"))
      resp match {
        case RawQueryResponse.InvalidQuery(_) | RawQueryResponse.InternalError(_, _) => ()
        case other => fail(s"expected an error response kind, got $other")
      }
    }
  }

  test("unknown method yields grpc-status UNIMPLEMENTED (12)") {
    withGrpc { c =>
      val reply = c.call("/engine.Engine/NoSuchMethod",
        GrpcEngineServer.grpcFrame(Array.emptyByteArray), timeoutSec = 60)
      assert(reply.status == 12, reply)
      assert(reply.body.isEmpty)
    }
  }

  test("malformed gRPC framing yields INVALID_ARGUMENT (3), connection survives") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-grpc4")
    val in1 = s"$dir/in.parquet"
    Seq((1L, "a")).toDF("id", "name").coalesce(1).write.parquet(in1)
    withGrpc { c =>
      val bad = c.call(GrpcEngineServer.PathTransform,
        Array[Byte](1, 0, 0, 0, 0), timeoutSec = 60) // compressed flag set
      assert(bad.status == 3, bad)
      // same connection still serves a well-formed RPC
      val ok = callRawQuery(c, RawQueryRequest(
        inputDataPaths = Vector(in1),
        transform = Transform(queries = Vector(SqlQueryStep(None, "SELECT id FROM input"))),
        outputDataPath = s"$dir/out.parquet"))
      assert(ok == RawQueryResponse.Success(1))
    }
  }
}
