package graft.server

import java.io.{DataInputStream, DataOutputStream, EOFException}
import java.net.{ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.SparkSession

import graft.protocol.RequestCodec

/** Long-running engine transports. `main` serves BOTH wire formats:
  *
  *  - gRPC (h2c + FlatBuffers payloads) on 2884 — the reference adapter's
  *    service and port (reference adapter/src/grpc.rs:29-104); see
  *    [[GrpcEngineServer]].
  *  - the framed-TCP YAML protocol on 2885 — the engine's own interchange
  *    format (the reference adapter converts FlatBuffers⇆YAML internally,
  *    adapter/src/adapter.rs:44-48; this transport exposes it directly for
  *    shims and debugging):
  *
  *   frame   := u32 length (big-endian) ++ UTF-8 payload
  *   request := ("transform" | "rawquery") "\n" request-YAML
  *   reply   := response-YAML  (always; engine errors arrive as
  *              InvalidQuery / InternalError response kinds)
  *
  * One connection may send any number of requests; requests execute
  * sequentially (the reference engine is parallelism-1 per process — each
  * transform owns its checkpoint directory, so serial execution is the
  * contract, not a limitation). All Spark parallelism lives inside a
  * request.
  */
object EngineServer {

  /** Default gRPC port — mirrors the reference adapter (grpc.rs:29). */
  val DefaultPort = 2884

  /** Default framed-TCP YAML port (PROTOCOL.md §1). */
  val DefaultYamlPort = 2885

  def main(args: Array[String]): Unit = {
    val grpcPort = args.headOption.map(_.toInt).getOrElse(DefaultPort)
    val yamlPort = args.lift(1).map(_.toInt).getOrElse(DefaultYamlPort)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-engine-server")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val grpc = GrpcEngineServer.start(spark, grpcPort)
    println(s"[graft] engine gRPC server listening on ${grpc.port}")
    val server = new ServerSocket(yamlPort)
    println(s"[graft] engine YAML server listening on ${server.getLocalPort}")
    try serve(spark, server)
    finally { grpc.close(); spark.stop() }
  }

  /** Accept loop; returns when the server socket closes. Factored out so
    * tests can drive an ephemeral-port server with their own session.
    */
  def serve(spark: SparkSession, server: ServerSocket): Unit =
    while (!server.isClosed) {
      val sock =
        try server.accept()
        catch { case _: java.io.IOException => return } // server socket closed
      // One bad client must never take the accept loop down: a reset
      // connection, a truncated frame, or an oversized length prefix end
      // only THIS connection. Engine-level errors are already mapped to
      // response kinds inside dispatch.
      try handleConnection(spark, sock)
      catch {
        case scala.util.control.NonFatal(e) =>
          // keep the evidence: a misbehaving client's failure mode (reset,
          // bad length prefix) is invisible otherwise
          System.err.println(s"[graft] connection ${sock.getRemoteSocketAddress} dropped: $e")
      }
      finally sock.close()
    }

  private def handleConnection(spark: SparkSession, sock: Socket): Unit = {
    val in = new DataInputStream(sock.getInputStream)
    val out = new DataOutputStream(sock.getOutputStream)
    try {
      while (true) {
        val payload = readFrame(in)
        val nl = payload.indexOf('\n')
        val (method, yaml) =
          if (nl < 0) (payload.trim, "")
          else (payload.substring(0, nl).trim, payload.substring(nl + 1))
        val reply = dispatch(spark, method, yaml)
        writeFrame(out, reply)
      }
    } catch {
      case _: EOFException => () // client done
    }
  }

  /** Engine exceptions surface as response kinds, never dropped
    * connections — same contract as TransformEngine's own error mapping.
    */
  def dispatch(spark: SparkSession, method: String, yaml: String): String =
    method match {
      case "transform" =>
        val req =
          try RequestCodec.parseTransformRequest(yaml)
          catch {
            case e: Throwable =>
              return RequestCodec.renderTransformResponse(
                graft.protocol.TransformResponse.InternalError(
                  s"${e.getClass.getName}: ${e.getMessage}", None))
          }
        RequestCodec.renderTransformResponse(EngineDispatch.transform(spark, req))
      case "rawquery" =>
        val req =
          try RequestCodec.parseRawQueryRequest(yaml)
          catch {
            case e: Throwable =>
              return RequestCodec.renderRawQueryResponse(
                graft.protocol.RawQueryResponse.InternalError(
                  s"${e.getClass.getName}: ${e.getMessage}", None))
          }
        RequestCodec.renderRawQueryResponse(EngineDispatch.rawQuery(spark, req))
      case other =>
        s"""kind: InvalidQuery\nmessage: "unknown method '$other' (expected transform|rawquery)"\n"""
    }

  def readFrame(in: DataInputStream): String = {
    val len = in.readInt()
    require(len >= 0 && len <= (64 << 20), s"frame length $len out of range")
    val buf = new Array[Byte](len)
    in.readFully(buf)
    new String(buf, UTF_8)
  }

  def writeFrame(out: DataOutputStream, payload: String): Unit = {
    val bytes = payload.getBytes(UTF_8)
    out.writeInt(bytes.length)
    out.write(bytes)
    out.flush()
  }
}
