package graft.server

import java.io.ByteArrayOutputStream
import java.util.concurrent.Executors

import io.netty.bootstrap.ServerBootstrap
import io.netty.buffer.Unpooled
import io.netty.channel.{Channel, ChannelHandlerContext, ChannelInboundHandlerAdapter, ChannelInitializer}
import io.netty.channel.nio.NioEventLoopGroup
import io.netty.channel.socket.SocketChannel
import io.netty.channel.socket.nio.NioServerSocketChannel
import io.netty.handler.codec.http2.{DefaultHttp2DataFrame, DefaultHttp2Headers, DefaultHttp2HeadersFrame, Http2DataFrame, Http2FrameCodecBuilder, Http2HeadersFrame, Http2MultiplexHandler}
import org.apache.spark.sql.SparkSession

import graft.protocol.EngineFlatbuffers
import graft.protocol.EngineFlatbuffers.ProtoBytes

/** gRPC transport for the engine protocol — the same service surface the
  * reference adapter exposes (reference adapter/src/grpc.rs:33-104):
  *
  *   service engine.Engine {
  *     rpc ExecuteTransform(TransformRequest) returns (stream TransformResponse);
  *     rpc ExecuteRawQuery(RawQueryRequest) returns (stream RawQueryResponse);
  *   }
  *
  * with each proto message holding a single `bytes flatbuffer = 1` field
  * (grpc.rs:45,62) whose payload is the FlatBuffers-encoded engine message
  * (layout: this repo's engine.fbs; PROTOCOL.md §6). Both RPCs are declared
  * server-streaming but emit exactly one terminal message (grpc.rs's
  * `mpsc::channel(1)` sends once and closes) — this server writes one DATA
  * frame then trailers.
  *
  * Transport: cleartext HTTP/2 with prior knowledge (h2c, what a tonic
  * client uses for `http://` endpoints), built on netty's Http2FrameCodec +
  * Http2MultiplexHandler from the Spark classpath — no codegen toolchain
  * required. gRPC framing per the spec: each message is 1 byte
  * compressed-flag (always 0) + u32 big-endian length + payload; status in
  * HTTP/2 trailers (`grpc-status`).
  *
  * Error contract mirrors the reference: engine-level failures arrive as
  * InvalidQuery/InternalError RESPONSE MESSAGES with grpc-status 0
  * (EngineDispatch); transport-level grpc-status is non-zero only for
  * malformed requests (UNIMPLEMENTED 12 for unknown paths, INVALID_ARGUMENT
  * 3 for undecodable payloads).
  *
  * Requests execute sequentially on one dispatch thread — the engine
  * contract is serial request execution (each transform owns its
  * checkpoint; the reference is parallelism-1 per process); all Spark
  * parallelism lives inside a request. The netty event loop is never
  * blocked by engine work.
  */
object GrpcEngineServer {

  val DefaultPort = 2884
  val PathTransform = "/engine.Engine/ExecuteTransform"
  val PathRawQuery = "/engine.Engine/ExecuteRawQuery"

  /** Running server; `port` is the actual bound port (0 ⇒ ephemeral). */
  final class Handle(val port: Int, channel: Channel, group: NioEventLoopGroup,
                     exec: java.util.concurrent.ExecutorService) extends AutoCloseable {
    def close(): Unit = {
      channel.close().syncUninterruptibly()
      group.shutdownGracefully(0, 500, java.util.concurrent.TimeUnit.MILLISECONDS)
        .syncUninterruptibly()
      exec.shutdown()
    }
  }

  def start(spark: SparkSession, port: Int): Handle = {
    // Single dispatch thread: engine requests are serial by contract.
    val exec = Executors.newSingleThreadExecutor(r => {
      val t = new Thread(r, "graft-grpc-dispatch"); t.setDaemon(true); t
    })
    val group = new NioEventLoopGroup(2)
    val bootstrap = new ServerBootstrap()
      .group(group)
      .channel(classOf[NioServerSocketChannel])
      .childHandler(new ChannelInitializer[SocketChannel] {
        override def initChannel(ch: SocketChannel): Unit =
          ch.pipeline.addLast(
            Http2FrameCodecBuilder.forServer().build(),
            new Http2MultiplexHandler(new ChannelInitializer[Channel] {
              override def initChannel(stream: Channel): Unit =
                stream.pipeline.addLast(new StreamHandler(spark, exec))
            }))
      })
    val ch = bootstrap.bind(port).syncUninterruptibly().channel()
    val bound = ch.localAddress().asInstanceOf[java.net.InetSocketAddress].getPort
    new Handle(bound, ch, group, exec)
  }

  /** One HTTP/2 stream = one RPC. Collects DATA frames until end-of-stream,
    * then hands the gRPC message to the dispatch thread.
    */
  private final class StreamHandler(spark: SparkSession,
                                    exec: java.util.concurrent.ExecutorService)
      extends ChannelInboundHandlerAdapter {
    private var path: String = ""
    private val body = new ByteArrayOutputStream()
    private var done = false

    override def channelRead(ctx: ChannelHandlerContext, msg: AnyRef): Unit = msg match {
      case h: Http2HeadersFrame =>
        path = String.valueOf(h.headers.path)
        if (h.isEndStream) finish(ctx)
      case d: Http2DataFrame =>
        try {
          val buf = d.content()
          val bytes = new Array[Byte](buf.readableBytes())
          buf.readBytes(bytes)
          body.write(bytes)
        } finally d.release()
        if (d.isEndStream) finish(ctx)
      case other =>
        io.netty.util.ReferenceCountUtil.release(other)
    }

    private def finish(ctx: ChannelHandlerContext): Unit = {
      if (done) return
      done = true
      val p = path
      val raw = body.toByteArray
      if (p != PathTransform && p != PathRawQuery) {
        writeTrailersOnly(ctx, status = 12, s"unknown method $p") // UNIMPLEMENTED
        return
      }
      // Decode on the event loop (cheap, fails fast); execute off it.
      val fb =
        try ProtoBytes.unwrap(grpcUnframe(raw))
        catch {
          case e: Exception =>
            writeTrailersOnly(ctx, status = 3, s"bad request framing: ${e.getMessage}")
            return
        }
      exec.execute { () =>
        val responseBytes =
          try {
            if (p == PathTransform) {
              val req = EngineFlatbuffers.readTransformRequest(fb)
              EngineFlatbuffers.writeTransformResponse(EngineDispatch.transform(spark, req))
            } else {
              val req = EngineFlatbuffers.readRawQueryRequest(fb)
              EngineFlatbuffers.writeRawQueryResponse(EngineDispatch.rawQuery(spark, req))
            }
          } catch {
            case e: Exception => // undecodable FlatBuffer
              writeTrailersOnly(ctx, status = 3, s"bad flatbuffer payload: ${e.getMessage}")
              return
          }
        writeResponse(ctx, ProtoBytes.wrap(responseBytes))
      }
    }

    private def writeResponse(ctx: ChannelHandlerContext, msg: Array[Byte]): Unit = {
      val headers = new DefaultHttp2Headers()
      headers.status("200")
      headers.set("content-type", "application/grpc")
      ctx.write(new DefaultHttp2HeadersFrame(headers))
      ctx.write(new DefaultHttp2DataFrame(Unpooled.wrappedBuffer(grpcFrame(msg))))
      val trailers = new DefaultHttp2Headers()
      trailers.set("grpc-status", "0")
      ctx.writeAndFlush(new DefaultHttp2HeadersFrame(trailers, true))
      ()
    }

    private def writeTrailersOnly(ctx: ChannelHandlerContext, status: Int, message: String): Unit = {
      val headers = new DefaultHttp2Headers()
      headers.status("200")
      headers.set("content-type", "application/grpc")
      headers.set("grpc-status", String.valueOf(status))
      headers.set("grpc-message", java.net.URLEncoder.encode(message, "UTF-8"))
      ctx.writeAndFlush(new DefaultHttp2HeadersFrame(headers, true))
      ()
    }

    override def exceptionCaught(ctx: ChannelHandlerContext, cause: Throwable): Unit = {
      System.err.println(s"[graft] grpc stream error: $cause")
      ctx.close()
      ()
    }
  }

  // ── gRPC length-prefixed message framing ─────────────────────────────────

  /** flag(0) + u32 BE length + payload. */
  def grpcFrame(payload: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](5 + payload.length)
    out(0) = 0
    out(1) = (payload.length >>> 24).toByte
    out(2) = (payload.length >>> 16).toByte
    out(3) = (payload.length >>> 8).toByte
    out(4) = payload.length.toByte
    System.arraycopy(payload, 0, out, 5, payload.length)
    out
  }

  /** Extracts the single request message; rejects compression (the
    * reference adapter never negotiates any) and trailing garbage.
    */
  def grpcUnframe(body: Array[Byte]): Array[Byte] = {
    require(body.length >= 5, s"gRPC frame too short: ${body.length} bytes")
    require(body(0) == 0, "compressed gRPC messages are not supported")
    val len = ((body(1) & 0xff) << 24) | ((body(2) & 0xff) << 16) |
      ((body(3) & 0xff) << 8) | (body(4) & 0xff)
    require(body.length == 5 + len, s"gRPC frame length mismatch: declared $len, have ${body.length - 5}")
    java.util.Arrays.copyOfRange(body, 5, 5 + len)
  }
}
