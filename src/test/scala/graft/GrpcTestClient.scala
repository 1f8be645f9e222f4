package graft

import java.io.ByteArrayOutputStream
import java.util.concurrent.{CompletableFuture, TimeUnit}

import io.netty.bootstrap.Bootstrap
import io.netty.buffer.Unpooled
import io.netty.channel.{Channel, ChannelHandlerContext, ChannelInboundHandlerAdapter, ChannelInitializer}
import io.netty.channel.nio.NioEventLoopGroup
import io.netty.channel.socket.SocketChannel
import io.netty.channel.socket.nio.NioSocketChannel
import io.netty.handler.codec.http2.{DefaultHttp2DataFrame, DefaultHttp2Headers, DefaultHttp2HeadersFrame, Http2DataFrame, Http2FrameCodecBuilder, Http2HeadersFrame, Http2MultiplexHandler, Http2StreamChannelBootstrap}

/** Minimal h2c (prior-knowledge) gRPC client over netty's frame codec —
  * built independently of the server code so the two sides cross-check each
  * other's HTTP/2 + gRPC framing. Shared by [[GrpcEngineServerSpec]] and
  * the no-docker entrypoint smoke ([[ImageSmoke]]).
  */
object GrpcTestClient {

  /** grpc-status, grpc-message, concatenated DATA bytes. */
  final case class GrpcReply(status: Int, message: String, body: Array[Byte])

  final class Client(host: String, port: Int) extends AutoCloseable {
    private val group = new NioEventLoopGroup(1)
    private val channel: Channel = new Bootstrap()
      .group(group)
      .channel(classOf[NioSocketChannel])
      .handler(new ChannelInitializer[SocketChannel] {
        override def initChannel(ch: SocketChannel): Unit =
          ch.pipeline.addLast(
            Http2FrameCodecBuilder.forClient().build(),
            new Http2MultiplexHandler(new ChannelInboundHandlerAdapter()))
      })
      .connect(host, port).syncUninterruptibly().channel()

    def call(path: String, grpcBody: Array[Byte], timeoutSec: Long = 300): GrpcReply = {
      val done = new CompletableFuture[GrpcReply]()
      val boot = new Http2StreamChannelBootstrap(channel)
      boot.handler(new ChannelInitializer[Channel] {
        override def initChannel(s: Channel): Unit =
          s.pipeline.addLast(new ChannelInboundHandlerAdapter {
            private val buf = new ByteArrayOutputStream()
            private var status = -1
            private var message = ""
            private def headerSeen(h: Http2HeadersFrame): Unit = {
              val st = h.headers.get("grpc-status")
              if (st != null) status = Integer.parseInt(String.valueOf(st))
              val m = h.headers.get("grpc-message")
              if (m != null) message = java.net.URLDecoder.decode(String.valueOf(m), "UTF-8")
            }
            override def channelRead(ctx: ChannelHandlerContext, msg: AnyRef): Unit =
              msg match {
                case h: Http2HeadersFrame =>
                  headerSeen(h)
                  if (h.isEndStream) done.complete(GrpcReply(status, message, buf.toByteArray))
                case d: Http2DataFrame =>
                  try {
                    val bytes = new Array[Byte](d.content.readableBytes())
                    d.content.readBytes(bytes)
                    buf.write(bytes)
                  } finally d.release()
                  if (d.isEndStream) done.complete(GrpcReply(status, message, buf.toByteArray))
                case other => io.netty.util.ReferenceCountUtil.release(other)
              }
            override def exceptionCaught(ctx: ChannelHandlerContext, cause: Throwable): Unit =
              done.completeExceptionally(cause)
          })
      })
      val stream = boot.open().syncUninterruptibly().getNow
      val headers = new DefaultHttp2Headers()
      headers.method("POST").scheme("http").path(path)
        .authority(s"$host:$port")
      headers.set("content-type", "application/grpc")
      headers.set("te", "trailers")
      stream.write(new DefaultHttp2HeadersFrame(headers))
      stream.writeAndFlush(new DefaultHttp2DataFrame(Unpooled.wrappedBuffer(grpcBody), true))
      done.get(timeoutSec, TimeUnit.SECONDS)
    }

    override def close(): Unit = {
      channel.close().syncUninterruptibly()
      group.shutdownGracefully(0, 500, TimeUnit.MILLISECONDS).syncUninterruptibly()
      ()
    }
  }
}
