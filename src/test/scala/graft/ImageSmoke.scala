package graft

import java.io.{DataInputStream, DataOutputStream}
import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import graft.protocol._
import graft.protocol.EngineFlatbuffers.ProtoBytes
import graft.server.GrpcEngineServer

/** No-docker smoke of the container entrypoint (`make image-smoke`): runs
  * `image/docker-entrypoint.sh` against the locally-assembled jar (the
  * Dockerfile's exact launch path, jar location overridden via ENGINE_JAR),
  * waits for both listeners, serves one raw query over gRPC/2884 and one
  * over framed-YAML/2885, and exits non-zero on any failure.
  *
  * Args: [engineJar] [inputParquet] [grpcPort] [yamlPort]
  * (defaults: image/tmp/engine.spark.jar, /root/testdata/sf0.001/region.parquet,
  * 2884, 2885).
  */
object ImageSmoke {
  def main(args: Array[String]): Unit = {
    val jar = args.lift(0).getOrElse("image/tmp/engine.spark.jar")
    val input = args.lift(1).getOrElse("/root/testdata/sf0.001/region.parquet")
    val grpcPort = args.lift(2).map(_.toInt).getOrElse(2884)
    val yamlPort = args.lift(3).map(_.toInt).getOrElse(2885)
    require(Files.exists(java.nio.file.Paths.get(jar)),
      s"engine jar not found at $jar — run `make engine-assembly` first")
    require(Files.exists(java.nio.file.Paths.get(input)),
      s"input parquet not found at $input")

    val pb = new ProcessBuilder(
      "sh", "image/docker-entrypoint.sh", grpcPort.toString, yamlPort.toString)
    pb.environment().put("ENGINE_JAR", jar)
    pb.environment().put("SPARK_GRAFT_CPUS", "4")
    pb.environment().put("SPARK_DRIVER_MEM", "2g")
    pb.redirectErrorStream(true)
    pb.redirectOutput(ProcessBuilder.Redirect.INHERIT)
    val proc = pb.start()
    try {
      awaitPort(grpcPort, proc); awaitPort(yamlPort, proc)
      println(s"[smoke] ports $grpcPort/$yamlPort are up")

      // ── one raw query over gRPC ─────────────────────────────────────
      val outDir = Files.createTempDirectory("graft-smoke")
      val grpcReq = RawQueryRequest(
        inputDataPaths = Vector(input),
        transform = Transform(queries = Vector(
          SqlQueryStep(None, "SELECT count(*) AS n FROM input"))),
        outputDataPath = s"$outDir/grpc.parquet")
      val client = new GrpcTestClient.Client("127.0.0.1", grpcPort)
      val reply =
        try client.call(GrpcEngineServer.PathRawQuery,
          GrpcEngineServer.grpcFrame(
            ProtoBytes.wrap(EngineFlatbuffers.writeRawQueryRequest(grpcReq))))
        finally client.close()
      require(reply.status == 0, s"grpc-status ${reply.status}: ${reply.message}")
      EngineFlatbuffers.readRawQueryResponse(
        ProtoBytes.unwrap(GrpcEngineServer.grpcUnframe(reply.body))) match {
        case RawQueryResponse.Success(n) =>
          require(n == 1, s"expected 1 count row over gRPC, got $n")
          println(s"[smoke] gRPC raw query served ($n row)")
        case other => sys.error(s"gRPC raw query failed: $other")
      }

      // ── one raw query over framed YAML ──────────────────────────────
      val yaml =
        s"""rawquery
           |inputDataPaths:
           |- "$input"
           |transform:
           |  kind: Sql
           |  engine: spark
           |  query: "SELECT count(*) AS n FROM input"
           |outputDataPath: "$outDir/yaml.parquet"
           |""".stripMargin
      val sock = new Socket("127.0.0.1", yamlPort)
      val respText =
        try {
          val out = new DataOutputStream(sock.getOutputStream)
          val payload = yaml.getBytes(UTF_8)
          out.writeInt(payload.length); out.write(payload); out.flush()
          val in = new DataInputStream(sock.getInputStream)
          val len = in.readInt()
          val buf = new Array[Byte](len)
          in.readFully(buf)
          new String(buf, UTF_8)
        } finally sock.close()
      require(respText.contains("kind: Success") && respText.contains("numRecords: 1"),
        s"unexpected YAML response:\n$respText")
      println("[smoke] framed-YAML raw query served")
      println("[smoke] OK")
    } finally {
      proc.destroy()
      if (!proc.waitFor(10, java.util.concurrent.TimeUnit.SECONDS))
        proc.destroyForcibly()
      ()
    }
  }

  private def awaitPort(port: Int, proc: Process, timeoutSec: Int = 180): Unit = {
    val deadline = System.nanoTime() + timeoutSec * 1000000000L
    while (System.nanoTime() < deadline) {
      require(proc.isAlive, "entrypoint process exited before listening")
      try {
        new Socket("127.0.0.1", port).close()
        return
      } catch { case _: java.io.IOException => Thread.sleep(500) }
    }
    sys.error(s"port $port did not come up within ${timeoutSec}s")
  }
}
