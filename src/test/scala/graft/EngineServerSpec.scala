package graft

import java.io.{DataInputStream, DataOutputStream}
import java.net.{ServerSocket, Socket}
import java.nio.file.Files
import java.sql.Timestamp
import java.time.Instant

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.server.EngineServer

/** Drives the framed-TCP transport end to end on an ephemeral port: raw
  * query, a stateful transform whose checkpoint carries across two requests
  * on one connection, and the error-as-response contract.
  */
class EngineServerSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def ts(day: Int, hour: Int = 0): Instant =
    Instant.parse(f"2000-01-${day}%02dT${hour}%02d:00:00Z")
  def t(i: Instant): Timestamp = Timestamp.from(i)

  private def withServer[T](f: (String, Int) => T): T = {
    val server = new ServerSocket(0)
    val thread = new Thread(() => EngineServer.serve(spark, server))
    thread.setDaemon(true)
    thread.start()
    try f("127.0.0.1", server.getLocalPort)
    finally server.close()
  }

  private def call(sock: Socket, method: String, yaml: String): String = {
    val out = new DataOutputStream(sock.getOutputStream)
    val in = new DataInputStream(sock.getInputStream)
    EngineServer.writeFrame(out, s"$method\n$yaml")
    EngineServer.readFrame(in)
  }

  test("raw query executes over the socket") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-srv")
    val in1 = s"$dir/in.parquet"
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "name")
      .coalesce(1).write.parquet(in1)
    val req =
      s"""|inputDataPaths:
          |- "$in1"
          |transform:
          |  kind: Sql
          |  engine: spark
          |  query: "SELECT id, name FROM input WHERE id >= 2"
          |outputDataPath: "$dir/out.parquet"
          |""".stripMargin
    withServer { (host, port) =>
      val sock = new Socket(host, port)
      try {
        val resp = call(sock, "rawquery", req)
        assert(resp.contains("kind: Success") && resp.contains("numRecords: 2"), resp)
      } finally sock.close()
    }
    assert(spark.read.parquet(s"$dir/out.parquet").count() == 2)
  }

  test("stateful transform carries checkpoint across requests on one connection") {
    import spark.implicits._
    import EngineFixtures.Ticker
    val dir = Files.createTempDirectory("graft-srv2")
    val in1 = s"$dir/in1.parquet"
    graft.engine.ParquetSliceSink.writeSingleFile(
      spark.createDataset(Seq(
        Ticker(0, 0, t(ts(1)), t(ts(1, 1)), "A", 10),
        Ticker(1, 0, t(ts(1)), t(ts(1, 2)), "A", 12),
        Ticker(2, 0, t(ts(1)), t(ts(2, 1)), "A", 20))).toDF(), in1)

    def request(num: Int, slice: Boolean, wm: String, prevCp: Option[String]): String = {
      val sliceYaml =
        if (slice)
          s"""|  offsetInterval:
              |    start: 0
              |    end: 2
              |  dataPaths:
              |  - "$in1"""".stripMargin
        else "  dataPaths: []"
      s"""|datasetId: "did:odf:out"
          |datasetAlias: out
          |systemTime: "2000-01-1${num}T00:00:00Z"
          |nextOffset: ${num - 1}
          |transform:
          |  kind: Sql
          |  engine: spark
          |  query: |
          |    SELECT TUMBLE_START(event_time, INTERVAL '1' DAY) as event_time,
          |      symbol, min(price) as `min`, max(price) as `max`
          |    FROM tickers
          |    GROUP BY TUMBLE(event_time, INTERVAL '1' DAY), symbol
          |queryInputs:
          |- datasetId: "did:odf:in"
          |  queryAlias: tickers
          |$sliceYaml
          |  schemaFile: "$in1"
          |  explicitWatermarks:
          |  - systemTime: "$wm"
          |    eventTime: "$wm"
          |${prevCp.map(p => s"prevCheckpointPath: \"$p\"").getOrElse("")}
          |newCheckpointPath: "$dir/cp$num"
          |newDataPath: "$dir/out$num.parquet"
          |""".stripMargin
    }

    withServer { (host, port) =>
      val sock = new Socket(host, port)
      try {
        val resp1 = call(sock, "transform",
          request(1, slice = true, "2000-01-02T00:00:00Z", None))
        assert(resp1.contains("kind: Success"), resp1)
        assert(resp1.contains("newWatermark: 2000-01-02T00:00:00Z"), resp1)

        val resp2 = call(sock, "transform",
          request(2, slice = false, "2000-01-04T00:00:00Z", Some(s"$dir/cp1")))
        assert(resp2.contains("kind: Success"), resp2)
        assert(resp2.contains("start: 1") && resp2.contains("end: 1"), resp2)
      } finally sock.close()
    }
    val o2 = spark.read.parquet(s"$dir/out2.parquet").collect()
    assert(o2.length == 1 && o2(0).getAs[Int]("min") == 20
      && o2(0).getAs[Int]("max") == 20)
  }

  test("bad requests come back as response kinds, not dropped connections") {
    withServer { (host, port) =>
      val sock = new Socket(host, port)
      try {
        val r1 = call(sock, "nonsense", "")
        assert(r1.contains("kind: InvalidQuery"), r1)
        val r2 = call(sock, "transform", "not: [valid")
        assert(r2.contains("kind: InternalError"), r2)
        // connection still usable after both errors
        val r3 = call(sock, "nonsense", "")
        assert(r3.contains("kind: InvalidQuery"), r3)
      } finally sock.close()
    }
  }

  test("a crashed or malformed client does not take the accept loop down") {
    withServer { (host, port) =>
      // client 1: writes a length prefix promising bytes it never sends,
      // then resets the connection mid-frame
      val bad1 = new Socket(host, port)
      bad1.getOutputStream.write(Array[Byte](0, 0, 16, 0)) // 4096-byte promise
      bad1.getOutputStream.flush()
      bad1.setSoLinger(true, 0) // RST on close, not FIN
      bad1.close()
      // client 2: an absurd frame length the server must refuse, not buffer
      val bad2 = new Socket(host, port)
      try {
        bad2.getOutputStream.write(Array[Byte](0x7f, -1, -1, -1))
        bad2.getOutputStream.flush()
      } finally bad2.close()
      // the server must still serve a well-formed client afterwards
      val good = new Socket(host, port)
      try {
        val r = call(good, "nonsense", "")
        assert(r.contains("kind: InvalidQuery"), r)
      } finally good.close()
    }
  }
}
