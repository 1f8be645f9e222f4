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
    // pin the young-dataset recompute detour off: short seeded chains here
    // must exercise the same engine paths their assertions were written for
    .config("spark.graft.recomputeYoungFactor", "0")
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

  test("frame grammar as documented in PROTOCOL.md §1 (raw bytes, no helpers)") {
    // frame := u32 big-endian length ++ UTF-8 payload;
    // request payload := method "\n" body; one response frame per request.
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-proto")
    val in1 = s"$dir/in.parquet"
    Seq((1L, "x")).toDF("id", "name").coalesce(1).write.parquet(in1)
    val body =
      s"""|inputDataPaths:
          |- "$in1"
          |transform:
          |  kind: Sql
          |  query: "SELECT id FROM input"
          |outputDataPath: "$dir/out.parquet"
          |""".stripMargin
    val payload = ("rawquery\n" + body).getBytes("UTF-8")
    withServer { (host, port) =>
      val sock = new Socket(host, port)
      try {
        val out = sock.getOutputStream
        // hand-built big-endian u32 length prefix
        out.write(Array[Byte](
          ((payload.length >> 24) & 0xff).toByte,
          ((payload.length >> 16) & 0xff).toByte,
          ((payload.length >> 8) & 0xff).toByte,
          (payload.length & 0xff).toByte))
        out.write(payload)
        out.flush()
        val in = new DataInputStream(sock.getInputStream)
        val replyLen = ((in.read() & 0xff) << 24) | ((in.read() & 0xff) << 16) |
          ((in.read() & 0xff) << 8) | (in.read() & 0xff)
        assert(replyLen > 0 && replyLen <= (64 << 20))
        val reply = new Array[Byte](replyLen)
        in.readFully(reply)
        val yaml = new String(reply, "UTF-8")
        assert(yaml.contains("kind: Success") && yaml.contains("numRecords: 1"), yaml)
        // unknown method → InvalidQuery response frame, connection stays up
        val bad = "nosuchmethod\nfoo: 1\n".getBytes("UTF-8")
        out.write(Array[Byte](0, 0, 0, bad.length.toByte)); out.write(bad); out.flush()
        val len2 = ((in.read() & 0xff) << 24) | ((in.read() & 0xff) << 16) |
          ((in.read() & 0xff) << 8) | (in.read() & 0xff)
        val reply2 = new Array[Byte](len2)
        in.readFully(reply2)
        assert(new String(reply2, "UTF-8").contains("kind: InvalidQuery"))
      } finally sock.close()
    }
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

  test("tar checkpoints round-trip the merge-path's hard-linked buffers over the socket") {
    import spark.implicits._
    import EngineFixtures.Ticker
    // Non-windowed GROUP BY → the incremental-merge path, whose buffers
    // carry across checkpoints as HARD LINKS (appendCarry). With .tar
    // checkpoint paths those links are made inside withTarCheckpoints'
    // scratch dirs, which are DELETED after each response — the links must
    // keep the data alive and the re-packed tar must carry full content.
    val dir = Files.createTempDirectory("graft-srv3")
    def slice(num: Int, rows: Seq[Ticker]): String = {
      val p = s"$dir/in$num.parquet"
      graft.engine.ParquetSliceSink.writeSingleFile(
        spark.createDataset(rows).toDF(), p)
      p
    }
    val in1 = slice(1, Seq(
      Ticker(0, 0, t(ts(1)), t(ts(1)), "A", 10),
      Ticker(1, 0, t(ts(1)), t(ts(1)), "B", 20)))
    val in2 = slice(2, Seq(Ticker(2, 0, t(ts(2)), t(ts(2)), "A", 5)))

    def request(num: Int, in: Option[(String, Long, Long)], wm: String,
        nextOff: Long, prevCp: Option[String]): String = {
      val sliceYaml = in match {
        case Some((p, s, e)) =>
          s"""|  offsetInterval:
              |    start: $s
              |    end: $e
              |  dataPaths:
              |  - "$p"""".stripMargin
        case None => "  dataPaths: []"
      }
      s"""|datasetId: "did:odf:out"
          |datasetAlias: out
          |systemTime: "2000-01-1${num}T00:00:00Z"
          |nextOffset: $nextOff
          |transform:
          |  kind: Sql
          |  engine: spark
          |  query: |
          |    SELECT max(event_time) as event_time, symbol,
          |      count(*) as n, sum(price) as total
          |    FROM tickers GROUP BY symbol
          |queryInputs:
          |- datasetId: "did:odf:in"
          |  queryAlias: tickers
          |$sliceYaml
          |  schemaFile: "$in1"
          |  explicitWatermarks:
          |  - systemTime: "$wm"
          |    eventTime: "$wm"
          |${prevCp.map(p => s"prevCheckpointPath: \"$p\"").getOrElse("")}
          |newCheckpointPath: "$dir/cp$num.tar"
          |newDataPath: "$dir/out$num.parquet"
          |""".stripMargin
    }

    withServer { (host, port) =>
      val sock = new Socket(host, port)
      try {
        val r1 = call(sock, "transform",
          request(1, Some((in1, 0, 1)), "2000-01-01T00:00:00Z", 0, None))
        assert(r1.contains("kind: Success"), r1)
        assert(Files.isRegularFile(java.nio.file.Paths.get(s"$dir/cp1.tar")))

        val r2 = call(sock, "transform",
          request(2, Some((in2, 2, 2)), "2000-01-02T00:00:00Z", 2,
            Some(s"$dir/cp1.tar")))
        assert(r2.contains("kind: Success"), r2)
        // A corrects with FULL-history totals (count 2, sum 15) — proof the
        // buffer and snapshot survived the tar round-trip
        val o2 = spark.read.parquet(s"$dir/out2.parquet").orderBy("offset").collect()
        assert(o2.map(r => (r.getAs[String]("symbol"), r.getAs[Int]("op"),
          r.getAs[Long]("n"), r.getAs[Long]("total"))).toSeq == Seq(
          ("A", graft.protocol.Op.CorrectFrom, 1L, 10L),
          ("A", graft.protocol.Op.CorrectTo, 2L, 15L)))

        // run 3: watermark-only; re-links files that themselves came from a
        // tar of linked files; nothing re-emits
        val r3 = call(sock, "transform",
          request(3, None, "2000-01-03T00:00:00Z", 4, Some(s"$dir/cp2.tar")))
        assert(r3.contains("kind: Success"), r3)
        assert(!r3.contains("newOffsetInterval"), r3)
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
