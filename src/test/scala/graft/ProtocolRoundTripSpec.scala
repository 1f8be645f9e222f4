package graft

import java.nio.file.{Files, Path, Paths}
import java.sql.Timestamp
import java.time.Instant

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, struct}
import org.scalatest.funsuite.AnyFunSuite

import graft.protocol._

/** Process-level in-out contract test: drives `graft.TransformRunner` as a
  * separate JVM with request/response YAML files — the reference engine's
  * actual invocation contract (its adapter execs the engine with request
  * files and collects response files, adapter/src/adapter.rs:103-165) —
  * including prevCheckpoint restore across two independent process
  * invocations.
  *
  * Transport decision (SURVEY.md §2.3): the reference's gRPC/FlatBuffers
  * endpoint is a thin shell over exactly this request/response round trip;
  * the engine API stays transport-agnostic and this file pins the contract
  * a transport must drive.
  */
class ProtocolRoundTripSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    // pin the young-dataset recompute detour off: the byte-identity chains
    // here assert merge-path state layout from run 1 (EngineSpec has the
    // detour's dedicated tests)
    .config("spark.graft.recomputeYoungFactor", "0")
    .getOrCreate()

  def ts(day: Int, hour: Int = 0): Instant =
    Instant.parse(f"2000-01-${day}%02dT${hour}%02d:00:00Z")
  def t(i: Instant): Timestamp = Timestamp.from(i)

  private def runProcess(mode: String, reqYaml: String, dir: Path, tag: String): String = {
    val reqPath = dir.resolve(s"request_$tag.yaml")
    val respPath = dir.resolve(s"response_$tag.yaml")
    Files.writeString(reqPath, reqYaml)
    val java = Paths.get(sys.props("java.home"), "bin", "java").toString
    val cp = sys.props("java.class.path")
    val cmd = Seq(java, "-cp", cp, "-Xmx2g",
      "--add-exports=java.base/sun.nio.ch=ALL-UNNAMED",
      "graft.TransformRunner", mode, reqPath.toString, respPath.toString)
    val pb = new ProcessBuilder(cmd: _*)
    pb.environment().put("SPARK_GRAFT_CPUS", "4")
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val log = new String(proc.getInputStream.readAllBytes())
    val code = proc.waitFor()
    assert(code == 0, s"TransformRunner exited $code:\n${log.takeRight(4000)}")
    assert(Files.exists(respPath), "no response file written")
    Files.readString(respPath)
  }

  test("transform request/response round-trips across two engine processes") {
    import spark.implicits._
    import EngineFixtures.Ticker
    val dir = Files.createTempDirectory("graft-proto")
    val in1 = s"$dir/in1.parquet"
    graft.engine.ParquetSliceSink.writeSingleFile(
      spark.createDataset(Seq(
        Ticker(0, 0, t(ts(1)), t(ts(1, 1)), "A", 10),
        Ticker(1, 0, t(ts(1)), t(ts(1, 2)), "A", 12),
        Ticker(2, 0, t(ts(1)), t(ts(2, 1)), "A", 20))).toDF(), in1)

    def request(num: Int, dataRows: Option[(String, Int, Int)], wm: String,
        prevCp: Option[String]): String = {
      val slice = dataRows.map { case (path, s, e) =>
        s"""|  offsetInterval:
            |    start: $s
            |    end: $e
            |  dataPaths:
            |  - "$path"""".stripMargin
      }.getOrElse("  dataPaths: []")
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
          |$slice
          |  schemaFile: "$in1"
          |  explicitWatermarks:
          |  - systemTime: "$wm"
          |    eventTime: "$wm"
          |${prevCp.map(p => s"prevCheckpointPath: \"$p\"").getOrElse("")}
          |newCheckpointPath: "$dir/cp$num"
          |newDataPath: "$dir/out$num.parquet"
          |""".stripMargin
    }

    // Process 1: data days 1-2, watermark day 2 → day-1 window closes.
    val resp1 = runProcess("transform",
      request(1, Some((in1, 0, 2)), "2000-01-02T00:00:00Z", None), dir, "1")
    assert(resp1.contains("kind: Success"), resp1)
    assert(resp1.contains("start: 0") && resp1.contains("end: 0"), resp1)
    assert(resp1.contains("newWatermark: 2000-01-02T00:00:00Z"), resp1)
    val o1 = spark.read.parquet(s"$dir/out1.parquet").collect()
    assert(o1.length == 1 && o1(0).getAs[Int]("min") == 10
      && o1(0).getAs[Int]("max") == 12)

    // Process 2 (fresh JVM, restored checkpoint): watermark-only advance to
    // day 4 → the buffered day-2 window closes exactly once.
    val resp2 = runProcess("transform",
      request(2, None, "2000-01-04T00:00:00Z", Some(s"$dir/cp1")), dir, "2")
    assert(resp2.contains("kind: Success"), resp2)
    assert(resp2.contains("start: 1") && resp2.contains("end: 1"), resp2)
    assert(resp2.contains("newWatermark: 2000-01-04T00:00:00Z"), resp2)
    val o2 = spark.read.parquet(s"$dir/out2.parquet").collect()
    assert(o2.length == 1 && o2(0).getAs[Int]("min") == 20)
    assert(o2(0).getAs[Timestamp]("event_time") == t(ts(2)))
  }

  test("streaming execution mode produces byte-identical slices across a chain") {
    // transform.engine = "spark-streaming" routes the relational work
    // through Structured Streaming (Trigger.AvailableNow, complete-mode
    // aggregation, foreachBatch parquet sink) while the engine keeps its
    // explicit watermark algebra and offset/sink machinery — so the SAME
    // two-run tumbling chain must write bit-for-bit identical output
    // slices and checkpoint ledgers under either engine value.
    import spark.implicits._
    import EngineFixtures.Ticker
    val dir = Files.createTempDirectory("graft-proto-stream")
    val in1 = s"$dir/in1.parquet"
    graft.engine.ParquetSliceSink.writeSingleFile(
      spark.createDataset(Seq(
        Ticker(0, 0, t(ts(1)), t(ts(1, 1)), "A", 10),
        Ticker(1, 0, t(ts(1)), t(ts(1, 2)), "A", 12),
        Ticker(2, 0, t(ts(1)), t(ts(2, 1)), "A", 20))).toDF(), in1)

    def request(engine: String, tag: String, num: Int,
        dataRows: Option[(String, Int, Int)], wm: String,
        prevCp: Option[String]): String = {
      val slice = dataRows.map { case (path, s, e) =>
        s"""|  offsetInterval:
            |    start: $s
            |    end: $e
            |  dataPaths:
            |  - "$path"""".stripMargin
      }.getOrElse("  dataPaths: []")
      s"""|datasetId: "did:odf:out"
          |datasetAlias: out
          |systemTime: "2000-01-1${num}T00:00:00Z"
          |nextOffset: ${num - 1}
          |transform:
          |  kind: Sql
          |  engine: $engine
          |  query: |
          |    SELECT TUMBLE_START(event_time, INTERVAL '1' DAY) as event_time,
          |      symbol, min(price) as `min`, max(price) as `max`
          |    FROM tickers
          |    GROUP BY TUMBLE(event_time, INTERVAL '1' DAY), symbol
          |queryInputs:
          |- datasetId: "did:odf:in"
          |  queryAlias: tickers
          |$slice
          |  schemaFile: "$in1"
          |  explicitWatermarks:
          |  - systemTime: "$wm"
          |    eventTime: "$wm"
          |${prevCp.map(p => s"prevCheckpointPath: \"$p\"").getOrElse("")}
          |newCheckpointPath: "$dir/$tag/cp$num"
          |newDataPath: "$dir/$tag/out$num.parquet"
          |""".stripMargin
    }

    // Byte-identity is asserted IN-PROCESS: parquet-mr serializes each
    // column chunk's encodings from a HashSet<Encoding>, and enum hash
    // codes are identity-based, so the list ORDER varies per JVM — two
    // separate processes never guarantee bit-equal footers even for
    // batch-vs-batch. Within one JVM the whole pipeline is deterministic,
    // which is the meaningful claim: the streaming executor feeds the SAME
    // sink machinery the same rows in the same order.
    def chainInProcess(engine: String, tag: String): Unit = {
      import graft.engine.TransformEngine
      def req(num: Int, oi: Option[OffsetInterval], wm: Instant,
          prev: Option[String]) = TransformRequest(
        "did:odf:out", "out", ts(10 + num), DatasetVocabulary(),
        Transform(engine = engine, queries = Vector(SqlQueryStep(None,
          """SELECT TUMBLE_START(event_time, INTERVAL '1' DAY) as event_time,
            |  symbol, min(price) as `min`, max(price) as `max`
            |FROM tickers
            |GROUP BY TUMBLE(event_time, INTERVAL '1' DAY), symbol""".stripMargin))),
        Vector(TransformRequestInput(
          datasetId = "did:odf:in", datasetAlias = "tickers",
          queryAlias = "tickers", offsetInterval = oi,
          dataPaths = if (oi.isDefined) Vector(in1) else Vector.empty,
          schemaFile = in1,
          explicitWatermarks = Vector(RequestWatermark(wm, wm)))),
        nextOffset = num - 1, prevCheckpointPath = prev,
        newCheckpointPath = s"$dir/$tag/cp$num",
        newDataPath = s"$dir/$tag/out$num.parquet")
      val e = new TransformEngine(spark)
      assert(e.executeTransform(req(1, Some(OffsetInterval(0, 2)),
        ts(2), None)).isInstanceOf[TransformResponse.Success])
      assert(e.executeTransform(req(2, None, ts(4),
        Some(s"$dir/$tag/cp1"))).isInstanceOf[TransformResponse.Success])
    }
    chainInProcess("spark", "batch")
    chainInProcess("spark-streaming", "stream")
    (1 to 2).foreach { n =>
      val batch = Files.readAllBytes(Paths.get(s"$dir/batch/out$n.parquet"))
      val stream = Files.readAllBytes(Paths.get(s"$dir/stream/out$n.parquet"))
      assert(java.util.Arrays.equals(batch, stream),
        s"run-$n output slices are not byte-identical " +
          s"(batch ${batch.length}B, streaming ${stream.length}B)")
      assert(
        Files.readString(Paths.get(s"$dir/batch/cp$n/ledger.json")) ==
          Files.readString(Paths.get(s"$dir/stream/cp$n/ledger.json")))
    }

    // stateless shapes run through the streaming engine too (append mode,
    // __seq arrival-order emission preserved → identical offsets)
    def mapRun(engine: String, tag: String): Unit = {
      import graft.engine.TransformEngine
      val resp = new TransformEngine(spark).executeTransform(TransformRequest(
        "did:odf:out", "out", ts(11), DatasetVocabulary(),
        Transform(engine = engine, queries = Vector(SqlQueryStep(None,
          "SELECT event_time, symbol, price * 2 AS dbl FROM tickers"))),
        Vector(TransformRequestInput(
          datasetId = "did:odf:in", datasetAlias = "tickers",
          queryAlias = "tickers", offsetInterval = Some(OffsetInterval(0, 2)),
          dataPaths = Vector(in1), schemaFile = in1,
          explicitWatermarks = Vector(RequestWatermark(ts(2), ts(2))))),
        nextOffset = 0, prevCheckpointPath = None,
        newCheckpointPath = s"$dir/$tag/cpm",
        newDataPath = s"$dir/$tag/map.parquet"))
      assert(resp == TransformResponse.Success(
        Some(OffsetInterval(0, 2)), Some(ts(2))))
    }
    mapRun("spark", "batch"); mapRun("spark-streaming", "stream")
    assert(java.util.Arrays.equals(
      Files.readAllBytes(Paths.get(s"$dir/batch/map.parquet")),
      Files.readAllBytes(Paths.get(s"$dir/stream/map.parquet"))),
      "stateless streaming slice is not byte-identical to batch")

    // and the PROCESS-level protocol path serves the streaming engine end
    // to end: same request YAML, engine switched, same response values
    val s1 = runProcess("transform",
      request("spark-streaming", "pstream", 1, Some((in1, 0, 2)),
        "2000-01-02T00:00:00Z", None), dir, "pstream-1")
    assert(s1.contains("kind: Success"), s1)
    assert(s1.contains("start: 0") && s1.contains("end: 0"), s1)
    assert(s1.contains("newWatermark: 2000-01-02T00:00:00Z"), s1)
    val po = spark.read.parquet(s"$dir/pstream/out1.parquet").collect()
    assert(po.length == 1 && po(0).getAs[Int]("min") == 10
      && po(0).getAs[Int]("max") == 12)
    // an OP-READING min/max aggregate — rejected through round 10 —
    // serves since round 11 while the history is append-only (the merge
    // and recompute paths bind identical raw values until the first
    // retraction, which flips both engines to the recompute face)
    val opAgg = runProcess("transform",
      s"""|datasetId: "did:odf:out"
          |datasetAlias: out
          |systemTime: "2000-01-15T00:00:00Z"
          |nextOffset: 0
          |transform:
          |  kind: Sql
          |  engine: spark-streaming
          |  query: "SELECT event_time, symbol, min(price) AS mn FROM tickers WHERE op = 0 GROUP BY event_time, symbol"
          |queryInputs:
          |- datasetId: "did:odf:in"
          |  queryAlias: tickers
          |  offsetInterval:
          |    start: 0
          |    end: 2
          |  dataPaths:
          |  - "$in1"
          |  schemaFile: "$in1"
          |newCheckpointPath: "$dir/opagg/cp1"
          |newDataPath: "$dir/opagg/out1.parquet"
          |""".stripMargin, dir, "opagg")
    assert(opAgg.contains("kind: Success"), opAgg)
    // and an unsupported shape under the streaming engine is still
    // rejected, not silently run in batch: a map-typed output column —
    // the streaming diffs cannot key or compare map values canonically,
    // and the batch twin's struct <=> fails analysis on maps, so the
    // shape rejects identically in both modes
    val bad = runProcess("transform",
      s"""|datasetId: "did:odf:out"
          |datasetAlias: out
          |systemTime: "2000-01-15T00:00:00Z"
          |nextOffset: 0
          |transform:
          |  kind: Sql
          |  engine: spark-streaming
          |  query: "SELECT event_time, symbol, map('p', price) AS m FROM tickers WHERE price > (SELECT min(price) FROM tickers)"
          |queryInputs:
          |- datasetId: "did:odf:in"
          |  queryAlias: tickers
          |  offsetInterval:
          |    start: 0
          |    end: 2
          |  dataPaths:
          |  - "$in1"
          |  schemaFile: "$in1"
          |newCheckpointPath: "$dir/bad/cp1"
          |newDataPath: "$dir/bad/out1.parquet"
          |""".stripMargin, dir, "bad")
    assert(bad.contains("kind: InvalidQuery"), bad)
    assert(bad.contains("streaming execution mode"), bad)
    // the round-10 generic face SERVES the scalar-subquery recompute
    // chain that rejected through round 9 — spot-check it succeeds
    val generic = runProcess("transform",
      s"""|datasetId: "did:odf:out"
          |datasetAlias: out
          |systemTime: "2000-01-15T00:00:00Z"
          |nextOffset: 0
          |transform:
          |  kind: Sql
          |  engine: spark-streaming
          |  query: "SELECT event_time, symbol FROM tickers WHERE price > (SELECT min(price) FROM tickers)"
          |queryInputs:
          |- datasetId: "did:odf:in"
          |  queryAlias: tickers
          |  offsetInterval:
          |    start: 0
          |    end: 2
          |  dataPaths:
          |  - "$in1"
          |  schemaFile: "$in1"
          |newCheckpointPath: "$dir/generic/cp1"
          |newDataPath: "$dir/generic/out1.parquet"
          |""".stripMargin, dir, "generic")
    assert(generic.contains("kind: Success"), generic)
  }

  test("streaming execution mode covers interval joins byte-identically") {
    // An interval join (no tumble) under engine = spark-streaming runs as
    // a stream-stream INNER join materialized in append mode under
    // Trigger.AvailableNow — a one-shot run holds join state for its whole
    // duration, so the joined rows equal the batch join exactly, and the
    // engine's own watermark gating + emit-threshold algebra then applies
    // to the materialized frame. Two-run chain must match the batch
    // engine's slices and ledgers byte for byte.
    import spark.implicits._
    import EngineFixtures.{OrderRow, Shipment}
    val dir = Files.createTempDirectory("graft-proto-stream-ij")
    val o1 = s"$dir/o1.parquet"; val s1 = s"$dir/s1.parquet"
    val s2 = s"$dir/s2.parquet"
    graft.engine.ParquetSliceSink.writeSingleFile(
      spark.createDataset(Seq(
        OrderRow(0, 0, t(ts(1)), t(ts(1)), 1L, 10L),
        OrderRow(1, 0, t(ts(1)), t(ts(2)), 2L, 20L))).toDF(), o1)
    graft.engine.ParquetSliceSink.writeSingleFile(
      spark.createDataset(Seq(
        Shipment(0, 0, t(ts(1)), t(ts(2)), 1L, 5L))).toDF(), s1)
    graft.engine.ParquetSliceSink.writeSingleFile(
      spark.createDataset(Seq(
        Shipment(1, 0, t(ts(3)), t(ts(3)), 2L, 7L))).toDF(), s2)
    val q =
      """SELECT o.event_time as event_time, o.order_id as order_id,
        |  s.num_shipped as num_shipped
        |FROM orders o JOIN shipments s
        |ON o.order_id = s.order_id
        |AND s.event_time BETWEEN o.event_time AND o.event_time + INTERVAL '2' DAY""".stripMargin
    def chain(engine: String, tag: String): Unit = {
      import graft.engine.TransformEngine
      def in(alias: String, path: Option[String], schema: String,
          oi: Option[OffsetInterval], wm: Instant) = TransformRequestInput(
        datasetId = s"did:odf:$alias", datasetAlias = alias,
        queryAlias = alias, offsetInterval = oi,
        dataPaths = path.toVector, schemaFile = schema,
        explicitWatermarks = Vector(RequestWatermark(wm, wm)))
      val e = new TransformEngine(spark)
      val r1 = e.executeTransform(TransformRequest(
        "did:odf:out", "out", ts(11), DatasetVocabulary(),
        Transform(engine = engine, queries = Vector(SqlQueryStep(None, q))),
        Vector(
          in("orders", Some(o1), o1, Some(OffsetInterval(0, 1)), ts(3)),
          in("shipments", Some(s1), s1, Some(OffsetInterval(0, 0)), ts(3))),
        nextOffset = 0, prevCheckpointPath = None,
        newCheckpointPath = s"$dir/$tag/cp1",
        newDataPath = s"$dir/$tag/out1.parquet"))
      assert(r1.isInstanceOf[TransformResponse.Success], s"$tag run1: $r1")
      val r2 = e.executeTransform(TransformRequest(
        "did:odf:out", "out", ts(12), DatasetVocabulary(),
        Transform(engine = engine, queries = Vector(SqlQueryStep(None, q))),
        Vector(
          in("orders", None, o1, None, ts(5)),
          in("shipments", Some(s2), s1, Some(OffsetInterval(1, 1)), ts(5))),
        nextOffset = 1, prevCheckpointPath = Some(s"$dir/$tag/cp1"),
        newCheckpointPath = s"$dir/$tag/cp2",
        newDataPath = s"$dir/$tag/out2.parquet"))
      assert(r2.isInstanceOf[TransformResponse.Success], s"$tag run2: $r2")
    }
    chain("spark", "batch")
    chain("spark-streaming", "stream")
    (1 to 2).foreach { n =>
      assert(java.util.Arrays.equals(
        Files.readAllBytes(Paths.get(s"$dir/batch/out$n.parquet")),
        Files.readAllBytes(Paths.get(s"$dir/stream/out$n.parquet"))),
        s"run-$n interval-join slices are not byte-identical")
      assert(
        Files.readString(Paths.get(s"$dir/batch/cp$n/ledger.json")) ==
          Files.readString(Paths.get(s"$dir/stream/cp$n/ledger.json")))
    }
    // sanity on content: run 1 emits the order-1 pair, run 2 the order-2 pair
    val out1 = spark.read.parquet(s"$dir/stream/out1.parquet").collect()
    assert(out1.map(_.getAs[Long]("order_id")).toSeq == Seq(1L))
    val out2 = spark.read.parquet(s"$dir/stream/out2.parquet").collect()
    assert(out2.map(_.getAs[Long]("order_id")).toSeq == Seq(2L))
  }

  test("streaming execution mode covers as-of joins byte-identically") {
    // An as-of join under engine = spark-streaming runs the join itself
    // through StreamingAsOf (flatMapGroupsWithState probe hold-back with
    // a sentinel-advanced watermark releasing the engine-gated eligible
    // set); the engine keeps its eligibility gate, version-store
    // compaction, and ledger algebra. A two-run chain — including a
    // held-back probe released by a watermark-only second run — must match
    // the batch engine's slices and ledgers byte for byte.
    import spark.implicits._
    import EngineFixtures.{Stock, Ticker}
    val dir = Files.createTempDirectory("graft-proto-stream-asof")
    val tick1 = s"$dir/tick1.parquet"; val stock1 = s"$dir/stock1.parquet"
    graft.engine.ParquetSliceSink.writeSingleFile(
      spark.createDataset(Seq(
        Ticker(0, 0, t(ts(1)), t(ts(1)), "A", 100),
        Ticker(1, 0, t(ts(1)), t(ts(2)), "A", 110),
        Ticker(2, 0, t(ts(1)), t(ts(4)), "A", 140))).toDF(), tick1)
    graft.engine.ParquetSliceSink.writeSingleFile(
      spark.createDataset(Seq(
        Stock(0, 0, t(ts(1)), t(ts(1)), "A", 5),
        Stock(1, 0, t(ts(1)), t(ts(2)), "A", 7))).toDF(), stock1)
    val q = """SELECT t.event_time, t.symbol, owned.volume as volume,
              |  t.price as current_price, owned.volume * t.price as current_value
              |FROM tickers as t
              |JOIN stocks_owned FOR SYSTEM_TIME AS OF t.event_time AS owned
              |  ON t.symbol = owned.symbol""".stripMargin
    def chain(engine: String, tag: String): Unit = {
      import graft.engine.TransformEngine
      def in(alias: String, path: Option[String], schema: String,
          oi: Option[OffsetInterval], wm: Instant) = TransformRequestInput(
        datasetId = s"did:odf:$alias", datasetAlias = alias,
        queryAlias = alias, offsetInterval = oi,
        dataPaths = path.toVector, schemaFile = schema,
        explicitWatermarks = Vector(RequestWatermark(wm, wm)))
      def tr(num: Int, inputs: Vector[TransformRequestInput],
          nextOff: Long, prev: Option[String]) = TransformRequest(
        "did:odf:out", "out", ts(10 + num), DatasetVocabulary(),
        Transform(engine = engine,
          queries = Vector(SqlQueryStep(None, q)),
          temporalTables =
            Vector(TemporalTable("stocks_owned", Vector("symbol")))),
        inputs, nextOffset = nextOff, prevCheckpointPath = prev,
        newCheckpointPath = s"$dir/$tag/cp$num",
        newDataPath = s"$dir/$tag/out$num.parquet")
      val e = new TransformEngine(spark)
      val r1 = e.executeTransform(tr(1, Vector(
        in("tickers", Some(tick1), tick1, Some(OffsetInterval(0, 2)), ts(5)),
        in("stocks_owned", Some(stock1), stock1, Some(OffsetInterval(0, 1)), ts(3))),
        0, None))
      assert(r1.isInstanceOf[TransformResponse.Success], s"$tag run1: $r1")
      // run 2: watermark-only — build wm passes day 4, held probe emits
      val r2 = e.executeTransform(tr(2, Vector(
        in("tickers", None, tick1, None, ts(5)),
        in("stocks_owned", None, stock1, None, ts(5))),
        2, Some(s"$dir/$tag/cp1")))
      assert(r2.isInstanceOf[TransformResponse.Success], s"$tag run2: $r2")
    }
    chain("spark", "batch")
    chain("spark-streaming", "stream")
    (1 to 2).foreach { n =>
      assert(java.util.Arrays.equals(
        Files.readAllBytes(Paths.get(s"$dir/batch/out$n.parquet")),
        Files.readAllBytes(Paths.get(s"$dir/stream/out$n.parquet"))),
        s"run-$n as-of slices are not byte-identical")
      assert(
        Files.readString(Paths.get(s"$dir/batch/cp$n/ledger.json")) ==
          Files.readString(Paths.get(s"$dir/stream/cp$n/ledger.json")))
    }
    val out1 = spark.read.parquet(s"$dir/stream/out1.parquet")
      .orderBy("offset").collect()
    assert(out1.map(_.getAs[Int]("current_value")).toSeq == Seq(500, 770))
    val out2 = spark.read.parquet(s"$dir/stream/out2.parquet").collect()
    assert(out2.length == 1 && out2(0).getAs[Int]("volume") == 7
      && out2(0).getAs[Int]("current_price") == 140)
  }

  test("streaming execution mode covers Top-N changelogs byte-identically") {
    // A partitioned Top-N under engine = spark-streaming seeds
    // StreamingTopN's per-key state from the stored snapshot and processes
    // the slice as one micro-batch; its emissions equal the batch snapshot
    // diff keyed on (partition, rank). Two-run chain with a rank
    // displacement must match batch slices and ledgers byte for byte.
    import spark.implicits._
    import EngineFixtures.Ticker
    val dir = Files.createTempDirectory("graft-proto-stream-topn")
    val in1 = s"$dir/in1.parquet"; val in2 = s"$dir/in2.parquet"
    graft.engine.ParquetSliceSink.writeSingleFile(
      spark.createDataset(Seq(
        Ticker(0, 0, t(ts(1)), t(ts(1)), "A", 10),
        Ticker(1, 0, t(ts(1)), t(ts(1)), "B", 20),
        Ticker(2, 0, t(ts(1)), t(ts(1)), "A", 5))).toDF(), in1)
    graft.engine.ParquetSliceSink.writeSingleFile(
      spark.createDataset(Seq(
        Ticker(3, 0, t(ts(2)), t(ts(2)), "A", 30))).toDF(), in2)
    val q = """SELECT event_time, symbol, price, rn FROM (
              |  SELECT event_time, symbol, price,
              |    row_number() OVER (PARTITION BY symbol ORDER BY price DESC) AS rn
              |  FROM tickers) WHERE rn <= 2""".stripMargin
    def chain(engine: String, tag: String): Unit = {
      import graft.engine.TransformEngine
      def tr(num: Int, path: Option[String], oi: Option[OffsetInterval],
          wm: Instant, nextOff: Long, prev: Option[String]) = TransformRequest(
        "did:odf:out", "out", ts(10 + num), DatasetVocabulary(),
        Transform(engine = engine, queries = Vector(SqlQueryStep(None, q))),
        Vector(TransformRequestInput(
          datasetId = "did:odf:in", datasetAlias = "tickers",
          queryAlias = "tickers", offsetInterval = oi,
          dataPaths = path.toVector, schemaFile = in1,
          explicitWatermarks = Vector(RequestWatermark(wm, wm)))),
        nextOffset = nextOff, prevCheckpointPath = prev,
        newCheckpointPath = s"$dir/$tag/cp$num",
        newDataPath = s"$dir/$tag/out$num.parquet")
      val e = new TransformEngine(spark)
      val r1 = e.executeTransform(
        tr(1, Some(in1), Some(OffsetInterval(0, 2)), ts(1), 0, None))
      assert(r1.isInstanceOf[TransformResponse.Success], s"$tag run1: $r1")
      val r2 = e.executeTransform(
        tr(2, Some(in2), Some(OffsetInterval(3, 3)), ts(2), 3,
          Some(s"$dir/$tag/cp1")))
      assert(r2.isInstanceOf[TransformResponse.Success], s"$tag run2: $r2")
    }
    chain("spark", "batch")
    chain("spark-streaming", "stream")
    (1 to 2).foreach { n =>
      assert(java.util.Arrays.equals(
        Files.readAllBytes(Paths.get(s"$dir/batch/out$n.parquet")),
        Files.readAllBytes(Paths.get(s"$dir/stream/out$n.parquet"))),
        s"run-$n Top-N slices are not byte-identical")
      assert(
        Files.readString(Paths.get(s"$dir/batch/cp$n/ledger.json")) ==
          Files.readString(Paths.get(s"$dir/stream/cp$n/ledger.json")))
    }
    // run 1: +I for (A,1),(A,2),(B,1); run 2: A,30 displaces — -U/+U on
    // (A,1) and (A,2)
    val o1 = spark.read.parquet(s"$dir/stream/out1.parquet")
      .orderBy("offset").collect()
    assert(o1.map(r => (r.getAs[String]("symbol"), r.getAs[Int]("rn"),
      r.getAs[Int]("op"))).toSeq ==
      Seq(("A", 1, 0), ("A", 2, 0), ("B", 1, 0)))
    val o2 = spark.read.parquet(s"$dir/stream/out2.parquet")
      .orderBy("offset").collect()
    assert(o2.map(r => (r.getAs[String]("symbol"), r.getAs[Int]("rn"),
      r.getAs[Int]("price"), r.getAs[Int]("op"))).toSeq ==
      Seq(("A", 1, 10, 2), ("A", 1, 30, 3), ("A", 2, 5, 2), ("A", 2, 10, 3)))
  }

  test("streaming execution mode covers DISTINCT changelogs byte-identically") {
    // A refcount DISTINCT under engine = spark-streaming seeds
    // StreamingDistinct's per-value seen-state from the previously-visible
    // values and runs the slice's values as a second AvailableNow round;
    // its +I emissions equal the batch merge diff (no retractions ⇒ the
    // only support transition is 0 → positive). Four-run chain — in-slice
    // dups, a dup-of-history, a watermark-only run, and (round 10) a
    // retraction run killing a single-support value, which flips the
    // emission to the keyed visible diff and emits the -D — must match
    // batch slices and ledgers byte for byte.
    import spark.implicits._
    import EngineFixtures.Ticker
    val dir = Files.createTempDirectory("graft-proto-stream-distinct")
    val in1 = s"$dir/in1.parquet"; val in2 = s"$dir/in2.parquet"
    val in4 = s"$dir/in4.parquet"
    graft.engine.ParquetSliceSink.writeSingleFile(
      spark.createDataset(Seq(
        Ticker(0, 0, t(ts(1)), t(ts(1)), "A", 10),
        Ticker(1, 0, t(ts(1)), t(ts(1)), "A", 10),
        Ticker(2, 0, t(ts(1)), t(ts(1)), "B", 20),
        Ticker(3, 0, t(ts(1)), t(ts(1)), "A", 10))).toDF(), in1)
    graft.engine.ParquetSliceSink.writeSingleFile(
      spark.createDataset(Seq(
        Ticker(4, 0, t(ts(2)), t(ts(1)), "A", 10), // dup of history
        Ticker(5, 0, t(ts(2)), t(ts(2)), "C", 30))).toDF(), in2)
    graft.engine.ParquetSliceSink.writeSingleFile(
      spark.createDataset(Seq(
        Ticker(6, 1, t(ts(3)), t(ts(2)), "C", 30))).toDF(), in4)
    val q = "SELECT DISTINCT event_time, symbol, price FROM tickers"
    def tr(engine: String, tag: String, num: Int, path: Option[String],
        oi: Option[OffsetInterval], wm: Instant, nextOff: Long,
        prev: Option[String]) = TransformRequest(
      "did:odf:out", "out", ts(10 + num), DatasetVocabulary(),
      Transform(engine = engine, queries = Vector(SqlQueryStep(None, q))),
      Vector(TransformRequestInput(
        datasetId = "did:odf:in", datasetAlias = "tickers",
        queryAlias = "tickers", offsetInterval = oi,
        dataPaths = path.toVector, schemaFile = in1,
        explicitWatermarks = Vector(RequestWatermark(wm, wm)))),
      nextOffset = nextOff, prevCheckpointPath = prev,
      newCheckpointPath = s"$dir/$tag/cp$num",
      newDataPath = s"$dir/$tag/out$num.parquet")
    def chain(engine: String, tag: String): Unit = {
      import graft.engine.TransformEngine
      val e = new TransformEngine(spark)
      val r1 = e.executeTransform(
        tr(engine, tag, 1, Some(in1), Some(OffsetInterval(0, 3)), ts(1), 0, None))
      assert(r1.isInstanceOf[TransformResponse.Success], s"$tag run1: $r1")
      val r2 = e.executeTransform(
        tr(engine, tag, 2, Some(in2), Some(OffsetInterval(4, 5)), ts(2), 2,
          Some(s"$dir/$tag/cp1")))
      assert(r2.isInstanceOf[TransformResponse.Success], s"$tag run2: $r2")
      val r3 = e.executeTransform(
        tr(engine, tag, 3, None, None, ts(3), 3, Some(s"$dir/$tag/cp2")))
      assert(r3.isInstanceOf[TransformResponse.Success], s"$tag run3: $r3")
      val r4 = e.executeTransform(
        tr(engine, tag, 4, Some(in4), Some(OffsetInterval(6, 6)), ts(3), 3,
          Some(s"$dir/$tag/cp3")))
      assert(r4.isInstanceOf[TransformResponse.Success], s"$tag run4: $r4")
    }
    chain("spark", "batch")
    chain("spark-streaming", "stream")
    (1 to 4).foreach { n =>
      val b = Paths.get(s"$dir/batch/out$n.parquet")
      val s = Paths.get(s"$dir/stream/out$n.parquet")
      assert(Files.exists(b) == Files.exists(s),
        s"run-$n slice existence diverged")
      if (Files.exists(b))
        assert(java.util.Arrays.equals(
          Files.readAllBytes(b), Files.readAllBytes(s)),
          s"run-$n DISTINCT slices are not byte-identical")
      assert(
        Files.readString(Paths.get(s"$dir/batch/cp$n/ledger.json")) ==
          Files.readString(Paths.get(s"$dir/stream/cp$n/ledger.json")))
    }
    val o1 = spark.read.parquet(s"$dir/stream/out1.parquet")
      .orderBy("offset").collect()
    assert(o1.map(r => (r.getAs[String]("symbol"), r.getAs[Int]("price"),
      r.getAs[Int]("op"))).toSeq == Seq(("A", 10, 0), ("B", 20, 0)))
    val o2 = spark.read.parquet(s"$dir/stream/out2.parquet").collect()
    assert(o2.map(r => (r.getAs[String]("symbol"), r.getAs[Int]("op"))).toSeq ==
      Seq(("C", 0)))
    // run 4 (round 10): the retraction kills C's only support — the
    // keyed-visible-diff emission serves the -D under streaming
    val o4 = spark.read.parquet(s"$dir/stream/out4.parquet").collect()
    assert(o4.map(r => (r.getAs[String]("symbol"), r.getAs[Int]("price"),
      r.getAs[Int]("op"))).toSeq == Seq(("C", 30, Op.Retract)), o4.mkString(","))
  }

  test("streaming execution mode covers left-join changelogs byte-identically") {
    // An updating LEFT JOIN under engine = spark-streaming seeds
    // StreamingLeftJoin's keyed state from the stored buffers and runs
    // both slices as one micro-batch; its +I/−D emissions equal the batch
    // delta passes. Three-run chain — null-pad, late-right retraction,
    // and an in-slice pair — must match batch slices and ledgers byte for
    // byte.
    import spark.implicits._
    import EngineFixtures.{OrderRow, Shipment}
    val dir = Files.createTempDirectory("graft-proto-stream-lj")
    val o1 = s"$dir/o1.parquet"; val s1 = s"$dir/s1.parquet"
    val s2 = s"$dir/s2.parquet"
    val o3 = s"$dir/o3.parquet"; val s3 = s"$dir/s3.parquet"
    graft.engine.ParquetSliceSink.writeSingleFile(
      spark.createDataset(Seq(
        OrderRow(0, 0, t(ts(1)), t(ts(1)), 1, 10),
        OrderRow(1, 0, t(ts(1)), t(ts(1)), 2, 20))).toDF(), o1)
    graft.engine.ParquetSliceSink.writeSingleFile(
      spark.createDataset(Seq(Shipment(0, 0, t(ts(1)), t(ts(1)), 1, 5))).toDF(), s1)
    graft.engine.ParquetSliceSink.writeSingleFile(
      spark.createDataset(Seq(Shipment(1, 0, t(ts(2)), t(ts(2)), 2, 7))).toDF(), s2)
    graft.engine.ParquetSliceSink.writeSingleFile(
      spark.createDataset(Seq(OrderRow(2, 0, t(ts(3)), t(ts(3)), 3, 30))).toDF(), o3)
    graft.engine.ParquetSliceSink.writeSingleFile(
      spark.createDataset(Seq(Shipment(2, 0, t(ts(3)), t(ts(3)), 3, 9))).toDF(), s3)
    val q = """SELECT o.event_time as event_time, o.order_id as order_id,
              |  o.quantity as quantity, s.num_shipped as num_shipped
              |FROM orders o LEFT JOIN shipments s ON o.order_id = s.order_id""".stripMargin
    def chain(engines: Seq[String], tag: String): Unit = {
      import graft.engine.TransformEngine
      def input(alias: String, path: Option[String], schema: String,
          oi: Option[OffsetInterval], wm: Instant) = TransformRequestInput(
        datasetId = s"did:odf:$alias", datasetAlias = alias,
        queryAlias = alias, offsetInterval = oi,
        dataPaths = path.toVector, schemaFile = schema,
        explicitWatermarks = Vector(RequestWatermark(wm, wm)))
      def tr(num: Int, ins: Vector[TransformRequestInput], nextOff: Long,
          prev: Option[String]) = TransformRequest(
        "did:odf:out", "out", ts(10 + num), DatasetVocabulary(),
        Transform(engine = engines(num - 1),
          queries = Vector(SqlQueryStep(None, q))),
        ins, nextOffset = nextOff, prevCheckpointPath = prev,
        newCheckpointPath = s"$dir/$tag/cp$num",
        newDataPath = s"$dir/$tag/out$num.parquet")
      val e = new TransformEngine(spark)
      val r1 = e.executeTransform(tr(1, Vector(
        input("orders", Some(o1), o1, Some(OffsetInterval(0, 1)), ts(1)),
        input("shipments", Some(s1), s1, Some(OffsetInterval(0, 0)), ts(1))),
        0, None))
      assert(r1.isInstanceOf[TransformResponse.Success], s"$tag run1: $r1")
      val r2 = e.executeTransform(tr(2, Vector(
        input("orders", None, o1, None, ts(2)),
        input("shipments", Some(s2), s1, Some(OffsetInterval(1, 1)), ts(2))),
        2, Some(s"$dir/$tag/cp1")))
      assert(r2.isInstanceOf[TransformResponse.Success], s"$tag run2: $r2")
      val r3 = e.executeTransform(tr(3, Vector(
        input("orders", Some(o3), o1, Some(OffsetInterval(2, 2)), ts(3)),
        input("shipments", Some(s3), s1, Some(OffsetInterval(2, 2)), ts(3))),
        4, Some(s"$dir/$tag/cp2")))
      assert(r3.isInstanceOf[TransformResponse.Success], s"$tag run3: $r3")
    }
    chain(Seq.fill(3)("spark"), "batch")
    chain(Seq.fill(3)("spark-streaming"), "stream")
    // interleave on ONE checkpoint chain: the streaming run-2 retraction
    // must reconstruct the batch run-1 matched bits from the buffers alone
    chain(Seq("spark", "spark-streaming", "spark"), "mixed")
    (1 to 3).foreach { n =>
      for (tag <- Seq("stream", "mixed")) {
        assert(java.util.Arrays.equals(
          Files.readAllBytes(Paths.get(s"$dir/batch/out$n.parquet")),
          Files.readAllBytes(Paths.get(s"$dir/$tag/out$n.parquet"))),
          s"run-$n $tag left-join slices are not byte-identical")
        assert(
          Files.readString(Paths.get(s"$dir/batch/cp$n/ledger.json")) ==
            Files.readString(Paths.get(s"$dir/$tag/cp$n/ledger.json")))
      }
    }
    // run 1: order 1 pairs, order 2 null-pads; run 2: late shipment for
    // order 2 retracts its null-pad and appends the pair; run 3: order 3
    // and its shipment arrive in ONE run — pair only, no null-pad churn
    val o1r = spark.read.parquet(s"$dir/stream/out1.parquet")
      .orderBy("offset").collect()
    assert(o1r.map(r => (r.getAs[Long]("order_id"), r.getAs[Any]("num_shipped"),
      r.getAs[Int]("op"))).toSeq ==
      Seq((1L, 5L, Op.Append), (2L, null, Op.Append)))
    val o2r = spark.read.parquet(s"$dir/stream/out2.parquet")
      .orderBy("offset").collect()
    assert(o2r.map(r => (r.getAs[Long]("order_id"), r.getAs[Any]("num_shipped"),
      r.getAs[Int]("op"))).toSeq ==
      Seq((2L, null, Op.Retract), (2L, 7L, Op.Append)))
    val o3r = spark.read.parquet(s"$dir/stream/out3.parquet").collect()
    assert(o3r.map(r => (r.getAs[Long]("order_id"), r.getAs[Any]("num_shipped"),
      r.getAs[Int]("op"))).toSeq == Seq((3L, 9L, Op.Append)))
  }

  test("streaming left join serves double keys with SQL equality (-0.0/NaN)") {
    // Round 11: the left-join face keys state on a canonical key
    // serialization instead of toString, so float/double (and binary)
    // equi-keys serve under streaming. -0.0 must pair with 0.0 and NaN
    // with NaN — exactly the SQL join-key equality the batch delta path
    // computes — and all three engine chains must stay byte-identical.
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-proto-stream-ljd")
    val o1 = s"$dir/o1.parquet"; val s1 = s"$dir/s1.parquet"
    val s2 = s"$dir/s2.parquet"
    val o3 = s"$dir/o3.parquet"; val s3 = s"$dir/s3.parquet"
    def orders(rows: Seq[(Long, Double, Long)], day: Int): DataFrame =
      rows.map { case (off, p, q) => (off, 0, t(ts(day)), t(ts(day)), p, q) }
        .toDF("offset", "op", "system_time", "event_time", "price", "quantity")
    def ships(rows: Seq[(Long, Double, Long)], day: Int): DataFrame =
      rows.map { case (off, p, n) => (off, 0, t(ts(day)), t(ts(day)), p, n) }
        .toDF("offset", "op", "system_time", "event_time", "price", "num_shipped")
    graft.engine.ParquetSliceSink.writeSingleFile(
      orders(Seq((0L, -0.0, 10L), (1L, Double.NaN, 20L)), 1), o1)
    graft.engine.ParquetSliceSink.writeSingleFile(
      ships(Seq((0L, 0.0, 5L)), 1), s1)
    graft.engine.ParquetSliceSink.writeSingleFile(
      ships(Seq((1L, Double.NaN, 7L)), 2), s2)
    graft.engine.ParquetSliceSink.writeSingleFile(
      orders(Seq((2L, 3.5, 30L)), 3), o3)
    graft.engine.ParquetSliceSink.writeSingleFile(
      ships(Seq((2L, 3.5, 9L)), 3), s3)
    val q = """SELECT o.event_time as event_time, o.price as price,
              |  o.quantity as quantity, s.num_shipped as num_shipped
              |FROM orders o LEFT JOIN shipments s ON o.price = s.price""".stripMargin
    def chain(engines: Seq[String], tag: String): Unit = {
      import graft.engine.TransformEngine
      def input(alias: String, path: Option[String], schema: String,
          oi: Option[OffsetInterval], wm: Instant) = TransformRequestInput(
        datasetId = s"did:odf:$alias", datasetAlias = alias,
        queryAlias = alias, offsetInterval = oi,
        dataPaths = path.toVector, schemaFile = schema,
        explicitWatermarks = Vector(RequestWatermark(wm, wm)))
      def tr(num: Int, ins: Vector[TransformRequestInput], nextOff: Long,
          prev: Option[String]) = TransformRequest(
        "did:odf:out", "out", ts(10 + num), DatasetVocabulary(),
        Transform(engine = engines(num - 1),
          queries = Vector(SqlQueryStep(None, q))),
        ins, nextOffset = nextOff, prevCheckpointPath = prev,
        newCheckpointPath = s"$dir/$tag/cp$num",
        newDataPath = s"$dir/$tag/out$num.parquet")
      val e = new TransformEngine(spark)
      val r1 = e.executeTransform(tr(1, Vector(
        input("orders", Some(o1), o1, Some(OffsetInterval(0, 1)), ts(1)),
        input("shipments", Some(s1), s1, Some(OffsetInterval(0, 0)), ts(1))),
        0, None))
      assert(r1.isInstanceOf[TransformResponse.Success], s"$tag run1: $r1")
      val r2 = e.executeTransform(tr(2, Vector(
        input("orders", None, o1, None, ts(2)),
        input("shipments", Some(s2), s1, Some(OffsetInterval(1, 1)), ts(2))),
        2, Some(s"$dir/$tag/cp1")))
      assert(r2.isInstanceOf[TransformResponse.Success], s"$tag run2: $r2")
      val r3 = e.executeTransform(tr(3, Vector(
        input("orders", Some(o3), o1, Some(OffsetInterval(2, 2)), ts(3)),
        input("shipments", Some(s3), s1, Some(OffsetInterval(2, 2)), ts(3))),
        4, Some(s"$dir/$tag/cp2")))
      assert(r3.isInstanceOf[TransformResponse.Success], s"$tag run3: $r3")
    }
    chain(Seq.fill(3)("spark"), "batch")
    chain(Seq.fill(3)("spark-streaming"), "stream")
    chain(Seq("spark", "spark-streaming", "spark"), "mixed")
    (1 to 3).foreach { n =>
      for (tag <- Seq("stream", "mixed")) {
        assert(java.util.Arrays.equals(
          Files.readAllBytes(Paths.get(s"$dir/batch/out$n.parquet")),
          Files.readAllBytes(Paths.get(s"$dir/$tag/out$n.parquet"))),
          s"run-$n $tag double-key left-join slices are not byte-identical")
        assert(
          Files.readString(Paths.get(s"$dir/batch/cp$n/ledger.json")) ==
            Files.readString(Paths.get(s"$dir/$tag/cp$n/ledger.json")))
      }
    }
    // run 1: the -0.0 order pairs with the 0.0 shipment (SQL equality);
    // the NaN order null-pads. run 2: the late NaN shipment retracts the
    // NaN null-pad and appends the pair. run 3: in-slice pair, no churn.
    val r1 = spark.read.parquet(s"$dir/stream/out1.parquet")
      .orderBy("offset").collect()
    assert(r1.map(r => (r.getAs[Long]("quantity"), r.getAs[Any]("num_shipped"),
      r.getAs[Int]("op"))).toSeq ==
      Seq((10L, 5L, Op.Append), (20L, null, Op.Append)))
    val r2 = spark.read.parquet(s"$dir/stream/out2.parquet")
      .orderBy("offset").collect()
    assert(r2.map(r => (r.getAs[Long]("quantity"), r.getAs[Any]("num_shipped"),
      r.getAs[Int]("op"))).toSeq ==
      Seq((20L, null, Op.Retract), (20L, 7L, Op.Append)))
    val r3 = spark.read.parquet(s"$dir/stream/out3.parquet").collect()
    assert(r3.map(r => (r.getAs[Long]("quantity"), r.getAs[Any]("num_shipped"),
      r.getAs[Int]("op"))).toSeq == Seq((30L, 9L, Op.Append)))
  }

  test("streaming left join serves a STRUCT equi-key with nested -0.0/NaN") {
    // Round-12 (ADVICE): streamStateKeyType admits struct-typed equi keys,
    // whose canonical state keying leans on keyOf's Row flattening to
    // erase the GenericRowWithSchema parquet-vs-plan schema split — the
    // exact class the round-9 agg fix addressed. Pin it end-to-end: a
    // struct<a double, b string> join key whose nested double carries
    // -0.0 and NaN, three runs, batch/stream/mixed byte-identity.
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-proto-stream-ljstruct")
    val o1 = s"$dir/o1.parquet"; val s1 = s"$dir/s1.parquet"
    val s2 = s"$dir/s2.parquet"
    val o3 = s"$dir/o3.parquet"; val s3 = s"$dir/s3.parquet"
    def frame(rows: Seq[(Long, Double, String, Long)], day: Int,
        measure: String): DataFrame =
      rows.map { case (off, a, b, m) => (off, 0, t(ts(day)), t(ts(day)), a, b, m) }
        .toDF("offset", "op", "system_time", "event_time", "__a", "__b", measure)
        .select(col("offset"), col("op"), col("system_time"), col("event_time"),
          struct(col("__a").as("a"), col("__b").as("b")).as("k"), col(measure))
    graft.engine.ParquetSliceSink.writeSingleFile(
      frame(Seq((0L, -0.0, "x", 10L), (1L, Double.NaN, "y", 20L)), 1, "quantity"), o1)
    graft.engine.ParquetSliceSink.writeSingleFile(
      frame(Seq((0L, 0.0, "x", 5L)), 1, "num_shipped"), s1)
    graft.engine.ParquetSliceSink.writeSingleFile(
      frame(Seq((1L, Double.NaN, "y", 7L)), 2, "num_shipped"), s2)
    graft.engine.ParquetSliceSink.writeSingleFile(
      frame(Seq((2L, 3.5, "z", 30L)), 3, "quantity"), o3)
    graft.engine.ParquetSliceSink.writeSingleFile(
      frame(Seq((2L, 3.5, "z", 9L)), 3, "num_shipped"), s3)
    val q = """SELECT o.event_time as event_time, o.k as k,
              |  o.quantity as quantity, s.num_shipped as num_shipped
              |FROM orders o LEFT JOIN shipments s ON o.k = s.k""".stripMargin
    def chain(engines: Seq[String], tag: String): Unit = {
      import graft.engine.TransformEngine
      def input(alias: String, path: Option[String], schema: String,
          oi: Option[OffsetInterval], wm: Instant) = TransformRequestInput(
        datasetId = s"did:odf:$alias", datasetAlias = alias,
        queryAlias = alias, offsetInterval = oi,
        dataPaths = path.toVector, schemaFile = schema,
        explicitWatermarks = Vector(RequestWatermark(wm, wm)))
      def tr(num: Int, ins: Vector[TransformRequestInput], nextOff: Long,
          prev: Option[String]) = TransformRequest(
        "did:odf:out", "out", ts(10 + num), DatasetVocabulary(),
        Transform(engine = engines(num - 1),
          queries = Vector(SqlQueryStep(None, q))),
        ins, nextOffset = nextOff, prevCheckpointPath = prev,
        newCheckpointPath = s"$dir/$tag/cp$num",
        newDataPath = s"$dir/$tag/out$num.parquet")
      val e = new TransformEngine(spark)
      val r1 = e.executeTransform(tr(1, Vector(
        input("orders", Some(o1), o1, Some(OffsetInterval(0, 1)), ts(1)),
        input("shipments", Some(s1), s1, Some(OffsetInterval(0, 0)), ts(1))),
        0, None))
      assert(r1.isInstanceOf[TransformResponse.Success], s"$tag run1: $r1")
      val r2 = e.executeTransform(tr(2, Vector(
        input("orders", None, o1, None, ts(2)),
        input("shipments", Some(s2), s1, Some(OffsetInterval(1, 1)), ts(2))),
        2, Some(s"$dir/$tag/cp1")))
      assert(r2.isInstanceOf[TransformResponse.Success], s"$tag run2: $r2")
      val r3 = e.executeTransform(tr(3, Vector(
        input("orders", Some(o3), o1, Some(OffsetInterval(2, 2)), ts(3)),
        input("shipments", Some(s3), s1, Some(OffsetInterval(2, 2)), ts(3))),
        4, Some(s"$dir/$tag/cp2")))
      assert(r3.isInstanceOf[TransformResponse.Success], s"$tag run3: $r3")
    }
    chain(Seq.fill(3)("spark"), "batch")
    chain(Seq.fill(3)("spark-streaming"), "stream")
    chain(Seq("spark", "spark-streaming", "spark"), "mixed")
    (1 to 3).foreach { n =>
      for (tag <- Seq("stream", "mixed")) {
        assert(java.util.Arrays.equals(
          Files.readAllBytes(Paths.get(s"$dir/batch/out$n.parquet")),
          Files.readAllBytes(Paths.get(s"$dir/$tag/out$n.parquet"))),
          s"run-$n $tag struct-key left-join slices are not byte-identical")
        assert(
          Files.readString(Paths.get(s"$dir/batch/cp$n/ledger.json")) ==
            Files.readString(Paths.get(s"$dir/$tag/cp$n/ledger.json")))
      }
    }
    // run 1: struct(-0.0,"x") pairs with struct(0.0,"x") under SQL struct
    // equality; the NaN-keyed order null-pads. run 2: the late NaN-keyed
    // shipment retracts that null-pad and appends the pair. run 3: clean
    // in-slice pair.
    val r1 = spark.read.parquet(s"$dir/stream/out1.parquet")
      .orderBy("offset").collect()
    assert(r1.map(r => (r.getAs[Long]("quantity"), r.getAs[Any]("num_shipped"),
      r.getAs[Int]("op"))).toSeq ==
      Seq((10L, 5L, Op.Append), (20L, null, Op.Append)))
    val r2 = spark.read.parquet(s"$dir/stream/out2.parquet")
      .orderBy("offset").collect()
    assert(r2.map(r => (r.getAs[Long]("quantity"), r.getAs[Any]("num_shipped"),
      r.getAs[Int]("op"))).toSeq ==
      Seq((20L, null, Op.Retract), (20L, 7L, Op.Append)))
    val r3 = spark.read.parquet(s"$dir/stream/out3.parquet").collect()
    assert(r3.map(r => (r.getAs[Long]("quantity"), r.getAs[Any]("num_shipped"),
      r.getAs[Int]("op"))).toSeq == Seq((30L, 9L, Op.Append)))
  }

  test("streaming execution mode covers inner-join changelogs byte-identically") {
    // An updating INNER JOIN under engine = spark-streaming runs Spark's
    // NATIVE unbounded stream-stream inner equi-join over the staged
    // seed + slice rounds; a micro-batch of the symmetric hash join emits
    // exactly the batch delta terms ΔA ⋈ B_full ∪ A_old ⋈ ΔB, all
    // appends. Three-run chain — an unmatched order (silent), a late
    // shipment pairing it, an in-slice pair — must match batch slices and
    // ledgers byte for byte, including interleaving on one checkpoint.
    import spark.implicits._
    import EngineFixtures.{OrderRow, Shipment}
    val dir = Files.createTempDirectory("graft-proto-stream-ij")
    val o1 = s"$dir/o1.parquet"; val s1 = s"$dir/s1.parquet"
    val s2 = s"$dir/s2.parquet"
    val o3 = s"$dir/o3.parquet"; val s3 = s"$dir/s3.parquet"
    graft.engine.ParquetSliceSink.writeSingleFile(
      spark.createDataset(Seq(
        OrderRow(0, 0, t(ts(1)), t(ts(1)), 1, 10),
        OrderRow(1, 0, t(ts(1)), t(ts(1)), 2, 20))).toDF(), o1)
    graft.engine.ParquetSliceSink.writeSingleFile(
      spark.createDataset(Seq(Shipment(0, 0, t(ts(1)), t(ts(1)), 1, 5))).toDF(), s1)
    graft.engine.ParquetSliceSink.writeSingleFile(
      spark.createDataset(Seq(Shipment(1, 0, t(ts(2)), t(ts(2)), 2, 7))).toDF(), s2)
    graft.engine.ParquetSliceSink.writeSingleFile(
      spark.createDataset(Seq(OrderRow(2, 0, t(ts(3)), t(ts(3)), 3, 30))).toDF(), o3)
    graft.engine.ParquetSliceSink.writeSingleFile(
      spark.createDataset(Seq(Shipment(2, 0, t(ts(3)), t(ts(3)), 3, 9))).toDF(), s3)
    val q = """SELECT o.event_time as event_time, o.order_id as order_id,
              |  o.quantity as quantity, s.num_shipped as num_shipped
              |FROM orders o JOIN shipments s ON o.order_id = s.order_id""".stripMargin
    def chain(engines: Seq[String], tag: String): Unit = {
      import graft.engine.TransformEngine
      def input(alias: String, path: Option[String], schema: String,
          oi: Option[OffsetInterval], wm: Instant) = TransformRequestInput(
        datasetId = s"did:odf:$alias", datasetAlias = alias,
        queryAlias = alias, offsetInterval = oi,
        dataPaths = path.toVector, schemaFile = schema,
        explicitWatermarks = Vector(RequestWatermark(wm, wm)))
      def tr(num: Int, ins: Vector[TransformRequestInput], nextOff: Long,
          prev: Option[String]) = TransformRequest(
        "did:odf:out", "out", ts(10 + num), DatasetVocabulary(),
        Transform(engine = engines(num - 1),
          queries = Vector(SqlQueryStep(None, q))),
        ins, nextOffset = nextOff, prevCheckpointPath = prev,
        newCheckpointPath = s"$dir/$tag/cp$num",
        newDataPath = s"$dir/$tag/out$num.parquet")
      val e = new TransformEngine(spark)
      val r1 = e.executeTransform(tr(1, Vector(
        input("orders", Some(o1), o1, Some(OffsetInterval(0, 1)), ts(1)),
        input("shipments", Some(s1), s1, Some(OffsetInterval(0, 0)), ts(1))),
        0, None))
      assert(r1.isInstanceOf[TransformResponse.Success], s"$tag run1: $r1")
      val r2 = e.executeTransform(tr(2, Vector(
        input("orders", None, o1, None, ts(2)),
        input("shipments", Some(s2), s1, Some(OffsetInterval(1, 1)), ts(2))),
        1, Some(s"$dir/$tag/cp1")))
      assert(r2.isInstanceOf[TransformResponse.Success], s"$tag run2: $r2")
      val r3 = e.executeTransform(tr(3, Vector(
        input("orders", Some(o3), o1, Some(OffsetInterval(2, 2)), ts(3)),
        input("shipments", Some(s3), s1, Some(OffsetInterval(2, 2)), ts(3))),
        2, Some(s"$dir/$tag/cp2")))
      assert(r3.isInstanceOf[TransformResponse.Success], s"$tag run3: $r3")
    }
    chain(Seq.fill(3)("spark"), "batch")
    chain(Seq.fill(3)("spark-streaming"), "stream")
    // interleave on ONE checkpoint chain: the streaming run seeds native
    // join state from the batch-written buffers alone
    chain(Seq("spark", "spark-streaming", "spark"), "mixed")
    (1 to 3).foreach { n =>
      for (tag <- Seq("stream", "mixed")) {
        assert(java.util.Arrays.equals(
          Files.readAllBytes(Paths.get(s"$dir/batch/out$n.parquet")),
          Files.readAllBytes(Paths.get(s"$dir/$tag/out$n.parquet"))),
          s"run-$n $tag inner-join slices are not byte-identical")
        assert(
          Files.readString(Paths.get(s"$dir/batch/cp$n/ledger.json")) ==
            Files.readString(Paths.get(s"$dir/$tag/cp$n/ledger.json")))
      }
    }
    // run 1: only order 1 pairs (order 2 unmatched emits nothing);
    // run 2: the late shipment pairs order 2; run 3: in-slice pair
    val o1r = spark.read.parquet(s"$dir/stream/out1.parquet")
      .orderBy("offset").collect()
    assert(o1r.map(r => (r.getAs[Long]("order_id"), r.getAs[Long]("num_shipped"),
      r.getAs[Int]("op"))).toSeq == Seq((1L, 5L, Op.Append)))
    val o2r = spark.read.parquet(s"$dir/stream/out2.parquet").collect()
    assert(o2r.map(r => (r.getAs[Long]("order_id"), r.getAs[Long]("num_shipped"),
      r.getAs[Int]("op"))).toSeq == Seq((2L, 7L, Op.Append)))
    val o3r = spark.read.parquet(s"$dir/stream/out3.parquet").collect()
    assert(o3r.map(r => (r.getAs[Long]("order_id"), r.getAs[Long]("num_shipped"),
      r.getAs[Int]("op"))).toSeq == Seq((3L, 9L, Op.Append)))
  }

  test("streaming execution mode covers inner-join TREE changelogs byte-identically") {
    // A 3-relation equi-join chain (orders ⋈ shipments ON order_id
    // ⋈ carriers ON num_shipped = ship_key) under engine =
    // spark-streaming runs CHAINED native stream-stream inner joins over
    // the staged seed + slice rounds. Four-run chain: a full in-run
    // 3-tuple; an in-slice bridge pair (new shipment + new carrier
    // joining old orders state); a carrier-ONLY slice whose tuple needs
    // OLD orders AND OLD shipments seeds — the multi-hop case the
    // Yannakakis seed sweep exists for; and a watermark-only run. All
    // must match batch slices and ledgers byte for byte, including
    // interleaving on one checkpoint.
    import spark.implicits._
    import EngineFixtures.{Carrier, OrderRow, Shipment}
    val dir = Files.createTempDirectory("graft-proto-stream-ij3")
    val o1 = s"$dir/o1.parquet"; val s1 = s"$dir/s1.parquet"
    val c1 = s"$dir/c1.parquet"
    val s2 = s"$dir/s2.parquet"; val c2 = s"$dir/c2.parquet"
    val c3 = s"$dir/c3.parquet"
    graft.engine.ParquetSliceSink.writeSingleFile(
      spark.createDataset(Seq(
        OrderRow(0, 0, t(ts(1)), t(ts(1)), 1, 10),
        OrderRow(1, 0, t(ts(1)), t(ts(1)), 2, 20))).toDF(), o1)
    graft.engine.ParquetSliceSink.writeSingleFile(
      spark.createDataset(Seq(Shipment(0, 0, t(ts(1)), t(ts(1)), 1, 5))).toDF(), s1)
    graft.engine.ParquetSliceSink.writeSingleFile(
      spark.createDataset(Seq(Carrier(0, 0, t(ts(1)), t(ts(1)), 5, "acme"))).toDF(), c1)
    graft.engine.ParquetSliceSink.writeSingleFile(
      spark.createDataset(Seq(Shipment(1, 0, t(ts(2)), t(ts(2)), 2, 7))).toDF(), s2)
    graft.engine.ParquetSliceSink.writeSingleFile(
      spark.createDataset(Seq(Carrier(1, 0, t(ts(2)), t(ts(2)), 7, "bee"))).toDF(), c2)
    graft.engine.ParquetSliceSink.writeSingleFile(
      spark.createDataset(Seq(Carrier(2, 0, t(ts(3)), t(ts(3)), 5, "cee"))).toDF(), c3)
    val q = """SELECT o.event_time as event_time, o.order_id as order_id,
              |  s.num_shipped as num_shipped, c.carrier as carrier
              |FROM orders o
              |JOIN shipments s ON o.order_id = s.order_id
              |JOIN carriers c ON s.num_shipped = c.ship_key""".stripMargin
    def chain(engines: Seq[String], tag: String): Unit = {
      import graft.engine.TransformEngine
      def input(alias: String, path: Option[String], schema: String,
          oi: Option[OffsetInterval], wm: Instant) = TransformRequestInput(
        datasetId = s"did:odf:$alias", datasetAlias = alias,
        queryAlias = alias, offsetInterval = oi,
        dataPaths = path.toVector, schemaFile = schema,
        explicitWatermarks = Vector(RequestWatermark(wm, wm)))
      def tr(num: Int, ins: Vector[TransformRequestInput], nextOff: Long,
          prev: Option[String]) = TransformRequest(
        "did:odf:out", "out", ts(10 + num), DatasetVocabulary(),
        Transform(engine = engines(num - 1),
          queries = Vector(SqlQueryStep(None, q))),
        ins, nextOffset = nextOff, prevCheckpointPath = prev,
        newCheckpointPath = s"$dir/$tag/cp$num",
        newDataPath = s"$dir/$tag/out$num.parquet")
      val e = new TransformEngine(spark)
      val r1 = e.executeTransform(tr(1, Vector(
        input("orders", Some(o1), o1, Some(OffsetInterval(0, 1)), ts(1)),
        input("shipments", Some(s1), s1, Some(OffsetInterval(0, 0)), ts(1)),
        input("carriers", Some(c1), c1, Some(OffsetInterval(0, 0)), ts(1))),
        0, None))
      assert(r1.isInstanceOf[TransformResponse.Success], s"$tag run1: $r1")
      val r2 = e.executeTransform(tr(2, Vector(
        input("orders", None, o1, None, ts(2)),
        input("shipments", Some(s2), s1, Some(OffsetInterval(1, 1)), ts(2)),
        input("carriers", Some(c2), c1, Some(OffsetInterval(1, 1)), ts(2))),
        1, Some(s"$dir/$tag/cp1")))
      assert(r2.isInstanceOf[TransformResponse.Success], s"$tag run2: $r2")
      val r3 = e.executeTransform(tr(3, Vector(
        input("orders", None, o1, None, ts(3)),
        input("shipments", None, s1, None, ts(3)),
        input("carriers", Some(c3), c1, Some(OffsetInterval(2, 2)), ts(3))),
        2, Some(s"$dir/$tag/cp2")))
      assert(r3.isInstanceOf[TransformResponse.Success], s"$tag run3: $r3")
      val r4 = e.executeTransform(tr(4, Vector(
        input("orders", None, o1, None, ts(4)),
        input("shipments", None, s1, None, ts(4)),
        input("carriers", None, c1, None, ts(4))),
        3, Some(s"$dir/$tag/cp3")))
      assert(r4.isInstanceOf[TransformResponse.Success], s"$tag run4: $r4")
    }
    chain(Seq.fill(4)("spark"), "batch")
    chain(Seq.fill(4)("spark-streaming"), "stream")
    chain(Seq("spark", "spark-streaming", "spark-streaming", "spark"), "mixed")
    (1 to 4).foreach { n =>
      for (tag <- Seq("stream", "mixed")) {
        assert(java.util.Arrays.equals(
          Files.readAllBytes(Paths.get(s"$dir/batch/out$n.parquet")),
          Files.readAllBytes(Paths.get(s"$dir/$tag/out$n.parquet"))),
          s"run-$n $tag inner-join-tree slices are not byte-identical")
        assert(
          Files.readString(Paths.get(s"$dir/batch/cp$n/ledger.json")) ==
            Files.readString(Paths.get(s"$dir/$tag/cp$n/ledger.json")))
      }
    }
    def tuples(p: String): Seq[(Long, Long, String)] =
      spark.read.parquet(p).orderBy("offset").collect().toSeq
        .map(r => (r.getAs[Long]("order_id"), r.getAs[Long]("num_shipped"),
          r.getAs[String]("carrier")))
    assert(tuples(s"$dir/stream/out1.parquet") == Seq((1L, 5L, "acme")))
    assert(tuples(s"$dir/stream/out2.parquet") == Seq((2L, 7L, "bee")))
    // the carrier-only slice pairs entirely against seeded state
    assert(tuples(s"$dir/stream/out3.parquet") == Seq((1L, 5L, "cee")))
    assert(!Files.exists(Paths.get(s"$dir/stream/out4.parquet")) ||
      spark.read.parquet(s"$dir/stream/out4.parquet").isEmpty)
  }

  test("streaming inner-join trees serve a 5-relation chain byte-identically") {
    // Depth test for the Yannakakis seed sweep (round-11): the sweep now
    // restages each round's reachable-key frames to scratch parquet, so
    // the semi-join plan stays constant-depth however deep the tree is —
    // previously the logical plan grew exponentially with relation count
    // and only n=3 was exercised. The far-end bridge run (an r5-only
    // slice whose tuple needs OLD seeds from ALL of r1..r4, four hops
    // away) is exactly the case that drives the most sweep rounds.
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-proto-stream-ij5")
    def slice(path: String, rows: Seq[(Long, Int, Long, Long)]): String = {
      // (offset, op, pk, k): pk joins the previous relation's k
      val df = spark.createDataset(rows).toDF("offset", "op", "pk", "k")
        .withColumn("system_time",
          org.apache.spark.sql.functions.lit(t(ts(1))))
        .withColumn("event_time",
          org.apache.spark.sql.functions.lit(t(ts(1))))
        .select("offset", "op", "system_time", "event_time", "pk", "k")
      graft.engine.ParquetSliceSink.writeSingleFile(df, path)
      path
    }
    val r1a = slice(s"$dir/r1a.parquet", Seq((0L, 0, 0L, 1L)))
    val r2a = slice(s"$dir/r2a.parquet", Seq((0L, 0, 1L, 2L)))
    val r3a = slice(s"$dir/r3a.parquet", Seq((0L, 0, 2L, 3L)))
    val r4a = slice(s"$dir/r4a.parquet", Seq((0L, 0, 3L, 4L)))
    val r5a = slice(s"$dir/r5a.parquet", Seq((0L, 0, 99L, 99L)))
    val r5b = slice(s"$dir/r5b.parquet", Seq((1L, 0, 4L, 50L)))
    val r3c = slice(s"$dir/r3c.parquet", Seq((1L, 0, 2L, 33L)))
    val r4c = slice(s"$dir/r4c.parquet", Seq((1L, 0, 33L, 44L)))
    val r5c = slice(s"$dir/r5c.parquet", Seq((2L, 0, 44L, 70L)))
    val q = """SELECT r1.event_time AS event_time, r1.k AS k1, r3.k AS k3,
              |  r4.k AS k4, r5.k AS k5
              |FROM r1
              |JOIN r2 ON r1.k = r2.pk
              |JOIN r3 ON r2.k = r3.pk
              |JOIN r4 ON r3.k = r4.pk
              |JOIN r5 ON r4.k = r5.pk""".stripMargin
    def chain(engines: Seq[String], tag: String): Unit = {
      import graft.engine.TransformEngine
      def input(alias: String, path: Option[String], schema: String,
          oi: Option[OffsetInterval], wm: Instant) = TransformRequestInput(
        datasetId = s"did:odf:$alias", datasetAlias = alias,
        queryAlias = alias, offsetInterval = oi,
        dataPaths = path.toVector, schemaFile = schema,
        explicitWatermarks = Vector(RequestWatermark(wm, wm)))
      def tr(num: Int, ins: Vector[TransformRequestInput], nextOff: Long,
          prev: Option[String]) = TransformRequest(
        "did:odf:out", "out", ts(10 + num), DatasetVocabulary(),
        Transform(engine = engines(num - 1),
          queries = Vector(SqlQueryStep(None, q))),
        ins, nextOffset = nextOff, prevCheckpointPath = prev,
        newCheckpointPath = s"$dir/$tag/cp$num",
        newDataPath = s"$dir/$tag/out$num.parquet")
      val e = new TransformEngine(spark)
      val r1 = e.executeTransform(tr(1, Vector(
        input("r1", Some(r1a), r1a, Some(OffsetInterval(0, 0)), ts(1)),
        input("r2", Some(r2a), r2a, Some(OffsetInterval(0, 0)), ts(1)),
        input("r3", Some(r3a), r3a, Some(OffsetInterval(0, 0)), ts(1)),
        input("r4", Some(r4a), r4a, Some(OffsetInterval(0, 0)), ts(1)),
        input("r5", Some(r5a), r5a, Some(OffsetInterval(0, 0)), ts(1))),
        0, None))
      assert(r1.isInstanceOf[TransformResponse.Success], s"$tag run1: $r1")
      val r2 = e.executeTransform(tr(2, Vector(
        input("r1", None, r1a, None, ts(2)),
        input("r2", None, r2a, None, ts(2)),
        input("r3", None, r3a, None, ts(2)),
        input("r4", None, r4a, None, ts(2)),
        input("r5", Some(r5b), r5a, Some(OffsetInterval(1, 1)), ts(2))),
        0, Some(s"$dir/$tag/cp1")))
      assert(r2.isInstanceOf[TransformResponse.Success], s"$tag run2: $r2")
      val r3 = e.executeTransform(tr(3, Vector(
        input("r1", None, r1a, None, ts(3)),
        input("r2", None, r2a, None, ts(3)),
        input("r3", Some(r3c), r3a, Some(OffsetInterval(1, 1)), ts(3)),
        input("r4", Some(r4c), r4a, Some(OffsetInterval(1, 1)), ts(3)),
        input("r5", Some(r5c), r5a, Some(OffsetInterval(2, 2)), ts(3))),
        1, Some(s"$dir/$tag/cp2")))
      assert(r3.isInstanceOf[TransformResponse.Success], s"$tag run3: $r3")
    }
    chain(Seq.fill(3)("spark"), "batch")
    chain(Seq.fill(3)("spark-streaming"), "stream")
    chain(Seq("spark", "spark-streaming", "spark"), "mixed")
    (1 to 3).foreach { n =>
      for (tag <- Seq("stream", "mixed")) {
        val b = Paths.get(s"$dir/batch/out$n.parquet")
        val s = Paths.get(s"$dir/$tag/out$n.parquet")
        assert(Files.exists(b) == Files.exists(s),
          s"run-$n $tag 5-chain slice existence diverged")
        if (Files.exists(b))
          assert(java.util.Arrays.equals(
            Files.readAllBytes(b), Files.readAllBytes(s)),
            s"run-$n $tag 5-chain slices are not byte-identical")
        assert(
          Files.readString(Paths.get(s"$dir/batch/cp$n/ledger.json")) ==
            Files.readString(Paths.get(s"$dir/$tag/cp$n/ledger.json")))
      }
    }
    // run 1: no tuple (r5 has no matching pk); run 2: the far-end bridge
    // completes the 1-2-3-4-50 tuple from four hops of seeded state;
    // run 3: the middle bridge forms 1-2-33-44-70 (old r1, r2 seeds only)
    def tuples(p: String): Seq[(Long, Long, Long)] =
      if (!Files.exists(Paths.get(p))) Seq.empty
      else spark.read.parquet(p).orderBy("offset").collect().toSeq
        .map(r => (r.getAs[Long]("k3"), r.getAs[Long]("k4"),
          r.getAs[Long]("k5")))
    assert(tuples(s"$dir/stream/out1.parquet").isEmpty)
    assert(tuples(s"$dir/stream/out2.parquet") == Seq((3L, 4L, 50L)))
    assert(tuples(s"$dir/stream/out3.parquet") == Seq((33L, 44L, 70L)))
  }

  test("streaming execution mode covers join-aggregate changelogs byte-identically") {
    // An aggregate ABOVE a left join under engine = spark-streaming: the
    // batch partials machinery computes the merged visible frame from the
    // join delta terms, and StreamingAggDiff's keyed state emits the diff
    // (+I for new groups, −U/+U when a late shipment changes a group's
    // sums). Three-run chain — new groups, a late right row updating an
    // existing group, an in-slice pair — must match batch slices and
    // ledgers byte for byte, including interleaving on one checkpoint.
    import spark.implicits._
    import EngineFixtures.{OrderRow, Shipment}
    val dir = Files.createTempDirectory("graft-proto-stream-ja")
    val o1 = s"$dir/o1.parquet"; val s1 = s"$dir/s1.parquet"
    val s2 = s"$dir/s2.parquet"
    val o3 = s"$dir/o3.parquet"; val s3 = s"$dir/s3.parquet"
    graft.engine.ParquetSliceSink.writeSingleFile(
      spark.createDataset(Seq(
        OrderRow(0, 0, t(ts(1)), t(ts(1)), 1, 10),
        OrderRow(1, 0, t(ts(1)), t(ts(1)), 2, 20))).toDF(), o1)
    graft.engine.ParquetSliceSink.writeSingleFile(
      spark.createDataset(Seq(Shipment(0, 0, t(ts(1)), t(ts(1)), 1, 5))).toDF(), s1)
    graft.engine.ParquetSliceSink.writeSingleFile(
      spark.createDataset(Seq(Shipment(1, 0, t(ts(2)), t(ts(2)), 2, 7))).toDF(), s2)
    graft.engine.ParquetSliceSink.writeSingleFile(
      spark.createDataset(Seq(OrderRow(2, 0, t(ts(3)), t(ts(3)), 3, 30))).toDF(), o3)
    graft.engine.ParquetSliceSink.writeSingleFile(
      spark.createDataset(Seq(Shipment(2, 0, t(ts(3)), t(ts(3)), 3, 9))).toDF(), s3)
    val q =
      """SELECT o.event_time as event_time, count(*) as n,
        |  sum(o.quantity) as q_total, sum(s.num_shipped) as shipped
        |FROM orders o LEFT JOIN shipments s ON o.order_id = s.order_id
        |GROUP BY o.event_time""".stripMargin
    def chain(engines: Seq[String], tag: String): Unit = {
      import graft.engine.TransformEngine
      def input(alias: String, path: Option[String], schema: String,
          oi: Option[OffsetInterval], wm: Instant) = TransformRequestInput(
        datasetId = s"did:odf:$alias", datasetAlias = alias,
        queryAlias = alias, offsetInterval = oi,
        dataPaths = path.toVector, schemaFile = schema,
        explicitWatermarks = Vector(RequestWatermark(wm, wm)))
      def tr(num: Int, ins: Vector[TransformRequestInput], nextOff: Long,
          prev: Option[String]) = TransformRequest(
        "did:odf:out", "out", ts(10 + num), DatasetVocabulary(),
        Transform(engine = engines(num - 1),
          queries = Vector(SqlQueryStep(None, q))),
        ins, nextOffset = nextOff, prevCheckpointPath = prev,
        newCheckpointPath = s"$dir/$tag/cp$num",
        newDataPath = s"$dir/$tag/out$num.parquet")
      val e = new TransformEngine(spark)
      val r1 = e.executeTransform(tr(1, Vector(
        input("orders", Some(o1), o1, Some(OffsetInterval(0, 1)), ts(1)),
        input("shipments", Some(s1), s1, Some(OffsetInterval(0, 0)), ts(1))),
        0, None))
      assert(r1.isInstanceOf[TransformResponse.Success], s"$tag run1: $r1")
      val r2 = e.executeTransform(tr(2, Vector(
        input("orders", None, o1, None, ts(2)),
        input("shipments", Some(s2), s1, Some(OffsetInterval(1, 1)), ts(2))),
        1, Some(s"$dir/$tag/cp1")))
      assert(r2.isInstanceOf[TransformResponse.Success], s"$tag run2: $r2")
      val r3 = e.executeTransform(tr(3, Vector(
        input("orders", Some(o3), o1, Some(OffsetInterval(2, 2)), ts(3)),
        input("shipments", Some(s3), s1, Some(OffsetInterval(2, 2)), ts(3))),
        3, Some(s"$dir/$tag/cp2")))
      assert(r3.isInstanceOf[TransformResponse.Success], s"$tag run3: $r3")
    }
    chain(Seq.fill(3)("spark"), "batch")
    chain(Seq.fill(3)("spark-streaming"), "stream")
    chain(Seq("spark", "spark-streaming", "spark"), "mixed")
    (1 to 3).foreach { n =>
      for (tag <- Seq("stream", "mixed")) {
        assert(java.util.Arrays.equals(
          Files.readAllBytes(Paths.get(s"$dir/batch/out$n.parquet")),
          Files.readAllBytes(Paths.get(s"$dir/$tag/out$n.parquet"))),
          s"run-$n $tag join-agg slices are not byte-identical")
        assert(
          Files.readString(Paths.get(s"$dir/batch/cp$n/ledger.json")) ==
            Files.readString(Paths.get(s"$dir/$tag/cp$n/ledger.json")))
      }
    }
    // run 1: one ts(1) group (n=2, q=30, shipped=5); run 2: the late
    // shipment updates it (−U shipped=5 / +U shipped=12); run 3: the new
    // ts(3) group appends
    val o2r = spark.read.parquet(s"$dir/stream/out2.parquet")
      .orderBy("offset").collect()
    assert(o2r.map(r => (r.getAs[Long]("shipped"), r.getAs[Int]("op"))).toSeq ==
      Seq((5L, Op.CorrectFrom), (12L, Op.CorrectTo)))
    val o3r = spark.read.parquet(s"$dir/stream/out3.parquet").collect()
    assert(o3r.map(r => (r.getAs[Long]("n"), r.getAs[Long]("q_total"),
      r.getAs[Long]("shipped"), r.getAs[Int]("op"))).toSeq ==
      Seq((1L, 30L, 9L, Op.Append)))
  }

  test("streaming execution mode covers op-reading aggregate changelogs byte-identically") {
    // A GROUP BY chain whose aggregate READS a system column (max(offset))
    // — round 11: excluded from the retraction-riding merge path (netting
    // rewrites offset representatives), but while the history is
    // append-only the merge and recompute paths bind identical raw values,
    // so the streaming engine serves it through runIncrementalAgg with the
    // batch dispatch's neverFlips=false and the keyed StreamingAggDiff
    // emission. Four-run chain — new groups, a group update bumping
    // max(offset), a watermark-only run, and a retraction run that flips
    // BOTH engines to the generic recompute face permanently — must match
    // batch slices and ledgers byte for byte, interleaving on one
    // checkpoint.
    import spark.implicits._
    import EngineFixtures.Ticker
    val dir = Files.createTempDirectory("graft-proto-stream-opagg")
    val in1 = s"$dir/in1.parquet"; val in2 = s"$dir/in2.parquet"
    val in4 = s"$dir/in4.parquet"
    graft.engine.ParquetSliceSink.writeSingleFile(
      spark.createDataset(Seq(
        Ticker(0, 0, t(ts(1)), t(ts(1)), "A", 10),
        Ticker(1, 0, t(ts(1)), t(ts(1)), "A", 11),
        Ticker(2, 0, t(ts(1)), t(ts(1)), "B", 20))).toDF(), in1)
    graft.engine.ParquetSliceSink.writeSingleFile(
      spark.createDataset(Seq(
        Ticker(3, 0, t(ts(2)), t(ts(1)), "A", 12))).toDF(), in2)
    graft.engine.ParquetSliceSink.writeSingleFile(
      spark.createDataset(Seq(
        Ticker(4, 1, t(ts(3)), t(ts(1)), "A", 11))).toDF(), in4)
    val q = "SELECT event_time, symbol, count(*) AS n, " +
      "max(offset) AS last_off FROM tickers GROUP BY event_time, symbol"
    def tr(engine: String, tag: String, num: Int, path: Option[String],
        oi: Option[OffsetInterval], wm: Instant, nextOff: Long,
        prev: Option[String]) = TransformRequest(
      "did:odf:out", "out", ts(10 + num), DatasetVocabulary(),
      Transform(engine = engine, queries = Vector(SqlQueryStep(None, q))),
      Vector(TransformRequestInput(
        datasetId = "did:odf:in", datasetAlias = "tickers",
        queryAlias = "tickers", offsetInterval = oi,
        dataPaths = path.toVector, schemaFile = in1,
        explicitWatermarks = Vector(RequestWatermark(wm, wm)))),
      nextOffset = nextOff, prevCheckpointPath = prev,
      newCheckpointPath = s"$dir/$tag/cp$num",
      newDataPath = s"$dir/$tag/out$num.parquet")
    def chain(engines: Seq[String], tag: String): Unit = {
      import graft.engine.TransformEngine
      val e = new TransformEngine(spark)
      val r1 = e.executeTransform(
        tr(engines(0), tag, 1, Some(in1), Some(OffsetInterval(0, 2)), ts(1),
          0, None))
      assert(r1.isInstanceOf[TransformResponse.Success], s"$tag run1: $r1")
      val r2 = e.executeTransform(
        tr(engines(1), tag, 2, Some(in2), Some(OffsetInterval(3, 3)), ts(2),
          2, Some(s"$dir/$tag/cp1")))
      assert(r2.isInstanceOf[TransformResponse.Success], s"$tag run2: $r2")
      val r3 = e.executeTransform(
        tr(engines(2), tag, 3, None, None, ts(3), 4, Some(s"$dir/$tag/cp2")))
      assert(r3.isInstanceOf[TransformResponse.Success], s"$tag run3: $r3")
      val r4 = e.executeTransform(
        tr(engines(3), tag, 4, Some(in4), Some(OffsetInterval(4, 4)), ts(3),
          4, Some(s"$dir/$tag/cp3")))
      assert(r4.isInstanceOf[TransformResponse.Success], s"$tag run4: $r4")
    }
    chain(Seq.fill(4)("spark"), "batch")
    chain(Seq.fill(4)("spark-streaming"), "stream")
    chain(Seq("spark", "spark-streaming", "spark", "spark-streaming"), "mixed")
    (1 to 4).foreach { n =>
      for (tag <- Seq("stream", "mixed")) {
        val b = Paths.get(s"$dir/batch/out$n.parquet")
        val s = Paths.get(s"$dir/$tag/out$n.parquet")
        assert(Files.exists(b) == Files.exists(s),
          s"run-$n $tag op-agg slice existence diverged")
        if (Files.exists(b))
          assert(java.util.Arrays.equals(
            Files.readAllBytes(b), Files.readAllBytes(s)),
            s"run-$n $tag op-agg slices are not byte-identical")
        assert(
          Files.readString(Paths.get(s"$dir/batch/cp$n/ledger.json")) ==
            Files.readString(Paths.get(s"$dir/$tag/cp$n/ledger.json")))
      }
    }
    // run 1: two groups appear; run 2: A's max(offset) bumps 1 → 3
    // (−U/+U); run 4: the retraction drops one A row — the recompute
    // face's netted history keeps n=2 with last_off unchanged, so only
    // the count corrects
    val o1 = spark.read.parquet(s"$dir/stream/out1.parquet")
      .orderBy("symbol").collect()
    assert(o1.map(r => (r.getAs[String]("symbol"), r.getAs[Long]("n"),
      r.getAs[Long]("last_off"), r.getAs[Int]("op"))).toSeq ==
      Seq(("A", 2L, 1L, Op.Append), ("B", 1L, 2L, Op.Append)))
    val o2 = spark.read.parquet(s"$dir/stream/out2.parquet")
      .orderBy("offset").collect()
    assert(o2.map(r => (r.getAs[Long]("n"), r.getAs[Long]("last_off"),
      r.getAs[Int]("op"))).toSeq ==
      Seq((2L, 1L, Op.CorrectFrom), (3L, 3L, Op.CorrectTo)))
    val o4 = spark.read.parquet(s"$dir/stream/out4.parquet")
      .orderBy("offset").collect()
    assert(o4.map(r => (r.getAs[String]("symbol"), r.getAs[Long]("n"),
      r.getAs[Int]("op"))).toSeq ==
      Seq(("A", 3L, Op.CorrectFrom), ("A", 2L, Op.CorrectTo)), o4.mkString(","))
  }

  test("streaming inner join rejects shapes the native face cannot serve") {
    // θ-conditions stay batch-only (join TREES serve since round 10):
    // the native stream-stream joins need pure equi-keys over direct
    // inputs, so a residual predicate must surface as InvalidQuery under
    // the streaming engine flag, never a silently different result.
    import spark.implicits._
    import EngineFixtures.{OrderRow, Shipment}
    val dir = Files.createTempDirectory("graft-proto-stream-ij-bad")
    val o1 = s"$dir/o1.parquet"; val s1 = s"$dir/s1.parquet"
    graft.engine.ParquetSliceSink.writeSingleFile(
      spark.createDataset(Seq(
        OrderRow(0, 0, t(ts(1)), t(ts(1)), 1, 10))).toDF(), o1)
    graft.engine.ParquetSliceSink.writeSingleFile(
      spark.createDataset(Seq(Shipment(0, 0, t(ts(1)), t(ts(1)), 1, 5))).toDF(), s1)
    val qTheta =
      """SELECT o.event_time as event_time, o.order_id as order_id,
        |  s.num_shipped as num_shipped
        |FROM orders o JOIN shipments s
        |  ON o.order_id = s.order_id AND s.num_shipped < o.quantity""".stripMargin
    val r = new graft.engine.TransformEngine(spark).executeTransform(
      TransformRequest(
        "did:odf:out", "out", ts(11), DatasetVocabulary(),
        Transform(engine = "spark-streaming",
          queries = Vector(SqlQueryStep(None, qTheta))),
        Vector(
          TransformRequestInput(
            datasetId = "did:odf:orders", datasetAlias = "orders",
            queryAlias = "orders",
            offsetInterval = Some(OffsetInterval(0, 0)),
            dataPaths = Vector(o1), schemaFile = o1,
            explicitWatermarks = Vector(RequestWatermark(ts(1), ts(1)))),
          TransformRequestInput(
            datasetId = "did:odf:shipments", datasetAlias = "shipments",
            queryAlias = "shipments",
            offsetInterval = Some(OffsetInterval(0, 0)),
            dataPaths = Vector(s1), schemaFile = s1,
            explicitWatermarks = Vector(RequestWatermark(ts(1), ts(1))))),
        nextOffset = 0, prevCheckpointPath = None,
        newCheckpointPath = s"$dir/cp1",
        newDataPath = s"$dir/out1.parquet"))
    assert(r.isInstanceOf[TransformResponse.InvalidQuery], s"theta: $r")
  }

  test("streaming left join rejects non-equi-key ON conditions") {
    // StreamingLeftJoin keys state on one column; a conjunct or
    // non-equality condition is not servable and must surface as
    // InvalidQuery, never a silently different join.
    import spark.implicits._
    import EngineFixtures.{OrderRow, Shipment}
    val dir = Files.createTempDirectory("graft-proto-stream-lj-bad")
    val o1 = s"$dir/o1.parquet"; val s1 = s"$dir/s1.parquet"
    graft.engine.ParquetSliceSink.writeSingleFile(
      spark.createDataset(Seq(OrderRow(0, 0, t(ts(1)), t(ts(1)), 1, 10))).toDF(), o1)
    graft.engine.ParquetSliceSink.writeSingleFile(
      spark.createDataset(Seq(Shipment(0, 0, t(ts(1)), t(ts(1)), 1, 5))).toDF(), s1)
    val q = """SELECT o.event_time as event_time, o.order_id as order_id,
              |  s.num_shipped as num_shipped
              |FROM orders o LEFT JOIN shipments s
              |  ON o.order_id = s.order_id AND s.num_shipped > 1""".stripMargin
    val r = new graft.engine.TransformEngine(spark).executeTransform(
      TransformRequest(
        "did:odf:out", "out", ts(10), DatasetVocabulary(),
        Transform(engine = "spark-streaming",
          queries = Vector(SqlQueryStep(None, q))),
        Vector(
          TransformRequestInput(
            datasetId = "did:odf:o", datasetAlias = "orders",
            queryAlias = "orders", offsetInterval = Some(OffsetInterval(0, 0)),
            dataPaths = Vector(o1), schemaFile = o1,
            explicitWatermarks = Vector(RequestWatermark(ts(1), ts(1)))),
          TransformRequestInput(
            datasetId = "did:odf:s", datasetAlias = "shipments",
            queryAlias = "shipments", offsetInterval = Some(OffsetInterval(0, 0)),
            dataPaths = Vector(s1), schemaFile = s1,
            explicitWatermarks = Vector(RequestWatermark(ts(1), ts(1))))),
        nextOffset = 0, prevCheckpointPath = None,
        newCheckpointPath = s"$dir/cp1", newDataPath = s"$dir/out1.parquet"))
    r match {
      case TransformResponse.InvalidQuery(m) =>
        assert(m.contains("equi-key"), m)
      case other => fail(s"expected InvalidQuery on non-equi-key ON, got $other")
    }
  }

  test("streaming execution mode covers derived-side left-join changelogs byte-identically") {
    // Round 10: a LEFT JOIN whose sides are fed through stateless
    // pre-steps serves under engine = spark-streaming — the staged seeds
    // and micro-batch slices are the batch LeftDeltaPlumbing's DERIVED
    // frames (identity for direct sides), so StreamingLeftJoin's keyed
    // state runs over derived rows and the emissions equal the batch
    // delta passes. Three-run chain — null-pad, late-right retraction of
    // the null-pad, in-slice pair — must match batch slices and ledgers
    // byte for byte, including a mixed batch/streaming chain (the
    // streaming run-2 retraction reconstructs run-1's matched bits from
    // the buffers alone).
    import spark.implicits._
    import EngineFixtures.{OrderRow, Shipment}
    val dir = Files.createTempDirectory("graft-proto-stream-lj-derived")
    val o1 = s"$dir/o1.parquet"; val s1 = s"$dir/s1.parquet"
    val s2 = s"$dir/s2.parquet"
    val o3 = s"$dir/o3.parquet"; val s3 = s"$dir/s3.parquet"
    graft.engine.ParquetSliceSink.writeSingleFile(
      spark.createDataset(Seq(
        OrderRow(0, 0, t(ts(1)), t(ts(1)), 1, 10),
        OrderRow(1, 0, t(ts(1)), t(ts(1)), 2, 20))).toDF(), o1)
    graft.engine.ParquetSliceSink.writeSingleFile(
      spark.createDataset(Seq(Shipment(0, 0, t(ts(1)), t(ts(1)), 1, 5))).toDF(), s1)
    graft.engine.ParquetSliceSink.writeSingleFile(
      spark.createDataset(Seq(Shipment(1, 0, t(ts(2)), t(ts(2)), 2, 7))).toDF(), s2)
    graft.engine.ParquetSliceSink.writeSingleFile(
      spark.createDataset(Seq(OrderRow(2, 0, t(ts(3)), t(ts(3)), 3, 30))).toDF(), o3)
    graft.engine.ParquetSliceSink.writeSingleFile(
      spark.createDataset(Seq(Shipment(2, 0, t(ts(3)), t(ts(3)), 3, 9))).toDF(), s3)
    val steps = Vector(
      SqlQueryStep(Some("enriched"),
        "SELECT event_time, order_id, quantity * 10 AS value FROM orders"),
      SqlQueryStep(Some("shipped"),
        "SELECT order_id AS ship_order, num_shipped FROM shipments"),
      SqlQueryStep(None,
        """SELECT e.event_time as event_time, e.order_id as order_id,
          |  e.value as value, s.num_shipped as num_shipped
          |FROM enriched e LEFT JOIN shipped s
          |  ON e.order_id = s.ship_order""".stripMargin))
    def chain(engines: Seq[String], tag: String): Unit = {
      import graft.engine.TransformEngine
      def input(alias: String, path: Option[String], schema: String,
          oi: Option[OffsetInterval], wm: Instant) = TransformRequestInput(
        datasetId = s"did:odf:$alias", datasetAlias = alias,
        queryAlias = alias, offsetInterval = oi,
        dataPaths = path.toVector, schemaFile = schema,
        explicitWatermarks = Vector(RequestWatermark(wm, wm)))
      def tr(num: Int, ins: Vector[TransformRequestInput], nextOff: Long,
          prev: Option[String]) = TransformRequest(
        "did:odf:out", "out", ts(10 + num), DatasetVocabulary(),
        Transform(engine = engines(num - 1), queries = steps),
        ins, nextOffset = nextOff, prevCheckpointPath = prev,
        newCheckpointPath = s"$dir/$tag/cp$num",
        newDataPath = s"$dir/$tag/out$num.parquet")
      val e = new TransformEngine(spark)
      val r1 = e.executeTransform(tr(1, Vector(
        input("orders", Some(o1), o1, Some(OffsetInterval(0, 1)), ts(1)),
        input("shipments", Some(s1), s1, Some(OffsetInterval(0, 0)), ts(1))),
        0, None))
      assert(r1.isInstanceOf[TransformResponse.Success], s"$tag run1: $r1")
      val r2 = e.executeTransform(tr(2, Vector(
        input("orders", None, o1, None, ts(2)),
        input("shipments", Some(s2), s1, Some(OffsetInterval(1, 1)), ts(2))),
        2, Some(s"$dir/$tag/cp1")))
      assert(r2.isInstanceOf[TransformResponse.Success], s"$tag run2: $r2")
      val r3 = e.executeTransform(tr(3, Vector(
        input("orders", Some(o3), o1, Some(OffsetInterval(2, 2)), ts(3)),
        input("shipments", Some(s3), s1, Some(OffsetInterval(2, 2)), ts(3))),
        4, Some(s"$dir/$tag/cp2")))
      assert(r3.isInstanceOf[TransformResponse.Success], s"$tag run3: $r3")
    }
    chain(Seq.fill(3)("spark"), "batch")
    chain(Seq.fill(3)("spark-streaming"), "stream")
    chain(Seq("spark", "spark-streaming", "spark"), "mixed")
    (1 to 3).foreach { n =>
      for (tag <- Seq("stream", "mixed")) {
        assert(java.util.Arrays.equals(
          Files.readAllBytes(Paths.get(s"$dir/batch/out$n.parquet")),
          Files.readAllBytes(Paths.get(s"$dir/$tag/out$n.parquet"))),
          s"run-$n $tag derived left-join slices are not byte-identical")
        assert(
          Files.readString(Paths.get(s"$dir/batch/cp$n/ledger.json")) ==
            Files.readString(Paths.get(s"$dir/$tag/cp$n/ledger.json")))
      }
    }
    val o1r = spark.read.parquet(s"$dir/stream/out1.parquet")
      .orderBy("offset").collect()
    assert(o1r.map(r => (r.getAs[Long]("order_id"), r.getAs[Long]("value"),
      r.getAs[Any]("num_shipped"), r.getAs[Int]("op"))).toSeq ==
      Seq((1L, 100L, 5L, Op.Append), (2L, 200L, null, Op.Append)))
    val o2r = spark.read.parquet(s"$dir/stream/out2.parquet")
      .orderBy("offset").collect()
    assert(o2r.map(r => (r.getAs[Long]("order_id"), r.getAs[Any]("num_shipped"),
      r.getAs[Int]("op"))).toSeq ==
      Seq((2L, null, Op.Retract), (2L, 7L, Op.Append)))
    val o3r = spark.read.parquet(s"$dir/stream/out3.parquet").collect()
    assert(o3r.map(r => (r.getAs[Long]("order_id"), r.getAs[Any]("num_shipped"),
      r.getAs[Int]("op"))).toSeq == Seq((3L, 9L, Op.Append)))
  }

  test("streaming execution mode covers min/max GROUP BY changelogs byte-identically") {
    // A non-invertible (min/max) GROUP BY under engine = spark-streaming
    // rides the same StreamingAggDiff face as the invertible family — the
    // keyed visible diff is shape-agnostic, and the batch monotone fast
    // path supplies the merged frame. Three-run chain: initial groups, a
    // new max for one group while another group's arrival changes nothing
    // (must emit NOTHING for it), and a new group plus a new min.
    import spark.implicits._
    import EngineFixtures.Ticker
    val dir = Files.createTempDirectory("graft-proto-stream-minmax")
    val q = """SELECT event_time, symbol, max(price) as hi, min(price) as lo
              |FROM tickers GROUP BY event_time, symbol""".stripMargin
    val slices: Seq[Seq[Ticker]] = Seq(
      Seq(
        Ticker(0, 0, t(ts(1)), t(ts(1)), "A", 10),
        Ticker(1, 0, t(ts(1)), t(ts(1)), "B", 20)),
      Seq( // A's max rises; B's arrival equals its current hi/lo — silent
        Ticker(2, 0, t(ts(2)), t(ts(1)), "A", 15),
        Ticker(3, 0, t(ts(2)), t(ts(1)), "B", 20)),
      Seq( // new group C; A's min drops
        Ticker(4, 0, t(ts(3)), t(ts(1)), "C", 7),
        Ticker(5, 0, t(ts(3)), t(ts(1)), "A", 1)))
    slices.zipWithIndex.foreach { case (rows, i) =>
      graft.engine.ParquetSliceSink.writeSingleFile(
        spark.createDataset(rows).toDF(), s"$dir/in${i + 1}.parquet")
    }
    val nextOffs = Seq(0L, 2L, 4L)
    def chain(engines: Seq[String], tag: String): Unit = {
      val e = new graft.engine.TransformEngine(spark)
      slices.zipWithIndex.foreach { case (rows, i) =>
        val n = i + 1
        val r = e.executeTransform(TransformRequest(
          "did:odf:out", "out", ts(10 + n), DatasetVocabulary(),
          Transform(engine = engines(i),
            queries = Vector(SqlQueryStep(None, q))),
          Vector(TransformRequestInput(
            datasetId = "did:odf:in", datasetAlias = "tickers",
            queryAlias = "tickers",
            offsetInterval = Some(OffsetInterval(rows.head.offset, rows.last.offset)),
            dataPaths = Vector(s"$dir/in$n.parquet"),
            schemaFile = s"$dir/in1.parquet",
            explicitWatermarks = Vector(RequestWatermark(ts(n), ts(n))))),
          nextOffset = nextOffs(i),
          prevCheckpointPath = if (n == 1) None else Some(s"$dir/$tag/cp${n - 1}"),
          newCheckpointPath = s"$dir/$tag/cp$n",
          newDataPath = s"$dir/$tag/out$n.parquet"))
        assert(r.isInstanceOf[TransformResponse.Success], s"$tag run$n: $r")
      }
    }
    chain(Seq.fill(3)("spark"), "batch")
    chain(Seq.fill(3)("spark-streaming"), "stream")
    chain(Seq("spark", "spark-streaming", "spark"), "mixed")
    (1 to 3).foreach { n =>
      for (tag <- Seq("stream", "mixed")) {
        assert(java.util.Arrays.equals(
          Files.readAllBytes(Paths.get(s"$dir/batch/out$n.parquet")),
          Files.readAllBytes(Paths.get(s"$dir/$tag/out$n.parquet"))),
          s"run-$n $tag min/max slices are not byte-identical")
        assert(
          Files.readString(Paths.get(s"$dir/batch/cp$n/ledger.json")) ==
            Files.readString(Paths.get(s"$dir/$tag/cp$n/ledger.json")))
      }
    }
    // run 2: only A changes hands (−U hi=10 / +U hi=15); B is silent
    val o2r = spark.read.parquet(s"$dir/stream/out2.parquet")
      .orderBy("offset").collect()
    assert(o2r.map(r => (r.getAs[String]("symbol"), r.getAs[Long]("hi"),
      r.getAs[Int]("op"))).toSeq ==
      Seq(("A", 10L, Op.CorrectFrom), ("A", 15L, Op.CorrectTo)))
    // run 3: C appends; A's lo drops
    val o3r = spark.read.parquet(s"$dir/stream/out3.parquet")
      .orderBy("offset").collect()
    assert(o3r.map(r => (r.getAs[String]("symbol"), r.getAs[Long]("lo"),
      r.getAs[Int]("op"))).toSeq ==
      Seq(("A", 10L, Op.CorrectFrom), ("A", 1L, Op.CorrectTo),
        ("C", 7L, Op.Append)))
  }

  test("streaming execution mode covers invertible GROUP BY changelogs byte-identically") {
    // A non-windowed GROUP BY sum/count/avg under engine = spark-streaming
    // seeds StreamingAggDiff's per-group state with the previously-visible
    // touched rows and runs the merged rows (+ death tombstones) as a
    // second AvailableNow round; its +I/-U+U/-D emissions equal the batch
    // merge diff. Five-run chain — initial appends, a retraction run with
    // corrections, a full group death (-D), rebirth from fresh partials,
    // and a watermark-only run — must match batch slices and ledgers byte
    // for byte; the invertible merge rides the retraction slices in BOTH
    // modes (no InvalidQuery flip).
    import spark.implicits._
    import EngineFixtures.Ticker
    val dir = Files.createTempDirectory("graft-proto-stream-aggmerge")
    val q = """SELECT event_time, symbol, count(*) as n, sum(price) as total,
              |  avg(price) as mean
              |FROM tickers GROUP BY event_time, symbol""".stripMargin
    val slices: Seq[Seq[Ticker]] = Seq(
      Seq(
        Ticker(0, 0, t(ts(1)), t(ts(1)), "A", 10),
        Ticker(1, 0, t(ts(1)), t(ts(1)), "A", 4),
        Ticker(2, 0, t(ts(1)), t(ts(1)), "B", 20)),
      Seq( // retract A@4, append B@5 — corrections only
        Ticker(3, 1, t(ts(2)), t(ts(1)), "A", 4),
        Ticker(4, 0, t(ts(2)), t(ts(1)), "B", 5)),
      Seq( // retract A's last row — the group dies with a -D
        Ticker(5, 1, t(ts(3)), t(ts(1)), "A", 10)),
      Seq( // A returns — fresh partials, not the dead group's zeros
        Ticker(6, 0, t(ts(4)), t(ts(1)), "A", 7)))
    slices.zipWithIndex.foreach { case (rows, i) =>
      graft.engine.ParquetSliceSink.writeSingleFile(
        spark.createDataset(rows).toDF(), s"$dir/in${i + 1}.parquet")
    }
    val nextOffs = Seq(0L, 2L, 6L, 7L)
    def chain(engine: String, tag: String): Unit = {
      val e = new graft.engine.TransformEngine(spark)
      slices.zipWithIndex.foreach { case (rows, i) =>
        val n = i + 1
        val r = e.executeTransform(TransformRequest(
          "did:odf:out", "out", ts(10 + n), DatasetVocabulary(),
          Transform(engine = engine, queries = Vector(SqlQueryStep(None, q))),
          Vector(TransformRequestInput(
            datasetId = "did:odf:in", datasetAlias = "tickers",
            queryAlias = "tickers",
            offsetInterval = Some(OffsetInterval(rows.head.offset, rows.last.offset)),
            dataPaths = Vector(s"$dir/in$n.parquet"),
            schemaFile = s"$dir/in1.parquet",
            explicitWatermarks = Vector(RequestWatermark(ts(n), ts(n))))),
          nextOffset = nextOffs(i),
          prevCheckpointPath = if (n == 1) None else Some(s"$dir/$tag/cp${n - 1}"),
          newCheckpointPath = s"$dir/$tag/cp$n",
          newDataPath = s"$dir/$tag/out$n.parquet"))
        assert(r.isInstanceOf[TransformResponse.Success], s"$tag run$n: $r")
      }
      // run 5: watermark-only — no slice, no emissions
      val r5 = e.executeTransform(TransformRequest(
        "did:odf:out", "out", ts(15), DatasetVocabulary(),
        Transform(engine = engine, queries = Vector(SqlQueryStep(None, q))),
        Vector(TransformRequestInput(
          datasetId = "did:odf:in", datasetAlias = "tickers",
          queryAlias = "tickers", offsetInterval = None,
          dataPaths = Vector.empty, schemaFile = s"$dir/in1.parquet",
          explicitWatermarks = Vector(RequestWatermark(ts(5), ts(5))))),
        nextOffset = 8, prevCheckpointPath = Some(s"$dir/$tag/cp4"),
        newCheckpointPath = s"$dir/$tag/cp5",
        newDataPath = s"$dir/$tag/out5.parquet"))
      assert(r5.isInstanceOf[TransformResponse.Success], s"$tag run5: $r5")
    }
    chain("spark", "batch")
    chain("spark-streaming", "stream")
    (1 to 5).foreach { n =>
      val b = Paths.get(s"$dir/batch/out$n.parquet")
      val s = Paths.get(s"$dir/stream/out$n.parquet")
      assert(Files.exists(b) == Files.exists(s),
        s"run-$n slice existence diverged")
      if (Files.exists(b))
        assert(java.util.Arrays.equals(
          Files.readAllBytes(b), Files.readAllBytes(s)),
          s"run-$n invertible-agg slices are not byte-identical")
      assert(
        Files.readString(Paths.get(s"$dir/batch/cp$n/ledger.json")) ==
          Files.readString(Paths.get(s"$dir/stream/cp$n/ledger.json")))
    }
    // the streaming chain stayed on the tiered merge path
    assert(Files.exists(Paths.get(s"$dir/stream/cp3/agg_partials")),
      "streaming retractive run left the merge path")
    // op-level spot checks on the streaming slices
    def ops(n: Int): Seq[(String, Int, Long, Long, Double)] =
      spark.read.parquet(s"$dir/stream/out$n.parquet").orderBy("offset")
        .collect().toSeq.map(r => (r.getAs[String]("symbol"),
          r.getAs[Int]("op"), r.getAs[Long]("n"), r.getAs[Long]("total"),
          r.getAs[Double]("mean")))
    assert(ops(1) == Seq(("A", 0, 2L, 14L, 7.0), ("B", 0, 1L, 20L, 20.0)))
    assert(ops(2) == Seq(
      ("A", 2, 2L, 14L, 7.0), ("A", 3, 1L, 10L, 10.0),
      ("B", 2, 1L, 20L, 20.0), ("B", 3, 2L, 25L, 12.5)))
    assert(ops(3) == Seq(("A", 1, 1L, 10L, 10.0)))
    assert(ops(4) == Seq(("A", 0, 1L, 7L, 7.0)))
  }

  test("streaming execution mode covers multiset set-op changelogs byte-identically") {
    // An ALL-variant set op (EXCEPT ALL) under engine = spark-streaming
    // routes its |Δk| multiplicity emission through
    // StreamingAggDiff.multiplicityDiff's keyed previous-multiplicity
    // state (round 10); the refcount merge algebra and tiered state
    // writes stay batch. Four-run chain — initial appends with an
    // in-slice duplicate, a RETRACTION dropping one value's multiplicity,
    // a mixed run with a no-change value and a zero-multiplicity new
    // value, and a watermark-only run — must match the batch engine's
    // slices and ledgers byte for byte under an all-streaming AND a
    // mixed batch/streaming chain on one checkpoint lineage.
    import spark.implicits._
    import EngineFixtures.Ticker
    val dir = Files.createTempDirectory("graft-proto-stream-setop")
    val q =
      """SELECT event_time, symbol FROM tickers
        |EXCEPT ALL
        |SELECT event_time, symbol FROM tickers WHERE price > 10""".stripMargin
    val slices: Seq[Seq[Ticker]] = Seq(
      Seq( // A multiplicity 2 (two rows ≤ 10), B multiplicity 1
        Ticker(0, 0, t(ts(11)), t(ts(1)), "A", 10),
        Ticker(1, 0, t(ts(11)), t(ts(1)), "A", 10),
        Ticker(2, 0, t(ts(11)), t(ts(1)), "A", 20),
        Ticker(3, 0, t(ts(11)), t(ts(1)), "B", 5)),
      Seq( // retract one A@10 — A's multiplicity drops 2 → 1: one -D
        Ticker(4, 1, t(ts(12)), t(ts(1)), "A", 10)),
      Seq( // B@7 raises B 1 → 2 (+I); C@50 enters at multiplicity 0 (no op)
        Ticker(5, 0, t(ts(13)), t(ts(1)), "B", 7),
        Ticker(6, 0, t(ts(13)), t(ts(1)), "C", 50)))
    slices.zipWithIndex.foreach { case (rows, i) =>
      graft.engine.ParquetSliceSink.writeSingleFile(
        spark.createDataset(rows).toDF(), s"$dir/in${i + 1}.parquet")
    }
    val nextOffs = Seq(0L, 3L, 4L)
    def chain(engines: Seq[String], tag: String): Unit = {
      val e = new graft.engine.TransformEngine(spark)
      slices.zipWithIndex.foreach { case (rows, i) =>
        val n = i + 1
        val r = e.executeTransform(TransformRequest(
          "did:odf:out", "out", ts(10 + n), DatasetVocabulary(),
          Transform(engine = engines(i),
            queries = Vector(SqlQueryStep(None, q))),
          Vector(TransformRequestInput(
            datasetId = "did:odf:in", datasetAlias = "tickers",
            queryAlias = "tickers",
            offsetInterval = Some(OffsetInterval(rows.head.offset, rows.last.offset)),
            dataPaths = Vector(s"$dir/in$n.parquet"),
            schemaFile = s"$dir/in1.parquet",
            explicitWatermarks = Vector(RequestWatermark(ts(n), ts(n))))),
          nextOffset = nextOffs(i),
          prevCheckpointPath = if (n == 1) None else Some(s"$dir/$tag/cp${n - 1}"),
          newCheckpointPath = s"$dir/$tag/cp$n",
          newDataPath = s"$dir/$tag/out$n.parquet"))
        assert(r.isInstanceOf[TransformResponse.Success], s"$tag run$n: $r")
      }
      val r4 = e.executeTransform(TransformRequest(
        "did:odf:out", "out", ts(14), DatasetVocabulary(),
        Transform(engine = engines(3),
          queries = Vector(SqlQueryStep(None, q))),
        Vector(TransformRequestInput(
          datasetId = "did:odf:in", datasetAlias = "tickers",
          queryAlias = "tickers", offsetInterval = None,
          dataPaths = Vector.empty, schemaFile = s"$dir/in1.parquet",
          explicitWatermarks = Vector(RequestWatermark(ts(4), ts(4))))),
        nextOffset = 5, prevCheckpointPath = Some(s"$dir/$tag/cp3"),
        newCheckpointPath = s"$dir/$tag/cp4",
        newDataPath = s"$dir/$tag/out4.parquet"))
      assert(r4.isInstanceOf[TransformResponse.Success], s"$tag run4: $r4")
    }
    chain(Seq.fill(4)("spark"), "batch")
    chain(Seq.fill(4)("spark-streaming"), "stream")
    chain(Seq("spark", "spark-streaming", "spark", "spark-streaming"), "mixed")
    (1 to 4).foreach { n =>
      for (tag <- Seq("stream", "mixed")) {
        val b = Paths.get(s"$dir/batch/out$n.parquet")
        val s = Paths.get(s"$dir/$tag/out$n.parquet")
        assert(Files.exists(b) == Files.exists(s),
          s"run-$n $tag slice existence diverged")
        if (Files.exists(b))
          assert(java.util.Arrays.equals(
            Files.readAllBytes(b), Files.readAllBytes(s)),
            s"run-$n $tag set-op slices are not byte-identical")
        assert(
          Files.readString(Paths.get(s"$dir/batch/cp$n/ledger.json")) ==
            Files.readString(Paths.get(s"$dir/$tag/cp$n/ledger.json")))
      }
    }
    // op-level spot checks on the streaming slices
    def ops(n: Int): Seq[(String, Int)] = {
      val p = s"$dir/stream/out$n.parquet"
      if (!Files.exists(Paths.get(p))) Seq.empty
      else spark.read.parquet(p).orderBy("offset").collect().toSeq
        .map(r => (r.getAs[String]("symbol"), r.getAs[Int]("op")))
    }
    assert(ops(1) == Seq(("A", 0), ("A", 0), ("B", 0)))
    assert(ops(2) == Seq(("A", 1)))
    assert(ops(3) == Seq(("B", 0)))
    assert(ops(4) == Seq.empty)
  }

  test("streaming execution mode covers generic recompute changelogs byte-identically") {
    // Shapes with NO incremental fast path (here: a non-decomposable
    // count(DISTINCT) aggregate, and a DISTINCT over a re-keying
    // EXCEPT ALL subquery) ride the batch recompute on every run; under
    // engine = spark-streaming their changelog emission routes through
    // the keyed / multiplicity streaming diff while the recompute and
    // every state write stay batch — so retractions RIDE (the buffer
    // netting absorbs them) and mixed chains interleave on one
    // checkpoint. Four-run chains incl. a retraction run and a
    // watermark-only run must match batch byte for byte.
    import spark.implicits._
    import EngineFixtures.Ticker
    val dir = Files.createTempDirectory("graft-proto-stream-generic")
    def slice(path: String, rows: Seq[Ticker]): String = {
      graft.engine.ParquetSliceSink.writeSingleFile(
        spark.createDataset(rows).toDF(), path); path
    }
    val a1 = slice(s"$dir/a1.parquet", Seq(
      Ticker(0, 0, t(ts(1)), t(ts(1)), "A", 10),
      Ticker(1, 0, t(ts(1)), t(ts(1)), "A", 20),
      Ticker(2, 0, t(ts(1)), t(ts(1)), "B", 10)))
    val a2 = slice(s"$dir/a2.parquet", Seq(
      Ticker(3, 0, t(ts(2)), t(ts(2)), "A", 10),  // dup value for A
      Ticker(4, 1, t(ts(2)), t(ts(1)), "A", 20))) // retract A@20
    val a4 = slice(s"$dir/a4.parquet", Seq(
      Ticker(5, 0, t(ts(4)), t(ts(4)), "C", 30)))
    def chain(queries: Vector[SqlQueryStep], engines: Seq[String],
        sub: String, tag: String): Unit = {
      import graft.engine.TransformEngine
      def tr(num: Int, path: Option[String], oi: Option[OffsetInterval],
          wm: Instant, nextOff: Long, prev: Option[String]) = TransformRequest(
        "did:odf:out", "out", ts(10 + num), DatasetVocabulary(),
        Transform(engine = engines(num - 1), queries = queries),
        Vector(TransformRequestInput(
          datasetId = "did:odf:in", datasetAlias = "tickers",
          queryAlias = "tickers", offsetInterval = oi,
          dataPaths = path.toVector, schemaFile = a1,
          explicitWatermarks = Vector(RequestWatermark(wm, wm)))),
        nextOffset = nextOff, prevCheckpointPath = prev,
        newCheckpointPath = s"$dir/$sub/$tag/cp$num",
        newDataPath = s"$dir/$sub/$tag/out$num.parquet")
      val e = new TransformEngine(spark)
      val r1 = e.executeTransform(
        tr(1, Some(a1), Some(OffsetInterval(0, 2)), ts(1), 0, None))
      assert(r1.isInstanceOf[TransformResponse.Success], s"$sub $tag run1: $r1")
      val r2 = e.executeTransform(
        tr(2, Some(a2), Some(OffsetInterval(3, 4)), ts(2), 2,
          Some(s"$dir/$sub/$tag/cp1")))
      assert(r2.isInstanceOf[TransformResponse.Success], s"$sub $tag run2: $r2")
      val r3 = e.executeTransform(
        tr(3, None, None, ts(3), 3, Some(s"$dir/$sub/$tag/cp2")))
      assert(r3.isInstanceOf[TransformResponse.Success], s"$sub $tag run3: $r3")
      val r4 = e.executeTransform(
        tr(4, Some(a4), Some(OffsetInterval(5, 5)), ts(4), 3,
          Some(s"$dir/$sub/$tag/cp3")))
      assert(r4.isInstanceOf[TransformResponse.Success], s"$sub $tag run4: $r4")
    }
    val keyedQ = Vector(SqlQueryStep(None,
      """SELECT max(event_time) AS event_time, symbol,
        |  count(DISTINCT price) AS n
        |FROM tickers GROUP BY symbol""".stripMargin))
    // DISTINCT over a RE-KEYING set-op subquery (price dropped): neither
    // a refcount DISTINCT spec nor a multiplicity fold applies —
    // keyless full-row multiset recompute (PlanClassifierSpec pins it)
    val multisetQ = Vector(SqlQueryStep(None,
      """SELECT DISTINCT event_time, symbol FROM (
        |  SELECT event_time, symbol, price FROM tickers WHERE price < 25
        |  EXCEPT ALL
        |  SELECT event_time, symbol, price FROM tickers WHERE price > 15
        |) v""".stripMargin))
    for ((sub, q) <- Seq("keyed" -> keyedQ, "multiset" -> multisetQ)) {
      chain(q, Seq.fill(4)("spark"), sub, "batch")
      chain(q, Seq.fill(4)("spark-streaming"), sub, "stream")
      chain(q, Seq("spark", "spark-streaming", "spark-streaming", "spark"),
        sub, "mixed")
      (1 to 4).foreach { n =>
        for (tag <- Seq("stream", "mixed")) {
          val b = Paths.get(s"$dir/$sub/batch/out$n.parquet")
          val s = Paths.get(s"$dir/$sub/$tag/out$n.parquet")
          assert(Files.exists(b) == Files.exists(s),
            s"$sub run-$n $tag slice existence diverged")
          if (Files.exists(b))
            assert(java.util.Arrays.equals(
              Files.readAllBytes(b), Files.readAllBytes(s)),
              s"$sub run-$n $tag generic slices are not byte-identical")
          assert(
            Files.readString(Paths.get(s"$dir/$sub/batch/cp$n/ledger.json")) ==
              Files.readString(Paths.get(s"$dir/$sub/$tag/cp$n/ledger.json")),
            s"$sub run-$n $tag ledgers diverged")
        }
      }
    }
    // keyed: run 2's dup value + retraction nets A to one distinct price
    // (-U n=2 / +U n=1); run 4 appends the C group
    val k2 = spark.read.parquet(s"$dir/keyed/stream/out2.parquet")
      .orderBy("offset").collect()
    assert(k2.map(r => (r.getAs[String]("symbol"), r.getAs[Long]("n"),
      r.getAs[Int]("op"))).toSeq == Seq(("A", 2L, Op.CorrectFrom),
      ("A", 1L, Op.CorrectTo)), k2.mkString(","))
    val k4 = spark.read.parquet(s"$dir/keyed/stream/out4.parquet").collect()
    assert(k4.map(r => (r.getAs[String]("symbol"), r.getAs[Long]("n"),
      r.getAs[Int]("op"))).toSeq == Seq(("C", 1L, Op.Append)))
  }

  test("streaming left join serves double keys (round-11 canonical keying)") {
    // Until round 11 StreamingLeftJoin keyed its per-group state on the
    // key's string form, so DOUBLE keys (where -0.0 and 0.0 are equal
    // under SQL join equality but stringify differently) were rejected.
    // The state now keys on the canonical serialization, so the shape
    // serves — and the -0.0 order must pair with the 0.0 shipment.
    import spark.implicits._
    import EngineFixtures.{DblOrder, DblShip}
    val dir = Files.createTempDirectory("graft-proto-stream-lj-dbl")
    val o1 = s"$dir/o1.parquet"; val s1 = s"$dir/s1.parquet"
    graft.engine.ParquetSliceSink.writeSingleFile(
      spark.createDataset(Seq(DblOrder(0, 0, t(ts(1)), t(ts(1)), -0.0, 10))).toDF(), o1)
    graft.engine.ParquetSliceSink.writeSingleFile(
      spark.createDataset(Seq(DblShip(0, 0, t(ts(1)), t(ts(1)), 0.0, 5))).toDF(), s1)
    val q = """SELECT o.event_time as event_time, o.quantity as quantity,
              |  s.num_shipped as num_shipped
              |FROM orders o LEFT JOIN shipments s ON o.dbl_key = s.dbl_key""".stripMargin
    val r = new graft.engine.TransformEngine(spark).executeTransform(
      TransformRequest(
        "did:odf:out", "out", ts(10), DatasetVocabulary(),
        Transform(engine = "spark-streaming",
          queries = Vector(SqlQueryStep(None, q))),
        Vector(
          TransformRequestInput(
            datasetId = "did:odf:o", datasetAlias = "orders",
            queryAlias = "orders", offsetInterval = Some(OffsetInterval(0, 0)),
            dataPaths = Vector(o1), schemaFile = o1,
            explicitWatermarks = Vector(RequestWatermark(ts(1), ts(1)))),
          TransformRequestInput(
            datasetId = "did:odf:s", datasetAlias = "shipments",
            queryAlias = "shipments", offsetInterval = Some(OffsetInterval(0, 0)),
            dataPaths = Vector(s1), schemaFile = s1,
            explicitWatermarks = Vector(RequestWatermark(ts(1), ts(1))))),
        nextOffset = 0, prevCheckpointPath = None,
        newCheckpointPath = s"$dir/cp1", newDataPath = s"$dir/out1.parquet"))
    assert(r.isInstanceOf[TransformResponse.Success], s"run1: $r")
    val rows = spark.read.parquet(s"$dir/out1.parquet").collect()
    assert(rows.map(x => (x.getAs[Long]("quantity"),
      x.getAs[Any]("num_shipped"), x.getAs[Int]("op"))).toSeq ==
      Seq((10L, 5L, Op.Append)))
  }

  test("streaming left-join chain rejects ambiguous bare column references") {
    // A bare reference to a column present on BOTH join sides raises
    // AMBIGUOUS_REFERENCE through the batch pass; the streaming
    // chain-over-wide-view remap must surface the same InvalidQuery
    // instead of silently binding to the left column.
    import spark.implicits._
    import EngineFixtures.{OrderRow, Shipment}
    val dir = Files.createTempDirectory("graft-proto-stream-lj-ambig")
    val o1 = s"$dir/o1.parquet"; val s1 = s"$dir/s1.parquet"
    graft.engine.ParquetSliceSink.writeSingleFile(
      spark.createDataset(Seq(OrderRow(0, 0, t(ts(1)), t(ts(1)), 1, 10))).toDF(), o1)
    graft.engine.ParquetSliceSink.writeSingleFile(
      spark.createDataset(Seq(Shipment(0, 0, t(ts(1)), t(ts(1)), 1, 5))).toDF(), s1)
    // `order_id` exists on both orders and shipments and is referenced bare
    val q = """SELECT o.event_time as event_time, order_id,
              |  s.num_shipped as num_shipped
              |FROM orders o LEFT JOIN shipments s ON o.order_id = s.order_id""".stripMargin
    val r = new graft.engine.TransformEngine(spark).executeTransform(
      TransformRequest(
        "did:odf:out", "out", ts(10), DatasetVocabulary(),
        Transform(engine = "spark-streaming",
          queries = Vector(SqlQueryStep(None, q))),
        Vector(
          TransformRequestInput(
            datasetId = "did:odf:o", datasetAlias = "orders",
            queryAlias = "orders", offsetInterval = Some(OffsetInterval(0, 0)),
            dataPaths = Vector(o1), schemaFile = o1,
            explicitWatermarks = Vector(RequestWatermark(ts(1), ts(1)))),
          TransformRequestInput(
            datasetId = "did:odf:s", datasetAlias = "shipments",
            queryAlias = "shipments", offsetInterval = Some(OffsetInterval(0, 0)),
            dataPaths = Vector(s1), schemaFile = s1,
            explicitWatermarks = Vector(RequestWatermark(ts(1), ts(1))))),
        nextOffset = 0, prevCheckpointPath = None,
        newCheckpointPath = s"$dir/cp1", newDataPath = s"$dir/out1.parquet"))
    r match {
      case TransformResponse.InvalidQuery(m) =>
        assert(m.toLowerCase.contains("ambiguous"), m)
      case other => fail(s"expected InvalidQuery on ambiguous bare ref, got $other")
    }
  }

  test("streaming left-join ORDER BY over a select alias is not ambiguous") {
    // `ORDER BY order_id` where order_id names BOTH a select-list alias
    // and a column on both join sides: batch resolves it against the
    // projection's output (no AMBIGUOUS_REFERENCE), so the streaming
    // wide-view remap must accept it too and stay byte-identical — the
    // ambiguity rejection applies only where batch itself would throw
    // (bare refs in the select list, pinned by the sibling test above).
    import spark.implicits._
    import EngineFixtures.{OrderRow, Shipment}
    val dir = Files.createTempDirectory("graft-proto-stream-lj-orderby")
    val o1 = s"$dir/o1.parquet"; val s1 = s"$dir/s1.parquet"
    graft.engine.ParquetSliceSink.writeSingleFile(
      spark.createDataset(Seq(
        OrderRow(0, 0, t(ts(1)), t(ts(1)), 2, 20),
        OrderRow(1, 0, t(ts(1)), t(ts(1)), 1, 10))).toDF(), o1)
    graft.engine.ParquetSliceSink.writeSingleFile(
      spark.createDataset(Seq(Shipment(0, 0, t(ts(1)), t(ts(1)), 1, 5))).toDF(), s1)
    val q = """SELECT o.event_time as event_time, o.order_id as order_id,
              |  s.num_shipped as num_shipped
              |FROM orders o LEFT JOIN shipments s ON o.order_id = s.order_id
              |ORDER BY order_id""".stripMargin
    def drive(engine: String, tag: String): TransformResponse = {
      new graft.engine.TransformEngine(spark).executeTransform(TransformRequest(
        "did:odf:out", "out", ts(10), DatasetVocabulary(),
        Transform(engine = engine, queries = Vector(SqlQueryStep(None, q))),
        Vector(
          TransformRequestInput(
            datasetId = "did:odf:o", datasetAlias = "orders",
            queryAlias = "orders", offsetInterval = Some(OffsetInterval(0, 1)),
            dataPaths = Vector(o1), schemaFile = o1,
            explicitWatermarks = Vector(RequestWatermark(ts(1), ts(1)))),
          TransformRequestInput(
            datasetId = "did:odf:s", datasetAlias = "shipments",
            queryAlias = "shipments", offsetInterval = Some(OffsetInterval(0, 0)),
            dataPaths = Vector(s1), schemaFile = s1,
            explicitWatermarks = Vector(RequestWatermark(ts(1), ts(1))))),
        nextOffset = 0, prevCheckpointPath = None,
        newCheckpointPath = s"$dir/$tag/cp1",
        newDataPath = s"$dir/$tag/out1.parquet"))
    }
    val rb = drive("spark", "batch")
    assert(rb.isInstanceOf[TransformResponse.Success], s"batch: $rb")
    val rs = drive("spark-streaming", "stream")
    assert(rs.isInstanceOf[TransformResponse.Success], s"stream: $rs")
    assert(java.util.Arrays.equals(
      Files.readAllBytes(Paths.get(s"$dir/batch/out1.parquet")),
      Files.readAllBytes(Paths.get(s"$dir/stream/out1.parquet"))),
      "ORDER-BY-alias left-join slices are not byte-identical")
  }

  test("streaming Top-N rejects tied sort keys instead of collapsing rows") {
    // StreamingTopN keys its state on (ord, tie); with no distinct
    // tiebreak written, two distinct rows with the same price in one
    // partition would silently collapse to one while batch row_number
    // ranks both. The executor must enforce the determinism contract:
    // a tie over seed ∪ slice raises InvalidQuery, never drops a row.
    import spark.implicits._
    import EngineFixtures.Ticker
    val dir = Files.createTempDirectory("graft-proto-stream-topn-tie")
    val in1 = s"$dir/in1.parquet"
    graft.engine.ParquetSliceSink.writeSingleFile(
      spark.createDataset(Seq(
        Ticker(0, 0, t(ts(1)), t(ts(1)), "A", 10),
        Ticker(1, 0, t(ts(1)), t(ts(1)), "A", 10))).toDF(), in1)
    val q = """SELECT event_time, symbol, price, rn FROM (
              |  SELECT event_time, symbol, price,
              |    row_number() OVER (PARTITION BY symbol ORDER BY price DESC) AS rn
              |  FROM tickers) WHERE rn <= 2""".stripMargin
    val req = TransformRequest(
      "did:odf:out", "out", ts(10), DatasetVocabulary(),
      Transform(engine = "spark-streaming",
        queries = Vector(SqlQueryStep(None, q))),
      Vector(TransformRequestInput(
        datasetId = "did:odf:in", datasetAlias = "tickers",
        queryAlias = "tickers", offsetInterval = Some(OffsetInterval(0, 1)),
        dataPaths = Vector(in1), schemaFile = in1,
        explicitWatermarks = Vector(RequestWatermark(ts(1), ts(1))))),
      nextOffset = 0, prevCheckpointPath = None,
      newCheckpointPath = s"$dir/cp1", newDataPath = s"$dir/out1.parquet")
    val r = new graft.engine.TransformEngine(spark).executeTransform(req)
    r match {
      case TransformResponse.InvalidQuery(msg) =>
        assert(msg.contains("unique per partition"), msg)
      case other => fail(s"expected InvalidQuery on tied sort keys, got $other")
    }
  }

  test("tar pack/unpack round-trips nested checkpoint trees, system-tar readable") {
    val src = Files.createTempDirectory("graft-tar-src")
    Files.writeString(src.resolve("ledger.json"), """{"n":1}""")
    Files.createDirectories(src.resolve("buffer"))
    Files.write(src.resolve("buffer/part-00000.parquet"), Array.tabulate(700)(_.toByte))
    Files.writeString(src.resolve("buffer/_SUCCESS"), "")
    val tar = Files.createTempFile("graft-cp", ".tar")
    CheckpointTar.pack(src, tar)

    // system tar must list the same entries (ustar interop)
    val p = new ProcessBuilder("tar", "-tf", tar.toString).start()
    val listed = new String(p.getInputStream.readAllBytes())
    assert(p.waitFor() == 0, listed)
    assert(listed.contains("ledger.json") && listed.contains("buffer/part-00000.parquet"))

    val dst = Files.createTempDirectory("graft-tar-dst").resolve("unpacked")
    CheckpointTar.unpack(tar, dst)
    assert(Files.readString(dst.resolve("ledger.json")) == """{"n":1}""")
    assert(Files.readAllBytes(dst.resolve("buffer/part-00000.parquet")).toSeq ==
      Array.tabulate(700)(_.toByte).toSeq)
    assert(Files.exists(dst.resolve("buffer/_SUCCESS")))
  }

  test("transform chain round-trips with coordinator-style tar checkpoints") {
    import spark.implicits._
    import EngineFixtures.Ticker
    val dir = Files.createTempDirectory("graft-proto-tar")
    val in1 = s"$dir/in1.parquet"
    graft.engine.ParquetSliceSink.writeSingleFile(
      spark.createDataset(Seq(
        Ticker(0, 0, t(ts(1)), t(ts(1, 1)), "A", 10),
        Ticker(1, 0, t(ts(1)), t(ts(1, 2)), "A", 12),
        Ticker(2, 0, t(ts(1)), t(ts(2, 1)), "A", 20))).toDF(), in1)

    def request(num: Int, dataRows: Option[(String, Int, Int)], wm: String,
        prevCp: Option[String]): String = {
      val slice = dataRows.map { case (path, s, e) =>
        s"""|  offsetInterval:
            |    start: $s
            |    end: $e
            |  dataPaths:
            |  - "$path"""".stripMargin
      }.getOrElse("  dataPaths: []")
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
          |$slice
          |  schemaFile: "$in1"
          |  explicitWatermarks:
          |  - systemTime: "$wm"
          |    eventTime: "$wm"
          |${prevCp.map(p => s"prevCheckpointPath: \"$p\"").getOrElse("")}
          |newCheckpointPath: "$dir/cp$num.tar"
          |newDataPath: "$dir/out$num.parquet"
          |""".stripMargin
    }

    val resp1 = runProcess("transform",
      request(1, Some((in1, 0, 2)), "2000-01-02T00:00:00Z", None), dir, "1")
    assert(resp1.contains("kind: Success"), resp1)
    // the checkpoint left behind is a single regular tar file, not a dir
    assert(Files.isRegularFile(Paths.get(s"$dir/cp1.tar")))

    val resp2 = runProcess("transform",
      request(2, None, "2000-01-04T00:00:00Z", Some(s"$dir/cp1.tar")), dir, "2")
    assert(resp2.contains("kind: Success"), resp2)
    assert(resp2.contains("start: 1") && resp2.contains("end: 1"), resp2)
    val o2 = spark.read.parquet(s"$dir/out2.parquet").collect()
    assert(o2.length == 1 && o2(0).getAs[Int]("min") == 20)
    assert(Files.isRegularFile(Paths.get(s"$dir/cp2.tar")))
  }

  test("raw query round-trips through a process with YAML response") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-proto-raw")
    val in = s"$dir/in.parquet"
    spark.createDataset(Seq(1, 2, 3, 4, 5)).toDF("x").write.parquet(in)
    val req =
      s"""|inputDataPaths:
          |- "$in"
          |transform:
          |  kind: Sql
          |  engine: spark
          |  query: "SELECT x * 2 AS y FROM input WHERE x > 2"
          |outputDataPath: "$dir/out.parquet"
          |""".stripMargin
    val resp = runProcess("rawquery", req, dir, "raw")
    assert(resp.contains("kind: Success"), resp)
    assert(resp.contains("numRecords: 3"), resp)
    val ys = spark.read.parquet(s"$dir/out.parquet")
      .collect().map(_.getAs[Int]("y")).sorted.toSeq
    assert(ys == Seq(6, 8, 10))
  }
}
