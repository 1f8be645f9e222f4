package graft

import java.nio.file.{Files, Path, Paths}
import java.sql.Timestamp
import java.time.Instant

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Codec, RawQueryEngine, TransformEngine}
import graft.protocol._

/** Golden behavioral tests for the transform/raw-query engines, mirroring the
  * reference's observable multi-run semantics (SURVEY.md §5, FIXTURES.md):
  * offsets, watermark algebra, window emission gating, late data, as-of
  * hold-back, Top-N changelog ops. Inputs are written programmatically with
  * the reference's ts(day,hour,min) convention anchored at 2000-01-01 UTC
  * (reference TimeHelpers.scala:14-18 — convention only, no code reuse).
  */
class EngineSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    // seeded chains here are all "young" (a handful of slices); pin the
    // cost-based recompute detour off so they keep exercising the merge
    // paths they cover — the detour has its own dedicated tests
    .config("spark.graft.recomputeYoungFactor", "0")
    .getOrCreate()

  def ts(day: Int, hour: Int = 0, min: Int = 0): Instant =
    Instant.parse(f"2000-01-${day}%02dT${hour}%02d:${min}%02d:00Z")
  def t(i: Instant): Timestamp = Timestamp.from(i)

  import EngineFixtures._

  def tmp(): Path = Files.createTempDirectory("graft-test")

  def writeSlice[T <: Product : org.apache.spark.sql.Encoder](
      rows: Seq[T], path: String): Unit = {
    import graft.engine.ParquetSliceSink
    ParquetSliceSink.writeSingleFile(spark.createDataset(rows).toDF(), path)
  }

  def mkInput(alias: String, dataPath: String, schemaFile: String,
      rows: Long, startOffset: Long = 0,
      wms: Seq[Instant] = Nil,
      vocab: DatasetVocabulary = DatasetVocabulary()): TransformRequestInput =
    TransformRequestInput(
      datasetId = s"did:$alias", datasetAlias = alias, queryAlias = alias,
      vocab = vocab,
      offsetInterval =
        if (rows > 0) Some(OffsetInterval(startOffset, startOffset + rows - 1)) else None,
      dataPaths = if (dataPath == null) Vector.empty else Vector(dataPath),
      schemaFile = schemaFile,
      explicitWatermarks = wms.map(w => RequestWatermark(w, w)).toVector)

  def transform(queries: (Option[String], String)*): Transform =
    Transform(queries = queries.map { case (a, q) => SqlQueryStep(a, q) }.toVector)

  def runT(req: TransformRequest): TransformResponse.Success =
    new TransformEngine(spark).executeTransform(req) match {
      case s: TransformResponse.Success => s
      case other => fail(s"transform failed: $other")
    }

  def readOut(path: String): DataFrame = spark.read.parquet(path)

  // ──────────────────────────────────────────────────────────────────────
  test("map: projection with op passthrough, offsets, watermark") {
    import spark.implicits._
    val dir = tmp()
    val in = s"$dir/in.parquet"
    writeSlice(Seq(
      Ticker(0, 0, t(ts(1)), t(ts(1)), "A", 10),
      Ticker(1, 0, t(ts(1)), t(ts(2)), "B", 20)), in)

    val req = TransformRequest(
      datasetId = "did:out", datasetAlias = "out", systemTime = ts(5),
      vocab = DatasetVocabulary(),
      transform = transform(None ->
        "SELECT op, event_time, symbol, price * 10 as price FROM tickers"),
      queryInputs = Vector(mkInput("tickers", in, in, 2, wms = Seq(ts(2)))),
      nextOffset = 10,
      prevCheckpointPath = None,
      newCheckpointPath = s"$dir/cp1",
      newDataPath = s"$dir/out1.parquet")

    val resp = runT(req)
    assert(resp.newOffsetInterval.contains(OffsetInterval(10, 11)))
    assert(resp.newWatermark.contains(ts(2)))
    val out = readOut(s"$dir/out1.parquet")
    assert(out.columns.toSeq ==
      Seq("offset", "op", "system_time", "event_time", "symbol", "price"))
    val rows = out.orderBy("offset").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(10L, 11L))
    assert(rows.map(_.getInt(5)).toSeq == Seq(100, 200))
    assert(rows.map(_.getTimestamp(2)).distinct.toSeq == Seq(t(ts(5))))
  }

  test("map: changelog ops pass through unchanged (reference EngineMapTest mirror)") {
    import spark.implicits._
    // Exact mirror of reference EngineMapTest.scala:149-231 ("Map - with
    // corrections and retractions"): `op` is selected EXPLICITLY — that is
    // how the reference preserves ops through map queries (its inputs are
    // fromDataStream with RowKind always INSERT; RowKind-derived ops apply
    // only when `op` is not selected, TransformEngine.scala:294-302,329-332).
    val dir = tmp()
    val in = s"$dir/in.parquet"
    writeSlice(Seq(
      Ticker(0, Op.Append, t(ts(5)), t(ts(1)), "A", 10),
      Ticker(1, Op.CorrectFrom, t(ts(5)), t(ts(1)), "A", 10),
      Ticker(2, Op.CorrectTo, t(ts(5)), t(ts(1)), "A", 11),
      Ticker(3, Op.Retract, t(ts(5)), t(ts(1)), "A", 11)), in)
    val req = TransformRequest(
      "did:out", "out", ts(10), DatasetVocabulary(),
      transform(None ->
        "select op, event_time, symbol, price * 10 as price from tickers"),
      Vector(mkInput("tickers", in, in, 4, wms = Seq(ts(1)))),
      nextOffset = 0, prevCheckpointPath = None,
      newCheckpointPath = s"$dir/cp1", newDataPath = s"$dir/out1.parquet")
    val resp = runT(req)
    assert(resp.newOffsetInterval.contains(OffsetInterval(0, 3)))
    assert(resp.newWatermark.contains(ts(1)))
    val out = readOut(s"$dir/out1.parquet").orderBy("offset")
    // same column order as the reference's output schema golden
    assert(out.columns.toSeq ==
      Seq("offset", "op", "system_time", "event_time", "symbol", "price"))
    val rows = out.collect().map(r => (r.getLong(0), r.getInt(1),
      r.getTimestamp(2), r.getTimestamp(3), r.getString(4), r.getInt(5))).toSeq
    assert(rows == Seq(
      (0L, Op.Append, t(ts(10)), t(ts(1)), "A", 100),
      (1L, Op.CorrectFrom, t(ts(10)), t(ts(1)), "A", 100),
      (2L, Op.CorrectTo, t(ts(10)), t(ts(1)), "A", 110),
      (3L, Op.Retract, t(ts(10)), t(ts(1)), "A", 110)))
  }

  // ──────────────────────────────────────────────────────────────────────
  test("tumbling agg: window emission gated by watermark across runs; late data") {
    import spark.implicits._
    val dir = tmp()
    val q = """SELECT TUMBLE_START(event_time, INTERVAL '1' DAY) as event_time,
              |  symbol, min(price) as `min`, max(price) as `max`
              |FROM tickers
              |GROUP BY TUMBLE(event_time, INTERVAL '1' DAY), symbol""".stripMargin

    // run 1: data on days 1-2, watermark day 2 → only day-1 window closes.
    val in1 = s"$dir/in1.parquet"
    writeSlice(Seq(
      Ticker(0, 0, t(ts(1)), t(ts(1, 1)), "A", 10),
      Ticker(1, 0, t(ts(1)), t(ts(1, 2)), "A", 12),
      Ticker(2, 0, t(ts(1)), t(ts(2, 1)), "A", 20)), in1)
    val r1 = runT(TransformRequest(
      "did:out", "out", ts(10), DatasetVocabulary(),
      transform(None -> q),
      Vector(mkInput("tickers", in1, in1, 3, wms = Seq(ts(2)))),
      nextOffset = 0, prevCheckpointPath = None,
      newCheckpointPath = s"$dir/cp1", newDataPath = s"$dir/out1.parquet"))
    assert(r1.newOffsetInterval.contains(OffsetInterval(0, 0)))
    assert(r1.newWatermark.contains(ts(2)))
    val o1 = readOut(s"$dir/out1.parquet").collect()
    assert(o1.length == 1)
    assert(o1(0).getAs[Timestamp]("event_time") == t(ts(1)))
    assert(o1(0).getAs[Int]("min") == 10 && o1(0).getAs[Int]("max") == 12)

    // run 2: no new data, watermark advances to day 4 → day-2 window closes.
    val r2 = runT(TransformRequest(
      "did:out", "out", ts(11), DatasetVocabulary(),
      transform(None -> q),
      Vector(mkInput("tickers", null, in1, 0, wms = Seq(ts(4)))),
      nextOffset = 1, prevCheckpointPath = Some(s"$dir/cp1"),
      newCheckpointPath = s"$dir/cp2", newDataPath = s"$dir/out2.parquet"))
    assert(r2.newOffsetInterval.contains(OffsetInterval(1, 1)))
    assert(r2.newWatermark.contains(ts(4)))
    val o2 = readOut(s"$dir/out2.parquet").collect()
    assert(o2.length == 1)
    assert(o2(0).getAs[Timestamp]("event_time") == t(ts(2)))
    assert(o2(0).getAs[Int]("min") == 20)

    // run 3: late row for closed day-2 window → silently dropped; a row in
    // the open day-4 window buffers; watermark day 5 closes day 4.
    val in3 = s"$dir/in3.parquet"
    writeSlice(Seq(
      Ticker(3, 0, t(ts(12)), t(ts(2, 5)), "A", 99), // 2 days late, dropped
      Ticker(4, 0, t(ts(12)), t(ts(4, 1)), "A", 40)), in3)
    val r3 = runT(TransformRequest(
      "did:out", "out", ts(12), DatasetVocabulary(),
      transform(None -> q),
      Vector(mkInput("tickers", in3, in3, 2, startOffset = 3, wms = Seq(ts(5)))),
      nextOffset = 2, prevCheckpointPath = Some(s"$dir/cp2"),
      newCheckpointPath = s"$dir/cp3", newDataPath = s"$dir/out3.parquet"))
    val o3 = readOut(s"$dir/out3.parquet").collect()
    assert(o3.length == 1)
    assert(o3(0).getAs[Timestamp]("event_time") == t(ts(4)))
    assert(o3(0).getAs[Int]("min") == 40 && o3(0).getAs[Int]("max") == 40)
    assert(r3.newWatermark.contains(ts(5)))
  }

  // ──────────────────────────────────────────────────────────────────────
  test("interval join: matches within window, watermark = min(l,r) - upper") {
    import spark.implicits._
    val dir = tmp()
    val ordersIn = s"$dir/orders.parquet"
    val shipIn = s"$dir/ship.parquet"
    writeSlice(Seq(
      OrderRow(0, 0, t(ts(1)), t(ts(1)), 1, 10),
      OrderRow(1, 0, t(ts(1)), t(ts(2)), 2, 20),
      OrderRow(2, 0, t(ts(1)), t(ts(3)), 3, 30)), ordersIn)
    writeSlice(Seq(
      Shipment(0, 0, t(ts(1)), t(ts(1, 4)), 1, 10),   // within 2 days of order 1
      Shipment(1, 0, t(ts(1)), t(ts(6)), 2, 20)), shipIn) // too late for order 2

    val q = """SELECT o.event_time, o.order_id, o.quantity,
              |  s.event_time as shipped_time, s.num_shipped
              |FROM orders o
              |LEFT JOIN shipments s
              |  ON o.order_id = s.order_id
              | AND s.event_time BETWEEN o.event_time
              |   AND o.event_time + INTERVAL '2' DAY""".stripMargin

    val r1 = runT(TransformRequest(
      "did:out", "out", ts(20), DatasetVocabulary(),
      transform(None -> q),
      Vector(
        mkInput("orders", ordersIn, ordersIn, 3, wms = Seq(ts(10))),
        mkInput("shipments", shipIn, shipIn, 2, wms = Seq(ts(11)))),
      nextOffset = 0, prevCheckpointPath = None,
      newCheckpointPath = s"$dir/cp1", newDataPath = s"$dir/out1.parquet"))
    // golden watermark algebra: min(10, 11) - 2 = day 8
    assert(r1.newWatermark.contains(ts(8)))
    val o1 = readOut(s"$dir/out1.parquet").orderBy("offset").collect()
    // all three orders closed (event_time + 2d <= day 8): order1 matched,
    // orders 2,3 emit NULL rows (no shipment within window)
    assert(o1.length == 3)
    val byId = o1.map(r => r.getAs[Long]("order_id") -> r).toMap
    assert(byId(1).getAs[Long]("num_shipped") == 10)
    assert(byId(2).getAs[Any]("shipped_time") == null)
    assert(byId(3).getAs[Any]("shipped_time") == null)
  }

  // ──────────────────────────────────────────────────────────────────────
  test("tumbling agg: corrections and retractions in the input are applied") {
    import spark.implicits._
    val dir = tmp()
    val q = """SELECT TUMBLE_START(event_time, INTERVAL '1' DAY) as event_time,
              |  symbol, min(price) as `min`, max(price) as `max`, count(*) as n
              |FROM tickers
              |GROUP BY TUMBLE(event_time, INTERVAL '1' DAY), symbol""".stripMargin
    val in1 = s"$dir/in1.parquet"
    writeSlice(Seq(
      Ticker(0, Op.Append, t(ts(1)), t(ts(1, 1)), "A", 10),
      Ticker(1, Op.Append, t(ts(1)), t(ts(1, 2)), "A", 99),
      // correct 99 → 12
      Ticker(2, Op.CorrectFrom, t(ts(1)), t(ts(1, 2)), "A", 99),
      Ticker(3, Op.CorrectTo, t(ts(1)), t(ts(1, 2)), "A", 12),
      // append then fully retract a third reading
      Ticker(4, Op.Append, t(ts(1)), t(ts(1, 3)), "A", 55),
      Ticker(5, Op.Retract, t(ts(1)), t(ts(1, 3)), "A", 55)), in1)
    runT(TransformRequest(
      "did:out", "out", ts(10), DatasetVocabulary(),
      transform(None -> q),
      Vector(mkInput("tickers", in1, in1, 6, wms = Seq(ts(2)))),
      nextOffset = 0, prevCheckpointPath = None,
      newCheckpointPath = s"$dir/cp1", newDataPath = s"$dir/out1.parquet"))
    val o = readOut(s"$dir/out1.parquet").collect()
    assert(o.length == 1)
    assert(o(0).getAs[Int]("min") == 10)
    assert(o(0).getAs[Int]("max") == 12)   // 99 corrected away, 55 retracted
    assert(o(0).getAs[Long]("n") == 2)
  }

  // ──────────────────────────────────────────────────────────────────────
  test("calendar tumbling: MONTH windows close on watermark (reference can't)") {
    import spark.implicits._
    val dir = tmp()
    val q = """SELECT TUMBLE_START(event_time, INTERVAL '1' MONTH) as event_time,
              |  symbol, count(*) as n, max(price) as max_price
              |FROM tickers
              |GROUP BY TUMBLE(event_time, INTERVAL '1' MONTH), symbol""".stripMargin
    def mts(month: Int, day: Int): Instant =
      Instant.parse(f"2000-$month%02d-$day%02dT00:00:00Z")

    val in1 = s"$dir/in1.parquet"
    writeSlice(Seq(
      Ticker(0, 0, t(ts(1)), t(Timestamp.from(mts(1, 5)).toInstant), "A", 10),
      Ticker(1, 0, t(ts(1)), t(Timestamp.from(mts(1, 20)).toInstant), "A", 30),
      Ticker(2, 0, t(ts(1)), t(Timestamp.from(mts(2, 3)).toInstant), "A", 50)), in1)
    // watermark mid-February → January window closes, February stays open
    val r1 = runT(TransformRequest(
      "did:out", "out", mts(3, 1), DatasetVocabulary(),
      transform(None -> q),
      Vector(mkInput("tickers", in1, in1, 3, wms = Seq(mts(2, 15)))),
      nextOffset = 0, prevCheckpointPath = None,
      newCheckpointPath = s"$dir/cp1", newDataPath = s"$dir/out1.parquet"))
    val o1 = readOut(s"$dir/out1.parquet").collect()
    assert(o1.length == 1)
    assert(o1(0).getAs[Timestamp]("event_time") == t(mts(1, 1)))
    assert(o1(0).getAs[Long]("n") == 2 && o1(0).getAs[Int]("max_price") == 30)

    // run 2: watermark into March → February window closes exactly once
    val r2 = runT(TransformRequest(
      "did:out", "out", mts(4, 1), DatasetVocabulary(),
      transform(None -> q),
      Vector(mkInput("tickers", null, in1, 0, wms = Seq(mts(3, 2)))),
      nextOffset = 1, prevCheckpointPath = Some(s"$dir/cp1"),
      newCheckpointPath = s"$dir/cp2", newDataPath = s"$dir/out2.parquet"))
    assert(r2.newOffsetInterval.contains(OffsetInterval(1, 1)))
    val o2 = readOut(s"$dir/out2.parquet").collect()
    assert(o2.length == 1)
    assert(o2(0).getAs[Timestamp]("event_time") == t(mts(2, 1)))
    assert(o2(0).getAs[Long]("n") == 1 && o2(0).getAs[Int]("max_price") == 50)
  }

  // ──────────────────────────────────────────────────────────────────────
  test("interval join: run 2 emits newly-closed orders once, no re-emission") {
    import spark.implicits._
    val dir = tmp()
    val ordersIn = s"$dir/orders.parquet"
    val shipIn = s"$dir/ship.parquet"
    writeSlice(Seq(
      OrderRow(0, 0, t(ts(1)), t(ts(1)), 1, 10),
      OrderRow(1, 0, t(ts(1)), t(ts(8)), 2, 20)), ordersIn)
    writeSlice(Seq(
      Shipment(0, 0, t(ts(1)), t(ts(1, 4)), 1, 10)), shipIn)
    val q = """SELECT o.event_time, o.order_id, s.num_shipped
              |FROM orders o
              |LEFT JOIN shipments s
              |  ON o.order_id = s.order_id
              | AND s.event_time BETWEEN o.event_time
              |   AND o.event_time + INTERVAL '2' DAY""".stripMargin
    // run 1: WMs (5,5) → threshold day 3: only order 1 closes.
    val r1 = runT(TransformRequest(
      "did:out", "out", ts(20), DatasetVocabulary(),
      transform(None -> q),
      Vector(
        mkInput("orders", ordersIn, ordersIn, 2, wms = Seq(ts(5))),
        mkInput("shipments", shipIn, shipIn, 1, wms = Seq(ts(5)))),
      nextOffset = 0, prevCheckpointPath = None,
      newCheckpointPath = s"$dir/cp1", newDataPath = s"$dir/out1.parquet"))
    assert(r1.newWatermark.contains(ts(3)))
    val o1 = readOut(s"$dir/out1.parquet").collect()
    assert(o1.map(_.getAs[Long]("order_id")).toSeq == Seq(1L))

    // run 2: a late shipment for order 2 arrives; WMs advance to (12,12)
    // → order 2 closes now, matched; order 1 NOT re-emitted.
    val ship2 = s"$dir/ship2.parquet"
    writeSlice(Seq(
      Shipment(1, 0, t(ts(9)), t(ts(9)), 2, 99)), ship2)
    val r2 = runT(TransformRequest(
      "did:out", "out", ts(21), DatasetVocabulary(),
      transform(None -> q),
      Vector(
        mkInput("orders", null, ordersIn, 0, wms = Seq(ts(12))),
        mkInput("shipments", ship2, ship2, 1, startOffset = 1, wms = Seq(ts(12)))),
      nextOffset = 1, prevCheckpointPath = Some(s"$dir/cp1"),
      newCheckpointPath = s"$dir/cp2", newDataPath = s"$dir/out2.parquet"))
    assert(r2.newWatermark.contains(ts(10)))
    val o2 = readOut(s"$dir/out2.parquet").collect()
    assert(o2.length == 1)
    assert(o2(0).getAs[Long]("order_id") == 2L)
    assert(o2(0).getAs[Long]("num_shipped") == 99L)
  }

  // ──────────────────────────────────────────────────────────────────────
  test("multi-step: interval join then tumbling agg composes watermark algebra") {
    import spark.implicits._
    val dir = tmp()
    val ordersIn = s"$dir/orders.parquet"
    val shipIn = s"$dir/ship.parquet"
    writeSlice(Seq(
      OrderRow(0, 0, t(ts(1)), t(ts(1)), 1, 10),
      OrderRow(1, 0, t(ts(1)), t(ts(2)), 2, 20),
      OrderRow(2, 0, t(ts(1)), t(ts(3)), 3, 30)), ordersIn)
    writeSlice(Seq(
      Shipment(0, 0, t(ts(1)), t(ts(1, 4)), 1, 10)), shipIn)

    val r1 = runT(TransformRequest(
      "did:out", "out", ts(20), DatasetVocabulary(),
      transform(
        Some("shipped") ->
          """SELECT o.event_time as event_time, o.order_id, s.num_shipped
            |FROM orders o
            |LEFT JOIN shipments s
            |  ON o.order_id = s.order_id
            | AND s.event_time BETWEEN o.event_time
            |   AND o.event_time + INTERVAL '2' DAY""".stripMargin,
        None ->
          """SELECT TUMBLE_START(event_time, INTERVAL '1' DAY) as event_time,
            |  count(num_shipped) as n_shipped, count(*) as n_orders
            |FROM shipped
            |GROUP BY TUMBLE(event_time, INTERVAL '1' DAY)""".stripMargin),
      Vector(
        mkInput("orders", ordersIn, ordersIn, 3, wms = Seq(ts(10))),
        mkInput("shipments", shipIn, shipIn, 1, wms = Seq(ts(11)))),
      nextOffset = 0, prevCheckpointPath = None,
      newCheckpointPath = s"$dir/cp1", newDataPath = s"$dir/out1.parquet"))
    // reported watermark = min(10,11) − 2d = day 8; all windows ≤ day 7 close
    assert(r1.newWatermark.contains(ts(8)))
    val o1 = readOut(s"$dir/out1.parquet").orderBy("event_time").collect()
    assert(o1.length == 3)
    assert(o1.map(_.getAs[Long]("n_orders")).toSeq == Seq(1L, 1L, 1L))
    assert(o1.map(_.getAs[Long]("n_shipped")).toSeq == Seq(1L, 0L, 0L))
  }

  // ──────────────────────────────────────────────────────────────────────
  test("as-of join: probe held back until build watermark covers it") {
    import spark.implicits._
    val dir = tmp()
    val tickIn = s"$dir/tick.parquet"
    val stockIn = s"$dir/stock.parquet"
    writeSlice(Seq(
      Ticker(0, 0, t(ts(1)), t(ts(1)), "A", 100),
      Ticker(1, 0, t(ts(1)), t(ts(2)), "A", 110),
      Ticker(2, 0, t(ts(1)), t(ts(4)), "A", 140)), tickIn)
    // build side: stocks_owned versions (symbol PK), watermark day 3
    graft.engine.ParquetSliceSink.writeSingleFile(
      spark.createDataset(Seq(
        Stock(0, 0, t(ts(1)), t(ts(1)), "A", 5),
        Stock(1, 0, t(ts(1)), t(ts(2)), "A", 7))).toDF(), stockIn)

    val q = """SELECT t.event_time, t.symbol, owned.volume as volume,
              |  t.price as current_price, owned.volume * t.price as current_value
              |FROM tickers as t
              |JOIN stocks_owned FOR SYSTEM_TIME AS OF t.event_time AS owned
              |  ON t.symbol = owned.symbol""".stripMargin

    val r1 = runT(TransformRequest(
      "did:out", "out", ts(20), DatasetVocabulary(),
      Transform(queries = Vector(SqlQueryStep(None, q)),
        temporalTables = Vector(TemporalTable("stocks_owned", Vector("symbol")))),
      Vector(
        mkInput("tickers", tickIn, tickIn, 3, wms = Seq(ts(5))),
        mkInput("stocks_owned", stockIn, stockIn, 2, wms = Seq(ts(3)))),
      nextOffset = 0, prevCheckpointPath = None,
      newCheckpointPath = s"$dir/cp1", newDataPath = s"$dir/out1.parquet"))
    assert(r1.newWatermark.contains(ts(3))) // min(probe 5, build 3)
    val o1 = readOut(s"$dir/out1.parquet").orderBy("offset").collect()
    // ticker at day 4 held back (build wm = day 3); day1→vol5, day2→vol7
    assert(o1.length == 2)
    assert(o1.map(_.getAs[Int]("volume")).toSeq == Seq(5, 7))
    assert(o1.map(_.getAs[Int]("current_value")).toSeq == Seq(500, 770))

    // run 2: build watermark advances past day 4 → held-back probe emits.
    val r2 = runT(TransformRequest(
      "did:out", "out", ts(21), DatasetVocabulary(),
      Transform(queries = Vector(SqlQueryStep(None, q)),
        temporalTables = Vector(TemporalTable("stocks_owned", Vector("symbol")))),
      Vector(
        mkInput("tickers", null, tickIn, 0, wms = Seq(ts(5))),
        mkInput("stocks_owned", null, stockIn, 0, wms = Seq(ts(5)))),
      nextOffset = 2, prevCheckpointPath = Some(s"$dir/cp1"),
      newCheckpointPath = s"$dir/cp2", newDataPath = s"$dir/out2.parquet"))
    val o2 = readOut(s"$dir/out2.parquet").collect()
    assert(o2.length == 1)
    assert(o2(0).getAs[Int]("current_price") == 140)
    assert(o2(0).getAs[Int]("volume") == 7)
    assert(r2.newWatermark.contains(ts(5)))
  }

  // ──────────────────────────────────────────────────────────────────────
  test("as-of join: changelog build side (correct-to supersedes, retract tombstones)") {
    import spark.implicits._
    val dir = tmp()
    val tickIn = s"$dir/tick.parquet"
    val stockIn = s"$dir/stock.parquet"
    writeSlice(Seq(
      Ticker(0, 0, t(ts(1)), t(ts(1, 12)), "A", 100), // after v1 → vol 5
      Ticker(1, 0, t(ts(1)), t(ts(2, 12)), "A", 110), // after correction → vol 7
      Ticker(2, 0, t(ts(1)), t(ts(3, 12)), "A", 120)), tickIn) // after retract → dropped
    writeSlice(Seq(
      Stock(0, Op.Append, t(ts(1)), t(ts(1)), "A", 5),
      Stock(1, Op.CorrectFrom, t(ts(1)), t(ts(2)), "A", 5),
      Stock(2, Op.CorrectTo, t(ts(1)), t(ts(2)), "A", 7),
      Stock(3, Op.Retract, t(ts(1)), t(ts(3)), "A", 7)), stockIn)

    val q = """SELECT t.event_time, t.symbol, owned.volume as volume
              |FROM tickers as t
              |JOIN stocks_owned FOR SYSTEM_TIME AS OF t.event_time AS owned
              |  ON t.symbol = owned.symbol""".stripMargin
    runT(TransformRequest(
      "did:out", "out", ts(20), DatasetVocabulary(),
      Transform(queries = Vector(SqlQueryStep(None, q)),
        temporalTables = Vector(TemporalTable("stocks_owned", Vector("symbol")))),
      Vector(
        mkInput("tickers", tickIn, tickIn, 3, wms = Seq(ts(10))),
        mkInput("stocks_owned", stockIn, stockIn, 4, wms = Seq(ts(10)))),
      nextOffset = 0, prevCheckpointPath = None,
      newCheckpointPath = s"$dir/cp1", newDataPath = s"$dir/out1.parquet"))
    val out = readOut(s"$dir/out1.parquet").orderBy("offset").collect()
    assert(out.length == 2) // probe after retract is dropped
    assert(out.map(_.getAs[Int]("volume")).toSeq == Seq(5, 7))
  }

  // ──────────────────────────────────────────────────────────────────────
  test("as-of join: LATERAL TABLE form with dotted name and key equality in WHERE") {
    import spark.implicits._
    val dir = tmp()
    val tickIn = s"$dir/tick.parquet"
    val stockIn = s"$dir/stock.parquet"
    writeSlice(Seq(
      Ticker(0, 0, t(ts(1)), t(ts(1)), "A", 100),
      Ticker(1, 0, t(ts(1)), t(ts(2)), "A", 110)), tickIn)
    writeSlice(Seq(
      Stock(0, 0, t(ts(1)), t(ts(1)), "A", 5),
      Stock(1, 0, t(ts(1)), t(ts(2)), "A", 7)), stockIn)
    // reference EngineJoinStreamToTemporalTableTest.scala:75-85 query shape:
    // dotted temporal-table name, key equality only in the WHERE clause.
    val q = """SELECT
              |  t.event_time,
              |  t.symbol,
              |  owned.volume as volume,
              |  t.price as current_price,
              |  owned.volume * t.price as current_value
              |FROM
              |  tickers as t,
              |  LATERAL TABLE (`stocks.owned`(t.event_time)) AS owned
              |WHERE t.symbol = owned.symbol""".stripMargin
    val r1 = runT(TransformRequest(
      "did:out", "out", ts(20), DatasetVocabulary(),
      Transform(queries = Vector(SqlQueryStep(None, q)),
        temporalTables = Vector(TemporalTable("stocks.owned", Vector("symbol")))),
      Vector(
        mkInput("tickers", tickIn, tickIn, 2, wms = Seq(ts(5)))
          .copy(queryAlias = "tickers"),
        mkInput("stocks_owned", stockIn, stockIn, 2, wms = Seq(ts(5)))
          .copy(queryAlias = "stocks.owned")),
      nextOffset = 0, prevCheckpointPath = None,
      newCheckpointPath = s"$dir/cp1", newDataPath = s"$dir/out1.parquet"))
    assert(r1.newOffsetInterval.contains(OffsetInterval(0, 1)))
    val o1 = readOut(s"$dir/out1.parquet").orderBy("offset").collect()
    assert(o1.map(_.getAs[Int]("volume")).toSeq == Seq(5, 7))
    assert(o1.map(_.getAs[Int]("current_value")).toSeq == Seq(500, 770))
  }

  test("as-of join: quoted aliases, alias prefixing a column name, literal trap") {
    // Round-3 finding: the textual step rewrite blind-replaced `alias.`
    // prefixes — a quoted alias broke extraction and a string literal
    // containing "owned." was corrupted into "__build_…". Plan-based
    // rewriting must survive all three hazards at once: backtick-quoted
    // aliases, a probe alias (`symb`) that prefixes a column name
    // (`symbol`), and a literal spelling of "owned.volume".
    import spark.implicits._
    val dir = tmp()
    val tickIn = s"$dir/tick.parquet"
    val stockIn = s"$dir/stock.parquet"
    writeSlice(Seq(
      Ticker(0, 0, t(ts(1)), t(ts(1)), "A", 100),
      Ticker(1, 0, t(ts(1)), t(ts(2)), "A", 110)), tickIn)
    writeSlice(Seq(
      Stock(0, 0, t(ts(1)), t(ts(1)), "A", 5),
      Stock(1, 0, t(ts(1)), t(ts(2)), "A", 7)), stockIn)
    val q = """SELECT `symb`.event_time, `symb`.symbol,
              |  `owned`.volume as volume, 'owned.volume' as tag
              |FROM tickers as `symb`
              |JOIN stocks_owned FOR SYSTEM_TIME AS OF `symb`.event_time AS `owned`
              |  ON `symb`.symbol = `owned`.symbol""".stripMargin
    val r1 = runT(TransformRequest(
      "did:out", "out", ts(20), DatasetVocabulary(),
      Transform(queries = Vector(SqlQueryStep(None, q)),
        temporalTables = Vector(TemporalTable("stocks_owned", Vector("symbol")))),
      Vector(
        mkInput("tickers", tickIn, tickIn, 2, wms = Seq(ts(5))),
        mkInput("stocks_owned", stockIn, stockIn, 2, wms = Seq(ts(5)))),
      nextOffset = 0, prevCheckpointPath = None,
      newCheckpointPath = s"$dir/cp1", newDataPath = s"$dir/out1.parquet"))
    assert(r1.newOffsetInterval.contains(OffsetInterval(0, 1)))
    val o1 = readOut(s"$dir/out1.parquet").orderBy("offset").collect()
    assert(o1.map(_.getAs[Int]("volume")).toSeq == Seq(5, 7))
    assert(o1.map(_.getAs[String]("tag")).distinct.toSeq == Seq("owned.volume"))
  }

  test("as-of join: empty or composite primary key → InvalidQuery") {
    import spark.implicits._
    val dir = tmp()
    val tickIn = s"$dir/tick.parquet"
    val stockIn = s"$dir/stock.parquet"
    writeSlice(Seq(Ticker(0, 0, t(ts(1)), t(ts(1)), "A", 100)), tickIn)
    writeSlice(Seq(Stock(0, 0, t(ts(1)), t(ts(1)), "A", 5)), stockIn)
    val q = """SELECT t.event_time, t.symbol, owned.volume as volume
              |FROM tickers as t
              |JOIN stocks_owned FOR SYSTEM_TIME AS OF t.event_time AS owned
              |  ON t.symbol = owned.symbol""".stripMargin
    def run(pk: Vector[String]): TransformResponse =
      new TransformEngine(spark).executeTransform(TransformRequest(
        "did:out", "out", ts(20), DatasetVocabulary(),
        Transform(queries = Vector(SqlQueryStep(None, q)),
          temporalTables = Vector(TemporalTable("stocks_owned", pk))),
        Vector(
          mkInput("tickers", tickIn, tickIn, 1, wms = Seq(ts(5))),
          mkInput("stocks_owned", stockIn, stockIn, 1, wms = Seq(ts(5)))),
        nextOffset = 0, prevCheckpointPath = None,
        newCheckpointPath = s"$dir/cp_${pk.length}",
        newDataPath = s"$dir/out_${pk.length}.parquet"))
    // mirrors reference TransformEngine.scala:180-198: no PK and composite
    // PK are both hard errors, not guesses.
    run(Vector.empty) match {
      case TransformResponse.InvalidQuery(m) =>
        assert(m.contains("primary key"))
      case other => fail(s"expected InvalidQuery, got $other")
    }
    run(Vector("symbol", "event_time")) match {
      case TransformResponse.InvalidQuery(m) =>
        assert(m.toLowerCase.contains("composite"))
      case other => fail(s"expected InvalidQuery, got $other")
    }
  }

  // ──────────────────────────────────────────────────────────────────────
  test("top-n: changelog diff emits +I then -U/+U corrections across runs") {
    import spark.implicits._
    val dir = tmp()
    val vocab = DatasetVocabulary(eventTimeColumn = "placed_at")
    val inVocab = DatasetVocabulary(eventTimeColumn = "match_time")
    val q = """SELECT placed_at, place, match_time, player_name, score FROM (
              |  SELECT match_time as placed_at, match_time, player_name, score,
              |    row_number() OVER (ORDER BY score desc) AS place
              |  FROM match_scores)
              |WHERE place <= 2""".stripMargin

    val in1 = s"$dir/in1.parquet"
    writeSlice(Seq(
      MatchScore(0, 0, t(ts(1)), t(ts(1)), "Alice", 100),
      MatchScore(1, 0, t(ts(1)), t(ts(1)), "Bob", 80)), in1)
    val r1 = runT(TransformRequest(
      "did:out", "out", ts(10), vocab,
      transform(None -> q),
      Vector(mkInput("match_scores", in1, in1, 2, wms = Seq(ts(1)), vocab = inVocab)),
      nextOffset = 0, prevCheckpointPath = None,
      newCheckpointPath = s"$dir/cp1", newDataPath = s"$dir/out1.parquet"))
    assert(r1.newOffsetInterval.contains(OffsetInterval(0, 1)))
    val o1 = readOut(s"$dir/out1.parquet").orderBy("offset").collect()
    assert(o1.map(_.getAs[Int]("op")).toSeq == Seq(0, 0))
    assert(o1.map(_.getAs[String]("player_name")).toSeq == Seq("Alice", "Bob"))

    // run 2: Charlie overtakes → place1 correct Alice→Charlie, place2 Bob→Alice
    val in2 = s"$dir/in2.parquet"
    writeSlice(Seq(
      MatchScore(2, 0, t(ts(2)), t(ts(2)), "Charlie", 120)), in2)
    val r2 = runT(TransformRequest(
      "did:out", "out", ts(11), vocab,
      transform(None -> q),
      Vector(mkInput("match_scores", in2, in2, 1, startOffset = 2,
        wms = Seq(ts(2)), vocab = inVocab)),
      nextOffset = 2, prevCheckpointPath = Some(s"$dir/cp1"),
      newCheckpointPath = s"$dir/cp2", newDataPath = s"$dir/out2.parquet"))
    assert(r2.newOffsetInterval.contains(OffsetInterval(2, 5)))
    val o2 = readOut(s"$dir/out2.parquet").orderBy("offset").collect()
    assert(o2.map(_.getAs[Int]("op")).toSeq == Seq(2, 3, 2, 3))
    assert(o2.map(_.getAs[String]("player_name")).toSeq ==
      Seq("Alice", "Charlie", "Bob", "Alice"))
  }

  // ──────────────────────────────────────────────────────────────────────
  test("top-n: CTE shadowing the input alias still diffs correctly (no narrowing)") {
    // Round-3 ADVICE: a WITH clause that shadows the input alias and
    // re-keys the partition column (upper(symbol)) hid the re-aliasing from
    // the RankTouch scan — narrowing then matched raw lowercase slice
    // values against computed uppercase snapshot partitions and emitted a
    // bogus +I instead of -U/+U. WITH-queries must take the full recompute.
    import spark.implicits._
    val dir = tmp()
    val q = """WITH tickers AS
              |  (SELECT event_time, upper(symbol) AS symbol, price FROM tickers)
              |SELECT event_time, symbol, price, rn FROM (
              |  SELECT event_time, symbol, price,
              |    row_number() OVER (PARTITION BY symbol ORDER BY price DESC) AS rn
              |  FROM tickers) WHERE rn = 1""".stripMargin
    val in1 = s"$dir/in1.parquet"
    writeSlice(Seq(
      Ticker(0, 0, t(ts(1)), t(ts(1)), "a", 10),
      Ticker(1, 0, t(ts(1)), t(ts(1)), "b", 20)), in1)
    val r1 = runT(TransformRequest(
      "did:out", "out", ts(10), DatasetVocabulary(),
      transform(None -> q),
      Vector(mkInput("tickers", in1, in1, 2, wms = Seq(ts(1)))),
      nextOffset = 0, prevCheckpointPath = None,
      newCheckpointPath = s"$dir/cp1", newDataPath = s"$dir/out1.parquet"))
    assert(r1.newOffsetInterval.contains(OffsetInterval(0, 1)))
    val o1 = readOut(s"$dir/out1.parquet").orderBy("offset").collect()
    assert(o1.map(_.getAs[Int]("op")).toSeq == Seq(0, 0))
    assert(o1.map(_.getAs[String]("symbol")).toSeq == Seq("A", "B"))

    val in2 = s"$dir/in2.parquet"
    writeSlice(Seq(Ticker(2, 0, t(ts(2)), t(ts(2)), "a", 30)), in2)
    val r2 = runT(TransformRequest(
      "did:out", "out", ts(11), DatasetVocabulary(),
      transform(None -> q),
      Vector(mkInput("tickers", in2, in2, 1, startOffset = 2, wms = Seq(ts(2)))),
      nextOffset = 2, prevCheckpointPath = Some(s"$dir/cp1"),
      newCheckpointPath = s"$dir/cp2", newDataPath = s"$dir/out2.parquet"))
    assert(r2.newOffsetInterval.contains(OffsetInterval(2, 3)))
    val o2 = readOut(s"$dir/out2.parquet").orderBy("offset").collect()
    // partition A corrected: -U (A,10) then +U (A,30); B untouched
    assert(o2.map(_.getAs[Int]("op")).toSeq == Seq(2, 3))
    assert(o2.map(r => (r.getAs[String]("symbol"), r.getAs[Int]("price"))).toSeq ==
      Seq(("A", 10), ("A", 30)))
  }

  // ──────────────────────────────────────────────────────────────────────
  test("map: multiple input files in one run are read in offset order") {
    import spark.implicits._
    val dir = tmp()
    val in1 = s"$dir/a.parquet"
    val in2 = s"$dir/b.parquet"
    writeSlice(Seq(
      Ticker(0, 0, t(ts(1)), t(ts(1)), "A", 1),
      Ticker(1, 0, t(ts(1)), t(ts(2)), "B", 2)), in1)
    writeSlice(Seq(
      Ticker(2, 0, t(ts(2)), t(ts(3)), "C", 3)), in2)
    val req = TransformRequest(
      "did:out", "out", ts(5), DatasetVocabulary(),
      transform(None -> "SELECT op, event_time, symbol, price FROM tickers"),
      Vector(TransformRequestInput(
        "did:t", "t", "tickers", DatasetVocabulary(),
        Some(OffsetInterval(0, 2)), Vector(in1, in2), in1,
        Vector(RequestWatermark(ts(3), ts(3))))),
      nextOffset = 0, prevCheckpointPath = None,
      newCheckpointPath = s"$dir/cp1", newDataPath = s"$dir/out1.parquet")
    val resp = runT(req)
    assert(resp.newOffsetInterval.contains(OffsetInterval(0, 2)))
    val syms = readOut(s"$dir/out1.parquet").orderBy("offset")
      .select("symbol").collect().map(_.getString(0)).toSeq
    assert(syms == Seq("A", "B", "C"))
  }

  // ──────────────────────────────────────────────────────────────────────
  test("top-n: current_watermark() filter excludes rows beyond the watermark") {
    import spark.implicits._
    val dir = tmp()
    val vocab = DatasetVocabulary(eventTimeColumn = "placed_at")
    val inVocab = DatasetVocabulary(eventTimeColumn = "match_time")
    val q = """SELECT placed_at, place, match_time, player_name, score FROM (
              |  SELECT match_time as placed_at, match_time, player_name, score,
              |    row_number() OVER (ORDER BY score desc) AS place
              |  FROM match_scores
              |  WHERE match_time <= current_watermark(match_time))
              |WHERE place <= 2""".stripMargin
    val in1 = s"$dir/in1.parquet"
    writeSlice(Seq(
      MatchScore(0, 0, t(ts(1)), t(ts(1)), "Alice", 100),
      MatchScore(1, 0, t(ts(1)), t(ts(2)), "Zoe", 999)), in1) // beyond WM
    runT(TransformRequest(
      "did:out", "out", ts(10), vocab,
      transform(None -> q),
      Vector(mkInput("match_scores", in1, in1, 2, wms = Seq(ts(1)), vocab = inVocab)),
      nextOffset = 0, prevCheckpointPath = None,
      newCheckpointPath = s"$dir/cp1", newDataPath = s"$dir/out1.parquet"))
    val names = readOut(s"$dir/out1.parquet")
      .select("player_name").collect().map(_.getString(0)).toSeq
    assert(names == Seq("Alice")) // Zoe held out by the watermark literal
  }

  // ──────────────────────────────────────────────────────────────────────
  // Plan-based classification goldens (round-2): the same semantics must
  // hold regardless of SQL spelling, and unsupported stateful compositions
  // must be refused, not guessed at.
  // ──────────────────────────────────────────────────────────────────────
  test("interval join spelled >=/<= classifies and gates like BETWEEN") {
    import spark.implicits._
    val dir = tmp()
    val ordersIn = s"$dir/orders.parquet"
    val shipIn = s"$dir/ship.parquet"
    writeSlice(Seq(
      OrderRow(0, 0, t(ts(1)), t(ts(1)), 1, 10),
      OrderRow(1, 0, t(ts(1)), t(ts(8)), 2, 20)), ordersIn)
    writeSlice(Seq(
      Shipment(0, 0, t(ts(1)), t(ts(1, 4)), 1, 10)), shipIn)
    // reference EngineJoinStreamToStreamTest semantics, non-BETWEEN spelling
    val q = """SELECT o.event_time, o.order_id, s.num_shipped
              |FROM orders o
              |LEFT JOIN shipments s
              |  ON o.order_id = s.order_id
              | AND s.event_time >= o.event_time
              | AND s.event_time <= o.event_time + INTERVAL '2' DAY""".stripMargin
    val r1 = runT(TransformRequest(
      "did:out", "out", ts(20), DatasetVocabulary(),
      transform(None -> q),
      Vector(
        mkInput("orders", ordersIn, ordersIn, 2, wms = Seq(ts(5))),
        mkInput("shipments", shipIn, shipIn, 1, wms = Seq(ts(5)))),
      nextOffset = 0, prevCheckpointPath = None,
      newCheckpointPath = s"$dir/cp1", newDataPath = s"$dir/out1.parquet"))
    assert(r1.newWatermark.contains(ts(3))) // min(5,5) − 2d: gating IS active
    val o1 = readOut(s"$dir/out1.parquet").collect()
    assert(o1.map(_.getAs[Long]("order_id")).toSeq == Seq(1L))

    // run 2: late shipment for order 2; order 1 must NOT re-emit.
    val ship2 = s"$dir/ship2.parquet"
    writeSlice(Seq(
      Shipment(1, 0, t(ts(9)), t(ts(9)), 2, 99)), ship2)
    val r2 = runT(TransformRequest(
      "did:out", "out", ts(21), DatasetVocabulary(),
      transform(None -> q),
      Vector(
        mkInput("orders", null, ordersIn, 0, wms = Seq(ts(12))),
        mkInput("shipments", ship2, ship2, 1, startOffset = 1, wms = Seq(ts(12)))),
      nextOffset = 1, prevCheckpointPath = Some(s"$dir/cp1"),
      newCheckpointPath = s"$dir/cp2", newDataPath = s"$dir/out2.parquet"))
    assert(r2.newWatermark.contains(ts(10)))
    val o2 = readOut(s"$dir/out2.parquet").collect()
    assert(o2.length == 1)
    assert(o2(0).getAs[Long]("order_id") == 2L)
    assert(o2(0).getAs[Long]("num_shipped") == 99L)
  }

  test("partitioned dedup-latest via row_number diffs per key, not per rank") {
    import spark.implicits._
    val dir = tmp()
    val q = """SELECT event_time, symbol, price, rn FROM (
              |  SELECT event_time, symbol, price,
              |    row_number() OVER (PARTITION BY symbol ORDER BY event_time DESC) AS rn
              |  FROM tickers)
              |WHERE rn = 1""".stripMargin
    val in1 = s"$dir/in1.parquet"
    writeSlice(Seq(
      Ticker(0, 0, t(ts(1)), t(ts(1)), "A", 10),
      Ticker(1, 0, t(ts(1)), t(ts(1)), "B", 20)), in1)
    val r1 = runT(TransformRequest(
      "did:out", "out", ts(10), DatasetVocabulary(),
      transform(None -> q),
      Vector(mkInput("tickers", in1, in1, 2, wms = Seq(ts(1)))),
      nextOffset = 0, prevCheckpointPath = None,
      newCheckpointPath = s"$dir/cp1", newDataPath = s"$dir/out1.parquet"))
    assert(r1.newOffsetInterval.contains(OffsetInterval(0, 1)))
    val o1 = readOut(s"$dir/out1.parquet").orderBy("offset").collect()
    assert(o1.map(_.getAs[Int]("op")).toSeq == Seq(0, 0))

    // run 2: A gets a newer price; B unchanged; C appears. A partitioned
    // diff must emit exactly (-U,+U) for A and +I for C — a rank-only diff
    // would cross-match rows between partitions and multiply the changelog.
    val in2 = s"$dir/in2.parquet"
    writeSlice(Seq(
      Ticker(2, 0, t(ts(2)), t(ts(2)), "A", 11),
      Ticker(3, 0, t(ts(2)), t(ts(2)), "C", 30)), in2)
    runT(TransformRequest(
      "did:out", "out", ts(11), DatasetVocabulary(),
      transform(None -> q),
      Vector(mkInput("tickers", in2, in2, 2, startOffset = 2, wms = Seq(ts(2)))),
      nextOffset = 2, prevCheckpointPath = Some(s"$dir/cp1"),
      newCheckpointPath = s"$dir/cp2", newDataPath = s"$dir/out2.parquet"))
    val o2 = readOut(s"$dir/out2.parquet").orderBy("offset").collect()
    val byOp = o2.map(r => (r.getAs[String]("symbol"), r.getAs[Int]("op"),
      r.getAs[Int]("price"))).toSeq
    assert(byOp == Seq(("A", Op.CorrectFrom, 10), ("A", Op.CorrectTo, 11),
      ("C", Op.Append, 30)))
  }

  test("non-windowed GROUP BY becomes an updating changelog, not per-slice rows") {
    import spark.implicits._
    val dir = tmp()
    // ADVICE round-1: this used to be misclassified as stateless and emitted
    // per-slice partial aggregates with no retractions.
    val q = """SELECT max(event_time) as event_time, symbol,
              |  count(*) as n, sum(price) as total
              |FROM tickers GROUP BY symbol""".stripMargin
    val in1 = s"$dir/in1.parquet"
    writeSlice(Seq(
      Ticker(0, 0, t(ts(1)), t(ts(1)), "A", 10),
      Ticker(1, 0, t(ts(1)), t(ts(1)), "B", 20)), in1)
    runT(TransformRequest(
      "did:out", "out", ts(10), DatasetVocabulary(),
      transform(None -> q),
      Vector(mkInput("tickers", in1, in1, 2, wms = Seq(ts(1)))),
      nextOffset = 0, prevCheckpointPath = None,
      newCheckpointPath = s"$dir/cp1", newDataPath = s"$dir/out1.parquet"))
    val o1 = readOut(s"$dir/out1.parquet").orderBy("offset").collect()
    assert(o1.map(_.getAs[Int]("op")).toSeq == Seq(0, 0))

    // run 2: another A row → A's aggregate corrects (-U/+U with the FULL
    // history total, not a per-slice partial); B silent; C appends.
    val in2 = s"$dir/in2.parquet"
    writeSlice(Seq(
      Ticker(2, 0, t(ts(2)), t(ts(2)), "A", 5),
      Ticker(3, 0, t(ts(2)), t(ts(2)), "C", 7)), in2)
    runT(TransformRequest(
      "did:out", "out", ts(11), DatasetVocabulary(),
      transform(None -> q),
      Vector(mkInput("tickers", in2, in2, 2, startOffset = 2, wms = Seq(ts(2)))),
      nextOffset = 2, prevCheckpointPath = Some(s"$dir/cp1"),
      newCheckpointPath = s"$dir/cp2", newDataPath = s"$dir/out2.parquet"))
    val o2 = readOut(s"$dir/out2.parquet").orderBy("offset").collect()
    val rows = o2.map(r => (r.getAs[String]("symbol"), r.getAs[Int]("op"),
      r.getAs[Long]("n"), r.getAs[Long]("total"))).toSeq
    assert(rows == Seq(
      ("A", Op.CorrectFrom, 1L, 10L), ("A", Op.CorrectTo, 2L, 15L),
      ("C", Op.Append, 1L, 7L)))
  }

  test("global aggregate diffs as a single-group changelog; no-change run emits nothing") {
    import spark.implicits._
    val dir = tmp()
    val q = "SELECT max(event_time) as event_time, count(*) as n, sum(price) as total FROM tickers"
    val in1 = s"$dir/in1.parquet"
    writeSlice(Seq(
      Ticker(0, 0, t(ts(1)), t(ts(1)), "A", 10),
      Ticker(1, 0, t(ts(1)), t(ts(2)), "B", 20)), in1)
    val r1 = runT(TransformRequest(
      "did:out", "out", ts(10), DatasetVocabulary(),
      transform(None -> q),
      Vector(mkInput("tickers", in1, in1, 2, wms = Seq(ts(2)))),
      nextOffset = 0, prevCheckpointPath = None,
      newCheckpointPath = s"$dir/cp1", newDataPath = s"$dir/out1.parquet"))
    assert(r1.newOffsetInterval.contains(OffsetInterval(0, 0)))
    val o1 = readOut(s"$dir/out1.parquet").collect()
    assert(o1.length == 1 && o1(0).getAs[Long]("total") == 30L)

    // run 2: watermark-only advance, no new rows → the snapshot is
    // unchanged and NOTHING re-emits.
    val r2 = runT(TransformRequest(
      "did:out", "out", ts(11), DatasetVocabulary(),
      transform(None -> q),
      Vector(mkInput("tickers", null, in1, 0, wms = Seq(ts(3)))),
      nextOffset = 1, prevCheckpointPath = Some(s"$dir/cp1"),
      newCheckpointPath = s"$dir/cp2", newDataPath = s"$dir/out2.parquet"))
    assert(r2.newOffsetInterval.isEmpty)

    // run 3: one new row → exactly one -U/+U pair with full-history totals.
    val in3 = s"$dir/in3.parquet"
    writeSlice(Seq(Ticker(2, 0, t(ts(4)), t(ts(4)), "A", 5)), in3)
    runT(TransformRequest(
      "did:out", "out", ts(12), DatasetVocabulary(),
      transform(None -> q),
      Vector(mkInput("tickers", in3, in3, 1, startOffset = 2, wms = Seq(ts(4)))),
      nextOffset = 1, prevCheckpointPath = Some(s"$dir/cp2"),
      newCheckpointPath = s"$dir/cp3", newDataPath = s"$dir/out3.parquet"))
    val o3 = readOut(s"$dir/out3.parquet").orderBy("offset").collect()
    assert(o3.map(r => (r.getAs[Int]("op"), r.getAs[Long]("n"),
      r.getAs[Long]("total"))).toSeq ==
      Seq((Op.CorrectFrom, 2L, 30L), (Op.CorrectTo, 3L, 35L)))
  }

  test("aggregate fast path flips to recompute when a retraction arrives") {
    import spark.implicits._
    val dir = tmp()
    // Mergeable shape → runs 1 is the incremental-merge path; run 2 carries
    // a retraction → net-and-recompute path reads the SAME snapshot state;
    // run 3 stays on recompute (retractive is sticky in the ledger). Totals
    // must be full-history-correct across the path flip.
    val q = """SELECT max(event_time) as event_time, symbol,
              |  count(*) as n, sum(price) as total
              |FROM tickers GROUP BY symbol""".stripMargin
    val in1 = s"$dir/in1.parquet"
    writeSlice(Seq(
      Ticker(0, Op.Append, t(ts(1)), t(ts(1)), "A", 10),
      Ticker(1, Op.Append, t(ts(1)), t(ts(1)), "B", 20)), in1)
    runT(TransformRequest(
      "did:out", "out", ts(10), DatasetVocabulary(),
      transform(None -> q),
      Vector(mkInput("tickers", in1, in1, 2, wms = Seq(ts(1)))),
      nextOffset = 0, prevCheckpointPath = None,
      newCheckpointPath = s"$dir/cp1", newDataPath = s"$dir/out1.parquet"))
    assert(readOut(s"$dir/out1.parquet").collect().length == 2)

    // run 2: retract A@10 and append A@3 — A's aggregate corrects to the
    // netted history (n=1, total=3), not a partial.
    val in2 = s"$dir/in2.parquet"
    writeSlice(Seq(
      Ticker(2, Op.Retract, t(ts(2)), t(ts(1)), "A", 10),
      Ticker(3, Op.Append, t(ts(2)), t(ts(2)), "A", 3)), in2)
    runT(TransformRequest(
      "did:out", "out", ts(11), DatasetVocabulary(),
      transform(None -> q),
      Vector(mkInput("tickers", in2, in2, 2, startOffset = 2, wms = Seq(ts(2)))),
      nextOffset = 2, prevCheckpointPath = Some(s"$dir/cp1"),
      newCheckpointPath = s"$dir/cp2", newDataPath = s"$dir/out2.parquet"))
    val o2 = readOut(s"$dir/out2.parquet").orderBy("offset").collect()
    assert(o2.map(r => (r.getAs[String]("symbol"), r.getAs[Int]("op"),
      r.getAs[Long]("n"), r.getAs[Long]("total"))).toSeq == Seq(
      ("A", Op.CorrectFrom, 1L, 10L), ("A", Op.CorrectTo, 1L, 3L)))

    // run 3: plain append for A — still recompute (sticky), still exact.
    val in3 = s"$dir/in3.parquet"
    writeSlice(Seq(Ticker(4, Op.Append, t(ts(3)), t(ts(3)), "A", 2)), in3)
    runT(TransformRequest(
      "did:out", "out", ts(12), DatasetVocabulary(),
      transform(None -> q),
      Vector(mkInput("tickers", in3, in3, 1, startOffset = 4, wms = Seq(ts(3)))),
      nextOffset = 4, prevCheckpointPath = Some(s"$dir/cp2"),
      newCheckpointPath = s"$dir/cp3", newDataPath = s"$dir/out3.parquet"))
    val o3 = readOut(s"$dir/out3.parquet").orderBy("offset").collect()
    assert(o3.map(r => (r.getAs[String]("symbol"), r.getAs[Int]("op"),
      r.getAs[Long]("n"), r.getAs[Long]("total"))).toSeq == Seq(
      ("A", Op.CorrectFrom, 1L, 3L), ("A", Op.CorrectTo, 2L, 5L)))
  }

  test("invertible aggregate rides retractions on the merge path") {
    import spark.implicits._
    val dir = tmp()
    // sum/count/avg only (no min/max, no joins) → the spec is invertible:
    // retractions subtract through the merge algebra instead of flipping
    // to recompute. Covered: a correction pair, full group death (-D), and
    // rebirth from fresh partials. The agg_partials state file existing in
    // every retractive run's checkpoint proves the merge path ran (the
    // recompute path writes only the visible snapshot).
    val q = """SELECT event_time, symbol, count(*) as n, sum(price) as total,
              |  avg(price) as mean
              |FROM tickers GROUP BY event_time, symbol""".stripMargin
    def drive(run: Int, rows: Seq[Ticker], nextOff: Long): Seq[(String, Int, Long, Long, Double)] = {
      val in = s"$dir/in$run.parquet"
      writeSlice(rows, in)
      runT(TransformRequest(
        "did:out", "out", ts(run + 10), DatasetVocabulary(),
        transform(None -> q),
        Vector(mkInput("tickers", in, in, rows.length,
          startOffset = rows.head.offset, wms = Seq(ts(run)))),
        nextOffset = nextOff,
        prevCheckpointPath = if (run == 1) None else Some(s"$dir/cp${run - 1}"),
        newCheckpointPath = s"$dir/cp$run", newDataPath = s"$dir/out$run.parquet"))
      readOut(s"$dir/out$run.parquet").orderBy("offset").collect().toSeq
        .map(r => (r.getAs[String]("symbol"), r.getAs[Int]("op"),
          r.getAs[Long]("n"), r.getAs[Long]("total"), r.getAs[Double]("mean")))
    }
    val o1 = drive(1, Seq(
      Ticker(0, Op.Append, t(ts(1)), t(ts(1)), "A", 10),
      Ticker(1, Op.Append, t(ts(1)), t(ts(1)), "A", 4),
      Ticker(2, Op.Append, t(ts(1)), t(ts(1)), "B", 20)), 0)
    assert(o1 == Seq(("A", Op.Append, 2L, 14L, 7.0), ("B", Op.Append, 1L, 20L, 20.0)))

    // run 2: retract A@4 (payload replayed), append B@5 — corrections only
    val o2 = drive(2, Seq(
      Ticker(3, Op.Retract, t(ts(2)), t(ts(1)), "A", 4),
      Ticker(4, Op.Append, t(ts(2)), t(ts(1)), "B", 5)), 2)
    assert(o2 == Seq(
      ("A", Op.CorrectFrom, 2L, 14L, 7.0), ("A", Op.CorrectTo, 1L, 10L, 10.0),
      ("B", Op.CorrectFrom, 1L, 20L, 20.0), ("B", Op.CorrectTo, 2L, 25L, 12.5)))
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$dir/cp2/agg_partials")),
      "retractive run left the merge path")

    // run 3: retract A's last row — the group dies with a -D
    val o3 = drive(3, Seq(
      Ticker(5, Op.Retract, t(ts(3)), t(ts(1)), "A", 10)), 6)
    assert(o3 == Seq(("A", Op.Retract, 1L, 10L, 10.0)))
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$dir/cp3/agg_partials")))

    // run 4: A returns — fresh partials, not the dead group's zeros
    val o4 = drive(4, Seq(
      Ticker(6, Op.Append, t(ts(4)), t(ts(1)), "A", 7)), 7)
    assert(o4 == Seq(("A", Op.Append, 1L, 7L, 7.0)))
  }

  test("invertible aggregate state rebuilds from buffers when tiers are absent") {
    import spark.implicits._
    val dir = tmp()
    // Simulates resuming a checkpoint written before the spec became
    // invertible (buffers + visible snapshot, no agg_partials tiers): the
    // partials rebuild from the NETTED buffered history in one pass and
    // seed the first tier; the run's emissions are identical to an
    // undisturbed chain.
    val q = """SELECT event_time, symbol, count(*) as n, sum(price) as total,
              |  avg(price) as mean
              |FROM tickers GROUP BY event_time, symbol""".stripMargin
    def drive(run: Int, rows: Seq[Ticker], nextOff: Long): Seq[(String, Int, Long, Long, Double)] = {
      val in = s"$dir/in$run.parquet"
      writeSlice(rows, in)
      runT(TransformRequest(
        "did:out", "out", ts(run + 10), DatasetVocabulary(),
        transform(None -> q),
        Vector(mkInput("tickers", in, in, rows.length,
          startOffset = rows.head.offset, wms = Seq(ts(run)))),
        nextOffset = nextOff,
        prevCheckpointPath = if (run == 1) None else Some(s"$dir/cp${run - 1}"),
        newCheckpointPath = s"$dir/cp$run", newDataPath = s"$dir/out$run.parquet"))
      readOut(s"$dir/out$run.parquet").orderBy("offset").collect().toSeq
        .map(r => (r.getAs[String]("symbol"), r.getAs[Int]("op"),
          r.getAs[Long]("n"), r.getAs[Long]("total"), r.getAs[Double]("mean")))
    }
    drive(1, Seq(
      Ticker(0, Op.Append, t(ts(1)), t(ts(1)), "A", 10),
      Ticker(1, Op.Append, t(ts(1)), t(ts(1)), "A", 4),
      Ticker(2, Op.Append, t(ts(1)), t(ts(1)), "B", 20)), 0)
    // wipe the tier state — only the raw buffers survive the "upgrade"
    val tiers = java.nio.file.Paths.get(s"$dir/cp1/agg_partials")
    java.nio.file.Files.walk(tiers)
      .sorted(java.util.Comparator.reverseOrder())
      .forEach(p => java.nio.file.Files.deleteIfExists(p))
    assert(!java.nio.file.Files.exists(tiers))

    // run 2 must behave exactly like the undisturbed chain's run 2
    val o2 = drive(2, Seq(
      Ticker(3, Op.Retract, t(ts(2)), t(ts(1)), "A", 4),
      Ticker(4, Op.Append, t(ts(2)), t(ts(1)), "B", 5)), 2)
    assert(o2 == Seq(
      ("A", Op.CorrectFrom, 2L, 14L, 7.0), ("A", Op.CorrectTo, 1L, 10L, 10.0),
      ("B", Op.CorrectFrom, 1L, 20L, 20.0), ("B", Op.CorrectTo, 2L, 25L, 12.5)))
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$dir/cp2/agg_partials")),
      "migration did not seed the tier state")
    // and run 3 continues incrementally on the rebuilt tiers
    val o3 = drive(3, Seq(
      Ticker(5, Op.Append, t(ts(3)), t(ts(1)), "A", 2)), 6)
    assert(o3 == Seq(
      ("A", Op.CorrectFrom, 1L, 10L, 10.0), ("A", Op.CorrectTo, 2L, 12L, 6.0)))
  }

  test("chains reading offset/system-time columns leave the signed merge path") {
    import spark.implicits._
    val dir = tmp()
    // sum(offset) reads a column EXCLUDED from the netting identity:
    // retractions arrive at their own offsets, and netting keeps min()
    // representatives — so the signed split (which would subtract the
    // RETRACT row's arrival offset, here 3, instead of removing the
    // original append's offset 1) must not run (round-6 ADVICE #3). The
    // semantics of record are net-and-recompute's.
    val q = """SELECT event_time, symbol, count(*) as n, sum(offset) as so
              |FROM tickers GROUP BY event_time, symbol""".stripMargin
    def drive(run: Int, rows: Seq[Ticker], nextOff: Long): Seq[(String, Int, Long, Long)] = {
      val in = s"$dir/in$run.parquet"
      writeSlice(rows, in)
      runT(TransformRequest(
        "did:out", "out", ts(run + 10), DatasetVocabulary(),
        transform(None -> q),
        Vector(mkInput("tickers", in, in, rows.length,
          startOffset = rows.head.offset, wms = Seq(ts(run)))),
        nextOffset = nextOff,
        prevCheckpointPath = if (run == 1) None else Some(s"$dir/cp${run - 1}"),
        newCheckpointPath = s"$dir/cp$run", newDataPath = s"$dir/out$run.parquet"))
      readOut(s"$dir/out$run.parquet").orderBy("offset").collect().toSeq
        .map(r => (r.getAs[String]("symbol"), r.getAs[Int]("op"),
          r.getAs[Long]("n"), r.getAs[Long]("so")))
    }
    val o1 = drive(1, Seq(
      Ticker(0, Op.Append, t(ts(1)), t(ts(1)), "A", 10),
      Ticker(1, Op.Append, t(ts(1)), t(ts(1)), "A", 4),
      Ticker(2, Op.Append, t(ts(1)), t(ts(1)), "B", 20)), 0)
    assert(o1 == Seq(("A", Op.Append, 2L, 1L), ("B", Op.Append, 1L, 2L)))
    // retract A@4: net-and-recompute drops the offset-1 append, so A's
    // sum(offset) becomes 0 — a signed merge would have produced 1-3 = -2
    val o2 = drive(2, Seq(
      Ticker(3, Op.Retract, t(ts(2)), t(ts(1)), "A", 4)), 3)
    assert(o2 == Seq(
      ("A", Op.CorrectFrom, 2L, 1L), ("A", Op.CorrectTo, 1L, 0L)))
  }

  test("invertible aggregate rebuilds when stored partials lack the hidden columns") {
    import spark.implicits._
    val dir = tmp()
    // Simulates an avg/HAVING checkpoint written before the spec became
    // invertible: agg_partials EXISTS on disk but without the hidden
    // __rc / __nc_* partials the tier algebra requires. Schema-projecting
    // those to NULL would silently drop every prior group (round-6
    // ADVICE #1); the engine must instead detect the file-schema gap and
    // rebuild from the netted buffers, then write FRESH state (not carry
    // the stale files forward).
    val q = """SELECT event_time, symbol, count(*) as n, sum(price) as total,
              |  avg(price) as mean
              |FROM tickers GROUP BY event_time, symbol""".stripMargin
    def drive(run: Int, rows: Seq[Ticker], nextOff: Long): Seq[(String, Int, Long, Long, Double)] = {
      val in = s"$dir/in$run.parquet"
      writeSlice(rows, in)
      runT(TransformRequest(
        "did:out", "out", ts(run + 10), DatasetVocabulary(),
        transform(None -> q),
        Vector(mkInput("tickers", in, in, rows.length,
          startOffset = rows.head.offset, wms = Seq(ts(run)))),
        nextOffset = nextOff,
        prevCheckpointPath = if (run == 1) None else Some(s"$dir/cp${run - 1}"),
        newCheckpointPath = s"$dir/cp$run", newDataPath = s"$dir/out$run.parquet"))
      readOut(s"$dir/out$run.parquet").orderBy("offset").collect().toSeq
        .map(r => (r.getAs[String]("symbol"), r.getAs[Int]("op"),
          r.getAs[Long]("n"), r.getAs[Long]("total"), r.getAs[Double]("mean")))
    }
    drive(1, Seq(
      Ticker(0, Op.Append, t(ts(1)), t(ts(1)), "A", 10),
      Ticker(1, Op.Append, t(ts(1)), t(ts(1)), "A", 4),
      Ticker(2, Op.Append, t(ts(1)), t(ts(1)), "B", 20)), 0)
    // Rewrite the tier state WITHOUT the hidden invertible columns — the
    // exact shape a pre-upgrade needsAux checkpoint holds.
    val tiersPath = s"$dir/cp1/agg_partials"
    val stored = spark.read.parquet(tiersPath)
    val legacyCols = stored.columns.filterNot(c =>
      c == graft.engine.PlanClassifier.RowCountCol || c.startsWith("__nc_"))
    assert(legacyCols.length < stored.columns.length,
      "fixture expected hidden columns to strip")
    val legacy = stored.select(legacyCols.map(org.apache.spark.sql.functions.col).toIndexedSeq: _*).collect()
    val legacyDf = spark.createDataFrame(
      spark.sparkContext.parallelize(legacy.toIndexedSeq, 1),
      org.apache.spark.sql.types.StructType(
        stored.schema.fields.filter(f => legacyCols.contains(f.name))))
    legacyDf.write.mode("overwrite").parquet(tiersPath)

    // run 2 must behave exactly like an undisturbed chain's run 2 — the
    // retraction exercises the subtraction against the REBUILT history
    val o2 = drive(2, Seq(
      Ticker(3, Op.Retract, t(ts(2)), t(ts(1)), "A", 4),
      Ticker(4, Op.Append, t(ts(2)), t(ts(1)), "B", 5)), 2)
    assert(o2 == Seq(
      ("A", Op.CorrectFrom, 2L, 14L, 7.0), ("A", Op.CorrectTo, 1L, 10L, 10.0),
      ("B", Op.CorrectFrom, 1L, 20L, 20.0), ("B", Op.CorrectTo, 2L, 25L, 12.5)))
    // the NEW checkpoint's tiers must be fully usable (no stale legacy
    // files carried forward)
    val cp2 = spark.read.parquet(s"$dir/cp2/agg_partials")
    assert(cp2.columns.contains(graft.engine.PlanClassifier.RowCountCol))
    assert(!cp2.where(org.apache.spark.sql.functions
      .col(graft.engine.PlanClassifier.RowCountCol).isNull).head(1).nonEmpty,
      "stale legacy tier rows were carried into the upgraded state")
    // run 3 continues incrementally on the upgraded tiers
    val o3 = drive(3, Seq(
      Ticker(5, Op.Append, t(ts(3)), t(ts(1)), "A", 2)), 6)
    assert(o3 == Seq(
      ("A", Op.CorrectFrom, 1L, 10L, 10.0), ("A", Op.CorrectTo, 2L, 12L, 6.0)))
  }

  test("invertible aggregate: a sum retracted down to NULL contributions reads NULL") {
    import spark.implicits._
    val dir = tmp()
    // After the retraction the group still holds one row, but that row's
    // sum contribution is NULL — SQL's sum must read NULL, not the 0 the
    // subtraction leaves. The hidden per-sum non-null count carries this.
    val q = """SELECT event_time, symbol, count(*) as n,
              |  sum(nullif(price, 999)) as total
              |FROM tickers GROUP BY event_time, symbol""".stripMargin
    val in1 = s"$dir/in1.parquet"
    writeSlice(Seq(
      Ticker(0, Op.Append, t(ts(1)), t(ts(1)), "A", 5),
      Ticker(1, Op.Append, t(ts(1)), t(ts(1)), "A", 999)), in1)
    runT(TransformRequest(
      "did:out", "out", ts(10), DatasetVocabulary(),
      transform(None -> q),
      Vector(mkInput("tickers", in1, in1, 2, wms = Seq(ts(1)))),
      nextOffset = 0, prevCheckpointPath = None,
      newCheckpointPath = s"$dir/cp1", newDataPath = s"$dir/out1.parquet"))
    val o1 = readOut(s"$dir/out1.parquet").collect()
    assert(o1.map(r => (r.getAs[Long]("n"), r.getAs[Long]("total"))).toSeq ==
      Seq((2L, 5L)))

    val in2 = s"$dir/in2.parquet"
    writeSlice(Seq(
      Ticker(2, Op.Retract, t(ts(2)), t(ts(1)), "A", 5)), in2)
    runT(TransformRequest(
      "did:out", "out", ts(11), DatasetVocabulary(),
      transform(None -> q),
      Vector(mkInput("tickers", in2, in2, 1, startOffset = 2, wms = Seq(ts(2)))),
      nextOffset = 2, prevCheckpointPath = Some(s"$dir/cp1"),
      newCheckpointPath = s"$dir/cp2", newDataPath = s"$dir/out2.parquet"))
    val o2 = readOut(s"$dir/out2.parquet").orderBy("offset").collect()
    assert(o2.map(r => (r.getAs[Int]("op"), r.getAs[Long]("n"),
      if (r.isNullAt(r.fieldIndex("total"))) null else r.getAs[Long]("total"))).toSeq ==
      Seq((Op.CorrectFrom, 2L, 5L), (Op.CorrectTo, 1L, null)))
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$dir/cp2/agg_partials")),
      "retractive run left the merge path")
  }

  test("invertible aggregate state is tier-appended deltas, no snapshot copy") {
    import spark.implicits._
    val dir = tmp()
    // A never-flip spec (invertible, op-free, divisible) keeps its state as
    // additive delta tiers: per-run state I/O is the slice's partials, the
    // visible-snapshot copy (only the recompute path reads it) is skipped,
    // and tier compaction keeps the file count sublinear in runs.
    val q = """SELECT event_time, symbol, count(*) as n, sum(price) as total
              |FROM tickers GROUP BY event_time, symbol""".stripMargin
    val nRuns = 10
    (1 to nRuns).foreach { run =>
      val in = s"$dir/in$run.parquet"
      writeSlice(Seq(
        Ticker(2L * (run - 1), Op.Append, t(ts(run)), t(ts(1)), "A", run),
        Ticker(2L * (run - 1) + 1, Op.Append, t(ts(run)), t(ts(1)),
          s"K$run", 7)), in)
      runT(TransformRequest(
        "did:out", "out", ts(run + 10), DatasetVocabulary(),
        transform(None -> q),
        Vector(mkInput("tickers", in, in, 2, startOffset = 2L * (run - 1),
          wms = Seq(ts(run)))),
        nextOffset = 0, prevCheckpointPath =
          if (run == 1) None else Some(s"$dir/cp${run - 1}"),
        newCheckpointPath = s"$dir/cp$run", newDataPath = s"$dir/out$run.parquet"))
    }
    // cumulative correctness through the tiers: A saw prices 1..nRuns
    val last = readOut(s"$dir/out$nRuns.parquet")
      .where("symbol = 'A' AND op = 3").collect()
    assert(last.map(r => (r.getAs[Long]("n"), r.getAs[Long]("total"))).toSeq ==
      Seq((nRuns.toLong, (1 to nRuns).sum.toLong)))
    val cpLast = java.nio.file.Paths.get(s"$dir/cp$nRuns")
    assert(java.nio.file.Files.exists(cpLast.resolve("agg_partials")))
    assert(!java.nio.file.Files.exists(cpLast.resolve("snapshot")),
      "never-flip spec must not write the visible snapshot copy")
    val tierFiles = cpLast.resolve("agg_partials").toFile.listFiles
      .count(_.getName.endsWith(".parquet"))
    assert(tierFiles < nRuns, s"tier compaction did not run: $tierFiles files")
  }

  test("young datasets ride the recompute and flip to merge tiers once grown") {
    import spark.implicits._
    // Cost-based dispatch: while buffered history is under
    // spark.graft.recomputeYoungFactor slices' worth of rows, an invertible
    // never-flip chain runs the generic recompute (cheaper: no state-tier
    // jobs); once grown it flips to the merge path, paying the one-time
    // partials rebuild from buffers. Emissions must be byte-identical to
    // the always-recompute twin across BOTH phases and the flip itself,
    // and the checkpoint layout must show the detour actually happened.
    // Factor 2 with uniform 2-row slices: runs 1–2 young (history 0, 2),
    // run 3 flips (history 4 ≥ 2×2), then a 12-row slice at run 7 drops
    // the ratio back under 2 — the sticky gate must NOT detour (a young
    // detour would strand the tiers stale).
    val dirF = tmp(); val dirC = tmp()
    val q = """SELECT event_time, symbol, count(*) as n, sum(price) as total
              |FROM tickers GROUP BY event_time, symbol""".stripMargin
    val qTwin =
      """SELECT event_time, symbol, count(*) as n,
        |  CAST(sum(price) + stddev_pop(price) * 0 AS BIGINT) as total
        |FROM tickers GROUP BY event_time, symbol""".stripMargin
    spark.conf.set("spark.graft.recomputeYoungFactor", "2")
    try {
      var off = 0L
      (1 to 7).foreach { run =>
        val rows =
          if (run < 7) Seq(
            Ticker(off, Op.Append, t(ts(run)), t(ts(1)), "A", run),
            Ticker(off + 1, Op.Append, t(ts(run)), t(ts(2)), s"K$run", 7))
          else (0 until 12).map(i =>
            Ticker(off + i, Op.Append, t(ts(run)), t(ts(3)), s"B$i", i))
        def drive(dir: java.nio.file.Path, steps: (Option[String], String)*)
            : Unit = {
          val in = s"$dir/in$run.parquet"
          writeSlice(rows, in)
          runT(TransformRequest(
            "did:out", "out", ts(run + 10), DatasetVocabulary(),
            transform(steps: _*),
            Vector(mkInput("tickers", in, in, rows.length, startOffset = off,
              wms = Seq(ts(run)))),
            nextOffset = 0, prevCheckpointPath =
              if (run == 1) None else Some(s"$dir/cp${run - 1}"),
            newCheckpointPath = s"$dir/cp$run",
            newDataPath = s"$dir/out$run.parquet"))
        }
        drive(dirF, None -> q)
        drive(dirC, None -> qTwin)
        off += rows.length
        def runRows(dir: java.nio.file.Path) =
          readOut(s"$dir/out$run.parquet").orderBy("offset").collect().toSeq
        assert(runRows(dirF) == runRows(dirC), s"run $run diverged from twin")
        val hasTiers = java.nio.file.Files.exists(
          java.nio.file.Paths.get(s"$dirF/cp$run/agg_partials"))
        if (run <= 2)
          assert(!hasTiers, s"run $run (young) must not write merge tiers")
        else
          assert(hasTiers,
            s"run $run must be on the merge path (flip at run 3, sticky after)")
      }
    } finally spark.conf.set("spark.graft.recomputeYoungFactor", "0")
  }

  test("young-flip rebuilds join partials and matched state exactly") {
    import spark.implicits._
    // The aggregate-above-LEFT-JOIN shape crosses the young boundary: the
    // flip run must rebuild BOTH the joined partials and the left-matched
    // set from raw buffers, so a right row arriving post-flip for an order
    // buffered during the young phase must produce the same merge-path
    // emission as the always-recompute twin (no spurious null-pad retract,
    // no double retract).
    val dirF = tmp(); val dirC = tmp()
    def q(sum: String) =
      s"""SELECT o.event_time as event_time, count(*) as n,
         |  $sum as q_total, sum(s.num_shipped) as shipped
         |FROM orders o LEFT JOIN shipments s ON o.order_id = s.order_id
         |GROUP BY o.event_time""".stripMargin
    val qFast = q("sum(o.quantity)")
    val qTwin = q("CAST(sum(o.quantity) + stddev_pop(o.quantity) * 0 AS BIGINT)")
    // per-run slices: 2 orders + 1 shipment (slice 3 rows); factor 2 →
    // run 1 young (hist 0), run 2 young (hist 3 < 6), run 3 flips
    // (hist 6 ≥ 6). Shipments lag: run r ships an order from run r-1;
    // run 4 (post-flip) ships order 1 (buffered in the YOUNG phase — only
    // a rebuilt matched/partials state nets it correctly).
    val orderRuns = Map(
      1 -> Seq((1L, 20L), (2L, 30L)), 2 -> Seq((3L, 40L), (4L, 10L)),
      3 -> Seq((5L, 50L), (6L, 60L)), 4 -> Seq((7L, 70L), (8L, 80L)))
    val shipRuns = Map(
      1 -> Seq((99L, 5L)), 2 -> Seq((2L, 10L)),
      3 -> Seq((3L, 15L)), 4 -> Seq((1L, 25L)))
    spark.conf.set("spark.graft.recomputeYoungFactor", "2")
    try {
      var offA = 0L; var offB = 0L
      (1 to 4).foreach { run =>
        val orders = orderRuns(run).zipWithIndex.map { case ((id, qty), i) =>
          OrderRow(offA + i, Op.Append, t(ts(run)), t(ts(run)), id, qty)
        }
        val ships = shipRuns(run).zipWithIndex.map { case ((id, n), i) =>
          Shipment(offB + i, Op.Append, t(ts(run)), t(ts(run)), id, n)
        }
        def drive(dir: java.nio.file.Path, steps: (Option[String], String)*)
            : Unit = {
          val o = s"$dir/o$run.parquet"; val s = s"$dir/s$run.parquet"
          writeSlice(orders, o); writeSlice(ships, s)
          runT(TransformRequest(
            "did:out", "out", ts(run + 10), DatasetVocabulary(),
            transform(steps: _*),
            Vector(
              mkInput("orders", o, o, orders.length, startOffset = offA,
                wms = Seq(ts(run))),
              mkInput("shipments", s, s, ships.length, startOffset = offB,
                wms = Seq(ts(run)))),
            nextOffset = 0, prevCheckpointPath =
              if (run == 1) None else Some(s"$dir/cp${run - 1}"),
            newCheckpointPath = s"$dir/cp$run",
            newDataPath = s"$dir/out$run.parquet"))
        }
        drive(dirF, None -> qFast)
        drive(dirC, None -> qTwin)
        offA += orders.length; offB += ships.length
        def runRows(dir: java.nio.file.Path) =
          readOut(s"$dir/out$run.parquet").orderBy("offset").collect().toSeq
        assert(runRows(dirF) == runRows(dirC), s"run $run diverged from twin")
      }
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$dirF/cp2/agg_partials")),
        "runs 1-2 must ride the young recompute")
      assert(java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$dirF/cp3/agg_partials")),
        "run 3 must flip to the merge path")
    } finally spark.conf.set("spark.graft.recomputeYoungFactor", "0")
  }

  test("young detour covers the changelog-delta family and flips exactly") {
    import spark.implicits._
    // Same cost-based detour, applied to the join / DISTINCT / left-join
    // CHANGELOG paths. The join and DISTINCT paths keep no state beyond
    // the buffers and snapshot both paths maintain identically; the
    // left-join path's matched set must rebuild from buffers at the flip
    // (a run-4 shipment matches an order buffered during the YOUNG phase,
    // so its null-pad retract is only correct against rebuilt state).
    // Twin = CTE-wrapped same SQL, which always takes the full recompute.
    val joinQ =
      """SELECT o.event_time as event_time, o.order_id, o.quantity,
        |  s.num_shipped
        |FROM orders o JOIN shipments s ON o.order_id = s.order_id""".stripMargin
    val leftQ = joinQ.replace("JOIN shipments", "LEFT JOIN shipments")
    val distinctQ =
      """SELECT DISTINCT o.event_time as event_time, s.num_shipped
        |FROM orders o JOIN shipments s ON o.order_id = s.order_id""".stripMargin
    def twin(q: String) = s"WITH j AS ($q)\nSELECT * FROM j"
    val orderRuns = Map(
      1 -> Seq((1L, 20L), (2L, 30L)), 2 -> Seq((3L, 40L), (4L, 10L)),
      3 -> Seq((5L, 50L), (6L, 60L)), 4 -> Seq((7L, 70L), (8L, 80L)))
    val shipRuns = Map(
      1 -> Seq((99L, 5L)), 2 -> Seq((2L, 10L)),
      3 -> Seq((3L, 15L)), 4 -> Seq((1L, 25L)))
    for ((name, q) <- Seq("join" -> joinQ, "distinct" -> distinctQ,
        "left" -> leftQ)) {
      val dirF = tmp(); val dirC = tmp()
      spark.conf.set("spark.graft.recomputeYoungFactor", "2")
      try {
        var offA = 0L; var offB = 0L
        (1 to 4).foreach { run =>
          val orders = orderRuns(run).zipWithIndex.map { case ((id, qty), i) =>
            OrderRow(offA + i, Op.Append, t(ts(run)), t(ts(run)), id, qty)
          }
          val ships = shipRuns(run).zipWithIndex.map { case ((id, n), i) =>
            Shipment(offB + i, Op.Append, t(ts(run)), t(ts(run)), id, n)
          }
          def drive(dir: java.nio.file.Path, sql: String): Unit = {
            val o = s"$dir/o$run.parquet"; val s = s"$dir/s$run.parquet"
            writeSlice(orders, o); writeSlice(ships, s)
            runT(TransformRequest(
              "did:out", "out", ts(run + 10), DatasetVocabulary(),
              transform(None -> sql),
              Vector(
                mkInput("orders", o, o, orders.length, startOffset = offA,
                  wms = Seq(ts(run))),
                mkInput("shipments", s, s, ships.length, startOffset = offB,
                  wms = Seq(ts(run)))),
              nextOffset = 0, prevCheckpointPath =
                if (run == 1) None else Some(s"$dir/cp${run - 1}"),
              newCheckpointPath = s"$dir/cp$run",
              newDataPath = s"$dir/out$run.parquet"))
          }
          drive(dirF, q)
          drive(dirC, twin(q))
          offA += orders.length; offB += ships.length
          def runRows(dir: java.nio.file.Path) = {
            val p = s"$dir/out$run.parquet"
            if (java.nio.file.Files.exists(java.nio.file.Paths.get(p)))
              readOut(p).orderBy("offset").collect().toSeq
            else Seq.empty
          }
          assert(runRows(dirF) == runRows(dirC),
            s"$name run $run diverged from twin")
        }
        if (name == "left") {
          assert(!java.nio.file.Files.exists(
            java.nio.file.Paths.get(s"$dirF/cp2/left_matched")),
            "left runs 1-2 must ride the young recompute")
          assert(java.nio.file.Files.exists(
            java.nio.file.Paths.get(s"$dirF/cp3/left_matched")),
            "left run 3 must flip to the delta path")
        }
      } finally spark.conf.set("spark.graft.recomputeYoungFactor", "0")
    }
  }

  test("young detour respects the run bound and unknown-history checkpoints") {
    import spark.implicits._
    // Path marker: runSnapshotDiff writes the snapshot FULLY (all-new part
    // file names, never tier-merged) while the delta paths appendCarry it
    // (the previous checkpoint's files ride forward as hard links, and
    // tier compaction may fold them into a merged-* file) — so a run is
    // on the delta path iff its snapshot dir shares a file name with its
    // predecessor's or holds a compaction product.
    def snapFiles(cp: String): Set[String] = {
      val d = new java.io.File(s"$cp/snapshot")
      if (!d.exists) Set.empty
      else d.listFiles.map(_.getName).filter(_.endsWith(".parquet")).toSet
    }
    def deltaCarried(cur: String, prev: String): Boolean =
      snapFiles(cur).intersect(snapFiles(prev)).nonEmpty ||
        snapFiles(cur).exists(_.startsWith("merged-"))
    val q =
      """SELECT o.event_time as event_time, o.order_id, o.quantity,
        |  s.num_shipped
        |FROM orders o JOIN shipments s ON o.order_id = s.order_id""".stripMargin
    val dir = tmp()
    spark.conf.set("spark.graft.recomputeYoungFactor", "2")
    try {
      var offA = 0L; var offB = 0L
      def drive(run: Int, orders: Seq[OrderRow], ships: Seq[Shipment],
          prev: Option[String], cp: String): Unit = {
        val o = s"$dir/o$run.parquet"; val s = s"$dir/s$run.parquet"
        writeSlice(orders, o); writeSlice(ships, s)
        runT(TransformRequest(
          "did:out", "out", ts(run + 10), DatasetVocabulary(),
          transform(None -> q),
          Vector(
            mkInput("orders", o, o, orders.length, startOffset = offA,
              wms = Seq(ts(run))),
            mkInput("shipments", s, s, ships.length, startOffset = offB,
              wms = Seq(ts(run)))),
          nextOffset = 0, prevCheckpointPath = prev,
          newCheckpointPath = cp, newDataPath = s"$dir/out$run.parquet"))
        offA += orders.length; offB += ships.length
      }
      def mkOrders(run: Int, n: Int): Seq[OrderRow] = (0 until n).map(i =>
        OrderRow(offA + i, Op.Append, t(ts(run)), t(ts(run)),
          100L * run + i, 10L + i))
      def mkShips(run: Int, ids: Seq[Long]): Seq[Shipment] =
        ids.zipWithIndex.map { case (id, i) =>
          Shipment(offB + i, Op.Append, t(ts(run)), t(ts(run)), id, 5L) }
      // runs 1-2: 3-row slices, young by both ratio and run count
      drive(1, mkOrders(1, 2), mkShips(1, Seq(100L)), None, s"$dir/cp1")
      drive(2, mkOrders(2, 2), mkShips(2, Seq(200L)), Some(s"$dir/cp1"), s"$dir/cp2")
      assert(!deltaCarried(s"$dir/cp2", s"$dir/cp1"),
        "run 2 must still be on the young recompute (full snapshot rewrite)")
      // run 3: stateRuns = 2 >= factor — the run bound ends the detour
      drive(3, mkOrders(3, 2), mkShips(3, Seq(300L)), Some(s"$dir/cp2"), s"$dir/cp3")
      assert(deltaCarried(s"$dir/cp3", s"$dir/cp2"),
        "run 3 must be on the delta path (snapshot carried forward)")
      // run 4: an oversized backfill slice drops history/slice back under
      // the factor — the run bound must keep the mature chain on the
      // delta path (a detour here would full-recompute and full-diff)
      drive(4, mkOrders(4, 20), mkShips(4, Seq(400L)), Some(s"$dir/cp3"), s"$dir/cp4")
      assert(deltaCarried(s"$dir/cp4", s"$dir/cp3"),
        "an oversized slice on a mature chain must not re-enter the detour")
      // upgrade scenario: a checkpoint with buffers but a ledger that
      // predates bufferedRows/stateRuns has UNKNOWN history — the gate
      // must stay on the established (delta) path, not burn factor-many
      // full recomputes
      val ledgerPath = java.nio.file.Paths.get(s"$dir/cp4/ledger.json")
      val doctored = {
        val j = java.nio.file.Files.readString(ledgerPath)
        val cut = j.indexOf(", \"bufferedRows\"")
        assert(cut > 0, s"unexpected ledger shape: $j")
        j.substring(0, cut) + "}"
      }
      java.nio.file.Files.writeString(ledgerPath, doctored)
      drive(5, mkOrders(5, 2), mkShips(5, Seq(500L)), Some(s"$dir/cp4"), s"$dir/cp5")
      assert(deltaCarried(s"$dir/cp5", s"$dir/cp4"),
        "unknown history (pre-upgrade ledger) must stay on the delta path")
      // round-9 ADVICE #1: the run AFTER the doctored one is the real
      // trap — run 5's fresh ledger restarted bufferedRows at one slice's
      // span with stateRuns=1, which satisfies the ratio + run-count
      // bounds; the sticky historyUnknown marker must keep the mature
      // chain on the delta path anyway
      val l5 = Codec.json.readTree(
        java.nio.file.Files.readString(
          java.nio.file.Paths.get(s"$dir/cp5/ledger.json")))
      assert(l5.get("historyUnknown").asBoolean(),
        "run 5 must persist the sticky historyUnknown marker")
      drive(6, mkOrders(6, 2), mkShips(6, Seq(600L)), Some(s"$dir/cp5"), s"$dir/cp6")
      assert(deltaCarried(s"$dir/cp6", s"$dir/cp5"),
        "post-upgrade run 2 must not re-enter the detour (sticky marker)")
    } finally spark.conf.set("spark.graft.recomputeYoungFactor", "0")
  }

  test("signed merge and recompute emit identical changelogs under retractions") {
    import spark.implicits._
    // Seeded random slices with appends AND retractions of still-live rows
    // every run, driven through the invertible shape (signed merge path —
    // never flips) and a value-identical ineligible shape (stddev_pop*0 →
    // recompute every run). Emitted slices must match row-for-row
    // including offsets on every run.
    val rnd = new scala.util.Random(4242)
    val dirF = tmp(); val dirC = tmp()
    val qFast = """SELECT event_time, symbol, count(*) as n, sum(price) as total,
                  |  avg(price) as mean
                  |FROM tickers GROUP BY event_time, symbol""".stripMargin
    val qSlow = """SELECT event_time, symbol, count(*) as n,
                  |  CAST(sum(price) + stddev_pop(price) * 0 AS BIGINT) as total,
                  |  avg(price) as mean
                  |FROM tickers GROUP BY event_time, symbol""".stripMargin
    var off = 0L; var nextOut = Map("f" -> 0L, "c" -> 0L)
    var prevF: Option[String] = None; var prevC: Option[String] = None
    var live = Vector.empty[Ticker]
    (1 to 6).foreach { run =>
      val nApp = if (run == 1) 4 else 1 + rnd.nextInt(3)
      val appends = (0 until nApp).map { i =>
        Ticker(off + i, Op.Append, t(ts(run)), t(ts(1)),
          ("A".head + rnd.nextInt(3)).toChar.toString, 1 + rnd.nextInt(100))
      }
      val nRet = if (run >= 2 && live.nonEmpty) rnd.nextInt(live.size + 1) else 0
      val shuffled = rnd.shuffle(live)
      val retractRows = shuffled.take(nRet).zipWithIndex.map { case (p, i) =>
        p.copy(offset = off + nApp + i, op = Op.Retract,
          system_time = t(ts(run)))
      }
      live = shuffled.drop(nRet) ++ appends
      val slice = appends ++ retractRows
      val inF = s"$dirF/in$run.parquet"; val inC = s"$dirC/in$run.parquet"
      writeSlice(slice, inF); writeSlice(slice, inC)
      def drive(tag: String, dir: java.nio.file.Path, in: String, q: String,
          prev: Option[String]): String = {
        val resp = runT(TransformRequest(
          "did:out", "out", ts(run + 10), DatasetVocabulary(),
          transform(None -> q),
          Vector(mkInput("tickers", in, in, slice.length, startOffset = off,
            wms = Seq(ts(run)))),
          nextOffset = nextOut(tag), prevCheckpointPath = prev,
          newCheckpointPath = s"$dir/cp$run",
          newDataPath = s"$dir/out$run.parquet"))
        nextOut += tag -> resp.newOffsetInterval.map(_.end + 1).getOrElse(nextOut(tag))
        s"$dir/cp$run"
      }
      prevF = Some(drive("f", dirF, inF, qFast, prevF))
      prevC = Some(drive("c", dirC, inC, qSlow, prevC))
      off += slice.length
      val cols = Seq("offset", "op", "event_time", "symbol", "n", "total", "mean")
      val outF = readOut(s"$dirF/out$run.parquet").orderBy("offset")
        .select(cols.head, cols.tail: _*).collect().toSeq
      val outC = readOut(s"$dirC/out$run.parquet").orderBy("offset")
        .select(cols.head, cols.tail: _*).collect().toSeq
      assert(outF == outC, s"run $run diverged:\nF=$outF\nC=$outC")
      if (run >= 2)
        assert(java.nio.file.Files.exists(
          java.nio.file.Paths.get(s"$dirF/cp$run/agg_partials")),
          s"run $run left the merge path")
    }
    assert(nextOut("f") > 0)
  }

  test("aggregate fast path and recompute path emit identical changelogs") {
    import spark.implicits._
    // Seeded random append-only slices driven through two chains: the
    // mergeable shape (incremental merge) and a value-identical but
    // ineligible shape (stddev_pop is non-mergeable, and `* 0` erases its
    // value — recompute). Emitted slices must match row-for-row including
    // offsets every run.
    val rnd = new scala.util.Random(42)
    val dirF = tmp(); val dirC = tmp()
    val qFast = """SELECT max(event_time) as event_time, symbol,
                  |  count(*) as n, sum(price) as total
                  |FROM tickers GROUP BY symbol""".stripMargin
    val qSlow = """SELECT max(event_time) as event_time, symbol,
                  |  count(*) as n,
                  |  CAST(sum(price) + stddev_pop(price) * 0 AS BIGINT) as total
                  |FROM tickers GROUP BY symbol""".stripMargin
    var off = 0L; var nextOut = Map("f" -> 0L, "c" -> 0L)
    var prevF: Option[String] = None; var prevC: Option[String] = None
    (1 to 4).foreach { run =>
      val nRows = 1 + rnd.nextInt(5)
      val rows = (0 until nRows).map { i =>
        Ticker(off + i, Op.Append, t(ts(run)), t(ts(run)),
          ("A".head + rnd.nextInt(5)).toChar.toString, 1 + rnd.nextInt(100))
      }
      val inF = s"$dirF/in$run.parquet"; val inC = s"$dirC/in$run.parquet"
      writeSlice(rows, inF); writeSlice(rows, inC)
      def drive(tag: String, dir: java.nio.file.Path, in: String, q: String,
          prev: Option[String]): String = {
        val resp = runT(TransformRequest(
          "did:out", "out", ts(run + 10), DatasetVocabulary(),
          transform(None -> q),
          Vector(mkInput("tickers", in, in, nRows, startOffset = off,
            wms = Seq(ts(run)))),
          nextOffset = nextOut(tag), prevCheckpointPath = prev,
          newCheckpointPath = s"$dir/cp$run",
          newDataPath = s"$dir/out$run.parquet"))
        nextOut += tag -> resp.newOffsetInterval.map(_.end + 1).getOrElse(nextOut(tag))
        s"$dir/cp$run"
      }
      prevF = Some(drive("f", dirF, inF, qFast, prevF))
      prevC = Some(drive("c", dirC, inC, qSlow, prevC))
      off += nRows
      val outF = readOut(s"$dirF/out$run.parquet").orderBy("offset")
        .select("offset", "op", "event_time", "symbol", "n", "total").collect().toSeq
      val outC = readOut(s"$dirC/out$run.parquet").orderBy("offset")
        .select("offset", "op", "event_time", "symbol", "n", "total").collect().toSeq
      assert(outF == outC, s"run $run diverged")
    }
  }

  test("HAVING on a non-projected count rides a hidden merge partial") {
    import spark.implicits._
    // `count(*)` appears only in the HAVING: the merge path maintains it
    // as a hidden __hv partial. Run 2's second row lifts the group over
    // the threshold — it must surface as +I with the correct sum even
    // though the count column never reaches the output.
    val dir = tmp()
    val q = """SELECT max(event_time) as event_time, symbol,
              |  sum(price) as total
              |FROM tickers GROUP BY symbol HAVING count(*) >= 2""".stripMargin
    val in1 = s"$dir/in1.parquet"
    writeSlice(Seq(Ticker(0, 0, t(ts(1)), t(ts(1)), "A", 10)), in1)
    val r1 = runT(TransformRequest(
      "did:out", "out", ts(10), DatasetVocabulary(),
      transform(None -> q),
      Vector(mkInput("tickers", in1, in1, 1, wms = Seq(ts(1)))),
      nextOffset = 0, prevCheckpointPath = None,
      newCheckpointPath = s"$dir/cp1", newDataPath = s"$dir/out1.parquet"))
    assert(r1.newOffsetInterval.isEmpty) // count 1 < 2: sub-threshold

    val in2 = s"$dir/in2.parquet"
    writeSlice(Seq(Ticker(1, 0, t(ts(2)), t(ts(2)), "A", 7)), in2)
    val r2 = runT(TransformRequest(
      "did:out", "out", ts(11), DatasetVocabulary(),
      transform(None -> q),
      Vector(mkInput("tickers", in2, in2, 1, startOffset = 1, wms = Seq(ts(2)))),
      nextOffset = 0, prevCheckpointPath = Some(s"$dir/cp1"),
      newCheckpointPath = s"$dir/cp2", newDataPath = s"$dir/out2.parquet"))
    assert(r2.newOffsetInterval.contains(OffsetInterval(0, 0)))
    val out2 = readOut(s"$dir/out2.parquet").collect()
    assert(out2.map(r => (r.getAs[String]("symbol"), r.getAs[Long]("total"),
      r.getAs[Int]("op"))).toSeq == Seq(("A", 17L, Op.Append)))
    // the hidden partial never reaches the output schema
    assert(!readOut(s"$dir/out2.parquet").columns.exists(_.startsWith("__hv")))
  }

  test("HAVING on a non-projected avg rides hidden division partials") {
    import spark.implicits._
    // avg appearing only in HAVING is maintained as hidden __as_/__ac_
    // partials and evaluated as their division post-merge. The shadow
    // query projects `avg(price) + 0`, which forces the recompute path
    // but leaves group membership identical — both must emit identical
    // changelogs, including across run 4's retraction flip.
    val rnd = new scala.util.Random(23)
    val dirF = tmp(); val dirC = tmp()
    val qFast = """SELECT max(event_time) as event_time, symbol,
                  |  sum(price) as total
                  |FROM tickers GROUP BY symbol HAVING avg(price) > 25""".stripMargin
    val qSlow = """SELECT max(event_time) as event_time, symbol,
                  |  sum(price) as total, stddev_pop(price) as shadow
                  |FROM tickers GROUP BY symbol HAVING avg(price) > 25""".stripMargin
    var off = 0L; var nextOut = Map("f" -> 0L, "c" -> 0L)
    var prevF: Option[String] = None; var prevC: Option[String] = None
    var run1Head: Option[EngineFixtures.Ticker] = None
    (1 to 5).foreach { run =>
      val nRows = 1 + rnd.nextInt(5)
      val appends = (0 until nRows).map { i =>
        Ticker(off + i, Op.Append, t(ts(run)), t(ts(run)),
          ("A".head + rnd.nextInt(4)).toChar.toString, 1 + rnd.nextInt(50))
      }
      if (run == 1) run1Head = Some(appends.head)
      val slices = appends ++ (if (run == 4) Seq(run1Head.get.copy(
        offset = off + nRows, op = Op.Retract, system_time = t(ts(run))))
      else Nil)
      val n = slices.length
      val inF = s"$dirF/in$run.parquet"; val inC = s"$dirC/in$run.parquet"
      writeSlice(slices, inF); writeSlice(slices, inC)
      def drive(tag: String, dir: java.nio.file.Path, in: String, q: String,
          prev: Option[String]): String = {
        val resp = runT(TransformRequest(
          "did:out", "out", ts(run + 10), DatasetVocabulary(),
          transform(None -> q),
          Vector(mkInput("tickers", in, in, n, startOffset = off,
            wms = Seq(ts(run)))),
          nextOffset = nextOut(tag), prevCheckpointPath = prev,
          newCheckpointPath = s"$dir/cp$run",
          newDataPath = s"$dir/out$run.parquet"))
        nextOut += tag -> resp.newOffsetInterval.map(_.end + 1).getOrElse(nextOut(tag))
        s"$dir/cp$run"
      }
      prevF = Some(drive("f", dirF, inF, qFast, prevF))
      prevC = Some(drive("c", dirC, inC, qSlow, prevC))
      off += n
      val sel = Seq("offset", "op", "event_time", "symbol", "total")
      val outF = readOut(s"$dirF/out$run.parquet").orderBy("offset")
        .select(sel.map(org.apache.spark.sql.functions.col): _*).collect().toSeq
      val outC = readOut(s"$dirC/out$run.parquet").orderBy("offset")
        .select(sel.map(org.apache.spark.sql.functions.col): _*).collect().toSeq
      assert(outF == outC, s"run $run diverged:\nF=$outF\nC=$outC")
    }
    // the fast engine really took the merge path before the flip
    assert(Files.exists(Paths.get(s"$dirF/cp1/agg_partials")))
  }

  test("expression columns over aggregates merge identically to recompute") {
    import spark.implicits._
    // `sum/count` ratios, CAST arithmetic, and a lateral alias reference —
    // all evaluated post-merge from hidden partials — against a
    // value-identical recompute shape (stddev_pop shadow forces it). Run 4
    // carries a retraction: the merge → recompute flip must diff against
    // the expression-bearing visible snapshot the merge runs wrote.
    val rnd = new scala.util.Random(67)
    val dirF = tmp(); val dirC = tmp()
    val cols = """  sum(price) / count(*) AS ratio,
                 |  CAST(count(*) * 2 AS BIGINT) AS n2,
                 |  sum(price) AS total, total + 1 AS t1""".stripMargin
    val qFast = s"""SELECT max(event_time) as event_time, symbol,
                   |$cols
                   |FROM tickers GROUP BY symbol HAVING sum(price) > 40""".stripMargin
    val qSlow = s"""SELECT max(event_time) as event_time, symbol,
                   |$cols, stddev_pop(price) AS shadow
                   |FROM tickers GROUP BY symbol HAVING sum(price) > 40""".stripMargin
    var off = 0L; var nextOut = Map("f" -> 0L, "c" -> 0L)
    var prevF: Option[String] = None; var prevC: Option[String] = None
    var run1Head: Option[EngineFixtures.Ticker] = None
    (1 to 5).foreach { run =>
      val nRows = 1 + rnd.nextInt(5)
      val appends = (0 until nRows).map { i =>
        Ticker(off + i, Op.Append, t(ts(run)), t(ts(run)),
          ("A".head + rnd.nextInt(4)).toChar.toString, 1 + rnd.nextInt(50))
      }
      if (run == 1) run1Head = Some(appends.head)
      val slices = appends ++ (if (run == 4) Seq(run1Head.get.copy(
        offset = off + nRows, op = Op.Retract, system_time = t(ts(run))))
      else Nil)
      val n = slices.length
      val inF = s"$dirF/in$run.parquet"; val inC = s"$dirC/in$run.parquet"
      writeSlice(slices, inF); writeSlice(slices, inC)
      def drive(tag: String, dir: java.nio.file.Path, in: String, q: String,
          prev: Option[String]): String = {
        val resp = runT(TransformRequest(
          "did:out", "out", ts(run + 10), DatasetVocabulary(),
          transform(None -> q),
          Vector(mkInput("tickers", in, in, n, startOffset = off,
            wms = Seq(ts(run)))),
          nextOffset = nextOut(tag), prevCheckpointPath = prev,
          newCheckpointPath = s"$dir/cp$run",
          newDataPath = s"$dir/out$run.parquet"))
        nextOut += tag -> resp.newOffsetInterval.map(_.end + 1).getOrElse(nextOut(tag))
        s"$dir/cp$run"
      }
      prevF = Some(drive("f", dirF, inF, qFast, prevF))
      prevC = Some(drive("c", dirC, inC, qSlow, prevC))
      off += n
      val sel = Seq("offset", "op", "event_time", "symbol", "ratio", "n2",
        "total", "t1")
      val outF = readOut(s"$dirF/out$run.parquet").orderBy("offset")
        .select(sel.map(org.apache.spark.sql.functions.col): _*).collect().toSeq
      val outC = readOut(s"$dirC/out$run.parquet").orderBy("offset")
        .select(sel.map(org.apache.spark.sql.functions.col): _*).collect().toSeq
      assert(outF == outC, s"run $run diverged:\nF=$outF\nC=$outC")
    }
    // the fast engine really took the merge path before the flip
    assert(Files.exists(Paths.get(s"$dirF/cp1/agg_partials")))
  }

  test("touched-group recompute narrowing matches the full recompute") {
    import spark.implicits._
    // stddev is non-mergeable, so both queries recompute every run; qFast's
    // plain `symbol` key activates the touched-group narrowing while
    // qSlow's `symbol AS sym` rename (raw values, different name) withholds
    // it. Seeded slices with retractions on runs 3 and 5 — narrowed and
    // full recompute must emit identical changelogs throughout, including
    // groups whose rows retract away entirely.
    val rnd = new scala.util.Random(41)
    val dirF = tmp(); val dirC = tmp()
    val qFast = """SELECT max(event_time) as event_time, symbol,
                  |  sum(price) as total, stddev_pop(price) as sd
                  |FROM tickers GROUP BY symbol""".stripMargin
    val qSlow = """SELECT max(event_time) as event_time, symbol AS sym,
                  |  sum(price) as total, stddev_pop(price) as sd
                  |FROM tickers GROUP BY symbol""".stripMargin
    var off = 0L; var nextOut = Map("f" -> 0L, "c" -> 0L)
    var prevF: Option[String] = None; var prevC: Option[String] = None
    var history = Vector.empty[EngineFixtures.Ticker]
    (1 to 6).foreach { run =>
      val nRows = 1 + rnd.nextInt(4)
      val appends = (0 until nRows).map { i =>
        Ticker(off + i, Op.Append, t(ts(run)), t(ts(run)),
          ("A".head + rnd.nextInt(3)).toChar.toString, 1 + rnd.nextInt(50))
      }
      // runs 3 and 5 retract a random still-live prior row
      val retracts =
        if (run == 3 || run == 5) {
          val victim = history(rnd.nextInt(history.size))
          history = history.filterNot(_ == victim)
          Seq(victim.copy(offset = off + nRows, op = Op.Retract,
            system_time = t(ts(run))))
        } else Nil
      history ++= appends
      val slices = appends ++ retracts
      val n = slices.length
      val inF = s"$dirF/in$run.parquet"; val inC = s"$dirC/in$run.parquet"
      writeSlice(slices, inF); writeSlice(slices, inC)
      def drive(tag: String, dir: java.nio.file.Path, in: String, q: String,
          prev: Option[String]): String = {
        val resp = runT(TransformRequest(
          "did:out", "out", ts(run + 10), DatasetVocabulary(),
          transform(None -> q),
          Vector(mkInput("tickers", in, in, n, startOffset = off,
            wms = Seq(ts(run)))),
          nextOffset = nextOut(tag), prevCheckpointPath = prev,
          newCheckpointPath = s"$dir/cp$run",
          newDataPath = s"$dir/out$run.parquet"))
        nextOut += tag -> resp.newOffsetInterval.map(_.end + 1).getOrElse(nextOut(tag))
        s"$dir/cp$run"
      }
      prevF = Some(drive("f", dirF, inF, qFast, prevF))
      prevC = Some(drive("c", dirC, inC, qSlow, prevC))
      off += n
      import org.apache.spark.sql.functions.col
      val sel = Seq("offset", "op", "event_time", "symbol", "total", "sd")
      val outF = readOut(s"$dirF/out$run.parquet").orderBy("offset")
        .select(sel.map(col): _*).collect().toSeq
      val outC = readOut(s"$dirC/out$run.parquet").orderBy("offset")
        .withColumnRenamed("sym", "symbol")
        .select(sel.map(col): _*).collect().toSeq
      assert(outF == outC, s"run $run diverged:\nF=$outF\nC=$outC")
    }
  }

  test("nested aggregation: narrowed and full recompute emit identical changelogs") {
    import spark.implicits._
    // GROUP BY over GROUP BY — no merge algebra exists for the nested
    // shape, so both queries recompute; qFast's shared raw `symbol` column
    // activates the touched-partition narrowing (both stages partition by
    // it), while qSlow's inner `symbol AS sym` rename (same raw values,
    // re-defined name) withholds it. Seeded slices with retractions on
    // runs 3 and 5 — narrowed and full recompute must emit identical
    // changelogs throughout.
    val rnd = new scala.util.Random(43)
    val dirF = tmp(); val dirC = tmp()
    val qFast = """SELECT symbol, max(event_time) AS event_time,
                  |  max(s) AS mx, count(*) AS n_groups
                  |FROM (SELECT symbol, event_time, sum(price) AS s
                  |      FROM tickers GROUP BY symbol, event_time)
                  |GROUP BY symbol""".stripMargin
    val qSlow = """SELECT sym, max(event_time) AS event_time,
                  |  max(s) AS mx, count(*) AS n_groups
                  |FROM (SELECT symbol AS sym, event_time, sum(price) AS s
                  |      FROM tickers GROUP BY symbol, event_time)
                  |GROUP BY sym""".stripMargin
    var off = 0L; var nextOut = Map("f" -> 0L, "c" -> 0L)
    var prevF: Option[String] = None; var prevC: Option[String] = None
    var history = Vector.empty[EngineFixtures.Ticker]
    (1 to 6).foreach { run =>
      val nRows = 1 + rnd.nextInt(4)
      val appends = (0 until nRows).map { i =>
        Ticker(off + i, Op.Append, t(ts(run)), t(ts(1 + rnd.nextInt(3))),
          ("A".head + rnd.nextInt(3)).toChar.toString, 1 + rnd.nextInt(50))
      }
      val retracts =
        if (run == 3 || run == 5) {
          val victim = history(rnd.nextInt(history.size))
          history = history.filterNot(_ == victim)
          Seq(victim.copy(offset = off + nRows, op = Op.Retract,
            system_time = t(ts(run))))
        } else Nil
      history ++= appends
      val slices = appends ++ retracts
      val n = slices.length
      val inF = s"$dirF/in$run.parquet"; val inC = s"$dirC/in$run.parquet"
      writeSlice(slices, inF); writeSlice(slices, inC)
      def drive(tag: String, dir: java.nio.file.Path, in: String, q: String,
          prev: Option[String]): String = {
        val resp = runT(TransformRequest(
          "did:out", "out", ts(run + 10), DatasetVocabulary(),
          transform(None -> q),
          Vector(mkInput("tickers", in, in, n, startOffset = off,
            wms = Seq(ts(run)))),
          nextOffset = nextOut(tag), prevCheckpointPath = prev,
          newCheckpointPath = s"$dir/cp$run",
          newDataPath = s"$dir/out$run.parquet"))
        nextOut += tag -> resp.newOffsetInterval.map(_.end + 1).getOrElse(nextOut(tag))
        s"$dir/cp$run"
      }
      prevF = Some(drive("f", dirF, inF, qFast, prevF))
      prevC = Some(drive("c", dirC, inC, qSlow, prevC))
      off += n
      import org.apache.spark.sql.functions.col
      val sel = Seq("offset", "op", "symbol", "mx", "n_groups")
      val outF = readOut(s"$dirF/out$run.parquet").orderBy("offset")
        .select(sel.map(col): _*).collect().toSeq
      val outC = readOut(s"$dirC/out$run.parquet").orderBy("offset")
        .withColumnRenamed("sym", "symbol")
        .select(sel.map(col): _*).collect().toSeq
      assert(outF == outC, s"run $run diverged:\nF=$outF\nC=$outC")
    }
  }

  test("decimal avg in HAVING keeps the recompute path (division gate)") {
    import spark.implicits._
    // avg over decimal rounds to scale s+4; a sum/count division follows
    // decimal-quotient precision rules instead, so the executor's
    // analyzed-schema gate must route decimal inputs to recompute — no
    // agg_partials merge state — and still produce the right changelog.
    val dir = tmp()
    val q = """SELECT max(event_time) as event_time, symbol,
              |  sum(price) as total
              |FROM tickers GROUP BY symbol HAVING avg(price) >= 8""".stripMargin
    val in1 = s"$dir/in1.parquet"
    writeSlice(Seq(EngineFixtures.DecTicker(
      0, Op.Append, t(ts(1)), t(ts(1)), "A", BigDecimal(10))), in1)
    val r1 = runT(TransformRequest(
      "did:out", "out", ts(10), DatasetVocabulary(),
      transform(None -> q),
      Vector(mkInput("tickers", in1, in1, 1, wms = Seq(ts(1)))),
      nextOffset = 0, prevCheckpointPath = None,
      newCheckpointPath = s"$dir/cp1", newDataPath = s"$dir/out1.parquet"))
    assert(r1.newOffsetInterval.contains(OffsetInterval(0, 0)))
    val out1 = readOut(s"$dir/out1.parquet").collect()
    assert(out1.map(r => (r.getAs[String]("symbol"),
      r.getAs[java.math.BigDecimal]("total").doubleValue,
      r.getAs[Int]("op"))).toSeq == Seq(("A", 10.0, Op.Append)))

    val in2 = s"$dir/in2.parquet"
    writeSlice(Seq(EngineFixtures.DecTicker(
      1, Op.Append, t(ts(2)), t(ts(2)), "A", BigDecimal(2))), in2)
    val r2 = runT(TransformRequest(
      "did:out", "out", ts(11), DatasetVocabulary(),
      transform(None -> q),
      Vector(mkInput("tickers", in2, in2, 1, startOffset = 1, wms = Seq(ts(2)))),
      nextOffset = 1, prevCheckpointPath = Some(s"$dir/cp1"),
      newCheckpointPath = s"$dir/cp2", newDataPath = s"$dir/out2.parquet"))
    assert(r2.newOffsetInterval.contains(OffsetInterval(1, 1)))
    // avg dropped to 6 < 8: the group leaves the visible set as a retract
    val out2 = readOut(s"$dir/out2.parquet").collect()
    assert(out2.map(r => (r.getAs[String]("symbol"),
      r.getAs[java.math.BigDecimal]("total").doubleValue,
      r.getAs[Int]("op"))).toSeq == Seq(("A", 10.0, Op.Retract)))
    // the gate kept the merge state off disk on both runs
    assert(!Files.exists(Paths.get(s"$dir/cp1/agg_partials")))
    assert(!Files.exists(Paths.get(s"$dir/cp2/agg_partials")))
  }

  test("avg+HAVING merge path and recompute emit identical changelogs") {
    import spark.implicits._
    // Round-3 VERDICT item 3: avg decomposes to sum+count partials and a
    // HAVING over output columns filters post-merge. Seeded random
    // append-only slices through the mergeable shape and a value-identical
    // ineligible shape (`avg(price) + 0` forces recompute); run 4 carries a
    // retraction, covering the merge→recompute flip (the recompute diffs
    // against the VISIBLE snapshot, so groups the HAVING filtered out of
    // the stream must not resurface as spurious -D rows).
    val rnd = new scala.util.Random(11)
    val dirF = tmp(); val dirC = tmp()
    val qFast = """SELECT max(event_time) as event_time, symbol,
                  |  avg(price) as ap, sum(price) as total
                  |FROM tickers GROUP BY symbol HAVING total > 60""".stripMargin
    val qSlow = """SELECT max(event_time) as event_time, symbol,
                  |  avg(price) + stddev_pop(price) * 0 as ap, sum(price) as total
                  |FROM tickers GROUP BY symbol HAVING total > 60""".stripMargin
    var off = 0L; var nextOut = Map("f" -> 0L, "c" -> 0L)
    var prevF: Option[String] = None; var prevC: Option[String] = None
    var run1Head: Option[EngineFixtures.Ticker] = None
    (1 to 5).foreach { run =>
      val nRows = 1 + rnd.nextInt(5)
      val appends = (0 until nRows).map { i =>
        Ticker(off + i, Op.Append, t(ts(run)), t(ts(run)),
          ("A".head + rnd.nextInt(4)).toChar.toString, 1 + rnd.nextInt(50))
      }
      if (run == 1) run1Head = Some(appends.head)
      // run 4 retracts run 1's first row (payload replayed verbatim)
      val slices = appends ++ (if (run == 4) Seq(run1Head.get.copy(
        offset = off + nRows, op = Op.Retract, system_time = t(ts(run))))
      else Nil)
      val n = slices.length
      val inF = s"$dirF/in$run.parquet"; val inC = s"$dirC/in$run.parquet"
      writeSlice(slices, inF); writeSlice(slices, inC)
      def drive(tag: String, dir: java.nio.file.Path, in: String, q: String,
          prev: Option[String]): String = {
        val resp = runT(TransformRequest(
          "did:out", "out", ts(run + 10), DatasetVocabulary(),
          transform(None -> q),
          Vector(mkInput("tickers", in, in, n, startOffset = off,
            wms = Seq(ts(run)))),
          nextOffset = nextOut(tag), prevCheckpointPath = prev,
          newCheckpointPath = s"$dir/cp$run",
          newDataPath = s"$dir/out$run.parquet"))
        nextOut += tag -> resp.newOffsetInterval.map(_.end + 1).getOrElse(nextOut(tag))
        s"$dir/cp$run"
      }
      prevF = Some(drive("f", dirF, inF, qFast, prevF))
      prevC = Some(drive("c", dirC, inC, qSlow, prevC))
      off += n
      val sel = Seq("offset", "op", "event_time", "symbol", "ap", "total")
      val outF = readOut(s"$dirF/out$run.parquet").orderBy("offset")
        .select(sel.map(org.apache.spark.sql.functions.col): _*).collect().toSeq
      val outC = readOut(s"$dirC/out$run.parquet").orderBy("offset")
        .select(sel.map(org.apache.spark.sql.functions.col): _*).collect().toSeq
      assert(outF == outC, s"run $run diverged:\nF=$outF\nC=$outC")
    }
  }

  test("rank touched-partition path and full recompute emit identical changelogs") {
    import spark.implicits._
    // Seeded random slices through two chains: a TWO-STEP partitioned
    // dedup-latest (passthrough view then rank — touched-partition
    // narrowing resolves through the pre-step chain) and a value-identical
    // CTE-wrapped variant (WITH bodies are never classified through → full
    // recompute). Run 4 carries a retraction, covering net-then-narrow
    // against net-then-full.
    val rnd = new scala.util.Random(7)
    val dirF = tmp(); val dirC = tmp()
    val rank = """SELECT event_time, symbol, price, rn FROM (
                 |  SELECT event_time, symbol, price, row_number() OVER (
                 |    PARTITION BY symbol
                 |    ORDER BY event_time DESC, price DESC, offset DESC) AS rn
                 |  FROM %s) WHERE rn = 1""".stripMargin
    val qFast = Seq(
      Some("v") -> "SELECT * FROM tickers",
      None -> rank.format("v"))
    val qSlow = Seq(
      None -> s"WITH v AS (SELECT * FROM tickers)\n${rank.format("v")}")
    var off = 0L; var nextOut = Map("f" -> 0L, "c" -> 0L)
    var prevF: Option[String] = None; var prevC: Option[String] = None
    var firstRow: Ticker = null
    (1 to 4).foreach { run =>
      val appends = (0 until 1 + rnd.nextInt(4)).map { i =>
        Ticker(off + i, Op.Append, t(ts(run)), t(ts(run)),
          ("A".head + rnd.nextInt(4)).toChar.toString, 1 + rnd.nextInt(100))
      }
      val rows =
        if (run == 4)
          Ticker(off, Op.Retract, t(ts(run)), firstRow.event_time,
            firstRow.symbol, firstRow.price) +:
            appends.map(r => r.copy(offset = r.offset + 1))
        else appends
      if (run == 1) firstRow = rows.head
      val nRows = rows.length
      val inF = s"$dirF/in$run.parquet"; val inC = s"$dirC/in$run.parquet"
      writeSlice(rows, inF); writeSlice(rows, inC)
      def drive(tag: String, dir: java.nio.file.Path, in: String,
          qs: Seq[(Option[String], String)], prev: Option[String]): String = {
        val resp = runT(TransformRequest(
          "did:out", "out", ts(run + 10), DatasetVocabulary(),
          transform(qs: _*),
          Vector(mkInput("tickers", in, in, nRows, startOffset = off,
            wms = Seq(ts(run)))),
          nextOffset = nextOut(tag), prevCheckpointPath = prev,
          newCheckpointPath = s"$dir/cp$run",
          newDataPath = s"$dir/out$run.parquet"))
        nextOut += tag -> resp.newOffsetInterval.map(_.end + 1).getOrElse(nextOut(tag))
        s"$dir/cp$run"
      }
      prevF = Some(drive("f", dirF, inF, qFast, prevF))
      prevC = Some(drive("c", dirC, inC, qSlow, prevC))
      off += nRows
      val sel = Seq("offset", "op", "event_time", "symbol", "price", "rn")
      val outF = readOut(s"$dirF/out$run.parquet").orderBy("offset")
        .select(sel.map(org.apache.spark.sql.functions.col): _*).collect().toSeq
      val outC = readOut(s"$dirC/out$run.parquet").orderBy("offset")
        .select(sel.map(org.apache.spark.sql.functions.col): _*).collect().toSeq
      assert(outF == outC, s"run $run diverged")
      assert(outF.nonEmpty || run != 1)
    }
  }

  test("inner join emits cross-slice matches as appends across runs") {
    import spark.implicits._
    val dir = tmp()
    val q = """SELECT o.event_time as event_time, o.order_id, o.quantity,
              |  s.num_shipped
              |FROM orders o JOIN shipments s ON o.order_id = s.order_id""".stripMargin
    val o1 = s"$dir/o1.parquet"; val s1 = s"$dir/s1.parquet"
    writeSlice(Seq(
      OrderRow(0, 0, t(ts(1)), t(ts(1)), 1, 10),
      OrderRow(1, 0, t(ts(1)), t(ts(1)), 2, 20)), o1)
    writeSlice(Seq(Shipment(0, 0, t(ts(1)), t(ts(1)), 2, 20)), s1)
    val r1 = runT(TransformRequest(
      "did:out", "out", ts(10), DatasetVocabulary(),
      transform(None -> q),
      Vector(
        mkInput("orders", o1, o1, 2, wms = Seq(ts(1))),
        mkInput("shipments", s1, s1, 1, wms = Seq(ts(1)))),
      nextOffset = 0, prevCheckpointPath = None,
      newCheckpointPath = s"$dir/cp1", newDataPath = s"$dir/out1.parquet"))
    assert(r1.newOffsetInterval.contains(OffsetInterval(0, 0)))
    val out1 = readOut(s"$dir/out1.parquet").collect()
    assert(out1.map(r => (r.getAs[Long]("order_id"), r.getAs[Int]("op"))).toSeq ==
      Seq((2L, Op.Append)))

    // run 2: a shipment for order 1 arrives — must join the BUFFERED order
    // from run 1, emitting exactly the new pair (no re-emission of order 2)
    val s2 = s"$dir/s2.parquet"
    writeSlice(Seq(Shipment(1, 0, t(ts(2)), t(ts(2)), 1, 10)), s2)
    val r2 = runT(TransformRequest(
      "did:out", "out", ts(11), DatasetVocabulary(),
      transform(None -> q),
      Vector(
        mkInput("orders", null, o1, 0, wms = Seq(ts(2))),
        mkInput("shipments", s2, s2, 1, startOffset = 1, wms = Seq(ts(2)))),
      nextOffset = 1, prevCheckpointPath = Some(s"$dir/cp1"),
      newCheckpointPath = s"$dir/cp2", newDataPath = s"$dir/out2.parquet"))
    assert(r2.newOffsetInterval.contains(OffsetInterval(1, 1)))
    val out2 = readOut(s"$dir/out2.parquet").collect()
    assert(out2.map(r => (r.getAs[Long]("order_id"), r.getAs[Long]("num_shipped"),
      r.getAs[Int]("op"))).toSeq == Seq((1L, 10L, Op.Append)))

    // run 3: watermark-only on both inputs — nothing can join, nothing emits
    val r3 = runT(TransformRequest(
      "did:out", "out", ts(12), DatasetVocabulary(),
      transform(None -> q),
      Vector(
        mkInput("orders", null, o1, 0, wms = Seq(ts(3))),
        mkInput("shipments", null, s1, 0, wms = Seq(ts(3)))),
      nextOffset = 2, prevCheckpointPath = Some(s"$dir/cp2"),
      newCheckpointPath = s"$dir/cp3", newDataPath = s"$dir/out3.parquet"))
    assert(r3.newOffsetInterval.isEmpty)
    assert(r3.newWatermark.contains(ts(3)))
  }

  test("delta join resolves through a stateless pre-step chain end to end") {
    import spark.implicits._
    val dir = tmp()
    // pre-step derives/filters the left side; the join's delta must still
    // consult run-1's BUFFERED orders when the matching shipment arrives
    val qs = Seq(
      Some("big") -> "SELECT event_time, order_id, quantity FROM orders WHERE quantity >= 10",
      None -> ("SELECT big.event_time as event_time, big.order_id, big.quantity, " +
        "s.num_shipped FROM big JOIN shipments s ON big.order_id = s.order_id"))
    val o1 = s"$dir/o1.parquet"; val s1 = s"$dir/s1.parquet"
    writeSlice(Seq(
      OrderRow(0, 0, t(ts(1)), t(ts(1)), 1, 10),
      OrderRow(1, 0, t(ts(1)), t(ts(1)), 2, 3)), o1) // order 2 filtered out
    writeSlice(Seq(Shipment(0, 0, t(ts(1)), t(ts(1)), 2, 20)), s1)
    val r1 = runT(TransformRequest(
      "did:out", "out", ts(10), DatasetVocabulary(),
      transform(qs: _*),
      Vector(
        mkInput("orders", o1, o1, 2, wms = Seq(ts(1))),
        mkInput("shipments", s1, s1, 1, wms = Seq(ts(1)))),
      nextOffset = 0, prevCheckpointPath = None,
      newCheckpointPath = s"$dir/cp1", newDataPath = s"$dir/out1.parquet"))
    // shipment 2's order was filtered by the pre-step: nothing joins
    assert(r1.newOffsetInterval.isEmpty)

    // run 2: shipment for order 1 — joins the buffered order THROUGH the
    // pre-step derivation
    val s2 = s"$dir/s2.parquet"
    writeSlice(Seq(Shipment(1, 0, t(ts(2)), t(ts(2)), 1, 10)), s2)
    val r2 = runT(TransformRequest(
      "did:out", "out", ts(11), DatasetVocabulary(),
      transform(qs: _*),
      Vector(
        mkInput("orders", null, o1, 0, wms = Seq(ts(2))),
        mkInput("shipments", s2, s2, 1, startOffset = 1, wms = Seq(ts(2)))),
      nextOffset = 0, prevCheckpointPath = Some(s"$dir/cp1"),
      newCheckpointPath = s"$dir/cp2", newDataPath = s"$dir/out2.parquet"))
    assert(r2.newOffsetInterval.contains(OffsetInterval(0, 0)))
    val o2 = readOut(s"$dir/out2.parquet").collect()
    assert(o2.map(r => (r.getAs[Long]("order_id"), r.getAs[Long]("num_shipped"),
      r.getAs[Int]("op"))).toSeq == Seq((1L, 10L, Op.Append)))
  }

  test("aggregate above a join updates groups as later rows join buffered state") {
    import spark.implicits._
    val dir = tmp()
    val q = """SELECT max(o.event_time) as event_time, o.order_id as order_id,
              |  count(*) as n, sum(s.num_shipped) as shipped
              |FROM orders o JOIN shipments s ON o.order_id = s.order_id
              |GROUP BY o.order_id""".stripMargin
    val o1 = s"$dir/o1.parquet"; val s1 = s"$dir/s1.parquet"
    writeSlice(Seq(OrderRow(0, 0, t(ts(1)), t(ts(1)), 1, 10)), o1)
    writeSlice(Seq(Shipment(0, 0, t(ts(1)), t(ts(1)), 1, 5)), s1)
    val r1 = runT(TransformRequest(
      "did:out", "out", ts(10), DatasetVocabulary(),
      transform(None -> q),
      Vector(
        mkInput("orders", o1, o1, 1, wms = Seq(ts(1))),
        mkInput("shipments", s1, s1, 1, wms = Seq(ts(1)))),
      nextOffset = 0, prevCheckpointPath = None,
      newCheckpointPath = s"$dir/cp1", newDataPath = s"$dir/out1.parquet"))
    assert(r1.newOffsetInterval.contains(OffsetInterval(0, 0)))
    val out1 = readOut(s"$dir/out1.parquet").collect()
    assert(out1.map(r => (r.getAs[Long]("order_id"), r.getAs[Long]("n"),
      r.getAs[Long]("shipped"), r.getAs[Int]("op"))).toSeq ==
      Seq((1L, 1L, 5L, Op.Append)))

    // run 2: a second shipment for order 1 only — the delta pass must join
    // the BUFFERED order and update the group as -U/+U
    val s2 = s"$dir/s2.parquet"
    writeSlice(Seq(Shipment(1, 0, t(ts(2)), t(ts(2)), 1, 7)), s2)
    val r2 = runT(TransformRequest(
      "did:out", "out", ts(11), DatasetVocabulary(),
      transform(None -> q),
      Vector(
        mkInput("orders", null, o1, 0, wms = Seq(ts(2))),
        mkInput("shipments", s2, s2, 1, startOffset = 1, wms = Seq(ts(2)))),
      nextOffset = 1, prevCheckpointPath = Some(s"$dir/cp1"),
      newCheckpointPath = s"$dir/cp2", newDataPath = s"$dir/out2.parquet"))
    assert(r2.newOffsetInterval.contains(OffsetInterval(1, 2)))
    val out2 = readOut(s"$dir/out2.parquet").orderBy("offset").collect()
    assert(out2.map(r => (r.getAs[Long]("order_id"), r.getAs[Long]("n"),
      r.getAs[Long]("shipped"), r.getAs[Int]("op"))).toSeq ==
      Seq((1L, 1L, 5L, Op.CorrectFrom), (1L, 2L, 12L, Op.CorrectTo)))
  }

  test("avg+HAVING above a join merges partials per delta term") {
    import spark.implicits._
    // avg splits into sum+count partials and HAVING filters post-merge —
    // here the partials come from the JOIN's delta terms. Run 2's shipment
    // pushes group 1 over the HAVING threshold: it must surface as +I
    // (state held its sub-threshold partials; the stream never saw it).
    val dir = tmp()
    val q = """SELECT max(o.event_time) as event_time, o.order_id as order_id,
              |  avg(s.num_shipped) as avg_shipped
              |FROM orders o JOIN shipments s ON o.order_id = s.order_id
              |GROUP BY o.order_id HAVING avg_shipped > 6""".stripMargin
    val o1 = s"$dir/o1.parquet"; val s1 = s"$dir/s1.parquet"
    writeSlice(Seq(OrderRow(0, 0, t(ts(1)), t(ts(1)), 1, 10)), o1)
    writeSlice(Seq(Shipment(0, 0, t(ts(1)), t(ts(1)), 1, 4)), s1)
    val r1 = runT(TransformRequest(
      "did:out", "out", ts(10), DatasetVocabulary(),
      transform(None -> q),
      Vector(
        mkInput("orders", o1, o1, 1, wms = Seq(ts(1))),
        mkInput("shipments", s1, s1, 1, wms = Seq(ts(1)))),
      nextOffset = 0, prevCheckpointPath = None,
      newCheckpointPath = s"$dir/cp1", newDataPath = s"$dir/out1.parquet"))
    // avg 4 <= 6: group stays sub-threshold, nothing emits
    assert(r1.newOffsetInterval.isEmpty)

    // run 2: second shipment lifts avg to (4+10)/2 = 7 > 6 → +I
    val s2 = s"$dir/s2.parquet"
    writeSlice(Seq(Shipment(1, 0, t(ts(2)), t(ts(2)), 1, 10)), s2)
    val r2 = runT(TransformRequest(
      "did:out", "out", ts(11), DatasetVocabulary(),
      transform(None -> q),
      Vector(
        mkInput("orders", null, o1, 0, wms = Seq(ts(2))),
        mkInput("shipments", s2, s2, 1, startOffset = 1, wms = Seq(ts(2)))),
      nextOffset = 0, prevCheckpointPath = Some(s"$dir/cp1"),
      newCheckpointPath = s"$dir/cp2", newDataPath = s"$dir/out2.parquet"))
    assert(r2.newOffsetInterval.contains(OffsetInterval(0, 0)))
    val out2 = readOut(s"$dir/out2.parquet").collect()
    assert(out2.map(r => (r.getAs[Long]("order_id"),
      r.getAs[Double]("avg_shipped"), r.getAs[Int]("op"))).toSeq ==
      Seq((1L, 7.0, Op.Append)))
  }

  test("agg-over-join merge path and recompute emit identical changelogs") {
    import spark.implicits._
    // Seeded random append-only slices on TWO inputs through the mergeable
    // aggregate-above-inner-join shape (join-delta partials merged into
    // state) and a value-identical ineligible variant (`sum(...) + 0`
    // forces recompute; both diff keyed on the group key). Run 4 retracts
    // a run-1 order, covering the merge → net-and-recompute flip against
    // the merge-maintained snapshot. Slices may be empty for either input
    // (watermark-only advances).
    val rnd = new scala.util.Random(37)
    val dirF = tmp(); val dirC = tmp()
    def q(sum: String) =
      s"""SELECT max(o.event_time) as event_time, o.order_id as order_id,
         |  count(*) as n, $sum as shipped
         |FROM orders o JOIN shipments s ON o.order_id = s.order_id
         |GROUP BY o.order_id""".stripMargin
    val qFast = q("sum(s.num_shipped)")
    val qSlow = q("CAST(sum(s.num_shipped) + stddev_pop(s.num_shipped) * 0 AS BIGINT)")
    var offA = 0L; var offB = 0L
    var nextOut = Map("f" -> 0L, "c" -> 0L)
    var prevF: Option[String] = None; var prevC: Option[String] = None
    var firstOrder: OrderRow = null
    (1 to 5).foreach { run =>
      val nA0 = if (run == 1) 2 else rnd.nextInt(3)
      val nB = if (run == 1) 1 + rnd.nextInt(2) else rnd.nextInt(3)
      val orders = (0 until nA0).map { i =>
        OrderRow(offA + i, Op.Append, t(ts(run)), t(ts(run)),
          1 + rnd.nextInt(3), 10 * (1 + rnd.nextInt(5)))
      }
      if (run == 1) firstOrder = orders.head
      val orderSlice =
        if (run == 4)
          orders :+ OrderRow(offA + nA0, Op.Retract, t(ts(run)),
            firstOrder.event_time, firstOrder.order_id, firstOrder.quantity)
        else orders
      val ships = (0 until nB).map { i =>
        Shipment(offB + i, Op.Append, t(ts(run)), t(ts(run)),
          1 + rnd.nextInt(3), 5 * (1 + rnd.nextInt(4)))
      }
      val nA = orderSlice.length
      def stage(dir: java.nio.file.Path): (String, String) = {
        val o = s"$dir/o$run.parquet"; val s = s"$dir/s$run.parquet"
        if (nA > 0) writeSlice(orderSlice, o)
        if (nB > 0) writeSlice(ships, s)
        (o, s)
      }
      val (oF, sF) = stage(dirF); val (oC, sC) = stage(dirC)
      def drive(tag: String, dir: java.nio.file.Path, o: String, s: String,
          q: String, prev: Option[String]): String = {
        val resp = runT(TransformRequest(
          "did:out", "out", ts(run + 10), DatasetVocabulary(),
          transform(None -> q),
          Vector(
            mkInput("orders", if (nA > 0) o else null,
              s"$dir/o1.parquet", nA, startOffset = offA, wms = Seq(ts(run))),
            mkInput("shipments", if (nB > 0) s else null,
              s"$dir/s1.parquet", nB, startOffset = offB, wms = Seq(ts(run)))),
          nextOffset = nextOut(tag), prevCheckpointPath = prev,
          newCheckpointPath = s"$dir/cp$run",
          newDataPath = s"$dir/out$run.parquet"))
        nextOut += tag -> resp.newOffsetInterval.map(_.end + 1).getOrElse(nextOut(tag))
        s"$dir/cp$run"
      }
      prevF = Some(drive("f", dirF, oF, sF, qFast, prevF))
      prevC = Some(drive("c", dirC, oC, sC, qSlow, prevC))
      offA += nA; offB += nB
      val sel = Seq("offset", "op", "event_time", "order_id", "n", "shipped")
      def readRun(dir: java.nio.file.Path): Seq[org.apache.spark.sql.Row] = {
        val p = s"$dir/out$run.parquet"
        if (java.nio.file.Files.exists(java.nio.file.Paths.get(p)))
          readOut(p).orderBy("offset")
            .select(sel.map(org.apache.spark.sql.functions.col): _*).collect().toSeq
        else Seq.empty
      }
      val outF = readRun(dirF); val outC = readRun(dirC)
      assert(outF == outC, s"run $run diverged:\nF=$outF\nC=$outC")
    }
    // the random schedule must have produced joined, aggregated output
    assert(nextOut("f") > 0)
  }

  test("left join retracts the null-padded row when the match arrives") {
    import spark.implicits._
    val dir = tmp()
    val q = """SELECT o.event_time as event_time, o.order_id as order_id,
              |  o.quantity as quantity, s.num_shipped as num_shipped
              |FROM orders o LEFT JOIN shipments s ON o.order_id = s.order_id""".stripMargin
    val o1 = s"$dir/o1.parquet"; val s1 = s"$dir/s1.parquet"
    writeSlice(Seq(
      OrderRow(0, 0, t(ts(1)), t(ts(1)), 1, 10),
      OrderRow(1, 0, t(ts(1)), t(ts(1)), 2, 20)), o1)
    writeSlice(Seq(Shipment(0, 0, t(ts(1)), t(ts(1)), 1, 5)), s1)
    val r1 = runT(TransformRequest(
      "did:out", "out", ts(10), DatasetVocabulary(),
      transform(None -> q),
      Vector(
        mkInput("orders", o1, o1, 2, wms = Seq(ts(1))),
        mkInput("shipments", s1, s1, 1, wms = Seq(ts(1)))),
      nextOffset = 0, prevCheckpointPath = None,
      newCheckpointPath = s"$dir/cp1", newDataPath = s"$dir/out1.parquet"))
    assert(r1.newOffsetInterval.contains(OffsetInterval(0, 1)))
    val out1 = readOut(s"$dir/out1.parquet").orderBy("offset").collect()
    // order 1 pairs; order 2 emits null-padded
    assert(out1.map(r => (r.getAs[Long]("order_id"), r.getAs[Any]("num_shipped"),
      r.getAs[Int]("op"))).toSeq ==
      Seq((1L, 5L, Op.Append), (2L, null, Op.Append)))

    // run 2: shipment for order 2 — its null-padded row retracts, pair appends
    val s2 = s"$dir/s2.parquet"
    writeSlice(Seq(Shipment(1, 0, t(ts(2)), t(ts(2)), 2, 7)), s2)
    val r2 = runT(TransformRequest(
      "did:out", "out", ts(11), DatasetVocabulary(),
      transform(None -> q),
      Vector(
        mkInput("orders", null, o1, 0, wms = Seq(ts(2))),
        mkInput("shipments", s2, s2, 1, startOffset = 1, wms = Seq(ts(2)))),
      nextOffset = 2, prevCheckpointPath = Some(s"$dir/cp1"),
      newCheckpointPath = s"$dir/cp2", newDataPath = s"$dir/out2.parquet"))
    assert(r2.newOffsetInterval.contains(OffsetInterval(2, 3)))
    val out2 = readOut(s"$dir/out2.parquet").orderBy("offset").collect()
    // emission sorts value columns asc (nulls first): the retracted
    // null-padded row takes the lower offset
    assert(out2.map(r => (r.getAs[Long]("order_id"), r.getAs[Any]("num_shipped"),
      r.getAs[Int]("op"))).toSeq ==
      Seq((2L, null, Op.Retract), (2L, 7L, Op.Append)))

    // run 3: another shipment for order 2 — pair only, NO second retraction
    val s3 = s"$dir/s3.parquet"
    writeSlice(Seq(Shipment(2, 0, t(ts(3)), t(ts(3)), 2, 9)), s3)
    val r3 = runT(TransformRequest(
      "did:out", "out", ts(12), DatasetVocabulary(),
      transform(None -> q),
      Vector(
        mkInput("orders", null, o1, 0, wms = Seq(ts(3))),
        mkInput("shipments", s3, s3, 1, startOffset = 2, wms = Seq(ts(3)))),
      nextOffset = 4, prevCheckpointPath = Some(s"$dir/cp2"),
      newCheckpointPath = s"$dir/cp3", newDataPath = s"$dir/out3.parquet"))
    assert(r3.newOffsetInterval.contains(OffsetInterval(4, 4)))
    val out3 = readOut(s"$dir/out3.parquet").collect()
    assert(out3.map(r => (r.getAs[Long]("order_id"), r.getAs[Any]("num_shipped"),
      r.getAs[Int]("op"))).toSeq == Seq((2L, 9L, Op.Append)))
  }

  test("left-join delta with cross-typed equi key does not mis-narrow state") {
    // The ON condition compares a STRING left key to an INT right key, so
    // SQL resolves the equality by numeric coercion — but a key range
    // computed under the string's native ordering is inverted for "9" vs
    // "10" (min="10", max="9"), and a BETWEEN narrowing with those bounds
    // would silently filter out genuinely matching state rows. Cross-typed
    // equi conjuncts must therefore yield NO narrowing: run 2's delta-left
    // pass has to find both run-1 buffered shipments.
    import spark.implicits._
    val dir = tmp()
    val q = """SELECT o.event_time as event_time, o.str_key as str_key,
              |  o.quantity as quantity, s.num_shipped as num_shipped
              |FROM orders o LEFT JOIN shipments s ON o.str_key = s.int_key""".stripMargin
    val o1 = s"$dir/o1.parquet"; val s1 = s"$dir/s1.parquet"
    writeSlice(Seq(StrOrder(0, 0, t(ts(1)), t(ts(1)), "5", 50)), o1)
    writeSlice(Seq(
      IntShip(0, 0, t(ts(1)), t(ts(1)), 9, 5),
      IntShip(1, 0, t(ts(1)), t(ts(1)), 10, 7)), s1)
    runT(TransformRequest(
      "did:out", "out", ts(10), DatasetVocabulary(),
      transform(None -> q),
      Vector(
        mkInput("orders", o1, o1, 1, wms = Seq(ts(1))),
        mkInput("shipments", s1, s1, 2, wms = Seq(ts(1)))),
      nextOffset = 0, prevCheckpointPath = None,
      newCheckpointPath = s"$dir/cp1", newDataPath = s"$dir/out1.parquet"))
    val out1 = readOut(s"$dir/out1.parquet").collect()
    assert(out1.map(r => (r.getAs[String]("str_key"),
      r.getAs[Any]("num_shipped"), r.getAs[Int]("op"))).toSet ==
      Set(("5", null, Op.Append)))

    // run 2: ΔA = {"9", "10"} — exactly the pair whose string min/max is
    // inverted relative to the numeric key order of the buffered state
    val o2 = s"$dir/o2.parquet"
    writeSlice(Seq(
      StrOrder(1, 0, t(ts(2)), t(ts(2)), "9", 90),
      StrOrder(2, 0, t(ts(2)), t(ts(2)), "10", 100)), o2)
    runT(TransformRequest(
      "did:out", "out", ts(11), DatasetVocabulary(),
      transform(None -> q),
      Vector(
        mkInput("orders", o2, o1, 2, startOffset = 1, wms = Seq(ts(2))),
        mkInput("shipments", null, s1, 0, wms = Seq(ts(2)))),
      nextOffset = 1, prevCheckpointPath = Some(s"$dir/cp1"),
      newCheckpointPath = s"$dir/cp2", newDataPath = s"$dir/out2.parquet"))
    val out2 = readOut(s"$dir/out2.parquet").collect()
    assert(out2.map(r => (r.getAs[String]("str_key"),
      r.getAs[Any]("num_shipped"), r.getAs[Int]("op"))).toSet ==
      Set(("9", 5L, Op.Append), ("10", 7L, Op.Append)),
      s"cross-typed key narrowing lost matching state rows: ${out2.toSeq}")
  }

  test("left-join delta path and recompute path emit identical changelogs") {
    import spark.implicits._
    // Seeded random append-only slices on TWO inputs through the
    // single-step left join (delta path with matched-state) and a
    // value-identical CTE-wrapped variant (recompute + multiset diff).
    // Run 4 retracts a run-1 order, covering the delta → net-and-recompute
    // flip against the delta-maintained snapshot (including the exceptAll
    // null-pad replacement). Slices may be empty for either input.
    val rnd = new scala.util.Random(59)
    val dirF = tmp(); val dirC = tmp()
    val join = """SELECT o.event_time as event_time, o.order_id, o.quantity,
                 |  s.num_shipped
                 |FROM orders o LEFT JOIN shipments s ON o.order_id = s.order_id""".stripMargin
    val qFast = join
    val qSlow = s"WITH j AS ($join)\nSELECT event_time, order_id, quantity, num_shipped FROM j"
    var offA = 0L; var offB = 0L
    var nextOut = Map("f" -> 0L, "c" -> 0L)
    var prevF: Option[String] = None; var prevC: Option[String] = None
    var firstOrder: OrderRow = null
    (1 to 5).foreach { run =>
      val nA0 = if (run == 1) 2 else rnd.nextInt(3)
      val nB = if (run == 1) 1 + rnd.nextInt(2) else rnd.nextInt(3)
      val orders = (0 until nA0).map { i =>
        OrderRow(offA + i, Op.Append, t(ts(run)), t(ts(run)),
          1 + rnd.nextInt(3), 10 * (1 + rnd.nextInt(5)))
      }
      if (run == 1) firstOrder = orders.head
      val orderSlice =
        if (run == 4)
          orders :+ OrderRow(offA + nA0, Op.Retract, t(ts(run)),
            firstOrder.event_time, firstOrder.order_id, firstOrder.quantity)
        else orders
      val ships = (0 until nB).map { i =>
        Shipment(offB + i, Op.Append, t(ts(run)), t(ts(run)),
          1 + rnd.nextInt(3), 5 * (1 + rnd.nextInt(4)))
      }
      val nA = orderSlice.length
      def stage(dir: java.nio.file.Path): (String, String) = {
        val o = s"$dir/o$run.parquet"; val s = s"$dir/s$run.parquet"
        if (nA > 0) writeSlice(orderSlice, o)
        if (nB > 0) writeSlice(ships, s)
        (o, s)
      }
      val (oF, sF) = stage(dirF); val (oC, sC) = stage(dirC)
      def drive(tag: String, dir: java.nio.file.Path, o: String, s: String,
          q: String, prev: Option[String]): String = {
        val resp = runT(TransformRequest(
          "did:out", "out", ts(run + 10), DatasetVocabulary(),
          transform(None -> q),
          Vector(
            mkInput("orders", if (nA > 0) o else null,
              s"$dir/o1.parquet", nA, startOffset = offA, wms = Seq(ts(run))),
            mkInput("shipments", if (nB > 0) s else null,
              s"$dir/s1.parquet", nB, startOffset = offB, wms = Seq(ts(run)))),
          nextOffset = nextOut(tag), prevCheckpointPath = prev,
          newCheckpointPath = s"$dir/cp$run",
          newDataPath = s"$dir/out$run.parquet"))
        nextOut += tag -> resp.newOffsetInterval.map(_.end + 1).getOrElse(nextOut(tag))
        s"$dir/cp$run"
      }
      prevF = Some(drive("f", dirF, oF, sF, qFast, prevF))
      prevC = Some(drive("c", dirC, oC, sC, qSlow, prevC))
      offA += nA; offB += nB
      val sel = Seq("offset", "op", "event_time", "order_id", "quantity", "num_shipped")
      def readRun(dir: java.nio.file.Path): Seq[org.apache.spark.sql.Row] = {
        val p = s"$dir/out$run.parquet"
        if (java.nio.file.Files.exists(java.nio.file.Paths.get(p)))
          readOut(p).orderBy("offset")
            .select(sel.map(org.apache.spark.sql.functions.col): _*).collect().toSeq
        else Seq.empty
      }
      val outF = readRun(dirF); val outC = readRun(dirC)
      assert(outF == outC, s"run $run diverged:\nF=$outF\nC=$outC")
    }
    assert(nextOut("f") > 0)
  }

  test("left-join delta migrates checkpoints that predate matched-state") {
    import spark.implicits._
    // A checkpoint written by the RECOMPUTE path (here: the CTE-wrapped
    // twin — the same executor pre-widening classifier versions used for
    // these chains) holds input buffers but no `left_matched` state.
    // Resuming on the delta path must not read the matched set as empty:
    // the first ΔB row re-matching an ALREADY-matched old left row would
    // then emit a spurious −D of a null-padded row that was never in the
    // output. The plumbing rebuilds the matched set from the old buffers
    // (sound: this path only runs over append-only history) and
    // appendCarry persists the rebuilt full on the first migrated run.
    // Covered for both schemes: offset-keyed (direct sides) and
    // row-keyed (derived left side).
    def scenario(derived: Boolean): Unit = {
      val dirF = tmp(); val dirC = tmp()
      val (qFast, qSlow) =
        if (!derived) {
          val join =
            """SELECT o.event_time as event_time, o.order_id, o.quantity,
              |  s.num_shipped
              |FROM orders o LEFT JOIN shipments s ON o.order_id = s.order_id""".stripMargin
          (Seq(None -> join),
            Seq(None -> (s"WITH j AS ($join)\n" +
              "SELECT event_time, order_id, quantity, num_shipped FROM j")))
        } else {
          val pre = Seq(
            Some("enriched") -> ("SELECT event_time, order_id, quantity " +
              "FROM orders WHERE quantity > 10"),
            Some("shiploads") -> ("SELECT order_id AS ship_order, num_shipped " +
              "FROM shipments WHERE num_shipped >= 10"))
          val join =
            """SELECT e.event_time as event_time, e.order_id, e.quantity,
              |  s.num_shipped
              |FROM enriched e LEFT JOIN shiploads s ON e.order_id = s.ship_order""".stripMargin
          (pre :+ (None -> join),
            pre :+ (None -> (s"WITH j AS ($join)\n" +
              "SELECT event_time, order_id, quantity, num_shipped FROM j")))
        }
      // run 3 is the migration run: ΔB re-matches already-matched order 2
      // (must NOT retract) and first-matches order 1 (must retract its
      // null-pad); run 4 late-matches order 3 against the REBUILT state
      val orderRuns = Map(
        1 -> Seq((1L, 20L), (2L, 30L)),
        2 -> Seq((3L, 40L)),
        4 -> Seq((4L, 50L)),
        5 -> Seq((1L, 60L)))
      val shipRuns = Map(
        1 -> Seq((2L, 10L)),
        3 -> Seq((2L, 15L), (1L, 20L)),
        4 -> Seq((3L, 25L)),
        5 -> Seq((4L, 10L)))
      var offA = 0L; var offB = 0L
      var nextOut = Map("f" -> 0L, "c" -> 0L)
      var prevF: Option[String] = None; var prevC: Option[String] = None
      (1 to 5).foreach { run =>
        val orders = orderRuns.getOrElse(run, Seq.empty).zipWithIndex.map {
          case ((id, q), i) =>
            OrderRow(offA + i, Op.Append, t(ts(run)), t(ts(run)), id, q)
        }
        val ships = shipRuns.getOrElse(run, Seq.empty).zipWithIndex.map {
          case ((id, n), i) =>
            Shipment(offB + i, Op.Append, t(ts(run)), t(ts(run)), id, n)
        }
        val nA = orders.length; val nB = ships.length
        def stage(dir: java.nio.file.Path): (String, String) = {
          val o = s"$dir/o$run.parquet"; val s = s"$dir/s$run.parquet"
          if (nA > 0) writeSlice(orders, o)
          if (nB > 0) writeSlice(ships, s)
          (o, s)
        }
        val (oF, sF) = stage(dirF); val (oC, sC) = stage(dirC)
        def drive(tag: String, dir: java.nio.file.Path, o: String, s: String,
            qs: Seq[(Option[String], String)], prev: Option[String]): String = {
          val resp = runT(TransformRequest(
            "did:out", "out", ts(run + 10), DatasetVocabulary(),
            transform(qs: _*),
            Vector(
              mkInput("orders", if (nA > 0) o else null,
                s"$dir/o1.parquet", nA, startOffset = offA, wms = Seq(ts(run))),
              mkInput("shipments", if (nB > 0) s else null,
                s"$dir/s1.parquet", nB, startOffset = offB, wms = Seq(ts(run)))),
            nextOffset = nextOut(tag), prevCheckpointPath = prev,
            newCheckpointPath = s"$dir/cp$run",
            newDataPath = s"$dir/out$run.parquet"))
          nextOut += tag -> resp.newOffsetInterval.map(_.end + 1).getOrElse(nextOut(tag))
          s"$dir/cp$run"
        }
        // chain F: recompute twin for runs 1–2 (the "old version"), plain
        // delta-path query from run 3 on (the upgrade)
        prevF = Some(drive("f", dirF, oF, sF, if (run <= 2) qSlow else qFast, prevF))
        prevC = Some(drive("c", dirC, oC, sC, qSlow, prevC))
        offA += nA; offB += nB
        val sel = Seq("offset", "op", "event_time", "order_id", "quantity",
          "num_shipped")
        def readRun(dir: java.nio.file.Path): Seq[org.apache.spark.sql.Row] = {
          val p = s"$dir/out$run.parquet"
          if (java.nio.file.Files.exists(java.nio.file.Paths.get(p)))
            readOut(p).orderBy("offset")
              .select(sel.map(org.apache.spark.sql.functions.col): _*)
              .collect().toSeq
          else Seq.empty
        }
        val outF = readRun(dirF); val outC = readRun(dirC)
        assert(outF == outC,
          s"derived=$derived run $run diverged:\nF=$outF\nC=$outC")
        if (run == 3) {
          // exactly ONE retraction (order 1's null-pad); a spurious −D for
          // already-matched order 2 is the migration bug this test pins
          val retracts = outF.filter(_.getInt(1) == Op.Retract)
          assert(retracts.map(_.getLong(3)) == Seq(1L),
            s"derived=$derived run 3 retracts: $retracts")
          assert(java.nio.file.Files.exists(
            java.nio.file.Paths.get(s"$dirF/cp3/left_matched")))
          if (!derived) {
            // rebuilt base {order 2 → offset 1} ∪ this run's late match
            // {order 1 → offset 0}
            val m = readOut(s"$dirF/cp3/left_matched")
              .collect().map(_.getLong(0)).toSet
            assert(m == Set(0L, 1L), s"migrated matched offsets: $m")
          }
        }
      }
    }
    scenario(derived = false)
    scenario(derived = true)
  }

  test("left-join delta through pre-step derivations and recompute emit identical changelogs") {
    import spark.implicits._
    // Seeded random append-only slices where BOTH left-join sides are
    // derived by stateless pre-steps (rename/compute/filter) — the
    // round-9 widened LeftJoinDelta shape, whose matched state keys on
    // whole DERIVED rows (the left derivation projects the offset column
    // away). The twin wraps the join in a CTE (recompute + multiset
    // diff). Small value domains force value-identical derived rows (the
    // row-keyed matched set's collision case); late shipments for old
    // unmatched orders exercise the null-pad retract; run 4 retracts a
    // run-1 order, covering the flip to net-and-recompute against the
    // delta-maintained snapshot.
    val rnd = new scala.util.Random(101)
    val dirF = tmp(); val dirC = tmp()
    val pre = Seq(
      Some("enriched") -> ("SELECT event_time, order_id, quantity * 10 AS value " +
        "FROM orders WHERE quantity > 10"),
      Some("shiploads") -> ("SELECT order_id AS ship_order, num_shipped " +
        "FROM shipments WHERE num_shipped >= 10"))
    val join = """SELECT e.event_time as event_time, e.order_id, e.value,
                 |  s.num_shipped
                 |FROM enriched e LEFT JOIN shiploads s ON e.order_id = s.ship_order""".stripMargin
    val qFast = pre :+ (None -> join)
    val qSlow = pre :+ (None ->
      s"WITH j AS ($join)\nSELECT event_time, order_id, value, num_shipped FROM j")
    var offA = 0L; var offB = 0L
    var nextOut = Map("f" -> 0L, "c" -> 0L)
    var prevF: Option[String] = None; var prevC: Option[String] = None
    var firstOrder: OrderRow = null
    var sawNullPadRetract = false
    (1 to 6).foreach { run =>
      val nA0 = if (run == 1) 3 else rnd.nextInt(3)
      val nB = if (run == 1) 1 + rnd.nextInt(2) else rnd.nextInt(3)
      // random order_ids live in 1..3; order 99 is planted in run 1 with
      // no matching shipment until run 3 — a guaranteed old-unmatched row
      // whose late match drives the p3 null-pad-retract term
      val orders0 = (0 until nA0).map { i =>
        OrderRow(offA + i, Op.Append, t(ts(run)), t(ts(run)),
          1 + rnd.nextInt(3), 10 * (1 + rnd.nextInt(5)))
      }
      val orders =
        if (run == 1)
          orders0 :+ OrderRow(offA + nA0, Op.Append, t(ts(run)), t(ts(run)), 99, 50)
        else orders0
      if (run == 1) firstOrder = orders.head
      val orderSlice =
        if (run == 4)
          orders :+ OrderRow(offA + orders.length, Op.Retract, t(ts(run)),
            firstOrder.event_time, firstOrder.order_id, firstOrder.quantity)
        else orders
      val ships0 = (0 until nB).map { i =>
        Shipment(offB + i, Op.Append, t(ts(run)), t(ts(run)),
          1 + rnd.nextInt(3), 5 * (1 + rnd.nextInt(4)))
      }
      val ships =
        if (run == 3)
          ships0 :+ Shipment(offB + nB, Op.Append, t(ts(run)), t(ts(run)), 99, 20)
        else ships0
      val nA = orderSlice.length
      val nBs = ships.length
      def stage(dir: java.nio.file.Path): (String, String) = {
        val o = s"$dir/o$run.parquet"; val s = s"$dir/s$run.parquet"
        if (nA > 0) writeSlice(orderSlice, o)
        if (nBs > 0) writeSlice(ships, s)
        (o, s)
      }
      val (oF, sF) = stage(dirF); val (oC, sC) = stage(dirC)
      def drive(tag: String, dir: java.nio.file.Path, o: String, s: String,
          qs: Seq[(Option[String], String)], prev: Option[String]): String = {
        val resp = runT(TransformRequest(
          "did:out", "out", ts(run + 10), DatasetVocabulary(),
          transform(qs: _*),
          Vector(
            mkInput("orders", if (nA > 0) o else null,
              s"$dir/o1.parquet", nA, startOffset = offA, wms = Seq(ts(run))),
            mkInput("shipments", if (nBs > 0) s else null,
              s"$dir/s1.parquet", nBs, startOffset = offB, wms = Seq(ts(run)))),
          nextOffset = nextOut(tag), prevCheckpointPath = prev,
          newCheckpointPath = s"$dir/cp$run",
          newDataPath = s"$dir/out$run.parquet"))
        nextOut += tag -> resp.newOffsetInterval.map(_.end + 1).getOrElse(nextOut(tag))
        s"$dir/cp$run"
      }
      prevF = Some(drive("f", dirF, oF, sF, qFast, prevF))
      prevC = Some(drive("c", dirC, oC, sC, qSlow, prevC))
      offA += nA; offB += nBs
      val sel = Seq("offset", "op", "event_time", "order_id", "value", "num_shipped")
      def readRun(dir: java.nio.file.Path): Seq[org.apache.spark.sql.Row] = {
        val p = s"$dir/out$run.parquet"
        if (java.nio.file.Files.exists(java.nio.file.Paths.get(p)))
          readOut(p).orderBy("offset")
            .select(sel.map(org.apache.spark.sql.functions.col): _*).collect().toSeq
        else Seq.empty
      }
      val outF = readRun(dirF); val outC = readRun(dirC)
      assert(outF == outC, s"run $run diverged:\nF=$outF\nC=$outC")
      // a retraction of a null-padded row (num_shipped null) BEFORE the
      // run-4 flip proves the delta path's p3 term fired, not just p1/p2
      if (run < 4) sawNullPadRetract ||= outF.exists(r =>
        r.getInt(1) == Op.Retract && r.isNullAt(5))
    }
    assert(sawNullPadRetract,
      "seed never produced a late match for an old unmatched order")
    assert(nextOut("f") > 0)
  }

  test("left-join delta over an inner-join pre-step and recompute emit identical changelogs") {
    import spark.implicits._
    // Round-9 second widening: the LEFT side is an inner-join PRE-STEP of
    // two direct relations ((orders ⋈ picks) ⟕ shipments) — its delta is
    // the telescoping decomposition of the inner join, its matched state
    // keys on whole derived rows. The twin CTE-wraps the left join
    // (recompute + multiset diff). Order 99 is planted with a pick in
    // run 1 and no shipment until run 3 (the guaranteed null-pad
    // retract); run 4 retracts a run-1 order (flip to
    // net-and-recompute). All three inputs take random appends.
    val rnd = new scala.util.Random(7)
    val dirF = tmp(); val dirC = tmp()
    val pre = Seq(
      Some("j") -> ("SELECT o.event_time AS event_time, o.order_id AS oid, " +
        "o.quantity AS quantity, p.num_shipped AS pick_sz " +
        "FROM orders o JOIN picks p ON o.order_id = p.order_id"))
    val join = """SELECT j.event_time AS event_time, j.oid AS oid,
                 |  j.quantity AS quantity, j.pick_sz AS pick_sz,
                 |  s.num_shipped AS num_shipped
                 |FROM j LEFT JOIN shipments s ON j.oid = s.order_id""".stripMargin
    val qFast = pre :+ (None -> join)
    val qSlow = pre :+ (None ->
      s"WITH w AS ($join)\nSELECT event_time, oid, quantity, pick_sz, num_shipped FROM w")
    var offA = 0L; var offP = 0L; var offB = 0L
    var nextOut = Map("f" -> 0L, "c" -> 0L)
    var prevF: Option[String] = None; var prevC: Option[String] = None
    var firstOrder: OrderRow = null
    var sawNullPadRetract = false
    (1 to 6).foreach { run =>
      val nA0 = if (run == 1) 2 else rnd.nextInt(3)
      val orders0 = (0 until nA0).map { i =>
        OrderRow(offA + i, Op.Append, t(ts(run)), t(ts(run)),
          1 + rnd.nextInt(3), 10 * (1 + rnd.nextInt(4)))
      }
      val orders =
        if (run == 1)
          orders0 :+ OrderRow(offA + nA0, Op.Append, t(ts(run)), t(ts(run)), 99, 50)
        else orders0
      if (run == 1) firstOrder = orders.head
      val orderSlice =
        if (run == 4)
          orders :+ OrderRow(offA + orders.length, Op.Retract, t(ts(run)),
            firstOrder.event_time, firstOrder.order_id, firstOrder.quantity)
        else orders
      // picks: run 1 covers every random order_id plus the planted 99;
      // later runs occasionally append a new pick (Δ on the SECOND left
      // relation — the telescoping term the one-relation shape never has)
      val picks: Seq[Shipment] = run match {
        case 1 => Seq(1L, 2L, 3L, 99L).zipWithIndex.map { case (id, i) =>
          Shipment(offP + i, Op.Append, t(ts(1)), t(ts(1)), id, 7)
        }
        case _ => (0 until rnd.nextInt(2)).map(i =>
          Shipment(offP + i, Op.Append, t(ts(run)), t(ts(run)),
            1 + rnd.nextInt(3), 8))
      }
      val ships0 = (0 until rnd.nextInt(3)).map { i =>
        Shipment(offB + i, Op.Append, t(ts(run)), t(ts(run)),
          1 + rnd.nextInt(3), 5 * (1 + rnd.nextInt(3)))
      }
      val ships =
        if (run == 3)
          ships0 :+ Shipment(offB + ships0.length, Op.Append, t(ts(run)),
            t(ts(run)), 99, 20)
        else ships0
      val nA = orderSlice.length; val nP = picks.length; val nB = ships.length
      def stage(dir: java.nio.file.Path): (String, String, String) = {
        val o = s"$dir/o$run.parquet"; val p = s"$dir/p$run.parquet"
        val s = s"$dir/s$run.parquet"
        if (run == 1) // schema-only fixtures for empty-slice runs
          writeSlice(Seq(Shipment(0, Op.Append, t(ts(1)), t(ts(1)), 999, 1)),
            s"$dir/schemafix.parquet")
        if (nA > 0) writeSlice(orderSlice, o)
        if (nP > 0) writeSlice(picks, p)
        if (nB > 0) writeSlice(ships, s)
        (o, p, s)
      }
      val (oF, pF, sF) = stage(dirF); val (oC, pC, sC) = stage(dirC)
      def drive(tag: String, dir: java.nio.file.Path,
          o: String, p: String, s: String,
          qs: Seq[(Option[String], String)], prev: Option[String]): String = {
        val resp = runT(TransformRequest(
          "did:out", "out", ts(run + 10), DatasetVocabulary(),
          transform(qs: _*),
          Vector(
            mkInput("orders", if (nA > 0) o else null,
              s"$dir/o1.parquet", nA, startOffset = offA, wms = Seq(ts(run))),
            mkInput("picks", if (nP > 0) p else null,
              s"$dir/schemafix.parquet", nP, startOffset = offP, wms = Seq(ts(run))),
            mkInput("shipments", if (nB > 0) s else null,
              s"$dir/schemafix.parquet", nB, startOffset = offB, wms = Seq(ts(run)))),
          nextOffset = nextOut(tag), prevCheckpointPath = prev,
          newCheckpointPath = s"$dir/cp$run",
          newDataPath = s"$dir/out$run.parquet"))
        nextOut += tag -> resp.newOffsetInterval.map(_.end + 1).getOrElse(nextOut(tag))
        s"$dir/cp$run"
      }
      prevF = Some(drive("f", dirF, oF, pF, sF, qFast, prevF))
      prevC = Some(drive("c", dirC, oC, pC, sC, qSlow, prevC))
      offA += nA; offP += nP; offB += nB
      val sel = Seq("offset", "op", "event_time", "oid", "quantity", "pick_sz", "num_shipped")
      def readRun(dir: java.nio.file.Path): Seq[org.apache.spark.sql.Row] = {
        val p = s"$dir/out$run.parquet"
        if (java.nio.file.Files.exists(java.nio.file.Paths.get(p)))
          readOut(p).orderBy("offset")
            .select(sel.map(org.apache.spark.sql.functions.col): _*).collect().toSeq
        else Seq.empty
      }
      val outF = readRun(dirF); val outC = readRun(dirC)
      assert(outF == outC, s"run $run diverged:\nF=$outF\nC=$outC")
      if (run < 4) sawNullPadRetract ||= outF.exists(r =>
        r.getInt(1) == Op.Retract && r.isNullAt(6))
    }
    assert(sawNullPadRetract,
      "planted pick+shipment never produced a null-pad retract")
    assert(nextOut("f") > 0)
  }

  test("delta-join path and recompute path emit identical changelogs") {
    import spark.implicits._
    // Seeded random append-only slices on TWO inputs through two chains:
    // the single-step inner join (delta path) and a value-identical
    // CTE-wrapped variant (WITH bodies are never classified through →
    // recompute). Run 4 retracts a run-1 order, covering the delta →
    // net-and-recompute flip against the delta-maintained snapshot. Slices
    // may be empty for either input (watermark-only advances).
    val rnd = new scala.util.Random(23)
    val dirF = tmp(); val dirC = tmp()
    val join = """SELECT o.event_time as event_time, o.order_id, o.quantity,
                 |  s.num_shipped
                 |FROM orders o JOIN shipments s ON o.order_id = s.order_id""".stripMargin
    val qFast = join
    val qSlow = s"WITH j AS ($join)\nSELECT event_time, order_id, quantity, num_shipped FROM j"
    var offA = 0L; var offB = 0L
    var nextOut = Map("f" -> 0L, "c" -> 0L)
    var prevF: Option[String] = None; var prevC: Option[String] = None
    var firstOrder: OrderRow = null
    (1 to 5).foreach { run =>
      val nA0 = if (run == 1) 2 else rnd.nextInt(3)
      val nB = if (run == 1) 1 + rnd.nextInt(2) else rnd.nextInt(3)
      val orders = (0 until nA0).map { i =>
        OrderRow(offA + i, Op.Append, t(ts(run)), t(ts(run)),
          1 + rnd.nextInt(4), 10 * (1 + rnd.nextInt(5)))
      }
      if (run == 1) firstOrder = orders.head
      val orderSlice =
        if (run == 4)
          orders :+ OrderRow(offA + nA0, Op.Retract, t(ts(run)),
            firstOrder.event_time, firstOrder.order_id, firstOrder.quantity)
        else orders
      val ships = (0 until nB).map { i =>
        Shipment(offB + i, Op.Append, t(ts(run)), t(ts(run)),
          1 + rnd.nextInt(4), 5 * (1 + rnd.nextInt(4)))
      }
      val nA = orderSlice.length
      def stage(dir: java.nio.file.Path): (String, String) = {
        val o = s"$dir/o$run.parquet"; val s = s"$dir/s$run.parquet"
        if (nA > 0) writeSlice(orderSlice, o)
        if (nB > 0) writeSlice(ships, s)
        (o, s)
      }
      val (oF, sF) = stage(dirF); val (oC, sC) = stage(dirC)
      // schemaFile must exist even for empty slices — reuse run 1's files
      def drive(tag: String, dir: java.nio.file.Path, o: String, s: String,
          q: String, prev: Option[String]): String = {
        val resp = runT(TransformRequest(
          "did:out", "out", ts(run + 10), DatasetVocabulary(),
          transform(None -> q),
          Vector(
            mkInput("orders", if (nA > 0) o else null,
              s"$dir/o1.parquet", nA, startOffset = offA, wms = Seq(ts(run))),
            mkInput("shipments", if (nB > 0) s else null,
              s"$dir/s1.parquet", nB, startOffset = offB, wms = Seq(ts(run)))),
          nextOffset = nextOut(tag), prevCheckpointPath = prev,
          newCheckpointPath = s"$dir/cp$run",
          newDataPath = s"$dir/out$run.parquet"))
        nextOut += tag -> resp.newOffsetInterval.map(_.end + 1).getOrElse(nextOut(tag))
        s"$dir/cp$run"
      }
      prevF = Some(drive("f", dirF, oF, sF, qFast, prevF))
      prevC = Some(drive("c", dirC, oC, sC, qSlow, prevC))
      offA += nA; offB += nB
      val sel = Seq("offset", "op", "event_time", "order_id", "quantity", "num_shipped")
      def readRun(dir: java.nio.file.Path): Seq[org.apache.spark.sql.Row] = {
        val p = s"$dir/out$run.parquet"
        if (java.nio.file.Files.exists(java.nio.file.Paths.get(p)))
          readOut(p).orderBy("offset")
            .select(sel.map(org.apache.spark.sql.functions.col): _*).collect().toSeq
        else Seq.empty
      }
      val outF = readRun(dirF); val outC = readRun(dirC)
      assert(outF == outC, s"run $run diverged:\nF=$outF\nC=$outC")
    }
    // the random schedule must have exercised a run with joined output
    assert(nextOut("f") > 0)
  }

  test("two-join chain delta path and recompute emit identical changelogs") {
    import spark.implicits._
    // Seeded random append-only slices on THREE inputs through the 2-step
    // enrich-then-join chain (join in a pre-step, second join at the
    // output — the n-ary tree delta path) versus a value-identical
    // CTE-wrapped single-step variant (WITH bodies are never classified
    // through → recompute). Run 4 retracts a run-1 order, covering the
    // delta → net-and-recompute flip against the delta-maintained
    // snapshot. Slices may be empty for any input.
    val rnd = new scala.util.Random(41)
    val dirF = tmp(); val dirC = tmp()
    val qFastSteps = Seq(
      Some("enriched") ->
        """SELECT o.event_time AS event_time, o.order_id AS order_id,
          |  o.quantity AS quantity, s.num_shipped AS num_shipped
          |FROM orders o JOIN shipments s ON o.order_id = s.order_id""".stripMargin,
      None ->
        """SELECT e.event_time AS event_time, e.order_id AS order_id,
          |  e.quantity AS quantity, e.num_shipped AS num_shipped,
          |  tk.symbol AS symbol
          |FROM enriched e JOIN tickers tk ON tk.price = e.num_shipped""".stripMargin)
    val qSlowSteps = Seq(None ->
      """WITH j AS (
        |  SELECT o.event_time AS event_time, o.order_id AS order_id,
        |    o.quantity AS quantity, s.num_shipped AS num_shipped, tk.symbol AS symbol
        |  FROM orders o JOIN shipments s ON o.order_id = s.order_id
        |  JOIN tickers tk ON tk.price = s.num_shipped)
        |SELECT event_time, order_id, quantity, num_shipped, symbol FROM j""".stripMargin)
    var offA = 0L; var offB = 0L; var offT = 0L
    var nextOut = Map("f" -> 0L, "c" -> 0L)
    var prevF: Option[String] = None; var prevC: Option[String] = None
    var firstOrder: OrderRow = null
    (1 to 5).foreach { run =>
      val nA0 = if (run == 1) 2 else rnd.nextInt(3)
      val nB = if (run == 1) 1 + rnd.nextInt(2) else rnd.nextInt(3)
      val nT = if (run == 1) 2 else rnd.nextInt(2)
      val orders = (0 until nA0).map { i =>
        OrderRow(offA + i, Op.Append, t(ts(run)), t(ts(run)),
          1 + rnd.nextInt(4), 10 * (1 + rnd.nextInt(5)))
      }
      if (run == 1) firstOrder = orders.head
      val orderSlice =
        if (run == 4)
          orders :+ OrderRow(offA + nA0, Op.Retract, t(ts(run)),
            firstOrder.event_time, firstOrder.order_id, firstOrder.quantity)
        else orders
      val ships = (0 until nB).map { i =>
        Shipment(offB + i, Op.Append, t(ts(run)), t(ts(run)),
          1 + rnd.nextInt(4), 5 * (1 + rnd.nextInt(4)))
      }
      // ticker prices land in the num_shipped value range so the second
      // join produces rows
      val ticks = (0 until nT).map { i =>
        Ticker(offT + i, Op.Append, t(ts(run)), t(ts(run)),
          ('A' + rnd.nextInt(3)).toChar.toString, 5 * (1 + rnd.nextInt(4)))
      }
      val nA = orderSlice.length
      def stage(dir: java.nio.file.Path): (String, String, String) = {
        val o = s"$dir/o$run.parquet"; val s = s"$dir/s$run.parquet"
        val k = s"$dir/t$run.parquet"
        if (nA > 0) writeSlice(orderSlice, o)
        if (nB > 0) writeSlice(ships, s)
        if (nT > 0) writeSlice(ticks, k)
        (o, s, k)
      }
      val (oF, sF, kF) = stage(dirF); val (oC, sC, kC) = stage(dirC)
      def drive(tag: String, dir: java.nio.file.Path,
          o: String, s: String, k: String,
          qs: Seq[(Option[String], String)], prev: Option[String]): String = {
        val resp = runT(TransformRequest(
          "did:out", "out", ts(run + 10), DatasetVocabulary(),
          transform(qs: _*),
          Vector(
            mkInput("orders", if (nA > 0) o else null,
              s"$dir/o1.parquet", nA, startOffset = offA, wms = Seq(ts(run))),
            mkInput("shipments", if (nB > 0) s else null,
              s"$dir/s1.parquet", nB, startOffset = offB, wms = Seq(ts(run))),
            mkInput("tickers", if (nT > 0) k else null,
              s"$dir/t1.parquet", nT, startOffset = offT, wms = Seq(ts(run)))),
          nextOffset = nextOut(tag), prevCheckpointPath = prev,
          newCheckpointPath = s"$dir/cp$run",
          newDataPath = s"$dir/out$run.parquet"))
        nextOut += tag -> resp.newOffsetInterval.map(_.end + 1).getOrElse(nextOut(tag))
        s"$dir/cp$run"
      }
      prevF = Some(drive("f", dirF, oF, sF, kF, qFastSteps, prevF))
      prevC = Some(drive("c", dirC, oC, sC, kC, qSlowSteps, prevC))
      offA += nA; offB += nB; offT += nT
      val sel = Seq("offset", "op", "event_time", "order_id", "quantity",
        "num_shipped", "symbol")
      def readRun(dir: java.nio.file.Path): Seq[org.apache.spark.sql.Row] = {
        val p = s"$dir/out$run.parquet"
        if (java.nio.file.Files.exists(java.nio.file.Paths.get(p)))
          readOut(p).orderBy("offset")
            .select(sel.map(org.apache.spark.sql.functions.col): _*).collect().toSeq
        else Seq.empty
      }
      val outF = readRun(dirF); val outC = readRun(dirC)
      assert(outF == outC, s"run $run diverged:\nF=$outF\nC=$outC")
    }
    // the random schedule must have produced three-way joined output
    assert(nextOut("f") > 0)
  }

  test("zipfian-skewed join keys: multi-band narrowing and recompute agree") {
    import spark.implicits._
    // Seeded slices whose shipment keys follow the round-9 VERDICT #2
    // adversary: ~40% reference ORDER 1 (the oldest key), ~30% a random
    // mid-history order, ~30% the freshest orders — so every run's delta
    // key band spans the whole history and the single min/max band prunes
    // nothing. The gap-split multi-band path (keyBands) must cover every
    // scattered key EXACTLY: a dropped band would silently lose a join
    // match versus the CTE-forced recompute twin. Covers both the inner
    // JoinDelta and the LEFT-join delta (matched-state) shapes.
    val qJoin =
      """SELECT o.event_time AS event_time, o.order_id AS order_id,
        |  o.quantity AS quantity, s.num_shipped AS num_shipped
        |FROM orders o JOIN shipments s ON o.order_id = s.order_id""".stripMargin
    val qLeft = qJoin.replace("JOIN shipments", "LEFT JOIN shipments")
    for ((q, seed) <- Seq((qJoin, 1301), (qLeft, 1302))) {
      val rnd = new scala.util.Random(seed)
      val dirF = tmp(); val dirC = tmp()
      var offA = 0L; var offB = 0L
      var nextOut = Map("f" -> 0L, "c" -> 0L)
      var prevF: Option[String] = None; var prevC: Option[String] = None
      (1 to 6).foreach { run =>
        val nA = if (run == 1) 4 else 2 + rnd.nextInt(5)
        val orders = (0 until nA).map { i =>
          OrderRow(offA + i, Op.Append, t(ts(run)), t(ts(run)),
            offA + i + 1, 10 * (1 + rnd.nextInt(5)))
        }
        val maxOldId = offA // ids 1..offA existed before this run
        val nB = if (run == 1) 2 else rnd.nextInt(5)
        val ships = (0 until nB).map { i =>
          val id = rnd.nextInt(10) match {
            case d if d < 4              => 1L // hot ancient key
            case d if d < 7 && maxOldId > 0 => 1L + rnd.nextInt(maxOldId.toInt)
            case _                       => offA + 1 + rnd.nextInt(nA)
          }
          Shipment(offB + i, Op.Append, t(ts(run)), t(ts(run)),
            id, 5 * (1 + rnd.nextInt(4)))
        }
        def stage(dir: Path): (String, String) = {
          val o = s"$dir/o$run.parquet"; val s = s"$dir/s$run.parquet"
          writeSlice(orders, o)
          if (nB > 0) writeSlice(ships, s)
          (o, s)
        }
        val (oF, sF) = stage(dirF); val (oC, sC) = stage(dirC)
        def drive(tag: String, dir: Path, o: String, s: String,
            qs: Seq[(Option[String], String)], prev: Option[String]): String = {
          val resp = runT(TransformRequest(
            "did:out", "out", ts(run + 10), DatasetVocabulary(),
            transform(qs: _*),
            Vector(
              mkInput("orders", o, s"$dir/o1.parquet", nA,
                startOffset = offA, wms = Seq(ts(run))),
              mkInput("shipments", if (nB > 0) s else null,
                s"$dir/s1.parquet", nB, startOffset = offB, wms = Seq(ts(run)))),
            nextOffset = nextOut(tag), prevCheckpointPath = prev,
            newCheckpointPath = s"$dir/cp$run",
            newDataPath = s"$dir/out$run.parquet"))
          nextOut += tag ->
            resp.newOffsetInterval.map(_.end + 1).getOrElse(nextOut(tag))
          s"$dir/cp$run"
        }
        val cte =
          s"""WITH j AS (${q.replace("\n", " ")})
             |SELECT event_time, order_id, quantity, num_shipped FROM j""".stripMargin
        prevF = Some(drive("f", dirF, oF, sF, Seq(None -> q), prevF))
        prevC = Some(drive("c", dirC, oC, sC, Seq(None -> cte), prevC))
        offA += nA; offB += nB
        def readRun(dir: Path): Seq[org.apache.spark.sql.Row] = {
          val p = s"$dir/out$run.parquet"
          if (Files.exists(Paths.get(p)))
            readOut(p).orderBy("offset").collect().toSeq
          else Seq.empty
        }
        val outF = readRun(dirF); val outC = readRun(dirC)
        assert(outF == outC,
          s"seed $seed run $run diverged:\nF=$outF\nC=$outC")
      }
      // the hot key must actually have accumulated matches
      assert(nextOut("f") > 6, s"seed $seed produced almost no joined rows")
    }
  }

  test("self-join delta path and recompute emit identical changelogs") {
    import spark.implicits._
    // Seeded random append-only slices through a single-relation SELF-join
    // (two scan sites of `orders` — the per-occurrence telescoping, since
    // one view name cannot carry old and delta frames in the same pass)
    // versus the value-identical CTE-wrapped variant (recompute). Run 4
    // retracts a run-1 order, covering the delta → net-and-recompute flip
    // against the delta-maintained snapshot.
    val rnd = new scala.util.Random(43)
    val dirF = tmp(); val dirC = tmp()
    val qFast =
      """SELECT x.event_time AS event_time, x.order_id AS order_id,
        |  x.quantity AS q1, y.quantity AS q2
        |FROM orders x JOIN orders y ON x.order_id = y.order_id""".stripMargin
    val qSlow =
      """WITH j AS (
        |  SELECT x.event_time AS event_time, x.order_id AS order_id,
        |    x.quantity AS q1, y.quantity AS q2
        |  FROM orders x JOIN orders y ON x.order_id = y.order_id)
        |SELECT event_time, order_id, q1, q2 FROM j""".stripMargin
    var off = 0L
    var nextOut = Map("f" -> 0L, "c" -> 0L)
    var prevF: Option[String] = None; var prevC: Option[String] = None
    var firstOrder: OrderRow = null
    (1 to 5).foreach { run =>
      val n0 = if (run == 1) 2 else rnd.nextInt(3)
      val orders = (0 until n0).map { i =>
        OrderRow(off + i, Op.Append, t(ts(run)), t(ts(run)),
          1 + rnd.nextInt(3), 10 * (1 + rnd.nextInt(5)))
      }
      if (run == 1) firstOrder = orders.head
      val slice =
        if (run == 4)
          orders :+ OrderRow(off + n0, Op.Retract, t(ts(run)),
            firstOrder.event_time, firstOrder.order_id, firstOrder.quantity)
        else orders
      val n = slice.length
      def drive(tag: String, dir: java.nio.file.Path, q: String,
          prev: Option[String]): String = {
        val p = s"$dir/o$run.parquet"
        if (n > 0) writeSlice(slice, p)
        val resp = runT(TransformRequest(
          "did:out", "out", ts(run + 10), DatasetVocabulary(),
          transform(None -> q),
          Vector(mkInput("orders", if (n > 0) p else null,
            s"$dir/o1.parquet", n, startOffset = off, wms = Seq(ts(run)))),
          nextOffset = nextOut(tag), prevCheckpointPath = prev,
          newCheckpointPath = s"$dir/cp$run",
          newDataPath = s"$dir/out$run.parquet"))
        nextOut += tag -> resp.newOffsetInterval.map(_.end + 1).getOrElse(nextOut(tag))
        s"$dir/cp$run"
      }
      prevF = Some(drive("f", dirF, qFast, prevF))
      prevC = Some(drive("c", dirC, qSlow, prevC))
      off += n
      val sel = Seq("offset", "op", "event_time", "order_id", "q1", "q2")
      def readRun(dir: java.nio.file.Path): Seq[org.apache.spark.sql.Row] = {
        val p = s"$dir/out$run.parquet"
        if (java.nio.file.Files.exists(java.nio.file.Paths.get(p)))
          readOut(p).orderBy("offset")
            .select(sel.map(org.apache.spark.sql.functions.col): _*).collect().toSeq
        else Seq.empty
      }
      val outF = readRun(dirF); val outC = readRun(dirC)
      assert(outF == outC, s"run $run diverged:\nF=$outF\nC=$outC")
    }
    assert(nextOut("f") > 0)
  }

  test("reused-alias join chain delta path and recompute emit identical changelogs") {
    import spark.implicits._
    // Seeded random append-only slices through a pre-step view consumed at
    // TWO sites of the output join (the round-6 use-once discipline's
    // first relaxation: the classifier inlines the step per site, the
    // executor binds each site's frame independently — exactly the
    // self-join telescoping) versus the value-identical CTE-wrapped
    // variant (recompute). Run 4 retracts a run-1 order, covering the
    // delta → net-and-recompute flip against the delta-maintained
    // snapshot.
    val rnd = new scala.util.Random(47)
    val dirF = tmp(); val dirC = tmp()
    val qPre = "SELECT event_time, order_id, quantity FROM orders WHERE quantity > 0"
    val qFast =
      """SELECT x.event_time AS event_time, x.order_id AS order_id,
        |  x.quantity AS q1, y.quantity AS q2
        |FROM cleaned x JOIN cleaned y ON x.order_id = y.order_id""".stripMargin
    val qSlow =
      """WITH cleaned AS (
        |  SELECT event_time, order_id, quantity FROM orders WHERE quantity > 0)
        |SELECT x.event_time AS event_time, x.order_id AS order_id,
        |  x.quantity AS q1, y.quantity AS q2
        |FROM cleaned x JOIN cleaned y ON x.order_id = y.order_id""".stripMargin
    var off = 0L
    var nextOut = Map("f" -> 0L, "c" -> 0L)
    var prevF: Option[String] = None; var prevC: Option[String] = None
    var firstOrder: OrderRow = null
    (1 to 5).foreach { run =>
      val n0 = if (run == 1) 2 else rnd.nextInt(3)
      val orders = (0 until n0).map { i =>
        OrderRow(off + i, Op.Append, t(ts(run)), t(ts(run)),
          1 + rnd.nextInt(3), 10 * (1 + rnd.nextInt(5)))
      }
      if (run == 1) firstOrder = orders.head
      val slice =
        if (run == 4)
          orders :+ OrderRow(off + n0, Op.Retract, t(ts(run)),
            firstOrder.event_time, firstOrder.order_id, firstOrder.quantity)
        else orders
      val n = slice.length
      def drive(tag: String, dir: java.nio.file.Path,
          qs: Seq[(Option[String], String)], prev: Option[String]): String = {
        val p = s"$dir/o$run.parquet"
        if (n > 0) writeSlice(slice, p)
        val resp = runT(TransformRequest(
          "did:out", "out", ts(run + 10), DatasetVocabulary(),
          transform(qs: _*),
          Vector(mkInput("orders", if (n > 0) p else null,
            s"$dir/o1.parquet", n, startOffset = off, wms = Seq(ts(run)))),
          nextOffset = nextOut(tag), prevCheckpointPath = prev,
          newCheckpointPath = s"$dir/cp$run",
          newDataPath = s"$dir/out$run.parquet"))
        nextOut += tag -> resp.newOffsetInterval.map(_.end + 1).getOrElse(nextOut(tag))
        s"$dir/cp$run"
      }
      prevF = Some(drive("f", dirF,
        Seq(Some("cleaned") -> qPre, None -> qFast), prevF))
      prevC = Some(drive("c", dirC, Seq(None -> qSlow), prevC))
      off += n
      val sel = Seq("offset", "op", "event_time", "order_id", "q1", "q2")
      def readRun(dir: java.nio.file.Path): Seq[org.apache.spark.sql.Row] = {
        val p = s"$dir/out$run.parquet"
        if (java.nio.file.Files.exists(java.nio.file.Paths.get(p)))
          readOut(p).orderBy("offset")
            .select(sel.map(org.apache.spark.sql.functions.col): _*).collect().toSeq
        else Seq.empty
      }
      val outF = readRun(dirF); val outC = readRun(dirC)
      assert(outF == outC, s"run $run diverged:\nF=$outF\nC=$outC")
    }
    assert(nextOut("f") > 0)
  }

  test("reused JOIN-bearing step delta path and recompute emit identical changelogs") {
    import spark.implicits._
    // Round-8 envelope widening: the reused pre-step itself CONTAINS a
    // join (orders ⋈ shipments), consumed at TWO sites of the output
    // self-join — the classifier's per-site join balance admits it and
    // the executor telescopes over FOUR leaf positions
    // (orders, shipments, orders, shipments). Seeded random append-only
    // slices on BOTH inputs versus the value-identical CTE-wrapped twin
    // (recompute); run 4 retracts a run-1 order, covering the
    // delta → net-and-recompute flip against the delta-maintained
    // snapshot.
    val rnd = new scala.util.Random(83)
    val dirF = tmp(); val dirC = tmp()
    val qPre =
      """SELECT o.event_time AS event_time, o.order_id AS order_id,
        |  o.quantity AS quantity, s.num_shipped AS num_shipped
        |FROM orders o JOIN shipments s ON o.order_id = s.order_id""".stripMargin
    val qOut =
      """SELECT x.event_time AS event_time, x.order_id AS order_id,
        |  x.quantity AS q1, y.num_shipped AS ship2
        |FROM enriched x JOIN enriched y ON x.order_id = y.order_id""".stripMargin
    val qSlow =
      s"""WITH enriched AS (
         |  SELECT o.event_time AS event_time, o.order_id AS order_id,
         |    o.quantity AS quantity, s.num_shipped AS num_shipped
         |  FROM orders o JOIN shipments s ON o.order_id = s.order_id)
         |SELECT x.event_time AS event_time, x.order_id AS order_id,
         |  x.quantity AS q1, y.num_shipped AS ship2
         |FROM enriched x JOIN enriched y ON x.order_id = y.order_id""".stripMargin
    var offO = 0L; var offS = 0L
    var nextOut = Map("f" -> 0L, "c" -> 0L)
    var prevF: Option[String] = None; var prevC: Option[String] = None
    var firstOrder: OrderRow = null
    (1 to 5).foreach { run =>
      val nO0 = if (run == 1) 2 else rnd.nextInt(3)
      val orders = (0 until nO0).map { i =>
        OrderRow(offO + i, Op.Append, t(ts(run)), t(ts(run)),
          1 + rnd.nextInt(3), 10 * (1 + rnd.nextInt(4)))
      }
      if (run == 1) firstOrder = orders.head
      val sliceO =
        if (run == 4)
          orders :+ OrderRow(offO + nO0, Op.Retract, t(ts(run)),
            firstOrder.event_time, firstOrder.order_id, firstOrder.quantity)
        else orders
      val sliceS = (0 until (if (run == 1) 2 else rnd.nextInt(3))).map { i =>
        Shipment(offS + i, Op.Append, t(ts(run)), t(ts(run)),
          1 + rnd.nextInt(3), 1 + rnd.nextInt(5))
      }
      val nO = sliceO.length; val nS = sliceS.length
      def drive(tag: String, dir: java.nio.file.Path,
          qs: Seq[(Option[String], String)], prev: Option[String]): String = {
        val pO = s"$dir/o$run.parquet"; val pS = s"$dir/s$run.parquet"
        if (nO > 0) writeSlice(sliceO, pO)
        if (nS > 0) writeSlice(sliceS, pS)
        val resp = runT(TransformRequest(
          "did:out", "out", ts(run + 10), DatasetVocabulary(),
          transform(qs: _*),
          Vector(
            mkInput("orders", if (nO > 0) pO else null,
              s"$dir/o1.parquet", nO, startOffset = offO, wms = Seq(ts(run))),
            mkInput("shipments", if (nS > 0) pS else null,
              s"$dir/s1.parquet", nS, startOffset = offS, wms = Seq(ts(run)))),
          nextOffset = nextOut(tag), prevCheckpointPath = prev,
          newCheckpointPath = s"$dir/cp$run",
          newDataPath = s"$dir/out$run.parquet"))
        nextOut += tag -> resp.newOffsetInterval.map(_.end + 1).getOrElse(nextOut(tag))
        s"$dir/cp$run"
      }
      prevF = Some(drive("f", dirF,
        Seq(Some("enriched") -> qPre, None -> qOut), prevF))
      prevC = Some(drive("c", dirC, Seq(None -> qSlow), prevC))
      offO += nO; offS += nS
      val sel = Seq("offset", "op", "event_time", "order_id", "q1", "ship2")
      def readRun(dir: java.nio.file.Path): Seq[org.apache.spark.sql.Row] = {
        val p = s"$dir/out$run.parquet"
        if (java.nio.file.Files.exists(java.nio.file.Paths.get(p)))
          readOut(p).orderBy("offset")
            .select(sel.map(org.apache.spark.sql.functions.col): _*).collect().toSeq
        else Seq.empty
      }
      val outF = readRun(dirF); val outC = readRun(dirC)
      assert(outF == outC, s"run $run diverged:\nF=$outF\nC=$outC")
    }
    assert(nextOut("f") > 0)
  }

  test("agg above a self-join: merge path and recompute emit identically") {
    import spark.implicits._
    // sum/count aggregate keyed on the left occurrence's column above the
    // self-join — the agg-merge path's partials ride the per-occurrence
    // join delta terms. CTE variant recomputes. Run 3 retracts.
    val rnd = new scala.util.Random(47)
    val dirF = tmp(); val dirC = tmp()
    val qFast =
      """SELECT x.event_time AS event_time, x.order_id AS order_id,
        |  count(*) AS n, sum(y.quantity) AS q_sum
        |FROM orders x JOIN orders y ON x.order_id = y.order_id
        |GROUP BY x.event_time, x.order_id""".stripMargin
    val qSlow =
      """WITH j AS (
        |  SELECT x.event_time AS event_time, x.order_id AS order_id,
        |    y.quantity AS qy
        |  FROM orders x JOIN orders y ON x.order_id = y.order_id)
        |SELECT event_time, order_id, count(*) AS n, sum(qy) AS q_sum
        |FROM j GROUP BY event_time, order_id""".stripMargin
    var off = 0L
    var nextOut = Map("f" -> 0L, "c" -> 0L)
    var prevF: Option[String] = None; var prevC: Option[String] = None
    var firstOrder: OrderRow = null
    (1 to 4).foreach { run =>
      val n0 = if (run == 1) 3 else rnd.nextInt(3)
      val orders = (0 until n0).map { i =>
        OrderRow(off + i, Op.Append, t(ts(run)), t(ts(run)),
          1 + rnd.nextInt(2), 10 * (1 + rnd.nextInt(4)))
      }
      if (run == 1) firstOrder = orders.head
      val slice =
        if (run == 3)
          orders :+ OrderRow(off + n0, Op.Retract, t(ts(run)),
            firstOrder.event_time, firstOrder.order_id, firstOrder.quantity)
        else orders
      val n = slice.length
      def drive(tag: String, dir: java.nio.file.Path, q: String,
          prev: Option[String]): String = {
        val p = s"$dir/o$run.parquet"
        if (n > 0) writeSlice(slice, p)
        val resp = runT(TransformRequest(
          "did:out", "out", ts(run + 10), DatasetVocabulary(),
          transform(None -> q),
          Vector(mkInput("orders", if (n > 0) p else null,
            s"$dir/o1.parquet", n, startOffset = off, wms = Seq(ts(run)))),
          nextOffset = nextOut(tag), prevCheckpointPath = prev,
          newCheckpointPath = s"$dir/cp$run",
          newDataPath = s"$dir/out$run.parquet"))
        nextOut += tag -> resp.newOffsetInterval.map(_.end + 1).getOrElse(nextOut(tag))
        s"$dir/cp$run"
      }
      prevF = Some(drive("f", dirF, qFast, prevF))
      prevC = Some(drive("c", dirC, qSlow, prevC))
      off += n
      val sel = Seq("offset", "op", "event_time", "order_id", "n", "q_sum")
      def readRun(dir: java.nio.file.Path): Seq[org.apache.spark.sql.Row] = {
        val p = s"$dir/out$run.parquet"
        if (java.nio.file.Files.exists(java.nio.file.Paths.get(p)))
          readOut(p).orderBy("offset")
            .select(sel.map(org.apache.spark.sql.functions.col): _*).collect().toSeq
        else Seq.empty
      }
      val outF = readRun(dirF); val outC = readRun(dirC)
      assert(outF == outC, s"run $run diverged:\nF=$outF\nC=$outC")
    }
    assert(nextOut("f") > 0)
  }

  test("agg above a left join: merge path and recompute, incl. group death") {
    import spark.implicits._
    // Scripted then random slices through a sum/count/avg aggregate keyed
    // on a RIGHT-side column above a LEFT join (merge path: left-join
    // delta terms ± through the partials) versus the value-identical
    // `sum+0` recompute variant. Run 1 leaves every order unmatched (NULL
    // group), run 2 matches them all — the NULL group dies, exercising the
    // hidden row-count partial — and run 4 retracts a run-1 order,
    // covering the merge → net-and-recompute flip.
    val rnd = new scala.util.Random(59)
    val dirF = tmp(); val dirC = tmp()
    def q(sum: String) =
      s"""SELECT o.event_time AS event_time, s.num_shipped AS ship_sz,
         |  count(*) AS n, $sum AS q_total, avg(o.quantity) AS q_avg
         |FROM orders o LEFT JOIN shipments s ON o.order_id = s.order_id
         |GROUP BY o.event_time, s.num_shipped""".stripMargin
    val qFast = q("sum(o.quantity)")
    // the non-mergeable stddev_pop genuinely forces the recompute path —
    // a bare `+ 0` rides the merge path via exprCols hidden partials and
    // would compare the partials executor against itself
    val qSlow = q("CAST(sum(o.quantity) + stddev_pop(o.quantity) * 0 AS BIGINT)")
    var offA = 0L; var offB = 0L
    var nextOut = Map("f" -> 0L, "c" -> 0L)
    var prevF: Option[String] = None; var prevC: Option[String] = None
    var firstOrder: OrderRow = null
    (1 to 5).foreach { run =>
      val orders: Seq[OrderRow] = run match {
        case 1 => Seq(
          OrderRow(offA, Op.Append, t(ts(1)), t(ts(1)), 1, 10),
          OrderRow(offA + 1, Op.Append, t(ts(1)), t(ts(1)), 2, 20))
        case _ => (0 until rnd.nextInt(3)).map(i =>
          OrderRow(offA + i, Op.Append, t(ts(run)), t(ts(run)),
            1 + rnd.nextInt(5), 10 * (1 + rnd.nextInt(4))))
      }
      if (run == 1) firstOrder = orders.head
      val orderSlice =
        if (run == 4)
          orders :+ OrderRow(offA + orders.length, Op.Retract, t(ts(run)),
            firstOrder.event_time, firstOrder.order_id, firstOrder.quantity)
        else orders
      val ships: Seq[Shipment] = run match {
        case 1 => Nil
        case 2 => Seq( // match BOTH run-1 orders: the NULL group dies
          Shipment(offB, Op.Append, t(ts(2)), t(ts(2)), 1, 5),
          Shipment(offB + 1, Op.Append, t(ts(2)), t(ts(2)), 2, 5))
        case _ => (0 until rnd.nextInt(3)).map(i =>
          Shipment(offB + i, Op.Append, t(ts(run)), t(ts(run)),
            1 + rnd.nextInt(5), 5 * (1 + rnd.nextInt(3))))
      }
      val nA = orderSlice.length; val nB = ships.length
      def stage(dir: java.nio.file.Path): (String, String) = {
        val o = s"$dir/o$run.parquet"; val s = s"$dir/s$run.parquet"
        if (run == 1) // schema-only fixture: schemaFile must always exist
          writeSlice(Seq(Shipment(0, Op.Append, t(ts(1)), t(ts(1)), 999, 1)),
            s"$dir/sschema.parquet")
        if (nA > 0) writeSlice(orderSlice, o)
        if (nB > 0) writeSlice(ships, s)
        (o, s)
      }
      val (oF, sF) = stage(dirF); val (oC, sC) = stage(dirC)
      def drive(tag: String, dir: java.nio.file.Path, o: String, s: String,
          q: String, prev: Option[String]): String = {
        val resp = runT(TransformRequest(
          "did:out", "out", ts(run + 10), DatasetVocabulary(),
          transform(None -> q),
          Vector(
            mkInput("orders", if (nA > 0) o else null,
              s"$dir/o1.parquet", nA, startOffset = offA, wms = Seq(ts(run))),
            mkInput("shipments", if (nB > 0) s else null,
              s"$dir/sschema.parquet", nB, startOffset = offB, wms = Seq(ts(run)))),
          nextOffset = nextOut(tag), prevCheckpointPath = prev,
          newCheckpointPath = s"$dir/cp$run",
          newDataPath = s"$dir/out$run.parquet"))
        nextOut += tag -> resp.newOffsetInterval.map(_.end + 1).getOrElse(nextOut(tag))
        s"$dir/cp$run"
      }
      prevF = Some(drive("f", dirF, oF, sF, qFast, prevF))
      prevC = Some(drive("c", dirC, oC, sC, qSlow, prevC))
      offA += nA; offB += nB
      val sel = Seq("offset", "op", "event_time", "ship_sz", "n", "q_total", "q_avg")
      def readRun(dir: java.nio.file.Path): Seq[org.apache.spark.sql.Row] = {
        val p = s"$dir/out$run.parquet"
        if (java.nio.file.Files.exists(java.nio.file.Paths.get(p)))
          readOut(p).orderBy("offset")
            .select(sel.map(org.apache.spark.sql.functions.col): _*).collect().toSeq
        else Seq.empty
      }
      val outF = readRun(dirF); val outC = readRun(dirC)
      assert(outF == outC, s"run $run diverged:\nF=$outF\nC=$outC")
      if (run == 1) {
        // both orders unmatched: one NULL-keyed group appended
        assert(outF.exists(r => r.isNullAt(3) && r.getLong(4) == 2L))
      }
      if (run == 2) {
        // the NULL group died when its last row was retracted — the fast
        // path must emit its -D exactly like the recompute diff
        assert(outF.exists(r => r.getInt(1) == Op.Retract && r.isNullAt(3)),
          s"expected NULL-group retraction in run 2: $outF")
        assert(outF.exists(r => r.getInt(1) == Op.Append && !r.isNullAt(3)))
      }
    }
    assert(nextOut("f") > 0)
  }

  test("agg above a left join through pre-step derivations: merge and recompute agree") {
    import spark.implicits._
    // The round-9 widened shape under aggregation: BOTH left-join sides
    // derived by stateless pre-steps (the left derivation drops the
    // offset column, so the partials path runs on row-keyed matched
    // state), same script as the direct test — run 1 all-unmatched (NULL
    // group), run 2 matches everything (NULL-group death through the
    // hidden row-count partial), run 4 retracts a run-1 order (merge →
    // net-and-recompute flip).
    val rnd = new scala.util.Random(59)
    val dirF = tmp(); val dirC = tmp()
    val pre = Seq(
      Some("enriched") ->
        "SELECT event_time, order_id, quantity * 2 AS q2 FROM orders",
      Some("shiploads") ->
        "SELECT order_id AS ship_order, num_shipped FROM shipments")
    def q(sum: String): Seq[(Option[String], String)] = pre :+ (None ->
      s"""SELECT e.event_time AS event_time, s.num_shipped AS ship_sz,
         |  count(*) AS n, $sum AS q_total, avg(e.q2) AS q_avg
         |FROM enriched e LEFT JOIN shiploads s ON e.order_id = s.ship_order
         |GROUP BY e.event_time, s.num_shipped""".stripMargin)
    val qFast = q("sum(e.q2)")
    // stddev_pop (non-mergeable) forces TRUE recompute — see the direct
    // agg-left test
    val qSlow = q("CAST(sum(e.q2) + stddev_pop(e.q2) * 0 AS BIGINT)")
    var offA = 0L; var offB = 0L
    var nextOut = Map("f" -> 0L, "c" -> 0L)
    var prevF: Option[String] = None; var prevC: Option[String] = None
    var firstOrder: OrderRow = null
    (1 to 5).foreach { run =>
      val orders: Seq[OrderRow] = run match {
        case 1 => Seq(
          OrderRow(offA, Op.Append, t(ts(1)), t(ts(1)), 1, 10),
          OrderRow(offA + 1, Op.Append, t(ts(1)), t(ts(1)), 2, 20))
        case _ => (0 until rnd.nextInt(3)).map(i =>
          OrderRow(offA + i, Op.Append, t(ts(run)), t(ts(run)),
            1 + rnd.nextInt(5), 10 * (1 + rnd.nextInt(4))))
      }
      if (run == 1) firstOrder = orders.head
      val orderSlice =
        if (run == 4)
          orders :+ OrderRow(offA + orders.length, Op.Retract, t(ts(run)),
            firstOrder.event_time, firstOrder.order_id, firstOrder.quantity)
        else orders
      val ships: Seq[Shipment] = run match {
        case 1 => Nil
        case 2 => Seq( // match BOTH run-1 orders: the NULL group dies
          Shipment(offB, Op.Append, t(ts(2)), t(ts(2)), 1, 5),
          Shipment(offB + 1, Op.Append, t(ts(2)), t(ts(2)), 2, 5))
        case _ => (0 until rnd.nextInt(3)).map(i =>
          Shipment(offB + i, Op.Append, t(ts(run)), t(ts(run)),
            1 + rnd.nextInt(5), 5 * (1 + rnd.nextInt(3))))
      }
      val nA = orderSlice.length; val nB = ships.length
      def stage(dir: java.nio.file.Path): (String, String) = {
        val o = s"$dir/o$run.parquet"; val s = s"$dir/s$run.parquet"
        if (run == 1) // schema-only fixture: schemaFile must always exist
          writeSlice(Seq(Shipment(0, Op.Append, t(ts(1)), t(ts(1)), 999, 1)),
            s"$dir/sschema.parquet")
        if (nA > 0) writeSlice(orderSlice, o)
        if (nB > 0) writeSlice(ships, s)
        (o, s)
      }
      val (oF, sF) = stage(dirF); val (oC, sC) = stage(dirC)
      def drive(tag: String, dir: java.nio.file.Path, o: String, s: String,
          qs: Seq[(Option[String], String)], prev: Option[String]): String = {
        val resp = runT(TransformRequest(
          "did:out", "out", ts(run + 10), DatasetVocabulary(),
          transform(qs: _*),
          Vector(
            mkInput("orders", if (nA > 0) o else null,
              s"$dir/o1.parquet", nA, startOffset = offA, wms = Seq(ts(run))),
            mkInput("shipments", if (nB > 0) s else null,
              s"$dir/sschema.parquet", nB, startOffset = offB, wms = Seq(ts(run)))),
          nextOffset = nextOut(tag), prevCheckpointPath = prev,
          newCheckpointPath = s"$dir/cp$run",
          newDataPath = s"$dir/out$run.parquet"))
        nextOut += tag -> resp.newOffsetInterval.map(_.end + 1).getOrElse(nextOut(tag))
        s"$dir/cp$run"
      }
      prevF = Some(drive("f", dirF, oF, sF, qFast, prevF))
      prevC = Some(drive("c", dirC, oC, sC, qSlow, prevC))
      offA += nA; offB += nB
      val sel = Seq("offset", "op", "event_time", "ship_sz", "n", "q_total", "q_avg")
      def readRun(dir: java.nio.file.Path): Seq[org.apache.spark.sql.Row] = {
        val p = s"$dir/out$run.parquet"
        if (java.nio.file.Files.exists(java.nio.file.Paths.get(p)))
          readOut(p).orderBy("offset")
            .select(sel.map(org.apache.spark.sql.functions.col): _*).collect().toSeq
        else Seq.empty
      }
      val outF = readRun(dirF); val outC = readRun(dirC)
      assert(outF == outC, s"run $run diverged:\nF=$outF\nC=$outC")
      if (run == 1)
        assert(outF.exists(r => r.isNullAt(3) && r.getLong(4) == 2L))
      if (run == 2) {
        assert(outF.exists(r => r.getInt(1) == Op.Retract && r.isNullAt(3)),
          s"expected NULL-group retraction in run 2: $outF")
        assert(outF.exists(r => r.getInt(1) == Op.Append && !r.isNullAt(3)))
      }
    }
    assert(nextOut("f") > 0)
  }

  test("agg above a left join over an inner-join pre-step: merge and recompute agree") {
    import spark.implicits._
    // The mixed-tree shape under aggregation: (orders ⋈ picks) in a
    // pre-step, LEFT-joined to shipments, summed — the partials path
    // over the telescoping left delta with row-keyed matched state.
    // Twin: `+ 0` forces recompute. Run 1 all-unmatched (NULL group),
    // run 3's planted shipment matches the planted order (NULL-group
    // shrink through negated partials), run 4 retracts (flip).
    val rnd = new scala.util.Random(11)
    val dirF = tmp(); val dirC = tmp()
    val pre = Seq(
      Some("j") -> ("SELECT o.event_time AS event_time, o.order_id AS oid, " +
        "o.quantity AS quantity FROM orders o JOIN picks p ON o.order_id = p.order_id"))
    def q(sum: String): Seq[(Option[String], String)] = pre :+ (None ->
      s"""SELECT j.event_time AS event_time, s.num_shipped AS ship_sz,
         |  count(*) AS n, $sum AS q_total
         |FROM j LEFT JOIN shipments s ON j.oid = s.order_id
         |GROUP BY j.event_time, s.num_shipped""".stripMargin)
    val qFast = q("sum(j.quantity)")
    // stddev_pop (non-mergeable) forces TRUE recompute — see the direct
    // agg-left test
    val qSlow = q("CAST(sum(j.quantity) + stddev_pop(j.quantity) * 0 AS BIGINT)")
    var offA = 0L; var offP = 0L; var offB = 0L
    var nextOut = Map("f" -> 0L, "c" -> 0L)
    var prevF: Option[String] = None; var prevC: Option[String] = None
    var firstOrder: OrderRow = null
    (1 to 6).foreach { run =>
      val nA0 = if (run == 1) 2 else rnd.nextInt(3)
      val orders0 = (0 until nA0).map { i =>
        OrderRow(offA + i, Op.Append, t(ts(run)), t(ts(run)),
          1 + rnd.nextInt(3), 10 * (1 + rnd.nextInt(4)))
      }
      val orders =
        if (run == 1)
          orders0 :+ OrderRow(offA + nA0, Op.Append, t(ts(run)), t(ts(run)), 99, 50)
        else orders0
      if (run == 1) firstOrder = orders.head
      val orderSlice =
        if (run == 4)
          orders :+ OrderRow(offA + orders.length, Op.Retract, t(ts(run)),
            firstOrder.event_time, firstOrder.order_id, firstOrder.quantity)
        else orders
      val picks: Seq[Shipment] = run match {
        case 1 => Seq(1L, 2L, 3L, 99L).zipWithIndex.map { case (id, i) =>
          Shipment(offP + i, Op.Append, t(ts(1)), t(ts(1)), id, 7)
        }
        case _ => (0 until rnd.nextInt(2)).map(i =>
          Shipment(offP + i, Op.Append, t(ts(run)), t(ts(run)),
            1 + rnd.nextInt(3), 8))
      }
      val ships0 = (0 until rnd.nextInt(3)).map { i =>
        Shipment(offB + i, Op.Append, t(ts(run)), t(ts(run)),
          1 + rnd.nextInt(3), 5 * (1 + rnd.nextInt(3)))
      }
      val ships =
        if (run == 3)
          ships0 :+ Shipment(offB + ships0.length, Op.Append, t(ts(run)),
            t(ts(run)), 99, 20)
        else ships0
      val nA = orderSlice.length; val nP = picks.length; val nB = ships.length
      def stage(dir: java.nio.file.Path): (String, String, String) = {
        val o = s"$dir/o$run.parquet"; val p = s"$dir/p$run.parquet"
        val s = s"$dir/s$run.parquet"
        if (run == 1)
          writeSlice(Seq(Shipment(0, Op.Append, t(ts(1)), t(ts(1)), 999, 1)),
            s"$dir/schemafix.parquet")
        if (nA > 0) writeSlice(orderSlice, o)
        if (nP > 0) writeSlice(picks, p)
        if (nB > 0) writeSlice(ships, s)
        (o, p, s)
      }
      val (oF, pF, sF) = stage(dirF); val (oC, pC, sC) = stage(dirC)
      def drive(tag: String, dir: java.nio.file.Path,
          o: String, p: String, s: String,
          qs: Seq[(Option[String], String)], prev: Option[String]): String = {
        val resp = runT(TransformRequest(
          "did:out", "out", ts(run + 10), DatasetVocabulary(),
          transform(qs: _*),
          Vector(
            mkInput("orders", if (nA > 0) o else null,
              s"$dir/o1.parquet", nA, startOffset = offA, wms = Seq(ts(run))),
            mkInput("picks", if (nP > 0) p else null,
              s"$dir/schemafix.parquet", nP, startOffset = offP, wms = Seq(ts(run))),
            mkInput("shipments", if (nB > 0) s else null,
              s"$dir/schemafix.parquet", nB, startOffset = offB, wms = Seq(ts(run)))),
          nextOffset = nextOut(tag), prevCheckpointPath = prev,
          newCheckpointPath = s"$dir/cp$run",
          newDataPath = s"$dir/out$run.parquet"))
        nextOut += tag -> resp.newOffsetInterval.map(_.end + 1).getOrElse(nextOut(tag))
        s"$dir/cp$run"
      }
      prevF = Some(drive("f", dirF, oF, pF, sF, qFast, prevF))
      prevC = Some(drive("c", dirC, oC, pC, sC, qSlow, prevC))
      offA += nA; offP += nP; offB += nB
      val sel = Seq("offset", "op", "event_time", "ship_sz", "n", "q_total")
      def readRun(dir: java.nio.file.Path): Seq[org.apache.spark.sql.Row] = {
        val p = s"$dir/out$run.parquet"
        if (java.nio.file.Files.exists(java.nio.file.Paths.get(p)))
          readOut(p).orderBy("offset")
            .select(sel.map(org.apache.spark.sql.functions.col): _*).collect().toSeq
        else Seq.empty
      }
      val outF = readRun(dirF); val outC = readRun(dirC)
      assert(outF == outC, s"run $run diverged:\nF=$outF\nC=$outC")
      if (run == 1) // everything unmatched: NULL ship_sz groups
        assert(outF.exists(r => r.isNullAt(3)))
    }
    assert(nextOut("f") > 0)
  }

  test("DISTINCT emits only never-seen rows across runs") {
    import spark.implicits._
    val dir = tmp()
    val q = "SELECT DISTINCT event_time, symbol FROM tickers"
    val in1 = s"$dir/in1.parquet"
    writeSlice(Seq(
      Ticker(0, 0, t(ts(1)), t(ts(1)), "A", 10),
      Ticker(1, 0, t(ts(1)), t(ts(1)), "A", 12),
      Ticker(2, 0, t(ts(1)), t(ts(1)), "B", 20)), in1)
    val r1 = runT(TransformRequest(
      "did:out", "out", ts(10), DatasetVocabulary(),
      transform(None -> q),
      Vector(mkInput("tickers", in1, in1, 3, wms = Seq(ts(1)))),
      nextOffset = 0, prevCheckpointPath = None,
      newCheckpointPath = s"$dir/cp1", newDataPath = s"$dir/out1.parquet"))
    assert(r1.newOffsetInterval.contains(OffsetInterval(0, 1)))
    assert(readOut(s"$dir/out1.parquet").orderBy("offset").collect()
      .map(_.getAs[String]("symbol")).toSeq == Seq("A", "B"))

    // run 2: (day-1, A) again (already emitted, silent) + new (day-2, C)
    val in2 = s"$dir/in2.parquet"
    writeSlice(Seq(
      Ticker(3, 0, t(ts(2)), t(ts(1)), "A", 7),
      Ticker(4, 0, t(ts(2)), t(ts(2)), "C", 9)), in2)
    val r2 = runT(TransformRequest(
      "did:out", "out", ts(11), DatasetVocabulary(),
      transform(None -> q),
      Vector(mkInput("tickers", in2, in2, 2, startOffset = 3, wms = Seq(ts(2)))),
      nextOffset = 2, prevCheckpointPath = Some(s"$dir/cp1"),
      newCheckpointPath = s"$dir/cp2", newDataPath = s"$dir/out2.parquet"))
    assert(r2.newOffsetInterval.contains(OffsetInterval(2, 2)))
    val o2 = readOut(s"$dir/out2.parquet").collect()
    assert(o2.map(r => (r.getAs[String]("symbol"), r.getAs[Int]("op"))).toSeq ==
      Seq(("C", Op.Append)))

    // run 3: watermark-only — nothing emits
    val r3 = runT(TransformRequest(
      "did:out", "out", ts(12), DatasetVocabulary(),
      transform(None -> q),
      Vector(mkInput("tickers", null, in1, 0, wms = Seq(ts(3)))),
      nextOffset = 3, prevCheckpointPath = Some(s"$dir/cp2"),
      newCheckpointPath = s"$dir/cp3", newDataPath = s"$dir/out3.parquet"))
    assert(r3.newOffsetInterval.isEmpty)
  }

  test("distinct-over-join delta path and recompute emit identical changelogs") {
    import spark.implicits._
    // Seeded random append-only slices on TWO inputs through DISTINCT above
    // an inner join (delta path: distinct the join's delta terms, anti-join
    // the snapshot) and a value-identical CTE-wrapped recompute variant.
    // Run 4 retracts a run-1 order, covering the flip. The projection drops
    // order quantity so distinct VALUES repeat across different row pairs —
    // the dedup-across-terms and anti-join must both bite.
    val rnd = new scala.util.Random(71)
    val dirF = tmp(); val dirC = tmp()
    val join = """SELECT DISTINCT o.event_time as event_time, o.order_id,
                 |  s.num_shipped
                 |FROM orders o JOIN shipments s ON o.order_id = s.order_id""".stripMargin
    val qFast = join
    val qSlow = s"WITH j AS ($join)\nSELECT event_time, order_id, num_shipped FROM j"
    var offA = 0L; var offB = 0L
    var nextOut = Map("f" -> 0L, "c" -> 0L)
    var prevF: Option[String] = None; var prevC: Option[String] = None
    var firstOrder: OrderRow = null
    (1 to 5).foreach { run =>
      val nA0 = if (run == 1) 2 else rnd.nextInt(3)
      val nB = if (run == 1) 1 + rnd.nextInt(2) else rnd.nextInt(3)
      val orders = (0 until nA0).map { i =>
        OrderRow(offA + i, Op.Append, t(ts(run)), t(ts(1)),
          1 + rnd.nextInt(2), 10 * (1 + rnd.nextInt(5)))
      }
      if (run == 1) firstOrder = orders.head
      val orderSlice =
        if (run == 4)
          orders :+ OrderRow(offA + nA0, Op.Retract, t(ts(run)),
            firstOrder.event_time, firstOrder.order_id, firstOrder.quantity)
        else orders
      val ships = (0 until nB).map { i =>
        Shipment(offB + i, Op.Append, t(ts(run)), t(ts(run)),
          1 + rnd.nextInt(2), 5 * (1 + rnd.nextInt(3)))
      }
      val nA = orderSlice.length
      def stage(dir: java.nio.file.Path): (String, String) = {
        val o = s"$dir/o$run.parquet"; val s = s"$dir/s$run.parquet"
        if (nA > 0) writeSlice(orderSlice, o)
        if (nB > 0) writeSlice(ships, s)
        (o, s)
      }
      val (oF, sF) = stage(dirF); val (oC, sC) = stage(dirC)
      def drive(tag: String, dir: java.nio.file.Path, o: String, s: String,
          q: String, prev: Option[String]): String = {
        val resp = runT(TransformRequest(
          "did:out", "out", ts(run + 10), DatasetVocabulary(),
          transform(None -> q),
          Vector(
            mkInput("orders", if (nA > 0) o else null,
              s"$dir/o1.parquet", nA, startOffset = offA, wms = Seq(ts(run))),
            mkInput("shipments", if (nB > 0) s else null,
              s"$dir/s1.parquet", nB, startOffset = offB, wms = Seq(ts(run)))),
          nextOffset = nextOut(tag), prevCheckpointPath = prev,
          newCheckpointPath = s"$dir/cp$run",
          newDataPath = s"$dir/out$run.parquet"))
        nextOut += tag -> resp.newOffsetInterval.map(_.end + 1).getOrElse(nextOut(tag))
        s"$dir/cp$run"
      }
      prevF = Some(drive("f", dirF, oF, sF, qFast, prevF))
      prevC = Some(drive("c", dirC, oC, sC, qSlow, prevC))
      offA += nA; offB += nB
      val sel = Seq("offset", "op", "event_time", "order_id", "num_shipped")
      def readRun(dir: java.nio.file.Path): Seq[org.apache.spark.sql.Row] = {
        val p = s"$dir/out$run.parquet"
        if (java.nio.file.Files.exists(java.nio.file.Paths.get(p)))
          readOut(p).orderBy("offset")
            .select(sel.map(org.apache.spark.sql.functions.col): _*).collect().toSeq
        else Seq.empty
      }
      val outF = readRun(dirF); val outC = readRun(dirC)
      assert(outF == outC, s"run $run diverged:\nF=$outF\nC=$outC")
    }
    assert(nextOut("f") > 0)
  }

  test("nested DISTINCT strips the inner dedup and stays exactly invertible") {
    import spark.implicits._
    val dir = tmp()
    // An inner DISTINCT below the top is support-preserving — stripped
    // from the refcount partials so counts track RAW input multiplicities.
    // The killer case the strip exists for: duplicates appended in
    // SEPARATE slices (an unstripped inner distinct can't dedup across
    // slices → count 2) then retracted together in ONE slice (unstripped
    // would dedup the retract pair → subtract 1 → value stays visible
    // forever). With the strip, counts are 1+1−2 = 0 and the row dies.
    val q = """SELECT DISTINCT event_time, x FROM
              |  (SELECT DISTINCT event_time, symbol AS x, price FROM tickers) v""".stripMargin
    def drive(run: Int, rows: Seq[Ticker], nextOff: Long): TransformResponse.Success =
      runT(TransformRequest(
        "did:out", "out", ts(run + 10), DatasetVocabulary(),
        transform(None -> q),
        Vector({
          val in = s"$dir/in$run.parquet"
          writeSlice(rows, in)
          mkInput("tickers", in, in, rows.length,
            startOffset = rows.head.offset, wms = Seq(ts(run)))
        }),
        nextOffset = nextOff,
        prevCheckpointPath = if (run == 1) None else Some(s"$dir/cp${run - 1}"),
        newCheckpointPath = s"$dir/cp$run", newDataPath = s"$dir/out$run.parquet"))

    // run 1: (A,10) and (B,20)
    drive(1, Seq(
      Ticker(0, Op.Append, t(ts(1)), t(ts(1)), "A", 10),
      Ticker(1, Op.Append, t(ts(1)), t(ts(1)), "B", 20)), 0)
    val o1 = readOut(s"$dir/out1.parquet").orderBy("offset").collect()
    assert(o1.map(r => (r.getAs[String]("x"), r.getAs[Int]("op"))).toSeq ==
      Seq(("A", Op.Append), ("B", Op.Append)))

    // run 2: a second (A,10) — same (symbol, price), SEPARATE slice; the
    // inner distinct cannot see run 1's copy, raw refcount goes to 2
    val r2 = drive(2, Seq(
      Ticker(2, Op.Append, t(ts(2)), t(ts(1)), "A", 10)), 2)
    assert(r2.newOffsetInterval.isEmpty)

    // run 3: retract BOTH copies of (A,10) in ONE slice — A must die
    val r3 = drive(3, Seq(
      Ticker(3, Op.Retract, t(ts(3)), t(ts(1)), "A", 10),
      Ticker(4, Op.Retract, t(ts(3)), t(ts(1)), "A", 10)), 2)
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$dir/cp3/agg_partials")),
      "retractive run left the refcount merge path")
    assert(r3.newOffsetInterval.contains(OffsetInterval(2, 2)))
    val o3 = readOut(s"$dir/out3.parquet").collect()
    assert(o3.map(r => (r.getAs[String]("x"), r.getAs[Int]("op"))).toSeq ==
      Seq(("A", Op.Retract)))
  }

  test("distinct rides retractions on the refcount merge path") {
    import spark.implicits._
    val dir = tmp()
    // DISTINCT is the support of the input multiset: a hidden per-value
    // refcount rides the invertible merge path, so a duplicate's
    // retraction emits nothing and only the LAST occurrence's retraction
    // retracts the distinct row — with no recompute flip (agg_partials
    // updated every run).
    val q = "SELECT DISTINCT event_time, symbol FROM tickers"
    def drive(run: Int, rows: Seq[Ticker], nextOff: Long): TransformResponse.Success =
      runT(TransformRequest(
        "did:out", "out", ts(run + 10), DatasetVocabulary(),
        transform(None -> q),
        Vector({
          val in = s"$dir/in$run.parquet"
          writeSlice(rows, in)
          mkInput("tickers", in, in, rows.length,
            startOffset = rows.head.offset, wms = Seq(ts(run)))
        }),
        nextOffset = nextOff,
        prevCheckpointPath = if (run == 1) None else Some(s"$dir/cp${run - 1}"),
        newCheckpointPath = s"$dir/cp$run", newDataPath = s"$dir/out$run.parquet"))

    val r1 = drive(1, Seq(
      Ticker(0, Op.Append, t(ts(1)), t(ts(1)), "A", 1),
      Ticker(1, Op.Append, t(ts(1)), t(ts(1)), "A", 2), // same distinct value
      Ticker(2, Op.Append, t(ts(1)), t(ts(1)), "B", 3)), 0)
    assert(r1.newOffsetInterval.contains(OffsetInterval(0, 1)))
    val o1 = readOut(s"$dir/out1.parquet").orderBy("offset").collect()
    assert(o1.map(r => (r.getAs[String]("symbol"), r.getAs[Int]("op"))).toSeq ==
      Seq(("A", Op.Append), ("B", Op.Append)))

    // run 2: retract ONE of A's two occurrences — refcount 2→1, no emission
    val r2 = drive(2, Seq(
      Ticker(3, Op.Retract, t(ts(2)), t(ts(1)), "A", 1)), 2)
    assert(r2.newOffsetInterval.isEmpty)
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$dir/cp2/agg_partials")),
      "retractive run left the refcount merge path")

    // run 3: retract A's last occurrence — the distinct row dies
    val r3 = drive(3, Seq(
      Ticker(4, Op.Retract, t(ts(3)), t(ts(1)), "A", 2)), 2)
    assert(r3.newOffsetInterval.contains(OffsetInterval(2, 2)))
    val o3 = readOut(s"$dir/out3.parquet").collect()
    assert(o3.map(r => (r.getAs[String]("symbol"), r.getAs[Int]("op"))).toSeq ==
      Seq(("A", Op.Retract)))

    // run 4: A reappears — fresh +I
    val r4 = drive(4, Seq(
      Ticker(5, Op.Append, t(ts(4)), t(ts(1)), "A", 9)), 3)
    assert(r4.newOffsetInterval.contains(OffsetInterval(3, 3)))
    val o4 = readOut(s"$dir/out4.parquet").collect()
    assert(o4.map(r => (r.getAs[String]("symbol"), r.getAs[Int]("op"))).toSeq ==
      Seq(("A", Op.Append)))
  }

  test("distinct refcount merge through a pre-step chain matches recompute") {
    import spark.implicits._
    // The DISTINCT sits above a stateless aliased pre-step (refcount merge
    // runs the chain with the output plan overridden); the CTE twin forces
    // recompute. Seeded slices with retractions of still-live rows.
    val rnd = new scala.util.Random(77)
    val dirF = tmp(); val dirC = tmp()
    val fastSteps = Seq(
      Some("v") -> "SELECT event_time, upper(symbol) AS s FROM tickers WHERE price > 1",
      None -> "SELECT DISTINCT event_time, s FROM v")
    val slowSteps = Seq(
      None ->
        """WITH v AS (SELECT event_time, upper(symbol) AS s FROM tickers WHERE price > 1)
          |SELECT DISTINCT event_time, s FROM v""".stripMargin)
    var off = 0L; var nextOut = Map("f" -> 0L, "c" -> 0L)
    var prevF: Option[String] = None; var prevC: Option[String] = None
    var live = Vector.empty[Ticker]
    (1 to 5).foreach { run =>
      val appends = (0 until 1 + rnd.nextInt(3)).map { i =>
        Ticker(off + i, Op.Append, t(ts(run)), t(ts(1)),
          ("a".head + rnd.nextInt(3)).toChar.toString, 1 + rnd.nextInt(4))
      }
      val nRet = if (run >= 2 && live.nonEmpty) rnd.nextInt(live.size + 1) else 0
      val shuffled = rnd.shuffle(live)
      val retractRows = shuffled.take(nRet).zipWithIndex.map { case (p, i) =>
        p.copy(offset = off + appends.length + i, op = Op.Retract,
          system_time = t(ts(run)))
      }
      live = shuffled.drop(nRet) ++ appends
      val slice = appends ++ retractRows
      val inF = s"$dirF/in$run.parquet"; val inC = s"$dirC/in$run.parquet"
      writeSlice(slice, inF); writeSlice(slice, inC)
      def drive(tag: String, dir: java.nio.file.Path, in: String,
          ss: Seq[(Option[String], String)], prev: Option[String]): String = {
        val resp = runT(TransformRequest(
          "did:out", "out", ts(run + 10), DatasetVocabulary(),
          Transform(queries = ss.map { case (a, q) => SqlQueryStep(a, q) }.toVector),
          Vector(mkInput("tickers", in, in, slice.length, startOffset = off,
            wms = Seq(ts(run)))),
          nextOffset = nextOut(tag), prevCheckpointPath = prev,
          newCheckpointPath = s"$dir/cp$run",
          newDataPath = s"$dir/out$run.parquet"))
        nextOut += tag -> resp.newOffsetInterval.map(_.end + 1).getOrElse(nextOut(tag))
        s"$dir/cp$run"
      }
      prevF = Some(drive("f", dirF, inF, fastSteps, prevF))
      prevC = Some(drive("c", dirC, inC, slowSteps, prevC))
      off += slice.length
      def readRun(dir: java.nio.file.Path): Seq[org.apache.spark.sql.Row] = {
        val p = s"$dir/out$run.parquet"
        if (java.nio.file.Files.exists(java.nio.file.Paths.get(p)))
          readOut(p).orderBy("offset").select("offset", "op", "event_time", "s")
            .collect().toSeq
        else Seq.empty
      }
      val outF = readRun(dirF); val outC = readRun(dirC)
      assert(outF == outC, s"run $run diverged:\nF=$outF\nC=$outC")
    }
    assert(nextOut("f") > 0)
  }

  test("intersect rides per-side refcounts through retractions") {
    import spark.implicits._
    val dir = tmp()
    // Visibility = left count > 0 AND right count > 0, a post-merge filter
    // over the hidden side counts: a retraction on EITHER side crosses the
    // threshold as -D, and invisible values keep their counts in state so
    // a later append on the other side surfaces them as +I.
    val q = """SELECT event_time, symbol FROM lhs
              |INTERSECT
              |SELECT event_time, symbol FROM rhs""".stripMargin
    var offL = 0L; var offR = 0L; var nextOut = 0L
    def drive(run: Int, l: Seq[Ticker], r: Seq[Ticker]): (TransformResponse.Success, Seq[(String, Int)]) = {
      val inL = s"$dir/l$run.parquet"; val inR = s"$dir/r$run.parquet"
      val resp = runT(TransformRequest(
        "did:out", "out", ts(run + 10), DatasetVocabulary(),
        transform(None -> q),
        Vector(
          { writeSlice(if (l.nonEmpty) l else Seq(Ticker(offL, 0, t(ts(run)), t(ts(1)), "zz", 0)), inL)
            // always write a schema file; pass no interval when empty
            if (l.nonEmpty)
              mkInput("lhs", inL, inL, l.length, startOffset = l.head.offset,
                wms = Seq(ts(run)))
            else mkInput("lhs", inL, inL, 0, wms = Seq(ts(run)))
              .copy(offsetInterval = None, dataPaths = Vector.empty) },
          { writeSlice(if (r.nonEmpty) r else Seq(Ticker(offR, 0, t(ts(run)), t(ts(1)), "zz", 0)), inR)
            if (r.nonEmpty)
              mkInput("rhs", inR, inR, r.length, startOffset = r.head.offset,
                wms = Seq(ts(run)))
            else mkInput("rhs", inR, inR, 0, wms = Seq(ts(run)))
              .copy(offsetInterval = None, dataPaths = Vector.empty) }),
        nextOffset = nextOut,
        prevCheckpointPath = if (run == 1) None else Some(s"$dir/cp${run - 1}"),
        newCheckpointPath = s"$dir/cp$run", newDataPath = s"$dir/out$run.parquet"))
      nextOut = resp.newOffsetInterval.map(_.end + 1).getOrElse(nextOut)
      val rows =
        if (java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/out$run.parquet")))
          readOut(s"$dir/out$run.parquet").orderBy("offset").collect().toSeq
            .map(r => (r.getAs[String]("symbol"), r.getAs[Int]("op")))
        else Seq.empty
      (resp, rows)
    }
    // run 1: lhs {A,B}, rhs {B,C} → only B intersects
    val (_, o1) = drive(1,
      Seq(Ticker(0, Op.Append, t(ts(1)), t(ts(1)), "A", 1),
        Ticker(1, Op.Append, t(ts(1)), t(ts(1)), "B", 1)),
      Seq(Ticker(0, Op.Append, t(ts(1)), t(ts(1)), "B", 1),
        Ticker(1, Op.Append, t(ts(1)), t(ts(1)), "C", 1)))
    offL = 2; offR = 2
    assert(o1 == Seq(("B", Op.Append)))
    // run 2: rhs retracts B (B leaves), lhs appends C (C now on both sides)
    val (_, o2) = drive(2,
      Seq(Ticker(2, Op.Append, t(ts(2)), t(ts(1)), "C", 9)),
      Seq(Ticker(2, Op.Retract, t(ts(2)), t(ts(1)), "B", 1)))
    offL = 3; offR = 3
    assert(o2 == Seq(("B", Op.Retract), ("C", Op.Append)))
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$dir/cp2/agg_partials")),
      "retractive run left the refcount merge path")
    // run 3: lhs retracts its C — C leaves even though rhs still holds it
    val (_, o3) = drive(3,
      Seq(Ticker(3, Op.Retract, t(ts(3)), t(ts(1)), "C", 9)), Seq.empty)
    assert(o3 == Seq(("C", Op.Retract)))
  }

  test("ALL-variant multiplicity diff emits exact Δk under planted multiplicities") {
    import spark.implicits._
    // Non-vacuous fixture for the multiplicity-diff path (round-7
    // envelope widening): multiplicities are PLANTED — three identical
    // lhs rows, a slice retracting exactly two of them — and the golden
    // asserts the Δk append/retract COUNTS per run, not just twin
    // equivalence. INTERSECT ALL: |A| = min(l, r) so 3→1 lhs copies with
    // r=2 moves the output 2→1 (one retract); EXCEPT ALL: |A| = l − r so
    // the same slice moves 2→0 (two retracts).
    def drive(q: String, expected: Seq[Seq[(String, Int)]]): Unit = {
      val dir = tmp()
      var prev: Option[String] = None
      var nextOut = 0L
      val a = (o: Long, run: Int) => Ticker(o, Op.Append, t(ts(run)), t(ts(1)), "A", 1)
      val r = (o: Long, run: Int) => Ticker(o, Op.Retract, t(ts(run)), t(ts(1)), "A", 1)
      // run 1: lhs A×3, rhs A×2; run 2: lhs retracts 2 of 3;
      // run 3: rhs appends A×3 (no lhs change)
      val slices: Seq[(Seq[Ticker], Seq[Ticker])] = Seq(
        (Seq(a(0, 1), a(1, 1), a(2, 1)), Seq(a(0, 1), a(1, 1))),
        (Seq(r(3, 2), r(4, 2)), Seq.empty),
        (Seq.empty, Seq(a(2, 3), a(3, 3), a(4, 3))))
      var offL = 0L; var offR = 0L
      slices.zip(expected).zipWithIndex.foreach { case (((sl, sr), exp), i) =>
        val run = i + 1
        val inL = s"$dir/l$run.parquet"; val inR = s"$dir/r$run.parquet"
        if (sl.nonEmpty) writeSlice(sl, inL)
        if (sr.nonEmpty) writeSlice(sr, inR)
        val resp = runT(TransformRequest(
          "did:out", "out", ts(run + 10), DatasetVocabulary(),
          transform(None -> q),
          Vector(
            mkInput("lhs", if (sl.nonEmpty) inL else null, s"$dir/l1.parquet",
              sl.length, startOffset = offL, wms = Seq(ts(run))),
            mkInput("rhs", if (sr.nonEmpty) inR else null, s"$dir/l1.parquet",
              sr.length, startOffset = offR, wms = Seq(ts(run)))),
          nextOffset = nextOut, prevCheckpointPath = prev,
          newCheckpointPath = s"$dir/cp$run",
          newDataPath = s"$dir/out$run.parquet"))
        prev = Some(s"$dir/cp$run")
        nextOut = resp.newOffsetInterval.map(_.end + 1).getOrElse(nextOut)
        offL += sl.length; offR += sr.length
        val outP = s"$dir/out$run.parquet"
        val got =
          if (java.nio.file.Files.exists(java.nio.file.Paths.get(outP)))
            readOut(outP).orderBy("offset")
              .collect().toSeq.map(row =>
                (row.getAs[String]("symbol"), row.getAs[Int]("op")))
          else Seq.empty
        assert(got == exp, s"[$q] run $run: got $got, expected $exp")
      }
      // the retractive run must have stayed on the merge path
      assert(java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$dir/cp2/agg_partials")),
        s"[$q] retractive run left the multiplicity merge path")
    }
    drive(
      "SELECT event_time, symbol FROM lhs INTERSECT ALL SELECT event_time, symbol FROM rhs",
      Seq(
        Seq(("A", Op.Append), ("A", Op.Append)),  // min(3,2) = 2
        Seq(("A", Op.Retract)),                   // min(1,2) = 1 → Δ = −1
        Seq.empty))                               // min(1,5) = 1 → Δ = 0
    drive(
      "SELECT event_time, symbol FROM lhs EXCEPT ALL SELECT event_time, symbol FROM rhs",
      Seq(
        Seq(("A", Op.Append)),                    // 3 − 2 = 1
        Seq(("A", Op.Retract)),                   // 1 − 2 → 0 → Δ = −1
        Seq.empty))                               // 1 − 5 → 0 → Δ = 0
    // DISTINCT over EXCEPT ALL (round-8 set-op TREE merge): support of the
    // ALL-multiset, which plain EXCEPT cannot express — at l=3, r=2 EXCEPT
    // emits nothing (r > 0) while this keeps the value (3 − 2 = 1 copy)
    drive(
      "SELECT DISTINCT * FROM (SELECT event_time, symbol FROM lhs " +
        "EXCEPT ALL SELECT event_time, symbol FROM rhs) v",
      Seq(
        Seq(("A", Op.Append)),                    // support(3 − 2) = 1
        Seq(("A", Op.Retract)),                   // support(max(1−2, 0)) = 0
        Seq.empty))                               // support stays 0
  }

  test("set-op and union refcount merges match their recompute twins") {
    import spark.implicits._
    // Seeded slices with appends and retractions on BOTH inputs, driven
    // through INTERSECT / EXCEPT / UNION (per-side refcount merge) and
    // CTE-wrapped twins (recompute). Emitted slices must match
    // row-for-row including offsets every run.
    val ops = Seq(
      "INTERSECT" -> "SELECT event_time, symbol FROM lhs INTERSECT SELECT event_time, symbol FROM rhs",
      "EXCEPT" -> "SELECT event_time, symbol FROM lhs EXCEPT SELECT event_time, symbol FROM rhs",
      "UNION" -> "SELECT event_time, symbol FROM lhs UNION SELECT event_time, symbol FROM rhs",
      // ALL variants: multiset semantics — the merge path diffs per-value
      // multiplicities (round-7 envelope widening) vs the recompute twin's
      // multiset diff; small value domain guarantees multiplicities > 1
      "INTERSECT ALL" -> "SELECT event_time, symbol FROM lhs INTERSECT ALL SELECT event_time, symbol FROM rhs",
      "EXCEPT ALL" -> "SELECT event_time, symbol FROM lhs EXCEPT ALL SELECT event_time, symbol FROM rhs",
      // set-op TREES (round-8): a second DISTINCT over an ALL-variant, and
      // a 3-leaf chain with one input consumed at two leaves — both fold
      // into one composed multiplicity merge vs the CTE recompute twin
      "DISTINCT over EXCEPT ALL" -> ("SELECT DISTINCT * FROM (SELECT event_time, symbol FROM lhs " +
        "EXCEPT ALL SELECT event_time, symbol FROM rhs) v"),
      "UNION ALL then EXCEPT ALL" -> ("SELECT event_time, symbol FROM lhs " +
        "UNION ALL SELECT event_time, symbol FROM lhs " +
        "EXCEPT ALL SELECT event_time, symbol FROM rhs"))
    ops.foreach { case (tag0, qFast) =>
      val qSlow =
        s"""WITH x AS ($qFast)
           |SELECT event_time, symbol FROM x""".stripMargin
      val rnd = new scala.util.Random(tag0.hashCode)
      val dirF = tmp(); val dirC = tmp()
      var offL = 0L; var offR = 0L
      var nextOut = Map("f" -> 0L, "c" -> 0L)
      var prevF: Option[String] = None; var prevC: Option[String] = None
      var liveL = Vector.empty[Ticker]; var liveR = Vector.empty[Ticker]
      (1 to 5).foreach { run =>
        def mkSlice(live: Vector[Ticker], off: Long): (Seq[Ticker], Vector[Ticker]) = {
          val appends = (0 until 1 + rnd.nextInt(3)).map { i =>
            Ticker(off + i, Op.Append, t(ts(run)), t(ts(1)),
              ("A".head + rnd.nextInt(3)).toChar.toString, 1)
          }
          val nRet = if (run >= 2 && live.nonEmpty) rnd.nextInt(live.size + 1) else 0
          val shuffled = rnd.shuffle(live)
          val retractRows = shuffled.take(nRet).zipWithIndex.map { case (p, i) =>
            p.copy(offset = off + appends.length + i, op = Op.Retract,
              system_time = t(ts(run)))
          }
          (appends ++ retractRows, shuffled.drop(nRet) ++ appends)
        }
        val (sliceL, newLiveL) = mkSlice(liveL, offL); liveL = newLiveL
        val (sliceR, newLiveR) = mkSlice(liveR, offR); liveR = newLiveR
        def drive(tag: String, dir: java.nio.file.Path, q: String,
            prev: Option[String]): String = {
          val inL = s"$dir/l$run.parquet"; val inR = s"$dir/r$run.parquet"
          writeSlice(sliceL, inL); writeSlice(sliceR, inR)
          val resp = runT(TransformRequest(
            "did:out", "out", ts(run + 10), DatasetVocabulary(),
            transform(None -> q),
            Vector(
              mkInput("lhs", inL, inL, sliceL.length, startOffset = offL,
                wms = Seq(ts(run))),
              mkInput("rhs", inR, inR, sliceR.length, startOffset = offR,
                wms = Seq(ts(run)))),
            nextOffset = nextOut(tag), prevCheckpointPath = prev,
            newCheckpointPath = s"$dir/cp$run",
            newDataPath = s"$dir/out$run.parquet"))
          nextOut += tag -> resp.newOffsetInterval.map(_.end + 1).getOrElse(nextOut(tag))
          s"$dir/cp$run"
        }
        prevF = Some(drive("f", dirF, qFast, prevF))
        prevC = Some(drive("c", dirC, qSlow, prevC))
        offL += sliceL.length; offR += sliceR.length
        def readRun(dir: java.nio.file.Path): Seq[org.apache.spark.sql.Row] = {
          val p = s"$dir/out$run.parquet"
          if (java.nio.file.Files.exists(java.nio.file.Paths.get(p)))
            readOut(p).orderBy("offset")
              .select("offset", "op", "event_time", "symbol").collect().toSeq
          else Seq.empty
        }
        val outF = readRun(dirF); val outC = readRun(dirC)
        assert(outF == outC, s"$tag0 run $run diverged:\nF=$outF\nC=$outC")
      }
    }
  }

  test("set-ops hiding in pre-steps fold into the multiplicity merge") {
    import spark.implicits._
    // Round 9: single-use pre-steps are inlined into the output plan
    // before the set-op tree walk, so a chain whose set-ops live in
    // PRE-STEPS (previously O(history) recompute) rides the same composed
    // multiplicity merge. Seeded appends+retractions on both inputs; the
    // CTE twin recomputes. The agg_partials assertion proves the fast
    // chain actually took the merge path (non-vacuous).
    val chains: Seq[(String, Seq[(Option[String], String)], String)] = Seq(
      ("pre-step EXCEPT ALL",
        Seq(
          Some("v") -> ("SELECT event_time, symbol FROM lhs " +
            "EXCEPT ALL SELECT event_time, symbol FROM rhs"),
          None -> "SELECT DISTINCT event_time, symbol FROM v"),
        """WITH v AS (SELECT event_time, symbol FROM lhs
          |  EXCEPT ALL SELECT event_time, symbol FROM rhs)
          |SELECT DISTINCT event_time, symbol FROM v""".stripMargin),
      ("nested set-op pre-steps",
        Seq(
          Some("u") -> ("SELECT event_time, symbol FROM lhs " +
            "UNION ALL SELECT event_time, symbol FROM lhs"),
          Some("v") -> ("SELECT event_time, symbol FROM u " +
            "EXCEPT ALL SELECT event_time, symbol FROM rhs"),
          None -> "SELECT DISTINCT event_time, symbol FROM v"),
        """WITH u AS (SELECT event_time, symbol FROM lhs
          |  UNION ALL SELECT event_time, symbol FROM lhs),
          |v AS (SELECT event_time, symbol FROM u
          |  EXCEPT ALL SELECT event_time, symbol FROM rhs)
          |SELECT DISTINCT event_time, symbol FROM v""".stripMargin),
      ("UNION DISTINCT inside a pre-step",
        Seq(
          Some("u") -> ("SELECT event_time, symbol FROM lhs " +
            "UNION SELECT event_time, symbol FROM rhs"),
          None -> "SELECT event_time, symbol FROM u"),
        """WITH u AS (SELECT event_time, symbol FROM lhs
          |  UNION SELECT event_time, symbol FROM rhs)
          |SELECT event_time, symbol FROM u""".stripMargin))
    chains.foreach { case (tag0, qFast, qSlow) =>
      val rnd = new scala.util.Random(tag0.hashCode)
      val dirF = tmp(); val dirC = tmp()
      var offL = 0L; var offR = 0L
      var nextOut = Map("f" -> 0L, "c" -> 0L)
      var prevF: Option[String] = None; var prevC: Option[String] = None
      var liveL = Vector.empty[Ticker]; var liveR = Vector.empty[Ticker]
      (1 to 5).foreach { run =>
        def mkSlice(live: Vector[Ticker], off: Long): (Seq[Ticker], Vector[Ticker]) = {
          val appends = (0 until 1 + rnd.nextInt(3)).map { i =>
            Ticker(off + i, Op.Append, t(ts(run)), t(ts(1)),
              ("A".head + rnd.nextInt(3)).toChar.toString, 1)
          }
          val nRet = if (run >= 2 && live.nonEmpty) rnd.nextInt(live.size + 1) else 0
          val shuffled = rnd.shuffle(live)
          val retractRows = shuffled.take(nRet).zipWithIndex.map { case (p, i) =>
            p.copy(offset = off + appends.length + i, op = Op.Retract,
              system_time = t(ts(run)))
          }
          (appends ++ retractRows, shuffled.drop(nRet) ++ appends)
        }
        val (sliceL, newLiveL) = mkSlice(liveL, offL); liveL = newLiveL
        val (sliceR, newLiveR) = mkSlice(liveR, offR); liveR = newLiveR
        def drive(tag: String, dir: java.nio.file.Path,
            qs: Seq[(Option[String], String)], prev: Option[String]): String = {
          val inL = s"$dir/l$run.parquet"; val inR = s"$dir/r$run.parquet"
          writeSlice(sliceL, inL); writeSlice(sliceR, inR)
          val resp = runT(TransformRequest(
            "did:out", "out", ts(run + 10), DatasetVocabulary(),
            transform(qs: _*),
            Vector(
              mkInput("lhs", inL, inL, sliceL.length, startOffset = offL,
                wms = Seq(ts(run))),
              mkInput("rhs", inR, inR, sliceR.length, startOffset = offR,
                wms = Seq(ts(run)))),
            nextOffset = nextOut(tag), prevCheckpointPath = prev,
            newCheckpointPath = s"$dir/cp$run",
            newDataPath = s"$dir/out$run.parquet"))
          nextOut += tag -> resp.newOffsetInterval.map(_.end + 1).getOrElse(nextOut(tag))
          s"$dir/cp$run"
        }
        prevF = Some(drive("f", dirF, qFast, prevF))
        prevC = Some(drive("c", dirC, Seq(None -> qSlow), prevC))
        offL += sliceL.length; offR += sliceR.length
        def readRun(dir: java.nio.file.Path): Seq[org.apache.spark.sql.Row] = {
          val p = s"$dir/out$run.parquet"
          if (java.nio.file.Files.exists(java.nio.file.Paths.get(p)))
            readOut(p).orderBy("offset")
              .select("offset", "op", "event_time", "symbol").collect().toSeq
          else Seq.empty
        }
        val outF = readRun(dirF); val outC = readRun(dirC)
        assert(outF == outC, s"$tag0 run $run diverged:\nF=$outF\nC=$outC")
      }
      assert(java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$dirF/cp5/agg_partials")),
        s"$tag0: fast chain left the multiplicity merge path")
    }
  }

  test("distinct-delta path and recompute path emit identical changelogs") {
    import spark.implicits._
    // Seeded random slices with a small value domain (guaranteed dups)
    // through the single-step DISTINCT (delta path) and a value-identical
    // CTE-wrapped variant (recompute). Run 4 carries a retraction — if it
    // cancels the LAST occurrence of a row the distinct set shrinks, which
    // only the recompute path can express; the flip must keep both chains
    // identical.
    val rnd = new scala.util.Random(5)
    val dirF = tmp(); val dirC = tmp()
    val qFast = "SELECT DISTINCT event_time, symbol, price FROM tickers"
    val qSlow =
      """WITH d AS (SELECT DISTINCT event_time, symbol, price FROM tickers)
        |SELECT event_time, symbol, price FROM d""".stripMargin
    var off = 0L; var nextOut = Map("f" -> 0L, "c" -> 0L)
    var prevF: Option[String] = None; var prevC: Option[String] = None
    var firstRow: Ticker = null
    (1 to 5).foreach { run =>
      val appends = (0 until 1 + rnd.nextInt(4)).map { i =>
        Ticker(off + i, Op.Append, t(ts(run)), t(ts(run)),
          ("A".head + rnd.nextInt(3)).toChar.toString, 1 + rnd.nextInt(3))
      }
      if (run == 1) firstRow = appends.head
      val rows =
        if (run == 4)
          appends :+ Ticker(off + appends.length, Op.Retract, t(ts(run)),
            firstRow.event_time, firstRow.symbol, firstRow.price)
        else appends
      val nRows = rows.length
      val inF = s"$dirF/in$run.parquet"; val inC = s"$dirC/in$run.parquet"
      writeSlice(rows, inF); writeSlice(rows, inC)
      def drive(tag: String, dir: java.nio.file.Path, in: String, q: String,
          prev: Option[String]): String = {
        val resp = runT(TransformRequest(
          "did:out", "out", ts(run + 10), DatasetVocabulary(),
          transform(None -> q),
          Vector(mkInput("tickers", in, in, nRows, startOffset = off,
            wms = Seq(ts(run)))),
          nextOffset = nextOut(tag), prevCheckpointPath = prev,
          newCheckpointPath = s"$dir/cp$run",
          newDataPath = s"$dir/out$run.parquet"))
        nextOut += tag -> resp.newOffsetInterval.map(_.end + 1).getOrElse(nextOut(tag))
        s"$dir/cp$run"
      }
      prevF = Some(drive("f", dirF, inF, qFast, prevF))
      prevC = Some(drive("c", dirC, inC, qSlow, prevC))
      off += nRows
      val sel = Seq("offset", "op", "event_time", "symbol", "price")
      def readRun(dir: java.nio.file.Path): Seq[org.apache.spark.sql.Row] = {
        val p = s"$dir/out$run.parquet"
        if (java.nio.file.Files.exists(java.nio.file.Paths.get(p)))
          readOut(p).orderBy("offset")
            .select(sel.map(org.apache.spark.sql.functions.col): _*).collect().toSeq
        else Seq.empty
      }
      val outF = readRun(dirF); val outC = readRun(dirC)
      assert(outF == outC, s"run $run diverged:\nF=$outF\nC=$outC")
    }
  }

  test("state carry-append links prior files, appends the slice, merges full tiers") {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    import graft.engine.StateStore
    def files(p: String) = {
      val d = java.nio.file.Paths.get(p)
      if (!java.nio.file.Files.exists(d)) 0
      else {
        val s = java.nio.file.Files.list(d)
        try s.iterator().asScala.count(_.getFileName.toString.endsWith(".parquet"))
        finally s.close()
      }
    }
    val dir = tmp()
    def slice(run: Int) = Seq((run.toLong, s"v$run")).toDF("k", "v").coalesce(1)
    // run 1: no previous checkpoint → plain write
    val s1 = new StateStore(spark, None, s"$dir/cp1")
    s1.appendCarry("buf", slice(1), slice(1), mergeFactor = 3)
    assert(files(s"$dir/cp1/buf") == 1)
    // run 2: below the tier cap → hard-linked carry + appended slice
    val s2 = new StateStore(spark, Some(s"$dir/cp1"), s"$dir/cp2")
    def full(prev: String) = spark.read.parquet(s"$prev/buf")
    s2.appendCarry("buf", slice(2), full(s"$dir/cp1").unionByName(slice(2)), mergeFactor = 3)
    assert(files(s"$dir/cp2/buf") == 2)
    // run 3: the tier fills (3 tiny files) → merged into one
    val s3 = new StateStore(spark, Some(s"$dir/cp2"), s"$dir/cp3")
    s3.appendCarry("buf", slice(3), full(s"$dir/cp2").unionByName(slice(3)), mergeFactor = 3)
    assert(files(s"$dir/cp3/buf") == 1)
    // run 4: carry the merged file + the slice
    val s4 = new StateStore(spark, Some(s"$dir/cp3"), s"$dir/cp4")
    s4.appendCarry("buf", slice(4),
      full(s"$dir/cp3").unionByName(slice(4)).coalesce(1), mergeFactor = 3)
    assert(files(s"$dir/cp4/buf") == 2)
    assert(spark.read.parquet(s"$dir/cp4/buf").orderBy("k")
      .collect().map(_.getString(1)).toSeq == Seq("v1", "v2", "v3", "v4"))

    // Retry semantics (round-3 ADVICE): a retried run reusing the same
    // newCheckpointPath must neither throw on the pre-existing hard links
    // nor double the appended slice — same tolerance as write()'s overwrite.
    val s2r = new StateStore(spark, Some(s"$dir/cp1"), s"$dir/cp2")
    s2r.appendCarry("buf", slice(2), full(s"$dir/cp1").unionByName(slice(2)), mergeFactor = 3)
    assert(files(s"$dir/cp2/buf") == 2)
    assert(spark.read.parquet(s"$dir/cp2/buf").orderBy("k")
      .collect().map(_.getString(1)).toSeq == Seq("v1", "v2"))
  }

  test("30-run carry chain: buffer file count stays logarithmic, rows exact") {
    // Round-3 VERDICT item 7 "done" criterion: a long merge chain's state
    // must stop growing linearly in buffer files. With mergeFactor=4 tiers,
    // 30 one-file appends keep the dir at O(mergeFactor × tiers) files.
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    import graft.engine.StateStore
    def files(p: String) = {
      val s = java.nio.file.Files.list(java.nio.file.Paths.get(p))
      try s.iterator().asScala.count(_.getFileName.toString.endsWith(".parquet"))
      finally s.close()
    }
    val dir = tmp()
    var prev: Option[String] = None
    var maxFiles = 0
    (1 to 30).foreach { run =>
      val cp = s"$dir/cp$run"
      val store = new StateStore(spark, prev, cp)
      val slice = Seq((run.toLong, s"v$run")).toDF("k", "v").coalesce(1)
      val full = prev.map(p => spark.read.parquet(s"$p/buf").unionByName(slice))
        .getOrElse(slice)
      store.appendCarry("buf", slice, full)
      maxFiles = math.max(maxFiles, files(s"$cp/buf"))
      prev = Some(cp)
    }
    // strictly sublinear: 30 runs, never more than 8 live part files
    assert(maxFiles <= 8, s"file count grew to $maxFiles")
    val rows = spark.read.parquet(s"${prev.get}/buf").orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows == (1 to 30).map(i => (i.toLong, s"v$i")))
  }

  test("retract-heavy carry chain compacts to netted form: rows plateau, net exact") {
    // Round-5 VERDICT item 4: a retractive buffer's only consumer nets it,
    // so tier merges may store the netted signed multiset — state ROWS
    // plateau at the live set instead of tracking raw history. Each run
    // appends 20 rows and retracts the previous run's 20; raw history is
    // 20 + (run-1)×40 rows while the live set stays at 20.
    import spark.implicits._
    import graft.engine.StateStore
    import graft.operators.Changelog
    def rowOf(run: Int, i: Int, op: Int, off: Long) =
      (off, op, t(ts(1)), t(ts(run)), s"k${i % 7}", (run * 100 + i).toLong)
    val dir = tmp()
    var prev: Option[String] = None
    var off = 0L
    var raw: org.apache.spark.sql.DataFrame = null
    val compactor = (d: org.apache.spark.sql.DataFrame) =>
      Changelog.compactSigned(d, "op", Seq("offset", "system_time"))
    (1 to 12).foreach { run =>
      val cp = s"$dir/cp$run"
      val store = new StateStore(spark, prev, cp)
      val appends = (0 until 20).map(i => rowOf(run, i, Op.Append, off + i))
      val retracts =
        if (run == 1) Nil
        else (0 until 20).map(i => rowOf(run - 1, i, Op.Retract, off + 20 + i))
      val slice = (appends ++ retracts)
        .toDF("offset", "op", "system_time", "event_time", "symbol", "value")
        .coalesce(1)
      raw = if (raw == null) slice else raw.unionByName(slice)
      val full = prev.map(p => spark.read.parquet(s"$p/buf").unionByName(slice))
        .getOrElse(slice)
      // mergeFactor 2 compacts aggressively so the plateau shows within 12 runs
      store.appendCarry("buf", slice, full, mergeFactor = 2,
        compact = Some(compactor))
      off += (appends.size + retracts.size)
      prev = Some(cp)
    }
    val stored = spark.read.parquet(s"${prev.get}/buf")
    // live multiset = 20 rows; stored netted state must be close to it (the
    // newest uncompacted slice may still carry its raw ±40 rows)
    assert(stored.count() <= 20 + 40,
      s"netted state grew to ${stored.count()} rows (raw history is ${raw.count()})")
    assert(raw.count() == (20 + 11 * 40).toLong)
    // and the net of the compacted state equals the net of raw history
    def net(df: org.apache.spark.sql.DataFrame) =
      Changelog.compactSigned(df, "op", Seq("offset", "system_time"))
        .orderBy("event_time", "symbol", "value", "offset")
        .select("op", "event_time", "symbol", "value", "offset")
        .collect().toSeq
    assert(net(stored) == net(raw))
  }

  test("SELECT DISTINCT is an updating changelog via multiset diff") {
    import spark.implicits._
    val dir = tmp()
    val q = "SELECT DISTINCT event_time, symbol FROM tickers"
    val in1 = s"$dir/in1.parquet"
    writeSlice(Seq(
      Ticker(0, 0, t(ts(1)), t(ts(1)), "A", 10),
      Ticker(1, 0, t(ts(1)), t(ts(1)), "A", 11), // same (event_time, symbol)
      Ticker(2, 0, t(ts(1)), t(ts(2)), "B", 20)), in1)
    runT(TransformRequest(
      "did:out", "out", ts(10), DatasetVocabulary(),
      transform(None -> q),
      Vector(mkInput("tickers", in1, in1, 3, wms = Seq(ts(2)))),
      nextOffset = 0, prevCheckpointPath = None,
      newCheckpointPath = s"$dir/cp1", newDataPath = s"$dir/out1.parquet"))
    val o1 = readOut(s"$dir/out1.parquet").orderBy("offset").collect()
    assert(o1.length == 2) // distinct collapsed the duplicate
    assert(o1.map(_.getAs[Int]("op")).toSeq == Seq(0, 0))

    // run 2: a row for an already-seen distinct value emits nothing; a new
    // value appends once.
    val in2 = s"$dir/in2.parquet"
    writeSlice(Seq(
      Ticker(3, 0, t(ts(3)), t(ts(1)), "A", 99), // duplicate distinct value
      Ticker(4, 0, t(ts(3)), t(ts(3)), "C", 30)), in2)
    runT(TransformRequest(
      "did:out", "out", ts(11), DatasetVocabulary(),
      transform(None -> q),
      Vector(mkInput("tickers", in2, in2, 2, startOffset = 3, wms = Seq(ts(3)))),
      nextOffset = 2, prevCheckpointPath = Some(s"$dir/cp1"),
      newCheckpointPath = s"$dir/cp2", newDataPath = s"$dir/out2.parquet"))
    val o2 = readOut(s"$dir/out2.parquet").collect()
    assert(o2.length == 1)
    assert(o2(0).getAs[String]("symbol") == "C")
    assert(o2(0).getAs[Int]("op") == Op.Append)
  }

  test("unsupported stateful composition → InvalidQuery, not a guess") {
    import spark.implicits._
    val dir = tmp()
    val in = s"$dir/in.parquet"
    writeSlice(Seq(Ticker(0, 0, t(ts(1)), t(ts(1)), "A", 10)), in)
    // tumbling window + non-windowed aggregation in one chain
    val resp = new TransformEngine(spark).executeTransform(TransformRequest(
      "did:out", "out", ts(5), DatasetVocabulary(),
      transform(
        Some("daily") ->
          """SELECT TUMBLE_START(event_time, INTERVAL '1' DAY) as event_time,
            |  symbol, max(price) as mx
            |FROM tickers GROUP BY TUMBLE(event_time, INTERVAL '1' DAY), symbol""".stripMargin,
        None -> "SELECT max(event_time) as event_time, count(*) as n FROM daily"),
      Vector(mkInput("tickers", in, in, 1, wms = Seq(ts(1)))),
      nextOffset = 0, prevCheckpointPath = None,
      newCheckpointPath = s"$dir/cp1", newDataPath = s"$dir/out1.parquet"))
    resp match {
      case TransformResponse.InvalidQuery(m) =>
        assert(m.toLowerCase.contains("tumbling"))
      case other => fail(s"expected InvalidQuery, got $other")
    }
  }

  test("delta-shaped chain over an undeclared relation → InvalidQuery, not InternalError") {
    import spark.implicits._
    val dir = tmp()
    val in = s"$dir/in.parquet"
    writeSlice(Seq(Ticker(0, 0, t(ts(1)), t(ts(1)), "A", 10)), in)
    // The classifier derives join-delta leaves from the chain alone, so
    // this shape classifies as JoinDelta with leaf "phantom" — the
    // executor must strip the proof (leaf not a declared input) and let
    // the recompute path raise the normal table-not-found analysis error,
    // mapped to InvalidQuery (round-7 ADVICE #5).
    val resp = new TransformEngine(spark).executeTransform(TransformRequest(
      "did:out", "out", ts(5), DatasetVocabulary(),
      transform(
        Some("v") -> "SELECT event_time, symbol, price FROM tickers",
        None -> ("SELECT x.event_time AS event_time, x.symbol AS symbol, " +
          "p.price AS p2 FROM v x JOIN phantom p ON x.symbol = p.symbol")),
      Vector(mkInput("tickers", in, in, 1, wms = Seq(ts(1)))),
      nextOffset = 0, prevCheckpointPath = None,
      newCheckpointPath = s"$dir/cp1", newDataPath = s"$dir/out1.parquet"))
    resp match {
      case TransformResponse.InvalidQuery(m) =>
        assert(m.toUpperCase.contains("TABLE_OR_VIEW_NOT_FOUND") ||
          m.toLowerCase.contains("phantom"), m)
      case other => fail(s"expected InvalidQuery, got $other")
    }
  }

  test("TUMBLE_END as the event-time column gates on the end value itself") {
    import spark.implicits._
    val dir = tmp()
    val q = """SELECT TUMBLE_END(event_time, INTERVAL '1' DAY) as event_time,
              |  symbol, max(price) as mx
              |FROM tickers
              |GROUP BY TUMBLE(event_time, INTERVAL '1' DAY), symbol""".stripMargin
    val in1 = s"$dir/in1.parquet"
    writeSlice(Seq(
      Ticker(0, 0, t(ts(1)), t(ts(1, 6)), "A", 10),
      Ticker(1, 0, t(ts(1)), t(ts(2, 6)), "A", 20)), in1)
    // watermark day 2 → day-1 window (end = day 2) closes; day-2 stays open.
    // Round-1 bug: window-end was re-added on top of the END alias, so the
    // gate tested day 3 while the prune dropped the day-2 buffer → loss.
    val r1 = runT(TransformRequest(
      "did:out", "out", ts(10), DatasetVocabulary(),
      transform(None -> q),
      Vector(mkInput("tickers", in1, in1, 2, wms = Seq(ts(2)))),
      nextOffset = 0, prevCheckpointPath = None,
      newCheckpointPath = s"$dir/cp1", newDataPath = s"$dir/out1.parquet"))
    val o1 = readOut(s"$dir/out1.parquet").collect()
    assert(o1.length == 1)
    assert(o1(0).getAs[Timestamp]("event_time") == t(ts(2))) // the window END
    assert(o1(0).getAs[Int]("mx") == 10)

    // run 2: watermark day 3 → day-2 window (end day 3) emits exactly once.
    val r2 = runT(TransformRequest(
      "did:out", "out", ts(11), DatasetVocabulary(),
      transform(None -> q),
      Vector(mkInput("tickers", null, in1, 0, wms = Seq(ts(3)))),
      nextOffset = 1, prevCheckpointPath = Some(s"$dir/cp1"),
      newCheckpointPath = s"$dir/cp2", newDataPath = s"$dir/out2.parquet"))
    val o2 = readOut(s"$dir/out2.parquet").collect()
    assert(o2.length == 1)
    assert(o2(0).getAs[Timestamp]("event_time") == t(ts(3)))
    assert(o2(0).getAs[Int]("mx") == 20)
    assert(r2.newOffsetInterval.contains(OffsetInterval(1, 1)))
  }

  test("offset/system_time are selectable when renamed; SELECT * conflicts") {
    import spark.implicits._
    val dir = tmp()
    val in = s"$dir/in.parquet"
    writeSlice(Seq(
      Ticker(0, 0, t(ts(1)), t(ts(1)), "A", 10),
      Ticker(1, 0, t(ts(1)), t(ts(2)), "B", 20)), in)
    // reference registers the full table (TransformEngine.scala:232), so
    // system columns are visible under their own names…
    runT(TransformRequest(
      "did:out", "out", ts(5), DatasetVocabulary(),
      transform(None ->
        "SELECT event_time, symbol, offset as src_offset FROM tickers"),
      Vector(mkInput("tickers", in, in, 2, wms = Seq(ts(2)))),
      nextOffset = 0, prevCheckpointPath = None,
      newCheckpointPath = s"$dir/cp1", newDataPath = s"$dir/out1.parquet"))
    val o = readOut(s"$dir/out1.parquet").orderBy("offset").collect()
    assert(o.map(_.getAs[Long]("src_offset")).toSeq == Seq(0L, 1L))

    // …and an output carrying them unrenamed is rejected, same as the
    // reference's conflict validation (TransformEngine.scala:269-280).
    val resp = new TransformEngine(spark).executeTransform(TransformRequest(
      "did:out", "out", ts(6), DatasetVocabulary(),
      transform(None -> "SELECT * FROM tickers"),
      Vector(mkInput("tickers", in, in, 2, wms = Seq(ts(2)))),
      nextOffset = 0, prevCheckpointPath = None,
      newCheckpointPath = s"$dir/cp2", newDataPath = s"$dir/out2.parquet"))
    resp match {
      case TransformResponse.InvalidQuery(m) => assert(m.contains("offset"))
      case other => fail(s"expected InvalidQuery, got $other")
    }
  }

  test("raw query: multi-step with aliased intermediate view") {
    import spark.implicits._
    val dir = tmp()
    val in = s"$dir/in.parquet"
    spark.createDataset(Seq(1, 2, 3, 4, 5)).toDF("x").write.parquet(in)
    val resp = new RawQueryEngine(spark).executeRawQuery(RawQueryRequest(
      Vector(in),
      Transform(queries = Vector(
        SqlQueryStep(Some("evens"), "SELECT x FROM input WHERE x % 2 = 0"),
        SqlQueryStep(None, "SELECT CAST(SUM(x) AS BIGINT) AS total FROM evens"))),
      s"$dir/out.parquet"))
    assert(resp == RawQueryResponse.Success(1))
    assert(readOut(s"$dir/out.parquet").collect()(0).getLong(0) == 6L)
  }

  // ──────────────────────────────────────────────────────────────────────
  test("raw query: stateless SQL over parquet with TRY_CAST") {
    import spark.implicits._
    val dir = tmp()
    val in = s"$dir/in.parquet"
    spark.createDataset(Seq("123.45", "oops", "67.8")).toDF("value")
      .write.parquet(in)
    val resp = new RawQueryEngine(spark).executeRawQuery(RawQueryRequest(
      inputDataPaths = Vector(in),
      transform = transform(None ->
        "SELECT TRY_CAST(value AS DECIMAL(10,2)) as value FROM input"),
      outputDataPath = s"$dir/out.parquet"))
    assert(resp == RawQueryResponse.Success(3))
    val vals = readOut(s"$dir/out.parquet").collect().map(_.get(0))
    assert(vals.count(_ == null) == 1)
  }

  test("map: UNION ALL of two inputs emits all rows with deterministic offsets") {
    import spark.implicits._
    val dir = tmp()
    val inA = s"$dir/a.parquet"
    val inB = s"$dir/b.parquet"
    writeSlice(Seq(
      Ticker(0, 0, t(ts(1)), t(ts(1)), "A", 1),
      Ticker(1, 0, t(ts(1)), t(ts(3)), "C", 3)), inA)
    writeSlice(Seq(
      Ticker(0, 0, t(ts(1)), t(ts(2)), "B", 2)), inB)
    val resp = runT(TransformRequest(
      "did:out", "out", ts(5), DatasetVocabulary(),
      transform(None ->
        """SELECT event_time, symbol, price FROM left_in
          |UNION ALL
          |SELECT event_time, symbol, price FROM right_in""".stripMargin),
      Vector(
        mkInput("left_in", inA, inA, 2, wms = Seq(ts(3))),
        mkInput("right_in", inB, inB, 1, wms = Seq(ts(2)))),
      nextOffset = 0, prevCheckpointPath = None,
      newCheckpointPath = s"$dir/cp1", newDataPath = s"$dir/out1.parquet"))
    assert(resp.newOffsetInterval.contains(OffsetInterval(0, 2)))
    assert(resp.newWatermark.contains(ts(2))) // min of the input watermarks
    val syms = readOut(s"$dir/out1.parquet").orderBy("offset")
      .select("symbol").collect().map(_.getString(0)).toSeq
    assert(syms.toSet == Set("A", "B", "C"))
    // deterministic: re-running the same request yields identical offsets
    val dir2 = s"$dir/out1b.parquet"
    runT(TransformRequest(
      "did:out", "out", ts(5), DatasetVocabulary(),
      transform(None ->
        """SELECT event_time, symbol, price FROM left_in
          |UNION ALL
          |SELECT event_time, symbol, price FROM right_in""".stripMargin),
      Vector(
        mkInput("left_in", inA, inA, 2, wms = Seq(ts(3))),
        mkInput("right_in", inB, inB, 1, wms = Seq(ts(2)))),
      nextOffset = 0, prevCheckpointPath = None,
      newCheckpointPath = s"$dir/cp1b", newDataPath = dir2))
    val syms2 = readOut(dir2).orderBy("offset")
      .select("symbol").collect().map(_.getString(0)).toSeq
    assert(syms2 == syms)
  }

  test("snitch: enabled debug observer reports per-step row counts") {
    import spark.implicits._
    val dir = tmp()
    val in = s"$dir/in.parquet"
    writeSlice(Seq(
      Ticker(0, 0, t(ts(1)), t(ts(1)), "A", 10),
      Ticker(1, 0, t(ts(1)), t(ts(2)), "B", 20)), in)
    spark.conf.set(graft.engine.Snitch.EnabledKey, "true")
    graft.engine.Snitch.observed.clear()
    try {
      runT(TransformRequest(
        "did:out", "out", ts(5), DatasetVocabulary(),
        transform(
          Some("pricey") -> "SELECT op, event_time, symbol, price FROM tickers WHERE price > 15",
          None -> "SELECT op, event_time, symbol, price FROM pricey"),
        Vector(mkInput("tickers", in, in, 2, wms = Seq(ts(2)))),
        nextOffset = 0, prevCheckpointPath = None,
        newCheckpointPath = s"$dir/cp1", newDataPath = s"$dir/out1.parquet"))
      // the execution listener reports asynchronously — poll briefly
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      def labels = graft.engine.Snitch.observed.toArray
        .map(_.asInstanceOf[(String, Long)]).groupBy(_._1)
      while (!labels.contains("output") && System.nanoTime() < deadline)
        Thread.sleep(50)
      assert(labels.contains("output"), s"observed: $labels")
      assert(labels("output").exists(_._2 == 1L))
    } finally spark.conf.set(graft.engine.Snitch.EnabledKey, "false")
  }

  test("raw query: now() is pinned by the request systemTime") {
    import spark.implicits._
    val dir = tmp()
    val in = s"$dir/in.parquet"
    spark.createDataset(Seq(1, 2)).toDF("x").write.parquet(in)
    val resp = new RawQueryEngine(spark).executeRawQuery(RawQueryRequest(
      Vector(in),
      transform(None -> "SELECT x, now() AS stamped FROM input"),
      s"$dir/out.parquet",
      systemTime = Some(ts(7))))
    assert(resp == RawQueryResponse.Success(2))
    val stamped = readOut(s"$dir/out.parquet")
      .select("stamped").distinct().collect().map(_.getTimestamp(0)).toSeq
    assert(stamped == Seq(t(ts(7))))
  }

  test("transform: output without event_time column → InvalidQuery") {
    import spark.implicits._
    val dir = tmp()
    val in = s"$dir/in.parquet"
    writeSlice(Seq(Ticker(0, 0, t(ts(1)), t(ts(1)), "A", 10)), in)
    val resp = new TransformEngine(spark).executeTransform(TransformRequest(
      "did:out", "out", ts(5), DatasetVocabulary(),
      transform(None -> "SELECT symbol, price FROM tickers"),
      Vector(mkInput("tickers", in, in, 1, wms = Seq(ts(1)))),
      nextOffset = 0, prevCheckpointPath = None,
      newCheckpointPath = s"$dir/cp1", newDataPath = s"$dir/out1.parquet"))
    resp match {
      case TransformResponse.InvalidQuery(m) => assert(m.contains("event_time"))
      case other => fail(s"expected InvalidQuery, got $other")
    }
  }

  test("transform: unparseable SQL → InvalidQuery") {
    import spark.implicits._
    val dir = tmp()
    val in = s"$dir/in.parquet"
    writeSlice(Seq(Ticker(0, 0, t(ts(1)), t(ts(1)), "A", 10)), in)
    val resp = new TransformEngine(spark).executeTransform(TransformRequest(
      "did:out", "out", ts(5), DatasetVocabulary(),
      transform(None -> "SELECT FROM WHERE !!"),
      Vector(mkInput("tickers", in, in, 1, wms = Seq(ts(1)))),
      nextOffset = 0, prevCheckpointPath = None,
      newCheckpointPath = s"$dir/cp1", newDataPath = s"$dir/out1.parquet"))
    assert(resp.isInstanceOf[TransformResponse.InvalidQuery])
  }

  test("invalid query → InvalidQuery response, not an exception") {
    val dir = tmp()
    val resp = new RawQueryEngine(spark).executeRawQuery(RawQueryRequest(
      inputDataPaths = Vector.empty,
      transform = transform(None -> "SELECT FROM nonsense !!"),
      outputDataPath = s"$dir/out.parquet"))
    assert(resp.isInstanceOf[RawQueryResponse.InvalidQuery] ||
      resp.isInstanceOf[RawQueryResponse.InternalError])
  }

  // ──────────────────────────────────────────────────────────────────────
  test("as-of join feeding a tumbling agg: hold-back, once-only close, late drop") {
    import spark.implicits._
    val dir = tmp()
    val tickIn = s"$dir/tick.parquet"
    val stockIn = s"$dir/stock.parquet"
    // probe: two day-1 tickers + one day-2 ticker
    writeSlice(Seq(
      Ticker(0, 0, t(ts(1)), t(ts(1, 10)), "A", 100),
      Ticker(1, 0, t(ts(1)), t(ts(1, 14)), "A", 110),
      Ticker(2, 0, t(ts(1)), t(ts(2, 9)), "A", 140)), tickIn)
    // build: volume 5 from day 1, volume 7 from day 2
    writeSlice(Seq(
      Stock(0, 0, t(ts(1)), t(ts(1)), "A", 5),
      Stock(1, 0, t(ts(1)), t(ts(2)), "A", 7)), stockIn)

    val enriched =
      """SELECT t.event_time, t.symbol, owned.volume * t.price as value
        |FROM tickers as t
        |JOIN stocks_owned FOR SYSTEM_TIME AS OF t.event_time AS owned
        |  ON t.symbol = owned.symbol""".stripMargin
    val daily =
      """SELECT TUMBLE_START(event_time, INTERVAL '1' DAY) as event_time,
        |  symbol, sum(value) as daily_value, count(*) as n
        |FROM enriched
        |GROUP BY TUMBLE(event_time, INTERVAL '1' DAY), symbol""".stripMargin

    def req(num: Int, tick: Option[(Long, Long)], tickPath: String,
        pw: Instant, bw: Instant, prevCp: Option[String]): TransformRequest =
      TransformRequest(
        "did:out", "out", ts(20 + num), DatasetVocabulary(),
        Transform(
          queries = Vector(SqlQueryStep(Some("enriched"), enriched),
            SqlQueryStep(None, daily)),
          temporalTables = Vector(TemporalTable("stocks_owned", Vector("symbol")))),
        Vector(
          tick match {
            case Some((s, n)) => mkInput("tickers", tickPath, tickIn, n, s, wms = Seq(pw))
            case None         => mkInput("tickers", null, tickIn, 0, wms = Seq(pw))
          },
          if (num == 1) mkInput("stocks_owned", stockIn, stockIn, 2, wms = Seq(bw))
          else mkInput("stocks_owned", null, stockIn, 0, wms = Seq(bw))),
        nextOffset = num - 1, prevCheckpointPath = prevCp,
        newCheckpointPath = s"$dir/cp$num", newDataPath = s"$dir/out$num.parquet")

    // Run 1: build WM day 2 → day-2 ticker held back; probe WM day 3 but
    // reported WM = min(3,2) = day 2 → only the day-1 window closes:
    // 100*5 + 110*5 = 1050 over 2 rows.
    val r1 = runT(req(1, Some((0L, 3L)), tickIn, ts(3), ts(2), None))
    assert(r1.newWatermark.contains(ts(2)))
    val o1 = readOut(s"$dir/out1.parquet").collect()
    assert(o1.length == 1)
    assert(o1(0).getAs[Long]("daily_value") == 1050L && o1(0).getAs[Long]("n") == 2L)

    // Run 2: watermarks to day 4 → held-back day-2 ticker joins volume 7
    // (140*7 = 980), day-2 window closes exactly once, day-1 not re-emitted.
    val r2 = runT(req(2, None, tickIn, ts(4), ts(4), Some(s"$dir/cp1")))
    assert(r2.newWatermark.contains(ts(4)))
    val o2 = readOut(s"$dir/out2.parquet").collect()
    assert(o2.length == 1)
    assert(t(ts(2)).equals(o2(0).getAs[Timestamp]("event_time")))
    assert(o2(0).getAs[Long]("daily_value") == 980L && o2(0).getAs[Long]("n") == 1L)

    // Run 3: a late day-1 ticker lands after its window closed → dropped.
    val lateIn = s"$dir/tick_late.parquet"
    writeSlice(Seq(Ticker(3, 0, t(ts(5)), t(ts(1, 23)), "A", 999)), lateIn)
    val r3 = runT(req(3, Some((3L, 1L)), lateIn, ts(5), ts(5), Some(s"$dir/cp2")))
    assert(r3.newOffsetInterval.isEmpty)
    assert(readOut(s"$dir/out3.parquet").collect().isEmpty)
  }
}

/** Top-level fixture row types (Spark encoders require non-inner classes). */
object EngineFixtures {
  import java.sql.Timestamp
  case class Ticker(offset: Long, op: Int, system_time: Timestamp,
      event_time: Timestamp, symbol: String, price: Int)
  case class OrderRow(offset: Long, op: Int, system_time: Timestamp,
      event_time: Timestamp, order_id: Long, quantity: Long)
  case class Shipment(offset: Long, op: Int, system_time: Timestamp,
      event_time: Timestamp, order_id: Long, num_shipped: Long)
  case class MatchScore(offset: Long, op: Int, system_time: Timestamp,
      match_time: Timestamp, player_name: String, score: Int)
  case class Stock(offset: Long, op: Int, system_time: Timestamp,
      event_time: Timestamp, symbol: String, volume: Int)
  case class DecTicker(offset: Long, op: Int, system_time: Timestamp,
      event_time: Timestamp, symbol: String, price: BigDecimal)
  case class StrOrder(offset: Long, op: Int, system_time: Timestamp,
      event_time: Timestamp, str_key: String, quantity: Long)
  case class IntShip(offset: Long, op: Int, system_time: Timestamp,
      event_time: Timestamp, int_key: Int, num_shipped: Long)
  case class DblOrder(offset: Long, op: Int, system_time: Timestamp,
      event_time: Timestamp, dbl_key: Double, quantity: Long)
  case class DblShip(offset: Long, op: Int, system_time: Timestamp,
      event_time: Timestamp, dbl_key: Double, num_shipped: Long)
  case class Carrier(offset: Long, op: Int, system_time: Timestamp,
      event_time: Timestamp, ship_key: Long, carrier: String)
}
