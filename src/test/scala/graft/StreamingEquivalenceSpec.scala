package graft

import java.nio.file.{Files, Paths}
import java.sql.Timestamp
import java.time.Instant

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.TransformEngine
import graft.protocol._

/** Seeded randomized batch-vs-streaming equivalence over every streaming
  * face (round-9 VERDICT task #1): each chain draws a query shape, random
  * slices (appends, bounded event-time disorder, empty watermark-only
  * runs, and — where the face rides or must reject them — retractions of
  * live rows), then drives the SAME requests through `engine = "spark"`
  * and through `engine = "spark-streaming"` WITH BATCH FALLBACK — a run
  * the streaming gate rejects (InvalidQuery naming the streaming mode) is
  * re-run in batch on the same checkpoint, exactly the coordinator-visible
  * recovery, which also exercises mixed-mode interleaving on one
  * checkpoint chain. Every run must then agree byte-for-byte: response
  * values, output slice files, and checkpoint ledgers.
  *
  * The reference serves every shape through one entry point (reference
  * TransformEngine.scala:64-124); this suite pins that the opt-in
  * Structured Streaming mode can never silently diverge from it. Both
  * round-8 silent-divergence bugs lived exactly on this contract.
  */
class StreamingEquivalenceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.graft.recomputeYoungFactor", "0")
      .getOrCreate()
    // getOrCreate may reuse a session created by another suite in this
    // JVM — pin the detour off at runtime too (byte-identity chains here
    // assert merge-path state layout from run 1)
    s.conf.set("spark.graft.recomputeYoungFactor", "0")
    s
  }

  def ts(day: Int, hour: Int = 0): Instant =
    Instant.parse(f"2000-01-${day}%02dT${hour}%02d:00:00Z")
  def t(i: Instant): Timestamp = Timestamp.from(i)

  /** One generated input row, generic over the fixture schemas: `key`
    * feeds the numeric join keys, `skey` the symbol-like columns, `v` the
    * measure. Retractions copy everything but offset/op/system time. */
  private case class GRow(offset: Long, op: Int, sys: Instant, ev: Instant,
      key: Long, skey: String, v: Long)

  private def toDf(sess: SparkSession, alias: String, rows: Seq[GRow]): DataFrame = {
    import sess.implicits._
    import EngineFixtures._
    alias match {
      case "tickers" => sess.createDataset(rows.map(r =>
        Ticker(r.offset, r.op, t(r.sys), t(r.ev), r.skey, r.v.toInt))).toDF()
      case "orders" => sess.createDataset(rows.map(r =>
        OrderRow(r.offset, r.op, t(r.sys), t(r.ev), r.key, r.v))).toDF()
      case "shipments" => sess.createDataset(rows.map(r =>
        Shipment(r.offset, r.op, t(r.sys), t(r.ev), r.key, r.v))).toDF()
      case "stocks_owned" => sess.createDataset(rows.map(r =>
        Stock(r.offset, r.op, t(r.sys), t(r.ev), r.skey, r.v.toInt))).toDF()
      case "lhs" | "rhs" => sess.createDataset(rows.map(r =>
        Ticker(r.offset, r.op, t(r.sys), t(r.ev), r.skey, r.v.toInt))).toDF()
      case "carriers" => sess.createDataset(rows.map(r =>
        Carrier(r.offset, r.op, t(r.sys), t(r.ev), r.key, r.skey))).toDF()
      case other => sys.error(s"no fixture for alias $other")
    }
  }

  /** A query shape the generator can draw. `retractProb` is the per-run
    * chance of retracting live rows of the FIRST alias; faces that ride
    * retractions serve them in both modes, the rest must reject under
    * streaming (asserted) and fall back to batch. `ridesRetractions`
    * declares which contract applies. `uniqueValues` forces globally
    * unique measures (the Top-N face rejects tied sort keys by design).
    * `dupProb` re-appends a live row's values (DISTINCT dups). */
  private case class Shape(
      name: String,
      aliases: Seq[String],
      sql: scala.util.Random => String,
      temporal: Vector[TemporalTable] = Vector.empty,
      retractProb: Double = 0.0,
      ridesRetractions: Boolean = false,
      uniqueValues: Boolean = false,
      dupProb: Double = 0.0,
      /** Multi-step chains (derived-side shapes); overrides `sql`. */
      steps: Option[scala.util.Random => Vector[SqlQueryStep]] = None) {
    def mkSteps(rnd: scala.util.Random): Vector[SqlQueryStep] =
      steps.map(_(rnd))
        .getOrElse(Vector(SqlQueryStep(None, sql(rnd))))
  }

  private val shapes: Seq[Shape] = Seq(
    Shape("stateless", Seq("tickers"), rnd => {
      val k = 2 + rnd.nextInt(3)
      val where = if (rnd.nextBoolean()) s"\nWHERE price >= ${rnd.nextInt(20)}" else ""
      s"SELECT event_time, symbol, price * $k AS v FROM tickers$where"
    }, retractProb = 0.25, ridesRetractions = true),
    Shape("tumbling-window", Seq("tickers"), rnd => {
      val aggs = rnd.shuffle(Seq(
        "min(price) as mn", "max(price) as mx",
        "sum(price) as total", "count(*) as n")).take(2 + rnd.nextInt(2))
      s"""SELECT TUMBLE_START(event_time, INTERVAL '1' DAY) as event_time,
         |  symbol, ${aggs.mkString(", ")}
         |FROM tickers
         |GROUP BY TUMBLE(event_time, INTERVAL '1' DAY), symbol""".stripMargin
    }),
    Shape("interval-join", Seq("orders", "shipments"), rnd => {
      val days = 1 + rnd.nextInt(3)
      s"""SELECT o.event_time as event_time, o.order_id as order_id,
         |  o.quantity as quantity, s.num_shipped as num_shipped
         |FROM orders o JOIN shipments s
         |ON o.order_id = s.order_id
         |AND s.event_time BETWEEN o.event_time AND o.event_time + INTERVAL '$days' DAY""".stripMargin
    }),
    Shape("asof-join", Seq("tickers", "stocks_owned"), _ =>
      """SELECT t.event_time, t.symbol, owned.volume as volume,
        |  t.price as current_price, owned.volume * t.price as current_value
        |FROM tickers as t
        |JOIN stocks_owned FOR SYSTEM_TIME AS OF t.event_time AS owned
        |  ON t.symbol = owned.symbol""".stripMargin,
      temporal = Vector(TemporalTable("stocks_owned", Vector("symbol")))),
    Shape("topn", Seq("tickers"), rnd => {
      val n = 1 + rnd.nextInt(3)
      s"""SELECT event_time, symbol, price, rn FROM (
         |  SELECT event_time, symbol, price,
         |    row_number() OVER (PARTITION BY symbol ORDER BY price DESC) AS rn
         |  FROM tickers) WHERE rn <= $n""".stripMargin
    }, uniqueValues = true, retractProb = 0.2, ridesRetractions = true),
    Shape("left-join", Seq("orders", "shipments"), _ =>
      """SELECT o.event_time as event_time, o.order_id as order_id,
        |  o.quantity as quantity, s.num_shipped as num_shipped
        |FROM orders o LEFT JOIN shipments s ON o.order_id = s.order_id""".stripMargin,
      retractProb = 0.2, ridesRetractions = true),
    Shape("inner-join", Seq("orders", "shipments"), _ =>
      """SELECT o.event_time as event_time, o.order_id as order_id,
        |  o.quantity as quantity, s.num_shipped as num_shipped
        |FROM orders o JOIN shipments s ON o.order_id = s.order_id""".stripMargin,
      retractProb = 0.2, ridesRetractions = true),
    Shape("inner-join-tree", Seq("orders", "shipments", "carriers"), rnd => {
      // randomly a CHAIN (carriers keyed off the bridge relation) or a
      // STAR (keyed off the first relation) — both 3-relation trees the
      // round-10 chained native-join face serves
      val bridge = if (rnd.nextBoolean()) "s.order_id" else "o.order_id"
      s"""SELECT o.event_time as event_time, o.order_id as order_id,
         |  s.num_shipped as num_shipped, c.carrier as carrier
         |FROM orders o
         |JOIN shipments s ON o.order_id = s.order_id
         |JOIN carriers c ON $bridge = c.ship_key""".stripMargin
    }, retractProb = 0.2, ridesRetractions = true),
    Shape("distinct-union", Seq("tickers"), rnd =>
      if (rnd.nextBoolean())
        "SELECT DISTINCT event_time, symbol, price FROM tickers"
      else
        """SELECT event_time, symbol, price FROM tickers WHERE price % 2 = 0
          |UNION
          |SELECT event_time, symbol, price FROM tickers WHERE price % 3 = 0""".stripMargin,
      retractProb = 0.2, ridesRetractions = true, dupProb = 0.5),
    Shape("invertible-groupby", Seq("tickers"), rnd => {
      val aggs = Seq("count(*) as n", "sum(price) as total") ++
        (if (rnd.nextBoolean()) Seq("avg(price) as mean") else Nil)
      s"""SELECT event_time, symbol, ${aggs.mkString(", ")}
         |FROM tickers GROUP BY event_time, symbol""".stripMargin
    }, retractProb = 0.5, ridesRetractions = true),
    Shape("minmax-groupby", Seq("tickers"), rnd => {
      val aggs = rnd.shuffle(Seq("min(price) as mn", "max(price) as mx"))
        .take(1 + rnd.nextInt(2))
      s"""SELECT event_time, symbol, ${aggs.mkString(", ")}
         |FROM tickers GROUP BY event_time, symbol""".stripMargin
    }, retractProb = 0.2, ridesRetractions = true),
    Shape("left-join-derived", Seq("orders", "shipments"),
      sql = _ => "", retractProb = 0.2, ridesRetractions = true,
      steps = Some(rnd => {
        val k = 2 + rnd.nextInt(5)
        val filt = if (rnd.nextBoolean()) " WHERE num_shipped > 1" else ""
        Vector(
          SqlQueryStep(Some("enriched"),
            s"SELECT event_time, order_id, quantity * $k AS qtyk FROM orders"),
          SqlQueryStep(Some("shipped"),
            s"SELECT order_id AS ship_order, num_shipped FROM shipments$filt"),
          SqlQueryStep(None,
            """SELECT e.event_time as event_time, e.order_id as order_id,
              |  e.qtyk as qtyk, s.num_shipped as num_shipped
              |FROM enriched e LEFT JOIN shipped s
              |  ON e.order_id = s.ship_order""".stripMargin))
      })),
    Shape("left-join-double-key", Seq("orders", "shipments"),
      // round-11: the face keys state on a canonical serialization, so
      // DOUBLE equi-keys serve — fuzz fractional double keys through the
      // derived-side face (the -0.0/NaN edges are pinned in
      // StreamingLeftJoinSpec/ProtocolRoundTripSpec)
      sql = _ => "", retractProb = 0.2, ridesRetractions = true,
      steps = Some(rnd => {
        val d = 2 + rnd.nextInt(3)
        Vector(
          SqlQueryStep(Some("ods"),
            s"SELECT event_time, CAST(order_id AS DOUBLE) / $d AS okey, quantity FROM orders"),
          SqlQueryStep(Some("shs"),
            s"SELECT CAST(order_id AS DOUBLE) / $d AS ship_key, num_shipped FROM shipments"),
          SqlQueryStep(None,
            """SELECT o.event_time as event_time, o.okey as okey,
              |  o.quantity as quantity, s.num_shipped as num_shipped
              |FROM ods o LEFT JOIN shs s ON o.okey = s.ship_key""".stripMargin))
      })),
    Shape("setop-all", Seq("lhs", "rhs"), rnd => {
      val op = if (rnd.nextBoolean()) "EXCEPT ALL" else "INTERSECT ALL"
      s"""SELECT event_time, symbol FROM lhs
         |$op
         |SELECT event_time, symbol FROM rhs""".stripMargin
    }, retractProb = 0.4, ridesRetractions = true, dupProb = 0.5),
    Shape("generic-keyed-recompute", Seq("tickers"), rnd => {
      // a non-decomposable aggregate keeps the recompute path (no merge
      // spec); the round-10 generic face serves its keyed diff emission
      val keys = if (rnd.nextBoolean()) "symbol" else "event_time, symbol"
      s"""SELECT max(event_time) AS event_time, symbol,
         |  count(DISTINCT price) AS n
         |FROM tickers GROUP BY $keys""".stripMargin
    }, retractProb = 0.35, ridesRetractions = true, dupProb = 0.3),
    Shape("generic-multiset-recompute", Seq("tickers"), rnd => {
      // DISTINCT over a RE-KEYING set-op subquery: no refcount spec, no
      // multiplicity fold — keyless full-row multiset recompute served
      // by the round-10 generic face
      val x = 20 + rnd.nextInt(20); val y = 5 + rnd.nextInt(20)
      s"""SELECT DISTINCT event_time, symbol FROM (
         |  SELECT event_time, symbol, price FROM tickers WHERE price < $x
         |  EXCEPT ALL
         |  SELECT event_time, symbol, price FROM tickers WHERE price > $y
         |) v""".stripMargin
    }, retractProb = 0.35, ridesRetractions = true, dupProb = 0.5),
    Shape("join-aggregate", Seq("orders", "shipments"), rnd => {
      val extra = if (rnd.nextBoolean()) ", sum(o.quantity) as q_total" else ""
      s"""SELECT o.event_time as event_time, count(*) as n$extra,
         |  sum(s.num_shipped) as shipped
         |FROM orders o LEFT JOIN shipments s ON o.order_id = s.order_id
         |GROUP BY o.event_time""".stripMargin
    }, retractProb = 0.15, ridesRetractions = true),
    Shape("opread-agg", Seq("tickers"), rnd => {
      // an aggregate READING a system column (round-11): append-only
      // histories serve through the flippable merge path + keyed diff,
      // and the first retraction flips both engines to the generic
      // recompute face — either way the chain must stay byte-identical
      val agg = if (rnd.nextBoolean()) "max(offset) AS mo"
        else "min(offset) AS mo"
      s"""SELECT event_time, symbol, count(*) AS n, $agg
         |FROM tickers GROUP BY event_time, symbol""".stripMargin
    }, retractProb = 0.3, ridesRetractions = true, dupProb = 0.3))

  /** Drive one seeded chain for `shape`; returns (streamedRuns, fellBack).
    * Runs on its own `newSession()` (isolated temp-view catalog over the
    * shared SparkContext) so chains can run concurrently.
    */
  private def driveChain(shape: Shape, seed: Long): (Int, Int) = {
    val sess = spark.newSession()
    sess.conf.set("spark.graft.recomputeYoungFactor", "0")
    val rnd = new scala.util.Random(seed)
    val dir = Files.createTempDirectory(s"graft-equiv-${shape.name}")
    val querySteps = shape.mkSteps(rnd)
    // Key modes, one third of chains each:
    //  0 near-uniform — the baseline small static key space;
    //  1 zipfian (round-11) — ~50% of appends hit ONE key, fuzzing the
    //    delta faces' seed sweeps/key bands under a key that touches most
    //    of state every run;
    //  2 ancient (round-12) — every run's keys are RUN-LOCAL fresh values
    //    except ~40% referencing the FIRST run's key range, so equi
    //    matches happen mostly THROUGH state from many runs back — the
    //    multi-hop Yannakakis sweep / stream-stream staging adversary the
    //    bounded `streamjoin … tree hot` bench prices. Ancient chains run
    //    deeper so "many runs back" is real.
    val keyMode = rnd.nextInt(3)
    val runs = (if (keyMode == 2) 5 else 3) + rnd.nextInt(2)
    def drawKey(run: Int): Long = keyMode match {
      case 1 if rnd.nextDouble() < 0.5 => 1L
      case 2 =>
        if (rnd.nextDouble() < 0.4) 1 + rnd.nextInt(2)
        else run * 10L + rnd.nextInt(4)
      case _ => 1 + rnd.nextInt(6)
    }
    def drawSym(run: Int): String = keyMode match {
      case 1 if rnd.nextDouble() < 0.5 => "A"
      case 2 => if (rnd.nextDouble() < 0.4) "A" else s"S$run"
      case _ => ('A' + rnd.nextInt(3)).toChar.toString
    }

    // ── Generate the whole chain's slices up front (shared by both modes)
    val off = scala.collection.mutable.Map(shape.aliases.map(_ -> 0L): _*)
    val live = scala.collection.mutable.Map(
      shape.aliases.map(_ -> scala.collection.mutable.ArrayBuffer.empty[GRow]): _*)
    var uniq = 0
    var wmDay = 1
    // per run: (alias -> (path, offsetInterval)), watermark
    val plan = (1 to runs).map { run =>
      wmDay += rnd.nextInt(3)
      val wm = ts(math.min(wmDay, 28))
      val sysT = ts(math.min(20 + run, 28), 12)
      val wmOnly = run > 1 && rnd.nextDouble() < 0.15
      val sliceOf = shape.aliases.zipWithIndex.map { case (alias, ai) =>
        val nApp =
          if (wmOnly) 0
          else if (ai == 0 && run == 1) 1 + rnd.nextInt(3)
          else rnd.nextInt(4)
        val appends = (0 until nApp).map { i =>
          uniq += 1
          val evDay = math.max(1, math.min(28,
            wmDay - rnd.nextInt(3) + rnd.nextInt(2)))
          val dup = shape.dupProb > 0 && live(alias).nonEmpty &&
            rnd.nextDouble() < shape.dupProb
          val base =
            if (dup) {
              val d = live(alias)(rnd.nextInt(live(alias).size))
              GRow(off(alias) + i, Op.Append, sysT, d.ev, d.key, d.skey, d.v)
            } else GRow(off(alias) + i, Op.Append, sysT, ts(evDay, rnd.nextInt(6)),
              drawKey(run), drawSym(run),
              if (shape.uniqueValues) 1000 + uniq else rnd.nextInt(50).toLong)
          base
        }
        val nRet =
          if (wmOnly || ai != 0 || live(alias).isEmpty ||
            rnd.nextDouble() >= shape.retractProb) 0
          else 1 + rnd.nextInt(math.min(2, live(alias).size))
        val retracts = (0 until nRet).map { i =>
          val idx = rnd.nextInt(live(alias).size)
          val r = live(alias).remove(idx)
          r.copy(offset = off(alias) + nApp + i, op = Op.Retract, sys = sysT)
        }
        live(alias) ++= appends
        val rows = appends ++ retracts
        val oi =
          if (rows.isEmpty) None
          else Some(OffsetInterval(rows.head.offset, rows.last.offset))
        off(alias) += rows.size
        val path =
          if (rows.isEmpty) None
          else {
            val p = s"$dir/${alias}_r$run.parquet"
            graft.engine.ParquetSliceSink.writeSingleFile(toDf(sess, alias, rows), p)
            Some(p)
          }
        alias -> (path, oi, rows.exists(_.op != Op.Append))
      }
      (sliceOf, wm, sysT)
    }
    // schema files: one dummy row per alias, never referenced as data
    val schemaFile = shape.aliases.map { a =>
      val p = s"$dir/schema_$a.parquet"
      graft.engine.ParquetSliceSink.writeSingleFile(
        toDf(sess, a, Seq(GRow(0, 0, ts(1), ts(1), 1, "A", 1))), p)
      a -> p
    }.toMap

    def request(engine: String, tag: String, run: Int, nextOff: Long) = {
      val (sliceOf, wm, sysT) = plan(run - 1)
      TransformRequest(
        "did:odf:out", "out", sysT.plusSeconds(600 + run), DatasetVocabulary(),
        Transform(engine = engine,
          queries = querySteps,
          temporalTables = shape.temporal),
        sliceOf.map { case (alias, (path, oi, _)) =>
          TransformRequestInput(
            datasetId = s"did:odf:$alias", datasetAlias = alias,
            queryAlias = alias, offsetInterval = oi,
            dataPaths = path.toVector, schemaFile = schemaFile(alias),
            explicitWatermarks = Vector(RequestWatermark(wm, wm)))
        }.toVector,
        nextOffset = nextOff,
        prevCheckpointPath = if (run == 1) None else Some(s"$dir/$tag/cp${run - 1}"),
        newCheckpointPath = s"$dir/$tag/cp$run",
        newDataPath = s"$dir/$tag/out$run.parquet")
    }

    // ── Batch chain ────────────────────────────────────────────────────
    val engine = new TransformEngine(sess)
    var nextB = 0L
    val batchResponses = (1 to runs).map { run =>
      val r = engine.executeTransform(request("spark", "batch", run, nextB))
      r match {
        case TransformResponse.Success(oi, _) =>
          nextB = oi.map(_.end + 1).getOrElse(nextB)
        case other => fail(s"${shape.name} seed=$seed batch run$run: $other")
      }
      r
    }

    // ── Streaming chain with batch fallback on the SAME checkpoints ────
    var nextS = 0L
    var streamed = 0; var fellBack = 0
    val streamResponses = (1 to runs).map { run =>
      val first = engine.executeTransform(
        request("spark-streaming", "stream", run, nextS))
      val r = first match {
        case TransformResponse.InvalidQuery(msg) =>
          assert(msg.toLowerCase.contains("streaming"),
            s"${shape.name} seed=$seed run$run rejected for a non-streaming " +
              s"reason: $msg")
          val retracted = plan.take(run).exists(_._1.exists(_._2._3))
          assert(!shape.ridesRetractions && retracted,
            s"${shape.name} seed=$seed run$run: unexpected streaming " +
              s"rejection (no retraction in history): $msg")
          fellBack += 1
          engine.executeTransform(request("spark", "stream", run, nextS))
        case ok =>
          streamed += 1
          ok
      }
      r match {
        case TransformResponse.Success(oi, _) =>
          nextS = oi.map(_.end + 1).getOrElse(nextS)
        case other => fail(s"${shape.name} seed=$seed stream run$run: $other")
      }
      r
    }

    // ── Byte-identity: responses, slices, ledgers ──────────────────────
    (1 to runs).foreach { run =>
      assert(batchResponses(run - 1) == streamResponses(run - 1),
        s"${shape.name} seed=$seed run$run responses diverged:\n " +
          s"batch ${batchResponses(run - 1)}\n stream ${streamResponses(run - 1)}")
      val b = Paths.get(s"$dir/batch/out$run.parquet")
      val s = Paths.get(s"$dir/stream/out$run.parquet")
      assert(Files.exists(b) == Files.exists(s),
        s"${shape.name} seed=$seed run$run slice existence diverged")
      if (Files.exists(b))
        assert(java.util.Arrays.equals(Files.readAllBytes(b), Files.readAllBytes(s)),
          s"${shape.name} seed=$seed run$run slices are not byte-identical")
      assert(
        Files.readString(Paths.get(s"$dir/batch/cp$run/ledger.json")) ==
          Files.readString(Paths.get(s"$dir/stream/cp$run/ledger.json")),
        s"${shape.name} seed=$seed run$run ledgers diverged")
    }
    (streamed, fellBack)
  }

  private val chainsPerShape =
    sys.env.get("GRAFT_EQUIV_CHAINS").map(_.toInt).getOrElse(10)

  // Chains are independent (own newSession, own temp dirs), so run a few
  // concurrently — the per-run cost is dominated by driver-side planning
  // and streaming-query startup/poll latency, which overlaps well past
  // the executor-thread count.
  private lazy val pool = java.util.concurrent.Executors.newFixedThreadPool(6)
  private lazy val ec = scala.concurrent.ExecutionContext.fromExecutor(pool)

  shapes.foreach { shape =>
    test(s"seeded batch-vs-streaming equivalence: ${shape.name} " +
        s"($chainsPerShape chains)") {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      spark // force session init on the test thread, not inside the pool
      val futs = (1 to chainsPerShape).map { i =>
        Future(driveChain(shape, seed = shape.name.hashCode * 1000L + i))(ec)
      }
      var streamed = 0; var fellBack = 0
      futs.foreach { fut =>
        val (s, f) = Await.result(fut, 30.minutes)
        streamed += s; fellBack += f
      }
      // the suite must actually exercise the streaming face, not fall
      // back everywhere; faces that ride retractions must never fall back
      assert(streamed > 0, s"${shape.name}: no run was served by streaming")
      if (shape.ridesRetractions)
        assert(fellBack == 0,
          s"${shape.name} rides retractions but fell back $fellBack times")
      info(s"${shape.name}: $streamed runs streamed, $fellBack fell back to batch")
    }
  }
}
