package graft

import java.time.Instant

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.TransformEngine
import graft.protocol._

/** Engine-lifetime benchmark: drives N consecutive `executeTransform`
  * invocations of a grouped aggregation over synthetic append slices and
  * reports the incremental-merge fast path against the full-recompute path
  * (a value-identical query shape the classifier cannot merge). The point
  * is the per-run GROWTH, not the absolute numbers: merge-path cost stays
  * flat as history accumulates, recompute grows with it.
  *
  * Usage: `sbt "runMain graft.EngineBench [nSlices] [rowsPerSlice]"`
  * (defaults 30 × 20k). `sbt "runMain graft.EngineBench join [n] [rows]"`
  * runs the two-join-chain variant (n-ary join-tree delta path vs
  * CTE-forced recompute); `join3` the bridge-chain variant whose third
  * position is reachable only transitively (the multi-hop narrowing
  * target); `leftjoinmix` the same data with the inner join in a
  * pre-step LEFT-joined to invoices (multi-relation left side);
  * `reusejoin` the reused-join-step chain;
  * `leftjoin` the every-run-churn left-join changelog chain;
  * `leftjoinpre` its derived-sides variant (pre-step chains feeding the
  * join, row-keyed matched state); `aggleft` the sum/count-above-left-join
  * partials chain (key-range-narrowed since round 9). `join`, `join3`,
  * `leftjoin`/`leftjoinpre` accept an optional THIRD arg `hot` (e.g.
  * `join3 16 5000 0.3`): the fraction of each foreign-key slice pinned to
  * the oldest key — the zipfian skew adversary whose delta key band spans
  * the full history range (round-9 VERDICT #2);
  * `distinctjoin` the DISTINCT-over-join (DistinctDelta) chain;
  * `streamface` the batch-vs-streaming as-of cost curve; `reuse` the
  * reused pre-step chain; `retract` the state-bytes plateau variant;
  * `retractagg` its aggregation twin; `nested` the nested-aggregation
  * touched-partition variant. Prints one JSON line.
  */
object EngineBench {

  /** One session config for every bench mode. Engine-path benches price
    * the PATHS, not the dispatch: the young-dataset recompute detour is
    * pinned off unless explicitly enabled via GRAFT_YOUNG_FACTOR — a mode
    * that silently measured the dispatch instead of its path would be the
    * same delta-vs-delta fiction the round-9 aggleft correction fixed. */
  private def benchSession(): SparkSession = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.graft.recomputeYoungFactor",
        sys.env.getOrElse("GRAFT_YOUNG_FACTOR", "0"))
      // A/B lever for the skew adversary: GRAFT_MAX_BANDS=1 restores the
      // legacy single min/max narrowing band
      .config("spark.graft.maxNarrowBands",
        sys.env.getOrElse("GRAFT_MAX_BANDS",
          graft.engine.IncrementalExecutor.MaxNarrowBands.toString))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("join")) { runJoinChain(args.drop(1)); return }
    if (args.headOption.contains("join3")) { runJoin3Chain(args.drop(1)); return }
    if (args.headOption.contains("leftjoinmix")) {
      runJoin3Chain(args.drop(1), leftMix = true); return
    }
    if (args.headOption.contains("reusejoin")) { runReuseJoinChain(args.drop(1)); return }
    if (args.headOption.contains("leftjoin")) { runLeftJoinChain(args.drop(1)); return }
    if (args.headOption.contains("leftjoinpre")) {
      runLeftJoinChain(args.drop(1), variant = "pre"); return
    }
    if (args.headOption.contains("aggleft")) {
      runLeftJoinChain(args.drop(1), variant = "agg"); return
    }
    if (args.headOption.contains("streamface")) { runStreamFaceChain(args.drop(1)); return }
    if (args.headOption.contains("streamjoin")) { runStreamJoinChain(args.drop(1)); return }
    if (args.headOption.contains("distinctjoin")) { runDistinctJoinChain(args.drop(1)); return }
    if (args.headOption.contains("reuse")) { runReuseChain(args.drop(1)); return }
    if (args.headOption.contains("retract")) { runRetractState(args.drop(1)); return }
    if (args.headOption.contains("retractagg")) { runRetractAgg(args.drop(1)); return }
    if (args.headOption.contains("nested")) { runNestedAgg(args.drop(1)); return }
    if (args.headOption.contains("lshauto")) { runLshAuto(args.drop(1)); return }
    if (args.headOption.contains("simhashauto")) { runSimhashAuto(args.drop(1)); return }
    val nSlices = args.lift(0).map(_.toInt).getOrElse(30)
    val rowsPer = args.lift(1).map(_.toInt).getOrElse(20000)
    val spark = benchSession()
    val base = java.nio.file.Files.createTempDirectory("graft-engine-bench").toString

    (1 to nSlices).foreach { s =>
      val off0 = (s - 1).toLong * rowsPer
      spark.range(rowsPer).select(
        (col("id") + off0).as("offset"),
        lit(0).as("op"),
        lit(java.sql.Timestamp.valueOf("2000-01-01 00:00:00")).as("system_time"),
        (lit(java.sql.Timestamp.valueOf("2000-01-01 00:00:00"))
          + expr(s"make_interval(0,0,0,0,0,0,$s)")).cast("timestamp").as("event_time"),
        concat(lit("k"), pmod(col("id") * 2654435761L + s, lit(5000))).as("symbol"),
        (pmod(col("id") * 31 + s, lit(1000)) + 1).cast("int").as("price"))
        .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$base/slices/s$s")
    }
    def fileOf(s: Int): String = {
      val d = new java.io.File(s"$base/slices/s$s")
      d.listFiles.filter(_.getName.endsWith(".parquet")).head.getPath
    }

    def drive(tag: String, q: String): Double = {
      val t0 = System.nanoTime()
      var prev: Option[String] = None
      (1 to nSlices).foreach { s =>
        val req = TransformRequest(
          "did:out", "out", Instant.parse(f"2000-01-02T${s % 24}%02d:00:00Z"),
          DatasetVocabulary(),
          Transform(queries = Vector(SqlQueryStep(None, q))),
          Vector(TransformRequestInput(
            datasetId = "did:t", datasetAlias = "tickers", queryAlias = "tickers",
            vocab = DatasetVocabulary(),
            offsetInterval = Some(OffsetInterval(
              (s - 1).toLong * rowsPer, s.toLong * rowsPer - 1)),
            dataPaths = Vector(fileOf(s)), schemaFile = fileOf(s),
            explicitWatermarks = Vector(RequestWatermark(
              Instant.parse("2000-01-01T00:00:00Z").plusSeconds(s),
              Instant.parse("2000-01-01T00:00:00Z").plusSeconds(s))))),
          nextOffset = 0, prevCheckpointPath = prev,
          newCheckpointPath = s"$base/$tag/cp$s",
          newDataPath = s"$base/$tag/out$s.parquet")
        new TransformEngine(spark).executeTransform(req) match {
          case _: TransformResponse.Success => ()
          case other                        => sys.error(s"$tag run $s failed: $other")
        }
        prev = Some(s"$base/$tag/cp$s")
      }
      (System.nanoTime() - t0) / 1e9
    }

    val qMerge = """SELECT max(event_time) as event_time, symbol,
                   |  count(*) as n, sum(price) as total
                   |FROM tickers GROUP BY symbol""".stripMargin
    // `+ 0` defeats AggMergeSpec extraction without changing a single value
    val qRecompute = qMerge.replace("sum(price) as total", "sum(price) + 0 as total")

    val tRecompute = drive("recompute", qRecompute)
    val tMerge = drive("merge", qMerge)
    println(f"""{"metric":"engine_lifetime","slices":$nSlices,"rowsPerSlice":$rowsPer,"merge_sec":$tMerge%.1f,"recompute_sec":$tRecompute%.1f,"speedup":${tRecompute / tMerge}%.2f}""")
    spark.stop()
  }

  /** Reused-alias chain (round-7 envelope widening): a join-free pre-step
    * view consumed at BOTH sites of a self-join. The delta path inlines
    * the step per consumption site and telescopes per occurrence —
    * per-run cost O(slice ⋈ state), flat as history grows — while the
    * CTE-forced twin recomputes the full self-join and multiset-diffs the
    * whole snapshot every run. order_id is globally unique, so the join
    * is 1:1 and output size tracks input size.
    */
  private def runReuseChain(args: Array[String]): Unit = {
    val nSlices = args.lift(0).map(_.toInt).getOrElse(30)
    val rowsPer = args.lift(1).map(_.toInt).getOrElse(5000)
    val spark = benchSession()
    val base = java.nio.file.Files.createTempDirectory("graft-reuse-bench").toString
    val t0ts = java.sql.Timestamp.valueOf("2000-01-01 00:00:00")
    (1 to nSlices).foreach { s =>
      val off0 = (s - 1).toLong * rowsPer
      spark.range(rowsPer).select(
        (col("id") + off0).as("offset"), lit(0).as("op"),
        lit(t0ts).as("system_time"),
        (lit(t0ts) + expr(s"make_interval(0,0,0,0,0,0,$s)"))
          .cast("timestamp").as("event_time"),
        (col("id") + off0).as("order_id"),
        (pmod(col("id") * 31 + s, lit(100)) + 1).cast("long").as("quantity"))
        .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$base/slices/s$s")
    }
    def fileOf(s: Int): String = {
      val d = new java.io.File(s"$base/slices/s$s")
      d.listFiles.filter(_.getName.endsWith(".parquet")).head.getPath
    }
    def drive(tag: String, qs: Vector[SqlQueryStep]): (Double, Double, Double) = {
      var firstHalf = 0.0
      val t0 = System.nanoTime()
      var prev: Option[String] = None
      (1 to nSlices).foreach { s =>
        val req = TransformRequest(
          "did:out", "out", Instant.parse(f"2000-01-02T${s % 24}%02d:00:00Z"),
          DatasetVocabulary(),
          Transform(queries = qs),
          Vector(TransformRequestInput(
            datasetId = "did:o", datasetAlias = "orders", queryAlias = "orders",
            vocab = DatasetVocabulary(),
            offsetInterval = Some(OffsetInterval(
              (s - 1).toLong * rowsPer, s.toLong * rowsPer - 1)),
            dataPaths = Vector(fileOf(s)), schemaFile = fileOf(s),
            explicitWatermarks = Vector(RequestWatermark(
              Instant.parse("2000-01-01T00:00:00Z").plusSeconds(s),
              Instant.parse("2000-01-01T00:00:00Z").plusSeconds(s))))),
          nextOffset = 0, prevCheckpointPath = prev,
          newCheckpointPath = s"$base/$tag/cp$s",
          newDataPath = s"$base/$tag/out$s.parquet")
        new TransformEngine(spark).executeTransform(req) match {
          case _: TransformResponse.Success => ()
          case other                        => sys.error(s"$tag run $s failed: $other")
        }
        prev = Some(s"$base/$tag/cp$s")
        if (s == nSlices / 2) firstHalf = (System.nanoTime() - t0) / 1e9
      }
      val total = (System.nanoTime() - t0) / 1e9
      (total, firstHalf, total - firstHalf)
    }
    val qPre = "SELECT event_time, order_id, quantity FROM orders WHERE quantity > 0"
    val qJoin =
      """SELECT x.event_time AS event_time, x.order_id AS order_id,
        |  x.quantity AS q1, y.quantity AS q2
        |FROM cleaned x JOIN cleaned y ON x.order_id = y.order_id""".stripMargin
    val qSlow =
      s"""WITH cleaned AS ($qPre)
         |${qJoin.replace("\n", " ")}""".stripMargin
    val (tR, r1, r2) = drive("recompute", Vector(SqlQueryStep(None, qSlow)))
    val (tD, d1, d2) = drive("delta",
      Vector(SqlQueryStep(Some("cleaned"), qPre), SqlQueryStep(None, qJoin)))
    println(f"""{"metric":"engine_reuse","slices":$nSlices,"rowsPerSlice":$rowsPer,"delta_sec":$tD%.1f,"delta_halves":[$d1%.1f,$d2%.1f],"recompute_sec":$tR%.1f,"recompute_halves":[$r1%.1f,$r2%.1f],"speedup":${tR / tD}%.2f}""")
    spark.stop()
  }

  /** Left-join changelog chain: orders arrive each run, shipments for run
    * s ship run s−1's orders — every run appends rowsPer null-pads,
    * retracts the PREVIOUS run's null-pads, and appends their pairs (the
    * operator's full −D/+I surface, every run). order_id is monotone, so
    * the round-8 key-range narrowing can prune the buffer scans: each
    * pass's state side is filtered to the joining slice's key band and the
    * key-sorted generational tiers keep row-group stats tight. The
    * CTE-forced twin recomputes the full left join and multiset-diffs the
    * snapshot every run.
    */
  private def runLeftJoinChain(args: Array[String], variant: String = "plain"): Unit = {
    val nSlices = args.lift(0).map(_.toInt).getOrElse(30)
    val rowsPer = args.lift(1).map(_.toInt).getOrElse(20000)
    val hot = args.lift(2).map(_.toDouble).getOrElse(0.0)
    val spark = benchSession()
    val base = java.nio.file.Files.createTempDirectory("graft-leftjoin-bench").toString
    val t0ts = java.sql.Timestamp.valueOf("2000-01-01 00:00:00")
    (1 to nSlices).foreach { s =>
      val off0 = (s - 1).toLong * rowsPer
      spark.range(rowsPer).select(
        (col("id") + off0).as("offset"), lit(0).as("op"),
        lit(t0ts).as("system_time"),
        (lit(t0ts) + expr(s"make_interval(0,0,0,0,0,0,$s)"))
          .cast("timestamp").as("event_time"),
        (col("id") + off0).as("order_id"),
        (pmod(col("id") * 31 + s, lit(100)) + 1).cast("long").as("quantity"))
        .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$base/slices/o$s")
      // ship the PREVIOUS run's orders (run 1 ships nothing real: ids < 0
      // never match, keeping slice sizes uniform); under `hot` skew a
      // fixed fraction reference ORDER 1 every run — the delta band over
      // the orders buffer and matched state spans the full history
      val shipBase = (s - 2).toLong * rowsPer
      val shipKey =
        if (hot > 0)
          when(pmod(col("id") * 7 + s, lit(1000)) < lit((hot * 1000).toInt),
            lit(1L)).otherwise(col("id") + shipBase)
        else col("id") + shipBase
      spark.range(rowsPer).select(
        (col("id") + (s - 1).toLong * rowsPer).as("offset"), lit(0).as("op"),
        lit(t0ts).as("system_time"),
        (lit(t0ts) + expr(s"make_interval(0,0,0,0,0,0,$s)"))
          .cast("timestamp").as("event_time"),
        shipKey.cast("long").as("order_id"),
        (pmod(col("id") * 17 + s, lit(50)) + 1).cast("long").as("num_shipped"))
        .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$base/slices/h$s")
    }
    def fileOf(kind: String, s: Int): String = {
      val d = new java.io.File(s"$base/slices/$kind$s")
      d.listFiles.filter(_.getName.endsWith(".parquet")).head.getPath
    }
    def drive(tag: String, qs: Vector[SqlQueryStep]): (Double, Double, Double) = {
      var firstHalf = 0.0
      val t0 = System.nanoTime()
      var prev: Option[String] = None
      (1 to nSlices).foreach { s =>
        def input(alias: String, kind: String) = TransformRequestInput(
          datasetId = s"did:$alias", datasetAlias = alias, queryAlias = alias,
          vocab = DatasetVocabulary(),
          offsetInterval = Some(OffsetInterval(
            (s - 1).toLong * rowsPer, s.toLong * rowsPer - 1)),
          dataPaths = Vector(fileOf(kind, s)), schemaFile = fileOf(kind, s),
          explicitWatermarks = Vector(RequestWatermark(
            Instant.parse("2000-01-01T00:00:00Z").plusSeconds(s),
            Instant.parse("2000-01-01T00:00:00Z").plusSeconds(s))))
        val req = TransformRequest(
          "did:out", "out", Instant.parse(f"2000-01-02T${s % 24}%02d:00:00Z"),
          DatasetVocabulary(),
          Transform(queries = qs),
          Vector(input("orders", "o"), input("shipments", "h")),
          nextOffset = 0, prevCheckpointPath = prev,
          newCheckpointPath = s"$base/$tag/cp$s",
          newDataPath = s"$base/$tag/out$s.parquet")
        new TransformEngine(spark).executeTransform(req) match {
          case _: TransformResponse.Success => ()
          case other                        => sys.error(s"$tag run $s failed: $other")
        }
        prev = Some(s"$base/$tag/cp$s")
        if (s == nSlices / 2) firstHalf = (System.nanoTime() - t0) / 1e9
      }
      val total = (System.nanoTime() - t0) / 1e9
      (total, firstHalf, total - firstHalf)
    }
    // `variant = "pre"` (leftjoinpre): both sides fed through stateless
    // pre-steps — the round-9 widened LeftJoinDelta shape with row-keyed
    // matched state. `variant = "agg"` (aggleft): a sum/count aggregate
    // above the direct left join — the partials path whose state scans
    // gained key-range narrowing in round 9. Default: the direct
    // single-step changelog shape.
    val (qFastSteps, qSlowSteps) =
      if (variant == "agg") {
        // group key = event_time (one group per slice; old groups
        // untouched by later runs — the narrowed scans should keep the
        // per-run cost flat). The non-mergeable stddev_pop term forces the
        // twin onto the GENUINE recompute path (a `+ 0` twin still
        // classifies mergeable via exprCols and would measure the partials
        // path against itself).
        def q(sum: String) =
          s"""SELECT o.event_time AS event_time, count(*) AS n,
             |  $sum AS q_total
             |FROM orders o LEFT JOIN shipments s ON o.order_id = s.order_id
             |GROUP BY o.event_time""".stripMargin
        (Vector(SqlQueryStep(None, q("sum(o.quantity)"))),
          Vector(SqlQueryStep(None,
            q("CAST(sum(o.quantity) + stddev_pop(o.quantity) * 0 AS BIGINT)"))))
      } else if (variant == "pre") {
        val pre = Vector(
          SqlQueryStep(Some("enriched"),
            "SELECT event_time, order_id, quantity * 2 AS qty2 FROM orders"),
          SqlQueryStep(Some("shipped"),
            "SELECT order_id AS ship_order, num_shipped FROM shipments"))
        val join =
          """SELECT e.event_time AS event_time, e.order_id AS order_id,
            |  e.qty2 AS qty2, s.num_shipped AS num_shipped
            |FROM enriched e LEFT JOIN shipped s ON e.order_id = s.ship_order""".stripMargin
        (pre :+ SqlQueryStep(None, join),
          pre :+ SqlQueryStep(None,
            s"""WITH j AS (${join.replace("\n", " ")})
               |SELECT event_time, order_id, qty2, num_shipped FROM j""".stripMargin))
      } else {
        val qJoin =
          """SELECT o.event_time AS event_time, o.order_id AS order_id,
            |  o.quantity AS quantity, s.num_shipped AS num_shipped
            |FROM orders o LEFT JOIN shipments s ON o.order_id = s.order_id""".stripMargin
        (Vector(SqlQueryStep(None, qJoin)),
          Vector(SqlQueryStep(None,
            s"""WITH j AS (${qJoin.replace("\n", " ")})
               |SELECT event_time, order_id, quantity, num_shipped FROM j""".stripMargin)))
      }
    val (tR, r1, r2) = drive("recompute", qSlowSteps)
    val (tD, d1, d2) = drive("delta", qFastSteps)
    val metric = variant match {
      case "pre" => "engine_leftjoinpre"
      case "agg" => "engine_aggleft"
      case _     => "engine_leftjoin"
    }
    val hotField = if (hot > 0) s""","hot":$hot""" else ""
    println(f"""{"metric":"$metric%s","slices":$nSlices,"rowsPerSlice":$rowsPer$hotField%s,"delta_sec":$tD%.1f,"delta_halves":[$d1%.1f,$d2%.1f],"recompute_sec":$tR%.1f,"recompute_halves":[$r1%.1f,$r2%.1f],"speedup":${tR / tD}%.2f}""")
    spark.stop()
  }

  /** DISTINCT-over-join chain (the [[graft.engine.PlanClassifier.DistinctDelta]]
    * path): per run the join's delta terms are distinct-ed and anti-joined
    * against the persisted snapshot. With the round-8 narrowing both sides
    * of that anti-join are O(touched): the join terms are key-range
    * narrowed and the snapshot scan is pruned to the slice's value band
    * (order_id is monotone, so the band excludes all earlier generations
    * of the key-clustered snapshot). The CTE-forced twin recomputes the
    * full distinct join and multiset-diffs the whole snapshot every run.
    */
  private def runDistinctJoinChain(args: Array[String]): Unit = {
    val nSlices = args.lift(0).map(_.toInt).getOrElse(30)
    val rowsPer = args.lift(1).map(_.toInt).getOrElse(20000)
    val spark = benchSession()
    val base = java.nio.file.Files.createTempDirectory("graft-distinctjoin-bench").toString
    val t0ts = java.sql.Timestamp.valueOf("2000-01-01 00:00:00")
    (1 to nSlices).foreach { s =>
      val off0 = (s - 1).toLong * rowsPer
      spark.range(rowsPer).select(
        (col("id") + off0).as("offset"), lit(0).as("op"),
        lit(t0ts).as("system_time"),
        (lit(t0ts) + expr(s"make_interval(0,0,0,0,0,0,$s)"))
          .cast("timestamp").as("event_time"),
        (col("id") + off0).as("order_id"),
        (pmod(col("id") * 31 + s, lit(100)) + 1).cast("long").as("quantity"))
        .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$base/slices/o$s")
      val shipBase = (s - 2).toLong * rowsPer
      spark.range(rowsPer).select(
        (col("id") + (s - 1).toLong * rowsPer).as("offset"), lit(0).as("op"),
        lit(t0ts).as("system_time"),
        (lit(t0ts) + expr(s"make_interval(0,0,0,0,0,0,$s)"))
          .cast("timestamp").as("event_time"),
        (col("id") + shipBase).as("order_id"),
        (pmod(col("id") * 17 + s, lit(50)) + 1).cast("long").as("num_shipped"))
        .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$base/slices/h$s")
    }
    def fileOf(kind: String, s: Int): String = {
      val d = new java.io.File(s"$base/slices/$kind$s")
      d.listFiles.filter(_.getName.endsWith(".parquet")).head.getPath
    }
    def drive(tag: String, qs: Vector[SqlQueryStep]): (Double, Double, Double) = {
      var firstHalf = 0.0
      val t0 = System.nanoTime()
      var prev: Option[String] = None
      (1 to nSlices).foreach { s =>
        def input(alias: String, kind: String) = TransformRequestInput(
          datasetId = s"did:$alias", datasetAlias = alias, queryAlias = alias,
          vocab = DatasetVocabulary(),
          offsetInterval = Some(OffsetInterval(
            (s - 1).toLong * rowsPer, s.toLong * rowsPer - 1)),
          dataPaths = Vector(fileOf(kind, s)), schemaFile = fileOf(kind, s),
          explicitWatermarks = Vector(RequestWatermark(
            Instant.parse("2000-01-01T00:00:00Z").plusSeconds(s),
            Instant.parse("2000-01-01T00:00:00Z").plusSeconds(s))))
        val req = TransformRequest(
          "did:out", "out", Instant.parse(f"2000-01-02T${s % 24}%02d:00:00Z"),
          DatasetVocabulary(),
          Transform(queries = qs),
          Vector(input("orders", "o"), input("shipments", "h")),
          nextOffset = 0, prevCheckpointPath = prev,
          newCheckpointPath = s"$base/$tag/cp$s",
          newDataPath = s"$base/$tag/out$s.parquet")
        new TransformEngine(spark).executeTransform(req) match {
          case _: TransformResponse.Success => ()
          case other                        => sys.error(s"$tag run $s failed: $other")
        }
        prev = Some(s"$base/$tag/cp$s")
        if (s == nSlices / 2) firstHalf = (System.nanoTime() - t0) / 1e9
      }
      val total = (System.nanoTime() - t0) / 1e9
      (total, firstHalf, total - firstHalf)
    }
    val qFast =
      """SELECT DISTINCT o.event_time AS event_time, o.order_id AS order_id,
        |  s.num_shipped AS num_shipped
        |FROM orders o JOIN shipments s ON o.order_id = s.order_id""".stripMargin
    val qSlow =
      s"""WITH j AS (${qFast.replace("\n", " ")})
         |SELECT event_time, order_id, num_shipped FROM j""".stripMargin
    val (tR, r1, r2) = drive("recompute", Vector(SqlQueryStep(None, qSlow)))
    val (tD, d1, d2) = drive("delta", Vector(SqlQueryStep(None, qFast)))
    println(f"""{"metric":"engine_distinctjoin","slices":$nSlices,"rowsPerSlice":$rowsPer,"delta_sec":$tD%.1f,"delta_halves":[$d1%.1f,$d2%.1f],"recompute_sec":$tR%.1f,"recompute_halves":[$r1%.1f,$r2%.1f],"speedup":${tR / tD}%.2f}""")
    spark.stop()
  }

  /** Streaming-face cost curve: the SAME as-of chain driven through the
    * batch engine and the opt-in Structured Streaming face
    * (engine = "spark-streaming"), outputs byte-identical by contract.
    * State grows every run (rowsPer quote versions across 200 symbols)
    * while each run's slices touch a sliding 20-symbol window — so with
    * the round-8 touched-key staging the streaming face's per-run I/O is
    * O(state ∩ touched + slice), and its halves should stay ~flat while
    * the cost multiple over batch prices the opt-in.
    */
  private def runStreamFaceChain(args: Array[String]): Unit = {
    val nSlices = args.lift(0).map(_.toInt).getOrElse(16)
    val rowsPer = args.lift(1).map(_.toInt).getOrElse(5000)
    val nKeys = 200; val touched = 20
    val spark = benchSession()
    val base = java.nio.file.Files.createTempDirectory("graft-streamface-bench").toString
    val t0ts = java.sql.Timestamp.valueOf("2000-01-01 00:00:00")
    (1 to nSlices).foreach { s =>
      val off0 = (s - 1).toLong * rowsPer
      // sliding 20-of-200 key window: runs overlap but never cover the store
      def sym = concat(lit("s"), lpad(
        pmod(lit(s.toLong * 7) + pmod(col("id"), lit(touched)), lit(nKeys))
          .cast("string"), 3, "0"))
      def evt = (lit(t0ts) + expr(s"make_interval(0,0,0,0,0,0,$s)"))
        .cast("timestamp")
      spark.range(rowsPer).select(
        (col("id") + off0).as("offset"), lit(0).as("op"),
        lit(t0ts).as("system_time"), evt.as("event_time"),
        sym.as("symbol"),
        (pmod(col("id") * 31 + s, lit(100)) + 1).cast("long").as("qty"))
        .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$base/slices/t$s")
      spark.range(rowsPer).select(
        (col("id") + off0).as("offset"), lit(0).as("op"),
        lit(t0ts).as("system_time"), evt.as("event_time"),
        sym.as("symbol"),
        (pmod(col("id") * 17 + s, lit(500)) + 1).cast("long").as("price"))
        .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$base/slices/q$s")
    }
    def fileOf(kind: String, s: Int): String = {
      val d = new java.io.File(s"$base/slices/$kind$s")
      d.listFiles.filter(_.getName.endsWith(".parquet")).head.getPath
    }
    val q = """SELECT t.event_time, t.symbol, t.qty AS qty, v.price AS price,
              |  t.qty * v.price AS notional
              |FROM trades AS t
              |JOIN quotes FOR SYSTEM_TIME AS OF t.event_time AS v
              |  ON t.symbol = v.symbol""".stripMargin
    def drive(tag: String, engine: String): (Double, Double, Double) = {
      var firstHalf = 0.0
      val t0 = System.nanoTime()
      var prev: Option[String] = None
      (1 to nSlices).foreach { s =>
        def input(alias: String, kind: String) = TransformRequestInput(
          datasetId = s"did:$alias", datasetAlias = alias, queryAlias = alias,
          vocab = DatasetVocabulary(),
          offsetInterval = Some(OffsetInterval(
            (s - 1).toLong * rowsPer, s.toLong * rowsPer - 1)),
          dataPaths = Vector(fileOf(kind, s)), schemaFile = fileOf(kind, s),
          explicitWatermarks = Vector(RequestWatermark(
            Instant.parse("2000-01-01T00:00:00Z").plusSeconds(s),
            Instant.parse("2000-01-01T00:00:00Z").plusSeconds(s))))
        val req = TransformRequest(
          "did:out", "out", Instant.parse(f"2000-01-02T${s % 24}%02d:00:00Z"),
          DatasetVocabulary(),
          Transform(engine = engine,
            queries = Vector(SqlQueryStep(None, q)),
            temporalTables = Vector(TemporalTable("quotes", Vector("symbol")))),
          Vector(input("trades", "t"), input("quotes", "q")),
          nextOffset = 0, prevCheckpointPath = prev,
          newCheckpointPath = s"$base/$tag/cp$s",
          newDataPath = s"$base/$tag/out$s.parquet")
        new TransformEngine(spark).executeTransform(req) match {
          case _: TransformResponse.Success => ()
          case other                        => sys.error(s"$tag run $s failed: $other")
        }
        prev = Some(s"$base/$tag/cp$s")
        if (s == nSlices / 2) firstHalf = (System.nanoTime() - t0) / 1e9
      }
      val total = (System.nanoTime() - t0) / 1e9
      (total, firstHalf, total - firstHalf)
    }
    val (tB, b1, b2) = drive("batch", "spark")
    val (tS, s1, s2) = drive("stream", "spark-streaming")
    val same = (1 to nSlices).forall { n =>
      java.util.Arrays.equals(
        java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(s"$base/batch/out$n.parquet")),
        java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(s"$base/stream/out$n.parquet")))
    }
    println(f"""{"metric":"engine_streamface","slices":$nSlices,"rowsPerSlice":$rowsPer,"stream_sec":$tS%.1f,"stream_halves":[$s1%.1f,$s2%.1f],"batch_sec":$tB%.1f,"batch_halves":[$b1%.1f,$b2%.1f],"stream_over_batch":${tS / tB}%.2f,"byte_identical":$same}""")
    spark.stop()
  }

  /** Price the NATIVE stream-stream inner-join face (round 9) against the
    * batch delta-join path on the same chain: orders arrive per run and
    * shipments lag one run (each run's ΔB matches the previous run's
    * orders), so both engines emit O(slice) pairs per run while the
    * buffered state grows — a flat streaming half-curve means the
    * touched-key-narrowed seed staging is O(state ∩ touched + slice), not
    * O(state). Byte-identity of every slice is asserted, making this the
    * bench-scale extension of the ProtocolRoundTripSpec chains.
    */
  /** `streamjoin N R [tree]`: with `tree`, a third relation (carriers,
    * keyed on the order ids of the run-before-last — so a full 3-tuple
    * completes only by joining OLD orders⋈shipments state, the
    * multi-hop case the chained-native-join face's seed sweep exists
    * for) prices the round-10 inner-join TREE face. */
  private def runStreamJoinChain(args: Array[String]): Unit = {
    val tree = args.contains("tree")
    val posArgs = args.filterNot(_ == "tree")
    val nSlices = posArgs.lift(0).map(_.toInt).getOrElse(16)
    val rowsPer = posArgs.lift(1).map(_.toInt).getOrElse(5000)
    // zipfian adversary (round-11): a fraction of the PROBE side's bridge
    // keys reference the very first order, so the streaming faces' seed
    // staging (and, for the tree, the Yannakakis semi-join sweep) must
    // pull the hot key's old state every run
    val hot = posArgs.lift(2).map(_.toDouble).getOrElse(0.0)
    val spark = benchSession()
    val base = java.nio.file.Files.createTempDirectory("graft-streamjoin-bench").toString
    val t0ts = java.sql.Timestamp.valueOf("2000-01-01 00:00:00")
    (1 to nSlices).foreach { s =>
      val off0 = (s - 1).toLong * rowsPer
      spark.range(rowsPer).select(
        (col("id") + off0).as("offset"), lit(0).as("op"),
        lit(t0ts).as("system_time"),
        (lit(t0ts) + expr(s"make_interval(0,0,0,0,0,0,$s)"))
          .cast("timestamp").as("event_time"),
        (col("id") + off0).as("order_id"),
        (pmod(col("id") * 31 + s, lit(100)) + 1).cast("long").as("quantity"))
        .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$base/slices/o$s")
      // ship the PREVIOUS run's orders (run 1 ships ids < 0: no matches,
      // uniform slice sizes)
      val shipBase = (s - 2).toLong * rowsPer
      val shipKey =
        if (hot > 0)
          when(pmod(col("id") * 13 + s, lit(1000)) < lit((hot * 1000).toInt),
            lit(0L)).otherwise(col("id") + shipBase)
        else col("id") + shipBase
      spark.range(rowsPer).select(
        (col("id") + (s - 1).toLong * rowsPer).as("offset"), lit(0).as("op"),
        lit(t0ts).as("system_time"),
        (lit(t0ts) + expr(s"make_interval(0,0,0,0,0,0,$s)"))
          .cast("timestamp").as("event_time"),
        shipKey.cast("long").as("order_id"),
        (pmod(col("id") * 17 + s, lit(50)) + 1).cast("long").as("num_shipped"))
        .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$base/slices/h$s")
      if (tree) {
        // carriers reference the order ids of TWO runs back: those orders
        // were shipped LAST run, so the 3-tuple completes only against
        // old A⋈B state — every run exercises the multi-hop seed path
        val carBase = (s - 3).toLong * rowsPer
        val carKey =
          if (hot > 0)
            when(pmod(col("id") * 7 + s, lit(1000)) < lit((hot * 1000).toInt),
              lit(0L)).otherwise(col("id") + carBase)
          else col("id") + carBase
        spark.range(rowsPer).select(
          (col("id") + (s - 1).toLong * rowsPer).as("offset"), lit(0).as("op"),
          lit(t0ts).as("system_time"),
          (lit(t0ts) + expr(s"make_interval(0,0,0,0,0,0,$s)"))
            .cast("timestamp").as("event_time"),
          carKey.cast("long").as("ship_key"),
          concat(lit("carrier-"), pmod(col("id") + s, lit(7))).as("carrier"))
          .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$base/slices/c$s")
      }
    }
    def fileOf(kind: String, s: Int): String = {
      val d = new java.io.File(s"$base/slices/$kind$s")
      d.listFiles.filter(_.getName.endsWith(".parquet")).head.getPath
    }
    val q =
      if (tree)
        """SELECT o.event_time AS event_time, o.order_id AS order_id,
          |  o.quantity AS quantity, s.num_shipped AS num_shipped,
          |  c.carrier AS carrier
          |FROM orders o
          |JOIN shipments s ON o.order_id = s.order_id
          |JOIN carriers c ON s.order_id = c.ship_key""".stripMargin
      else
        """SELECT o.event_time AS event_time, o.order_id AS order_id,
          |  o.quantity AS quantity, s.num_shipped AS num_shipped
          |FROM orders o JOIN shipments s ON o.order_id = s.order_id""".stripMargin
    def drive(tag: String, engine: String): (Double, Double, Double) = {
      var firstHalf = 0.0
      val t0 = System.nanoTime()
      var prev: Option[String] = None
      (1 to nSlices).foreach { s =>
        def input(alias: String, kind: String) = TransformRequestInput(
          datasetId = s"did:$alias", datasetAlias = alias, queryAlias = alias,
          vocab = DatasetVocabulary(),
          offsetInterval = Some(OffsetInterval(
            (s - 1).toLong * rowsPer, s.toLong * rowsPer - 1)),
          dataPaths = Vector(fileOf(kind, s)), schemaFile = fileOf(kind, s),
          explicitWatermarks = Vector(RequestWatermark(
            Instant.parse("2000-01-01T00:00:00Z").plusSeconds(s),
            Instant.parse("2000-01-01T00:00:00Z").plusSeconds(s))))
        val req = TransformRequest(
          "did:out", "out", Instant.parse(f"2000-01-02T${s % 24}%02d:00:00Z"),
          DatasetVocabulary(),
          Transform(engine = engine, queries = Vector(SqlQueryStep(None, q))),
          (Vector(input("orders", "o"), input("shipments", "h")) ++
            (if (tree) Vector(input("carriers", "c")) else Vector.empty)),
          nextOffset = 0, prevCheckpointPath = prev,
          newCheckpointPath = s"$base/$tag/cp$s",
          newDataPath = s"$base/$tag/out$s.parquet")
        new TransformEngine(spark).executeTransform(req) match {
          case _: TransformResponse.Success => ()
          case other                        => sys.error(s"$tag run $s failed: $other")
        }
        prev = Some(s"$base/$tag/cp$s")
        if (s == nSlices / 2) firstHalf = (System.nanoTime() - t0) / 1e9
      }
      val total = (System.nanoTime() - t0) / 1e9
      (total, firstHalf, total - firstHalf)
    }
    val (tB, b1, b2) = drive("batch", "spark")
    val (tS, s1, s2) = drive("stream", "spark-streaming")
    val same = (1 to nSlices).forall { n =>
      java.util.Arrays.equals(
        java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(s"$base/batch/out$n.parquet")),
        java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(s"$base/stream/out$n.parquet")))
    }
    val metric = if (tree) "engine_streamjoin3" else "engine_streamjoin"
    val hotField = if (hot > 0) s""","hot":$hot""" else ""
    println(f"""{"metric":"$metric%s","slices":$nSlices,"rowsPerSlice":$rowsPer$hotField%s,"stream_sec":$tS%.1f,"stream_halves":[$s1%.1f,$s2%.1f],"batch_sec":$tB%.1f,"batch_halves":[$b1%.1f,$b2%.1f],"stream_over_batch":${tS / tB}%.2f,"byte_identical":$same}""")
    spark.stop()
  }

  /** Reused JOIN-bearing step (round-8 envelope widening): the pre-step
    * itself joins orders ⋈ shipments and is consumed at BOTH sites of the
    * output self-join — the classifier's per-site join balance admits it
    * and the executor telescopes over four leaf positions
    * (orders, shipments)×2. order_id is globally unique and shipments is
    * 1:1 with orders, so every join is 1:1 and output size tracks input
    * size. The CTE-forced twin recomputes the full three-join tree and
    * multiset-diffs the whole snapshot every run.
    */
  private def runReuseJoinChain(args: Array[String]): Unit = {
    val nSlices = args.lift(0).map(_.toInt).getOrElse(30)
    val rowsPer = args.lift(1).map(_.toInt).getOrElse(5000)
    val spark = benchSession()
    val base = java.nio.file.Files.createTempDirectory("graft-reusejoin-bench").toString
    val t0ts = java.sql.Timestamp.valueOf("2000-01-01 00:00:00")
    (1 to nSlices).foreach { s =>
      val off0 = (s - 1).toLong * rowsPer
      spark.range(rowsPer).select(
        (col("id") + off0).as("offset"), lit(0).as("op"),
        lit(t0ts).as("system_time"),
        (lit(t0ts) + expr(s"make_interval(0,0,0,0,0,0,$s)"))
          .cast("timestamp").as("event_time"),
        (col("id") + off0).as("order_id"),
        (pmod(col("id") * 31 + s, lit(100)) + 1).cast("long").as("quantity"))
        .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$base/slices/o$s")
      spark.range(rowsPer).select(
        (col("id") + off0).as("offset"), lit(0).as("op"),
        lit(t0ts).as("system_time"),
        (lit(t0ts) + expr(s"make_interval(0,0,0,0,0,0,$s)"))
          .cast("timestamp").as("event_time"),
        (col("id") + off0).as("order_id"),
        (pmod(col("id") * 17 + s, lit(50)) + 1).cast("long").as("num_shipped"))
        .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$base/slices/h$s")
    }
    def fileOf(kind: String, s: Int): String = {
      val d = new java.io.File(s"$base/slices/$kind$s")
      d.listFiles.filter(_.getName.endsWith(".parquet")).head.getPath
    }
    def drive(tag: String, qs: Vector[SqlQueryStep]): (Double, Double, Double) = {
      var firstHalf = 0.0
      val t0 = System.nanoTime()
      var prev: Option[String] = None
      (1 to nSlices).foreach { s =>
        def input(alias: String, kind: String) = TransformRequestInput(
          datasetId = s"did:$alias", datasetAlias = alias, queryAlias = alias,
          vocab = DatasetVocabulary(),
          offsetInterval = Some(OffsetInterval(
            (s - 1).toLong * rowsPer, s.toLong * rowsPer - 1)),
          dataPaths = Vector(fileOf(kind, s)), schemaFile = fileOf(kind, s),
          explicitWatermarks = Vector(RequestWatermark(
            Instant.parse("2000-01-01T00:00:00Z").plusSeconds(s),
            Instant.parse("2000-01-01T00:00:00Z").plusSeconds(s))))
        val req = TransformRequest(
          "did:out", "out", Instant.parse(f"2000-01-02T${s % 24}%02d:00:00Z"),
          DatasetVocabulary(),
          Transform(queries = qs),
          Vector(input("orders", "o"), input("shipments", "h")),
          nextOffset = 0, prevCheckpointPath = prev,
          newCheckpointPath = s"$base/$tag/cp$s",
          newDataPath = s"$base/$tag/out$s.parquet")
        new TransformEngine(spark).executeTransform(req) match {
          case _: TransformResponse.Success => ()
          case other                        => sys.error(s"$tag run $s failed: $other")
        }
        prev = Some(s"$base/$tag/cp$s")
        if (s == nSlices / 2) firstHalf = (System.nanoTime() - t0) / 1e9
      }
      val total = (System.nanoTime() - t0) / 1e9
      (total, firstHalf, total - firstHalf)
    }
    val qPre =
      """SELECT o.event_time AS event_time, o.order_id AS order_id,
        |  o.quantity AS quantity, s.num_shipped AS num_shipped
        |FROM orders o JOIN shipments s ON o.order_id = s.order_id""".stripMargin
    val qJoin =
      """SELECT x.event_time AS event_time, x.order_id AS order_id,
        |  x.quantity AS q1, y.num_shipped AS ship2
        |FROM enriched x JOIN enriched y ON x.order_id = y.order_id""".stripMargin
    val qSlow =
      s"""WITH enriched AS (${qPre.replace("\n", " ")})
         |${qJoin.replace("\n", " ")}""".stripMargin
    val (tR, r1, r2) = drive("recompute", Vector(SqlQueryStep(None, qSlow)))
    val (tD, d1, d2) = drive("delta",
      Vector(SqlQueryStep(Some("enriched"), qPre), SqlQueryStep(None, qJoin)))
    println(f"""{"metric":"engine_reusejoin","slices":$nSlices,"rowsPerSlice":$rowsPer,"delta_sec":$tD%.1f,"delta_halves":[$d1%.1f,$d2%.1f],"recompute_sec":$tR%.1f,"recompute_halves":[$r1%.1f,$r2%.1f],"speedup":${tR / tD}%.2f}""")
    spark.stop()
  }

  /** Two-join chain (orders ⋈ shipments ⋈ tickers, the reference's
    * enrich-then-join shape) over N append slices: the n-ary join-tree
    * delta path re-joins only each slice against buffered state, so
    * per-run cost stays flat; the CTE-forced recompute re-joins full
    * history and multiset-diffs the whole snapshot every run. Tickers is a
    * slice-1-only static dimension — later runs advance only its
    * watermark, exercising the delta terms' old/full frame split.
    */
  private def runJoinChain(args: Array[String]): Unit = {
    val nSlices = args.lift(0).map(_.toInt).getOrElse(30)
    val rowsPer = args.lift(1).map(_.toInt).getOrElse(5000)
    val hot = args.lift(2).map(_.toDouble).getOrElse(0.0)
    val spark = benchSession()
    val base = java.nio.file.Files.createTempDirectory("graft-join-bench").toString
    val t0ts = java.sql.Timestamp.valueOf("2000-01-01 00:00:00")

    (1 to nSlices).foreach { s =>
      val off0 = (s - 1).toLong * rowsPer
      // orders: globally-unique order_id = offset
      spark.range(rowsPer).select(
        (col("id") + off0).as("offset"), lit(0).as("op"),
        lit(t0ts).as("system_time"),
        (lit(t0ts) + expr(s"make_interval(0,0,0,0,0,0,$s)"))
          .cast("timestamp").as("event_time"),
        (col("id") + off0).as("order_id"),
        (pmod(col("id") * 31 + s, lit(100)) + 1).cast("long").as("quantity"))
        .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$base/slices/o$s")
      // shipments: each references one (possibly much older) order; under
      // `hot` skew a fixed fraction all reference ORDER 1 — the oldest key
      // — so every run's delta key band spans the full history range (the
      // zipfian narrowing adversary, round-9 VERDICT #2)
      val shipKey =
        if (hot > 0)
          when(pmod(col("id") * 7 + s, lit(1000)) < lit((hot * 1000).toInt),
            lit(1L))
            .otherwise(col("id") + off0)
        else pmod(col("id") * 2654435761L + s, lit(off0 + rowsPer))
      spark.range(rowsPer).select(
        (col("id") + off0).as("offset"), lit(0).as("op"),
        lit(t0ts).as("system_time"),
        (lit(t0ts) + expr(s"make_interval(0,0,0,0,0,0,$s)"))
          .cast("timestamp").as("event_time"),
        shipKey.cast("long").as("order_id"),
        (pmod(col("id") * 17 + s, lit(50)) + 1).cast("long").as("num_shipped"))
        .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$base/slices/s$s")
    }
    // tickers: static 50-row dimension, written once
    spark.range(50).select(
      col("id").as("offset"), lit(0).as("op"),
      lit(t0ts).as("system_time"), lit(t0ts).as("event_time"),
      concat(lit("k"), col("id")).as("symbol"),
      (col("id") + 1).cast("long").as("price"))
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$base/slices/tk")
    def fileOf(d: String): String = {
      val dir = new java.io.File(s"$base/slices/$d")
      dir.listFiles.filter(_.getName.endsWith(".parquet")).head.getPath
    }

    val chainSteps = Vector(
      SqlQueryStep(Some("enriched"),
        """SELECT o.event_time AS event_time, o.order_id AS order_id,
          |  o.quantity AS quantity, s.num_shipped AS num_shipped
          |FROM orders o JOIN shipments s ON o.order_id = s.order_id""".stripMargin),
      SqlQueryStep(None,
        """SELECT e.event_time AS event_time, e.order_id AS order_id,
          |  e.quantity AS quantity, tk.symbol AS symbol
          |FROM enriched e JOIN tickers tk ON tk.price = e.num_shipped""".stripMargin))
    val cteSteps = Vector(SqlQueryStep(None,
      """WITH j AS (
        |  SELECT o.event_time AS event_time, o.order_id AS order_id,
        |    o.quantity AS quantity, tk.symbol AS symbol
        |  FROM orders o JOIN shipments s ON o.order_id = s.order_id
        |  JOIN tickers tk ON tk.price = s.num_shipped)
        |SELECT event_time, order_id, quantity, symbol FROM j""".stripMargin))

    def drive(tag: String, steps: Vector[SqlQueryStep]): Double = {
      val t0 = System.nanoTime()
      var prev: Option[String] = None
      (1 to nSlices).foreach { s =>
        val off0 = (s - 1).toLong * rowsPer
        def in(alias: String, path: Option[String], schema: String,
            interval: Option[OffsetInterval]): TransformRequestInput =
          TransformRequestInput(
            datasetId = s"did:$alias", datasetAlias = alias, queryAlias = alias,
            vocab = DatasetVocabulary(),
            offsetInterval = interval,
            dataPaths = path.toVector, schemaFile = schema,
            explicitWatermarks = Vector(RequestWatermark(
              Instant.parse("2000-01-01T00:00:00Z").plusSeconds(s),
              Instant.parse("2000-01-01T00:00:00Z").plusSeconds(s))))
        val req = TransformRequest(
          "did:out", "out", Instant.parse(f"2000-01-02T${s % 24}%02d:00:00Z"),
          DatasetVocabulary(),
          Transform(queries = steps),
          Vector(
            in("orders", Some(fileOf(s"o$s")), fileOf("o1"),
              Some(OffsetInterval(off0, off0 + rowsPer - 1))),
            in("shipments", Some(fileOf(s"s$s")), fileOf("s1"),
              Some(OffsetInterval(off0, off0 + rowsPer - 1))),
            in("tickers",
              if (s == 1) Some(fileOf("tk")) else None, fileOf("tk"),
              if (s == 1) Some(OffsetInterval(0, 49)) else None)),
          nextOffset = 0, prevCheckpointPath = prev,
          newCheckpointPath = s"$base/$tag/cp$s",
          newDataPath = s"$base/$tag/out$s.parquet")
        new TransformEngine(spark).executeTransform(req) match {
          case _: TransformResponse.Success => ()
          case other                        => sys.error(s"$tag run $s failed: $other")
        }
        prev = Some(s"$base/$tag/cp$s")
      }
      (System.nanoTime() - t0) / 1e9
    }

    val tRecompute = drive("recompute", cteSteps)
    val tDelta = drive("delta", chainSteps)
    val hotField = if (hot > 0) s""","hot":$hot""" else ""
    println(f"""{"metric":"engine_join_chain","slices":$nSlices,"rowsPerSlice":$rowsPer$hotField%s,"delta_sec":$tDelta%.1f,"recompute_sec":$tRecompute%.1f,"speedup":${tRecompute / tDelta}%.2f}""")
    spark.stop()
  }

  /** Three-position join chain A⋈B⋈C where C connects ONLY through B
    * (`o.order_id = s.order_id AND s.invoice_id = i.invoice_id` — no
    * direct orders–invoices edge), all keys monotone with history. This
    * is the transitive key-range narrowing's target shape: in the
    * Δ_orders term, shipments is narrowed one-hop by Δ's order_id band,
    * and invoices is narrowed by the SECOND hop — the invoice_id band of
    * the already-narrowed shipments scan; symmetrically Δ_invoices
    * narrows orders through shipments. One-hop narrowing leaves the
    * far position's full buffer scanned in two of the three terms per
    * run (an O(state) term), so the delta halves grow with history;
    * with the transitive hop every scan in every term is banded and the
    * halves stay flat. The CTE-forced twin recomputes the full two-join
    * tree and multiset-diffs the snapshot every run.
    */
  private def runJoin3Chain(args: Array[String], leftMix: Boolean = false): Unit = {
    val nSlices = args.lift(0).map(_.toInt).getOrElse(30)
    val rowsPer = args.lift(1).map(_.toInt).getOrElse(20000)
    val hot = args.lift(2).map(_.toDouble).getOrElse(0.0)
    // hop-side adversary (round-11): a fraction of SHIPMENTS reference the
    // FIRST invoice — the transitive hop Δ_orders → shipments → invoices
    // then derives its invoices band from narrowed-shipment rows whose
    // invoice keys mix one ancient id with fresh monotone ids, collapsing
    // the hop's single min/max band to the full history range
    val hotHop = args.lift(3).map(_.toDouble).getOrElse(0.0)
    val spark = benchSession()
    val base = java.nio.file.Files.createTempDirectory("graft-join3-bench").toString
    val t0ts = java.sql.Timestamp.valueOf("2000-01-01 00:00:00")
    (1 to nSlices).foreach { s =>
      val off0 = (s - 1).toLong * rowsPer
      def evt = (lit(t0ts) + expr(s"make_interval(0,0,0,0,0,0,$s)"))
        .cast("timestamp")
      // orders: globally-unique monotone order_id = offset
      spark.range(rowsPer).select(
        (col("id") + off0).as("offset"), lit(0).as("op"),
        lit(t0ts).as("system_time"), evt.as("event_time"),
        (col("id") + off0).as("order_id"),
        (pmod(col("id") * 31 + s, lit(100)) + 1).cast("long").as("quantity"))
        .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$base/slices/o$s")
      // shipments: the bridge — order_id AND invoice_id, both monotone;
      // under `hot` skew a fixed fraction reference ORDER 1, collapsing
      // the Δ_shipments→orders narrowing band to the full history range
      val bridgeKey =
        if (hot > 0)
          when(pmod(col("id") * 7 + s, lit(1000)) < lit((hot * 1000).toInt),
            lit(1L)).otherwise(col("id") + off0)
        else col("id") + off0
      val invoiceKey =
        if (hotHop > 0)
          when(pmod(col("id") * 13 + s, lit(1000)) < lit((hotHop * 1000).toInt),
            lit(1000000000L)).otherwise(col("id") + off0 + 1000000000L)
        else col("id") + off0 + 1000000000L
      spark.range(rowsPer).select(
        (col("id") + off0).as("offset"), lit(0).as("op"),
        lit(t0ts).as("system_time"), evt.as("event_time"),
        bridgeKey.cast("long").as("order_id"),
        invoiceKey.cast("long").as("invoice_id"))
        .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$base/slices/h$s")
      // invoices: monotone invoice_id matching the bridge 1:1
      spark.range(rowsPer).select(
        (col("id") + off0).as("offset"), lit(0).as("op"),
        lit(t0ts).as("system_time"), evt.as("event_time"),
        (col("id") + off0 + 1000000000L).as("invoice_id"),
        (pmod(col("id") * 17 + s, lit(500)) + 1).cast("long").as("amount"))
        .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$base/slices/i$s")
    }
    def fileOf(kind: String, s: Int): String = {
      val d = new java.io.File(s"$base/slices/$kind$s")
      d.listFiles.filter(_.getName.endsWith(".parquet")).head.getPath
    }
    def drive(tag: String, qs: Vector[SqlQueryStep]): (Double, Double, Double) = {
      var firstHalf = 0.0
      val t0 = System.nanoTime()
      var prev: Option[String] = None
      (1 to nSlices).foreach { s =>
        def input(alias: String, kind: String) = TransformRequestInput(
          datasetId = s"did:$alias", datasetAlias = alias, queryAlias = alias,
          vocab = DatasetVocabulary(),
          offsetInterval = Some(OffsetInterval(
            (s - 1).toLong * rowsPer, s.toLong * rowsPer - 1)),
          dataPaths = Vector(fileOf(kind, s)), schemaFile = fileOf(kind, s),
          explicitWatermarks = Vector(RequestWatermark(
            Instant.parse("2000-01-01T00:00:00Z").plusSeconds(s),
            Instant.parse("2000-01-01T00:00:00Z").plusSeconds(s))))
        val req = TransformRequest(
          "did:out", "out", Instant.parse(f"2000-01-02T${s % 24}%02d:00:00Z"),
          DatasetVocabulary(),
          Transform(queries = qs),
          Vector(input("orders", "o"), input("shipments", "h"),
            input("invoices", "i")),
          nextOffset = 0, prevCheckpointPath = prev,
          newCheckpointPath = s"$base/$tag/cp$s",
          newDataPath = s"$base/$tag/out$s.parquet")
        new TransformEngine(spark).executeTransform(req) match {
          case _: TransformResponse.Success => ()
          case other                        => sys.error(s"$tag run $s failed: $other")
        }
        prev = Some(s"$base/$tag/cp$s")
        if (s == nSlices / 2) firstHalf = (System.nanoTime() - t0) / 1e9
      }
      val total = (System.nanoTime() - t0) / 1e9
      (total, firstHalf, total - firstHalf)
    }
    // `leftMix = true` (leftjoinmix): the round-9 mixed tree — the inner
    // join (orders ⋈ shipments) in a pre-step, LEFT-joined to invoices.
    // ΔL comes from the telescoping decomposition over BOTH left
    // relations; matched state is row-keyed on derived L rows.
    val (qFastSteps, qSlowSteps) =
      if (leftMix) {
        val preSql =
          """SELECT o.event_time AS event_time, o.order_id AS order_id,
            |  o.quantity AS quantity, s.invoice_id AS invoice_id
            |FROM orders o JOIN shipments s ON o.order_id = s.order_id""".stripMargin
        val outSql =
          """SELECT j.event_time AS event_time, j.order_id AS order_id,
            |  j.quantity AS quantity, i.amount AS amount
            |FROM j LEFT JOIN invoices i ON j.invoice_id = i.invoice_id""".stripMargin
        (Vector(SqlQueryStep(Some("j"), preSql), SqlQueryStep(None, outSql)),
          Vector(SqlQueryStep(Some("j"), preSql), SqlQueryStep(None,
            s"""WITH w AS (${outSql.replace("\n", " ")})
               |SELECT event_time, order_id, quantity, amount FROM w""".stripMargin)))
      } else {
        val qFast =
          """SELECT o.event_time AS event_time, o.order_id AS order_id,
            |  o.quantity AS quantity, i.amount AS amount
            |FROM orders o JOIN shipments s ON o.order_id = s.order_id
            |JOIN invoices i ON s.invoice_id = i.invoice_id""".stripMargin
        (Vector(SqlQueryStep(None, qFast)),
          Vector(SqlQueryStep(None,
            s"""WITH j AS (${qFast.replace("\n", " ")})
               |SELECT event_time, order_id, quantity, amount FROM j""".stripMargin)))
      }
    val (tR, r1, r2) = drive("recompute", qSlowSteps)
    val (tD, d1, d2) = drive("delta", qFastSteps)
    val metric = if (leftMix) "engine_leftjoinmix" else "engine_join3"
    val hotField = (if (hot > 0) s""","hot":$hot""" else "") +
      (if (hotHop > 0) s""","hotHop":$hotHop""" else "")
    println(f"""{"metric":"$metric%s","slices":$nSlices,"rowsPerSlice":$rowsPer$hotField%s,"delta_sec":$tD%.1f,"delta_halves":[$d1%.1f,$d2%.1f],"recompute_sec":$tR%.1f,"recompute_halves":[$r1%.1f,$r2%.1f],"speedup":${tR / tD}%.2f}""")
    spark.stop()
  }

  /** Nested aggregation (GROUP BY over GROUP BY) over N append slices
    * where each slice touches only ~10% of the key space: the narrowed
    * path recomputes only the touched partitions' buffered history, so
    * per-run cost follows the touched slice, while the withheld variant
    * (inner `symbol AS sym` rename — same raw values, re-defined name)
    * recomputes and multiset-diffs full history every run.
    */
  /** `lshauto [sfDir]`: the corpus-scaled RHP-LSH knob's scale point —
    * time near-dup pairs on the embeddings table with the q56-pinned fixed
    * geometry (nBits=16, bandBits=4: a 64-value band space whose candidate
    * volume is Θ(n²/64)) against the auto geometry (expected bucket
    * occupancy held constant: candidates Θ(n)). Min of two passes each. */
  private def runLshAuto(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = benchSession()
    val emb = graft.core.Tables.t(spark, dir, "embeddings")
    val n = emb.count() // also warms the scan
    def minOf2(f: => Long): (Double, Long) = {
      val samples = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val rows = f
        ((System.nanoTime() - t0) / 1e9, rows)
      }
      (samples.map(_._1).min, samples.head._2)
    }
    val (tF, nF) = minOf2(graft.operators.Similarity
      .nearDupPairsLSH(emb, "vec_id", "embedding", 0.45, 64, 16, 4).count())
    val (tA, nA) = minOf2(graft.operators.Similarity
      .nearDupPairsLSHAuto(emb, "vec_id", "embedding", 0.45, 64).count())
    val (nBits, bandBits) = graft.operators.Similarity.autoLshConfig(n)
    println(f"""{"metric":"lsh_auto","dir":"$dir%s","rows":$n,"fixed_sec":$tF%.2f,"fixed_pairs":$nF,"auto_sec":$tA%.2f,"auto_pairs":$nA,"auto_nBits":$nBits,"auto_bandBits":$bandBits}""")
    spark.stop()
  }

  /** `simhashauto [sfDir]`: same scale point for the SimHash knob — the
    * 4-table banded scheme (2^15-key space) against the auto block count.
    * Both are EXACT; pair counts must match. */
  private def runSimhashAuto(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = benchSession()
    val docs = graft.core.Tables.t(spark, dir, "documents")
    val n = docs.count()
    def minOf2(f: => Long): (Double, Long) = {
      val samples = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val rows = f
        ((System.nanoTime() - t0) / 1e9, rows)
      }
      (samples.map(_._1).min, samples.head._2)
    }
    val (tB, nB) = minOf2(graft.operators.Dedup
      .simhashNearDupDf(docs, "doc_id", "text").count())
    val blocks = graft.operators.Dedup.autoSimhashBlocks(n)
    // where auto still picks the 4-block banded scheme, time the next-up
    // block count instead so the crossover stays visible
    val blocksUp = if (blocks > 4) blocks
      else graft.operators.Dedup.validSimhashBlocks(3).find(_ > 4).getOrElse(4)
    val (tA, nA) = minOf2(graft.operators.Dedup
      .simhashNearDupBlocked(docs, "doc_id", "text", 3, blocksUp).count())
    require(nA == nB, s"blocked scheme diverged: $nA vs $nB")
    println(f"""{"metric":"simhash_auto","dir":"$dir%s","rows":$n,"banded_sec":$tB%.2f,"pairs":$nB,"auto_blocks":$blocks,"blocked_${blocksUp}%d_sec":$tA%.2f}""")
    spark.stop()
  }

  private def runNestedAgg(args: Array[String]): Unit = {
    val nSlices = args.lift(0).map(_.toInt).getOrElse(30)
    val rowsPer = args.lift(1).map(_.toInt).getOrElse(20000)
    // touched-partition adversary (round-11): a fraction of EVERY slice's
    // rows land on one hot symbol, so the narrowed path's touched set
    // always includes the hot partition and must recompute its whole
    // (growing) history each run — the honest worst case for semi-join
    // touched-partition narrowing, since that state is genuinely touched
    val hot = args.lift(2).map(_.toDouble).getOrElse(0.0)
    val spark = benchSession()
    val base = java.nio.file.Files.createTempDirectory("graft-nested-bench").toString

    (1 to nSlices).foreach { s =>
      val off0 = (s - 1).toLong * rowsPer
      // key space: 1M symbols in ten 100k-wide bands; slice s only touches
      // band s%10 — untouched bands' output partitions must be neither
      // recomputed nor re-diffed (the snapshot is output-cardinality-sized,
      // so the diff side is where O(history) recompute hurts most)
      val coldSym = concat(lit("k"),
        pmod(col("id") * 2654435761L + s, lit(100000)) + (s % 10) * 100000)
      val sym =
        if (hot > 0)
          when(pmod(col("id") * 13 + s, lit(1000)) < lit((hot * 1000).toInt),
            lit("khot")).otherwise(coldSym)
        else coldSym
      spark.range(rowsPer).select(
        (col("id") + off0).as("offset"),
        lit(0).as("op"),
        lit(java.sql.Timestamp.valueOf("2000-01-01 00:00:00")).as("system_time"),
        (lit(java.sql.Timestamp.valueOf("2000-01-01 00:00:00"))
          + expr(s"make_interval(0,0,0,0,0,0,${s % 7})")).cast("timestamp").as("event_time"),
        sym.as("symbol"),
        (pmod(col("id") * 31 + s, lit(1000)) + 1).cast("int").as("price"))
        .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$base/slices/s$s")
    }
    def fileOf(s: Int): String = {
      val d = new java.io.File(s"$base/slices/s$s")
      d.listFiles.filter(_.getName.endsWith(".parquet")).head.getPath
    }

    def drive(tag: String, q: String): Double = {
      val t0 = System.nanoTime()
      var prev: Option[String] = None
      (1 to nSlices).foreach { s =>
        val req = TransformRequest(
          "did:out", "out", Instant.parse(f"2000-01-02T${s % 24}%02d:00:00Z"),
          DatasetVocabulary(),
          Transform(queries = Vector(SqlQueryStep(None, q))),
          Vector(TransformRequestInput(
            datasetId = "did:t", datasetAlias = "tickers", queryAlias = "tickers",
            vocab = DatasetVocabulary(),
            offsetInterval = Some(OffsetInterval(
              (s - 1).toLong * rowsPer, s.toLong * rowsPer - 1)),
            dataPaths = Vector(fileOf(s)), schemaFile = fileOf(s),
            explicitWatermarks = Vector(RequestWatermark(
              Instant.parse("2000-01-01T00:00:00Z").plusSeconds(s),
              Instant.parse("2000-01-01T00:00:00Z").plusSeconds(s))))),
          nextOffset = 0, prevCheckpointPath = prev,
          newCheckpointPath = s"$base/$tag/cp$s",
          newDataPath = s"$base/$tag/out$s.parquet")
        new TransformEngine(spark).executeTransform(req) match {
          case _: TransformResponse.Success => ()
          case other                        => sys.error(s"$tag run $s failed: $other")
        }
        prev = Some(s"$base/$tag/cp$s")
      }
      (System.nanoTime() - t0) / 1e9
    }

    val qNarrow = """SELECT symbol, max(event_time) AS event_time,
                    |  max(s) AS mx, count(*) AS n_days
                    |FROM (SELECT symbol, event_time, sum(price) AS s
                    |      FROM tickers GROUP BY symbol, event_time)
                    |GROUP BY symbol""".stripMargin
    val qWide = """SELECT sym AS symbol, max(event_time) AS event_time,
                  |  max(s) AS mx, count(*) AS n_days
                  |FROM (SELECT symbol AS sym, event_time, sum(price) AS s
                  |      FROM tickers GROUP BY symbol, event_time)
                  |GROUP BY sym""".stripMargin

    val tWide = drive("wide", qWide)
    val tNarrow = drive("narrow", qNarrow)
    val hotField = if (hot > 0) s""","hot":$hot""" else ""
    println(f"""{"metric":"engine_nested_agg","slices":$nSlices,"rowsPerSlice":$rowsPer$hotField%s,"narrow_sec":$tNarrow%.1f,"wide_sec":$tWide%.1f,"speedup":${tWide / tNarrow}%.2f}""")
    spark.stop()
  }

  /** Retractive aggregation cost: each slice appends `rowsPer` rows and
    * retracts 5% of the previous slice's, so the live multiset GROWS while
    * every run stays retractive. Driven through an INVERTIBLE aggregate
    * (sum/count only — the signed merge path subtracts retractions and
    * never flips) versus a value-identical recompute-forced twin
    * (stddev_pop*0). The netted buffer compaction bounds both sides'
    * buffer at the live set, but the recompute side still re-nets and
    * re-aggregates that growing live set every run — every symbol is
    * touched every run, so touched-group narrowing cannot save it — while
    * the signed merge side processes only the slice plus group-count
    * state. Reports each side's first and second half so the growth shape
    * is visible, not just the total.
    */
  private def runRetractAgg(args: Array[String]): Unit = {
    val nSlices = args.lift(0).map(_.toInt).getOrElse(30)
    val rowsPer = args.lift(1).map(_.toInt).getOrElse(20000)
    // Third arg widens the key space: with nSymbols ≫ rowsPer the state is
    // group-count-sized and the invertible side's O(slice) tier-append
    // state write separates from any full-state rewrite.
    val nSymbols = args.lift(2).map(_.toInt).getOrElse(5000)
    val spark = benchSession()
    val base = java.nio.file.Files.createTempDirectory("graft-retractagg-bench").toString
    val t0ts = java.sql.Timestamp.valueOf("2000-01-01 00:00:00")

    // row formula is a pure function of (logical slice, id) so slice s can
    // regenerate a PREFIX of slice s-1's rows exactly as retracts
    def rowsOf(s: Int, op: Int, off0: Long, n: Int) =
      spark.range(n).select(
        (col("id") + off0).as("offset"), lit(op).as("op"),
        lit(t0ts).as("system_time"),
        (lit(t0ts) + expr(s"make_interval(0,0,0,0,0,0,$s)"))
          .cast("timestamp").as("event_time"),
        concat(lit("k"), pmod(col("id") * 2654435761L + s, lit(nSymbols))).as("symbol"),
        (pmod(col("id") * 31 + s, lit(1000)) + 1).cast("int").as("price"))
    val nRet = rowsPer / 20
    var off = 0L
    val sliceLens = (1 to nSlices).map { s =>
      val appends = rowsOf(s, 0, off, rowsPer)
      val slice =
        if (s == 1) appends
        else appends.unionByName(rowsOf(s - 1, 1, off + rowsPer, nRet))
      slice.coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$base/slices/s$s")
      val n = if (s == 1) rowsPer.toLong else rowsPer.toLong + nRet
      off += n
      n
    }
    def fileOf(s: Int): String = {
      val d = new java.io.File(s"$base/slices/s$s")
      d.listFiles.filter(_.getName.endsWith(".parquet")).head.getPath
    }

    val qMerge = """SELECT TIMESTAMP '2000-01-01 00:00:00' as event_time,
                   |  symbol, count(*) as n, sum(price) as total
                   |FROM tickers GROUP BY symbol""".stripMargin
    val qRecompute = qMerge.replace("sum(price) as total",
      "CAST(sum(price) + stddev_pop(price) * 0 AS BIGINT) as total")

    def drive(tag: String, q: String): Seq[Double] = {
      var prev: Option[String] = None
      var off0 = 0L
      (1 to nSlices).map { s =>
        val len = sliceLens(s - 1)
        val t0 = System.nanoTime()
        val req = TransformRequest(
          "did:out", "out", Instant.parse(f"2000-01-02T${s % 24}%02d:00:00Z"),
          DatasetVocabulary(),
          Transform(queries = Vector(SqlQueryStep(None, q))),
          Vector(TransformRequestInput(
            datasetId = "did:t", datasetAlias = "tickers", queryAlias = "tickers",
            vocab = DatasetVocabulary(),
            offsetInterval = Some(OffsetInterval(off0, off0 + len - 1)),
            dataPaths = Vector(fileOf(s)), schemaFile = fileOf(1),
            explicitWatermarks = Vector(RequestWatermark(
              Instant.parse("2000-01-01T00:00:00Z").plusSeconds(s),
              Instant.parse("2000-01-01T00:00:00Z").plusSeconds(s))))),
          nextOffset = 0, prevCheckpointPath = prev,
          newCheckpointPath = s"$base/$tag/cp$s",
          newDataPath = s"$base/$tag/out$s.parquet")
        new TransformEngine(spark).executeTransform(req) match {
          case _: TransformResponse.Success => ()
          case other => sys.error(s"$tag run $s failed: $other")
        }
        prev = Some(s"$base/$tag/cp$s")
        off0 += len
        (System.nanoTime() - t0) / 1e9
      }
    }

    val rTimes = drive("recompute", qRecompute)
    val mTimes = drive("merge", qMerge)
    def halves(ts: Seq[Double]): (Double, Double) = {
      val (a, b) = ts.splitAt(ts.length / 2); (a.sum, b.sum)
    }
    val (m1, m2) = halves(mTimes); val (r1, r2) = halves(rTimes)
    println(f"""{"metric":"engine_retract_agg","slices":$nSlices,"rowsPerSlice":$rowsPer,"symbols":$nSymbols,"merge_sec":${m1 + m2}%.1f,"merge_h1":$m1%.1f,"merge_h2":$m2%.1f,"recompute_sec":${r1 + r2}%.1f,"recompute_h1":$r1%.1f,"recompute_h2":$r2%.1f,"speedup":${(r1 + r2) / (m1 + m2)}%.2f}""")
    spark.stop()
  }

  /** Retract-heavy state growth: each slice appends `rowsPer` rows and
    * retracts the previous slice's, so the LIVE multiset stays at
    * `rowsPer` while raw history grows by 2×rowsPer per run. The
    * retractive input's buffer tier-compacts to netted signed form
    * ([[graft.operators.Changelog.compactSigned]]) — buffer bytes must
    * plateau near the live set, not track history.
    */
  private def runRetractState(args: Array[String]): Unit = {
    val nSlices = args.lift(0).map(_.toInt).getOrElse(30)
    val rowsPer = args.lift(1).map(_.toInt).getOrElse(20000)
    val spark = benchSession()
    val base = java.nio.file.Files.createTempDirectory("graft-retract-bench").toString
    val t0ts = java.sql.Timestamp.valueOf("2000-01-01 00:00:00")

    // row formula is a pure function of (logical slice, id) so slice s can
    // regenerate slice s-1's rows exactly as retracts
    def rowsOf(s: Int, op: Int, off0: Long) =
      spark.range(rowsPer).select(
        (col("id") + off0).as("offset"), lit(op).as("op"),
        lit(t0ts).as("system_time"),
        (lit(t0ts) + expr(s"make_interval(0,0,0,0,0,0,$s)"))
          .cast("timestamp").as("event_time"),
        concat(lit("k"), pmod(col("id") * 2654435761L + s, lit(5000))).as("symbol"),
        (pmod(col("id") * 31 + s, lit(1000)) + 1).cast("int").as("price"))
    var off = 0L
    val sliceLens = (1 to nSlices).map { s =>
      val appends = rowsOf(s, 0, off)
      val slice =
        if (s == 1) appends
        else appends.unionByName(rowsOf(s - 1, 1, off + rowsPer))
      slice.coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$base/slices/s$s")
      val n = if (s == 1) rowsPer.toLong else 2L * rowsPer
      off += n
      n
    }
    def fileOf(s: Int): String = {
      val d = new java.io.File(s"$base/slices/s$s")
      d.listFiles.filter(_.getName.endsWith(".parquet")).head.getPath
    }
    def dirBytes(p: String): Long = {
      val d = new java.io.File(p)
      if (!d.exists) 0L
      else d.listFiles.filter(_.isFile).map(_.length).sum
    }

    val q = """SELECT max(event_time) as event_time, symbol,
              |  count(*) as n, sum(price) as total
              |FROM tickers GROUP BY symbol""".stripMargin
    var prev: Option[String] = None
    var off0 = 0L
    val bytesPerRun = (1 to nSlices).map { s =>
      val len = sliceLens(s - 1)
      val req = TransformRequest(
        "did:out", "out", Instant.parse(f"2000-01-02T${s % 24}%02d:00:00Z"),
        DatasetVocabulary(),
        Transform(queries = Vector(SqlQueryStep(None, q))),
        Vector(TransformRequestInput(
          datasetId = "did:t", datasetAlias = "tickers", queryAlias = "tickers",
          vocab = DatasetVocabulary(),
          offsetInterval = Some(OffsetInterval(off0, off0 + len - 1)),
          dataPaths = Vector(fileOf(s)), schemaFile = fileOf(1),
          explicitWatermarks = Vector(RequestWatermark(
            Instant.parse("2000-01-01T00:00:00Z").plusSeconds(s),
            Instant.parse("2000-01-01T00:00:00Z").plusSeconds(s))))),
        nextOffset = 0, prevCheckpointPath = prev,
        newCheckpointPath = s"$base/run/cp$s",
        newDataPath = s"$base/run/out$s.parquet")
      new TransformEngine(spark).executeTransform(req) match {
        case _: TransformResponse.Success => ()
        case other                        => sys.error(s"retract run $s failed: $other")
      }
      prev = Some(s"$base/run/cp$s")
      off0 += len
      dirBytes(s"$base/run/cp$s/buffer_tickers")
    }
    val rawRows = sliceLens.sum
    val storedRows = spark.read.parquet(s"${prev.get}/buffer_tickers").count()
    val mid = bytesPerRun(nSlices / 2 - 1); val fin = bytesPerRun.last
    println(f"""{"metric":"engine_retract_state","slices":$nSlices,"rowsPerSlice":$rowsPer,"raw_history_rows":$rawRows,"stored_rows":$storedRows,"buffer_bytes_mid":$mid,"buffer_bytes_final":$fin,"final_vs_mid":${fin.toDouble / mid}%.2f}""")
    spark.stop()
  }
}
