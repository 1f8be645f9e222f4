package graft.engine

import java.time.Instant

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.TransformEngine.LoadedInput
import graft.operators.AsOfJoin
import graft.protocol.{DatasetVocabulary, Op}

/** Executes one incremental micro-batch over (buffered state ∪ new slices).
  *
  * Watermark algebra (SURVEY.md §7.4): with an interval join of upper bound
  * U in the step chain,
  *
  *   reported output watermark = min(input watermarks) − U
  *
  * and a result row is emitted when its WINDOW END (event time + window
  * duration for fixed windows, add_months for calendar windows, the event
  * time itself when no window) lies in (previous reported, new reported] —
  * so closed windows / expired join horizons emit exactly once across runs,
  * late rows into still-open windows are aggregated, and late rows into
  * closed windows are dropped, matching the reference's observable behavior
  * (EngineAggregationTest, EngineJoinStreamToStreamTest golden chains).
  *
  * Stateless (pure map/filter) chains skip buffering and gating entirely:
  * every result row of the new slice is emitted immediately.
  */
final class IncrementalExecutor(
    spark: SparkSession,
    store: StateStore,
    ledger: Ledger,
    inputs: Seq[LoadedInput],
    steps: Seq[(Option[String], SqlRewriter.Rewritten)],
    vocab: DatasetVocabulary
) {

  import IncrementalExecutor._

  final case class ExecResult(
      emitted: DataFrame,
      newWatermark: Option[Instant],
      emitThreshold: Option[Instant],
      emissionOrder: Option[Seq[Column]]
  )

  private val allSql = steps.map(_._2.sql).mkString("\n")
  private val tumble = steps.flatMap(_._2.tumble).headOption
  private val asOf = steps.flatMap(_._2.asOf).headOption
  private val interval = findIntervalJoin(allSql)
  private val isTopN =
    tumble.isEmpty && asOf.isEmpty && interval.isEmpty &&
      rowNumberRe.findFirstIn(allSql).isDefined
  private val stateless =
    tumble.isEmpty && asOf.isEmpty && interval.isEmpty && !isTopN

  private def byAlias(a: String): Option[LoadedInput] =
    inputs.find(_.spec.queryAlias == a)

  def run(): ExecResult = {
    if (stateless) {
      inputs.foreach(i =>
        i.df.drop("__seq").createOrReplaceTempView(i.spec.queryAlias))
      val result = runSteps(steps)
      return ExecResult(result, minWm(inputs), None, None)
    }

    if (asOf.isDefined) return runAsOf()

    // ── Buffered modes: tumbling agg / interval join / Top-N ────────────
    val fulls = inputs.map { i =>
      val buffer = store.read(bufferName(i.spec.queryAlias), i.df.schema)
      val full = buffer.unionByName(i.df)
      applyChangelog(full.drop("__seq"), i.spec.vocab.operationTypeColumn)
        .createOrReplaceTempView(i.spec.queryAlias)
      i -> full
    }

    val resultAll = runSteps(steps)

    if (isTopN) return runTopN(fulls, resultAll)

    // Watermark algebra. The emission cursor persisted in the ledger is the
    // reported watermark; rows are gated on their WINDOW END, which handles
    // fixed-duration and calendar (month/quarter/year) windows uniformly.
    val upperMs = interval.map(_.upperMillis).getOrElse(0L)
    val reported = minWm(inputs).map(_.minusMillis(upperMs))
    val prevGate = ledger.emitThreshold

    def truncUnit(months: Int): String = months match {
      case 3  => "QUARTER"
      case 12 => "YEAR"
      case _  => "MONTH"
    }
    // window end of an emitted row (event_time = window start)
    def windowEnd(c: Column): Column = tumble match {
      case Some(t) if t.calendarMonths > 0 =>
        add_months(c, t.calendarMonths).cast("timestamp")
      case Some(t) =>
        val durUs = durationMillis(t.duration) * 1000
        timestamp_micros(expr(s"(unix_micros(${vocab.eventTimeColumn}) div $durUs) * $durUs")
          .plus(durUs))
      case None => c
    }
    // window end of a RAW input row (arbitrary event time within a window)
    def rowWindowEnd(c: Column, name: String): Column = tumble match {
      case Some(t) if t.calendarMonths > 0 =>
        add_months(date_trunc(truncUnit(t.calendarMonths), c), t.calendarMonths)
          .cast("timestamp")
      case Some(t) =>
        val durUs = durationMillis(t.duration) * 1000
        timestamp_micros(expr(s"(unix_micros($name) div $durUs) * $durUs").plus(durUs))
      case None => c
    }

    val eventCol = col(vocab.eventTimeColumn)
    def tsLit(i: Instant): Column = lit(SqlRewriter.tsLiteral(i)).cast("timestamp")
    val emitted = reported match {
      case None => resultAll.limit(0)
      case Some(r) =>
        val upperGate = windowEnd(eventCol) <= tsLit(r)
        prevGate match {
          case Some(p) => resultAll.where(upperGate && windowEnd(eventCol) > tsLit(p))
          case None    => resultAll.where(upperGate)
        }
    }

    // Prune + persist buffers: keep rows whose window is still open.
    fulls.foreach { case (i, full) =>
      val evtName = i.spec.vocab.eventTimeColumn
      val keep = reported match {
        case Some(r) => full.where(rowWindowEnd(col(evtName), evtName) > tsLit(r))
        case None    => full
      }
      store.write(bufferName(i.spec.queryAlias), keep)
    }

    ExecResult(emitted, reported, reported, None)
  }

  // ── AS-OF / temporal join (SURVEY.md §2.2 joins) ─────────────────────
  private def runAsOf(): ExecResult = {
    val spec = asOf.get
    val probe = byAlias(spec.probeTable).getOrElse(
      throw new IllegalArgumentException(s"unknown probe input ${spec.probeTable}"))
    val build = byAlias(spec.buildTable).getOrElse(
      throw new IllegalArgumentException(s"unknown build input ${spec.buildTable}"))

    val probeBuffer = store.read(bufferName(spec.probeTable), probe.df.schema)
    val probeFull = probeBuffer.unionByName(probe.df)
    val buildStore = store.read(versionStoreName(spec.buildTable), build.df.schema)
    val buildFull = buildStore.unionByName(build.df)

    // Probe hold-back: rows beyond the build watermark wait in state
    // (reference EngineJoinStreamToTemporalTableTest.scala:126-148).
    val buildWm = build.watermark
    val probeTime = col(spec.probeTimeCol)
    val (eligible, holdback) = buildWm match {
      case Some(w) =>
        val wLit = lit(SqlRewriter.tsLiteral(w)).cast("timestamp")
        (probeFull.where(probeTime <= wLit), probeFull.where(probeTime > wLit))
      case None => (probeFull.limit(0), probeFull)
    }

    // Join keys from `probeAlias.k = buildAlias.k2` in the final step.
    val (probeKey, buildKey) = findAsOfKeys(allSql, spec).getOrElse(
      throw new IllegalArgumentException("as-of join: no key equality found"))

    val buildEventCol = build.spec.vocab.eventTimeColumn
    val buildOpCol = build.spec.vocab.operationTypeColumn
    val buildRenamed = buildFull
      .withColumnRenamed(buildKey, probeKey)
      .withColumn("__bk", col(probeKey))
    val joined = AsOfJoin.leftAsOf(
      eligible.drop("__seq"),
      buildRenamed,
      keys = Seq(probeKey),
      probeTime = spec.probeTimeCol,
      buildTime = buildEventCol,
      buildCols = (buildRenamed.columns
        .filter(c => c != probeKey && c != "__bk" && c != "__seq").toSeq
        .map(c => c -> s"__build_$c")) :+ ("__bk" -> s"__build_$buildKey"),
      buildSeq = Some("__seq")
    )
    // Inner semantics: both reference syntaxes drop probes with no version.
    // A changelog build side treats Retract / CorrectFrom as tombstones:
    // if the latest version at probe time is one, the key has no value.
    val matched = joined.where(col(s"__build_$buildKey").isNotNull)
    val inner =
      if (buildFull.columns.contains(buildOpCol))
        matched.where(!col(s"__build_$buildOpCol")
          .isin(graft.protocol.Op.Retract, graft.protocol.Op.CorrectFrom))
      else matched
    inner.createOrReplaceTempView("__asof_joined")

    var result: DataFrame = null
    steps.zipWithIndex.foreach { case ((alias, rwStep), i) =>
      val sql =
        if (rwStep.asOf.isDefined) rewriteAsOfSql(rwStep.sql, spec) else rwStep.sql
      val df = spark.sql(sql)
      alias.foreach(df.createOrReplaceTempView)
      if (i == outputIdx) result = df
    }

    store.write(bufferName(spec.probeTable), holdback)

    // Version-store compaction: any probe that still needs history (held
    // back or future) has time > probe watermark, so for each key only the
    // newest version at-or-before that bound plus all newer versions can
    // ever be read again. Bounds state to O(keys + recent churn) instead
    // of the full changelog history.
    val compacted = probe.watermark match {
      case Some(pw) =>
        val pwLit = lit(SqlRewriter.tsLiteral(pw)).cast("timestamp")
        val wv = org.apache.spark.sql.expressions.Window
          .partitionBy(col(buildKey))
          .orderBy(col(buildEventCol).desc, col("__seq").desc)
        buildFull
          .withColumn("__stale", col(buildEventCol) <= pwLit)
          .withColumn("__rn",
            row_number().over(wv.partitionBy(col(buildKey), col("__stale"))))
          .where(!col("__stale") || col("__rn") === 1)
          .drop("__stale", "__rn")
      case None => buildFull
    }
    store.write(versionStoreName(spec.buildTable), compacted)

    val wm = minWm(Seq(probe, build))
    ExecResult(result, wm, None, None)
  }

  // ── Top-N changelog via snapshot diff (SURVEY.md §7.4) ───────────────
  private def runTopN(
      fulls: Seq[(LoadedInput, DataFrame)],
      snapshot: DataFrame
  ): ExecResult = {
    val rankCol = findRankAlias(allSql).getOrElse("place")
    val prev = store.read(topNSnapshotName, snapshot.schema)

    val cols = snapshot.columns.toSeq
    val nStruct = struct(cols.map(c => col(s"n.$c")): _*)
    val pStruct = struct(cols.map(c => col(s"p.$c")): _*)
    val j = snapshot.alias("n")
      .join(prev.alias("p"), col(s"n.$rankCol") === col(s"p.$rankCol"), "full_outer")
      .select(
        when(col(s"p.$rankCol").isNull, lit(null)).otherwise(pStruct).as("old"),
        when(col(s"n.$rankCol").isNull, lit(null)).otherwise(nStruct).as("new"))
      .where(!(col("old") <=> col("new")))

    val inserts = j.where(col("old").isNull && col("new").isNotNull)
      .select(cols.map(c => col(s"new.$c")) :+ lit(Op.Append).as(vocab.operationTypeColumn): _*)
    val deletes = j.where(col("new").isNull && col("old").isNotNull)
      .select(cols.map(c => col(s"old.$c")) :+ lit(Op.Retract).as(vocab.operationTypeColumn): _*)
    val changed = j.where(col("old").isNotNull && col("new").isNotNull)
    val correctFrom = changed
      .select(cols.map(c => col(s"old.$c")) :+ lit(Op.CorrectFrom).as(vocab.operationTypeColumn): _*)
    val correctTo = changed
      .select(cols.map(c => col(s"new.$c")) :+ lit(Op.CorrectTo).as(vocab.operationTypeColumn): _*)

    val emitted = inserts.unionByName(deletes).unionByName(correctFrom).unionByName(correctTo)

    fulls.foreach { case (i, full) => store.write(bufferName(i.spec.queryAlias), full) }
    store.write(topNSnapshotName, snapshot)

    ExecResult(
      emitted,
      minWm(inputs),
      None,
      emissionOrder = Some(Seq(col(rankCol).asc, col(vocab.operationTypeColumn).asc)))
  }

  /** Reduce a changelog input to its surviving multiset before stateful
    * recomputation: append/correct-to rows weigh +1, retract/correct-from
    * −1; identical rows (op excluded) net out and survivors are
    * re-expanded. Full recomputation over the surviving multiset yields
    * exactly what Flink's accumulator retraction produces for any
    * aggregate. Skipped (no shuffle) when the slice is append-only.
    */
  private def applyChangelog(df: DataFrame, opCol: String): DataFrame = {
    if (!df.columns.contains(opCol)) return df
    val hasRetractions =
      !df.where(col(opCol).isin(Op.Retract, Op.CorrectFrom)).isEmpty
    if (!hasRetractions) return df
    val userCols = df.columns.filter(_ != opCol).toSeq
    df.groupBy(userCols.map(col): _*)
      .agg(sum(when(col(opCol).isin(Op.Append, Op.CorrectTo), 1L)
        .otherwise(-1L)).as("__net"))
      .where(col("__net") > 0)
      .withColumn(opCol, explode(transform(
        sequence(lit(1), col("__net")), _ => lit(Op.Append))))
      .drop("__net")
      .select(df.columns.map(col): _*)
  }

  /** The output step is the unaliased one (reference TransformEngine.scala
    * :252-262); all aliased steps become named views. Falls back to the
    * last step when every step is aliased.
    */
  private val outputIdx: Int =
    steps.lastIndexWhere(_._1.isEmpty) match {
      case -1 => steps.length - 1
      case i  => i
    }

  private def runSteps(ss: Seq[(Option[String], SqlRewriter.Rewritten)]): DataFrame = {
    var out: DataFrame = null
    ss.zipWithIndex.foreach { case ((alias, rwStep), i) =>
      val df = spark.sql(rwStep.sql)
      alias.foreach(df.createOrReplaceTempView)
      if (i == outputIdx) out = df
    }
    out
  }

  private def minWm(ins: Seq[LoadedInput]): Option[Instant] =
    if (ins.nonEmpty && ins.forall(_.watermark.isDefined))
      Some(ins.flatMap(_.watermark).min)
    else None
}

object IncrementalExecutor {

  final case class IntervalJoinSpec(upperMillis: Long)

  def bufferName(alias: String): String = s"buffer_$alias"
  def versionStoreName(alias: String): String = s"versions_$alias"
  val topNSnapshotName: String = "topn_snapshot"

  private val betweenRe =
    """(?is)(\w+)\.([\w`]+)\s+BETWEEN\s+(\w+)\.([\w`]+)\s+AND\s+\3\.\4\s*\+\s*INTERVAL\s+'(\d+)'\s+(\w+)""".r
  private[engine] val rowNumberRe = """(?i)row_number\s*\(\s*\)\s+over""".r
  private val rankAliasRe =
    """(?is)row_number\s*\(\s*\)\s+over\s*\([^)]*\)\s+as\s+(\w+)""".r
  private val keyEqRe = """(\w+)\.([\w`]+)\s*=\s*(\w+)\.([\w`]+)""".r
  private val fromJoinRe =
    """(?is)FROM\s+\w+(?:\s+AS)?\s+\w+\s*(?:,\s*LATERAL\s+TABLE\s*\([^)]*\)\s*\)?(?:\s+(?:AS\s+)?\w+)?|(?:\s*(?:LEFT\s+)?JOIN\s+\w+\s+FOR\s+SYSTEM_TIME\s+AS\s+OF\s+[\w.`]+(?:\s+(?:AS\s+)?\w+)?\s+ON\s+[^\n]*?))(?=\s+(?:WHERE|GROUP|ORDER|HAVING|LIMIT)\b|\s*$)""".r

  def unitMillis(unit: String): Long = unit.toLowerCase match {
    case "second" | "seconds" => 1000L
    case "minute" | "minutes" => 60L * 1000
    case "hour" | "hours"     => 3600L * 1000
    case "day" | "days"       => 86400L * 1000
    case u => throw new IllegalArgumentException(s"unsupported interval unit $u")
  }

  def durationMillis(sparkInterval: String): Long = {
    val parts = sparkInterval.trim.split("\\s+")
    require(parts.length == 2, s"bad interval '$sparkInterval'")
    parts(0).toLong * unitMillis(parts(1))
  }

  def findIntervalJoin(sql: String): Option[IntervalJoinSpec] =
    betweenRe.findFirstMatchIn(sql).map { m =>
      IntervalJoinSpec(m.group(5).toLong * unitMillis(m.group(6)))
    }

  def findRankAlias(sql: String): Option[String] =
    rankAliasRe.findFirstMatchIn(sql).map(_.group(1))

  /** Find `probeAlias.k = buildAlias.k2` (either order) → (probeKey, buildKey). */
  def findAsOfKeys(
      sql: String,
      spec: SqlRewriter.AsOfSpec
  ): Option[(String, String)] =
    keyEqRe.findAllMatchIn(sql).collectFirst {
      case m if m.group(1) == spec.probeAlias && m.group(3) == spec.buildAlias =>
        (m.group(2), m.group(4))
      case m if m.group(1) == spec.buildAlias && m.group(3) == spec.probeAlias =>
        (m.group(4), m.group(2))
    }

  /** Rewrite the as-of step to select from the materialized joined view. */
  def rewriteAsOfSql(sql: String, spec: SqlRewriter.AsOfSpec): String = {
    var out = fromJoinRe.replaceFirstIn(sql, "FROM __asof_joined ")
    out = s"""(?i)\\b${spec.buildAlias}\\.""".r.replaceAllIn(out, "__build_")
    out = s"""(?i)\\b${spec.probeAlias}\\.(\\w+)""".r.replaceAllIn(out, m => m.group(1))
    out
  }
}
