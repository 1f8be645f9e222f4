package graft.engine

import java.time.Instant
import scala.util.matching.Regex

/** Pre-execution rewriter for the reference's Flink-SQL dialect deltas
  * (SURVEY.md §7.1). Translates the streaming constructs the reference's
  * users write into Spark SQL + structured markers our engine executes:
  *
  *   - `TUMBLE(col, INTERVAL 'n' UNIT)` (GROUP BY)  → `window(col, 'n unit')`
  *   - `TUMBLE_START(col, …)` / `TUMBLE_END(col, …)` → `window.start` / `window.end`
  *   - `now()`                                       → pinned systemTime literal
  *   - `current_watermark(col)`                      → watermark literal from the ledger
  *   - `… FOR SYSTEM_TIME AS OF p.t ON …`            → extracted [[AsOfSpec]]
  *   - `LATERAL TABLE (fn(p.t)) …`                   → extracted [[AsOfSpec]]
  *
  * Regex-scoped by design: the reference's documented surface (README + test
  * corpus) is covered; anything outside it passes through to Spark's parser,
  * which reports its own errors (mapped to InvalidQuery by the engine).
  */
object SqlRewriter {

  /** Detected tumbling window: column + duration as a Spark interval string.
    * `calendarMonths` > 0 marks a calendar window (month=1, quarter=3,
    * year=12) — grouped via date_trunc, gated via add_months; `duration`
    * is unused then. (The reference cannot do calendar windows at all —
    * /root/reference README.md:76.)
    */
  final case class TumbleSpec(
      timeCol: String,
      duration: String,
      calendarMonths: Int = 0)

  /** Detected as-of join: probe/build aliases + key equality + probe time. */
  final case class AsOfSpec(
      probeTable: String,
      probeAlias: String,
      buildTable: String,
      buildAlias: String,
      probeTimeCol: String
  )

  /** @param startAliases output names aliased from `TUMBLE_START(...)`
    * @param endAliases   output names aliased from `TUMBLE_END(...)` — the
    *   executor needs to know whether the emitted event-time column is a
    *   window START (gate on time + duration) or already the window END
    *   (gate on the value itself); conflating them shifts emission a full
    *   window and silently loses rows at the buffer prune.
    */
  /** @param timeVarying the step referenced `now()` or
    *   `current_watermark(...)` — both are substituted with literals that
    *   CHANGE between runs, so a row's contribution to an updating query is
    *   not fixed at arrival time. Incremental fast paths (slice-only
    *   aggregation, touched-partition ranking) must not run such steps.
    */
  final case class Rewritten(
      sql: String,
      tumble: Option[TumbleSpec],
      asOf: Option[AsOfSpec],
      startAliases: Set[String] = Set.empty,
      endAliases: Set[String] = Set.empty,
      timeVarying: Boolean = false
  )

  private val tumbleRe: Regex =
    """(?i)TUMBLE\s*\(\s*([\w.`]+)\s*,\s*INTERVAL\s+'(\d+)'\s+(\w+)\s*\)""".r
  private val tumbleStartRe: Regex =
    """(?i)TUMBLE_START\s*\(\s*([\w.`]+)\s*,\s*INTERVAL\s+'(\d+)'\s+(\w+)\s*\)""".r
  private val tumbleEndRe: Regex =
    """(?i)TUMBLE_END\s*\(\s*([\w.`]+)\s*,\s*INTERVAL\s+'(\d+)'\s+(\w+)\s*\)""".r
  private val tumbleStartAliasRe: Regex =
    """(?i)TUMBLE_START\s*\([^)]*\)\s+AS\s+`?(\w+)`?""".r
  private val tumbleEndAliasRe: Regex =
    """(?i)TUMBLE_END\s*\([^)]*\)\s+AS\s+`?(\w+)`?""".r
  private val nowRe: Regex = """(?i)\bnow\s*\(\s*\)""".r
  private val currentWatermarkRe: Regex =
    """(?i)\bcurrent_watermark\s*\(\s*[\w.`]+\s*\)""".r
  // FROM probe p JOIN build FOR SYSTEM_TIME AS OF p.t AS b ON ... | alternate order
  // Aliases may be backtick-quoted (the plan-based step rewrite resolves
  // them structurally; this spec regex only needs the names).
  private val forSystemTimeRe: Regex =
    """(?is)FROM\s+(\w+)(?:\s+AS)?\s+`?(\w+)`?\s*,?\s*(?:LEFT\s+)?JOIN\s+(\w+)\s+FOR\s+SYSTEM_TIME\s+AS\s+OF\s+`?(\w+)`?\.`?(\w+)`?(?:\s+(?:AS\s+)?`?(\w+)`?)?""".r
  // FROM probe p, LATERAL TABLE (fn(p.t)) AS b | LATERAL TABLE (fn(p.t)) b
  // The temporal-table name may be a backticked dotted dataset alias, e.g.
  // LATERAL TABLE (`stocks.owned`(t.event_time)) — the reference's own test
  // corpus uses that form (EngineJoinStreamToTemporalTableTest.scala:75-85).
  private val lateralRe: Regex =
    """(?is)FROM\s+(\w+)(?:\s+AS)?\s+`?(\w+)`?\s*,\s*LATERAL\s+TABLE\s*\(\s*(`[^`]+`|\w+)\s*\(\s*`?(\w+)`?\.`?(\w+)`?\s*\)\s*\)(?:\s+(?:AS\s+)?`?(\w+)`?)?""".r
  // Normalizers: strip the two Flink-only temporal constructs so the as-of
  // step parses with Spark's own parser — the executor then rewrites the
  // PARSED plan (no further text surgery on the step).
  private val forSystemTimeClauseRe: Regex =
    """(?is)\s+FOR\s+SYSTEM_TIME\s+AS\s+OF\s+`?\w+`?\.`?\w+`?""".r
  private val lateralClauseRe: Regex =
    """(?is)\s*,\s*LATERAL\s+TABLE\s*\(\s*(`[^`]+`|\w+)\s*\(\s*`?\w+`?\.`?\w+`?\s*\)\s*\)""".r

  private def sparkInterval(n: String, unit: String): String =
    s"$n ${unit.toLowerCase}"

  def rewrite(
      sql: String,
      systemTime: Instant,
      watermark: Option[Instant]
  ): Rewritten = {
    var out = sql
    var tumble: Option[TumbleSpec] = None
    var asOf: Option[AsOfSpec] = None
    val startAliases =
      tumbleStartAliasRe.findAllMatchIn(out).map(_.group(1)).toSet
    val endAliases =
      tumbleEndAliasRe.findAllMatchIn(out).map(_.group(1)).toSet

    def calendarMonths(n: String, unit: String): Int = unit.toUpperCase match {
      case "MONTH" | "MONTHS"     => n.toInt
      case "QUARTER" | "QUARTERS" => n.toInt * 3
      case "YEAR" | "YEARS"       => n.toInt * 12
      case _                      => 0
    }
    def truncUnit(months: Int): String = months match {
      case 1  => "MONTH"
      case 3  => "QUARTER"
      case 12 => "YEAR"
      case _  => "MONTH" // multi-month: trunc to month boundary of window start
    }

    tumbleStartRe.findFirstMatchIn(out).foreach { m =>
      val cm = calendarMonths(m.group(2), m.group(3))
      out = tumbleStartRe.replaceAllIn(out, m =>
        if (calendarMonths(m.group(2), m.group(3)) > 0)
          s"date_trunc('${truncUnit(calendarMonths(m.group(2), m.group(3)))}', ${m.group(1)})"
        else "window.start")
      val _ = cm
    }
    tumbleEndRe.findFirstMatchIn(out).foreach { _ =>
      out = tumbleEndRe.replaceAllIn(out, m =>
        if (calendarMonths(m.group(2), m.group(3)) > 0)
          s"cast(add_months(date_trunc('${truncUnit(calendarMonths(m.group(2), m.group(3)))}', ${m.group(1)}), ${calendarMonths(m.group(2), m.group(3))}) as timestamp)"
        else "window.end")
    }
    tumbleRe.findFirstMatchIn(out).foreach { m =>
      val cm = calendarMonths(m.group(2), m.group(3))
      if (cm > 0) {
        tumble = Some(TumbleSpec(m.group(1), "", cm))
        out = tumbleRe.replaceAllIn(out, m =>
          s"date_trunc('${truncUnit(calendarMonths(m.group(2), m.group(3)))}', ${m.group(1)})")
      } else {
        tumble = Some(TumbleSpec(m.group(1), sparkInterval(m.group(2), m.group(3))))
        out = tumbleRe.replaceAllIn(
          out,
          m => s"window(${m.group(1)}, '${sparkInterval(m.group(2), m.group(3))}')"
        )
      }
    }

    val timeVarying = nowRe.findFirstIn(out).isDefined ||
      currentWatermarkRe.findFirstIn(out).isDefined
    out = nowRe.replaceAllIn(out, _ => s"TIMESTAMP '${tsLiteral(systemTime)}'")
    out = currentWatermarkRe.replaceAllIn(
      out,
      _ =>
        watermark
          .map(w => s"TIMESTAMP '${tsLiteral(w)}'")
          .getOrElse("CAST(NULL AS TIMESTAMP)")
    )

    forSystemTimeRe.findFirstMatchIn(out).foreach { m =>
      val buildAlias = Option(m.group(6)).getOrElse(m.group(3))
      asOf = Some(AsOfSpec(
        probeTable = m.group(1), probeAlias = m.group(2),
        buildTable = m.group(3), buildAlias = buildAlias,
        probeTimeCol = m.group(5)))
      // `JOIN build AS b ON …` — plain Spark join syntax
      out = forSystemTimeClauseRe.replaceFirstIn(out, "")
    }
    if (asOf.isEmpty) {
      lateralRe.findFirstMatchIn(out).foreach { m =>
        val buildTable = m.group(3).stripPrefix("`").stripSuffix("`")
        val buildAlias = Option(m.group(6)).getOrElse(buildTable)
        asOf = Some(AsOfSpec(
          probeTable = m.group(1), probeAlias = m.group(2),
          buildTable = buildTable, buildAlias = buildAlias,
          probeTimeCol = m.group(5)))
        // `JOIN \`build\` AS b` (condition-free; the key equality lives in
        // WHERE for this syntax) — parseable by Spark
        out = lateralClauseRe.replaceFirstIn(out, " JOIN $1")
      }
    }

    Rewritten(out, tumble, asOf, startAliases, endAliases, timeVarying)
  }

  private[engine] def tsLiteral(i: Instant): String =
    java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss.SSS")
      .withZone(java.time.ZoneOffset.UTC)
      .format(i)
}
