package graft

import java.time.Instant

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{IncrementalExecutor, SqlRewriter}

class SqlRewriterSpec extends AnyFunSuite {

  val st: Instant = Instant.parse("2000-01-10T00:00:00Z")
  val wm: Option[Instant] = Some(Instant.parse("2000-01-05T00:00:00Z"))

  test("TUMBLE family rewrites to window()") {
    val r = SqlRewriter.rewrite(
      """SELECT TUMBLE_START(event_time, INTERVAL '1' DAY) as event_time,
        |  symbol, min(price) as `min`
        |FROM t GROUP BY TUMBLE(event_time, INTERVAL '1' DAY), symbol""".stripMargin,
      st, wm)
    assert(r.sql.contains("window.start"))
    assert(r.sql.contains("window(event_time, '1 day')"))
    assert(!r.sql.toUpperCase.contains("TUMBLE"))
    assert(r.tumble.contains(SqlRewriter.TumbleSpec("event_time", "1 day")))
  }

  test("now() and current_watermark() become pinned literals") {
    val r = SqlRewriter.rewrite(
      "SELECT now() as t, current_watermark(event_time) as w FROM t", st, wm)
    assert(r.sql.contains("TIMESTAMP '2000-01-10 00:00:00.000'"))
    assert(r.sql.contains("TIMESTAMP '2000-01-05 00:00:00.000'"))
  }

  test("current_watermark() without a watermark becomes NULL") {
    val r = SqlRewriter.rewrite(
      "SELECT current_watermark(event_time) as w FROM t", st, None)
    assert(r.sql.contains("CAST(NULL AS TIMESTAMP)"))
  }

  test("FOR SYSTEM_TIME AS OF produces an AsOfSpec") {
    val r = SqlRewriter.rewrite(
      """SELECT t.event_time, owned.volume FROM tickers as t
        |JOIN stocks_owned FOR SYSTEM_TIME AS OF t.event_time AS owned
        |  ON t.symbol = owned.symbol""".stripMargin, st, wm)
    assert(r.asOf.contains(SqlRewriter.AsOfSpec(
      "tickers", "t", "stocks_owned", "owned", "event_time")))
  }

  test("LATERAL TABLE produces an AsOfSpec") {
    val r = SqlRewriter.rewrite(
      """SELECT t.event_time, p.volume
        |FROM tickers t, LATERAL TABLE (portfolio(t.event_time)) p
        |WHERE t.symbol = p.symbol""".stripMargin, st, wm)
    assert(r.asOf.isDefined)
    assert(r.asOf.get.probeAlias == "t")
    assert(r.asOf.get.buildTable == "portfolio")
  }

  test("TUMBLE_START/TUMBLE_END aliases are recorded for gate alignment") {
    val r = SqlRewriter.rewrite(
      """SELECT TUMBLE_END(event_time, INTERVAL '1' DAY) as event_time,
        |  TUMBLE_START(event_time, INTERVAL '1' DAY) as window_open,
        |  count(*) as n
        |FROM t GROUP BY TUMBLE(event_time, INTERVAL '1' DAY)""".stripMargin,
      st, wm)
    assert(r.endAliases == Set("event_time"))
    assert(r.startAliases == Set("window_open"))
  }

  test("as-of key equality extraction handles both orders (plan-based)") {
    import org.apache.spark.sql.catalyst.parser.CatalystSqlParser.parsePlan
    val spec = SqlRewriter.AsOfSpec("tick", "t", "stocks", "s", "event_time")
    assert(IncrementalExecutor.findAsOfKeys(
      parsePlan("SELECT * FROM tick t JOIN stocks s ON t.symbol = s.sym"), spec)
      .contains(("symbol", "sym")))
    assert(IncrementalExecutor.findAsOfKeys(
      parsePlan("SELECT * FROM tick t JOIN stocks s ON s.sym = t.symbol"), spec)
      .contains(("symbol", "sym")))
    // WHERE-clause equality (lateral syntax), quoted aliases, and a string
    // literal that a text regex would have matched
    assert(IncrementalExecutor.findAsOfKeys(
      parsePlan("SELECT 't.symbol = s.nope' AS trap FROM tick `t` JOIN stocks `s` " +
        "WHERE `s`.sym = `t`.symbol"), spec)
      .contains(("symbol", "sym")))
  }

  test("as-of step SQL is normalized to parseable Spark join syntax") {
    import org.apache.spark.sql.catalyst.parser.CatalystSqlParser.parsePlan
    val r = SqlRewriter.rewrite(
      """SELECT t.event_time, owned.volume FROM tickers as t
        |JOIN stocks_owned FOR SYSTEM_TIME AS OF t.event_time AS owned
        |  ON t.symbol = owned.symbol""".stripMargin, st, wm)
    assert(r.asOf.isDefined)
    parsePlan(r.sql) // must not throw
    assert(!r.sql.toUpperCase.contains("SYSTEM_TIME"))

    val r2 = SqlRewriter.rewrite(
      """SELECT t.event_time, p.volume
        |FROM tickers t, LATERAL TABLE (`stocks.owned`(t.event_time)) p
        |WHERE t.symbol = p.symbol""".stripMargin, st, wm)
    assert(r2.asOf.isDefined)
    parsePlan(r2.sql)
    assert(!r2.sql.toUpperCase.contains("LATERAL"))
  }

  test("quoted aliases in FOR SYSTEM_TIME still produce the AsOfSpec") {
    val r = SqlRewriter.rewrite(
      """SELECT `symb`.event_time, `owned`.volume FROM tickers as `symb`
        |JOIN stocks_owned FOR SYSTEM_TIME AS OF `symb`.event_time AS `owned`
        |  ON `symb`.symbol = `owned`.symbol""".stripMargin, st, wm)
    assert(r.asOf.contains(SqlRewriter.AsOfSpec(
      "tickers", "symb", "stocks_owned", "owned", "event_time")))
  }
}
