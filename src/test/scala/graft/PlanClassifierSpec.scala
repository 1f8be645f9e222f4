package graft

import java.time.Instant

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{InvalidQueryException, PlanClassifier, SqlRewriter}
import graft.engine.PlanClassifier.Mode

/** Unit tests for plan-based chain classification — the shapes that regex
  * detection misrouted (round-1 VERDICT) plus traversal corners (CTE
  * definitions, set operations) that are easy to miss in the plan walk.
  */
class PlanClassifierSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val st: Instant = Instant.parse("2000-01-10T00:00:00Z")

  def classify(sqls: String*): Mode =
    PlanClassifier.classify(spark,
      sqls.toSeq.map(q => (None, SqlRewriter.rewrite(q, st, None))))

  test("pure projection/filter chains are stateless") {
    assert(classify("SELECT event_time, symbol FROM t WHERE price > 3") == Mode.Stateless)
  }

  test("interval join classifies identically for BETWEEN and >=/<= spellings") {
    val between =
      """SELECT o.event_time FROM o LEFT JOIN s ON o.id = s.id
        |AND s.event_time BETWEEN o.event_time AND o.event_time + INTERVAL '2' DAY""".stripMargin
    val cmp =
      """SELECT o.event_time FROM o JOIN s ON o.id = s.id
        |AND s.event_time >= o.event_time
        |AND s.event_time <= o.event_time + INTERVAL '2' DAY""".stripMargin
    assert(classify(between) == Mode.Windowed(2L * 86400 * 1000))
    assert(classify(cmp) == Mode.Windowed(2L * 86400 * 1000))
  }

  test("partitioned rank filter keys the diff on partition keys + rank") {
    val q =
      """SELECT event_time, symbol, price, rn FROM (
        |  SELECT event_time, symbol, price,
        |    row_number() OVER (PARTITION BY symbol ORDER BY event_time DESC) AS rn
        |  FROM t) WHERE rn = 1""".stripMargin
    assert(classify(q) == Mode.SnapshotDiff(Some(Seq("symbol", "rn")), None,
      Some(PlanClassifier.RankTouch("t", Seq("symbol")))))
  }

  test("rank touch resolves through the two-step ranked/filter spelling") {
    def chain(qs: (Option[String], String)*): Option[PlanClassifier.RankTouch] =
      PlanClassifier.classify(spark,
        qs.toSeq.map { case (a, q) => (a, SqlRewriter.rewrite(q, st, None)) })
        .asInstanceOf[Mode.SnapshotDiff].rankTouch
    assert(chain(
      Some("ranked") -> ("SELECT event_time, symbol, price, " +
        "row_number() OVER (PARTITION BY symbol ORDER BY event_time DESC) AS rn FROM t"),
      None -> "SELECT event_time, symbol, price, rn FROM ranked WHERE rn = 1") ==
      Some(PlanClassifier.RankTouch("t", Seq("symbol"))))
    // a pre-step re-deriving the partition column breaks the narrowing
    assert(chain(
      Some("v") -> "SELECT event_time, upper(symbol) AS symbol, price FROM t",
      Some("ranked") -> ("SELECT event_time, symbol, price, " +
        "row_number() OVER (PARTITION BY symbol ORDER BY event_time DESC) AS rn FROM v"),
      None -> "SELECT event_time, symbol, price, rn FROM ranked WHERE rn = 1").isEmpty)
    // a ranked view consumed twice breaks the use-once discipline
    assert(chain(
      Some("ranked") -> ("SELECT event_time, symbol, price, " +
        "row_number() OVER (PARTITION BY symbol ORDER BY event_time DESC) AS rn FROM t"),
      Some("w") -> "SELECT symbol FROM ranked",
      None -> "SELECT event_time, symbol, price, rn FROM ranked WHERE rn = 1").isEmpty)
  }

  test("rank touch narrowing is withheld when untouched rows could change") {
    def rank(extra: String, from: String = "t") =
      s"""SELECT event_time, symbol, price, rn FROM (
         |  SELECT event_time, symbol, price,
         |    row_number() OVER (PARTITION BY symbol ORDER BY event_time DESC) AS rn
         |  FROM $from$extra) WHERE rn = 1""".stripMargin
    // current_watermark(): a watermark-only run changes which rows rank
    assert(classify(rank(" WHERE event_time <= current_watermark(event_time)"))
      .asInstanceOf[Mode.SnapshotDiff].rankTouch.isEmpty)
    // subquery over another input: membership changes without new t rows
    assert(classify(rank(" WHERE symbol IN (SELECT symbol FROM allow)"))
      .asInstanceOf[Mode.SnapshotDiff].rankTouch.isEmpty)
    // partition column re-defined by an alias: raw slice values are not the
    // output partition identity
    val aliased =
      """SELECT event_time, symbol, rn FROM (
        |  SELECT event_time, upper(sym) AS symbol,
        |    row_number() OVER (PARTITION BY symbol ORDER BY event_time DESC) AS rn
        |  FROM t) WHERE rn = 1""".stripMargin
    assert(classify(aliased)
      .asInstanceOf[Mode.SnapshotDiff].rankTouch.isEmpty)
    // two relations (self-union): occurrence count must be exactly one
    assert(classify(rank("", from = "(SELECT * FROM t UNION ALL SELECT * FROM t2)"))
      .asInstanceOf[Mode.SnapshotDiff].rankTouch.isEmpty)
    // a CTE body is not a TreeNode child — it can hide a second relation
    // reference or shadow the input alias with re-keyed partition values,
    // so WITH-queries must never narrow
    val cteShadow =
      """WITH t AS (SELECT event_time, upper(symbol) AS symbol, price FROM t)
        |SELECT event_time, symbol, price, rn FROM (
        |  SELECT event_time, symbol, price,
        |    row_number() OVER (PARTITION BY symbol ORDER BY price DESC) AS rn
        |  FROM t) WHERE rn = 1""".stripMargin
    assert(classify(cteShadow)
      .asInstanceOf[Mode.SnapshotDiff].rankTouch.isEmpty)
  }

  test("non-windowed GROUP BY keys the diff on the group columns") {
    val m = classify(
      "SELECT symbol, count(*) AS n FROM t GROUP BY symbol")
      .asInstanceOf[Mode.SnapshotDiff]
    assert(m.keys == Some(Seq("symbol")))
    assert(m.rankTouch == Some(PlanClassifier.RankTouch("t", Seq("symbol"))))
    val spec = m.aggMerge.get
    assert(spec.keys == Seq("symbol"))
    // invertible (sum/count only) → hidden row-count partial + aux plan
    assert(spec.aggs ==
      Seq("n" -> "count", PlanClassifier.RowCountCol -> "count"))
    assert(spec.invertible && spec.partialsPlan.isDefined)
  }

  test("decomposable aggregate shapes carry an incremental-merge spec") {
    val m = classify(
      """SELECT symbol, sum(price) AS total, min(price) AS lo,
        |max(price) AS hi, count(*) AS n
        |FROM t GROUP BY symbol""".stripMargin)
    assert(m == Mode.SnapshotDiff(Some(Seq("symbol")),
      Some(PlanClassifier.AggMergeSpec(Seq("symbol"),
        Seq("total" -> "sum", "lo" -> "min", "hi" -> "max", "n" -> "count"))),
      Some(PlanClassifier.RankTouch("t", Seq("symbol")))))
  }

  test("non-decomposable aggregates keep the recompute path") {
    // DISTINCT aggregates are not mergeable
    assert(classify("SELECT symbol, count(DISTINCT price) AS n FROM t GROUP BY symbol")
      .asInstanceOf[Mode.SnapshotDiff].aggMerge.isEmpty)
    // HAVING over a mergeable aggregate CALL rides a hidden partial — see
    // the hidden-partial test; a non-mergeable one stays recompute
    assert(classify(
      "SELECT symbol, sum(price) AS s FROM t GROUP BY symbol HAVING max(price) > 5")
      .asInstanceOf[Mode.SnapshotDiff].aggMerge
      .exists(_.aggs.toMap == Map("s" -> "sum", "__hv_0" -> "max")))
    // the aggregate in an intermediate view with stateless post-processing
    assert(classify(
      """WITH a AS (SELECT symbol, sum(price) AS s FROM t GROUP BY symbol)
        |SELECT symbol, s FROM a WHERE s > 5""".stripMargin)
      .asInstanceOf[Mode.SnapshotDiff].aggMerge.isEmpty)
  }

  test("expressions over mergeable aggregates ride hidden partials") {
    // `sum(a)/sum(b)` and friends merge: each aggregate CALL becomes a
    // hidden __hv partial and the expression is evaluated post-merge.
    val m = classify(
      """SELECT symbol, sum(price) / count(*) AS ratio,
        |  CAST(sum(price) + 1 AS INT) AS s1
        |FROM t GROUP BY symbol""".stripMargin)
      .asInstanceOf[Mode.SnapshotDiff].aggMerge
    assert(m.isDefined)
    assert(m.get.exprCols.map(_._1) == Seq("ratio", "s1"))
    // identical calls share one hidden partial
    assert(m.get.aggs.count(_._2 == "sum") == 1)
    assert(m.get.partialsPlan.isDefined)
    // avg inside an expression rides division partials (and the decimal
    // guard, via hiddenAvgs)
    val a = classify(
      "SELECT symbol, avg(price) * 2 AS ap2 FROM t GROUP BY symbol")
      .asInstanceOf[Mode.SnapshotDiff].aggMerge
    assert(a.exists(_.hiddenAvgs.nonEmpty))
    // expressions may reference earlier visible columns (lateral aliases
    // hold their final values post-merge)
    assert(classify(
      "SELECT symbol, sum(price) AS s, s + 1 AS s1 FROM t GROUP BY symbol")
      .asInstanceOf[Mode.SnapshotDiff].aggMerge
      .exists(_.exprCols == Seq("s1" -> "(s + 1)")))
    // a non-mergeable aggregate inside the expression keeps recompute
    assert(classify(
      "SELECT symbol, stddev_pop(price) + 0 AS sd FROM t GROUP BY symbol")
      .asInstanceOf[Mode.SnapshotDiff].aggMerge.isEmpty)
    // nondeterministic functions are evaluated once post-merge, not per
    // plan — never fast-pathed
    assert(classify(
      "SELECT symbol, sum(price) * rand() AS r FROM t GROUP BY symbol")
      .asInstanceOf[Mode.SnapshotDiff].aggMerge.isEmpty)
    // qualified column references inside the expression are not resolvable
    // post-merge (the merged frame has output names only) — recompute
    assert(classify(
      "SELECT symbol, sum(price) + length(t.symbol) AS x FROM t GROUP BY symbol")
      .asInstanceOf[Mode.SnapshotDiff].aggMerge.isEmpty)
    // min/max inside expressions stay off the LEFT-join path (handled via
    // hidden-kind check) — inner/global shapes may carry them
    assert(classify(
      "SELECT symbol, max(price) - min(price) AS spread FROM t GROUP BY symbol")
      .asInstanceOf[Mode.SnapshotDiff].aggMerge
      .exists(_.aggs.map(_._2).sorted == Seq("max", "min")))
  }

  test("avg decomposes to sum+count partials in the merge spec") {
    val m = classify("SELECT symbol, avg(price) AS ap, count(*) AS n FROM t GROUP BY symbol")
      .asInstanceOf[Mode.SnapshotDiff].aggMerge
    assert(m.isDefined)
    assert(m.get.keys == Seq("symbol"))
    assert(m.get.aggs ==
      Seq("n" -> "count", PlanClassifier.RowCountCol -> "count"))
    assert(m.get.avgs == Seq("ap"))
    assert(m.get.partialsPlan.isDefined)
    // global avg too
    val g = classify("SELECT avg(price) AS ap FROM t")
      .asInstanceOf[Mode.SnapshotDiff].aggMerge
    assert(g.exists(s => s.keys.isEmpty && s.avgs == Seq("ap")))
  }

  test("HAVING over output columns merges with a post-merge filter") {
    val m = classify(
      "SELECT symbol, sum(price) AS s FROM t GROUP BY symbol HAVING s > 5")
      .asInstanceOf[Mode.SnapshotDiff].aggMerge
    assert(m.isDefined)
    assert(m.get.havingSql.isDefined)
    assert(m.get.partialsPlan.isDefined)
    // HAVING referencing a non-output column stays on the recompute path
    assert(classify(
      "SELECT symbol, sum(price) AS s FROM t GROUP BY symbol HAVING other > 5")
      .asInstanceOf[Mode.SnapshotDiff].aggMerge.isEmpty)
  }

  test("an aggregate as the whole output step under a CTE is mergeable") {
    val m = classify(
      """WITH f AS (SELECT symbol, price FROM t WHERE price > 0)
        |SELECT symbol, sum(price) AS s FROM f GROUP BY symbol""".stripMargin)
    val spec = m.asInstanceOf[Mode.SnapshotDiff].aggMerge.get
    assert(spec.keys == Seq("symbol"))
    assert(spec.aggs == Seq("s" -> "sum", "__nc_s" -> "count",
      PlanClassifier.RowCountCol -> "count"))
    assert(spec.sumNullCounts == Seq("s" -> "__nc_s"))
    assert(spec.invertible && spec.partialsPlan.isDefined)
  }

  test("a GROUP BY hidden inside a CTE definition is still stateful") {
    // UnresolvedWith does not expose cteRelations as tree children — a
    // naive plan walk would classify this chain stateless
    val q =
      """WITH agg AS (SELECT symbol, count(*) AS n FROM t GROUP BY symbol)
        |SELECT symbol, n FROM agg WHERE n > 1""".stripMargin
    assert(classify(q).isInstanceOf[Mode.SnapshotDiff])
  }

  test("EXCEPT / INTERSECT are updating queries, not per-slice maps") {
    assert(classify(
      "SELECT symbol FROM a EXCEPT SELECT symbol FROM b")
      .isInstanceOf[Mode.SnapshotDiff])
    assert(classify(
      "SELECT symbol FROM a INTERSECT SELECT symbol FROM b")
      .isInstanceOf[Mode.SnapshotDiff])
  }

  test("global aggregate in a bare SELECT is a single-group diff") {
    val m = classify("SELECT count(*) AS n FROM t").asInstanceOf[Mode.SnapshotDiff]
    assert(m.keys == Some(Nil))
    val spec = m.aggMerge.get
    assert(spec.keys == Nil)
    assert(spec.aggs ==
      Seq("n" -> "count", PlanClassifier.RowCountCol -> "count"))
    assert(spec.invertible)
  }

  test("nested aggregation narrows to the common grouping columns, keyed by the outer") {
    val m = classify(
      "SELECT symbol, max(s) AS mx FROM (SELECT symbol, id, sum(price) AS s " +
        "FROM t GROUP BY symbol, id) GROUP BY symbol")
      .asInstanceOf[Mode.SnapshotDiff]
    assert(m.keys == Some(Seq("symbol")))
    assert(m.rankTouch == Some(PlanClassifier.RankTouch("t", Seq("symbol"))))
    assert(m.aggMerge.isEmpty) // merge algebra has no nested form — touch only
    // the two-step spelling resolves through the pre-step alias identically
    val m2 = PlanClassifier.classify(spark, Seq(
      (Some("inner_daily"), SqlRewriter.rewrite(
        "SELECT symbol, id, sum(price) AS s FROM t GROUP BY symbol, id", st, None)),
      (None, SqlRewriter.rewrite(
        "SELECT symbol, max(s) AS mx FROM inner_daily GROUP BY symbol", st, None))))
      .asInstanceOf[Mode.SnapshotDiff]
    assert(m2.keys == Some(Seq("symbol")))
    assert(m2.rankTouch == Some(PlanClassifier.RankTouch("t", Seq("symbol"))))
  }

  test("nested aggregation with a global outer stage keeps the full diff") {
    // outer global aggregate sees every inner group: nothing to narrow,
    // but the single-row output still keys the diff
    val m = classify(
      "SELECT max(s) AS mx FROM (SELECT symbol, sum(price) AS s " +
        "FROM t GROUP BY symbol)")
      .asInstanceOf[Mode.SnapshotDiff]
    assert(m.rankTouch.isEmpty)
    assert(m.keys == Some(Nil))
  }

  test("group touch is withheld when a stage re-defines a common column") {
    // inner aliases a derived value to the outer's grouping name: the raw
    // slice's `sym` values say nothing about touched output partitions
    val m = classify(
      "SELECT sym, max(s) AS mx FROM (SELECT upper(symbol) AS sym, id, " +
        "sum(price) AS s FROM t GROUP BY upper(symbol), id) GROUP BY sym")
      .asInstanceOf[Mode.SnapshotDiff]
    assert(m.rankTouch.isEmpty)
  }

  test("rank over an aggregate narrows on the shared partition columns") {
    val m = classify(
      "SELECT symbol, id, s, rn FROM (SELECT symbol, id, s, row_number() " +
        "OVER (PARTITION BY symbol ORDER BY s DESC) AS rn FROM (" +
        "SELECT symbol, id, sum(price) AS s FROM t GROUP BY symbol, id)) " +
        "WHERE rn <= 2")
      .asInstanceOf[Mode.SnapshotDiff]
    assert(m.rankTouch == Some(PlanClassifier.RankTouch("t", Seq("symbol"))))
  }

  test("a single inner join carries a delta-join spec") {
    assert(classify("SELECT a.id, b.v FROM a JOIN b ON a.id = b.id")
      .asInstanceOf[Mode.SnapshotDiff].joinDelta ==
      Some(PlanClassifier.JoinDelta(Vector("a", "b"))))
    // aliased sides resolve through SubqueryAlias to the input relations
    assert(classify("SELECT x.id, y.v FROM a AS x JOIN b AS y ON x.id = y.id")
      .asInstanceOf[Mode.SnapshotDiff].joinDelta ==
      Some(PlanClassifier.JoinDelta(Vector("a", "b"))))
    // the predicate is unrestricted — inner θ-joins decompose the same way
    assert(classify("SELECT a.id, b.v FROM a JOIN b ON a.id < b.id AND b.v > 0")
      .asInstanceOf[Mode.SnapshotDiff].joinDelta ==
      Some(PlanClassifier.JoinDelta(Vector("a", "b"))))
  }

  test("delta-join spec is withheld for non-append-only or multi-scan shapes") {
    def jd(q: String) = classify(q).asInstanceOf[Mode.SnapshotDiff].joinDelta
    // outer join: a later match must retract the null-padded row
    assert(jd("SELECT a.id FROM a LEFT JOIN b ON a.id = b.id").isEmpty)
    // self-join: one relation at two scan SITES — the tree is multilinear
    // over sites, so the telescoping applies per occurrence (bound by the
    // executor's per-site rewrite, not by view name)
    assert(jd("SELECT x.id FROM a AS x JOIN a AS y ON x.id = y.parent") ==
      Some(PlanClassifier.JoinDelta(Vector("a", "a"))))
    // three-way inner tree decomposes into one delta term per input
    assert(jd("SELECT a.id FROM a JOIN b ON a.id = b.id JOIN c ON b.id = c.id") ==
      Some(PlanClassifier.JoinDelta(Vector("a", "b", "c"))))
    // repeated relation deeper in a tree: one term per scan site
    assert(jd("SELECT a.id FROM a JOIN b ON a.id = b.id JOIN a AS z ON b.id = z.id") ==
      Some(PlanClassifier.JoinDelta(Vector("a", "b", "a"))))
    // an outer join anywhere poisons the whole tree
    assert(jd("SELECT a.id FROM a JOIN b ON a.id = b.id LEFT JOIN c ON b.id = c.id").isEmpty)
    // aggregation above the join is its own (non-join) updating shape
    assert(jd("SELECT a.id, count(*) AS n FROM a JOIN b ON a.id = b.id GROUP BY a.id").isEmpty)
    // CTE bodies are not plan children — never classify through them
    assert(jd(
      """WITH j AS (SELECT a.id, b.v FROM a JOIN b ON a.id = b.id)
        |SELECT id, v FROM j""".stripMargin).isEmpty)
    // expression subqueries change membership without new slice rows
    assert(jd(
      "SELECT a.id, b.v FROM a JOIN b ON a.id = b.id WHERE a.id IN (SELECT id FROM c)").isEmpty)
    // the JOIN in a PRE-step with stateless post-processing: the executor
    // re-runs the whole chain per delta term, so the delta path applies
    assert(PlanClassifier.classify(spark, Seq(
      (Some("j"), SqlRewriter.rewrite("SELECT a.id, b.v FROM a JOIN b ON a.id = b.id", st, None)),
      (None, SqlRewriter.rewrite("SELECT id, v FROM j", st, None))))
      .asInstanceOf[Mode.SnapshotDiff].joinDelta ==
      Some(PlanClassifier.JoinDelta(Vector("a", "b"))))
    // a join-free STEP alias consumed twice: each scan site gets its own
    // inlined copy of the step body, so the chain telescopes per site —
    // delta path with rels ("a","a") and an inlined output plan (the
    // round-7 reuse relaxation; mirrors the dedicated reused-alias test)
    assert(PlanClassifier.classify(spark, Seq(
      (Some("v"), SqlRewriter.rewrite("SELECT id, quantity FROM a", st, None)),
      (None, SqlRewriter.rewrite(
        "SELECT x.id FROM v x JOIN v y ON x.id = y.quantity", st, None))))
      .asInstanceOf[Mode.SnapshotDiff].joinDelta
      .exists(j => j.rels == Vector("a", "a") && j.inlinedOut.isDefined))
  }

  test("delta-join resolves through stateless single-scan pre-steps") {
    def chain(qs: (Option[String], String)*): Mode =
      PlanClassifier.classify(spark,
        qs.toSeq.map { case (a, q) => (a, SqlRewriter.rewrite(q, st, None)) })
    // one side derived through a pre-step
    assert(chain(
      Some("v") -> "SELECT id, quantity * 2 AS q2 FROM a WHERE quantity > 0",
      None -> "SELECT v.id, v.q2, b.x FROM v JOIN b ON v.id = b.id")
      .asInstanceOf[Mode.SnapshotDiff].joinDelta ==
      Some(PlanClassifier.JoinDelta(Vector("a", "b"))))
    // both sides derived, two-deep on one side
    assert(chain(
      Some("v1") -> "SELECT id, quantity FROM a",
      Some("v2") -> "SELECT id, quantity FROM v1 WHERE quantity > 1",
      Some("w") -> "SELECT id, x FROM b",
      None -> "SELECT v2.id, w.x FROM v2 JOIN w ON v2.id = w.id")
      .asInstanceOf[Mode.SnapshotDiff].joinDelta ==
      Some(PlanClassifier.JoinDelta(Vector("a", "b"))))
    // a join-free pre-step consumed TWICE (here once directly and once
    // through a second alias) telescopes per scan site under the round-7
    // reuse relaxation — inlined delta spec with both sites at input "a"
    assert(chain(
      Some("v") -> "SELECT id FROM a",
      None -> "SELECT v.id FROM v JOIN b ON v.id = b.id AND b.id IN (0)")
      .asInstanceOf[Mode.SnapshotDiff].joinDelta.isDefined) // sanity: used once is fine
    assert(chain(
      Some("v") -> "SELECT id FROM a",
      Some("w") -> "SELECT id FROM v",
      None -> "SELECT w.id FROM w JOIN v ON w.id = v.id")
      .asInstanceOf[Mode.SnapshotDiff].joinDelta
      .exists(j => j.rels == Vector("a", "a") && j.inlinedOut.isDefined))
    // both sides terminating at the SAME input: a self-join through a
    // pre-step — two scan sites of `a`, one telescoping term each
    assert(chain(
      Some("v") -> "SELECT id FROM a",
      None -> "SELECT v.id FROM v JOIN a AS x ON v.id = x.id")
      .asInstanceOf[Mode.SnapshotDiff].joinDelta ==
      Some(PlanClassifier.JoinDelta(Vector("a", "a"))))
  }

  test("distinct-delta resolves through stateless single-scan pre-steps") {
    def chain(qs: (Option[String], String)*): Mode =
      PlanClassifier.classify(spark,
        qs.toSeq.map { case (a, q) => (a, SqlRewriter.rewrite(q, st, None)) })
    assert(chain(
      Some("v") -> "SELECT event_time, upper(symbol) AS s FROM t WHERE price > 0",
      None -> "SELECT DISTINCT event_time, s FROM v")
      .asInstanceOf[Mode.SnapshotDiff].distinctDelta ==
      Some(PlanClassifier.DistinctDelta("t")))
    // DISTINCT in a pre-step (output not Distinct-topped) stays recompute
    assert(chain(
      Some("v") -> "SELECT DISTINCT symbol FROM t",
      None -> "SELECT symbol FROM v")
      .asInstanceOf[Mode.SnapshotDiff].distinctDelta.isEmpty)
  }

  test("DISTINCT above an inner join carries the join in its delta spec") {
    def dd(q: String) = classify(q).asInstanceOf[Mode.SnapshotDiff].distinctDelta
    assert(dd("SELECT DISTINCT a.id, b.v FROM a JOIN b ON a.id = b.id") ==
      Some(PlanClassifier.DistinctDelta("a",
        Some(PlanClassifier.JoinDelta(Vector("a", "b"))))))
    // outer join under the DISTINCT: not append-only-monotone — recompute
    assert(dd("SELECT DISTINCT a.id, b.v FROM a LEFT JOIN b ON a.id = b.id").isEmpty)
    // a self-join under the DISTINCT: per-site delta terms apply
    assert(dd("SELECT DISTINCT x.id FROM a x JOIN a y ON x.id = y.id") ==
      Some(PlanClassifier.DistinctDelta("a",
        Some(PlanClassifier.JoinDelta(Vector("a", "a"))))))
  }

  test("HAVING over a non-projected mergeable aggregate gets a hidden partial") {
    def am(q: String) = classify(q).asInstanceOf[Mode.SnapshotDiff].aggMerge
    val spec = am("SELECT symbol, sum(price) AS total FROM t " +
      "GROUP BY symbol HAVING count(*) > 2")
    assert(spec.isDefined)
    assert(spec.get.aggs.toMap == Map("total" -> "sum", "__hv_0" -> "count",
      "__nc_total" -> "count", PlanClassifier.RowCountCol -> "count"))
    assert(spec.get.havingSql.exists(_.contains("__hv_0")))
    // the same call appearing twice reuses one hidden partial
    val twice = am("SELECT symbol, sum(price) AS total FROM t " +
      "GROUP BY symbol HAVING count(*) > 2 AND count(*) < 100")
    assert(twice.exists(_.aggs.count(_._1.startsWith("__hv_")) == 1))
    // scalar functions over output columns are post-merge-evaluable
    assert(am("SELECT symbol, sum(price) AS total FROM t " +
      "GROUP BY symbol HAVING abs(total) > 5")
      .exists(s => !s.aggs.exists(_._1.startsWith("__hv_")) &&
        s.aggs.toMap.get("total").contains("sum")))
    // non-mergeable aggregates in HAVING keep the recompute path
    assert(am("SELECT symbol, sum(price) AS total FROM t " +
      "GROUP BY symbol HAVING stddev(price) > 1").isEmpty)
  }

  test("avg in HAVING decomposes to hidden sum+count division partials") {
    def am(q: String) = classify(q).asInstanceOf[Mode.SnapshotDiff].aggMerge
    val spec = am("SELECT symbol, sum(price) AS total FROM t " +
      "GROUP BY symbol HAVING avg(price) > 3")
    assert(spec.exists(_.hiddenAvgs == Seq("__hva_0")))
    // hidden sums get paired non-null counts + the row-count (invertible)
    assert(spec.exists(_.aggs.toMap == Map(
      "total" -> "sum", "__as___hva_0" -> "sum", "__ac___hva_0" -> "count",
      "__nc_total" -> "count", "__nc___as___hva_0" -> "count",
      PlanClassifier.RowCountCol -> "count")))
    assert(spec.get.havingSql.exists(h =>
      h.contains("__as___hva_0") && h.contains("__ac___hva_0")))
    // a repeated avg call shares one partial pair
    val twice = am("SELECT symbol, sum(price) AS total FROM t " +
      "GROUP BY symbol HAVING avg(price) > 3 AND avg(price) < 100")
    assert(twice.exists(s => s.hiddenAvgs.size == 1 &&
      s.aggs.count(_._1.startsWith("__as_")) == 1))
    // distinct avg calls each get their own pair
    val two = am("SELECT symbol, sum(price) AS total FROM t " +
      "GROUP BY symbol HAVING avg(price) > avg(volume)")
    assert(two.exists(s => s.hiddenAvgs == Seq("__hva_0", "__hva_1") &&
      s.aggs.count(_._1.startsWith("__as_")) == 2))
    // mixes with hidden non-avg partials without name collisions
    val mix = am("SELECT symbol, sum(price) AS total FROM t " +
      "GROUP BY symbol HAVING count(*) > 2 AND avg(price) > 3")
    assert(mix.exists(s => s.aggs.map(_._1).distinct.size == s.aggs.size &&
      s.hiddenAvgs.size == 1 &&
      s.aggs.count(_._1.startsWith("__hv_")) == 1))
  }

  test("a plain grouped aggregate carries a touched-group narrowing spec") {
    def tt(qs: (Option[String], String)*) =
      PlanClassifier.classify(spark,
        qs.toSeq.map { case (a, q) => (a, SqlRewriter.rewrite(q, st, None)) })
        .asInstanceOf[Mode.SnapshotDiff].rankTouch
    // non-mergeable aggregate: recompute is the only path — narrow it
    assert(tt(None -> "SELECT symbol, stddev(price) AS sd FROM t GROUP BY symbol")
      .contains(PlanClassifier.RankTouch("t", Seq("symbol"))))
    // mergeable shape carries it too (used after a retraction flip)
    assert(tt(None -> "SELECT symbol, sum(price) AS s FROM t GROUP BY symbol")
      .contains(PlanClassifier.RankTouch("t", Seq("symbol"))))
    // resolves through a stateless pre-step chain to the raw input
    assert(tt(
      Some("v") -> "SELECT event_time, symbol, price FROM t WHERE price > 0",
      None -> "SELECT symbol, stddev(price) AS sd FROM v GROUP BY symbol")
      .contains(PlanClassifier.RankTouch("t", Seq("symbol"))))
    // a renamed key is not the raw column — no narrowing
    assert(tt(None ->
      "SELECT symbol AS sym, sum(price) AS s FROM t GROUP BY symbol").isEmpty)
    // a computed key is not the raw column — no narrowing
    assert(tt(None ->
      "SELECT upper(symbol) AS u, sum(price) AS s FROM t GROUP BY upper(symbol)")
      .isEmpty)
    // a pre-step re-deriving the key column breaks the narrowing
    assert(tt(
      Some("v") -> "SELECT event_time, upper(symbol) AS symbol, price FROM t",
      None -> "SELECT symbol, stddev(price) AS sd FROM v GROUP BY symbol").isEmpty)
    // global aggregate: one group, nothing to narrow
    assert(tt(None -> "SELECT count(*) AS n, sum(price) AS s FROM t").isEmpty)
    // CTE bodies are unseeable by the chain algebra — no narrowing
    assert(tt(None -> ("WITH s AS (SELECT * FROM t) " +
      "SELECT symbol, stddev(price) AS sd FROM s GROUP BY symbol")).isEmpty)
    // a join below the aggregate: group rows draw from two inputs
    assert(tt(None -> ("SELECT a.symbol, stddev(b.price) AS sd FROM a " +
      "JOIN b ON a.symbol = b.symbol GROUP BY a.symbol")).isEmpty)
  }

  test("a plain LEFT JOIN of two direct relations carries a left-join-delta spec") {
    def lj(q: String) = classify(q).asInstanceOf[Mode.SnapshotDiff].leftJoinDelta
    val spec = lj("SELECT o.event_time, o.order_id, s.num_shipped " +
      "FROM orders o LEFT JOIN shipments s ON o.order_id = s.order_id")
    assert(spec.isDefined)
    assert(spec.get.left == "orders" && spec.get.leftAlias == "o")
    assert(spec.get.right == "shipments" && spec.get.rightAlias == "s")
    // unaliased sides use the relation name as the qualifier
    assert(lj("SELECT orders.order_id FROM orders LEFT JOIN shipments " +
      "ON orders.order_id = shipments.order_id")
      .exists(s => s.leftAlias == "orders" && s.rightAlias == "shipments"))
    // a WHERE above the join is re-applied by the delta passes — still valid
    assert(lj("SELECT o.order_id, s.num_shipped FROM orders o " +
      "LEFT JOIN shipments s ON o.order_id = s.order_id " +
      "WHERE o.quantity > 2").isDefined)
    // inner joins take the (cheaper) join-delta path, not this one
    assert(lj("SELECT o.order_id FROM orders o JOIN shipments s " +
      "ON o.order_id = s.order_id").isEmpty)
    // full outer: neither side's null-padding is tracked — recompute
    assert(lj("SELECT o.order_id FROM orders o FULL JOIN shipments s " +
      "ON o.order_id = s.order_id").isEmpty)
    // an inline-subquery side is not a pre-step chain — recompute (the
    // named-pre-step spelling of the same shape takes the derived path)
    assert(lj("SELECT o.order_id, s.n FROM orders o LEFT JOIN " +
      "(SELECT order_id, num_shipped AS n FROM shipments) s " +
      "ON o.order_id = s.order_id").isEmpty)
    // self left-join stays recompute
    assert(lj("SELECT a.order_id FROM orders a LEFT JOIN orders b " +
      "ON a.order_id = b.order_id").isEmpty)
  }

  test("a LEFT JOIN fed through stateless pre-step chains carries derivation specs") {
    def sd(qs: (Option[String], String)*): Mode.SnapshotDiff =
      PlanClassifier.classify(spark,
        qs.toSeq.map { case (a, q) => (a, SqlRewriter.rewrite(q, st, None)) })
        .asInstanceOf[Mode.SnapshotDiff]
    // left side derived (rename/compute/filter), right side direct
    val m = sd(
      Some("enriched") -> ("SELECT order_id, quantity * 10 AS value " +
        "FROM orders WHERE quantity > 1"),
      None -> ("SELECT e.order_id, e.value, s.num_shipped FROM enriched e " +
        "LEFT JOIN shipments s ON e.order_id = s.order_id"))
    assert(m.leftJoinDelta.exists(l => l.left == "orders" &&
      l.leftAlias == "e" && l.leftDerive.map(_._1) == Vector("enriched") &&
      l.right == "shipments" && l.rightDerive.isEmpty && l.derived))
    // both sides derived, multi-hop chain on the right (execution order)
    val m2 = sd(
      Some("e1") -> "SELECT order_id, quantity FROM orders WHERE quantity > 1",
      Some("s1") -> "SELECT order_id AS sid, num_shipped FROM shipments",
      Some("s2") -> "SELECT sid, num_shipped * 2 AS ns FROM s1",
      None -> "SELECT e1.order_id, s2.ns FROM e1 LEFT JOIN s2 ON e1.order_id = s2.sid")
    assert(m2.leftJoinDelta.exists(l =>
      l.leftDerive.map(_._1) == Vector("e1") &&
        l.rightDerive.map(_._1) == Vector("s1", "s2")))
    // a multi-scan pre-step (self union) is not a derivation chain
    val m3 = sd(
      Some("u") -> ("SELECT order_id FROM orders UNION ALL " +
        "SELECT order_id FROM orders"),
      None -> ("SELECT u.order_id, s.num_shipped FROM u " +
        "LEFT JOIN shipments s ON u.order_id = s.order_id"))
    assert(m3.leftJoinDelta.isEmpty)
    // derivations resolving both sides to the SAME input stay recompute
    // (the Δ/old framing needs two independent inputs)
    val m4 = sd(
      Some("a1") -> "SELECT order_id FROM orders",
      Some("b1") -> "SELECT order_id AS oid FROM orders",
      None -> "SELECT a1.order_id FROM a1 LEFT JOIN b1 ON a1.order_id = b1.oid")
    assert(m4.leftJoinDelta.isEmpty)
    // the aggregate-above-left-join partials path accepts derived sides
    // through the same plumbing
    val m5 = sd(
      Some("e") -> "SELECT order_id, quantity FROM orders",
      None -> ("SELECT e.order_id AS order_id, sum(s.num_shipped) AS t " +
        "FROM e LEFT JOIN shipments s ON e.order_id = s.order_id " +
        "GROUP BY e.order_id"))
    assert(m5.aggMerge.exists(_.leftJoin.exists(l =>
      l.leftDerive.map(_._1) == Vector("e") && l.rightDerive.isEmpty)))
    // left side = inner-join pre-step of two DISTINCT direct relations
    // (enrich-with-a-join): carries the rels + the join step as the
    // derive chain head
    val m6 = sd(
      Some("j") -> ("SELECT o.event_time AS event_time, o.order_id AS oid, " +
        "p.qty AS qty FROM orders o JOIN picks p ON o.order_id = p.order_id"),
      None -> ("SELECT j.event_time, j.oid, j.qty, s.num_shipped FROM j " +
        "LEFT JOIN shipments s ON j.oid = s.order_id"))
    assert(m6.leftJoinDelta.exists(l =>
      l.allLeftRels == Vector("orders", "picks") &&
        l.leftDerive.map(_._1) == Vector("j") && l.right == "shipments"))
    // a second left join inside the pre-step does not qualify
    val m7 = sd(
      Some("j") -> ("SELECT o.order_id AS oid, p.qty AS qty FROM orders o " +
        "LEFT JOIN picks p ON o.order_id = p.order_id"),
      None -> ("SELECT j.oid, s.num_shipped FROM j " +
        "LEFT JOIN shipments s ON j.oid = s.order_id"))
    assert(m7.leftJoinDelta.isEmpty)
    // a self-join pre-step breaks the per-relation frame binding
    val m8 = sd(
      Some("j") -> ("SELECT a.order_id AS oid FROM orders a " +
        "JOIN orders b ON a.order_id = b.order_id"),
      None -> ("SELECT j.oid, s.num_shipped FROM j " +
        "LEFT JOIN shipments s ON j.oid = s.order_id"))
    assert(m8.leftJoinDelta.isEmpty)
    // the same mixed tree under a mergeable aggregate rides the partials
    // path with the full spec (rels + edges + lineage)
    val m9 = sd(
      Some("j") -> ("SELECT o.event_time AS event_time, o.order_id AS oid, " +
        "o.quantity AS quantity FROM orders o JOIN picks p ON o.order_id = p.order_id"),
      None -> ("SELECT j.event_time AS event_time, s.num_shipped AS ship_sz, " +
        "sum(j.quantity) AS q FROM j LEFT JOIN shipments s ON j.oid = s.order_id " +
        "GROUP BY j.event_time, s.num_shipped"))
    assert(m9.aggMerge.exists(_.leftJoin.exists(l =>
      l.allLeftRels == Vector("orders", "picks") &&
        l.leftEdges == Vector(("orders", "order_id", "picks", "order_id")) &&
        l.leftColSources.get("oid") == Some(("orders", "order_id")))))
  }

  test("a mergeable aggregate above an inner join carries the join spec") {
    def sd(qs: (Option[String], String)*): Mode.SnapshotDiff =
      PlanClassifier.classify(spark,
        qs.toSeq.map { case (a, q) => (a, SqlRewriter.rewrite(q, st, None)) })
        .asInstanceOf[Mode.SnapshotDiff]
    val m = sd(None -> ("SELECT a.id AS id, sum(b.v) AS s, count(*) AS n " +
      "FROM a JOIN b ON a.id = b.id GROUP BY a.id"))
    assert(m.aggMerge.isDefined)
    assert(m.aggMerge.get.join == Some(PlanClassifier.JoinDelta(Vector("a", "b"))))
    assert(m.aggMerge.get.keys == Seq("id"))
    assert(m.aggMerge.get.aggs.toSet == Set("s" -> "sum", "n" -> "count"))
    // the aggregate tops the output step → group keys are the diff identity
    assert(m.keys == Some(Seq("id")))
    // join in a pre-step, aggregate at the output: same spec
    assert(sd(
      Some("j") -> "SELECT a.id AS id, b.v AS v FROM a JOIN b ON a.id = b.id",
      None -> "SELECT id, sum(v) AS s FROM j GROUP BY id")
      .aggMerge.exists(_.join == Some(PlanClassifier.JoinDelta(Vector("a", "b")))))
    // avg + HAVING above the join still qualifies
    val ah = sd(None -> ("SELECT a.id AS id, avg(b.v) AS av, sum(b.v) AS s " +
      "FROM a JOIN b ON a.id = b.id GROUP BY a.id HAVING s > 10"))
    assert(ah.aggMerge.exists(sp => sp.join.isDefined &&
      sp.avgs == Seq("av") && sp.havingSql.isDefined))
    // LEFT join below: carries the left-join spec with subtraction aux —
    // a hidden row count and a paired non-null count per sum
    val lj = sd(None -> ("SELECT a.id AS id, sum(b.v) AS s " +
      "FROM a LEFT JOIN b ON a.id = b.id GROUP BY a.id"))
    assert(lj.keys == Some(Seq("id")))
    assert(lj.aggMerge.exists(sp => sp.join.isEmpty && sp.leftJoin.isDefined))
    assert(lj.aggMerge.exists(_.sumNullCounts == Seq("s" -> "__nc_s")))
    assert(lj.aggMerge.exists(_.aggs.toMap
      .get(PlanClassifier.RowCountCol).contains("count")))
    // …but min/max above a LEFT join are not invertible — recompute
    assert(sd(None -> ("SELECT a.id AS id, max(b.v) AS m " +
      "FROM a LEFT JOIN b ON a.id = b.id GROUP BY a.id")).aggMerge.isEmpty)
    // expression over the aggregate: rides a hidden partial, still carries
    // the join spec
    assert(sd(None -> ("SELECT a.id AS id, sum(b.v) + 0 AS s " +
      "FROM a JOIN b ON a.id = b.id GROUP BY a.id")).aggMerge
      .exists(sp => sp.join.isDefined && sp.exprCols.map(_._1) == Seq("s")))
    // an input scanned outside the join chain breaks the use-once discipline
    assert(sd(
      Some("w") -> "SELECT id FROM a",
      None -> ("SELECT a.id AS id, sum(b.v) AS s " +
        "FROM a JOIN b ON a.id = b.id GROUP BY a.id")).aggMerge.isEmpty)
    // an aggregate FEEDING a join: multi-row output per group key — no
    // merge spec AND no keyed identity (multiset diff)
    val below = sd(
      Some("g") -> "SELECT id, sum(v) AS s FROM a GROUP BY id",
      None -> "SELECT g.id AS id, g.s AS s, b.v AS v FROM g JOIN b ON g.id = b.id")
    assert(below.aggMerge.isEmpty && below.keys.isEmpty)
  }

  test("a single DISTINCT carries a distinct-delta spec") {
    assert(classify("SELECT DISTINCT symbol, price FROM t")
      .asInstanceOf[Mode.SnapshotDiff].distinctDelta ==
      Some(PlanClassifier.DistinctDelta("t")))
    // stateless derivation below and ORDER BY above are fine
    assert(classify(
      "SELECT DISTINCT symbol, price % 10 AS p FROM t WHERE price > 3 ORDER BY symbol")
      .asInstanceOf[Mode.SnapshotDiff].distinctDelta ==
      Some(PlanClassifier.DistinctDelta("t")))
  }

  test("join-free DISTINCT carries an invertible refcount merge spec") {
    def am(q: String) = classify(q).asInstanceOf[Mode.SnapshotDiff].aggMerge
    val m = am("SELECT DISTINCT symbol, price FROM t")
    assert(m.exists(s => s.keys == Seq("symbol", "price") &&
      s.aggs == Seq(PlanClassifier.RowCountCol -> "count") &&
      s.invertible && s.partialsPlan.isDefined))
    // expressions and ORDER BY above are fine; aliases name the keys
    val e = am(
      "SELECT DISTINCT symbol, price % 10 AS p FROM t WHERE price > 3 ORDER BY symbol")
    assert(e.exists(_.keys == Seq("symbol", "p")))
    // DISTINCT over a join keeps the join-delta path, not the refcount merge
    assert(am("SELECT DISTINCT a.id, b.v FROM a JOIN b ON a.id = b.id").isEmpty)
    // star projections and CTE wrappers are excluded
    assert(am("SELECT DISTINCT * FROM t").isEmpty)
    assert(am(
      "WITH d AS (SELECT DISTINCT symbol FROM t) SELECT symbol FROM d").isEmpty)
  }

  test("distinct set-ops and UNION carry refcount merge specs") {
    def am(q: String) = classify(q).asInstanceOf[Mode.SnapshotDiff].aggMerge
    val ix = am("SELECT symbol FROM a INTERSECT SELECT symbol FROM b")
    assert(ix.exists(s => s.keys == Seq("symbol") && s.invertible &&
      s.havingSql.contains("__sl > 0 AND __sr > 0")))
    val ex = am("SELECT symbol FROM a EXCEPT SELECT symbol FROM b")
    assert(ex.exists(_.havingSql.contains("__sl > 0 AND __sr = 0")))
    // ALL variants carry a multiplicity expression instead of a
    // visibility filter — the executor diffs per-value multiplicities
    val ia = am("SELECT symbol FROM a INTERSECT ALL SELECT symbol FROM b")
    assert(ia.exists(s => s.invertible && s.havingSql.isEmpty &&
      s.multiplicitySql.contains("least(__sl, __sr)")))
    val ea = am("SELECT symbol FROM a EXCEPT ALL SELECT symbol FROM b")
    assert(ea.exists(_.multiplicitySql.contains("greatest(__sl - __sr, 0)")))
    // UNION (distinct) parses as Distinct(Union): plain refcount, left names
    val un = am("SELECT symbol FROM a UNION SELECT sym FROM b")
    assert(un.exists(s => s.keys == Seq("symbol") && s.invertible &&
      s.havingSql.isEmpty &&
      s.aggs == Seq(PlanClassifier.RowCountCol -> "count")))
    // a second DISTINCT below the top is a support-preserving no-op —
    // stripped from the refcount partials (round-7 envelope widening), so
    // the merge spec carries and stays invertible
    val nested = am("SELECT DISTINCT x FROM (SELECT DISTINCT symbol AS x FROM t) v")
    assert(nested.exists(s => s.keys == Seq("x") && s.invertible))
    // but a DISTINCT hiding in a PRE-STEP cannot be stripped — recompute
    def amChain(qs: (Option[String], String)*) =
      PlanClassifier.classify(spark,
        qs.toSeq.map { case (a, q) => (a, SqlRewriter.rewrite(q, st, None)) })
        .asInstanceOf[Mode.SnapshotDiff].aggMerge
    assert(amChain(
      Some("v") -> "SELECT DISTINCT symbol AS x FROM t",
      None -> "SELECT DISTINCT x FROM v").isEmpty)
    // LIMIT below the DISTINCT is not linear — withheld
    assert(am("SELECT DISTINCT x FROM (SELECT symbol AS x FROM t LIMIT 5) v").isEmpty)
  }

  test("set-op trees with a second DISTINCT fold into one multiplicity merge") {
    def am(q: String) = classify(q).asInstanceOf[Mode.SnapshotDiff].aggMerge
    // the standing weak shape: DISTINCT over an ALL-variant set-op —
    // NOT the same set as EXCEPT (l=3,r=1 keeps the value; EXCEPT drops
    // it), so it needs its own composed multiplicity, not the havingSql
    val d = am("SELECT DISTINCT * FROM " +
      "(SELECT symbol FROM a EXCEPT ALL SELECT symbol FROM b) v")
    assert(d.exists(s => s.keys == Seq("symbol") && s.invertible &&
      s.aggs.map(_._1) == Seq("__s0", "__s1", PlanClassifier.RowCountCol) &&
      s.multiplicitySql.contains(
        "(CASE WHEN (greatest((__s0) - (__s1), 0)) > 0 THEN 1 ELSE 0 END)")))
    // a named identity pass-through works like `*`
    assert(am("SELECT DISTINCT symbol FROM " +
      "(SELECT symbol FROM a EXCEPT ALL SELECT symbol FROM b) v").isDefined)
    // 3-leaf left-associative chain: (a ∪all b) −all c
    val c3 = am("SELECT symbol FROM a UNION ALL SELECT symbol FROM b " +
      "EXCEPT ALL SELECT symbol FROM c")
    assert(c3.exists(s => s.aggs.map(_._1).take(3) == Seq("__s0", "__s1", "__s2") &&
      s.multiplicitySql.contains(
        "greatest(((__s0) + (__s1)) - (__s2), 0)")))
    // DISTINCT variants mid-chain compose as 0/1 multiplicities
    val mid = am("SELECT symbol FROM a INTERSECT SELECT symbol FROM b " +
      "UNION ALL SELECT symbol FROM c")
    assert(mid.exists(s => s.multiplicitySql.exists(m =>
      m.contains("CASE WHEN (__s0) > 0 AND (__s1) > 0") && m.contains("(__s2)"))))
    // a pass-through that RE-KEYS the value (drops a column) cannot fold
    assert(am("SELECT DISTINCT symbol FROM (SELECT symbol, price FROM a " +
      "EXCEPT ALL SELECT symbol, price FROM b) v").isEmpty)
    // LIMIT anywhere keeps recompute
    assert(am("SELECT DISTINCT * FROM (SELECT symbol FROM a EXCEPT ALL " +
      "SELECT symbol FROM b LIMIT 5) v").isEmpty)
    // set-ops hiding in PRE-STEPS (round 9): single-use pre-steps are
    // inlined into the output plan before the tree walk, so the chain
    // folds into the same composed multiplicity merge
    def amChain(qs: (Option[String], String)*) =
      PlanClassifier.classify(spark,
        qs.toSeq.map { case (a, q) => (a, SqlRewriter.rewrite(q, st, None)) })
        .asInstanceOf[Mode.SnapshotDiff].aggMerge
    val pre = amChain(
      Some("v") -> "SELECT symbol FROM a EXCEPT ALL SELECT symbol FROM b",
      None -> "SELECT DISTINCT symbol FROM v")
    assert(pre.exists(s => s.keys == Seq("symbol") && s.invertible &&
      s.multiplicitySql.contains(
        "(CASE WHEN (greatest((__s0) - (__s1), 0)) > 0 THEN 1 ELSE 0 END)")))
    // nested: a set-op pre-step consumed through another pre-step
    val nestedPre = amChain(
      Some("u") -> "SELECT symbol FROM a UNION ALL SELECT symbol FROM b",
      Some("v") -> "SELECT symbol FROM u EXCEPT ALL SELECT symbol FROM c",
      None -> "SELECT DISTINCT symbol FROM v")
    assert(nestedPre.exists(_.multiplicitySql.contains(
      "(CASE WHEN (greatest(((__s0) + (__s1)) - (__s2), 0)) > 0 " +
        "THEN 1 ELSE 0 END)")))
    // a STATELESS pre-step may feed several leaves (each inline copy is
    // its own side count, as the shared view was)
    assert(amChain(
      Some("w") -> "SELECT symbol FROM a WHERE price > 0",
      None -> ("SELECT symbol FROM w EXCEPT ALL " +
        "SELECT symbol FROM w WHERE symbol = 'x'")).isDefined)
    // a UNION-ALL pre-step scanned at both sides of one output EXCEPT is
    // the TWO-SIDE extractor's shape (leaves over the pre-step view) —
    // still served, by extractSetOpMerge
    assert(amChain(
      Some("v") -> "SELECT symbol FROM a UNION ALL SELECT symbol FROM b",
      None -> "SELECT symbol FROM v EXCEPT SELECT symbol FROM v")
      .exists(_.havingSql.contains("__sl > 0 AND __sr = 0")))
    // a SET-NODE-BEARING (EXCEPT) pre-step scanned twice breaks the
    // consumed-count accounting — recompute (the two-side extractor also
    // rejects it: two EXCEPT nodes)
    assert(amChain(
      Some("v") -> "SELECT symbol FROM a EXCEPT ALL SELECT symbol FROM b",
      None -> "SELECT symbol FROM v EXCEPT SELECT symbol FROM v").isEmpty)
    // a filter ABOVE the pre-step's EXCEPT is not a foldable tree node —
    // recompute, not a wrong fold (a filter above a pure UNION pre-step
    // is linear and stays served by extractDistinctMerge's refcount)
    assert(amChain(
      Some("v") -> ("SELECT symbol FROM (SELECT symbol FROM a EXCEPT ALL " +
        "SELECT symbol FROM b) t WHERE symbol IS NOT NULL"),
      None -> "SELECT DISTINCT symbol FROM v").isEmpty)
    // DISTINCT-over-a-union-ALL-pre-step stays served (distinct-merge's
    // refcount over the linear pre-step view)
    assert(amChain(
      Some("u") -> "SELECT symbol FROM a UNION ALL SELECT symbol FROM b",
      None -> "SELECT DISTINCT symbol FROM u").isDefined)
    // a UNION (distinct) hiding INSIDE a pre-step under a plain
    // passthrough output is only reachable through the tree fold
    assert(amChain(
      Some("u") -> "SELECT symbol FROM a UNION SELECT symbol FROM b",
      None -> "SELECT symbol FROM u")
      .exists(_.multiplicitySql.contains(
        "(CASE WHEN ((__s0) + (__s1)) > 0 THEN 1 ELSE 0 END)")))
  }

  test("reused pre-step aliases carry an inlined join-delta spec") {
    def jd(qs: (Option[String], String)*) =
      PlanClassifier.classify(spark,
        qs.toSeq.map { case (a, q) => (a, SqlRewriter.rewrite(q, st, None)) })
        .asInstanceOf[Mode.SnapshotDiff].joinDelta
    // a join-free view consumed at two sites ≡ a self-join of its input
    // through inlined copies — delta path, not recompute
    val reuse = jd(
      Some("v") -> "SELECT event_time, id, q FROM t WHERE q > 0",
      None -> ("SELECT x.event_time AS event_time, x.id AS id, " +
        "x.q AS q1, y.q AS q2 FROM v x JOIN v y ON x.id = y.id"))
    assert(reuse.exists(j => j.rels == Vector("t", "t") && j.inlinedOut.isDefined))
    // use-once chains keep the named-view path (no inlined plan)
    val once = jd(
      Some("v") -> "SELECT event_time, id, q FROM t WHERE q > 0",
      None -> ("SELECT v.event_time AS event_time, v.id AS id, v.q AS q, " +
        "u.id AS id2 FROM v JOIN u ON v.id = u.id"))
    assert(once.exists(j => j.rels.sorted == Vector("t", "u") && j.inlinedOut.isEmpty))
    // a reused step CONTAINING a join multiplies its joins per expansion
    // site; the per-site join balance (round 8) accounts for them, so the
    // chain telescopes over FOUR leaf positions — (a, b) per copy
    val joinStep = jd(
      Some("v") -> "SELECT a.id AS id FROM a JOIN b ON a.id = b.id",
      None -> "SELECT x.id AS id, y.id AS id2 FROM v x JOIN v y ON x.id = y.id")
    assert(joinStep.exists(j =>
      j.rels == Vector("a", "b", "a", "b") && j.inlinedOut.isDefined))
    // nested reuse: a join-bearing step consumed through ANOTHER reused
    // step expands transitively — six leaves, joins balanced per site
    val nested = jd(
      Some("v") -> "SELECT a.id AS id FROM a JOIN b ON a.id = b.id",
      Some("w") -> "SELECT v.id AS id, c.id AS cid FROM v JOIN c ON v.id = c.id",
      None -> "SELECT x.id AS id, y.cid AS cid2 FROM w x JOIN w y ON x.id = y.id")
    assert(nested.exists(j =>
      j.rels == Vector("a", "b", "c", "a", "b", "c") && j.inlinedOut.isDefined))
    // an OUTER join inside a reused step still poisons the tree
    val outerStep = jd(
      Some("v") -> "SELECT a.id AS id FROM a LEFT JOIN b ON a.id = b.id",
      None -> "SELECT x.id AS id, y.id AS id2 FROM v x JOIN v y ON x.id = y.id")
    assert(outerStep.isEmpty)
  }

  test("unaliased DISTINCT/set-op expressions fall back to recompute, not error") {
    // an unaliased expression parses as UnresolvedAlias whose .name throws
    // (a SparkException in Spark 4.1) — classification must not call it
    // (round-6 ADVICE #2); the shape stays a valid recompute changelog
    def am(q: String) = classify(q).asInstanceOf[Mode.SnapshotDiff].aggMerge
    assert(am("SELECT DISTINCT upper(symbol) FROM t").isEmpty)
    // names resolve from the FIRST branch; a later branch's unaliased
    // exprs are fine (positional union resolution)
    assert(am(
      "SELECT symbol FROM a UNION SELECT upper(symbol) FROM b").exists(
      _.keys == Seq("symbol")))
    assert(am(
      "SELECT upper(symbol) FROM a INTERSECT SELECT symbol FROM b").isEmpty)
    assert(am(
      "SELECT symbol FROM a EXCEPT SELECT upper(symbol) FROM b").exists(
      _.keys == Seq("symbol")),
      "right-branch unaliased exprs are unwrapped, left names drive the spec")
  }

  test("distinct-delta spec is withheld for non-append-only shapes") {
    def dd(q: String) = classify(q).asInstanceOf[Mode.SnapshotDiff].distinctDelta
    // LIMIT above: emitted rows can be displaced later
    assert(dd("SELECT DISTINCT symbol FROM t LIMIT 5").isEmpty)
    // UNION parses as Distinct(Union): two scans, excluded by scan count
    assert(dd("SELECT symbol FROM a UNION SELECT symbol FROM b").isEmpty)
    // DISTINCT above an INNER join rides the join's delta decomposition
    // (not the slice-local path) — see the distinct-over-join test
    assert(dd("SELECT DISTINCT a.symbol FROM a JOIN b ON a.id = b.id")
      .exists(_.join.isDefined))
    // CTE bodies are never classified through
    assert(dd("WITH v AS (SELECT DISTINCT symbol FROM t) SELECT symbol FROM v").isEmpty)
  }

  test("tumble + non-windowed aggregation in one chain is rejected") {
    intercept[InvalidQueryException] {
      classify(
        """SELECT TUMBLE_START(event_time, INTERVAL '1' DAY) as event_time,
          |  max(price) as mx FROM t
          |GROUP BY TUMBLE(event_time, INTERVAL '1' DAY)""".stripMargin,
        "SELECT count(*) AS n FROM other")
    }
  }

  test("calendar-interval join bounds are rejected, not mis-subtracted") {
    intercept[InvalidQueryException] {
      classify(
        """SELECT o.event_time FROM o JOIN s ON o.id = s.id
          |AND s.event_time BETWEEN o.event_time
          |  AND o.event_time + INTERVAL '1' MONTH""".stripMargin)
    }
  }

  val asOfSql: String =
    """SELECT t.event_time, t.symbol, owned.volume * t.price as value
      |FROM tickers as t
      |JOIN stocks_owned FOR SYSTEM_TIME AS OF t.event_time AS owned
      |  ON t.symbol = owned.symbol""".stripMargin

  test("as-of alone is AsOfJoin; as-of feeding a tumble is AsOfWindowed") {
    assert(classify(asOfSql) == Mode.AsOfJoin)
    assert(classify(
      asOfSql,
      """SELECT TUMBLE_START(event_time, INTERVAL '1' DAY) as event_time,
        |  symbol, sum(value) as daily_value
        |FROM enriched
        |GROUP BY TUMBLE(event_time, INTERVAL '1' DAY), symbol""".stripMargin)
      == Mode.AsOfWindowed)
  }

  test("as-of composed with ranking or plain aggregation stays rejected") {
    intercept[InvalidQueryException] {
      classify(asOfSql, "SELECT count(*) AS n FROM enriched")
    }
    intercept[InvalidQueryException] {
      classify(asOfSql,
        """SELECT value FROM (SELECT value,
          |  row_number() OVER (ORDER BY value DESC) AS rn
          |FROM enriched) WHERE rn <= 2""".stripMargin)
    }
  }
}
