package graft.engine

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.{FunctionRegistry, UnresolvedAlias, UnresolvedAttribute, UnresolvedFunction, UnresolvedHaving, UnresolvedRelation, UnresolvedStar}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.types.{CalendarIntervalType, DayTimeIntervalType, YearMonthIntervalType}
import org.apache.spark.unsafe.types.CalendarInterval

/** A query shape the engine cannot execute with correct incremental
  * semantics. Mapped to `TransformResponse.InvalidQuery` — the engine
  * refuses rather than guessing (reference behavior: Flink's planner
  * rejects unsupported streaming plans at submission).
  */
final class InvalidQueryException(msg: String) extends RuntimeException(msg)

/** Classifies a transform step chain into an execution mode from the PARSED
  * (unresolved) Catalyst plans of its steps — not from regexes over SQL text.
  *
  * Why plan-based: an interval join written `s.t >= o.t AND s.t <= o.t +
  * INTERVAL '2' DAY` and one written with `BETWEEN` are the same plan shape;
  * a `row_number()` used for per-key dedup and one used for global Top-N
  * differ only in their OVER clause, which the plan exposes structurally.
  * Text regexes (the round-1 design) silently misrouted both.
  *
  * Modes:
  *   - [[Mode.Stateless]]     — pure map/filter/union: emit per slice.
  *   - [[Mode.Windowed]]      — tumbling agg and/or interval join: buffer
  *                              inputs, gate emission on the watermark.
  *   - [[Mode.AsOfJoin]]      — temporal/as-of join with probe hold-back.
  *   - [[Mode.SnapshotDiff]]  — any other deterministic updating query
  *                              (non-windowed GROUP BY, Top-N / dedup via
  *                              ranking functions, DISTINCT, regular joins):
  *                              recompute over full buffered history and
  *                              diff against the previous snapshot, emitting
  *                              +I/-D/-U/+U changelog rows. `keys` is the
  *                              row identity to pair old/new rows on; None
  *                              means full-row multiset diff (append/retract
  *                              only).
  *
  * Incompatible compositions (e.g. as-of + tumble, two different window
  * durations) raise [[InvalidQueryException]] instead of guessing.
  */
object PlanClassifier {

  sealed trait Mode
  object Mode {
    case object Stateless extends Mode
    /** upperMillis: largest interval-join upper bound in the chain (0 when
      * the chain is tumble-only); subtracted from the reported watermark. */
    final case class Windowed(upperMillis: Long) extends Mode
    case object AsOfJoin extends Mode
    /** As-of join feeding a tumbling-window aggregation in one chain: the
      * join stage runs with probe hold-back as in [[AsOfJoin]], its output
      * is buffered, and the window stage gates on the joined stream's
      * watermark as in [[Windowed]]. */
    case object AsOfWindowed extends Mode
    final case class SnapshotDiff(
        keys: Option[Seq[String]],
        aggMerge: Option[AggMergeSpec] = None,
        rankTouch: Option[RankTouch] = None,
        joinDelta: Option[JoinDelta] = None,
        distinctDelta: Option[DistinctDelta] = None,
        leftJoinDelta: Option[LeftJoinDelta] = None) extends Mode
  }

  /** Proof that a SnapshotDiff ranking chain (Top-N / dedup-latest) can be
    * recomputed over only the partitions the new slice touches: a single
    * step ranking a single input relation, with the OVER partition columns
    * passing through from the input un-redefined. The executor then narrows
    * the input view AND the previous snapshot to the slice's partition-key
    * values — per-run cost follows the touched partitions, not full history.
    */
  final case class RankTouch(input: String, cols: Seq[String])

  /** Proof that a SnapshotDiff chain is a tree of INNER joins over n ≥ 2
    * distinct input relations (each scanned exactly once) with stateless
    * derivations between. An inner-join tree is multilinear in each input
    * multiset, so its delta decomposes into one term per input —
    *
    *   Δ(A₁⋈…⋈Aₙ) = ⋃ᵢ A₁ᵒˡᵈ ⋈ … ⋈ Aᵢ₋₁ᵒˡᵈ ⋈ ΔAᵢ ⋈ Aᵢ₊₁ᶠᵘˡˡ ⋈ … ⋈ Aₙᶠᵘˡˡ
    *
    * — and while no input has ever carried a retraction the executor emits
    * just those terms as appends: O(Δ ⋈ state) per run with NO snapshot
    * read and no full-history re-join, instead of
    * recompute-plus-multiset-diff over everything. Outer/semi/anti joins
    * are excluded (a later match retracts earlier null-padded or anti rows
    * — not append-only).
    *
    * @param rels the tree's input relations in leaf order — the term
    *   decomposition is taken in this order (any fixed order is exact)
    */
  /** @param rels terminal input relations, one per scan SITE of the
    *   expanded tree (a name may repeat: self-join, or a reused pre-step)
    * @param inlinedOut set when a pre-step alias is consumed at more than
    *   one site: the output plan with every step alias inlined in place
    *   (SubqueryAlias-wrapped), so the executor's occurrence-site binding
    *   can give each consumption its OWN frame — name-keyed temp views
    *   cannot express two sites of one alias reading different frames
    *   within one delta pass */
  final case class JoinDelta(
      rels: Vector[String],
      inlinedOut: Option[LogicalPlan] = None)

  /** Proof that a SnapshotDiff chain is a single LEFT OUTER join of two
    * direct input relations in one step. Unlike an inner join, a left join
    * is NOT monotone over appends: a right-side row arriving for a
    * previously-unmatched left row retracts that row's null-padded output.
    * The executor therefore keeps the set of left-row offsets that have
    * ever matched, and per run emits
    *
    *   ΔA ⟕ B_full                                    as appends,
    *   (A_old ⋉ ΔB) ⟕ ΔB                              as appends (pairs only
    *                                                   — every row matches),
    *   chain((A_old ∖ matched) ⋉ ΔB, ∅)               as retractions (the
    *                                                   null-padded rows),
    *
    * O(slice ⋈ state) per run instead of recompute + full multiset diff.
    * Each join side either is a direct (optionally aliased) relation or —
    * since round 9 — resolves through a chain of stateless single-scan
    * pre-steps to one ([[StepChains.derivationChain]]): a stateless step
    * is row-local, so deriving each raw frame (Δ, old, full) through its
    * side's chain and joining the DERIVED frames is the same
    * decomposition. The matched-state semi/anti joins then run over the
    * derived frames; when the LEFT side is derived (its offset column may
    * be projected away) the matched state keys on whole derived rows
    * instead of offsets, which is sound because value-identical derived
    * rows always transition matched→unmatched together. The join may sit
    * in a pre-step consumed by stateless later steps under
    * [[StepChains]]'s use-once discipline.
    *
    * @param conditionSql the ON predicate as SQL, referencing
    *   `leftAlias`/`rightAlias`
    * @param leftDerive ordered (stepAlias, sql) pre-step chain deriving
    *   the left side from `left`; empty when the side is direct
    * @param rightDerive same for the right side
    */
  final case class LeftJoinDelta(
      left: String,
      leftAlias: String,
      right: String,
      rightAlias: String,
      conditionSql: String,
      leftDerive: Vector[(String, String)] = Vector.empty,
      rightDerive: Vector[(String, String)] = Vector.empty,
      leftRels: Vector[String] = Vector.empty,
      leftEdges: Vector[(String, String, String, String)] = Vector.empty,
      leftColSources: Map[String, (String, String)] = Map.empty) {
    /** Every terminal input relation of the left side: `leftRels` when the
      * side's deepest pre-step is an inner-join of several relations
      * (round 9, second widening), else just `left`.
      *
      * `leftEdges` carries that step's equi conjuncts as
      * (relA, colA, relB, colB) raw-column edges and `leftColSources` the
      * best-effort passthrough lineage from the side's OUTPUT columns
      * (lowercased) down to (relation, raw column) — both feed the
      * executor's per-relation key-range narrowing of the telescoping
      * terms (type checks happen there, against the raw schemas).
      */
    def allLeftRels: Vector[String] =
      if (leftRels.isEmpty) Vector(left) else leftRels
    def derived: Boolean = leftDerive.nonEmpty || rightDerive.nonEmpty
  }

  /** Proof that a SnapshotDiff chain is one DISTINCT over a stateless
    * derivation of a single input relation — or, when `join` is set, over
    * the chain's single inner join. DISTINCT is monotone over appends —
    * rows never leave the set — and so is an inner join, so while no
    * retraction has been observed the executor distincts ONLY the delta
    * (the new slice, or the join's delta terms) and anti-joins the
    * persisted snapshot: O(slice ⋈ state) per run instead of a
    * full-history aggregate plus full snapshot diff. First retraction
    * flips to the recompute path (a retraction can delete the last
    * occurrence of a distinct row).
    *
    * @param input the single input relation; `join.get.rels.head` when
    *   `join` is set (the executor reads all relations from the join spec)
    */
  final case class DistinctDelta(input: String, join: Option[JoinDelta] = None)

  /** Proof that a SnapshotDiff chain's output step is a single aggregation
    * whose functions are decomposable — each output column is either a group
    * key, an aliased sum/count/min/max, or an aliased avg (decomposed into
    * sum+count partials). Lets the executor aggregate just the new slice and
    * merge per-key partials into the persisted state (O(slice + touched
    * keys) per run) instead of recomputing over full buffered history.
    *
    * @param aggs output column name → merge kind (sum/count/min/max);
    *   includes hidden `__hv_<i>` partials for mergeable aggregates that
    *   appear only in the HAVING clause
    * @param avgs output columns computed as `avg(x)` — maintained as hidden
    *   `__as_<n>`/`__ac_<n>` sum+count partials and divided post-merge
    * @param havingSql the HAVING predicate rewritten over output columns
    *   and hidden partials, applied post-merge as the visible filter
    *   (state keeps sub-threshold groups)
    * @param partialsPlan the output step's parsed plan with HAVING/ORDER
    *   dropped and avg split into its partials — present iff avgs or
    *   havingSql is; the executor runs it in place of the output step
    * @param join when the aggregate sits above the chain's single inner
    *   join ([[JoinDelta]] conditions), this run's delta partials come from
    *   the join decomposition — `agg(ΔA⋈B_full) ⊕ agg(A_old⋈ΔB)` — merged
    *   into state by the same algebra; decomposable partials are
    *   associative, so aggregating each delta term separately is exact
    */
  final case class AggMergeSpec(
      keys: Seq[String],
      aggs: Seq[(String, String)],
      avgs: Seq[String] = Nil,
      havingSql: Option[String] = None,
      partialsPlan: Option[LogicalPlan] = None,
      join: Option[JoinDelta] = None,
      /** `__hva_<i>` bases for avg calls appearing only in HAVING: the
        * predicate references `__as_<base> / __ac_<base>` partials carried
        * in [[aggs]]. Division is value-identical to avg only when it is
        * double division, so the executor checks the analyzed sum-partial
        * types and routes decimal inputs to the recompute path.
        */
      hiddenAvgs: Seq[String] = Nil,
      /** When the aggregate sits above the chain's single LEFT OUTER join
        * ([[LeftJoinDelta]] conditions): delta partials come from the left
        * join's append terms MINUS its retraction terms (the null-padded
        * rows replaced by real pairs), negated through the sum/count
        * algebra. Requires every aggregate invertible (sum/count/avg) and
        * carries a hidden [[RowCountCol]] count(*) partial so groups whose
        * last row was retracted drop from the visible snapshot and state.
        */
      leftJoin: Option[LeftJoinDelta] = None,
      /** sum column → its paired hidden non-null count column (left path
        * only): a sum whose every contribution was subtracted away must
        * read NULL (SQL's sum over no rows), not the numeric 0 the
        * subtraction leaves behind.
        */
      sumNullCounts: Seq[(String, String)] = Nil,
      /** Output columns that are EXPRESSIONS over mergeable aggregate calls
        * and/or group keys — `sum(a)/sum(b) AS ratio`, `cast(count(*) AS
        * INT) AS n` — rewritten so every aggregate CALL references a hidden
        * partial (`__hv_<i>`, or `__as_/__ac_` division for avg) carried in
        * [[aggs]]. `(name, post-merge SQL)` in select-list order; the
        * executor evaluates each over the merged frame and casts to the
        * original analyzed column type. Exact because the partials fully
        * determine every aggregate value and the surrounding expression is
        * evaluated over operands of identical types to the recompute path.
        */
      exprCols: Seq[(String, String)] = Nil,
      /** True for join-free chains whose every aggregate (visible and
        * hidden) is invertible — sum/count/avg, no min/max. Such a spec
        * carries the same hidden [[RowCountCol]] + per-sum non-null-count
        * partials as the left-join path, so the executor can stay on the
        * merge path when an INPUT retraction arrives: the retracted rows'
        * partials are aggregated separately and subtracted through the
        * merge algebra (exactly Flink's accumulator `retract()` contract),
        * instead of flipping to the O(history) net-and-recompute path
        * forever. min/max chains keep the flip — they are not invertible.
        */
      invertible: Boolean = false,
      /** ALL-variant set ops (INTERSECT ALL / EXCEPT ALL): the output is a
        * MULTISET — each value appears `k` times where k is this SQL
        * expression over the hidden per-side counts (`least(__sl, __sr)` /
        * `greatest(__sl - __sr, 0)`). The executor then replaces the keyed
        * snapshot diff with a per-value multiplicity diff: Δk > 0 emits Δk
        * appends, Δk < 0 emits |Δk| retracts. State stays the same
        * invertible per-side refcount partials as the distinct variants.
        */
      multiplicitySql: Option[String] = None)

  /** Hidden count(*) partial maintained on [[AggMergeSpec.leftJoin]] and
    * [[AggMergeSpec.invertible]] chains: a group is alive iff its merged
    * row count is positive. */
  val RowCountCol: String = "__rc"

  /** Facts accumulated over every parsed step of the chain.
    * @param calendarTumble chain has a calendar (month/quarter/year) tumble
    *   spec from the rewriter — those windows group by `date_trunc`, not
    *   `window()`, so date_trunc-grouped aggregates must count as tumbles.
    */
  private final class Facts(val calendarTumble: Boolean) {
    var intervalUppers: List[Long] = Nil
    var regularJoins: Int = 0
    /** (rank alias if directly aliased, partition key names if all simple). */
    var rankSpecs: List[(Option[String], Option[Seq[String]])] = Nil
    var otherWindowFns: Boolean = false
    var tumbleAggs: Int = 0
    /** Group keys as output column names; None when not mappable. */
    var plainAggs: List[Option[Seq[String]]] = Nil
    var distincts: Int = 0
    var limitOrSetOp: Boolean = false
    def distinctOrLimit: Boolean = distincts > 0 || limitOrSetOp
    var filterAttrs: Set[String] = Set.empty
    /** Chain carries an expression subquery (IN/EXISTS/scalar) — its value
      * can change as OTHER inputs grow, so per-slice contributions are not
      * stationary and incremental fast paths must not run. */
    var hasSubquery: Boolean = false

    def snapshotFacts: Boolean =
      rankSpecs.nonEmpty || plainAggs.nonEmpty || regularJoins > 0 ||
        otherWindowFns || distinctOrLimit
  }

  private def invalid(msg: String): Nothing = throw new InvalidQueryException(msg)

  private val rankFns = Set("row_number", "rank", "dense_rank")

  private def isAggregateFn(name: String): Boolean =
    FunctionRegistry.builtin
      .lookupFunction(FunctionIdentifier(name.toLowerCase))
      .exists(info => info.getGroup == "agg_funcs")

  /** Millis of a day-time interval literal; calendar units are rejected
    * (a month-sized join bound has no fixed duration to subtract from the
    * watermark).
    */
  private def intervalMillis(l: Literal): Option[Long] = l.dataType match {
    case _: DayTimeIntervalType =>
      Some(math.abs(l.value.asInstanceOf[Long]) / 1000L)
    case _: YearMonthIntervalType =>
      invalid("calendar (month/year) intervals are not supported in join time bounds")
    case CalendarIntervalType =>
      val ci = l.value.asInstanceOf[CalendarInterval]
      if (ci.months != 0)
        invalid("calendar (month/year) intervals are not supported in join time bounds")
      Some(math.abs(ci.days * 86400000L + ci.microseconds / 1000L))
    case _ => None
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other     => Seq(other)
  }

  /** A join conjunct bounds time iff it is a comparison (or BETWEEN) that
    * carries a day-time interval literal — `s.t <= o.t + INTERVAL '2' DAY`
    * in any spelling or operand order.
    */
  private def timeBoundUpper(conjunct: Expression): Option[Long] = {
    val isComparison = conjunct match {
      case _: BinaryComparison => true
      case f: UnresolvedFunction if f.nameParts.last.equalsIgnoreCase("between") => true
      case _ => false
    }
    if (!isComparison) None
    else {
      val ms = conjunct.collect { case l: Literal => intervalMillis(l) }.flatten
      if (ms.isEmpty) None else Some(ms.max)
    }
  }

  private def attrName(e: Expression): Option[String] = e match {
    case a: UnresolvedAttribute => Some(a.nameParts.last)
    case _                      => None
  }

  private def collectFacts(plan: LogicalPlan, f: Facts): Unit = {
    plan.foreach {
      case j: Join =>
        val uppers = j.condition.toSeq
          .flatMap(splitConjuncts(_).flatMap(timeBoundUpper))
        if (uppers.nonEmpty) f.intervalUppers ::= uppers.max
        else f.regularJoins += 1

      case a: Aggregate =>
        val hasWindowGrouping = a.groupingExpressions.exists(_.exists {
          case fn: UnresolvedFunction =>
            fn.nameParts.last.equalsIgnoreCase("window") ||
              (f.calendarTumble &&
                fn.nameParts.last.equalsIgnoreCase("date_trunc"))
          case _ => false
        })
        if (hasWindowGrouping) f.tumbleAggs += 1
        else f.plainAggs ::= mapGroupKeys(a)
        scanForWindowFns(a.aggregateExpressions, f)

      case p: Project =>
        if (p.projectList.exists(containsAggFn)) f.plainAggs ::= Some(Nil)
        scanForWindowFns(p.projectList, f)

      case flt: Filter =>
        f.filterAttrs ++= flt.condition.collect {
          case a: UnresolvedAttribute => a.nameParts.last
        }
        if (containsAggFn(flt.condition)) f.plainAggs ::= Some(Nil)

      case h: UnresolvedHaving =>
        f.filterAttrs ++= h.havingCondition.collect {
          case a: UnresolvedAttribute => a.nameParts.last
        }

      case _: Distinct                    => f.distincts += 1
      case _: GlobalLimit | _: LocalLimit => f.limitOrSetOp = true
      // set difference/intersection carry set semantics over full history —
      // updating queries, not per-slice maps
      case _: Except | _: Intersect       => f.limitOrSetOp = true
      // CTE definitions are NOT TreeNode children of UnresolvedWith — a
      // stateful construct inside `WITH x AS (...)` must still be seen
      case w: UnresolvedWith =>
        w.cteRelations.foreach(t => collectFacts(t._2, f))
      case _ => ()
    }
    // Subqueries (IN / EXISTS / scalar) carry their own plans.
    plan.foreach { node =>
      node.expressions.foreach(_.foreach {
        case s: SubqueryExpression => f.hasSubquery = true; collectFacts(s.plan, f)
        case _                     => ()
      })
    }
  }

  /** Windowed (OVER) functions in a select list: ranking functions become
    * rank specs (alias + partition keys); anything else marks the chain as
    * a general updating query.
    */
  private def scanForWindowFns(exprs: Seq[Expression], f: Facts): Unit =
    exprs.foreach { ne =>
      val wins = ne.collect { case w: WindowExpression => w }
      wins.foreach { w =>
        val fnName = w.windowFunction match {
          case fn: UnresolvedFunction => fn.nameParts.last.toLowerCase
          case _                      => ""
        }
        if (rankFns.contains(fnName)) {
          val alias = ne match {
            case Alias(c, n) if c eq w => Some(n)
            case _                     => None
          }
          val partKeys = {
            val names = w.windowSpec.partitionSpec.map(attrName)
            if (names.forall(_.isDefined)) Some(names.flatten) else None
          }
          f.rankSpecs ::= (alias, partKeys)
        } else f.otherWindowFns = true
      }
    }

  /** True when the expression calls an aggregate function outside any OVER
    * clause — i.e. `SELECT count(*) FROM t` parses as a bare Project, not an
    * Aggregate, so global aggregates must be spotted in the select list.
    */
  private def containsAggFn(e: Expression): Boolean = e match {
    case _: WindowExpression => false
    case fn: UnresolvedFunction if isAggregateFn(fn.nameParts.last) => true
    case other => other.children.exists(containsAggFn)
  }

  /** Map GROUP BY expressions to output column names so the snapshot diff
    * can pair rows per group. None when any grouping expression has no
    * identifiable output column (diff falls back to full-row multiset).
    */
  private def mapGroupKeys(a: Aggregate): Option[Seq[String]] = {
    def outputNameOf(g: Expression): Option[String] = g match {
      case attr: UnresolvedAttribute =>
        val last = attr.nameParts.last
        a.aggregateExpressions.collectFirst {
          case out: UnresolvedAttribute if out.nameParts.last == last => last
          case Alias(child: UnresolvedAttribute, n) if child.nameParts.last == last => n
        }
      case Literal(i: Int, _) if i >= 1 && i <= a.aggregateExpressions.length =>
        a.aggregateExpressions(i - 1) match {
          case Alias(_, n)               => Some(n)
          case out: UnresolvedAttribute  => Some(out.nameParts.last)
          case _                         => None
        }
      case other =>
        a.aggregateExpressions.collectFirst {
          case al @ Alias(child, n) if child.sql == other.sql => n
        }
    }
    val names = a.groupingExpressions.map(outputNameOf)
    if (names.forall(_.isDefined)) Some(names.flatten) else None
  }

  /** Classify a rewritten step chain. As-of steps are detected by the
    * rewriter (their SQL is Flink dialect Spark cannot parse) and excluded
    * from plan parsing.
    */
  def classify(
      spark: SparkSession,
      steps: Seq[(Option[String], SqlRewriter.Rewritten)]
  ): Mode = {
    val tumbles = steps.flatMap(_._2.tumble).distinct
    val asOfs = steps.flatMap(_._2.asOf)

    val f = new Facts(tumbles.exists(_.calendarMonths > 0))
    steps.filter(_._2.asOf.isEmpty).foreach { case (_, rw) =>
      collectFacts(spark.sessionState.sqlParser.parsePlan(rw.sql), f)
    }

    if (asOfs.nonEmpty) {
      if (asOfs.size > 1)
        invalid("multiple as-of joins in one transform are not supported")
      if (f.intervalUppers.nonEmpty || f.snapshotFacts)
        invalid("an as-of join cannot be composed with other stateful operators " +
          "(interval joins, non-windowed aggregations, ranking, regular joins) " +
          "in one transform")
      if (tumbles.nonEmpty) {
        if (tumbles.size > 1)
          invalid("multiple distinct tumbling windows in one transform are not supported")
        Mode.AsOfWindowed
      } else Mode.AsOfJoin
    } else if (tumbles.nonEmpty) {
      if (tumbles.size > 1)
        invalid("multiple distinct tumbling windows in one transform are not supported")
      if (f.snapshotFacts)
        invalid("a tumbling-window aggregation cannot be composed with " +
          "non-windowed aggregations, ranking functions, DISTINCT, LIMIT, or " +
          "time-unbounded joins in one transform")
      Mode.Windowed(f.intervalUppers.maxOption.getOrElse(0L))
    } else if (f.intervalUppers.nonEmpty) {
      if (f.snapshotFacts)
        invalid("an interval join cannot be composed with aggregations, " +
          "ranking functions, DISTINCT, LIMIT, or time-unbounded joins " +
          "in one transform")
      Mode.Windowed(f.intervalUppers.max)
    } else if (f.snapshotFacts) {
      val aggTops = aggTopsOutputStep(spark, steps)
      val keys = snapshotKeys(f, aggTops)
        .orElse(nestedAggKeys(spark, steps, f, aggTops))
      Mode.SnapshotDiff(keys,
        extractAggMerge(spark, steps, f)
          .orElse(extractDistinctMerge(spark, steps, f))
          .orElse(extractSetOpMerge(spark, steps, f))
          .orElse(extractSetOpTreeMerge(spark, steps, f)),
        extractRankTouch(spark, steps, f, keys)
          .orElse(extractAggTouch(spark, steps, f))
          .orElse(extractGroupTouch(spark, steps, f)),
        extractJoinDelta(spark, steps, f),
        extractDistinctDelta(spark, steps, f),
        extractLeftJoinDelta(spark, steps, f))
    } else Mode.Stateless
  }

  private val mergeableFns = Set("sum", "count", "min", "max")

  /** Detect the incremental-merge shape: the chain's single plain aggregate
    * sits at the TOP of the output step (everything else stateless), every
    * aggregate column is an aliased non-DISTINCT, non-FILTER
    * sum/count/min/max/avg, and every group key survives to the output. A
    * HAVING above the aggregate qualifies when its predicate reads only
    * OUTPUT columns (it is then applied post-merge). The chain may
    * additionally hold an inner-join TREE below the aggregate when it
    * resolves under [[StepChains]]'s discipline — the spec then carries the
    * [[JoinDelta]] and the executor aggregates the join's delta terms
    * instead of the raw slices — or a single LEFT OUTER join
    * ([[LeftJoinDelta]] conditions, sum/count/avg aggregates only), whose
    * retraction terms subtract through the partials. Anything else —
    * expressions over aggregates, aggregates in HAVING, the aggregate in an
    * intermediate step — returns None and keeps the recompute path.
    */
  private def extractAggMerge(
      spark: SparkSession,
      steps: Seq[(Option[String], SqlRewriter.Rewritten)],
      f: Facts): Option[AggMergeSpec] = {
    val onlyAgg = f.plainAggs.size == 1 && f.rankSpecs.isEmpty &&
      !f.otherWindowFns && !f.distinctOrLimit &&
      !f.hasSubquery && !steps.exists(_._2.timeVarying)
    val ks = f.plainAggs.headOption.flatten match {
      case Some(k) if onlyAgg => k
      case _                  => return None
    }
    // With joins below the aggregate, the slice is not the delta — the
    // join's delta decomposition is, and it demands the same resolution
    // discipline as the plain delta-join path (CTE bodies unseeable ⇒
    // unsound ⇒ no fast path). An inner-join tree contributes append-only
    // delta terms; a single LEFT join contributes append terms plus
    // retraction terms, which the merge algebra can only subtract through
    // sum/count partials (min/max are not invertible — [[build]] rejects
    // them on the left path).
    val (joinOpt, leftOpt): (Option[JoinDelta], Option[LeftJoinDelta]) =
      if (f.regularJoins == 0) (None, None)
      else {
        val chains = new StepChains(spark, steps)
        if (chains.hasCte) return None
        chains.resolveInnerJoinTree() match {
          case Some(jd) => (Some(jd), None)
          case None =>
            // derived sides ride the shared LeftDeltaPlumbing in the
            // partials executor, same as the plain left-join changelog
            chains.resolveSingleLeftJoin() match {
              case Some(lj) => (None, Some(lj))
              case None     => return None
            }
        }
      }
    val outIdx = steps.lastIndexWhere(_._1.isEmpty) match {
      case -1 => steps.length - 1
      case i  => i
    }
    var having: Option[Expression] = None
    def unwrap(p: LogicalPlan): LogicalPlan = p match {
      case w: UnresolvedWith   => unwrap(w.child)
      case s: SubqueryAlias    => unwrap(s.child)
      case s: Sort             => unwrap(s.child)
      case h: UnresolvedHaving => having = Some(h.havingCondition); unwrap(h.child)
      case other               => other
    }
    def fnKind(e: Expression): Option[String] = e match {
      case fn: UnresolvedFunction
          if (mergeableFns.contains(fn.nameParts.last.toLowerCase) ||
            fn.nameParts.last.equalsIgnoreCase("avg")) &&
            !fn.isDistinct && fn.filter.isEmpty =>
        Some(fn.nameParts.last.toLowerCase)
      case _ => None
    }
    def build(
        flat: Seq[Either[String, (String, String, Expression)]]): Option[AggMergeSpec] = {
      val aggs = flat.collect {
        case scala.util.Right((n, k, _)) if k != "avg" && k != "expr" => (n, k)
      }
      val avgs = flat.collect { case scala.util.Right((n, "avg", _)) => n }
      val exprsRaw = flat.collect { case scala.util.Right((n, "expr", e)) => (n, e) }
      val keyCols = flat.collect { case scala.util.Left(k) => k }
      // Left-join path: retraction terms subtract through the partials, so
      // every aggregate must be invertible — sum/count/avg only.
      if (leftOpt.isDefined && aggs.exists(kv => kv._2 == "min" || kv._2 == "max"))
        return None
      if ((aggs.nonEmpty || avgs.nonEmpty || exprsRaw.nonEmpty) &&
        keyCols.sorted == ks.sorted) {
        val visibleNames =
          (keyCols ++ aggs.map(_._1) ++ avgs ++ exprsRaw.map(_._1)).toSet
        // The post-merge filter evaluates against the merged frame: plain
        // output-column references and scalar functions over them pass
        // through unchanged; a mergeable aggregate CALL that is not
        // projected (`HAVING count(*) > 2`) becomes a hidden `__hv_<i>`
        // partial maintained alongside the visible columns and the
        // predicate is rewritten to reference it. An unprojected
        // `avg(x)` decomposes to hidden sum+count partials and is
        // rewritten to their division — Spark SQL division of integral
        // or floating operands IS double division, exactly avg's
        // arithmetic, and the executor gates decimal inputs back to
        // recompute (decimal quotients round by division precision
        // rules, not avg's s+4 contract). Anything else — non-mergeable
        // aggregates, subqueries, qualified or unknown columns — keeps
        // the recompute path.
        var hidden = Vector.empty[(String, String, Expression)]
        var hiddenAvgNames = Vector.empty[String]
        var avgSeen = Map.empty[String, String]
        def rewrite(e: Expression, allowed: Set[String]): Option[Expression] = e match {
          case _: SubqueryExpression => None
          case fn: UnresolvedFunction if isAggregateFn(fn.nameParts.last) =>
            fnKind(fn).map {
              case "avg" =>
                val base = avgSeen.getOrElse(fn.sql, {
                  val n = s"__hva_${avgSeen.size}"
                  avgSeen += fn.sql -> n
                  hiddenAvgNames :+= n
                  hidden :+= ((s"__as_$n", "sum",
                    fn.copy(nameParts = Seq("sum"))))
                  hidden :+= ((s"__ac_$n", "count",
                    fn.copy(nameParts = Seq("count"))))
                  n
                })
                spark.sessionState.sqlParser
                  .parseExpression(s"__as_$base / __ac_$base")
              case k =>
                hidden.find(_._3.sql == fn.sql)
                  .map(h => UnresolvedAttribute(h._1))
                  .getOrElse {
                    val name = s"__hv_${hidden.size}"
                    hidden :+= ((name, k, fn))
                    UnresolvedAttribute(name)
                  }
            }
          // evaluated once per group post-merge instead of per input row —
          // only sound for deterministic expressions
          case fn: UnresolvedFunction
              if nondeterministicFns.contains(fn.nameParts.last.toLowerCase) =>
            None
          case at: UnresolvedAttribute =>
            if (at.nameParts.length == 1 && allowed.contains(at.nameParts.head))
              Some(at)
            else None
          case other =>
            val kids = other.children.map(rewrite(_, allowed))
            if (kids.exists(_.isEmpty)) None
            else Some(other.withNewChildren(kids.map(_.get)))
        }
        // Select-list expression columns: rewrite each over keys, earlier
        // visible columns (lateral aliases resolve post-merge, where those
        // columns hold their final values), and hidden partials.
        var exprAllowed = (keyCols ++ aggs.map(_._1) ++ avgs).toSet
        var exprCols = Vector.empty[(String, String)]
        var exprFailed = false
        exprsRaw.foreach { case (n, raw) =>
          rewrite(raw, exprAllowed) match {
            case Some(r) => exprCols :+= ((n, r.sql)); exprAllowed += n
            case None    => exprFailed = true
          }
        }
        val rewritten: Option[Option[Expression]] =
          having.map(rewrite(_, visibleNames))
        if (exprFailed || rewritten.exists(_.isEmpty)) None
        else if (leftOpt.isDefined &&
          hidden.exists(h => h._2 == "min" || h._2 == "max")) None
        else {
          val havingExpr = rewritten.flatten
          // A join-free chain with only sum/count/avg aggregates is
          // invertible: input retractions subtract exactly through the
          // merge algebra, so the executor never has to flip to the
          // O(history) recompute path. It carries the same aux partials
          // as the left-join path (which already subtracts its internally
          // generated retraction terms).
          val invertible = joinOpt.isEmpty && leftOpt.isEmpty &&
            !aggs.exists(kv => kv._2 == "min" || kv._2 == "max") &&
            !hidden.exists(h => h._2 == "min" || h._2 == "max")
          // Aux partials (left-join + invertible paths): a hidden count(*)
          // row-count so the executor can drop groups whose last row was
          // retracted, and a paired non-null count per SUM so a sum whose
          // every contribution was subtracted away reads NULL (SQL's
          // empty-sum), not 0.
          var sumNullCounts = Vector.empty[(String, String)]
          if (leftOpt.isDefined || invertible) {
            val sums = (flat.collect {
              case scala.util.Right((n, "sum", fn)) => (n, fn)
            }) ++ hidden.collect { case (n, "sum", fn) => (n, fn) }
            sums.foreach { case (n, fn) =>
              val nc = s"__nc_$n"
              sumNullCounts :+= (n -> nc)
              hidden :+= ((nc, "count",
                fn.asInstanceOf[UnresolvedFunction].copy(nameParts = Seq("count"))))
            }
            hidden :+= ((RowCountCol, "count",
              UnresolvedFunction(Seq("count"), Seq(Literal(1)), isDistinct = false)))
          }
          val needsPlan =
            avgs.nonEmpty || havingExpr.isDefined || leftOpt.isDefined ||
              exprCols.nonEmpty || invertible
          val partials =
            if (!needsPlan) None
            else Some(partialsPlanOf(
              spark.sessionState.sqlParser.parsePlan(steps(outIdx)._2.sql),
              avgs.toSet,
              hidden.map(h => Alias(h._3, h._1)()).toSeq,
              exprCols.map(_._1).toSet))
          Some(AggMergeSpec(ks, aggs ++ hidden.map(h => (h._1, h._2)), avgs,
            havingExpr.map(_.sql), partials, joinOpt, hiddenAvgNames,
            leftOpt, sumNullCounts, exprCols, invertible))
        }
      } else None
    }
    unwrap(spark.sessionState.sqlParser.parsePlan(steps(outIdx)._2.sql)) match {
      case a: Aggregate =>
        val entries: Seq[Option[Either[String, (String, String, Expression)]]] =
          a.aggregateExpressions.map {
            case attr: UnresolvedAttribute if ks.contains(attr.nameParts.last) =>
              Some(scala.util.Left(attr.nameParts.last))
            case Alias(_, n) if ks.contains(n) => Some(scala.util.Left(n))
            case Alias(fn, n) =>
              Some(fnKind(fn).map(k => scala.util.Right((n, k, fn)))
                .getOrElse(scala.util.Right((n, "expr", fn))))
            case _            => None
          }
        if (!entries.forall(_.isDefined)) None else build(entries.flatten)
      // a global aggregate (`SELECT count(*), sum(v) FROM t`) parses as a
      // bare Project; single merged group, no keys
      case p: Project if ks.isEmpty =>
        val entries: Seq[Option[Either[String, (String, String, Expression)]]] =
          p.projectList.map {
            case Alias(fn, n) =>
              Some(fnKind(fn).map(k => scala.util.Right((n, k, fn)))
                .getOrElse(scala.util.Right((n, "expr", fn))))
            case _            => None
          }
        if (entries.nonEmpty && entries.forall(_.isDefined)) build(entries.flatten)
        else None
      case _ => None
    }
  }

  /** Functions whose value differs per evaluation — an expression column is
    * evaluated once per group post-merge instead of per-plan, so these make
    * the fast path diverge from recompute (which is itself nondeterministic
    * for them; neither path is "right", so neither should be silently
    * substituted for the other). Time functions are handled upstream: the
    * rewriter pins `now()`/`current_timestamp` to the request's systemTime
    * and marks the step timeVarying, which disables the merge path entirely.
    */
  private val nondeterministicFns: Set[String] = Set(
    "rand", "randn", "random", "uuid", "shuffle",
    "monotonically_increasing_id", "spark_partition_id", "input_file_name")

  /** Detect the refcount-merge shape for DISTINCT: the output step is
    * `SELECT DISTINCT <named projections>` over stateless join-free
    * pre-steps. A distinct set is the SUPPORT of the input multiset — a
    * grouped count(*) with every projection a group key, visible while the
    * count is positive — which is exactly an invertible [[AggMergeSpec]]
    * whose only partial is the hidden row count. Both appends and
    * retractions then ride the tiered merge path: a new value surfaces as
    * +I, the retraction of a value's LAST occurrence as -D, and duplicate
    * appends/partial retractions only move the hidden count.
    * ([[DistinctDelta]] remains the path for DISTINCT over an inner join,
    * where the delta terms need the join decomposition.)
    */
  /** Output name of a parsed project-list entry, or None when it has no
    * stable name at parse time. An unaliased expression parses as
    * UnresolvedAlias whose `.name` THROWS (UnresolvedException — a
    * SparkException in Spark 4.1, not AnalysisException), so e.g.
    * `SELECT DISTINCT upper(symbol) FROM t` must fall back to the
    * recompute path, not die in classification (round-6 ADVICE #2).
    */
  private def parsedName(ne: NamedExpression): Option[String] = ne match {
    case a: UnresolvedAttribute => Some(a.nameParts.last)
    case a: Alias               => Some(a.name)
    case _                      => None
  }

  private def extractDistinctMerge(
      spark: SparkSession,
      steps: Seq[(Option[String], SqlRewriter.Rewritten)],
      f: Facts): Option[AggMergeSpec] = {
    // A DISTINCT at the top; FURTHER Distincts BELOW it (inside the output
    // step) are support-preserving no-ops for the final result — any chain
    // of stateless maps between them cannot turn multiplicity into
    // support — so they are STRIPPED from the refcount partials plan
    // (counting raw input multiplicities keeps the refcount invertible:
    // with the inner distinct left in, a slice retracting two identical
    // rows would dedup them and subtract 1 instead of 2). Distincts in
    // PRE-STEPS stay recompute: pre-step SQL runs verbatim, unstrippable.
    // No LIMIT/set-op anywhere — same discipline as DistinctDelta.
    val eligible = f.distincts >= 1 && !f.limitOrSetOp &&
      f.plainAggs.isEmpty && f.rankSpecs.isEmpty &&
      !f.otherWindowFns && f.regularJoins == 0 && !f.hasSubquery &&
      f.intervalUppers.isEmpty && !steps.exists(_._2.timeVarying)
    if (!eligible) return None
    val outIdx = steps.lastIndexWhere(_._1.isEmpty) match {
      case -1 => steps.length - 1
      case i  => i
    }
    def unwrap(p: LogicalPlan): LogicalPlan = p match {
      case s: SubqueryAlias => unwrap(s.child)
      case s: Sort          => unwrap(s.child)
      case other            => other
    }
    def starFree(p: Project): Boolean =
      !p.projectList.exists(_.isInstanceOf[UnresolvedStar]) &&
        !p.projectList.exists(_.exists(_.isInstanceOf[SubqueryExpression]))
    def rowCountAgg(): NamedExpression = Alias(
      UnresolvedFunction(Seq("count"), Seq(Literal(1)),
        isDistinct = false), RowCountCol)()
    unwrap(spark.sessionState.sqlParser.parsePlan(steps(outIdx)._2.sql)) match {
      case dst: Distinct =>
        // inner Distincts stripped (see eligibility comment); count them
        // so Distincts hiding in PRE-STEPS — which cannot be stripped —
        // still force the recompute path
        var stripped = 0
        def stripInner(p: LogicalPlan): LogicalPlan = p.transformUp {
          case d: Distinct => stripped += 1; d.child
        }
        dst.child match {
          case p: Project if starFree(p) =>
            val maybeNames = p.projectList.map(parsedName)
            if (maybeNames.contains(None)) return None
            val names = maybeNames.flatten
            if (names.distinct.size != names.size) return None
            // group by the UNDERLYING expressions (grouping on an alias is
            // not a thing); project the named forms plus the row count
            val groupingExprs: Seq[Expression] = p.projectList.map {
              case Alias(e, _) => e
              case other       => other
            }
            val child = stripInner(p.child)
            if (stripped + 1 != f.distincts) return None
            val refcount = Aggregate(
              groupingExprs,
              p.projectList :+ rowCountAgg(),
              child)
            Some(AggMergeSpec(names, Seq(RowCountCol -> "count"),
              partialsPlan = Some(refcount), invertible = true))
          // `a UNION b` parses as Distinct(Union): the support of the
          // concatenated multisets — group the union by the first branch's
          // names (positional resolution gives the union its first child's
          // column names) with the same hidden refcount.
          case u: Union
              // distincts == 1: inner Distincts under union branches are
              // not stripped here — keep recompute for those
              if f.distincts == 1 && u.children.forall {
                case s: SubqueryAlias => s.child match {
                  case p: Project => starFree(p); case _ => false
                }
                case p: Project => starFree(p)
                case _          => false
              } =>
            val first = (u.children.head match {
              case s: SubqueryAlias => s.child
              case other            => other
            }).asInstanceOf[Project]
            val maybeNames = first.projectList.map(parsedName)
            if (maybeNames.contains(None)) return None
            val names = maybeNames.flatten
            if (names.distinct.size != names.size) return None
            val refcount = Aggregate(
              names.map(n => UnresolvedAttribute(Seq(n)): Expression),
              names.map(n =>
                UnresolvedAttribute(Seq(n)): NamedExpression) :+ rowCountAgg(),
              u)
            Some(AggMergeSpec(names, Seq(RowCountCol -> "count"),
              partialsPlan = Some(refcount), invertible = true))
          case _ => None
        }
      case _ => None
    }
  }

  /** Hidden per-side refcount columns for distinct set-ops. */
  private val SideLeftCol = "__sl"
  private val SideRightCol = "__sr"
  private val SideMarkCol = "__side"

  /** Detect the refcount-merge shape for DISTINCT set operations: the
    * output step is exactly one `INTERSECT`/`EXCEPT` (distinct variants —
    * `ALL` multiplicities are not a visibility predicate) between two
    * star-free projections over stateless join-free branches. Per-value
    * PER-SIDE refcounts ride the invertible merge: the branches are
    * re-tagged with a side marker, unioned, and grouped by the left
    * branch's column names; visibility is a post-merge filter over the
    * side counts (`left>0 AND right>0` / `left>0 AND right=0`) riding the
    * spec's HAVING hook — state keeps invisible values (their counts must
    * survive so a later append/retraction on EITHER side can surface
    * them), exactly the sub-threshold-group contract. Retractions on
    * either side cross the visibility threshold as +I/-D through the
    * snapshot diff.
    */
  private def extractSetOpMerge(
      spark: SparkSession,
      steps: Seq[(Option[String], SqlRewriter.Rewritten)],
      f: Facts): Option[AggMergeSpec] = {
    val eligible = f.distincts == 0 && f.plainAggs.isEmpty &&
      f.rankSpecs.isEmpty && !f.otherWindowFns && f.regularJoins == 0 &&
      !f.hasSubquery && f.intervalUppers.isEmpty &&
      !steps.exists(_._2.timeVarying)
    if (!eligible) return None
    val plans = steps.map(s => spark.sessionState.sqlParser.parsePlan(s._2.sql))
    // limitOrSetOp conflates LIMIT with set-ops: demand zero limits and
    // exactly one set-op node, which must be the output top
    val limits = plans.map(_.collect {
      case _: GlobalLimit => (); case _: LocalLimit => ()
    }.size).sum
    val setOps = plans.map(_.collect {
      case _: Except => (); case _: Intersect => ()
    }.size).sum
    if (limits > 0 || setOps != 1) return None
    val outIdx = steps.lastIndexWhere(_._1.isEmpty) match {
      case -1 => steps.length - 1
      case i  => i
    }
    def unwrap(p: LogicalPlan): LogicalPlan = p match {
      case s: SubqueryAlias => unwrap(s.child)
      case s: Sort          => unwrap(s.child)
      case other            => other
    }
    val (left, right, isAll, isExcept) =
      unwrap(plans(outIdx)) match {
        case e: Except    => (e.left, e.right, e.isAll, true)
        case i: Intersect => (i.left, i.right, i.isAll, false)
        case _            => return None
      }
    def proj(p: LogicalPlan): Option[Project] = p match {
      case s: SubqueryAlias => proj(s.child)
      case pr: Project
          if !pr.projectList.exists(_.isInstanceOf[UnresolvedStar]) &&
            !pr.projectList.exists(_.exists(_.isInstanceOf[SubqueryExpression])) =>
        Some(pr)
      case _ => None
    }
    (proj(left), proj(right)) match {
      case (Some(lp), Some(rp))
          if lp.projectList.length == rp.projectList.length =>
        val maybeNames = lp.projectList.map(parsedName)
        if (maybeNames.contains(None)) return None
        val names = maybeNames.flatten
        if (names.distinct.size != names.size) return None
        // canonicalize both branches to the left names + a side marker
        def tagged(pr: Project, side: Int): LogicalPlan =
          Project(pr.projectList.zip(names).map { case (ne, n) =>
            Alias(ne match {
              case Alias(e, _)         => e
              // right branch may carry unaliased exprs even when the left
              // names resolved — unwrap, don't nest the UnresolvedAlias
              case u: UnresolvedAlias  => u.child
              case other               => other
            }, n)()
          } :+ Alias(Literal(side), SideMarkCol)(), pr.child)
        def sideCount(side: Int, name: String): NamedExpression = Alias(
          UnresolvedFunction(Seq("count"), Seq(CaseWhen(
            Seq((EqualTo(UnresolvedAttribute(Seq(SideMarkCol)), Literal(side)),
              Literal(1))), None)), isDistinct = false), name)()
        val refcount = Aggregate(
          names.map(n => UnresolvedAttribute(Seq(n)): Expression),
          names.map(n => UnresolvedAttribute(Seq(n)): NamedExpression) ++ Seq(
            sideCount(0, SideLeftCol),
            sideCount(1, SideRightCol),
            Alias(UnresolvedFunction(Seq("count"), Seq(Literal(1)),
              isDistinct = false), RowCountCol)()),
          Union(Seq(tagged(lp, 0), tagged(rp, 1))))
        // DISTINCT variants: visibility is a predicate over the side
        // counts. ALL variants: the output is a multiset — per-value
        // multiplicity min(l, r) (INTERSECT ALL) / max(l − r, 0)
        // (EXCEPT ALL) — carried as a multiplicity expression; the
        // executor diffs multiplicities instead of keyed rows.
        if (isAll)
          Some(AggMergeSpec(names,
            Seq(SideLeftCol -> "count", SideRightCol -> "count",
              RowCountCol -> "count"),
            partialsPlan = Some(refcount), invertible = true,
            multiplicitySql = Some(
              if (isExcept) s"greatest($SideLeftCol - $SideRightCol, 0)"
              else s"least($SideLeftCol, $SideRightCol)")))
        else {
          val visibility =
            if (isExcept) s"$SideLeftCol > 0 AND $SideRightCol = 0"
            else s"$SideLeftCol > 0 AND $SideRightCol > 0"
          Some(AggMergeSpec(names,
            Seq(SideLeftCol -> "count", SideRightCol -> "count",
              RowCountCol -> "count"),
            havingSql = Some(visibility),
            partialsPlan = Some(refcount), invertible = true))
        }
      case _ => None
    }
  }

  /** Generalization of [[extractSetOpMerge]] to an ARBITRARY TREE of set
    * operations (ALL and DISTINCT variants, n-ary UNIONs, and DISTINCT
    * nodes — including the `SELECT DISTINCT * FROM (… EXCEPT ALL …)`
    * shape) over star-free leaf projections. Every set-op node's output
    * multiplicity is a pure function of its children's multiplicities:
    *
    *   leaf i            →  per-value count of leaf i's rows  (__s<i>)
    *   UNION ALL         →  Σ children
    *   EXCEPT ALL        →  greatest(l − r, 0)
    *   INTERSECT ALL     →  least(l, r)
    *   DISTINCT(x)       →  x > 0 ? 1 : 0
    *   EXCEPT            →  l > 0 AND r = 0 ? 1 : 0
    *   INTERSECT         →  l > 0 AND r > 0 ? 1 : 0
    *
    * so the WHOLE tree folds into one per-leaf refcount aggregate (side-
    * tagged union of canonicalized leaves — invertible, additive, rides
    * the LSM tiers) plus one multiplicity expression the executor diffs.
    * DISTINCT nodes anywhere in the chain that the tree walk does NOT
    * consume (pre-steps, leaf subtrees) and set-ops outside the output
    * tree keep the recompute path via the consumed-count checks. The two
    * specialized extractors run first and keep their (keyed-diff /
    * two-side) plans for the shapes they already serve; this one catches
    * the chains they reject. Reference behavior: Flink serves these as
    * generic updating queries over full history
    * (`/root/reference/src/main/scala/dev/kamu/engine/flink/TransformEngine.scala:64-124`);
    * here per-run cost is O(slice ⋈ touched values), not O(history).
    */
  private def extractSetOpTreeMerge(
      spark: SparkSession,
      steps: Seq[(Option[String], SqlRewriter.Rewritten)],
      f: Facts): Option[AggMergeSpec] = {
    val eligible = f.plainAggs.isEmpty && f.rankSpecs.isEmpty &&
      !f.otherWindowFns && f.regularJoins == 0 && !f.hasSubquery &&
      f.intervalUppers.isEmpty && !steps.exists(_._2.timeVarying)
    if (!eligible) return None
    val plans = steps.map(s => spark.sessionState.sqlParser.parsePlan(s._2.sql))
    val limits = plans.map(_.collect {
      case _: GlobalLimit => (); case _: LocalLimit => ()
    }.size).sum
    val totalSetOps = plans.map(_.collect {
      case _: Except => (); case _: Intersect => ()
    }.size).sum
    val outIdx = steps.lastIndexWhere(_._1.isEmpty) match {
      case -1 => steps.length - 1
      case i  => i
    }
    // pure-UNION shapes inside ONE step belong to extractDistinctMerge
    // (which runs first); a UNION inside a PRE-step is only reachable
    // through the inlining below, so it counts as a trigger here
    val preStepUnions = plans.zipWithIndex.collect {
      case (p, i) if i != outIdx =>
        p.collect { case _: Union => () }.size
    }.sum
    if (limits > 0 || (totalSetOps == 0 && preStepUnions == 0)) return None
    // Inline single-use pre-step references into the output plan BEFORE
    // the tree walk, so set-ops HIDING IN PRE-STEPS (round 9; previously
    // O(history) recompute) fold into the same composed multiplicity
    // merge: a pre-step here can only hold stateless row-local ops and
    // set-op/DISTINCT nodes (the Facts guards above exclude everything
    // else), both of which the walk itself validates — any node it cannot
    // fold fails the extraction, keeping the honest recompute. Use-once
    // keeps the consumed-count accounting exact; cycles, duplicate
    // aliases, and a consumed output alias bail out.
    val preByAlias: Map[String, LogicalPlan] = plans.zipWithIndex.collect {
      case (p, i) if i != outIdx && steps(i)._1.isDefined =>
        steps(i)._1.get -> p
    }.toMap
    val outAliasScanned = steps(outIdx)._1.exists(a =>
      plans.exists(_.collect {
        case r: UnresolvedRelation if r.multipartIdentifier.last == a => ()
      }.nonEmpty))
    val dupAlias = preByAlias.size !=
      steps.zipWithIndex.count(x => x._1._1.isDefined && x._2 != outIdx)
    val scanCounts: Map[String, Int] = plans.flatMap(_.collect {
      case r: UnresolvedRelation => r.multipartIdentifier.last
    }).groupBy(identity).view.mapValues(_.size).toMap
    def holdsSetNodes(p: LogicalPlan): Boolean = p.exists {
      case _: Except | _: Intersect | _: Union | _: Distinct => true
      case _                                                 => false
    }
    // stateless pre-steps may be scanned at several sites (each inline
    // copy is its own leaf, exactly as the shared view was); set-node-
    // bearing ones must be single-use so the consumed-count accounting
    // below stays exact
    if (dupAlias || outAliasScanned ||
        preByAlias.exists { case (a, p) =>
          holdsSetNodes(p) && scanCounts.getOrElse(a, 0) != 1 })
      return None
    def inlinePre(p: LogicalPlan, stack: Set[String]): Option[LogicalPlan] = {
      var ok = true
      val out = p.transformUp {
        case r: UnresolvedRelation
            if preByAlias.contains(r.multipartIdentifier.last) =>
          val n = r.multipartIdentifier.last
          if (stack(n)) { ok = false; r }
          else inlinePre(preByAlias(n), stack + n) match {
            case Some(ip) => SubqueryAlias(n, ip)
            case None     => ok = false; r
          }
      }
      if (ok) Some(out) else None
    }
    def unwrap(p: LogicalPlan): LogicalPlan = p match {
      case s: SubqueryAlias => unwrap(s.child)
      case s: Sort          => unwrap(s.child)
      case other            => other
    }
    def starFree(pr: Project): Boolean =
      !pr.projectList.exists(_.isInstanceOf[UnresolvedStar]) &&
        !pr.projectList.exists(_.exists(_.isInstanceOf[SubqueryExpression]))
    def hasSetNodes(p: LogicalPlan): Boolean = p.exists {
      case _: Except | _: Intersect | _: Union | _: Distinct => true
      case _                                                 => false
    }
    val leaves = scala.collection.mutable.Buffer.empty[Project]
    val passThroughs = scala.collection.mutable.Buffer.empty[Project]
    var consumedDistincts = 0
    var consumedSetOps = 0
    def walk(p: LogicalPlan): Option[String] = p match {
      case s: SubqueryAlias => walk(s.child)
      case d: Distinct =>
        consumedDistincts += 1
        walk(d.child).map(e => s"(CASE WHEN ($e) > 0 THEN 1 ELSE 0 END)")
      case e: Except =>
        consumedSetOps += 1
        for { l <- walk(e.left); r <- walk(e.right) } yield
          if (e.isAll) s"greatest(($l) - ($r), 0)"
          else s"(CASE WHEN ($l) > 0 AND ($r) = 0 THEN 1 ELSE 0 END)"
      case i: Intersect =>
        consumedSetOps += 1
        for { l <- walk(i.left); r <- walk(i.right) } yield
          if (i.isAll) s"least(($l), ($r))"
          else s"(CASE WHEN ($l) > 0 AND ($r) > 0 THEN 1 ELSE 0 END)"
      case u: Union if !u.byName && !u.allowMissingCol =>
        val es = u.children.map(walk)
        if (es.exists(_.isEmpty)) None
        else Some(es.flatten.map(e => s"($e)").mkString(" + "))
      case pr: Project if hasSetNodes(pr.child) =>
        // pass-through over a sub-tree (`SELECT DISTINCT a, b FROM (…) t`):
        // validated against the leaf names once they are known
        passThroughs += pr
        walk(pr.child)
      case pr: Project if starFree(pr) =>
        leaves += pr
        Some(s"__s${leaves.size - 1}")
      case _ => None
    }
    val inlinedOut = inlinePre(plans(outIdx), Set.empty) match {
      case Some(p) => p
      case None    => return None
    }
    val multSql = walk(unwrap(inlinedOut)) match {
      case Some(m) => m
      case None    => return None
    }
    // every set-op and DISTINCT in the whole chain must be consumed by the
    // tree — one under a leaf (or in a pre-step the output never scans)
    // cannot be folded. Counts stay exact under use-once inlining: each
    // pre-step's nodes are walked exactly once.
    if (consumedSetOps != totalSetOps || consumedDistincts != f.distincts)
      return None
    if (leaves.size < 2) return None
    val first = leaves.head
    if (leaves.exists(_.projectList.length != first.projectList.length))
      return None
    val maybeNames = first.projectList.map(parsedName)
    if (maybeNames.contains(None)) return None
    val names = maybeNames.flatten
    if (names.distinct.size != names.size) return None
    // a pass-through must not re-key the diff: demand `*` or exactly the
    // leaf names in leaf order
    val passOk = passThroughs.forall { pr =>
      pr.projectList match {
        case Seq(s: UnresolvedStar) => s.target.isEmpty
        case l if l.length == names.length =>
          l.zip(names).forall {
            case (a: UnresolvedAttribute, n) =>
              a.nameParts.last.equalsIgnoreCase(n)
            case _ => false
          }
        case _ => false
      }
    }
    if (!passOk) return None
    def tagged(pr: Project, side: Int): LogicalPlan =
      Project(pr.projectList.zip(names).map { case (ne, n) =>
        Alias(ne match {
          case Alias(e, _)        => e
          case u: UnresolvedAlias => u.child
          case other              => other
        }, n)()
      } :+ Alias(Literal(side), SideMarkCol)(), pr.child)
    def sideCount(side: Int): NamedExpression = Alias(
      UnresolvedFunction(Seq("count"), Seq(CaseWhen(
        Seq((EqualTo(UnresolvedAttribute(Seq(SideMarkCol)), Literal(side)),
          Literal(1))), None)), isDistinct = false), s"__s$side")()
    val refcount = Aggregate(
      names.map(n => UnresolvedAttribute(Seq(n)): Expression),
      names.map(n => UnresolvedAttribute(Seq(n)): NamedExpression) ++
        leaves.indices.map(sideCount) :+ Alias(
          UnresolvedFunction(Seq("count"), Seq(Literal(1)),
            isDistinct = false), RowCountCol)(),
      Union(leaves.toSeq.zipWithIndex.map { case (pr, i) => tagged(pr, i) }))
    Some(AggMergeSpec(names,
      leaves.indices.map(i => s"__s$i" -> "count") :+ (RowCountCol -> "count"),
      partialsPlan = Some(refcount), invertible = true,
      multiplicitySql = Some(multSql)))
  }

  /** The output step's plan rewritten to produce MERGE PARTIALS: ORDER BY
    * dropped (state needs no order), HAVING dropped (applied post-merge),
    * each `avg(x) AS n` split into `sum(x) AS __as_n, count(x) AS __ac_n`,
    * expression columns in `drop` removed (recomputed post-merge from their
    * hidden partials), plus `extra` hidden aggregate columns (the
    * `__hv_<i>` partials a rewritten HAVING or expression column
    * references) appended to the select list. Only the top
    * aggregate/projection is rewritten — wrappers are descended, subtrees
    * below are untouched.
    */
  private def partialsPlanOf(
      p: LogicalPlan,
      avgs: Set[String],
      extra: Seq[NamedExpression] = Nil,
      drop: Set[String] = Set.empty): LogicalPlan = {
    def split(ne: NamedExpression): Seq[NamedExpression] = ne match {
      case Alias(_, n) if drop.contains(n) => Seq()
      case Alias(fn: UnresolvedFunction, n) if avgs.contains(n) =>
        Seq(
          Alias(fn.copy(nameParts = Seq("sum")), s"__as_$n")(),
          Alias(fn.copy(nameParts = Seq("count")), s"__ac_$n")())
      case other => Seq(other)
    }
    p match {
      case w: UnresolvedWith =>
        w.copy(child = partialsPlanOf(w.child, avgs, extra, drop))
      case s: SubqueryAlias =>
        s.copy(child = partialsPlanOf(s.child, avgs, extra, drop))
      case s: Sort             => partialsPlanOf(s.child, avgs, extra, drop)
      case h: UnresolvedHaving => partialsPlanOf(h.child, avgs, extra, drop)
      case a: Aggregate =>
        a.copy(aggregateExpressions = a.aggregateExpressions.flatMap(split) ++ extra)
      case pr: Project =>
        pr.copy(projectList = pr.projectList.flatMap(split) ++ extra)
      case other => other
    }
  }

  /** Parsed step plans plus the single-consumption chain algebra the delta
    * paths share. A stateless aliased pre-step is row-local, so
    * `Δf(A) = f(ΔA)` and a delta decomposition at the output propagates
    * through any chain of them — PROVIDED every step is consumed exactly
    * once and every input relation is scanned exactly once (re-use would
    * make one side's "old" frame observe the other side's delta).
    */
  private final class StepChains(
      spark: SparkSession,
      steps: Seq[(Option[String], SqlRewriter.Rewritten)]) {
    val outIdx: Int = steps.lastIndexWhere(_._1.isEmpty) match {
      case -1 => steps.length - 1
      case i  => i
    }
    val plans: Seq[(Option[String], LogicalPlan)] = steps.map { case (a, rw) =>
      (a, spark.sessionState.sqlParser.parsePlan(rw.sql))
    }
    def hasCte: Boolean = plans.exists(_._2.exists(_.isInstanceOf[UnresolvedWith]))
    val outPlan: LogicalPlan = plans(outIdx)._2

    private def scans(p: LogicalPlan): Seq[String] = p.collect {
      case r: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation =>
        r.multipartIdentifier.last
    }
    /** Pre-step alias → its plan (the output step's alias, if any, names a
      * view nothing may consume — guarded in [[soundUse]]). */
    private val stepByAlias: Map[String, LogicalPlan] =
      plans.zipWithIndex.collect {
        case ((Some(a), p), i) if i != outIdx => a -> p
      }.toMap
    private val duplicateAlias =
      stepByAlias.size != plans.zipWithIndex.count(x => x._1._1.isDefined && x._2 != outIdx)

    /** Resolve a relation name through single-scan pre-steps to the input
      * it terminates at; None on a multi-scan step or a cycle. */
    def terminal(name: String, seen: Set[String] = Set.empty): Option[String] =
      if (seen(name) || duplicateAlias) None
      else stepByAlias.get(name) match {
        case None => Some(name) // not a step alias ⇒ an input relation
        case Some(p) => scans(p) match {
          case Seq(one) => terminal(one, seen + name)
          case _        => None
        }
      }

    private val stepSqlByAlias: Map[String, String] =
      steps.zipWithIndex.collect {
        case ((Some(a), rw), i) if i != outIdx => a -> rw.sql
      }.toMap

    /** [[terminal]] plus the derivation itself: the ordered (alias, sql)
      * chain of single-scan pre-steps from the terminal input up to
      * `name`, empty when `name` is an input relation; None under the
      * same conditions as [[terminal]]. Statelessness of the chain is the
      * caller's Facts guard (the extractors exclude aggregates, ranking,
      * DISTINCT/LIMIT, subqueries, and time-varying literals chain-wide).
      */
    def derivationChain(
        name: String,
        seen: Set[String] = Set.empty): Option[(String, Vector[(String, String)])] =
      if (seen(name) || duplicateAlias) None
      else stepByAlias.get(name) match {
        case None => Some((name, Vector.empty))
        case Some(p) => scans(p) match {
          case Seq(one) =>
            derivationChain(one, seen + name).map { case (t, chain) =>
              (t, chain :+ (name -> stepSqlByAlias(name)))
            }
          case _ => None
        }
      }

    /** [[derivationChain]] generalized for a LEFT join's LEFT side: the
      * DEEPEST pre-step may be an INNER-join tree of several DISTINCT
      * direct input relations (the enrich-with-a-join pattern); every
      * other chain step stays single-scan. Inner joins and row-local
      * steps are multilinear in the relation multisets, so the standard
      * telescoping Δ(A⋈B) = ΔA⋈B_full ∪ A_old⋈ΔB gives the side's delta
      * and old frames. Returns the ordered terminal relations plus the
      * (alias, sql) chain (deepest first). None under [[terminal]]'s
      * conditions, or when the multi-scan step contains anything but
      * inner joins over direct, distinct relations (set-ops and
      * self-joins break the per-relation frame binding).
      */
    def leftSideChain(
        name: String,
        seen: Set[String] = Set.empty): Option[(Vector[String], Vector[(String, String)])] =
      if (seen(name) || duplicateAlias) None
      else stepByAlias.get(name) match {
        case None => Some((Vector(name), Vector.empty))
        case Some(p) => scans(p) match {
          case Seq(one) =>
            leftSideChain(one, seen + name).map { case (ts, chain) =>
              (ts, chain :+ (name -> stepSqlByAlias(name)))
            }
          case many =>
            import org.apache.spark.sql.catalyst.plans.Inner
            val joins = p.collect { case j: Join => j }
            val setOps = p.collect {
              case u: Union => u: LogicalPlan
              case i: Intersect => i
              case e: Except => e
            }
            val ok = joins.nonEmpty &&
              joins.forall(_.joinType == Inner) &&
              setOps.isEmpty &&
              many.forall(n => !stepByAlias.contains(n)) &&
              many.distinct.size == many.size
            if (ok) Some((many.toVector, Vector(name -> stepSqlByAlias(name))))
            else None
        }
      }

    /** Equi edges and passthrough column lineage of a [[leftSideChain]]
      * whose deepest step is a multi-relation inner join — the executor's
      * per-relation narrowing seeds. Best-effort: only plain
      * `qual.col = qual.col` conjuncts become edges and only aliased or
      * bare attribute projections contribute lineage; anything else is
      * simply absent (no narrowing on that column, never wrong results).
      * Type checks happen in the executor against the raw schemas.
      */
    def leftSideMeta(chain: Vector[(String, String)])
        : (Vector[(String, String, String, String)], Map[String, (String, String)]) = {
      import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation, UnresolvedStar}
      import org.apache.spark.sql.catalyst.expressions.{And, EqualTo}
      val deepest = chain.headOption.flatMap(h => stepByAlias.get(h._1))
        .getOrElse(return (Vector.empty, Map.empty))
      val relByQual: Map[String, String] = deepest.collect {
        case s: SubqueryAlias => s.child match {
          case r: UnresolvedRelation =>
            Seq(s.alias.toLowerCase -> r.multipartIdentifier.last)
          case _ => Nil
        }
        case r: UnresolvedRelation =>
          Seq(r.multipartIdentifier.last.toLowerCase -> r.multipartIdentifier.last)
      }.flatten.toMap
      def conj(e: Expression): Seq[Expression] = e match {
        case And(l, r) => conj(l) ++ conj(r)
        case other     => Seq(other)
      }
      val edges = deepest.collect { case j: Join => j }.flatMap(j =>
        j.condition.toSeq.flatMap(conj).collect {
          case EqualTo(l: UnresolvedAttribute, r: UnresolvedAttribute)
              if l.nameParts.length == 2 && r.nameParts.length == 2 =>
            for {
              ra <- relByQual.get(l.nameParts.head.toLowerCase)
              rb <- relByQual.get(r.nameParts.head.toLowerCase)
              if ra != rb
            } yield (ra, l.nameParts.last, rb, r.nameParts.last)
        }.flatten).toVector
      def topProject(p: LogicalPlan): Seq[NamedExpression] = p match {
        case s: SubqueryAlias => topProject(s.child)
        case s: Sort          => topProject(s.child)
        case pr: Project      => pr.projectList
        case _                => Nil
      }
      var src: Map[String, (String, String)] = topProject(deepest).flatMap {
        case Alias(a: UnresolvedAttribute, n) if a.nameParts.length == 2 =>
          relByQual.get(a.nameParts.head.toLowerCase)
            .map(r => n.toLowerCase -> (r, a.nameParts.last))
        case a: UnresolvedAttribute if a.nameParts.length == 2 =>
          relByQual.get(a.nameParts.head.toLowerCase)
            .map(r => a.nameParts.last.toLowerCase -> (r, a.nameParts.last))
        case _ => None
      }.toMap
      // higher single-scan steps rename through: bare or step-qualified
      // attrs and alias-of-attr compose; a star carries everything not
      // shadowed; expressions drop out of the lineage
      chain.drop(1).foreach { case (alias, _) =>
        val items = stepByAlias.get(alias).map(topProject).getOrElse(Nil)
        val hasStar = items.exists(_.isInstanceOf[UnresolvedStar])
        val mapped: Map[String, (String, String)] = items.flatMap {
          case Alias(a: UnresolvedAttribute, n) =>
            src.get(a.nameParts.last.toLowerCase).map(n.toLowerCase -> _)
          case a: UnresolvedAttribute =>
            src.get(a.nameParts.last.toLowerCase)
              .map(a.nameParts.last.toLowerCase -> _)
          case _ => None
        }.toMap
        src = (if (hasStar) src else Map.empty[String, (String, String)]) ++ mapped
      }
      (edges, src)
    }

    /** Every pre-step alias consumed exactly once, the given inputs scanned
      * exactly once each, nothing else referenced anywhere — the
      * use-once discipline the delta decomposition needs. */
    def soundUse(inputs: Seq[String]): Boolean = {
      val outAlias = plans(outIdx)._1
      val all = plans.flatMap(p => scans(p._2))
      !duplicateAlias &&
        !outAlias.exists(all.contains) &&
        all.sorted == (stepByAlias.keys.toSeq ++ inputs).sorted
    }

    /** Site-based relaxation of [[soundUse]] for the inlined join tree: a
      * pre-step alias may be consumed at SEVERAL sites (each expansion is
      * an independent leaf position of the multilinear tree, exactly like
      * a self-joined input relation). Demands: no duplicate alias
      * definitions, the output alias never consumed, every pre-step
      * reached by the output expansion, and every plan-level scan either a
      * step alias or one of the expanded terminal inputs — so nothing is
      * referenced that the expansion did not account for. Reused steps may
      * themselves CONTAIN joins (round 8): the per-site join balance in
      * [[resolveInnerJoinTree]] counts a step's joins once per expansion
      * site, so the multiplied joins stay accounted for.
      */
    def soundUseSites(ls: Seq[String], used: Map[String, Int]): Boolean = {
      val outAlias = plans(outIdx)._1
      val all = plans.flatMap(p => scans(p._2))
      !duplicateAlias &&
        !outAlias.exists(all.contains) &&
        stepByAlias.keySet == used.keySet &&
        all.forall(n => stepByAlias.contains(n) || ls.contains(n))
    }

    /** The output plan with every pre-step alias inlined in place (each
      * consumption site gets its own SubqueryAlias-wrapped copy of the
      * step's plan, recursively). Only called after [[resolveInnerJoinTree]]
      * proved the reference graph acyclic. */
    def inlineOut(): LogicalPlan = {
      def inline(p: LogicalPlan): LogicalPlan = p.transformUp {
        case r: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
            if stepByAlias.contains(r.multipartIdentifier.last) =>
          val n = r.multipartIdentifier.last
          SubqueryAlias(n, inline(stepByAlias(n)))
      }
      inline(outPlan)
    }

    /** The chain's INNER-join tree (plain, USING, or NATURAL joins, k ≥ 1
      * of them, possibly spread across steps via aliased pre-steps) whose
      * leaves resolve to n = k+1 input-relation SCAN SITES under the
      * use-once discipline — a relation may appear at several sites
      * (self-join): the tree is multilinear over sites, not names, and the
      * executor binds repeated names per occurrence. None when any join is
      * outer/semi/anti, a step alias is consumed twice, a non-join
      * operator (UNION, aggregate below a join side, …) combines
      * relations, or the discipline fails. Stateless wrappers (project/filter/sort/alias)
      * between joins are row-local and pass through; the top-of-output
      * Aggregate / Distinct / HAVING wrappers pass through too — the
      * callers' Facts guards decide whether those are allowed, and their
      * own fast paths account for them (agg-merge, distinct-delta).
      */
    def resolveInnerJoinTree(allowReuse: Boolean = false): Option[JoinDelta] = {
      import org.apache.spark.sql.catalyst.plans.{Inner, NaturalJoin, UsingJoin}
      def isInner(j: Join): Boolean = j.joinType match {
        case Inner               => true
        case UsingJoin(Inner, _) => true
        case NaturalJoin(Inner)  => true
        case _                   => false
      }
      val useCounts = scala.collection.mutable.Map.empty[String, Int]
      val allJoins = plans.flatMap(_._2.collect { case j: Join => j })
      if (allJoins.isEmpty || !allJoins.forall(isInner)) return None
      def leaves(p: LogicalPlan, seen: Set[String]): Option[Vector[String]] =
        p match {
          case pr: Project         => leaves(pr.child, seen)
          case fl: Filter          => leaves(fl.child, seen)
          case s: Sort             => leaves(s.child, seen)
          case sa: SubqueryAlias   => leaves(sa.child, seen)
          case d: Distinct         => leaves(d.child, seen)
          case a: Aggregate        => leaves(a.child, seen)
          case h: UnresolvedHaving => leaves(h.child, seen)
          case j: Join =>
            for {
              l <- leaves(j.left, seen)
              r <- leaves(j.right, seen)
            } yield l ++ r
          case r: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation =>
            val n = r.multipartIdentifier.last
            stepByAlias.get(n) match {
              // a repeated INPUT relation is fine — each scan site is an
              // independent leaf position of the multilinear tree, and the
              // executor binds self-join sites per occurrence
              // (runDeltaJoin). A step alias consumed at SEVERAL sites is
              // the same thing once inlined per site ([[inlineOut]]) —
              // allowed under `allowReuse`, including steps CONTAINING
              // joins (round 8): their joins multiply per site in the
              // expansion, which the per-site join balance accounts for.
              // `seen` tracks the PATH only, so re-entry across sibling
              // sites is reuse, within one expansion a cycle.
              case Some(sp) =>
                if (seen(n)) None
                else {
                  useCounts(n) = useCounts.getOrElse(n, 0) + 1
                  leaves(sp, seen + n)
                }
              case None     => Some(Vector(n))
            }
          case _ => None
        }
      for {
        ls <- leaves(outPlan, Set.empty)
        // every collected join sits in the single EXPANSION tree: the
        // output plan's joins count once, a step's joins once per
        // expansion site (useCounts) — a binary join tree with J joins
        // has J+1 leaves. With no reuse this degenerates to the plan-level
        // balance (each reached step counted once; a join hiding in an
        // unreached step is rejected by soundUse/soundUseSites).
        joinsIn = (p: LogicalPlan) => p.collect { case j: Join => j }.size
        expansionJoins = joinsIn(outPlan) + useCounts.map {
          case (a, k) => joinsIn(stepByAlias(a)) * k }.sum
        if ls.size == expansionJoins + 1
        reused = useCounts.exists(_._2 > 1)
        if (if (reused) allowReuse && soundUseSites(ls, useCounts.toMap)
            else soundUse(ls))
      } yield
        if (reused) JoinDelta(ls, Some(inlineOut()))
        else JoinDelta(ls)
    }

    /** The chain's single LEFT OUTER join with an ON condition, each side
      * a direct (optionally aliased) input relation — or, since round 9,
      * a [[derivationChain]] of stateless single-scan pre-steps down to
      * one — each terminal scanned exactly once. The executor evaluates
      * the ON predicate against the DERIVED frames for the matched-state
      * semi/anti joins (identity derivation for direct sides). The join
      * may sit in a pre-step consumed by stateless later steps, or under
      * the output step's aggregate — the callers' Facts guards decide
      * which.
      */
    def resolveSingleLeftJoin(): Option[LeftJoinDelta] = {
      import org.apache.spark.sql.catalyst.plans.LeftOuter
      val joins = plans.flatMap(_._2.collect { case j: Join => j })
      val leftOuters = joins.filter(_.joinType == LeftOuter)
      if (leftOuters.size != 1) return None
      val j = leftOuters.head
      if (j.condition.isEmpty) return None
      def relAlias(p: LogicalPlan): Option[(String, String)] = p match {
        case s: SubqueryAlias =>
          s.child match {
            case r: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation =>
              Some((r.multipartIdentifier.last, s.alias))
            case _ => None
          }
        case r: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation =>
          Some((r.multipartIdentifier.last, r.multipartIdentifier.last))
        case _ => None
      }
      for {
        (a, la) <- relAlias(j.left)
        (b, rb) <- relAlias(j.right)
        (tas, da) <- leftSideChain(a)
        (tb, db) <- derivationChain(b)
        // distinct terminals: the Δ/old framing needs independent inputs
        // (a self-left-join through derivations would let one side's
        // "old" frame observe the other side's delta)
        if !tas.contains(tb) && soundUse(tas :+ tb)
        // every OTHER join in the chain must be an inner join inside the
        // left side's deepest step (the shape leftSideChain validated) —
        // a join anywhere else is outside this decomposition
        deepestJoins = da.headOption
          .flatMap(h => stepByAlias.get(h._1))
          .map(_.collect { case jn: Join => jn }.size).getOrElse(0)
        if joins.size == 1 + deepestJoins
      } yield {
        val (edges, colSrc) =
          if (tas.size > 1) leftSideMeta(da)
          else (Vector.empty[(String, String, String, String)],
            Map.empty[String, (String, String)])
        LeftJoinDelta(tas.head, la, tb, rb, j.condition.get.sql, da, db,
          leftRels = if (tas.size > 1) tas else Vector.empty,
          leftEdges = edges, leftColSources = colSrc)
      }
    }
  }

  /** Detect the append-only delta-join shape: the chain holds a tree of
    * INNER joins (plain, USING, or NATURAL) — in the output step and/or
    * pre-steps (the executor re-runs the whole chain per delta term, and a
    * stateless post-join step is row-local) — whose leaves resolve
    * through chains of stateless single-scan pre-steps to n DISTINCT
    * input relations, with the use-once discipline of [[StepChains]] and
    * nothing stateful anywhere: no aggregates, ranking, DISTINCT/LIMIT,
    * subqueries, time-varying literals, or CTEs (their bodies are not plan
    * children; classification over them is unsound — same rule as
    * [[extractRankTouch]]). The join predicates themselves are
    * unrestricted: the delta decomposition holds for any inner θ-join
    * tree.
    */
  private def extractJoinDelta(
      spark: SparkSession,
      steps: Seq[(Option[String], SqlRewriter.Rewritten)],
      f: Facts): Option[JoinDelta] = {
    val onlyJoin = f.regularJoins >= 1 && f.plainAggs.isEmpty &&
      f.rankSpecs.isEmpty && !f.otherWindowFns && !f.distinctOrLimit &&
      !f.hasSubquery && f.intervalUppers.isEmpty &&
      !steps.exists(_._2.timeVarying)
    if (!onlyJoin) return None
    val chains = new StepChains(spark, steps)
    if (chains.hasCte) return None
    // reuse allowed only on THIS path: the other consumers of a join tree
    // (aggregate-above-join partials, distinct-over-join) build plan
    // overrides that the inlined form does not yet compose with
    chains.resolveInnerJoinTree(allowReuse = true)
  }

  /** Detect the left-join delta shape (see [[LeftJoinDelta]]): one LEFT
    * OUTER join with an ON condition — in the output step or a pre-step
    * consumed by stateless later steps — both sides direct (optionally
    * aliased) input relations each scanned exactly once under
    * [[StepChains]]'s use-once discipline, nothing else stateful — same
    * exclusions as [[extractJoinDelta]].
    */
  private def extractLeftJoinDelta(
      spark: SparkSession,
      steps: Seq[(Option[String], SqlRewriter.Rewritten)],
      f: Facts): Option[LeftJoinDelta] = {
    // >= 1: beyond the LEFT join itself, the only other joins admitted
    // are inner joins inside the left side's deepest pre-step —
    // [[StepChains.resolveSingleLeftJoin]] verifies that structure
    val onlyJoin = f.regularJoins >= 1 && f.plainAggs.isEmpty &&
      f.rankSpecs.isEmpty && !f.otherWindowFns && !f.distinctOrLimit &&
      !f.hasSubquery && f.intervalUppers.isEmpty &&
      !steps.exists(_._2.timeVarying)
    if (!onlyJoin) return None
    val chains = new StepChains(spark, steps)
    if (chains.hasCte) return None
    chains.resolveSingleLeftJoin()
  }

  /** Detect the append-only DISTINCT shape: the output step is one DISTINCT
    * at the top (below an optional ORDER BY) over a stateless derivation
    * that resolves — through single-scan pre-steps — to one input relation
    * OR to the chain's single inner join ([[JoinDelta]] conditions), under
    * [[StepChains]]'s use-once discipline; no aggregates, ranking,
    * LIMIT/set-ops, subqueries, time-varying literals, or CTEs. A UNION
    * under the DISTINCT scans two relations without a join and is excluded
    * by the scan count.
    */
  private def extractDistinctDelta(
      spark: SparkSession,
      steps: Seq[(Option[String], SqlRewriter.Rewritten)],
      f: Facts): Option[DistinctDelta] = {
    // distincts >= 1: further Distincts BELOW the top are support-
    // preserving no-ops on the append-only path (the chain runs as
    // written over the slice; an inner distinct only collapses
    // multiplicities the top distinct erases anyway)
    val onlyDistinct = f.distincts >= 1 && !f.limitOrSetOp &&
      f.plainAggs.isEmpty && f.rankSpecs.isEmpty &&
      !f.otherWindowFns && !f.hasSubquery && f.intervalUppers.isEmpty &&
      !steps.exists(_._2.timeVarying)
    if (!onlyDistinct) return None
    val chains = new StepChains(spark, steps)
    if (chains.hasCte) return None
    def unwrap(p: LogicalPlan): LogicalPlan = p match {
      case s: Sort => unwrap(s.child)
      case other   => other
    }
    if (!unwrap(chains.outPlan).isInstanceOf[Distinct]) return None
    if (f.regularJoins >= 1)
      return chains.resolveInnerJoinTree()
        .map(jd => DistinctDelta(jd.rels.head, Some(jd)))
    chains.outPlan.collect {
      case r: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation =>
        r.multipartIdentifier.last
    } match {
      case Seq(only) =>
        chains.terminal(only)
          .filter(t => chains.soundUse(Seq(t)))
          .map(DistinctDelta(_))
      case _ => None
    }
  }

  /** Detect the touched-partition ranking shape: one keyed rank spec (keys
    * defined ⇒ the rank is filtered and partition keys survive to the
    * output), the chain resolving — through stateless single-scan
    * pre-steps under [[StepChains]]'s use-once discipline — to exactly one
    * input relation, partition columns never re-defined by an alias in ANY
    * step (so the raw slice's values of those columns are a superset of
    * the touched output partitions), no subqueries, no time-varying
    * literals, no CTEs (their bodies are not plan children and can even
    * shadow the input alias, re-keying partitions while the raw slice
    * still holds the un-derived values — same rule as the delta paths).
    * Under those conditions rows of un-touched partitions cannot change
    * between runs. Covers both the nested single-step spelling and the
    * two-step `ranked` / `WHERE rn = 1` spelling.
    */
  private def extractRankTouch(
      spark: SparkSession,
      steps: Seq[(Option[String], SqlRewriter.Rewritten)],
      f: Facts,
      keys: Option[Seq[String]]): Option[RankTouch] = {
    val onlyRank = f.rankSpecs.size == 1 && f.plainAggs.isEmpty &&
      f.regularJoins == 0 && !f.otherWindowFns && !f.distinctOrLimit &&
      !f.hasSubquery && !steps.exists(_._2.timeVarying)
    if (!onlyRank || keys.isEmpty) return None
    val pk = f.rankSpecs.head._2.getOrElse(return None)
    if (pk.isEmpty) return None
    val chains = new StepChains(spark, steps)
    if (chains.hasCte) return None
    val redefined = chains.plans.exists(_._2.exists(_.expressions.exists(_.exists {
      case Alias(_, n) => pk.contains(n)
      case _           => false
    })))
    if (redefined) return None
    chains.outPlan.collect {
      case r: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation =>
        r.multipartIdentifier.last
    } match {
      case Seq(only) =>
        chains.terminal(only)
          .filter(t => chains.soundUse(Seq(t)))
          .map(RankTouch(_, pk))
      case _ => None
    }
  }

  /** Touched-group narrowing for a single non-windowed aggregation: a
    * group's output row depends only on that group's input rows, so a run
    * that recomputes (non-mergeable aggregate functions, or a merge-path
    * chain flipped by a retraction) only needs the buffered history of the
    * groups whose key values appear in this run's slice — the same
    * narrowing [[extractRankTouch]] provides for partitioned rankings.
    * Demands the same provenance discipline: every group key must be a RAW
    * input column surviving the chain unrenamed (any alias re-defining a
    * key name anywhere, a CTE, or multiple relations disqualifies), so the
    * slice's key values can narrow the raw buffer by semi-join.
    */
  private def extractAggTouch(
      spark: SparkSession,
      steps: Seq[(Option[String], SqlRewriter.Rewritten)],
      f: Facts): Option[RankTouch] = {
    val onlyAgg = f.plainAggs.size == 1 && f.rankSpecs.isEmpty &&
      f.regularJoins == 0 && !f.otherWindowFns && !f.distinctOrLimit &&
      !f.hasSubquery && !steps.exists(_._2.timeVarying)
    if (!onlyAgg) return None
    val ks = f.plainAggs.head.getOrElse(return None)
    if (ks.isEmpty) return None // global aggregate: one group, nothing to narrow
    val chains = new StepChains(spark, steps)
    if (chains.hasCte) return None
    val redefined = chains.plans.exists(_._2.exists(_.expressions.exists(_.exists {
      case Alias(_, n) => ks.contains(n)
      case _           => false
    })))
    if (redefined) return None
    chains.outPlan.collect {
      case r: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation =>
        r.multipartIdentifier.last
    } match {
      case Seq(only) =>
        chains.terminal(only)
          .filter(t => chains.soundUse(Seq(t)))
          .map(RankTouch(_, ks))
      case _ => None
    }
  }

  /** Touched-group narrowing for MULTI-stateful single-input chains —
    * nested aggregations (GROUP BY over GROUP BY), rankings over
    * aggregates, and mixes — where EVERY stateful operator partitions by a
    * superset of one common non-empty column set. Restricted to the common
    * columns each aggregation/ranking is partition-local and everything
    * between is row-local, so output rows of a partition depend only on
    * that partition's input rows: the executor recomputes and diffs only
    * the partitions the new slice touches and carries the rest —
    * O(touched-partition history), not O(full history), per run, for
    * shapes the per-key merge algebra cannot express. Same provenance
    * discipline as [[extractRankTouch]]: the common columns must be RAW
    * input columns never re-aliased in any step, single input relation
    * under use-once, no CTEs, subqueries, or time-varying literals.
    */
  private def extractGroupTouch(
      spark: SparkSession,
      steps: Seq[(Option[String], SqlRewriter.Rewritten)],
      f: Facts): Option[RankTouch] = {
    val eligible = f.plainAggs.size + f.rankSpecs.size >= 2 &&
      f.regularJoins == 0 && !f.otherWindowFns && !f.distinctOrLimit &&
      !f.hasSubquery && f.intervalUppers.isEmpty &&
      !steps.exists(_._2.timeVarying)
    if (!eligible) return None
    val keySets: List[Seq[String]] =
      f.plainAggs.map(_.getOrElse(return None)) ++
        f.rankSpecs.map(_._2.getOrElse(return None))
    if (keySets.exists(_.isEmpty)) return None // a global stage sees all rows
    val common = keySets.map(_.toSet).reduce(_ intersect _)
    val cols = keySets.head.filter(common) // deterministic column order
    if (cols.isEmpty) return None
    val chains = new StepChains(spark, steps)
    if (chains.hasCte) return None
    val redefined = chains.plans.exists(_._2.exists(_.expressions.exists(_.exists {
      case Alias(_, n) => common.contains(n)
      case _           => false
    })))
    if (redefined) return None
    chains.outPlan.collect {
      case r: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation =>
        r.multipartIdentifier.last
    } match {
      case Seq(only) =>
        chains.terminal(only)
          .filter(t => chains.soundUse(Seq(t)))
          .map(RankTouch(_, cols))
      case _ => None
    }
  }

  /** Diff identity for a nested-aggregation chain (2+ plain aggregates, no
    * rankings, joins, or DISTINCT/LIMIT): when the OUTPUT step's top is
    * itself an aggregate the result has exactly one row per outer group
    * whatever the inner stateful steps did, so the outer GROUP BY keys are
    * a sound keyed-diff identity (Some(Nil) for a global outer aggregate —
    * a single row).
    */
  private def nestedAggKeys(
      spark: SparkSession,
      steps: Seq[(Option[String], SqlRewriter.Rewritten)],
      f: Facts,
      aggAtOutputTop: Boolean): Option[Seq[String]] = {
    val nested = f.plainAggs.size >= 2 && f.rankSpecs.isEmpty &&
      f.regularJoins == 0 && !f.otherWindowFns && !f.distinctOrLimit &&
      aggAtOutputTop
    if (!nested) return None
    val outIdx = steps.lastIndexWhere(_._1.isEmpty) match {
      case -1 => steps.length - 1
      case i  => i
    }
    def unwrap(p: LogicalPlan): LogicalPlan = p match {
      case w: UnresolvedWith   => unwrap(w.child)
      case s: SubqueryAlias    => unwrap(s.child)
      case s: Sort             => unwrap(s.child)
      case h: UnresolvedHaving => unwrap(h.child)
      case other               => other
    }
    unwrap(spark.sessionState.sqlParser.parsePlan(steps(outIdx)._2.sql)) match {
      case a: Aggregate                                     => mapGroupKeys(a)
      case p: Project if p.projectList.exists(containsAggFn) => Some(Nil)
      case _                                                => None
    }
  }

  /** True when the output step's top node (below WITH/alias/ORDER/HAVING
    * wrappers) is an aggregation — a real Aggregate, or a bare Project
    * calling aggregate functions (the global-aggregate parse shape). */
  private def aggTopsOutputStep(
      spark: SparkSession,
      steps: Seq[(Option[String], SqlRewriter.Rewritten)]): Boolean = {
    val outIdx = steps.lastIndexWhere(_._1.isEmpty) match {
      case -1 => steps.length - 1
      case i  => i
    }
    def unwrap(p: LogicalPlan): LogicalPlan = p match {
      case w: UnresolvedWith   => unwrap(w.child)
      case s: SubqueryAlias    => unwrap(s.child)
      case s: Sort             => unwrap(s.child)
      case h: UnresolvedHaving => unwrap(h.child)
      case other               => other
    }
    unwrap(spark.sessionState.sqlParser.parsePlan(steps(outIdx)._2.sql)) match {
      case _: Aggregate => true
      case p: Project   => p.projectList.exists(containsAggFn)
      case _            => false
    }
  }

  /** The canonical Top-N shape re-expressed for the streaming executor: a
    * single step `SELECT <cols>, rn FROM (SELECT <cols>, row_number() OVER
    * (PARTITION BY p ORDER BY o DESC[, t ASC]) AS rn FROM input) WHERE
    * rn <= n | rn = 1`, with every referenced column passing through as a
    * plain (possibly aliased) attribute. All names are OUTPUT names so the
    * executor can replay the stored visible snapshot as the seed state of
    * [[graft.streaming.StreamingTopN]].
    *
    * Determinism contract (same as the batch oracle's): `(o, t)` — or `o`
    * alone when no tiebreak is written — must be unique per partition.
    * Exact ties rank arbitrarily in batch row_number but would COLLAPSE in
    * the streaming operator (state keyed on (ord, tie)), so the streaming
    * executor enforces the contract at runtime: a tie over seed ∪ slice
    * raises InvalidQuery rather than silently dropping a row.
    */
  final case class StreamTopN(
      input: String,
      partCol: String,
      ordCol: String,
      tieCol: String,
      n: Int,
      rankOut: String,
      outCols: Seq[String],
      slicePlan: LogicalPlan)

  /** Match the streaming-supported Top-N shape (None ⇒ the shape is not
    * servable by the streaming executor; the caller decides whether that
    * means InvalidQuery or the batch path). */
  def extractStreamTopN(
      spark: SparkSession,
      steps: Seq[(Option[String], SqlRewriter.Rewritten)]): Option[StreamTopN] = {
    if (steps.length != 1 || steps.head._1.isDefined) return None
    def unwrap(p: LogicalPlan): LogicalPlan = p match {
      case s: SubqueryAlias => unwrap(s.child)
      case s: Sort          => unwrap(s.child)
      case other            => other
    }
    def attrName(e: Expression): Option[String] = e match {
      case a: UnresolvedAttribute => Some(a.nameParts.last)
      case _                      => None
    }
    // (outputName, referencedChildName) of a plain projection entry
    def passThrough(ne: NamedExpression): Option[(String, String)] = ne match {
      case a: UnresolvedAttribute => Some((a.nameParts.last, a.nameParts.last))
      case Alias(a: UnresolvedAttribute, n) => Some((n, a.nameParts.last))
      case _ => None
    }
    unwrap(spark.sessionState.sqlParser.parsePlan(steps.head._2.sql)) match {
      case Project(outerList, Filter(cond, sub)) =>
        val (innerList, rel) = unwrap(sub) match {
          case Project(il, r: UnresolvedRelation) => (il, r)
          case _                                  => return None
        }
        // exactly one rank alias; all other inner entries pass through
        val rankEntries = innerList.collect {
          case al @ Alias(WindowExpression(fn: UnresolvedFunction,
            ws: WindowSpecDefinition), _)
              if fn.nameParts.last.equalsIgnoreCase("row_number") &&
                fn.arguments.isEmpty => (al, ws)
        }
        val (rankAlias, ws) = rankEntries match {
          case Seq(one) => one
          case _        => return None
        }
        val innerPass = innerList.filterNot(_ eq rankAlias).map(passThrough)
        if (innerPass.contains(None)) return None
        val innerMap = innerPass.flatten.toMap // outputName -> source col
        // window spec: PARTITION BY p ORDER BY o DESC [, t ASC]
        val srcPart = ws.partitionSpec match {
          case Seq(e) => attrName(e).getOrElse(return None)
          case _      => return None
        }
        val (srcOrd, srcTie) = ws.orderSpec match {
          case Seq(SortOrder(o, Descending, _, _)) =>
            val n = attrName(o).getOrElse(return None); (n, n)
          case Seq(SortOrder(o, Descending, _, _),
            SortOrder(t, Ascending, _, _)) =>
            (attrName(o).getOrElse(return None),
              attrName(t).getOrElse(return None))
          case _ => return None
        }
        // rank predicate: rn <= n / rn < n / rn = 1 (either operand order)
        val rnName = rankAlias.name
        def asRank(e: Expression): Boolean = attrName(e).contains(rnName)
        def intLit(e: Expression): Option[Int] = e match {
          case Literal(v: Int, _)  => Some(v)
          case Literal(v: Long, _) => Some(v.toInt)
          case _                   => None
        }
        val n = (cond match {
          case LessThanOrEqual(l, r) if asRank(l) => intLit(r)
          case LessThan(l, r) if asRank(l)        => intLit(r).map(_ - 1)
          case GreaterThanOrEqual(l, r) if asRank(r) => intLit(l)
          case GreaterThan(l, r) if asRank(r)     => intLit(l).map(_ - 1)
          case EqualTo(l, r) if asRank(l)         => intLit(r).filter(_ == 1)
          case EqualTo(l, r) if asRank(r)         => intLit(l).filter(_ == 1)
          case _                                  => None
        }) match {
          case Some(v) if v >= 1 => v
          case _                 => return None
        }
        // outer projection: plain (possibly aliased) references only
        val outerPass = outerList.map(passThrough)
        if (outerPass.contains(None)) return None
        val outer = outerPass.flatten // (outName, innerName)
        val rankOut = outer.collectFirst {
          case (o, i) if i == rnName => o
        }.getOrElse(return None)
        if (outer.count(_._2 == rnName) != 1) return None
        // output name of an inner SOURCE column (p/o/t): the outer entry
        // whose inner reference passes that source column through
        def outNameOf(src: String): Option[String] = outer.collectFirst {
          case (o, i) if i != rnName && innerMap.get(i).contains(src) => o
        }
        val (partOut, ordOut, tieOut) =
          (outNameOf(srcPart), outNameOf(srcOrd), outNameOf(srcTie)) match {
            case (Some(p), Some(o), Some(t)) => (p, o, t)
            case _                           => return None
          }
        val slicePlan = Project(
          outerList.filterNot(ne => passThrough(ne).exists(_._2 == rnName)),
          Project(innerList.filterNot(_ eq rankAlias), rel))
        Some(StreamTopN(rel.multipartIdentifier.last, partOut, ordOut,
          tieOut, n, rankOut, outer.map(_._1), slicePlan))
      case _ => None
    }
  }

  /** Diff identity for SnapshotDiff mode: partition keys + rank alias for a
    * single filtered ranking query (Top-N / dedup-latest), group keys for a
    * single non-windowed aggregation. An aggregation composed with regular
    * joins stays keyed only when it TOPS the output step (one output row
    * per group regardless of what is joined below it); an aggregate feeding
    * a join produces multi-row output where the group keys are not an
    * identity. Anything more complex pairs by full-row multiset.
    */
  private def snapshotKeys(f: Facts, aggAtOutputTop: Boolean): Option[Seq[String]] = {
    val onlyRank = f.rankSpecs.size == 1 && f.plainAggs.isEmpty &&
      f.regularJoins == 0 && !f.otherWindowFns && !f.distinctOrLimit
    val onlyAgg = f.plainAggs.size == 1 && f.rankSpecs.isEmpty &&
      (f.regularJoins == 0 || aggAtOutputTop) && !f.otherWindowFns &&
      !f.distinctOrLimit

    if (onlyRank) {
      val (alias, partKeys) = f.rankSpecs.head
      (alias, partKeys) match {
        // Top-N / dedup: the rank must actually be filtered on, else ranks
        // shift arbitrarily and the multiset diff is the honest answer.
        case (Some(a), Some(pk)) if f.filterAttrs.contains(a) => Some(pk :+ a)
        case _                                                => None
      }
    } else if (onlyAgg) {
      f.plainAggs.head // may be Some(Nil): global aggregate, single group
    } else None
  }
}
