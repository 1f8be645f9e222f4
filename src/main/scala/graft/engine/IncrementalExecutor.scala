package graft.engine

import java.time.Instant

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.TransformEngine.LoadedInput
import graft.operators.{AsOfJoin, Changelog}
import graft.protocol.{DatasetVocabulary, Op}

/** Executes one incremental micro-batch over (buffered state ∪ new slices).
  *
  * The execution mode comes from [[PlanClassifier]] over the parsed step
  * plans (not SQL regexes):
  *
  *   - Stateless: register slices, run, emit everything.
  *   - Windowed (tumbling agg / interval join): buffer full inputs, run over
  *     history, gate emission by the watermark algebra below, prune buffers
  *     to open windows.
  *   - AsOf: temporal join with probe hold-back and version-store state.
  *   - SnapshotDiff: recompute the query over full buffered history and diff
  *     against the previous output snapshot, emitting +I/-D/-U/+U — the
  *     generic incremental path for non-windowed GROUP BY, Top-N / dedup
  *     rankings, DISTINCT and regular joins (what Flink's retract mode does
  *     operator-by-operator, realized here as recompute + diff, which Spark
  *     executes as two scans and one join — scale-bounded by snapshot size,
  *     not history size, for keyed diffs).
  *
  * Watermark algebra (SURVEY.md §7.4): with an interval join of upper bound
  * U in the step chain,
  *
  *   reported output watermark = min(input watermarks) − U
  *
  * and a result row is emitted when its WINDOW END (event time + window
  * duration for fixed windows, add_months for calendar windows, the event
  * time itself when no window or when the query projects TUMBLE_END as its
  * event time) lies in (previous reported, new reported] — so closed
  * windows / expired join horizons emit exactly once across runs, late rows
  * into still-open windows are aggregated, and late rows into closed windows
  * are dropped, matching the reference's observable behavior
  * (EngineAggregationTest, EngineJoinStreamToStreamTest golden chains).
  */
final class IncrementalExecutor(
    spark: SparkSession,
    store: StateStore,
    ledger: Ledger,
    inputs: Seq[LoadedInput],
    steps: Seq[(Option[String], SqlRewriter.Rewritten)],
    vocab: DatasetVocabulary,
    temporalTables: Map[String, Vector[String]] = Map.empty,
    /** Opt-in (transform.engine = "spark-streaming"): execute the relational
      * work through Structured Streaming — parquet stream sources over the
      * staged frames, `Trigger.AvailableNow`, foreachBatch parquet sink —
      * while the engine keeps its explicit watermark algebra, state, and
      * offset/sink machinery, so output slices are byte-identical to batch
      * execution. Supported for stateless and tumbling-window shapes (the
      * aggregation runs in complete output mode; emission gating stays with
      * the ledger because Spark's own watermark semantics cannot honor
      * request-supplied explicit watermarks — SURVEY §7.2); anything else
      * is InvalidQuery, never a silent fallback.
      */
    streamingMode: Boolean = false
) {

  import IncrementalExecutor._

  /** Streaming-face scratch dirs (staged inputs, checkpoints, foreachBatch
    * sinks) created during this run. The emitted frame may lazily read
    * them, so they must outlive the sink write — the engine calls
    * [[cleanupScratch]] once the output slice is on disk (try/finally), so
    * a long-lived engine process doesn't leak disk per streaming run.
    */
  private val scratchDirs =
    scala.collection.mutable.Buffer.empty[java.nio.file.Path]

  private def scratchDir(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    scratchDirs += p
    p.toString
  }

  /** Frames persisted for the run because several downstream actions
    * consume them (emission, state updates, emptiness checks) — without
    * pinning, a 3-frame join pass would be re-evaluated once per consumer.
    * Unpersisted by [[cleanupScratch]] once the sink write is done. */
  private val pinnedFrames = scala.collection.mutable.Buffer.empty[DataFrame]

  private def pin(df: DataFrame): DataFrame = {
    val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    pinnedFrames += p
    p
  }

  /** Recursively delete every scratch dir this run created and unpersist
    * the run's pinned frames. Idempotent; deletion failures are swallowed
    * (cleanup must never mask the run's own result). */
  def cleanupScratch(): Unit = {
    pinnedFrames.foreach(f =>
      try f.unpersist(blocking = false) catch { case _: Throwable => () })
    pinnedFrames.clear()
    scratchDirs.foreach { p =>
      try {
        import scala.jdk.CollectionConverters._
        val walk = java.nio.file.Files.walk(p)
        // close the walk stream (it holds directory handles) even when
        // iteration throws; walk wraps I/O errors in UncheckedIOException,
        // so the swallow must be NonFatal, not IOException-only
        val files =
          try walk.iterator().asScala.toSeq finally walk.close()
        files
          .sortBy(-_.getNameCount)
          .foreach(f => try java.nio.file.Files.deleteIfExists(f) catch {
            case scala.util.control.NonFatal(_) => ()
          })
      } catch { case scala.util.control.NonFatal(_) => () }
    }
    scratchDirs.clear()
  }

  final case class ExecResult(
      emitted: DataFrame,
      newWatermark: Option[Instant],
      emitThreshold: Option[Instant],
      emissionOrder: Option[Seq[Column]],
      retractiveInputs: Set[String] = Set.empty
  )

  /** Parsed plan of the as-of step (its SQL is pre-normalized to plain
    * Spark join syntax by SqlRewriter, so Spark's own parser handles it). */
  private lazy val asOfStepPlan
      : Option[org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] =
    steps.collectFirst {
      case (_, rw) if rw.asOf.isDefined =>
        spark.sessionState.sqlParser.parsePlan(rw.sql)
    }
  private val tumble = steps.flatMap(_._2.tumble).headOption
  private val asOf = steps.flatMap(_._2.asOf).headOption
  private val mode = PlanClassifier.classify(spark, steps) match {
    // The classifier derives join-delta leaves from the chain alone (it
    // never sees the request's inputs), so a chain referencing an
    // undeclared relation can still classify as JoinDelta — and would die
    // in joinDeltaBinding's occurrence check as an IllegalArgumentException
    // (InternalError) instead of the clean TABLE_OR_VIEW_NOT_FOUND the
    // recompute path raises. Strip the delta proof when any leaf is not a
    // declared input; the recompute fallback surfaces the normal analysis
    // error as InvalidQuery.
    case d: PlanClassifier.Mode.SnapshotDiff
        if d.joinDelta.exists(jd => !jd.rels.forall(inputRelNames)) =>
      d.copy(joinDelta = None)
    case m => m
  }

  /** Streaming-servable Top-N shape, when the chain has one (evaluated
    * only under streamingMode). */
  private lazy val streamTopN: Option[PlanClassifier.StreamTopN] =
    PlanClassifier.extractStreamTopN(spark, steps)

  /** The emitted event-time column is a window END (aliased from
    * TUMBLE_END), so gating uses its value directly instead of adding one
    * window duration — conflating the two would prune buffers one full
    * window before the emission gate opens (silent data loss).
    */
  private val eventTimeIsWindowEnd: Boolean =
    steps.exists(_._2.endAliases.contains(vocab.eventTimeColumn)) &&
      !steps.exists(_._2.startAliases.contains(vocab.eventTimeColumn))

  private def byAlias(a: String): Option[LoadedInput] =
    inputs.find(_.spec.queryAlias == a)

  def run(): ExecResult = {
    if (streamingMode) mode match {
      case PlanClassifier.Mode.Stateless => ()
      // All windowed shapes are attempted: tumbling aggs materialize in
      // complete mode, interval joins in append mode (a one-shot
      // AvailableNow inner join holds state for the whole run — exact).
      // Shapes Structured Streaming itself rejects (outer joins without
      // watermarks, joins under complete mode) surface their
      // AnalysisException as InvalidQuery — never a silently different
      // result.
      case _: PlanClassifier.Mode.Windowed => ()
      // As-of joins run the join itself through the streaming operator
      // (flatMapGroupsWithState hold-back); Top-N changelogs replay the
      // stored snapshot as seed state and process the slice as one
      // micro-batch — both keep the engine's explicit watermark algebra
      // and are byte-identical to batch execution.
      case PlanClassifier.Mode.AsOfJoin | PlanClassifier.Mode.AsOfWindowed => ()
      case d: PlanClassifier.Mode.SnapshotDiff
          if d.rankTouch.isDefined && streamTopN.isDefined => ()
      // updating left-join changelogs route through StreamingLeftJoin's
      // keyed state (null-pad-retract contract); the under-aggregate
      // composition stays with the batch agg paths. Derived-side shapes
      // (pre-step chains feeding the join) serve since round 10: the
      // operator keys state on the DERIVED side rows — identity for
      // direct sides, so existing chains are byte-unchanged
      case d: PlanClassifier.Mode.SnapshotDiff
          if d.leftJoinDelta.isDefined && d.aggMerge.isEmpty => ()
      // inner-join changelogs run Spark's NATIVE unbounded stream-stream
      // inner equi-joins (the one join shape Structured Streaming serves
      // without a watermark bound), CHAINED along the join tree since
      // round 10 — left-deep chains/stars of direct inputs on same-typed
      // equi-keys; θ-residuals and derived sides stay batch
      case d: PlanClassifier.Mode.SnapshotDiff
          if d.joinDelta.isDefined && d.aggMerge.isEmpty &&
            d.leftJoinDelta.isEmpty && d.distinctDelta.isEmpty &&
            innerTreeFace.isDefined => ()
      // DISTINCT / UNION changelogs route their emission through
      // StreamingDistinct's keyed seen-state (batch state writes kept)
      case d: PlanClassifier.Mode.SnapshotDiff
          if d.aggMerge.exists(plainDistinctSpec) => ()
      // invertible non-windowed GROUP BY changelogs (sum/count/avg) route
      // their emission through StreamingAggDiff's keyed previous-row
      // state; the merge algebra and tiered state writes stay batch, so
      // the modes interleave on one checkpoint. Rides retractions — the
      // signed slice split feeds the same diff.
      case d: PlanClassifier.Mode.SnapshotDiff
          if d.aggMerge.exists(streamingServableAggSpec) => ()
      // aggregates ABOVE a join and plain min/max chains ride the same
      // StreamingAggDiff face — the keyed visible diff is shape-agnostic;
      // only the batch-side slice-aggregate computation differs
      case d: PlanClassifier.Mode.SnapshotDiff
          if d.aggMerge.exists(streamingServableFlipAggSpec) => ()
      // ALL-variant multiset set-op changelogs route their |Δk| emission
      // through StreamingAggDiff.multiplicityDiff's keyed
      // previous-multiplicity state (round-10); per-side count partials
      // are invertible, so retractions ride through
      case d: PlanClassifier.Mode.SnapshotDiff
          if d.aggMerge.exists(streamingServableMultiplicitySpec) => ()
      // op-reading aggregate chains (round-11): these are excluded from
      // the RETRACTION-riding merge path only because netting rewrites
      // op/offset/system-time representatives — but while the history is
      // append-only the merge and recompute paths bind identical raw
      // values, so the shape serves through the same runIncrementalAgg +
      // keyed streaming diff with the batch dispatch's neverFlips=false,
      // and the FIRST retraction flips both engines to the generic
      // recompute face permanently (intercept below / batch dispatch)
      case d: PlanClassifier.Mode.SnapshotDiff
          if d.aggMerge.isDefined && stepsReferenceOp &&
            retractiveNow.isEmpty => ()
      // generic recompute tail (round-10): shapes with NO delta/merge
      // proof ride the batch recompute path on EVERY run — including
      // through retractions, which the buffer netting absorbs — so the
      // changelog emission routes through the keyed / multiplicity
      // streaming diffs and the state writes stay byte-identical to batch
      case d: PlanClassifier.Mode.SnapshotDiff
          if d.aggMerge.isEmpty && d.joinDelta.isEmpty &&
            d.distinctDelta.isEmpty && d.leftJoinDelta.isEmpty => ()
      // post-retraction (round-10): once a retraction is in the history,
      // the batch twin of every non-invertible shape is PERMANENTLY on
      // the recompute path, so the generic face serves shapes no delta
      // face covers (e.g. op-reading flippable aggregates)
      case d: PlanClassifier.Mode.SnapshotDiff
          if retractiveNow.nonEmpty && !d.aggMerge.exists(spec =>
            spec.invertible && !stepsReferenceOp &&
              hiddenAvgsDivisible(spec)) => ()
      case _ =>
        throw new InvalidQueryException(
          "streaming execution mode (engine = spark-streaming) supports " +
            "stateless, tumbling-window, interval-join, as-of join, " +
            "inner-join changelog (incl. equi-join trees), left-join " +
            "changelog, DISTINCT/UNION changelog, multiset set-op " +
            "changelog (ALL variants), GROUP BY changelog (invertible, " +
            "min/max, or join-aggregate), Top-N, and recompute-path " +
            "changelog transforms only")
    }
    runMode()
  }

  private def runMode(): ExecResult = mode match {
    case PlanClassifier.Mode.Stateless       => runStateless()
    case PlanClassifier.Mode.AsOfJoin        => runAsOf(windowed = false)
    case PlanClassifier.Mode.AsOfWindowed    => runAsOf(windowed = true)
    case w: PlanClassifier.Mode.Windowed     => runWindowed(w.upperMillis)
    case d: PlanClassifier.Mode.SnapshotDiff if streamingMode =>
      // Retraction histories (round-10): any shape whose BATCH twin flips
      // permanently to the recompute path on the first retraction — i.e.
      // everything except the invertible merge family, which subtracts
      // retracted partials through the merge algebra — serves through the
      // generic recompute face: the recompute and state writes ARE the
      // batch flip's own, so the modes keep interleaving on one
      // checkpoint. The invertible family stays on its merge faces below
      // (which ride retractions through the signed slice split), except
      // The refcount DISTINCT face rides too: its emission switches from
      // first-occurrence to the keyed visible diff once support can
      // cross back to zero (see the emission dispatch).
      if (retractiveNow.nonEmpty && !d.aggMerge.exists(spec =>
          spec.invertible && !stepsReferenceOp && hiddenAvgsDivisible(spec)))
        runSnapshotDiff(d.keys, d.rankTouch)
      else (d.leftJoinDelta, d.aggMerge) match {
        case (Some(lj), None)
            if lj.allLeftRels.forall(byAlias(_).isDefined) &&
              byAlias(lj.right).isDefined =>
          runLeftDeltaJoin(lj)
        case (_, Some(spec)) if plainDistinctSpec(spec) =>
          // state layout must mirror the batch dispatch exactly so batch
          // and streaming runs interleave on one checkpoint
          runIncrementalAgg(spec,
            neverFlips = spec.invertible && !stepsReferenceOp)
        case (_, Some(spec)) if streamingServableAggSpec(spec) =>
          // invertible merge: neverFlips mirrors every batch dispatch of
          // this spec shape (invertible, op-free, divisible avgs), so the
          // tier-appended state interleaves with batch runs
          runIncrementalAgg(spec, neverFlips = true)
        case (_, Some(spec)) if streamingServableFlipAggSpec(spec) =>
          // flippable aggregate (join-bearing, or plain min/max):
          // neverFlips mirrors the batch dispatch (absolute aux state +
          // visible snapshot), so the modes interleave on one checkpoint.
          // A non-invertible spec with a carried retraction never reaches
          // here — the intercept above routed it to the generic recompute
          // face, exactly where batch flips; an INVERTIBLE join-bearing
          // spec rides the merge path through retractions like batch.
          runIncrementalAgg(spec,
            neverFlips = spec.invertible && !stepsReferenceOp)
        case (_, Some(spec)) if streamingServableMultiplicitySpec(spec) =>
          // ALL-variant multiset set-ops: invertible per-side count
          // partials — neverFlips mirrors every batch dispatch of this
          // spec shape, and retractions ride the signed slice split like
          // the invertible GROUP BY face
          runIncrementalAgg(spec, neverFlips = !stepsReferenceOp)
        // op-reading chains (round-11): mirror of the batch dispatch —
        // resolvable joins + divisible avgs ride the flippable merge path
        // with neverFlips=false (identical state writes, emission through
        // the keyed streaming diff), everything else recomputes. No young
        // detour here, matching the other streaming agg faces: a prior
        // batch detour's missing partials rebuild via the buffers
        // migration, and aux-free specs share the visible snapshot.
        case (_, Some(spec)) if stepsReferenceOp &&
            spec.join.forall(_.rels.forall(byAlias(_).isDefined)) &&
            spec.leftJoin.forall(lj =>
              lj.allLeftRels.forall(byAlias(_).isDefined) &&
                byAlias(lj.right).isDefined) &&
            hiddenAvgsDivisible(spec) =>
          runIncrementalAgg(spec, neverFlips = false)
        case (_, Some(spec)) if stepsReferenceOp =>
          runSnapshotDiff(d.keys, d.rankTouch)
        case (None, None)
            if d.joinDelta.isDefined && d.distinctDelta.isEmpty &&
              innerTreeFace.isDefined =>
          // retraction histories were intercepted above (batch flips
          // these to recompute permanently; the generic face serves them)
          runDeltaJoin(d.joinDelta.get)
        case _ =>
          val noFastPath = d.aggMerge.isEmpty && d.joinDelta.isEmpty &&
            d.distinctDelta.isEmpty && d.leftJoinDelta.isEmpty
          streamTopN match {
            // the dedicated Top-N face keeps its pinned shapes
            // (retraction histories were intercepted above)
            case Some(tn) =>
              runTopNStreaming(tn, d.keys)
            case _ if noFastPath =>
              runSnapshotDiff(d.keys, d.rankTouch)
            case _ =>
              throw new InvalidQueryException(
                "streaming execution mode cannot serve this updating shape")
          }
      }
    case d: PlanClassifier.Mode.SnapshotDiff =>
      // min/max are not invertible and an inner join is only monotone over
      // appends, so both fast paths require inputs with no retraction ever
      // observed; the first retraction flips the run (and all later ones)
      // to the recompute path, which reads the same snapshot state — the
      // paths interleave safely. The rank-touch narrowing is valid for
      // retractive inputs too (netting commutes with the partition filter).
      d match {
        // Invertible aggregate chains (sum/count/avg, no joins) stay on
        // the merge path through input retractions: the retracted rows'
        // partials subtract through the merge algebra — Flink's
        // accumulator retract() contract — so a retract-heavy dataset
        // never pays the O(history) recompute. Gated on the chain not
        // reading the op column (the recompute path nets ops away before
        // running the chain; the signed split must match that view).
        case PlanClassifier.Mode.SnapshotDiff(_, Some(spec), _, _, _, _)
            if retractiveNow.nonEmpty && spec.invertible &&
              !stepsReferenceOp && hiddenAvgsDivisible(spec) =>
          runIncrementalAgg(spec, neverFlips = true)
        case _ if retractiveNow.nonEmpty =>
          runSnapshotDiff(d.keys, d.rankTouch)
        case PlanClassifier.Mode.SnapshotDiff(_, Some(spec), _, _, _, _)
            if spec.join.forall(_.rels.forall(byAlias(_).isDefined)) &&
              spec.leftJoin.forall(lj =>
                lj.allLeftRels.forall(byAlias(_).isDefined) &&
                  byAlias(lj.right).isDefined) =>
          if (!hiddenAvgsDivisible(spec))
            runSnapshotDiff(d.keys, d.rankTouch)
          // Cost-based young-dataset detour: while history is under a few
          // slices' worth, the recompute is the cheaper physical plan
          // (EngineBench aggleft, BENCH_NOTES round 9). Safe for the whole
          // merge family: tier state (lsm) and absolute aux state (agg-
          // above-join chains) both rebuild from buffers at the flip run
          // via the partials migration, and aux-free specs share the
          // recompute's own snapshot state outright.
          else if (youngAggDataset)
            runSnapshotDiff(d.keys, d.rankTouch)
          else runIncrementalAgg(spec,
            neverFlips = spec.invertible && !stepsReferenceOp)
        // The young detour below is uniform across the changelog-delta
        // family: the join and DISTINCT paths keep no state beyond the
        // buffers and the snapshot BOTH paths maintain identically (so the
        // dispatch may even oscillate), while the left-join path's matched
        // set makes the detour sticky — present matched state must stay
        // current, absent matched state rebuilds from buffers at the flip.
        case PlanClassifier.Mode.SnapshotDiff(_, _, _, Some(jd), _, _)
            if jd.rels.forall(byAlias(_).isDefined) =>
          if (youngDataset(None)) runSnapshotDiff(d.keys, d.rankTouch)
          else runDeltaJoin(jd)
        case PlanClassifier.Mode.SnapshotDiff(_, _, _, _, Some(dd), _)
            if byAlias(dd.input).isDefined &&
              dd.join.forall(_.rels.forall(byAlias(_).isDefined)) =>
          if (youngDataset(None)) runSnapshotDiff(d.keys, d.rankTouch)
          else runDistinctDelta(dd)
        case PlanClassifier.Mode.SnapshotDiff(_, _, _, _, _, Some(lj))
            if lj.allLeftRels.forall(byAlias(_).isDefined) &&
              byAlias(lj.right).isDefined =>
          if (youngDataset(Some(IncrementalExecutor.leftMatchedName)))
            runSnapshotDiff(d.keys, d.rankTouch)
          else runLeftDeltaJoin(lj)
        case _ => runSnapshotDiff(d.keys, d.rankTouch)
      }
  }

  // ── Stateless map/filter/union: emit per slice, in arrival order ──────
  /** The reference emits map results in stream order (its offsets follow
    * input arrival, EngineMapTest goldens). To reproduce that, the hidden
    * `__seq` provenance column is injected into every projection of the
    * parsed step plans, so emission can be ordered by input offset — value
    * ordering would diverge from the reference and break ties between rows
    * that differ only in `op`. Falls back to value-ordered emission when
    * injection cannot resolve (e.g. a FROM-less step).
    */
  private def runStateless(): ExecResult =
    try {
      if (streamingMode) inputs.foreach(i => streamView(i.spec.queryAlias, i.df))
      else inputs.foreach(i => i.df.createOrReplaceTempView(i.spec.queryAlias))
      var out: DataFrame = null
      steps.zipWithIndex.foreach { case ((alias, rw), i) =>
        val injected = injectSeq(spark.sessionState.sqlParser.parsePlan(rw.sql))
        val planned = org.apache.spark.sql.GraftPlanExec.ofRows(spark, injected)
        val df =
          if (streamingMode) planned
          else Snitch.tap(planned, alias.getOrElse("output"))
        alias.foreach(df.createOrReplaceTempView)
        if (i == outputIdx) out = df
      }
      require(out.columns.contains("__seq"), "__seq did not survive projection")
      out.queryExecution.assertAnalyzed()
      if (streamingMode) out = materializeStreaming(out, complete = false)
      val tiebreak = out.schema.fields
        .filter(fd => fd.name != "__seq" &&
          org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(fd.dataType))
        .map(fd => col(fd.name).asc).toSeq
      ExecResult(out, minWm(inputs), None,
        Some(col("__seq").asc +: tiebreak), ledger.retractiveInputs)
    } catch {
      // A genuinely bad query fails again in the fallback and surfaces its
      // own AnalysisException; only injection-specific failures are masked.
      case scala.util.control.NonFatal(_) =>
        if (streamingMode) {
          inputs.foreach(i =>
            streamView(i.spec.queryAlias, i.df.drop("__seq")))
          val result = materializeStreaming(runStepsUntapped(), complete = false)
          ExecResult(result, minWm(inputs), None, None, ledger.retractiveInputs)
        } else {
          inputs.foreach(i =>
            i.df.drop("__seq").createOrReplaceTempView(i.spec.queryAlias))
          val result = runSteps(steps)
          ExecResult(result, minWm(inputs), None, None, ledger.retractiveInputs)
        }
    }

  /** Append `__seq` to each projection of a stateless plan (skipping ones
    * that already carry it via `*` expansion). Only structural nodes a
    * stateless chain can contain are recursed into; expression subqueries
    * resolve in their own scope and are left untouched.
    */
  private def injectSeq(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = {
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedStar}
    import org.apache.spark.sql.catalyst.plans.logical._
    plan match {
      case p: Project =>
        val hasStar = p.projectList.exists(_.isInstanceOf[UnresolvedStar])
        val hasSeq = p.projectList.exists {
          case a: UnresolvedAttribute => a.nameParts.last == "__seq"
          case _                      => false
        }
        val list =
          if (hasStar || hasSeq) p.projectList
          else p.projectList :+ UnresolvedAttribute("__seq")
        p.copy(projectList = list, child = injectSeq(p.child))
      case u: Union         => u.copy(children = u.children.map(injectSeq))
      case s: Sort          => s.copy(child = injectSeq(s.child))
      case sa: SubqueryAlias => sa.copy(child = injectSeq(sa.child))
      case f: Filter        => f.copy(child = injectSeq(f.child))
      case other            => other
    }
  }

  // ── Buffered-input preparation (windowed + snapshot-diff modes) ───────
  /** Inputs with a retraction/correction observed on any run up to and
    * including this one — ledger lookup plus a scan of just the new slice.
    */
  private lazy val retractiveNow: Set[String] = inputs.flatMap { i =>
    val alias = i.spec.queryAlias
    val opCol = i.spec.vocab.operationTypeColumn
    val seen = ledger.retractiveInputs.contains(alias) ||
      (i.df.columns.contains(opCol) &&
        !i.df.where(col(opCol).isin(Op.Retract, Op.CorrectFrom)).isEmpty)
    if (seen) Some(alias) else None
  }.toSet

  /** Cost-based dispatch gate for the merge-path family (tiered
    * invertible state AND the flippable absolute-aux shapes, e.g.
    * agg-above-join chains): while the buffered history is under
    * [[IncrementalExecutor.RecomputeYoungFactor]] slices' worth of rows,
    * a full recompute + snapshot diff is the cheaper physical plan (one
    * pass over a history at most K slices deep vs the merge path's fixed
    * per-run state-tier and delta-term jobs), so young datasets ride
    * [[runSnapshotDiff]] and flip to the merge path once they outgrow
    * it — the flip pays one partials(+matched) rebuild via the same
    * buffers migration that serves pre-widening checkpoints. Pure
    * ledger/offset arithmetic, no Spark job. STICKY on existing
    * `agg_partials` state (tiers or absolute aux — a grown dataset, or a
    * streaming-face run that created them): the merge path must keep that
    * state current, so a young recompute detour would strand it stale.
    * Aux-free specs keep no such state (both paths share the absolute
    * visible snapshot), so re-entering the detour is harmless for them —
    * though the run-count bound means in practice only a dataset's first
    * `factor` runs ever detour. Checkpoints whose ledgers predate
    * `bufferedRows`/`stateRuns` have on-disk buffers without counts:
    * history is UNKNOWN, and the gate stays on the established path —
    * PERMANENTLY, via the ledger's sticky `historyUnknown` marker (the
    * post-upgrade ledger would otherwise restart the count at one slice's
    * span and satisfy the gate from run 2, round-9 ADVICE #1).
    */
  private def youngDataset(stickyState: Option[String]): Boolean = {
    // factor 0 (spark.graft.recomputeYoungFactor) disables the detour —
    // the test harness pins 0 so short seeded chains still exercise the
    // delta/merge paths they were written to cover. A malformed setting
    // falls back to the default rather than failing every transform.
    val factor = spark.conf
      .get("spark.graft.recomputeYoungFactor",
        IncrementalExecutor.RecomputeYoungFactor.toString) match {
      case s => scala.util.Try(s.trim.toLong)
        .getOrElse(IncrementalExecutor.RecomputeYoungFactor)
    }
    factor > 0 && !historyUnknownNow && stickyState.forall(!store.has(_)) &&
      // run-count bound: "young" means BORN RECENTLY, not merely a low
      // history/slice ratio — a mature dataset receiving one oversized
      // backfill slice must not re-enter the detour (for join shapes the
      // recompute's snapshot diff is O(history-output), which the
      // slice-ratio model alone would underprice)
      ledger.stateRuns < factor && {
        val sliceRows =
          inputs.map(_.spec.offsetInterval.map(_.span).getOrElse(0L)).sum
        val histRows = inputs.map(i =>
          ledger.bufferedRows.getOrElse(i.spec.queryAlias, 0L)).sum
        histRows < factor * math.max(sliceRows, 1L)
      }
  }

  /** An input with on-disk buffers but no ledger count (checkpoint written
    * before `bufferedRows` existed) has UNKNOWN history — treating it as 0
    * would send a mature dataset through factor-many full recomputes after
    * an engine upgrade. True once observed, forever (the ledger marker is
    * sticky): a restarted count can never recover the pre-upgrade history.
    * [[graft.engine.TransformEngine]] persists this into the new ledger.
    */
  lazy val historyUnknownNow: Boolean =
    ledger.historyUnknown || inputs.exists(i =>
      store.has(bufferName(i.spec.queryAlias)) &&
        !ledger.bufferedRows.contains(i.spec.queryAlias))

  /** Agg-merge family detour, sticky on the partials state. */
  private lazy val youngAggDataset: Boolean =
    youngDataset(Some(IncrementalExecutor.aggStateName))

  /** True when any step's plan explicitly references a column EXCLUDED
    * from [[netChangelog]]'s netting identity: an input's operation column,
    * or its offset / system-time columns. Such chains see different values
    * under the signed slice split (retraction rows keep op=1/2 and their
    * own arrival offsets/system times) than under net-and-recompute (which
    * rewrites survivors to op=0 and keeps min() offset/system-time
    * representatives) — e.g. `sum(offset)` or `GROUP BY system_time` would
    * silently diverge between the two paths under retractions (round-6
    * ADVICE #3) — so they are excluded from the retraction-riding merge
    * path. A bare `*` is fine: it forwards the columns without the
    * aggregate reading them.
    */
  private lazy val stepsReferenceOp: Boolean = {
    val opNames = inputs.flatMap(i => Seq(
      i.spec.vocab.operationTypeColumn,
      i.spec.vocab.offsetColumn,
      i.spec.vocab.systemTimeColumn)).toSet
    steps.exists { case (_, rw) =>
      spark.sessionState.sqlParser.parsePlan(rw.sql).collectFirst {
        case p if p.expressions.exists(_.collectFirst {
              case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
                  if opNames.contains(a.nameParts.last) => ()
            }.nonEmpty) => ()
      }.nonEmpty
    }
  }

  /** @param touch when set, the named input's registered view is narrowed
    *   with a (broadcast) semi-join to the partition-key values present in
    *   this run's slice — the touched-partition ranking path. Buffers are
    *   written un-narrowed either way. Netting commutes with the filter:
    *   the partition columns are part of the netting identity.
    */
  /** `streamViews = false` forces BATCH temp views even under streaming
    * mode — the generic recompute face runs the recompute itself in batch
    * (byte-identical to the batch engine) and only routes the changelog
    * emission through the streaming diff operators. */
  private def bufferedFulls(
      touch: Option[PlanClassifier.RankTouch] = None,
      streamViews: Boolean = streamingMode)
      : (Seq[(LoadedInput, DataFrame)], Set[String]) = {
    val retractive = retractiveNow
    val fulls = inputs.map { i =>
      val buffer = store.read(bufferName(i.spec.queryAlias), i.df.schema)
      val full = buffer.unionByName(i.df)
      val netted =
        if (retractive.contains(i.spec.queryAlias))
          netChangelog(full.drop("__seq"), i.spec.vocab)
        else full.drop("__seq")
      val view = touch match {
        case Some(t) if t.input == i.spec.queryAlias =>
          semiOnTouched(netted, i, t.cols, "left_semi")
        case _ => netted
      }
      if (streamViews) streamView(i.spec.queryAlias, view)
      else view.createOrReplaceTempView(i.spec.queryAlias)
      i -> full
    }
    (fulls, retractive)
  }

  // ── Streaming execution (opt-in; see constructor doc) ─────────────────
  /** Register `df` under `alias` as a STREAMING temp view: stage the frame
    * to a temp parquet dir and open a file-stream source over it with the
    * same schema.
    */
  private def streamView(alias: String, df: DataFrame): Unit = {
    val dir = scratchDir("graft-stream-in")
    df.write.mode("overwrite").parquet(dir)
    spark.readStream.schema(df.schema).parquet(dir).createOrReplaceTempView(alias)
  }

  /** Run a streaming frame to completion under `Trigger.AvailableNow` via a
    * foreachBatch parquet sink and return the materialized batch frame —
    * distributed end to end, no driver buffering. `complete = true` for
    * aggregations (each batch overwrites; the final batch holds the full
    * result), false for stateless append streams.
    */
  private def materializeStreaming(df: DataFrame, complete: Boolean): DataFrame = {
    val out = scratchDir("graft-stream-out")
    val cp = scratchDir("graft-stream-cp")
    val schema = df.schema
    val q = df.writeStream
      .outputMode(if (complete) "complete" else "append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", cp)
      .foreachBatch { (b: DataFrame, _: Long) =>
        b.write.mode(if (complete) "overwrite" else "append").parquet(out)
      }
      .start()
    q.awaitTermination()
    val hasParts = Option(new java.io.File(out).listFiles())
      .exists(_.exists(_.getName.endsWith(".parquet")))
    if (hasParts) spark.read.schema(schema).parquet(out)
    else TransformEngine.emptyDf(spark, schema)
  }

  /** Stage a batch frame to a temp parquet dir and open a file-stream
    * source over it (the streaming faces' input contract). */
  private def stagedStream(df: DataFrame): DataFrame = {
    val dir = scratchDir("graft-stream-in")
    df.write.mode("overwrite").parquet(dir)
    spark.readStream.schema(df.schema).parquet(dir)
  }

  /** A non-null literal of the key's type for sentinel rows. Collision
    * with a real key value is harmless: a sentinel build version sits at a
    * future timestamp no probe can reach, and sentinel probes are filtered
    * from the output by their marker column. */
  private def sentinelLit(dt: org.apache.spark.sql.types.DataType): Column = {
    import org.apache.spark.sql.types._
    dt match {
      case StringType                                    => lit("\u0000__sentinel")
      case _: NumericType                                => lit(0).cast(dt)
      case TimestampType | TimestampNTZType | DateType   =>
        lit("1970-01-01 00:00:00").cast(dt)
      case BooleanType                                   => lit(false)
      case BinaryType                                    =>
        lit(Array.emptyByteArray)
      case other => throw new InvalidQueryException(
        s"as-of join key type $other is not supported under streaming " +
          "execution mode")
    }
  }

  /** Streaming face of the as-of join: the engine's already-gated eligible
    * probes and full version store become file-stream sources joined via
    * [[graft.streaming.StreamingAsOf]]. Every eligible probe has
    * probeTime <= the build watermark, so one sentinel row at
    * buildWm + 1 day on EACH branch lifts both branch watermarks past
    * every probe and every pending-probe timeout — the AvailableNow final
    * no-data batch then releases the whole eligible set, making the
    * operator's hold-back rule coincide with the engine's explicit
    * eligibility gate. NULL-key rows are pre-filtered (SQL equi-join
    * semantics: they can never match, and inner semantics drop the
    * unmatched probes downstream either way).
    */
  private def streamingAsOfJoin(
      eligible: DataFrame,
      buildRenamed: DataFrame,
      probeKey: String,
      probeTimeCol: String,
      buildTimeCol: String,
      buildCols: Seq[(String, String)],
      buildWm: Option[Instant]): DataFrame = {
    import org.apache.spark.sql.types.{StructField, StructType}
    val outSchema = StructType(
      eligible.schema.fields ++ buildCols.map { case (b, out) =>
        StructField(out, buildRenamed.schema(b).dataType) })
    val wm = buildWm match {
      case Some(w) => w
      case None    => return TransformEngine.emptyDf(spark, outSchema)
    }
    val probeIn = eligible.where(col(probeKey).isNotNull)
    if (probeIn.isEmpty) return TransformEngine.emptyDf(spark, outSchema)
    val sentTs =
      lit(SqlRewriter.tsLiteral(wm.plusSeconds(86400))).cast("timestamp")
    val sentKey = sentinelLit(eligible.schema(probeKey).dataType)
    val sent = "__sent"
    def sentinelRow(schema: StructType, timeCol: String): DataFrame =
      spark.range(1).select(schema.fields.map { f =>
        (f.name match {
          case `probeKey` => sentKey
          case `timeCol`  => sentTs
          case `sent`     => lit(true)
          case "__seq"    => lit(0L)
          case _          => lit(null)
        }).cast(f.dataType).as(f.name)
      }.toIndexedSeq: _*)
    val pWith = probeIn.withColumn(sent, lit(false))
    // Touched-key narrowing: each run opens a FRESH streaming checkpoint,
    // so only build versions whose key has an eligible probe THIS run can
    // contribute (keyless probes drop under inner semantics either way).
    // Bounds the per-run staging to O(state ∩ touched keys + slice)
    // instead of rewriting the full version store.
    val bWith = buildRenamed.where(col(probeKey).isNotNull)
      .join(probeIn.select(col(probeKey)).distinct(), Seq(probeKey), "left_semi")
      .withColumn(sent, lit(false))
    val probeS = stagedStream(
      pWith.unionByName(sentinelRow(pWith.schema, probeTimeCol)))
    val buildS = stagedStream(
      bWith.unionByName(sentinelRow(bWith.schema, buildTimeCol)))
    val joined = graft.streaming.StreamingAsOf.leftAsOf(
      spark, probeS, buildS, probeKey, probeTimeCol, buildTimeCol,
      buildCols, delay = "0 seconds", buildSeqCol = Some("__seq"))
    materializeStreaming(joined, complete = false)
      .where(!col(sent)).drop(sent)
  }

  /** Drive [[graft.streaming.StreamingTopN]] through two AvailableNow
    * rounds sharing one checkpoint: round 1 ingests the seed frame (its
    * emissions — rebuilding the previous state — are discarded), round 2
    * ingests the slice as a single micro-batch, whose emissions are
    * exactly the prev→new rank transition changelog.
    */
  private def twoPhaseTopN(
      seed: DataFrame,
      slice: DataFrame,
      tn: PlanClassifier.StreamTopN): DataFrame = {
    import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}
    val src = scratchDir("graft-topn-src")
    val cp = scratchDir("graft-topn-cp")
    val out = scratchDir("graft-topn-out")
    val schema = seed.schema
    def round(sink: (DataFrame, Long) => Unit): Unit = {
      val q = graft.streaming.StreamingTopN.topN(spark,
        spark.readStream.schema(schema).parquet(src),
        tn.partCol, tn.ordCol, tn.tieCol, tn.n)
        .writeStream
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", cp)
        .foreachBatch(sink)
        .start()
      q.awaitTermination()
    }
    // Touched-partition narrowing: the checkpoint is fresh per run, so
    // state for partitions the slice never touches is never consulted and
    // emissions only arise where slice rows arrive — seeding only touched
    // partitions is byte-identical and bounds the replay to
    // O(touched partitions × N) instead of the full stored snapshot.
    seed.join(slice.select(col(tn.partCol)).distinct(),
        Seq(tn.partCol), "left_semi")
      .select(seed.columns.map(col): _*)
      .write.mode("overwrite").parquet(src)
    // the seed batch must still EXECUTE (state stores only commit when the
    // stateful operator runs) — count() forces it, emissions discarded
    round((b, _) => { b.count(); () })
    slice.write.mode("append").parquet(src)
    round((b, _) => b.write.mode("append").parquet(out))
    val outSchema = StructType(schema.fields :+
      StructField("rank", LongType) :+ StructField("op", IntegerType))
    val hasParts = Option(new java.io.File(out).listFiles())
      .exists(_.exists(_.getName.endsWith(".parquet")))
    if (hasParts) spark.read.schema(outSchema).parquet(out)
    else TransformEngine.emptyDf(spark, outSchema)
  }

  /** Streaming face of the partitioned Top-N changelog: the stored visible
    * snapshot seeds the per-key state of
    * [[graft.streaming.StreamingTopN]], then the slice (projected to the
    * output shape) runs as one micro-batch whose emissions are the
    * engine's per-run changelog — identical to the batch snapshot diff
    * keyed on (partition, rank), because with append-only inputs the new
    * top-N is always contained in (old top-N ∪ slice). Per-run cost is
    * O(state + slice): the replay reads the kept top-N rows, never the
    * raw history. Buffers are still appended exactly as in batch, so
    * batch and streaming runs interleave on one checkpoint (the first
    * retraction must flip the chain to the batch engine — rejected here).
    */
  /** The single equi-key equality of a left-join delta's ON condition as
    * (leftCol, rightCol) RESOLVED to the inputs' actual field casing; None
    * when the condition is anything else (conjuncts, expressions,
    * non-equality) — the streaming operator keys state on one column.
    */
  private def leftJoinEquiKey(
      spec: PlanClassifier.LeftJoinDelta,
      leftSchema: org.apache.spark.sql.types.StructType,
      rightSchema: org.apache.spark.sql.types.StructType): Option[(String, String)] = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.expressions.EqualTo
    val cond =
      try spark.sessionState.sqlParser.parseExpression(spec.conditionSql)
      catch { case scala.util.control.NonFatal(_) => return None }
    val keys = cond match {
      case EqualTo(l: UnresolvedAttribute, r: UnresolvedAttribute)
          if l.nameParts.length == 2 && r.nameParts.length == 2 =>
        val (lq, ln) = (l.nameParts.head, l.nameParts.last)
        val (rq, rn) = (r.nameParts.head, r.nameParts.last)
        if (lq.equalsIgnoreCase(spec.leftAlias) &&
          rq.equalsIgnoreCase(spec.rightAlias)) Some((ln, rn))
        else if (lq.equalsIgnoreCase(spec.rightAlias) &&
          rq.equalsIgnoreCase(spec.leftAlias)) Some((rn, ln))
        else None
      case _ => None
    }
    for {
      (ln, rn) <- keys
      lf <- leftSchema.fields.find(_.name.equalsIgnoreCase(ln))
      rf <- rightSchema.fields.find(_.name.equalsIgnoreCase(rn))
      // mixed-type equality (which SQL would resolve by cast) is not
      // servable — the operator keys state on ONE side's value bytes. Any
      // same-typed key SQL can equi-join serves (round 11): the operator
      // groups on StreamingAggDiff.keyOf's canonical serialization, which
      // agrees with SQL equality on binary (by content), float/double
      // (-0.0 == 0.0, NaN == NaN), and nested struct/array positions; only
      // map-bearing types (no canonical element order) stay rejected —
      // which SQL's EqualTo cannot key on either.
      if lf.dataType == rf.dataType && streamStateKeyType(lf.dataType)
    } yield (lf.name, rf.name)
  }

  /** Types whose values can key per-group streaming state via
    * [[graft.streaming.StreamingAggDiff.keyOf]]'s canonical serialization:
    * everything except map-bearing types, whose element order has no
    * canonical form (Spark's EqualTo rejects them as join keys too).
    */
  private def streamStateKeyType(
      dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    def mapFree(t: DataType): Boolean = t match {
      case _: MapType      => false
      case s: StructType   => s.fields.forall(f => mapFree(f.dataType))
      case a: ArrayType    => mapFree(a.elementType)
      case _               => true
    }
    mapFree(dt)
  }

  /** First `leftAlias.x = rightAlias.y` equality CONJUNCT of the ON
    * condition (the full condition may carry more predicates), resolved to
    * the inputs' actual field casing. Enough to key-range narrow the
    * buffer scans: a state row whose key falls outside the delta's key
    * range cannot satisfy this conjunct against any delta row, whatever
    * the other conjuncts say.
    */
  private def leftJoinEquiConjunct(
      spec: PlanClassifier.LeftJoinDelta,
      leftSchema: org.apache.spark.sql.types.StructType,
      rightSchema: org.apache.spark.sql.types.StructType): Option[(String, String)] = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.expressions.EqualTo
    val cond =
      try spark.sessionState.sqlParser.parseExpression(spec.conditionSql)
      catch { case scala.util.control.NonFatal(_) => return None }
    IncrementalExecutor.conjuncts(cond).iterator.flatMap {
      case EqualTo(l: UnresolvedAttribute, r: UnresolvedAttribute)
          if l.nameParts.length == 2 && r.nameParts.length == 2 =>
        val (lq, ln) = (l.nameParts.head, l.nameParts.last)
        val (rq, rn) = (r.nameParts.head, r.nameParts.last)
        val named =
          if (lq.equalsIgnoreCase(spec.leftAlias) &&
            rq.equalsIgnoreCase(spec.rightAlias)) Some((ln, rn))
          else if (lq.equalsIgnoreCase(spec.rightAlias) &&
            rq.equalsIgnoreCase(spec.leftAlias)) Some((rn, ln))
          else None
        named.flatMap { case (ln2, rn2) =>
          for {
            lf <- leftSchema.fields.find(_.name.equalsIgnoreCase(ln2))
            rf <- rightSchema.fields.find(_.name.equalsIgnoreCase(rn2))
            // cross-type equality resolves by cast in SQL, so min/max under
            // the delta column's NATIVE ordering would not bound the matching
            // state rows — such conjuncts must yield no narrowing
            if lf.dataType == rf.dataType
          } yield (lf.name, rf.name)
        }
      case _ => None
    }.nextOption()
  }

  /** Streaming face of the left-join changelog: the stored buffers seed
    * [[graft.streaming.StreamingLeftJoin]]'s per-key state (seed-round
    * emissions — rebuilding history — are discarded; the matched bits
    * reconstruct exactly because for append-only inputs the persisted
    * matched set equals A_hist ⋉ B_hist), then both slices run as one
    * micro-batch whose emissions are the run's changelog: ΔA pairs or
    * null-pads against B_full, A_old pairs against ΔB, and −D null-pads
    * for previously-unmatched left rows ΔB just matched — the same three
    * terms as the batch passes. The wide (left ++ __right_*) emissions are
    * then pushed through the step chain with the Join collapsed to a view
    * scan (same device as [[rewriteAsOfPlan]]).
    *
    * Per-run staging cost is O(state ∩ touched keys + slice): the seed
    * frames are semi-join-narrowed to the keys the slices touch before
    * staging (the checkpoint is fresh per run, so untouched groups are
    * never consulted); the batch path remains the O(slice ⋈ state) answer.
    *
    * @return (appends, retracts) mirroring the batch (p1 ∪ p2, p3) pair —
    *         None-ness matches the batch terms so the snapshot-update
    *         branch below behaves identically.
    */
  private def streamingLeftJoinEmission(
      spec: PlanClassifier.LeftJoinDelta,
      pl: LeftDeltaPlumbing): (Option[DataFrame], Option[DataFrame]) = {
    import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
    import pl.{hasDa, hasDb}
    if (!hasDa && !hasDb) return (None, None) // watermark-only run
    // DERIVED side frames throughout (round 10) — identity modulo __seq
    // for direct sides, so the round-8/9 direct face is byte-unchanged;
    // for derived sides the keyed-state algebra is the same over derived
    // rows (stateless derivations are row-local), and dDeltaA is already
    // the telescoping delta for inner-join-tree left pre-steps.
    val aDelta = pl.dDeltaA.drop("__seq")
    val bDelta = pl.dDeltaB.drop("__seq")
    val aOld = pl.dOldA.drop("__seq")
    val bOld = pl.dB(pl.oldB).drop("__seq")
    val leftSchema = aOld.schema
    val rightSchema = bOld.schema
    val (lk, rk) = leftJoinEquiKey(spec, leftSchema, rightSchema).getOrElse(
      throw new InvalidQueryException(
        "streaming execution mode serves left-join changelogs only for a " +
          "single same-typed equi-key ON condition — use the batch engine"))
    def prepRight(df: DataFrame): DataFrame = {
      val d = df.drop("__seq")
      val renamed = d.columns.foldLeft(d)(
        (acc, c) => acc.withColumnRenamed(c, s"__right_$c"))
      renamed.withColumn(lk, col(s"__right_$rk"))
    }
    val rightCols = rightSchema.fieldNames.toSeq
      .map(c => s"__right_$c" -> s"__right_$c")
    val rightStagedSchema = prepRight(bDelta).schema
    val srcA = scratchDir("graft-lj-left")
    val srcB = scratchDir("graft-lj-right")
    val cp = scratchDir("graft-lj-cp")
    val outDir = scratchDir("graft-lj-out")
    val opCol = "__lj_op"
    def round(sink: (DataFrame, Long) => Unit): Unit = {
      val q = graft.streaming.StreamingLeftJoin.leftJoin(spark,
        spark.readStream.schema(leftSchema).parquet(srcA),
        spark.readStream.schema(rightStagedSchema).parquet(srcB),
        lk, rightCols, opCol)
        .writeStream.outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", cp)
        .foreachBatch(sink)
        .start()
      q.awaitTermination()
    }
    // Touched-key narrowing: the checkpoint is fresh per run and emissions
    // only arise in key groups receiving slice rows (null-keyed left rows
    // bypass state entirely), so seeding only the touched groups is
    // byte-identical and bounds the replay to O(state ∩ touched keys)
    // instead of the full buffers.
    val touchedKeys = aDelta.select(col(lk))
      .unionByName(bDelta.select(col(rk).as(lk)))
      .where(col(lk).isNotNull).distinct()
    aOld.join(touchedKeys, Seq(lk), "left_semi")
      .select(leftSchema.fieldNames.map(col): _*)
      .write.mode("overwrite").parquet(srcA)
    prepRight(bOld).join(touchedKeys, Seq(lk), "left_semi")
      .select(rightStagedSchema.fieldNames.map(col): _*)
      .write.mode("overwrite").parquet(srcB)
    // seed state; the stateful operator only commits when it executes
    round((b, _) => { b.count(); () })
    // one file per side ⇒ one micro-batch, so in-slice ΔA×ΔB pairs join
    // directly instead of via null-pad churn (matching the batch terms)
    aDelta.coalesce(1).write.mode("append").parquet(srcA)
    prepRight(bDelta).coalesce(1).write.mode("append").parquet(srcB)
    round((b, _) => b.write.mode("append").parquet(outDir))
    val outSchema = StructType(leftSchema.fields ++
      rightCols.map { case (r, o) =>
        rightStagedSchema(r).copy(name = o, nullable = true) } :+
      StructField(opCol, IntegerType, nullable = false))
    val hasParts = Option(new java.io.File(outDir).listFiles())
      .exists(_.exists(_.getName.endsWith(".parquet")))
    val wide =
      if (hasParts) spark.read.schema(outSchema).parquet(outDir)
      else TransformEngine.emptyDf(spark, outSchema)
    val leftLc = leftSchema.fieldNames.map(_.toLowerCase).toSet
    val rightLc = rightSchema.fieldNames.map(_.toLowerCase).toSet
    // collapse the join to the wide view under the DERIVED view names —
    // the derivation pre-steps still run as plain SQL (their views are
    // never consumed by the collapsed step; raw slice views were
    // registered by the plumbing's derive calls, so they analyze)
    def project(df: DataFrame): DataFrame =
      runChainOverLeftJoinView(df, pl.leftView, spec.leftAlias,
        pl.rightView, spec.rightAlias, leftLc, rightLc)
    val appends = project(wide.where(col(opCol) === Op.Append).drop(opCol))
    val retr = wide.where(col(opCol) === Op.Retract).drop(opCol)
    val retracts = if (retr.isEmpty) None else Some(project(retr))
    (Some(appends), retracts)
  }

  /** Shape proof for the Structured Streaming INNER-join face: the chain
    * holds exactly one join-bearing step, and that step's join tree is a
    * left-deep chain of INNER equi-joins over DIRECT, DISTINCT input
    * relations — each ON clause one same-typed `earlier.x = new.y`
    * conjunct (the tree may be a path or a star: each new relation may
    * key against ANY earlier one). Unlike the left-join face there is no
    * hand-rolled keyed-state operator — Spark's native unbounded
    * stream-stream inner join serves the semantics directly (it is the
    * one outer-join-free shape Structured Streaming supports without a
    * watermark bound, and since Spark 3.4's multi-stateful-operator
    * support the joins CHAIN: a micro-batch of cascaded symmetric hash
    * joins emits exactly the result tuples involving at least one new
    * row, which is the inner-tree delta multiset) — so keys need no
    * toString-canonicality restriction, only type equality.
    *
    * `rels` lists (relation, alias) in chain order; `edges(k)` keys
    * `rels(k + 1)` as `rels(m).mCol = rels(k + 1).nCol`.
    */
  private case class InnerTreeFace(
      rels: Vector[(String, String)],
      edges: Vector[(Int, String, String)])

  private lazy val innerTreeFace: Option[InnerTreeFace] = {
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
    import org.apache.spark.sql.catalyst.expressions.{EqualTo, Expression}
    import org.apache.spark.sql.catalyst.plans.Inner
    import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, SubqueryAlias}
    val parsedSteps =
      try steps.map(s => spark.sessionState.sqlParser.parsePlan(s._2.sql))
      catch {
        case scala.util.control.NonFatal(_) => Seq.empty[LogicalPlan]
      }
    def relAlias(p: LogicalPlan): Option[(String, String)] = p match {
      case s: SubqueryAlias => s.child match {
        case r: UnresolvedRelation => Some((r.multipartIdentifier.last, s.alias))
        case _                     => None
      }
      case r: UnresolvedRelation =>
        Some((r.multipartIdentifier.last, r.multipartIdentifier.last))
      case _ => None
    }
    // flatten a left-deep inner chain: leaf, or Join(chain, leaf, Inner)
    def flatten(p: LogicalPlan)
        : Option[Vector[(String, String, Option[Expression])]] = p match {
      case j: Join if j.joinType == Inner && j.condition.isDefined =>
        for {
          left <- flatten(j.left)
          (r, ra) <- relAlias(j.right)
        } yield left :+ ((r, ra, j.condition))
      case other => relAlias(other).map { case (r, ra) => Vector((r, ra, None)) }
    }
    val joinSteps = parsedSteps.filter(
      _.collectFirst { case j: Join => j }.isDefined)
    for {
      step <- Some(joinSteps).collect { case Seq(only) => only }
      top <- step.collectFirst { case j: Join => j }
      flat <- flatten(top)
      // every Join node of the step accounted for by the flatten — a join
      // hiding inside a derived table would otherwise slip through
      if step.collect { case j: Join => j }.length == flat.length - 1
      rels = flat.map(f => (f._1, f._2))
      if rels.map(_._1.toLowerCase).distinct.length == rels.length
      if rels.map(_._2.toLowerCase).distinct.length == rels.length
      loadedOpt = rels.map(r => byAlias(r._1))
      if loadedOpt.forall(_.isDefined)
      loaded = loadedOpt.map(_.get)
      // the wide staging prefixes non-first relations' columns with
      // __right_ / __r{i}_; a first-relation column already carrying such
      // a prefix would collide in the wide view
      if !loaded.head.df.columns.exists(c =>
        c.toLowerCase.startsWith("__right_") ||
          c.toLowerCase.matches("__r[0-9]+_.*"))
      edgesOpt = flat.zipWithIndex.drop(1).map { case ((_, _, condOpt), idx) =>
        condOpt.flatMap {
          case EqualTo(l: UnresolvedAttribute, r: UnresolvedAttribute)
              if l.nameParts.length == 2 && r.nameParts.length == 2 =>
            val newAlias = rels(idx)._2
            val (lq, lc) = (l.nameParts.head, l.nameParts.last)
            val (rq, rc) = (r.nameParts.head, r.nameParts.last)
            val resolved =
              if (lq.equalsIgnoreCase(newAlias)) Some((lc, rq, rc))
              else if (rq.equalsIgnoreCase(newAlias)) Some((rc, lq, lc))
              else None
            resolved.flatMap { case (newCol, otherQ, otherC) =>
              val m = rels.take(idx).indexWhere(_._2.equalsIgnoreCase(otherQ))
              if (m < 0) None
              else for {
                nf <- loaded(idx).df.schema.fields
                  .find(_.name.equalsIgnoreCase(newCol))
                mf <- loaded(m).df.schema.fields
                  .find(_.name.equalsIgnoreCase(otherC))
                if nf.dataType == mf.dataType
              } yield (m, mf.name, nf.name)
            }
          case _ => None
        }
      }
      if edgesOpt.forall(_.isDefined)
    } yield InnerTreeFace(rels, edgesOpt.map(_.get))
  }

  /** Structured Streaming face of the inner-join changelog
    * ([[runDeltaJoin]]): Spark's NATIVE unbounded stream-stream inner
    * equi-joins, CHAINED along the face's tree and run as two
    * AvailableNow rounds over scratch-staged parquet — a seed round whose
    * emissions are discarded (it only loads every relation's state) and a
    * slice round whose emissions are exactly the batch delta multiset,
    * because a micro-batch of cascaded symmetric hash joins emits
    * precisely the result tuples involving at least one new row. Inner
    * joins emit appends only, so unlike the left-join face there is no
    * retract stream.
    *
    * Seed narrowing is a Yannakakis-style semi-join sweep: a seed row is
    * staged only if its keys can reach a slice row through the join tree
    * (n−1 rounds of per-edge semi-joins against the slice ∪ previously
    * needed neighbor keys — an over-approximation of the rows appearing
    * in some mixed old/new result tuple, which is sound: extra seeds only
    * add discarded seed-round pairs, while a dropped needed seed would
    * lose a slice-round pair). A multi-edge relation ORs its per-edge
    * semi-joins multiset-exactly (match-first-edge ∪ anti-then-match-
    * next) — a plain union would duplicate seed rows matched by two
    * edges, and duplicated state duplicates emissions.
    *
    * Returns the WIDE joined frame (first relation's columns +
    * `__right_*` + `__r{i}_*`), or None on a watermark-only run.
    */
  private def streamingInnerTreeEmission(
      face: InnerTreeFace,
      loaded: Vector[LoadedInput],
      olds: Vector[DataFrame]): Option[DataFrame] = {
    import org.apache.spark.sql.types.StructType
    val n = face.rels.length
    if (!loaded.exists(_.spec.offsetInterval.isDefined)) return None
    def prefix(i: Int): String =
      if (i == 0) "" else if (i == 1) "__right_" else s"__r${i}_"
    def prep(i: Int)(df: DataFrame): DataFrame = {
      val d = df.drop("__seq")
      if (i == 0) d
      else d.columns.foldLeft(d)(
        (acc, c) => acc.withColumnRenamed(c, prefix(i) + c))
    }
    val stagedSchemas = Vector.tabulate(n)(i => prep(i)(loaded(i).df).schema)
    val srcDirs = Vector.tabulate(n)(i => scratchDir(s"graft-ij-r$i"))
    val cp = scratchDir("graft-ij-cp")
    val outDir = scratchDir("graft-ij-out")
    def round(sink: (DataFrame, Long) => Unit): Unit = {
      val joined = (1 until n).foldLeft(
        spark.readStream.schema(stagedSchemas(0)).parquet(srcDirs(0))) {
        (acc, k) =>
          val (m, mc, nc) = face.edges(k - 1)
          acc.join(
            spark.readStream.schema(stagedSchemas(k)).parquet(srcDirs(k)),
            col(prefix(m) + mc) === col(prefix(k) + nc), "inner")
      }
      val q = joined.writeStream.outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", cp)
        .foreachBatch(sink)
        .start()
      q.awaitTermination()
    }
    // --- seed narrowing sweep ---
    val slices = loaded.map(_.df.drop("__seq"))
    val oldsClean = olds.map(_.drop("__seq"))
    // incident(i) = (myCol, neighborIdx, neighborCol)
    val incident: Vector[Vector[(String, Int, String)]] = {
      val buf = Array.fill(n)(Vector.empty[(String, Int, String)])
      face.edges.zipWithIndex.foreach { case ((m, mc, nc), k) =>
        buf(m) = buf(m) :+ ((mc, k + 1, nc))
        buf(k + 1) = buf(k + 1) :+ ((nc, m, mc))
      }
      buf.toVector
    }
    def keysOf(df: DataFrame, c: String, as: String): DataFrame =
      df.select(col(c).as(as)).where(col(as).isNotNull).distinct()
    // multiset-exact OR of semi-joins
    def semiOr(base: DataFrame, preds: Seq[(String, DataFrame)]): DataFrame = {
      var remaining = base
      var acc: Option[DataFrame] = None
      preds.foreach { case (c, keys) =>
        val hit = remaining.join(keys, Seq(c), "left_semi")
        acc = Some(acc.fold(hit)(_.unionByName(hit)))
        remaining = remaining.join(keys, Seq(c), "left_anti")
      }
      acc.getOrElse(base.limit(0))
    }
    // Round-materialized sweep: each round's semi-join predicates read
    // only PARQUET-STAGED key frames from the previous round, so the plan
    // stays constant-depth however deep the tree is. (Previously every
    // round re-referenced the prior rounds' uncached `needed` frames, so
    // the logical plan — and the keysOf().distinct() shuffles inside it —
    // grew exponentially with tree depth; correct, but a 5–7 relation
    // chain would hit severe planning/recompute blowup.) Only DISTINCT
    // edge-key values cross rounds — the smallest thing that can: a key
    // frame is bounded by the touched-key count, not by state size.
    var keyCnt = 0
    def stageKeys(df: DataFrame): DataFrame = {
      keyCnt += 1
      val dir = scratchDir(s"graft-ij-keys-$keyCnt")
      df.write.mode("overwrite").parquet(dir)
      spark.read.schema(df.schema).parquet(dir)
    }
    // reachKeys(j)(c) = distinct values of edge column c over relation j's
    // reachable OLD rows after the previous round (first round: none, so
    // predicates see slice keys only — same as the original prev=None).
    var reachKeys: Vector[Map[String, DataFrame]] = Vector.fill(n)(Map.empty)
    var needed: Vector[Option[DataFrame]] = Vector.fill(n)(None)
    (1 until n).foreach { r =>
      val prev = reachKeys
      needed = Vector.tabulate(n) { i =>
        val preds = incident(i).map { case (ci, j, cj) =>
          val sliceKeys = keysOf(slices(j), cj, ci)
          val k = prev(j).get(cj) match {
            case Some(kj) => sliceKeys
              .unionByName(kj.select(col(cj).as(ci))).distinct()
            case None => sliceKeys
          }
          (ci, k)
        }
        Some(semiOr(oldsClean(i), preds))
      }
      if (r < n - 1) reachKeys = Vector.tabulate(n) { j =>
        incident(j).map(_._1).distinct.map { c =>
          c -> stageKeys(keysOf(needed(j).get, c, c))
        }.toMap
      }
    }
    needed.zipWithIndex.foreach { case (sOpt, i) =>
      prep(i)(sOpt.getOrElse(oldsClean(i)))
        .select(stagedSchemas(i).fieldNames.map(col): _*)
        .write.mode("overwrite").parquet(srcDirs(i))
    }
    round((b, _) => { b.count(); () })
    // one file per relation ⇒ the slice round sees each slice atomically
    (0 until n).foreach(i =>
      prep(i)(loaded(i).df).coalesce(1).write.mode("append")
        .parquet(srcDirs(i)))
    round((b, _) => b.write.mode("append").parquet(outDir))
    val outSchema = StructType(stagedSchemas.flatMap(_.fields).toArray)
    val hasParts = Option(new java.io.File(outDir).listFiles())
      .exists(_.exists(_.getName.endsWith(".parquet")))
    Some(
      if (hasParts) spark.read.schema(outSchema).parquet(outDir)
      else TransformEngine.emptyDf(spark, outSchema))
  }

  /** A relation of a pre-joined wide view: qualified refs `alias.x` /
    * `rel.x` rewrite to `prefix + x`; the first relation's prefix is
    * empty (its columns keep their names in the wide frame). */
  private case class JoinedRelView(
      rel: String, alias: String, colsLc: Set[String], prefix: String)

  /** Run the step chain with the (single) LEFT JOIN collapsed to a scan of
    * the pre-joined wide view: `rightAlias.x` → `__right_x`,
    * `leftAlias.x` → `x`, and bare right-only column references →
    * `__right_x`; steps without the join run as plain SQL. Mirrors
    * [[IncrementalExecutor.rewriteAsOfPlan]].
    */
  private def runChainOverLeftJoinView(
      wide: DataFrame,
      leftRel: String,
      leftAlias: String,
      rightRel: String,
      rightAlias: String,
      leftColsLc: Set[String],
      rightColsLc: Set[String]): DataFrame =
    runChainOverJoinTreeView(wide, Vector(
      JoinedRelView(leftRel, leftAlias, leftColsLc, ""),
      JoinedRelView(rightRel, rightAlias, rightColsLc, "__right_")))

  /** N-ary generalization of [[runChainOverLeftJoinView]] for the inner
    * tree face: the join-bearing step collapses to a scan of the wide
    * view; a qualified ref rewrites through its relation's prefix, a bare
    * ref owned by exactly one non-first relation gets that prefix, and a
    * bare ref owned by two or more relations raises the same ambiguity
    * the batch pass would (except a top-level ORDER BY ref naming a
    * select-list output, which batch resolves against the projection).
    */
  private def runChainOverJoinTreeView(
      wide: DataFrame,
      views: Vector[JoinedRelView]): DataFrame = {
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
    import org.apache.spark.sql.catalyst.expressions.{Alias, Expression}
    import org.apache.spark.sql.catalyst.plans.logical.{
      Aggregate, GlobalLimit, Join, LocalLimit, LogicalPlan, Project, Sort}
    wide.createOrReplaceTempView("__lj_joined")
    var result: DataFrame = null
    steps.zipWithIndex.foreach { case ((alias, rw), i) =>
      val parsed = spark.sessionState.sqlParser.parsePlan(rw.sql)
      val hasJoin = parsed.collectFirst { case j: Join => j }.isDefined
      val df =
        if (hasJoin) {
          val collapsed = parsed.transformUp {
            case _: Join => UnresolvedRelation(Seq("__lj_joined"))
          }
          // the step's top-level output names (select-list / aggregate
          // aliases): a bare ref in the step's ORDER BY binds to these
          // FIRST under batch analysis, so it is not ambiguous there even
          // when the name exists on both join sides
          val topNames: Set[String] = collapsed.collectFirst {
            case p: Project   => p.projectList
            case a: Aggregate => a.aggregateExpressions
          }.map(_.flatMap {
            case al: Alias             => Some(al.name.toLowerCase)
            case ua: UnresolvedAttribute => Some(ua.nameParts.last.toLowerCase)
            case _                     => None
          }.toSet).getOrElse(Set.empty)
          // alias matches take precedence over bare relation-name matches
          // (an alias could shadow another relation's name)
          def qualView(q: String): Option[JoinedRelView] =
            views.find(_.alias.equalsIgnoreCase(q))
              .orElse(views.find(_.rel.equalsIgnoreCase(q)))
          def owners(nameLc: String): Vector[JoinedRelView] =
            views.filter(_.colsLc.contains(nameLc))
          def exprRule(sortAboveOutput: Boolean)
              : PartialFunction[Expression, Expression] = {
            case a: UnresolvedAttribute
                if a.nameParts.length == 2 &&
                  qualView(a.nameParts.head).isDefined =>
              UnresolvedAttribute(Seq(
                qualView(a.nameParts.head).get.prefix + a.nameParts.last))
            case a: UnresolvedAttribute
                if a.nameParts.length == 1 &&
                  owners(a.nameParts.head.toLowerCase).length > 1 &&
                  !(sortAboveOutput &&
                    topNames.contains(a.nameParts.head.toLowerCase)) =>
              // the same SQL through the batch pass raises
              // AMBIGUOUS_REFERENCE — binding silently to the wide view's
              // first-relation column would diverge from the byte-identity
              // contract. Exception: a top-level ORDER BY ref naming a
              // select-list output, which batch resolves against the
              // projection (leave it bare for Spark to bind to the alias).
              throw new InvalidQueryException(
                s"reference '${a.nameParts.head}' is ambiguous: it exists " +
                  "on more than one side of the join — qualify it with " +
                  "the input alias")
            case a: UnresolvedAttribute
                if a.nameParts.length == 1 && {
                  val o = owners(a.nameParts.head.toLowerCase)
                  o.length == 1 && o.head.prefix.nonEmpty
                } =>
              UnresolvedAttribute(Seq(
                owners(a.nameParts.head.toLowerCase).head.prefix +
                  a.nameParts.head))
          }
          // the top-level sort (under optional LIMITs) resolves bare refs
          // against the step output; everything else is strict
          def remapTop(p: LogicalPlan): LogicalPlan = p match {
            case g: GlobalLimit => g.copy(child = remapTop(g.child))
            case l: LocalLimit  => l.copy(child = remapTop(l.child))
            case s: Sort =>
              s.copy(
                order = s.order.map(so =>
                  so.transformUp(exprRule(sortAboveOutput = true))
                    .asInstanceOf[org.apache.spark.sql.catalyst.expressions.SortOrder]),
                child = s.child.transformAllExpressions(
                  exprRule(sortAboveOutput = false)))
            case other =>
              other.transformAllExpressions(exprRule(sortAboveOutput = false))
          }
          org.apache.spark.sql.GraftPlanExec.ofRows(spark, remapTop(collapsed))
        } else spark.sql(rw.sql)
      alias.foreach(df.createOrReplaceTempView)
      if (i == outputIdx) result = df
    }
    result
  }

  private def runTopNStreaming(
      tn: PlanClassifier.StreamTopN,
      keys: Option[Seq[String]]): ExecResult = {
    // Retraction histories never reach this face: the round-10 dispatch
    // intercept routes them to runSnapshotDiff (the generic recompute face
    // serves Top-N over retractive inputs via the keyed visible diff), so
    // this is a dispatch invariant, not a user-facing rejection.
    assert(retractiveNow.isEmpty,
      "retraction histories are served by the generic recompute face")
    val in = byAlias(tn.input).getOrElse(throw new InvalidQueryException(
      s"unknown input '${tn.input}'"))
    in.df.drop("__seq").createOrReplaceTempView(tn.input)
    val visibleSchema = spark.sql(steps(outputIdx)._2.sql).schema
    if (visibleSchema.fieldNames.contains(vocab.operationTypeColumn))
      throw new InvalidQueryException(
        s"an updating query must not project the operation column " +
          s"'${vocab.operationTypeColumn}' — ops are generated by the " +
          "engine from the snapshot diff")
    val prevSnap = store.read(snapshotName, visibleSchema)
    val sliceProj =
      org.apache.spark.sql.GraftPlanExec.ofRows(spark, tn.slicePlan)
    val feedCols = tn.outCols.filterNot(_ == tn.rankOut)
    val seedFeed = prevSnap.select(feedCols.map(col): _*)
    val sliceFeed = sliceProj.select(feedCols.map(col): _*)
    // Enforce the determinism contract instead of trusting it:
    // StreamingTopN dedups its state on (ord, tie), so two distinct rows
    // with equal sort keys in one partition would silently collapse to
    // one — while batch row_number ranks both (arbitrary order but full
    // cardinality). A tie therefore breaks the byte-identity contract,
    // and must surface as InvalidQuery, not as a dropped row. One bounded
    // aggregate over seed ∪ slice — O(state + slice), the same order as
    // the seed replay itself.
    val tieClash = seedFeed
      // only ties in partitions this run touches can affect this run's
      // emissions; untouched ties are re-checked when their partition is
      // next touched (O(touched + slice), matching the seed narrowing)
      .join(sliceFeed.select(col(tn.partCol)).distinct(),
        Seq(tn.partCol), "left_semi")
      .unionByName(sliceFeed.select(seedFeed.columns.map(col): _*))
      .groupBy(col(tn.partCol), col(tn.ordCol), col(tn.tieCol))
      .count().where(col("count") > 1).limit(1).collect()
    if (tieClash.nonEmpty) {
      val r = tieClash.head
      throw new InvalidQueryException(
        "streaming execution mode requires the Top-N sort key " +
          s"(${tn.ordCol}${if (tn.tieCol != tn.ordCol) s", ${tn.tieCol}" else ""}) " +
          s"to be unique per partition; found ${r.getLong(r.length - 1)} rows " +
          s"with ${tn.partCol}=${r.get(0)}, ${tn.ordCol}=${r.get(1)} — add a " +
          "distinct tiebreak column to the ORDER BY or use the batch engine")
    }
    val raw = twoPhaseTopN(seedFeed, sliceFeed, tn)
    val rnType = visibleSchema(tn.rankOut).dataType
    val opTmp = "__stream_op"
    val emitted = raw
      .withColumnRenamed("op", opTmp)
      .withColumn(tn.rankOut, col("rank").cast(rnType))
      .drop("rank")
      .select((tn.outCols.map(col) :+
        // coalesce against a literal: value-identity (op is never null)
        // but marks the column non-nullable like batch diffSnapshots'
        // lit(op) — parquet byte-identity includes nullability
        coalesce(col(opTmp), lit(Op.Append))
          .as(vocab.operationTypeColumn)): _*)
    // snapshot advances by the emitted ops; buffers append as in batch
    val diffKeys = Seq(tn.partCol, tn.rankOut)
    val changed = emitted
      .where(col(vocab.operationTypeColumn) === Op.CorrectFrom)
      .select(diffKeys.map(col): _*)
    val added = emitted
      .where(col(vocab.operationTypeColumn).isin(Op.Append, Op.CorrectTo))
      .drop(vocab.operationTypeColumn)
      .select(visibleSchema.fieldNames.map(col).toIndexedSeq: _*)
    val newSnap = prevSnap.alias("p")
      .join(changed.alias("c"),
        diffKeys.map(k => col(s"p.$k") <=> col(s"c.$k")).reduce(_ && _),
        "left_anti")
      .select(visibleSchema.fieldNames.map(col).toIndexedSeq: _*)
      .unionByName(added)
    store.write(snapshotName, newSnap)
    inputs.foreach { i =>
      store.appendCarry(bufferName(i.spec.queryAlias), i.df,
        store.read(bufferName(i.spec.queryAlias), i.df.schema)
          .unionByName(i.df))
    }
    ExecResult(emitted, minWm(inputs), None,
      emissionOrder = Some(keys.getOrElse(diffKeys).map(col(_).asc) :+
        col(vocab.operationTypeColumn).asc),
      retractiveInputs = Set.empty)
  }

  /** Null-safe semi/anti join of `df` against the distinct `cols` values of
    * input `i`'s new slice (NULL partition keys are legitimate identities).
    * No forced broadcast: the distinct-key side is usually tiny and AQE
    * converts to a broadcast join at runtime from its REAL size — but a
    * catch-up slice can touch tens of millions of keys, where a forced
    * broadcast would blow the driver instead of degrading to a shuffle.
    */
  private def semiOnTouched(
      df: DataFrame, i: LoadedInput, cols: Seq[String], joinType: String): DataFrame = {
    val sk = i.df.select(cols.map(col): _*).distinct().alias("__sk")
    df.alias("__v").join(sk,
      cols.map(c => col(s"__v.$c") <=> col(s"__sk.$c")).reduce(_ && _),
      joinType)
  }

  // ── Window-gating helpers (shared by Windowed and AsOfWindowed) ───────
  private def truncUnit(months: Int): String = months match {
    case 3  => "QUARTER"
    case 12 => "YEAR"
    case _  => "MONTH"
  }
  /** Window end of an emitted row (event_time = window start, unless the
    * query already projected TUMBLE_END as its event time). */
  private def windowEnd(c: Column): Column = tumble match {
    case _ if eventTimeIsWindowEnd => c
    case Some(t) if t.calendarMonths > 0 =>
      add_months(c, t.calendarMonths).cast("timestamp")
    case Some(t) =>
      val durUs = durationMillis(t.duration) * 1000
      timestamp_micros(expr(s"(unix_micros(${vocab.eventTimeColumn}) div $durUs) * $durUs")
        .plus(durUs))
    case None => c
  }
  /** Window end of a RAW input row (arbitrary event time within a window). */
  private def rowWindowEnd(c: Column, name: String): Column = tumble match {
    case Some(t) if t.calendarMonths > 0 =>
      add_months(date_trunc(truncUnit(t.calendarMonths), c), t.calendarMonths)
        .cast("timestamp")
    case Some(t) =>
      val durUs = durationMillis(t.duration) * 1000
      timestamp_micros(expr(s"(unix_micros($name) div $durUs) * $durUs").plus(durUs))
    case None => c
  }
  private def tsLit(i: Instant): Column =
    lit(SqlRewriter.tsLiteral(i)).cast("timestamp")
  /** Rows of the computed result whose window closed at `reported` but was
    * still open at the previous run's gate — emit exactly once. */
  private def gateByWindowEnd(
      resultAll: DataFrame, reported: Option[Instant]): DataFrame = {
    val eventCol = col(vocab.eventTimeColumn)
    reported match {
      case None => resultAll.limit(0)
      case Some(r) =>
        val upperGate = windowEnd(eventCol) <= tsLit(r)
        ledger.emitThreshold match {
          case Some(p) => resultAll.where(upperGate && windowEnd(eventCol) > tsLit(p))
          case None    => resultAll.where(upperGate)
        }
    }
  }

  // ── Windowed: tumbling agg / interval join with watermark gating ──────
  private def runWindowed(upperMs: Long): ExecResult = {
    val (fulls, retractive) = bufferedFulls()
    // Streaming materialization mode follows the chain shape: a tumbling
    // aggregation needs complete mode (the final batch holds the whole
    // result); a pure interval join appends its joined rows.
    val resultAll =
      if (streamingMode)
        materializeStreaming(runStepsUntapped(), complete = tumble.isDefined)
      else runSteps(steps)

    val reported = minWm(inputs).map(_.minusMillis(upperMs))
    val emitted = gateByWindowEnd(resultAll, reported)

    // Prune + persist buffers: keep rows whose window is still open.
    fulls.foreach { case (i, full) =>
      val evtName = i.spec.vocab.eventTimeColumn
      val keep = reported match {
        case Some(r) => full.where(rowWindowEnd(col(evtName), evtName) > tsLit(r))
        case None    => full
      }
      store.write(bufferName(i.spec.queryAlias), keep)
    }

    ExecResult(emitted, reported, reported, None, retractive)
  }

  // ── AS-OF / temporal join (SURVEY.md §2.2 joins) ─────────────────────
  /** @param windowed as-of feeding a tumbling agg (Mode.AsOfWindowed): the
    *   joined stream is additionally buffered across runs and the final
    *   result gates on window end like runWindowed — composition the
    *   reference inherits from the Flink planner. The window buffer prunes
    *   on the probe's event-time column, which assumes the window groups on
    *   a time derived non-shifted from it (the whole observed surface).
    */
  private def runAsOf(windowed: Boolean): ExecResult = {
    val spec = asOf.get
    val probe = byAlias(spec.probeTable).getOrElse(
      throw new InvalidQueryException(s"unknown probe input ${spec.probeTable}"))
    val build = byAlias(spec.buildTable).getOrElse(
      throw new InvalidQueryException(s"unknown build input ${spec.buildTable}"))

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

    // Version-store key: the DECLARED primary key of the temporal table
    // wins (reference TransformEngine.scala:170-200 — keyed temporal table
    // function, composite PKs rejected); the key equality written in the
    // join/WHERE clause is used as a cross-check and as the probe-side
    // column name, and remains a fallback when no PK is declared.
    val sqlKeys = asOfStepPlan.flatMap(p => findAsOfKeys(p, spec))
    val (probeKey, buildKey) = temporalTables.get(spec.buildTable) match {
      case Some(pks) =>
        val pk = pks match {
          case Vector() =>
            throw new InvalidQueryException(
              s"temporal table '${spec.buildTable}' does not define a primary key")
          case Vector(k) => k
          case _ =>
            throw new InvalidQueryException(
              s"temporal table '${spec.buildTable}' declares a composite primary " +
                "key; composite primary keys are not supported")
        }
        sqlKeys match {
          case Some((p, b)) if b == pk => (p, pk)
          case Some((_, b)) =>
            throw new InvalidQueryException(
              s"as-of join equality uses build column '$b' but the declared " +
                s"primary key of '${spec.buildTable}' is '$pk'")
          case None => (pk, pk) // same-named key equality implied by the PK
        }
      case None =>
        sqlKeys.getOrElse(throw new InvalidQueryException(
          "as-of join: no declared primary key and no key equality found in the query"))
    }

    val buildEventCol = build.spec.vocab.eventTimeColumn
    val buildOpCol = build.spec.vocab.operationTypeColumn
    val buildRenamed = buildFull
      .withColumnRenamed(buildKey, probeKey)
      .withColumn("__bk", col(probeKey))
    val buildColMap = (buildRenamed.columns
      .filter(c => c != probeKey && c != "__bk" && c != "__seq").toSeq
      .map(c => c -> s"__build_$c")) :+ ("__bk" -> s"__build_$buildKey")
    val joined =
      if (streamingMode)
        streamingAsOfJoin(eligible.drop("__seq"), buildRenamed, probeKey,
          spec.probeTimeCol, buildEventCol, buildColMap, buildWm)
      else AsOfJoin.leftAsOf(
        eligible.drop("__seq"),
        buildRenamed,
        keys = Seq(probeKey),
        probeTime = spec.probeTimeCol,
        buildTime = buildEventCol,
        buildCols = buildColMap,
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
    // Windowed composition: the window stage sees the joined stream's full
    // open-window history (buffer ∪ this run's join output), not just the
    // increment — same recompute-open-windows design as runWindowed.
    val windowInputFull =
      if (windowed)
        store.read(bufferName(AsOfWindowBufferAlias), inner.schema).unionByName(inner)
      else inner
    windowInputFull.createOrReplaceTempView("__asof_joined")

    var result: DataFrame = null
    steps.zipWithIndex.foreach { case ((alias, rwStep), i) =>
      val stepDf =
        if (rwStep.asOf.isDefined)
          org.apache.spark.sql.GraftPlanExec.ofRows(spark,
            rewriteAsOfPlan(
              spark.sessionState.sqlParser.parsePlan(rwStep.sql), spec))
        else spark.sql(rwStep.sql)
      val df = Snitch.tap(stepDf, alias.getOrElse("output"))
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
    if (windowed) {
      val emitted = gateByWindowEnd(result, wm)
      val keep = wm match {
        case Some(r) =>
          windowInputFull.where(
            rowWindowEnd(col(spec.probeTimeCol), spec.probeTimeCol) > tsLit(r))
        case None => windowInputFull
      }
      store.write(bufferName(AsOfWindowBufferAlias), keep)
      ExecResult(emitted, wm, wm, None, ledger.retractiveInputs)
    } else
      ExecResult(result, wm, None, None, ledger.retractiveInputs)
  }

  // ── Snapshot diff: generic updating queries (SURVEY.md §7.4) ──────────
  /** Recompute over history, diff against the previous snapshot.
    * `keys` pairs old/new rows (-U/+U per changed key); None falls back to
    * full-row multiset diff (+I/-D only). Keys are validated against the
    * actual output columns — a key that does not survive the final
    * projection falls back to the multiset diff rather than failing.
    *
    * With `touch` (Top-N / dedup-latest over a single input), both the
    * recompute and the diff are narrowed to the partitions the new slice
    * touches — O(touched partitions), not O(full history), per run; rows of
    * untouched partitions provably cannot change (no new input, no
    * time-varying literals, no subqueries — enforced by the classifier) and
    * are carried into the stored snapshot unread.
    */
  private def runSnapshotDiff(
      keys: Option[Seq[String]],
      touch: Option[PlanClassifier.RankTouch] = None): ExecResult = {
    // Touched-partition narrowing is only sound when the classifier's key
    // promise holds at runtime (keys + touch columns present in the output);
    // verify on the narrowed snapshot's columns BEFORE running it, and fall
    // back to the full recompute otherwise.
    var activeTouch = touch.flatMap(t =>
      inputs.find(_.spec.queryAlias == t.input).map(_ => t))
    var (fulls, retractive) = bufferedFulls(activeTouch, streamViews = false)
    var snapshot = runSteps(steps)
    // keys, when promised, must survive to the output; a keyless (multiset
    // diff) chain can still narrow — the diff pairs rows within touched
    // partitions only, untouched rows are carried unread either way.
    activeTouch = activeTouch.filter(t =>
      keys.forall(_.forall(snapshot.columns.contains)) &&
        t.cols.forall(snapshot.columns.contains))
    if (touch.isDefined && activeTouch.isEmpty) {
      val rebuilt = bufferedFulls(None, streamViews = false)
      fulls = rebuilt._1; retractive = rebuilt._2
      snapshot = runSteps(steps)
    }

    if (snapshot.columns.contains(vocab.operationTypeColumn))
      throw new InvalidQueryException(
        s"an updating query must not project the operation column " +
          s"'${vocab.operationTypeColumn}' — ops are generated by the " +
          "engine from the snapshot diff")

    val prev = store.read(snapshotName, snapshot.schema)
    val effKeys = keys.filter(_.forall(snapshot.columns.contains))
    // Narrowed: diff only the touched partitions of the previous snapshot
    // against the touched-only recompute; carry untouched rows through.
    val (prevCmp, untouched) = activeTouch match {
      case Some(t) =>
        val i = inputs.find(_.spec.queryAlias == t.input).get
        (semiOnTouched(prev, i, t.cols, "left_semi"),
          semiOnTouched(prev, i, t.cols, "left_anti"))
      case None => (prev, prev.limit(0))
    }
    // Streaming face of the generic recompute path (round-10): the
    // recompute and every state write below are IDENTICAL to batch — only
    // the changelog emission routes through the keyed / multiplicity
    // streaming diff, so the modes interleave on one checkpoint. Shapes
    // with no incremental fast path ride the recompute on every batch run
    // (including through retractions, which the buffer netting absorbs),
    // so serving their emission this way can never diverge from a batch
    // twin's state layout.
    val emitted =
      if (streamingMode) {
        requireStreamDiffable(snapshot.schema, keyed = effKeys.isDefined)
        effKeys match {
          case Some(ks) =>
            streamingAggDiffEmission(prevCmp, snapshot, ks, snapshot.schema)
          case None =>
            streamingMultisetEmission(prevCmp, snapshot)
        }
      } else effKeys match {
        case Some(ks) =>
          Changelog.diffSnapshots(prevCmp, snapshot, ks, vocab.operationTypeColumn)
        case None =>
          Changelog.diffMultiset(prevCmp, snapshot, vocab.operationTypeColumn)
      }

    // buffer = previous buffer ∪ slice exactly (never pruned here), so the
    // carry-append path applies: O(slice) I/O, not an O(history) rewrite.
    // A retractive input's buffer is only ever consumed through
    // netChangelog, so its tier merges compact to netted signed form —
    // retract-heavy state bytes plateau at the live multiset.
    fulls.foreach { case (i, full) =>
      val compactor =
        if (retractive.contains(i.spec.queryAlias))
          Some((d: DataFrame) => Changelog.compactSigned(
            d, i.spec.vocab.operationTypeColumn,
            Seq(i.spec.vocab.offsetColumn, i.spec.vocab.systemTimeColumn, "__seq")))
        else None
      store.appendCarry(bufferName(i.spec.queryAlias), i.df, full,
        compact = compactor)
    }
    store.write(snapshotName,
      if (activeTouch.isDefined) untouched.unionByName(snapshot) else snapshot)

    val orderCols = effKeys.getOrElse(
      snapshot.schema.fields.filter(fd =>
        org.apache.spark.sql.catalyst.expressions.RowOrdering
          .isOrderable(fd.dataType)).map(_.name).toSeq)
    ExecResult(
      emitted,
      minWm(inputs),
      None,
      emissionOrder = Some(orderCols.map(col(_).asc) :+
        col(vocab.operationTypeColumn).asc),
      retractiveInputs = retractive)
  }

  /** Incremental-merge fast path for SnapshotDiff chains whose output step
    * is one aggregation with decomposable functions (sum/count/min/max) over
    * inputs that have never carried a retraction: aggregate ONLY the new
    * slice, merge per-key partials into the persisted snapshot, and diff
    * just the touched keys. Per-run cost is O(new slice + touched-key
    * state) instead of O(full buffered history) — the difference between a
    * long-lived 100 TB dataset staying incremental and going quadratic.
    *
    * When the spec carries a [[PlanClassifier.JoinDelta]] (aggregate above
    * the chain's single inner join), the slice partials come from the join
    * delta decomposition instead of the raw slices — per-run cost
    * O(slice ⋈ state + touched keys), still never O(history ⋈ history).
    *
    * Raw input buffers are still maintained: the first retraction (min/max
    * are not invertible) flips execution to [[runSnapshotDiff]]'s
    * net-and-recompute path, which reads the same `snapshotName` state the
    * merge path maintains, so the two paths interleave per run without
    * migration.
    */
  /** An avg that appears only in HAVING was rewritten to a sum/count
    * division; that matches avg's arithmetic exactly iff the division is
    * double division (any non-decimal numeric sum). Decimal quotients
    * follow decimal-division precision rules, not avg's s+4 rounding, so
    * such queries keep the generic recompute path — decided once per run
    * from the ANALYZED partials schema (no jobs execute), and
    * deterministic across runs because input schemas are fixed.
    */
  private def hiddenAvgsDivisible(
      spec: PlanClassifier.AggMergeSpec): Boolean =
    spec.hiddenAvgs.isEmpty || {
      inputs.foreach(i =>
        i.df.drop("__seq").createOrReplaceTempView(i.spec.queryAlias))
      steps.zipWithIndex.foreach { case ((alias, rw), i) =>
        if (i != outputIdx)
          alias.foreach(a => spark.sql(rw.sql).createOrReplaceTempView(a))
      }
      val schema = org.apache.spark.sql.GraftPlanExec
        .ofRows(spark, spec.partialsPlan.get).schema
      spec.hiddenAvgs.forall(n => schema(s"__as_$n").dataType match {
        case _: org.apache.spark.sql.types.DecimalType => false
        case _: org.apache.spark.sql.types.NumericType => true
        case _                                         => false
      })
    }

  /** @param neverFlips true when this spec can never reach the recompute
    *   path (invertible, op-free chain, divisible avgs): its aggregate
    *   state is then kept as TIER-APPENDED ADDITIVE DELTAS — every partial
    *   of an invertible spec is a sum or count, so state is a pure
    *   additive monoid: a run appends only its slice's delta partials
    *   (O(slice) write) instead of rewriting the full O(groups) state, and
    *   the visible-snapshot copy (only ever read by the recompute path) is
    *   skipped entirely. Absolute values are reconstructed on read by a
    *   groupBy-sum over the tiers; size-tiered compaction collapses tiers
    *   with the same sum and sweeps net-zero (dead) groups. At 100 TB
    *   scale this is the difference between per-run state I/O tracking the
    *   GROUP COUNT (potentially billions for keyed snapshots) and tracking
    *   the slice.
    */
  /** The aggMerge spec is a bare refcount DISTINCT / UNION support set —
    * the only partial is the hidden row count, nothing applies post-merge
    * and no join sits below. The shape the streaming face can serve. */
  private def plainDistinctSpec(spec: PlanClassifier.AggMergeSpec): Boolean =
    spec.keys.nonEmpty &&
      spec.aggs == Seq(PlanClassifier.RowCountCol -> "count") &&
      spec.avgs.isEmpty && spec.hiddenAvgs.isEmpty &&
      spec.havingSql.isEmpty && spec.multiplicitySql.isEmpty &&
      spec.exprCols.isEmpty && spec.sumNullCounts.isEmpty &&
      spec.join.isEmpty && spec.leftJoin.isEmpty && spec.partialsPlan.isDefined

  /** Invertible join-free aggregate chain the streaming face can serve:
    * exactly the shapes whose every batch dispatch is the never-flipping
    * tiered merge (invertible sum/count/avg, op-free chain, divisible
    * avgs, no join below, not a multiset set-op), so streaming and batch
    * runs share one state layout. The bare DISTINCT shape is carved out
    * first by [[plainDistinctSpec]]'s own face.
    */
  private def streamingServableAggSpec(
      spec: PlanClassifier.AggMergeSpec): Boolean =
    spec.invertible && spec.join.isEmpty && spec.leftJoin.isEmpty &&
      spec.multiplicitySql.isEmpty && spec.partialsPlan.isDefined &&
      !plainDistinctSpec(spec) && !stepsReferenceOp &&
      hiddenAvgsDivisible(spec)

  /** FLIPPABLE aggregate changelogs served by the SAME
    * [[streamingAggDiffEmission]] face (round 9): the emission is a keyed
    * diff of two visible frames, which is shape-agnostic — only the
    * batch-side slice-aggregate computation differs. Two sub-families:
    * JOIN-bearing aggregates (join delta terms feed sliceAgg; requires
    * the aux partials plan — left-join aggregates always carry it,
    * inner-join aggregates when avg/HAVING/expression columns force it —
    * and direct join sides, mirroring the batch dispatch guard), and
    * plain min/max chains (non-invertible, so flippable, but the
    * monotone-over-appends fast path and its snapshot state are exactly
    * the batch dispatch). Both flip to the recompute path on the first
    * input retraction in batch, which the streaming mode cannot serve —
    * checked at dispatch.
    */
  private def streamingServableFlipAggSpec(
      spec: PlanClassifier.AggMergeSpec): Boolean = {
    val joinBearing = (spec.join.isDefined || spec.leftJoin.isDefined) &&
      spec.partialsPlan.isDefined &&
      spec.join.forall(_.rels.forall(byAlias(_).isDefined)) &&
      spec.leftJoin.forall(lj =>
        lj.allLeftRels.forall(byAlias(_).isDefined) &&
          byAlias(lj.right).isDefined)
    val plainMinMax =
      !spec.invertible && spec.join.isEmpty && spec.leftJoin.isEmpty
    (joinBearing || plainMinMax) &&
      spec.multiplicitySql.isEmpty &&
      !plainDistinctSpec(spec) && !stepsReferenceOp &&
      hiddenAvgsDivisible(spec)
  }

  /** ALL-variant multiset set-op changelog the streaming face can serve
    * (round-10): the multiplicity expression over per-side COUNT partials
    * — invertible and join-free by construction
    * ([[PlanClassifier]] builds these specs with `invertible = true` and
    * a refcount partials plan), so every batch dispatch stays on the
    * merge path and the two modes share one state layout; retractions
    * ride through the signed count partials like the invertible GROUP BY
    * face. Op-reading chains are excluded for the same reason as there.
    */
  private def streamingServableMultiplicitySpec(
      spec: PlanClassifier.AggMergeSpec): Boolean =
    spec.multiplicitySql.isDefined && spec.invertible &&
      spec.join.isEmpty && spec.leftJoin.isEmpty &&
      spec.partialsPlan.isDefined && !stepsReferenceOp

  /** Streaming face of the invertible GROUP BY changelog: two AvailableNow
    * rounds over one fresh scratch checkpoint (the [[twoPhaseTopN]] /
    * [[streamingDistinctEmission]] shape) — round 1 seeds
    * [[graft.streaming.StreamingAggDiff]]'s per-group state with the
    * previously-visible rows of the groups this slice touches (emissions
    * discarded), round 2 ingests the merged visible rows plus tombstones
    * for groups whose hidden row count died, and its emissions are exactly
    * the batch snapshot diff (+I / -U+U / -D). O(touched + slice) I/O:
    * both frames are already narrowed to touched groups.
    */
  private def streamingAggDiffEmission(
      prevVisible: DataFrame,
      newVisible: DataFrame,
      keys: Seq[String],
      visibleSchema: org.apache.spark.sql.types.StructType): DataFrame = {
    import graft.streaming.StreamingAggDiff
    val enc = org.apache.spark.sql.Encoders.product[StreamingAggDiff.Phased]
    val keyIdx = keys.map(visibleSchema.fieldIndex)
    def phased(df: DataFrame, phase: Int) = df.map { r =>
      StreamingAggDiff.record(phase, keyIdx.map(r.get), r.toSeq)
    }(enc).toDF()
    phasedStreamEmission("aggdiff",
      phased(prevVisible, 0), phased(newVisible, 1),
      (s, in) => StreamingAggDiff.diff(
        s, in, visibleSchema, vocab.operationTypeColumn),
      visibleSchema)
  }

  /** Streaming face of the ALL-variant multiset set-op changelog
    * (round-10): per touched VALUE the multiplicity expression is
    * evaluated over the old and merged per-side count partials, phase 0
    * seeds [[graft.streaming.StreamingAggDiff.multiplicityDiff]]'s keyed
    * state with the previous multiplicity, and round 2's emissions — |Δk|
    * appends or retracts per value — equal the batch
    * [[diffMultiplicity]]. The merge algebra and tiered state writes stay
    * batch, so the modes interleave on one checkpoint; the per-side count
    * partials are invertible, so input retractions ride through like the
    * invertible GROUP BY face.
    */
  private def streamingMultiplicityEmission(
      prev: DataFrame,
      merged: DataFrame,
      keys: Seq[String],
      multSql: String,
      visibleSchema: org.apache.spark.sql.types.StructType): DataFrame = {
    import graft.streaming.StreamingAggDiff
    val enc = org.apache.spark.sql.Encoders.product[StreamingAggDiff.Phased]
    def withK(df: DataFrame): DataFrame =
      df.withColumn("__mult_k", expr(multSql).cast("long"))
        .select((keys.map(col) :+ col("__mult_k")).toIndexedSeq: _*)
    def phased(df: DataFrame, phase: Int) = withK(df).map { r =>
      val vals = r.toSeq
      StreamingAggDiff.record(phase, vals.init, vals)
    }(enc).toDF()
    phasedStreamEmission("multdiff",
      phased(prev, 0), phased(merged, 1),
      (s, in) => StreamingAggDiff.multiplicityDiff(
        s, in, visibleSchema, vocab.operationTypeColumn),
      visibleSchema)
  }

  /** Streaming face of the generic KEYLESS recompute diff (round-10):
    * count multiplicities per distinct row (the same groupBy
    * [[Changelog.diffMultiset]] pairs by, so emitted values carry the
    * identical grouped representatives) and route them through the
    * multiset machinery keyed on the whole row — emissions are the ±|Δ|
    * copies the batch multiset diff reports.
    */
  private def streamingMultisetEmission(
      prev: DataFrame, next: DataFrame): DataFrame = {
    val cols = next.columns.toSeq
    def counted(df: DataFrame): DataFrame =
      df.groupBy(cols.map(col): _*).agg(count(lit(1)).as("__mult_k"))
    streamingMultiplicityEmission(
      counted(prev), counted(next), cols, "__mult_k", next.schema)
  }

  /** The streaming diff keys groups on a canonicalized serialization of
    * the key values ([[graft.streaming.StreamingAggDiff.keyOf]]), which is
    * total over every GROUP-BY-able type but NOT over maps (unordered
    * container bytes are not canonical, and map columns are not orderable
    * for the deterministic emission sort). A KEYLESS diff keys on the
    * whole output row, so a map-typed column could split a value-equal
    * row into two keys. A KEYED diff only serializes the group keys —
    * maps cannot appear there (not orderable in SQL) — but its VALUE
    * comparison would accept map columns via Scala ==, while the batch
    * twin ([[graft.operators.Changelog.diffSnapshots]]'s struct `<=>`)
    * fails analysis on map types: serving the shape in one mode only
    * would break the batch/streaming interleave contract, so both keyed
    * and keyless map-typed outputs reject here (round-10 ADVICE #2). The
    * engine-reserved multiplicity column name is fenced for the keyless
    * case for the same splitting reason.
    */
  private def requireStreamDiffable(
      schema: org.apache.spark.sql.types.StructType, keyed: Boolean): Unit = {
    import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}
    def hasMap(dt: DataType): Boolean = dt match {
      case _: MapType     => true
      case a: ArrayType   => hasMap(a.elementType)
      case s: StructType  => s.fields.exists(f => hasMap(f.dataType))
      case _              => false
    }
    if (schema.fields.exists(f => hasMap(f.dataType)))
      throw new InvalidQueryException(
        "streaming execution mode cannot serve an updating query with " +
          "map-typed output columns — use the batch engine")
    if (!keyed && schema.fieldNames.contains("__mult_k"))
      throw new InvalidQueryException(
        "streaming execution mode reserves the column name '__mult_k' — " +
          "rename the output column or use the batch engine")
  }

  /** Shared two-AvailableNow-round scaffold of the keyed streaming diff
    * faces: round 1 ingests the phase-0 seeds over a fresh scratch
    * checkpoint (emissions discarded, state committed), round 2 ingests
    * the phase-1 merged records plus phase-2 tombstones for phase-0 keys
    * that vanished from the merge, and its emissions are the changelog.
    * O(touched + slice) I/O — both phased frames are already narrowed to
    * touched keys.
    */
  private def phasedStreamEmission(
      tag: String,
      seed: DataFrame,
      merged: DataFrame,
      diffFn: (SparkSession, DataFrame) => DataFrame,
      visibleSchema: org.apache.spark.sql.types.StructType): DataFrame = {
    import graft.streaming.StreamingAggDiff
    val src = scratchDir(s"graft-$tag-src")
    val cp = scratchDir(s"graft-$tag-cp")
    val out = scratchDir(s"graft-$tag-out")
    val enc = org.apache.spark.sql.Encoders.product[StreamingAggDiff.Phased]
    def round(sink: (DataFrame, Long) => Unit): Unit = {
      val q = diffFn(spark,
        spark.readStream.schema(enc.schema).parquet(src))
        .writeStream
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", cp)
        .foreachBatch(sink)
        .start()
      q.awaitTermination()
    }
    seed.write.mode("overwrite").parquet(src)
    round((b, _) => { b.count(); () })
    merged.write.mode("append").parquet(src)
    // tombstones: touched keys visible before but not after the merge —
    // derived from the already-written phased records so neither input
    // frame is recomputed
    val ph = spark.read.schema(enc.schema).parquet(src)
    ph.where(col("phase") === 0).select("key")
      .except(ph.where(col("phase") === 1).select("key"))
      .withColumn("phase", lit(2))
      .withColumn("payload", lit(Array.emptyByteArray))
      .select("phase", "key", "payload")
      .write.mode("append").parquet(src)
    round((b, _) => b.write.mode("append").parquet(out))
    val outSchema = org.apache.spark.sql.types.StructType(
      visibleSchema.fields :+ org.apache.spark.sql.types.StructField(
        vocab.operationTypeColumn,
        org.apache.spark.sql.types.IntegerType, nullable = false))
    val hasParts = Option(new java.io.File(out).listFiles())
      .exists(_.exists(_.getName.endsWith(".parquet")))
    val emitted =
      if (hasParts) spark.read.schema(outSchema).parquet(out)
      else TransformEngine.emptyDf(spark, outSchema)
    // file sources surface every column nullable; the op column is
    // engine-generated and must stay NOT NULL for byte-identity with the
    // batch diff's literal ops
    emitted.withColumn(vocab.operationTypeColumn,
      coalesce(col(vocab.operationTypeColumn), lit(Op.Append)))
  }

  /** Streaming face of the refcount DISTINCT / UNION changelog: two
    * AvailableNow rounds over one fresh checkpoint, exactly the
    * [[twoPhaseTopN]] shape — round 1 ingests the previously-visible
    * values (emissions discarded, state committed), round 2 ingests the
    * slice's values, whose emissions are precisely the never-seen rows.
    * Sound only over non-retractive histories (support cannot cross back
    * to 0), which the dispatch gate enforces.
    */
  private def streamingDistinctEmission(
      seedVisible: DataFrame,
      sliceValues: DataFrame): DataFrame = {
    val src = scratchDir("graft-distinct-src")
    val cp = scratchDir("graft-distinct-cp")
    val out = scratchDir("graft-distinct-out")
    val schema = seedVisible.schema
    def round(sink: (DataFrame, Long) => Unit): Unit = {
      val q = graft.streaming.StreamingDistinct.firstOccurrence(spark,
        spark.readStream.schema(schema).parquet(src))
        .writeStream
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", cp)
        .foreachBatch(sink)
        .start()
      q.awaitTermination()
    }
    seedVisible.write.mode("overwrite").parquet(src)
    round((b, _) => { b.count(); () })
    sliceValues.write.mode("append").parquet(src)
    round((b, _) => b.write.mode("append").parquet(out))
    val hasParts = Option(new java.io.File(out).listFiles())
      .exists(_.exists(_.getName.endsWith(".parquet")))
    if (hasParts) spark.read.schema(schema).parquet(out)
    else TransformEngine.emptyDf(spark, schema)
  }

  private def runIncrementalAgg(
      spec: PlanClassifier.AggMergeSpec,
      neverFlips: Boolean = false): ExecResult = {
    val buffers = inputs.map { i =>
      i.df.drop("__seq").createOrReplaceTempView(i.spec.queryAlias)
      val buffer = store.read(bufferName(i.spec.queryAlias), i.df.schema)
      i -> buffer.unionByName(i.df)
    }
    // avg/HAVING chains run the classifier's PARTIALS plan (avg split into
    // sum+count, HAVING deferred); the plain shape runs the steps as-is.
    val needsAux = spec.partialsPlan.isDefined
    // set by the left-join case below; carries the equi-key clustering
    // for the buffer writes at the end of the run
    var leftPlumb: Option[LeftDeltaPlumbing] = None
    def partials(skipAliases: Set[String] = Set.empty): DataFrame =
      spec.partialsPlan match {
        case Some(p) =>
          runStepsWithOutput(
            org.apache.spark.sql.GraftPlanExec.ofRows(spark, p), skipAliases)
        case None => runSteps(steps, skipAliases)
      }
    val keys = spec.keys
    val kinds = spec.aggs.toMap ++ spec.avgs.flatMap(n =>
      Seq(s"__as_$n" -> "sum", s"__ac_$n" -> "count"))
    // This run's DELTA partials. A plain chain aggregates the new slices
    // directly (stateless derivations are linear in the input multiset).
    // With an inner-join tree below the aggregate the delta is the n-term
    // join decomposition — term i rebinding input i to its slice, inputs
    // before it to their old buffers, inputs after it to old ∪ slice — run
    // the chain once per term and merge the aggregated frames:
    // decomposable partials are associative, so agg(⋃tᵢ) = ⊕ agg(tᵢ).
    // With a LEFT join below the aggregate the decomposition additionally
    // carries RETRACTION terms (null-padded rows replaced by real pairs),
    // merged in with their sum/count partials negated.
    val sliceAgg = (spec.join, spec.leftJoin) match {
      case (Some(jd), _) =>
        val (positions, passFn) =
          joinDeltaBinding(jd, spec.partialsPlan, tap = true, () => partials())
        // key-range narrowing is sound below the aggregate too: a state
        // row outside Δ_i's edge-key range joins nothing in term i, so
        // the term's aggregate is computed over the same multiset
        val (parts, emptyFrame) =
          joinDeltaTerms(positions, passFn, equiEdgesOf(positions, passFn))
        parts
          .reduceOption((a, b) => mergePartials(a, b, keys, kinds, a.schema, "full_outer"))
          // watermark-only run: no delta terms — empty partials frame
          .getOrElse(emptyFrame())
      case (None, Some(lj)) =>
        // same three terms as runLeftDeltaJoin — shared plumbing: side
        // derivations, key-range-narrowed state scans, matched-state
        // algebra — with each term aggregated to partials and the
        // retraction term's sum/count partials negated
        val pl = new LeftDeltaPlumbing(lj)
        leftPlumb = Some(pl)
        def pass(aDf: DataFrame, bDf: DataFrame): DataFrame = {
          aDf.drop("__seq").createOrReplaceTempView(pl.leftView)
          bDf.drop("__seq").createOrReplaceTempView(pl.rightView)
          partials(skipAliases = pl.skipAliases)
        }
        val p1 = if (pl.hasDa) Some(pass(pl.dDeltaA, pl.fullBJoinable)) else None
        val p2 =
          if (pl.hasDb)
            Some(pass(pl.matchJoin(pl.oldAJoinable, pl.dDeltaB, "left_semi"),
              pl.dDeltaB))
          else None
        val p3 =
          if (pl.hasDb)
            Some(negatePartials(
              pass(pl.prevUnmatchedNowMatched, pl.dFullB.limit(0)), kinds))
          else None
        pl.updateMatched()
        val parts = Seq(p1, p2, p3).flatten
        parts
          .reduceOption((a, b) => mergePartials(a, b, keys, kinds, a.schema, "full_outer"))
          .getOrElse(pass(pl.dDeltaA, pl.dDeltaB).limit(0))
      case (None, None) =>
        // Signed slice split for invertible chains: aggregate the slice's
        // append/correct-to rows and its retract/correct-from rows in two
        // passes of the same chain and subtract the latter's partials —
        // linear stateless derivations distribute over the split, so the
        // merged frame equals the partials of the netted slice. Retraction
        // rows are bound with their op column cleared to Append so any
        // `*`-forwarding step sees the same values netting would produce.
        if (retractiveNow.isEmpty) partials()
        else {
          val negNow = inputs.filter { i =>
            val oc = i.spec.vocab.operationTypeColumn
            retractiveNow.contains(i.spec.queryAlias) &&
              i.df.columns.contains(oc) &&
              !i.df.where(col(oc).isin(Op.Retract, Op.CorrectFrom)).isEmpty
          }.map(_.spec.queryAlias).toSet
          if (negNow.isEmpty) partials()
          else {
            def pass(sign: Boolean): DataFrame = {
              inputs.foreach { i =>
                val oc = i.spec.vocab.operationTypeColumn
                val base = i.df.drop("__seq")
                val v =
                  if (!negNow.contains(i.spec.queryAlias)) {
                    if (sign) base else base.limit(0)
                  } else if (sign)
                    base.where(col(oc).isin(Op.Append, Op.CorrectTo) ||
                      col(oc).isNull)
                  else
                    base.where(col(oc).isin(Op.Retract, Op.CorrectFrom))
                      .withColumn(oc, lit(Op.Append))
                v.createOrReplaceTempView(i.spec.queryAlias)
              }
              partials()
            }
            val pos = pass(true)
            val neg = negatePartials(pass(false), kinds)
            mergePartials(pos, neg, keys, kinds, pos.schema, "full_outer")
          }
        }
    }
    // Analysis-only frame of the ORIGINAL output step — supplies the
    // visible column order and avg result types; never executed.
    val visibleSchema =
      if (!needsAux) sliceAgg.schema
      else spark.sql(steps(outputIdx)._2.sql).schema
    if (visibleSchema.fieldNames.contains(vocab.operationTypeColumn))
      throw new InvalidQueryException(
        s"an updating query must not project the operation column " +
          s"'${vocab.operationTypeColumn}' — ops are generated by the " +
          "engine from the snapshot diff")

    // Merge state: partials (with __as_/__ac_ aux columns, unfiltered by
    // HAVING) under aggStateName when aux is needed; the visible snapshot
    // itself otherwise. snapshotName holds the visible output, which is
    // what the recompute path diffs against after a retraction flip —
    // skipped for never-flip specs, whose aggStateName holds additive
    // delta tiers reconstructed by groupBy-sum on read.
    val lsm = neverFlips && spec.invertible
    // One-time state upgrade: a checkpoint written before a spec became
    // invertible holds buffers (and possibly a visible snapshot or a
    // distinct seen-set) but no partials tiers. The raw input buffers are
    // the retention contract, so the partials rebuild exactly from the
    // NETTED buffered history — one recompute at upgrade, tiered ever
    // after. A pre-existing ABSOLUTE agg_partials state needs nothing
    // PROVIDED it carries every partial column the tier algebra reads:
    // one absolute row per key is a valid single-tier base (groupBy-sum
    // over it is the identity). A checkpoint written before the spec
    // became invertible (e.g. a join-free avg/HAVING chain) has
    // agg_partials WITHOUT the hidden row-count / per-sum non-null-count
    // columns; store.read would schema-project those to NULL and
    // sumTiers' row-count filter would silently drop every prior group —
    // so the gate inspects the ACTUAL file schema, and any missing
    // partial column forces the same buffers rebuild as an absent tier
    // directory.
    val storedTiersUsable = store.fileSchema(aggStateName).forall(s =>
      sliceAgg.schema.fieldNames.forall(s.fieldNames.contains))
    // The same rebuild serves the FLIPPABLE aux-state family (agg-above-
    // join chains, whose absolute agg_partials is likewise keyed on
    // partial columns): a checkpoint whose young runs rode the cost-based
    // recompute detour — or that predates a classifier widening — holds
    // buffers and a snapshot but no agg_partials; reading that as empty
    // would diff every old group as newborn. Sound here for the same
    // reason: flippable specs only reach this path while history is
    // append-only (the first retraction flips dispatch to the recompute),
    // so netting is the identity and partials() over the buffers is the
    // exact absolute state.
    val migrated: Option[DataFrame] =
      if ((lsm || needsAux) && !(store.has(aggStateName) && storedTiersUsable) &&
        inputs.exists(i => store.has(bufferName(i.spec.queryAlias)))) Some {
        inputs.foreach { i =>
          val buf = store.read(bufferName(i.spec.queryAlias), i.df.schema)
          netChangelog(buf.drop("__seq"), i.spec.vocab)
            .createOrReplaceTempView(i.spec.queryAlias)
        }
        val base = partials()
        // re-bind the slices for every later consumer of the step views
        inputs.foreach(i =>
          i.df.drop("__seq").createOrReplaceTempView(i.spec.queryAlias))
        base
      }
      else None
    // No rebuild source AND unusable tiers: halting is the only honest
    // move — NULL-projected tiers would silently reset every group's
    // history to this run's slice.
    if ((lsm || needsAux) && migrated.isEmpty && store.has(aggStateName) &&
      !storedTiersUsable)
      throw new IllegalStateException(
        s"checkpoint state '$aggStateName' predates the invertible " +
          "partials schema and no input buffers exist to rebuild it; " +
          "resuming would silently drop all prior groups")
    val prev =
      if (lsm) migrated.getOrElse(
        sumTiers(store.read(aggStateName, sliceAgg.schema), keys,
          touched = Some(sliceAgg)))
      else if (needsAux)
        migrated.getOrElse(store.read(aggStateName, sliceAgg.schema))
      else store.read(snapshotName, sliceAgg.schema)
    val keyEq =
      if (keys.isEmpty) lit(true)
      else keys.map(k => col(s"p.$k") <=> col(s"n.$k")).reduce(_ && _)
    val mergedTouched =
      mergePartials(prev, sliceAgg, keys, kinds, sliceAgg.schema, "right_outer")
    val (prevTouched, untouched) =
      if (keys.isEmpty) (prev, prev.limit(0))
      else (
        prev.alias("p").join(sliceAgg.alias("n"), keyEq, "left_semi"),
        prev.alias("p").join(sliceAgg.alias("n"), keyEq, "left_anti"))

    /** Partials → the user-visible frame: avg = sum/count (cast to the real
      * avg type), left-path NULL/dead-group fix-ups, aux dropped, HAVING
      * applied, original column order. */
    def visible(df: DataFrame): DataFrame =
      if (!needsAux) df
      else {
        var v = df
        spec.avgs.foreach { n =>
          v = v.withColumn(n,
            (col(s"__as_$n") / col(s"__ac_$n")).cast(visibleSchema(n).dataType))
        }
        // Left-join path: a sum whose every contribution was retracted away
        // must read NULL (SQL's empty sum), not the 0 subtraction leaves;
        // a group whose last row was retracted disappears entirely (except
        // the global group, which a recompute would still produce).
        spec.sumNullCounts.foreach { case (n, nc) =>
          v = v.withColumn(n,
            when(col(nc) === 0, lit(null).cast(df.schema(n).dataType))
              .otherwise(col(n)))
        }
        // Expression columns: evaluated over the merged frame (hidden
        // partials + final key/agg/avg values, post NULL fix-ups) in
        // select-list order so lateral references see final values; cast
        // to the original analyzed type. Exact — the partials fully
        // determine every aggregate operand at its original type.
        spec.exprCols.foreach { case (n, sqlText) =>
          v = v.withColumn(n, expr(sqlText).cast(visibleSchema(n).dataType))
        }
        if ((spec.leftJoin.isDefined || spec.invertible) && keys.nonEmpty)
          v = v.where(col(PlanClassifier.RowCountCol) > 0)
        v = v.drop(spec.avgs.flatMap(n => Seq(s"__as_$n", s"__ac_$n")): _*)
        spec.havingSql.foreach(h => v = v.where(expr(h)))
        v.select(visibleSchema.fieldNames.map(col).toIndexedSeq: _*)
      }

    // Diff VISIBLE views: a group crossing the HAVING threshold appears as
    // +I / disappears as -D even though its partials persist in state.
    // ALL-variant set ops are MULTISETS: their diff is per-value
    // multiplicity arithmetic (Δk appends / |Δk| retracts), not keyed rows.
    // Under streamingMode every runIncrementalAgg call comes from the
    // vetted streaming dispatch (servable agg/flip/multiplicity/DISTINCT
    // specs plus the round-11 append-only op-reading class), so a
    // streaming-mode run here ALWAYS routes its emission through a
    // streaming diff operator — the batch diffs below are batch-only.
    val emitted = spec.multiplicitySql match {
      case Some(mult) if streamingMode =>
        // Streaming face (round 10): previously-visible touched
        // multiplicities seed StreamingAggDiff.multiplicityDiff's
        // per-value state, the merged multiplicities (+ tombstones) run
        // as a second AvailableNow round, and the |Δk| emissions equal
        // diffMultiplicity below. State and ledger writes are untouched,
        // so batch and streaming runs interleave on one checkpoint.
        streamingMultiplicityEmission(
          prevTouched, mergedTouched, keys, mult, visibleSchema)
      case Some(mult) =>
        diffMultiplicity(prevTouched, mergedTouched, keys, mult, visibleSchema)
      case None if streamingMode && plainDistinctSpec(spec) &&
          retractiveNow.isEmpty =>
        // Streaming face (round 8): the previously-visible touched values
        // seed StreamingDistinct's per-value state, then the slice's
        // values run as a second AvailableNow round whose emissions equal
        // this diff — without retractions the only support transition is
        // 0 → positive, i.e. +I for never-seen values. State and ledger
        // writes below are untouched, so batch and streaming runs
        // interleave on one checkpoint.
        streamingDistinctEmission(
          visible(prevTouched).select(keys.map(col): _*),
          sliceAgg.select(keys.map(col): _*))
          .withColumn(vocab.operationTypeColumn, lit(Op.Append))
          .select((visibleSchema.fieldNames.map(col) :+
            col(vocab.operationTypeColumn)).toIndexedSeq: _*)
      case None if streamingMode && plainDistinctSpec(spec) =>
        // Retraction histories (round 10): support can cross back to
        // zero, which first-occurrence state cannot express — the keyed
        // visible diff serves instead (values appearing emit +I, dying
        // values emit -D carrying the stored row), exactly the
        // diffSnapshots below; the signed refcount partials stay batch.
        streamingAggDiffEmission(
          visible(prevTouched), visible(mergedTouched), keys, visibleSchema)
      case None if streamingMode =>
        // Streaming face (round 9): previously-visible touched rows seed
        // StreamingAggDiff's per-group state, the merged visible rows and
        // death tombstones run as a second AvailableNow round, and the
        // emissions equal this diff. State and ledger writes below are
        // untouched, so batch and streaming runs interleave on one
        // checkpoint; input retractions ride through — the signed slice
        // split already shaped sliceAgg.
        streamingAggDiffEmission(
          visible(prevTouched), visible(mergedTouched), keys, visibleSchema)
      case None =>
        Changelog.diffSnapshots(
          visible(prevTouched), visible(mergedTouched), keys,
          vocab.operationTypeColumn)
    }

    buffers.foreach { case (i, full) =>
      store.appendCarry(bufferName(i.spec.queryAlias), i.df, full,
        orderBy = leftPlumb.map(_.bufferCluster(i.spec.queryAlias, i.df))
          .getOrElse(Nil))
    }
    // dead groups (left + invertible paths) leave state: a later row for
    // the same key starts from fresh partials, exactly as a recompute would
    val mergedAlive =
      if ((spec.leftJoin.isDefined || spec.invertible) && keys.nonEmpty)
        mergedTouched.where(col(PlanClassifier.RowCountCol) > 0)
      else mergedTouched
    if (lsm) {
      // sliceAgg IS this run's signed additive delta: append it as a tier.
      // Dead groups net to zero across tiers (zero rows are the additive
      // identity, so rebirth-from-zero ≡ rebirth-from-absent for every
      // consumer) and are swept at compaction. O(slice) write per run.
      migrated match {
        case Some(base) =>
          // Upgrade run: the rebuilt base + this run's delta become the
          // state via a plain full write — NOT appendCarry, which would
          // hard-link a schema-incompatible pre-invertible agg_partials
          // directory forward alongside the new tiers (its rows would
          // then NULL-project and vanish on every later read).
          store.write(aggStateName, base.unionByName(sliceAgg))
        case None =>
          store.appendCarry(aggStateName, sliceAgg, sliceAgg,
            compact = Some(df => {
              val m = sumTiers(df, keys)
              if (keys.nonEmpty) m.where(col(PlanClassifier.RowCountCol) =!= 0)
              else m
            }))
      }
    } else {
      val newState = untouched.unionByName(mergedAlive)
      if (needsAux) {
        store.write(aggStateName, newState)
        store.write(snapshotName, visible(newState))
      } else store.write(snapshotName, newState)
    }

    ExecResult(
      emitted,
      minWm(inputs),
      None,
      emissionOrder = Some(keys.map(col(_).asc) :+
        col(vocab.operationTypeColumn).asc),
      // retractiveNow, not the stale ledger set: the invertible path rides
      // retractions without flipping, but the ledger must still record them
      // so later runs' retractiveNow sees buffered retractions it cannot
      // re-scan.
      retractiveInputs = retractiveNow)
  }

  /** Multiset changelog for ALL-variant set ops: per touched value,
    * evaluate the multiplicity expression over the OLD and MERGED per-side
    * count partials; a positive delta emits that many appends, a negative
    * one that many retracts. Presence markers (not key-null checks) pair
    * the sides — a NULL value is a legitimate row identity. Output order
    * of the duplicated rows is immaterial: identical rows are
    * interchangeable under the deterministic emission sort.
    */
  private def diffMultiplicity(
      prev: DataFrame,
      merged: DataFrame,
      keys: Seq[String],
      multSql: String,
      visibleSchema: org.apache.spark.sql.types.StructType): DataFrame = {
    def withK(df: DataFrame, pm: String): DataFrame =
      df.withColumn("__k", expr(multSql).cast("long"))
        .withColumn(pm, lit(true))
        .select((keys.map(col) :+ col("__k") :+ col(pm)): _*)
    val n = withK(merged, "__np").alias("n")
    val p = withK(prev, "__pp").alias("p")
    val keyEq =
      if (keys.isEmpty) lit(true)
      else keys.map(k => col(s"n.$k") <=> col(s"p.$k")).reduce(_ && _)
    val kNew = when(col("n.__np").isNotNull, col("n.__k")).otherwise(lit(0L))
    val kOld = when(col("p.__pp").isNotNull, col("p.__k")).otherwise(lit(0L))
    val keyCols = keys.map(k =>
      when(col("n.__np").isNotNull, col(s"n.$k")).otherwise(col(s"p.$k")).as(k))
    n.join(p, keyEq, "full_outer")
      .select((keyCols :+ (kNew - kOld).as("__d")): _*)
      .where(col("__d") =!= 0)
      .withColumn(vocab.operationTypeColumn,
        explode(transform(sequence(lit(1L), abs(col("__d"))), _ =>
          when(col("__d") > 0, lit(Op.Append)).otherwise(lit(Op.Retract)))))
      .drop("__d")
      .select((visibleSchema.fieldNames.map(col).toIndexedSeq :+
        col(vocab.operationTypeColumn)): _*)
  }

  /** Absolute partials from additive delta tiers: group by the keys and
    * sum every partial column (all sum/count for invertible specs — sum()
    * skips NULLs, matching the merge algebra's "NULL = no contribution").
    * The row-count filter drops the all-NULL row a global aggregate over
    * ZERO tiers would produce (a keyed group's count partial is never
    * NULL), so a first run sees an empty previous state, not a phantom
    * group.
    *
    * @param touched when set (and the spec is keyed), tier rows are first
    *   semi-joined — broadcast, the touched set is slice-bounded — to the
    *   frame's key values, so the per-run groupBy shuffles only the
    *   touched keys' tier rows instead of the whole O(groups) state. The
    *   LSM branch consumes the result exclusively joined against those
    *   same keys (right-outer merge / left-semi diff), so the narrowing is
    *   invisible to it.
    */
  private def sumTiers(
      raw: DataFrame,
      keys: Seq[String],
      touched: Option[DataFrame] = None): DataFrame = {
    val narrowed = touched match {
      case Some(tk) if keys.nonEmpty =>
        raw.join(
          broadcast(tk.select(keys.map(col): _*).distinct), keys, "left_semi")
      case _ => raw
    }
    val aggCols = raw.schema.fields.filterNot(f => keys.contains(f.name))
      .map(f => sum(col(f.name)).cast(f.dataType).as(f.name)).toSeq
    val g =
      if (keys.isEmpty) narrowed.groupBy()
      else narrowed.groupBy(keys.map(col): _*)
    g.agg(aggCols.head, aggCols.tail: _*)
      .where(col(PlanClassifier.RowCountCol).isNotNull)
      .select(raw.schema.fieldNames.map(col).toIndexedSeq: _*)
  }

  /** Pairwise merge of two partials frames on the group keys with the
    * decomposable-aggregate algebra: keys pair null-safely and coalesce,
    * sum/count add, min/max take least/greatest. Null algebra: an
    * absent/NULL partial on either side merges to the other — correct for
    * sum/min/max (NULL = "no non-null values yet") and unreachable for
    * count on a present row. Cast back to `schema`: sum(decimal) widens
    * under `+`. joinType "right_outer" merges state into this run's
    * touched keys; "full_outer" combines two delta-term frames.
    */
  private def mergePartials(
      p0: DataFrame,
      n0: DataFrame,
      keys: Seq[String],
      kinds: Map[String, String],
      schema: org.apache.spark.sql.types.StructType,
      joinType: String): DataFrame = {
    val keyEq =
      if (keys.isEmpty) lit(true)
      else keys.map(k => col(s"p.$k") <=> col(s"n.$k")).reduce(_ && _)
    def mergeCol(fd: org.apache.spark.sql.types.StructField): Column = {
      val p = col(s"p.${fd.name}"); val n = col(s"n.${fd.name}")
      val m = kinds.get(fd.name) match {
        case Some("min") => when(p.isNull, n).when(n.isNull, p).otherwise(least(p, n))
        case Some("max") => when(p.isNull, n).when(n.isNull, p).otherwise(greatest(p, n))
        case Some(_)     => when(p.isNull, n).when(n.isNull, p).otherwise(p + n)
        case None        => coalesce(p, n) // group key
      }
      m.cast(fd.dataType).as(fd.name)
    }
    p0.alias("p").join(n0.alias("n"), keyEq, joinType)
      .select(schema.fields.map(mergeCol).toSeq: _*)
  }

  /** Negate the additive partial columns (sum/count kinds) of a partials
    * frame — the merge-side representation of a retraction term. min/max
    * kinds never reach here: the classifier rejects them on the left-join
    * path, and inner-tree terms are append-only.
    */
  private def negatePartials(df: DataFrame, kinds: Map[String, String]): DataFrame =
    kinds.foldLeft(df) {
      case (d, (n, k)) if (k == "sum" || k == "count") && d.columns.contains(n) =>
        d.withColumn(n, (-col(n)).cast(d.schema(n).dataType))
      case (d, _) => d
    }

  /** Append-only delta-join fast path for SnapshotDiff chains that are a
    * tree of inner joins over n input relations with no retraction ever
    * observed: run the chain once per input with the views rebound to the
    * delta decomposition's terms —
    *
    *   Δ(A₁⋈…⋈Aₙ) = ⋃ᵢ A₁ᵒˡᵈ ⋈ … ⋈ Aᵢ₋₁ᵒˡᵈ ⋈ ΔAᵢ ⋈ Aᵢ₊₁ᶠᵘˡˡ ⋈ … ⋈ Aₙᶠᵘˡˡ
    *
    * — and emit the union as appends. Per-run cost is O(slice ⋈ state)
    * with NO snapshot read and no full-history re-join; the recompute path
    * is O(full ⋈ full) plus a full multiset diff every run. An inner-join
    * tree is multilinear over append deltas, so the emitted rows equal
    * exactly what the multiset diff would report.
    *
    * Input buffers and the output snapshot are still maintained (snapshot
    * via O(slice) carry-append): the first retraction flips execution to
    * [[runSnapshotDiff]]'s net-and-recompute path, which diffs against
    * this same `snapshotName` state — the two paths interleave without
    * migration.
    */
  /** Equi-edge extraction for key-range term narrowing (round 8): bind
    * each position to an exprId-fresh probe frame, analyze the pass plan
    * once (no execution), and read the join tree's equality conjuncts
    * back as (position, inputColumn) pairs via attribute lineage — robust
    * through aliased pass-through projections in pre-steps. Failure is
    * always safe: Nil edges ⇒ no narrowing.
    */
  private def equiEdgesOf(
      positions: Vector[String],
      passFn: Vector[DataFrame] => DataFrame): Seq[(Int, String, Int, String)] =
    try {
      val probes = positions.map { p =>
        val f = byAlias(p).get.df.drop("__seq")
        f.toDF(f.columns.toIndexedSeq: _*) // fresh exprIds per position
      }
      val leafOut = probes.map(f =>
        f.queryExecution.analyzed.output.map(a => a.exprId -> a.name).toMap)
      IncrementalExecutor.extractEquiEdges(
        passFn(probes).queryExecution.analyzed, leafOut)
    } catch { case scala.util.control.NonFatal(_) => Nil }

  private def runDeltaJoin(spec: PlanClassifier.JoinDelta): ExecResult = {
    // spark.sql analyzes eagerly, so each pass captures its own bindings —
    // including any stateless pre-step views re-run over the pass's frames
    // (a stateless step is row-local: Δf(A) = f(ΔA)).
    val (positions, passFn) =
      joinDeltaBinding(spec, None, tap = false, () => runStepsUntapped())
    val edges = equiEdgesOf(positions, passFn)
    val (parts, emptyFrame) = joinDeltaTerms(positions, passFn, edges)
    // buffers of ALL inputs (referenced or not) must keep accumulating —
    // a later retraction flip recomputes over them
    val olds = inputs.map(i =>
      i.spec.queryAlias -> store.read(bufferName(i.spec.queryAlias), i.df.schema)).toMap

    // watermark-only run on every input: nothing can join, emit nothing.
    // Pinned: the union of terms feeds the emission and the snapshot
    // carry-append — without pinning every consumer re-runs all terms.
    // Structured Streaming face: swap only HOW the delta multiset is
    // computed (native stream-stream inner join over staged seeds+slices,
    // then the chain over the wide view); buffers/snapshot bookkeeping
    // below is shared, so batch and streaming runs interleave on one
    // checkpoint.
    val delta = pin(Snitch.tap(
      if (streamingMode) {
        val face = innerTreeFace.getOrElse(
          throw new InvalidQueryException(
            "streaming execution mode serves inner-join changelogs only " +
              "for left-deep chains of equi-joins over direct inputs on " +
              "same-typed keys — use the batch engine"))
        val loaded = face.rels.map { case (rel, _) => byAlias(rel).get }
        streamingInnerTreeEmission(
          face, loaded, face.rels.map(r => olds(r._1))) match {
          case Some(wide) =>
            runChainOverJoinTreeView(wide, face.rels.zipWithIndex.map {
              case ((rel, alias), i) =>
                JoinedRelView(rel, alias,
                  loaded(i).df.drop("__seq").columns
                    .map(_.toLowerCase).toSet,
                  if (i == 0) "" else if (i == 1) "__right_" else s"__r${i}_")
            })
          case None => emptyFrame()
        }
      } else parts.reduceOption(_.unionByName(_)).getOrElse(emptyFrame()),
      "output"))

    if (delta.columns.contains(vocab.operationTypeColumn))
      throw new InvalidQueryException(
        s"an updating query must not project the operation column " +
          s"'${vocab.operationTypeColumn}' — ops are generated by the " +
          "engine from the snapshot diff")

    val emitted = delta.withColumn(vocab.operationTypeColumn, lit(Op.Append))

    // cluster each referenced buffer by its (first) equi-edge column so
    // the key-range-narrowed terms prune row groups on later runs
    val clusterCols: Map[String, Seq[String]] = edges.flatMap {
      case (pa, ca, pb, cb) =>
        Seq(positions(pa) -> ca, positions(pb) -> cb)
    }.groupMap(_._1)(_._2).view.mapValues(cs => Seq(cs.head)).toMap
    inputs.foreach(i => store.appendCarry(bufferName(i.spec.queryAlias),
      i.df, olds(i.spec.queryAlias).unionByName(i.df),
      orderBy = clusterCols.getOrElse(i.spec.queryAlias, Nil)))
    store.appendCarry(snapshotName, delta,
      store.read(snapshotName, delta.schema).unionByName(delta))

    val orderCols = delta.schema.fields.filter(fd =>
      org.apache.spark.sql.catalyst.expressions.RowOrdering
        .isOrderable(fd.dataType)).map(_.name).toSeq
    ExecResult(
      emitted,
      minWm(inputs),
      None,
      emissionOrder = Some(orderCols.map(col(_).asc) :+
        col(vocab.operationTypeColumn).asc),
      retractiveInputs = ledger.retractiveInputs)
  }

  /** Left-join delta fast path (classifier: [[PlanClassifier.LeftJoinDelta]])
    * for append-only inputs. A left join is not monotone over appends — a
    * right row arriving for a previously-unmatched left row retracts that
    * row's null-padded output — so alongside the input buffers the path
    * keeps `left_matched`, the offsets of left rows that have ever had a
    * match. Per run it emits
    *
    *   ΔA ⟕ B_full                       appends (null-padded if unmatched),
    *   (A_old ⋉ ΔB) ⟕ ΔB                 appends (pairs only — every left
    *                                     row in the pass has a match in ΔB),
    *   chain((A_old ∖ matched) ⋉ ΔB, ∅)  retractions — re-running the step
    *                                     against an EMPTY right side
    *                                     reproduces exactly the null-padded
    *                                     projection those rows emitted when
    *                                     they were unmatched.
    *
    * O(slice ⋈ state) per run. The snapshot stays exact: appends carry in
    * O(slice); when retractions exist the replaced null-padded rows are
    * multiset-subtracted (exceptAll) and the snapshot rewritten, so the
    * first input retraction still flips cleanly to [[runSnapshotDiff]]'s
    * net-and-recompute path against the same state.
    *
    * Changelog granularity: when the projection drops every right-side
    * column, a replaced null-padded row and its new pair can be
    * value-identical; the recompute path's multiset diff nets such pairs
    * while this path emits the −D/+I churn explicitly (what Flink's
    * retract stream does too). The net state is identical either way.
    */
  /** Plumbing shared by [[runLeftDeltaJoin]] and the aggregate-above-
    * left-join partials path: side derivations, key-range narrowing of
    * every state-side scan, the matched-state algebra, and the term
    * input frames of the three-term decomposition. The caller supplies
    * the chain-runner (full chain vs merge partials) and calls
    * [[updateMatched]] exactly once per run.
    *
    * Side derivations (round 9): a join side may resolve through a chain
    * of stateless single-scan pre-steps ([[PlanClassifier.LeftJoinDelta]]
    * leftDerive/rightDerive). A stateless step is row-local, so deriving
    * each raw frame (Δ, old, full) through its side's chain and running
    * the decomposition over the DERIVED frames is the same algebra —
    * identity for direct sides.
    */
  private final class LeftDeltaPlumbing(spec: PlanClassifier.LeftJoinDelta) {
    /** Left-side inputs, in [[PlanClassifier.LeftJoinDelta.allLeftRels]]
      * order — several when the side's deepest pre-step is an inner-join
      * tree (round 9, second widening). */
    val leftIns: Vector[LoadedInput] = spec.allLeftRels.map(byAlias(_).get)
    val ia: LoadedInput = leftIns.head
    val ib: LoadedInput = byAlias(spec.right).get
    val leftOlds: Map[String, DataFrame] = spec.allLeftRels.map(r =>
      r -> store.read(bufferName(r), byAlias(r).get.df.schema)).toMap
    val oldA: DataFrame = leftOlds(spec.left)
    val oldB: DataFrame = store.read(bufferName(spec.right), ib.df.schema)
    val fullB: DataFrame = oldB.unionByName(ib.df)
    val offCol: String = ia.spec.vocab.offsetColumn
    val hasDa: Boolean = leftIns.exists(_.spec.offsetInterval.nonEmpty)
    val hasDb: Boolean = ib.spec.offsetInterval.nonEmpty

    private def deriveChain(
        frames: Map[String, DataFrame],
        chain: Vector[(String, String)]): DataFrame = {
      frames.foreach { case (r, df) =>
        df.drop("__seq").createOrReplaceTempView(r)
      }
      var out: DataFrame = null
      chain.foreach { case (alias, sql) =>
        out = spark.sql(sql) // eager analysis pins the view binding
        out.createOrReplaceTempView(alias)
      }
      out
    }
    /** The left side derived from one raw frame per terminal relation. */
    def dL(frames: Map[String, DataFrame]): DataFrame =
      if (spec.leftDerive.isEmpty) frames(spec.left).drop("__seq")
      else deriveChain(frames, spec.leftDerive)
    def dA(raw: DataFrame): DataFrame = dL(Map(spec.left -> raw))
    def dB(raw: DataFrame): DataFrame =
      if (spec.rightDerive.isEmpty) raw.drop("__seq")
      else deriveChain(Map(spec.right -> raw), spec.rightDerive)
    // view names the join step reads its sides from (last derivation
    // alias, or the terminal relation for a direct side); the caller's
    // pass registers the derived frames there and skips the derivation
    // steps (their only consumer is the overridden view)
    val leftView: String = spec.leftDerive.lastOption.map(_._1).getOrElse(spec.left)
    val rightView: String = spec.rightDerive.lastOption.map(_._1).getOrElse(spec.right)
    val skipAliases: Set[String] =
      (spec.leftDerive.map(_._1) ++ spec.rightDerive.map(_._1)).toSet

    /** The ON condition evaluated against the derived side frames (for
      * direct sides, the raw input frames — the predicate references only
      * the side frames' columns under these aliases). */
    def matchJoin(aDf: DataFrame, bDf: DataFrame, joinType: String): DataFrame =
      aDf.drop("__seq").alias(spec.leftAlias)
        .join(bDf.drop("__seq").alias(spec.rightAlias),
          expr(spec.conditionSql), joinType)

    /** The pre-step inner join's equi edges, kept only when both raw
      * columns exist with the SAME type (cross-type equalities resolve by
      * cast, so a native-ordering min/max band would not bound the
      * matching rows — the round-8 narrowing lesson). */
    private val innerEdges: Vector[(String, String, String, String)] =
      spec.leftEdges.filter { case (ra, ca, rb, cb) =>
        (for {
          ia2 <- byAlias(ra); ib2 <- byAlias(rb)
          fa <- ia2.df.schema.fields.find(_.name.equalsIgnoreCase(ca))
          fb <- ib2.df.schema.fields.find(_.name.equalsIgnoreCase(cb))
        } yield fa.dataType == fb.dataType).getOrElse(false)
      }

    /** BFS-narrow per-relation frames from already-narrowed seeds across
      * the inner-join equi edges — [[narrowByEquiEdges]] keyed on
      * relation names. Sound within an inner join: a row whose edge key
      * falls outside a narrowed neighbor's band joins nothing in the
      * term. */
    private def narrowFrames(
        base: Map[String, DataFrame], seed: Set[String]): Map[String, DataFrame] = {
      if (innerEdges.isEmpty) return base
      val adj: Map[String, Seq[(String, String, String)]] =
        innerEdges.flatMap { case (ra, ca, rb, cb) =>
          Seq(ra -> ((rb, ca, cb)), rb -> ((ra, cb, ca)))
        }.groupMap(_._1)(_._2)
      narrowByEquiEdges[String](
        base, base.keySet, seed.map(s => s -> base(s)).toMap, adj)
    }

    // Derived frames of the standard raw frames. Lazy vals: each
    // derive call re-registers views, but spark.sql analyzes eagerly, so
    // earlier frames keep their bindings. For a multi-relation left side
    // the delta is the standard telescoping decomposition
    // Δ(A⋈B⋈…) = Σᵢ (old₁…oldᵢ₋₁, Δᵢ, fullᵢ₊₁…) — inner joins and
    // row-local steps are multilinear in the relation multisets — and
    // the old frame binds every relation to its buffer. Each term's
    // non-delta frames are BFS-narrowed from the delta position.
    lazy val dDeltaA: DataFrame =
      if (leftIns.size == 1) dA(ia.df)
      else {
        val rels = spec.allLeftRels
        val terms = rels.indices.flatMap { i =>
          val ini = leftIns(i)
          if (ini.spec.offsetInterval.isEmpty) None
          else Some(dL(narrowFrames(rels.zipWithIndex.map { case (r, k) =>
            val in = leftIns(k)
            r -> (if (k < i) leftOlds(r)
                  else if (k == i) in.df
                  else leftOlds(r).unionByName(in.df))
          }.toMap, seed = Set(rels(i)))))
        }
        terms.reduceOption(_.unionByName(_)).getOrElse(dOldA.limit(0))
      }
    lazy val dDeltaB: DataFrame = dB(ib.df)
    lazy val dOldA: DataFrame = dL(leftOlds)
    lazy val dFullB: DataFrame = dB(fullB)
    val dASchema: org.apache.spark.sql.types.StructType =
      dL(spec.allLeftRels.map(r => r -> byAlias(r).get.df.limit(0)).toMap).schema

    // Matched-state keying: left-row offsets when the left side is direct
    // (round-8 scheme, existing checkpoints); whole DERIVED left rows when
    // the left side is derived (its projection may drop the offset
    // column). Row-keying is sound because matching depends only on
    // derived values: value-identical derived rows always transition
    // matched→unmatched together, and the anti-join below is presence-
    // based, so duplicate state rows are harmless.
    val rowKeyedMatch: Boolean = spec.leftDerive.nonEmpty
    private val matchedSchema: org.apache.spark.sql.types.StructType =
      if (rowKeyedMatch) dASchema
      else org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(offCol,
          org.apache.spark.sql.types.LongType)))
    /** The matched-state projection of a [[matchJoin]] output: the left
      * offset column (direct scheme) or the whole derived row. */
    private def matchedForm(df: DataFrame): DataFrame =
      if (rowKeyedMatch) df else df.select(col(s"${spec.leftAlias}.$offCol"))
    /** Matched state, with a one-time checkpoint migration: a checkpoint
      * whose chain previously executed on the recompute path (pre-widening
      * code, or a shape the classifier only now admits) holds input
      * buffers but no `left_matched` state. Reading that as empty would
      * treat every already-matched old left row as previously unmatched,
      * so the first ΔB re-match would emit a −D retraction of a
      * null-padded row that was never in the output. Rebuild it from the
      * old buffers instead: this path only runs over fully append-only
      * history ([[retractiveNow]] is ledger-sticky, and the dispatch flips
      * to [[runSnapshotDiff]] on the first retraction), so "ever matched"
      * ≡ "matches the full old right side". Persistence is free —
      * [[updateMatched]]'s appendCarry writes the FULL matched frame when
      * the previous checkpoint lacks `left_matched` — so the rebuild runs
      * once, not per run. A PRESENT state whose on-disk columns disagree
      * with this chain's scheme (offset- vs row-keyed — only possible if
      * the dataset's query changed shape between runs) can neither be
      * carried (appendCarry hard-links the old tiers) nor silently
      * NULL-projected; halt honestly, mirroring the invertible-partials
      * migration guard.
      */
    lazy val matched0: DataFrame =
      if (store.has(leftMatchedName)) {
        val onDisk = store.fileSchema(leftMatchedName).get
        if (onDisk.fields.map(_.name.toLowerCase).toSet !=
            matchedSchema.fields.map(_.name.toLowerCase).toSet)
          throw new IllegalStateException(
            s"checkpoint state '$leftMatchedName' was written under a " +
              s"different matched-state scheme (${onDisk.fieldNames.mkString(",")} " +
              s"vs ${matchedSchema.fieldNames.mkString(",")}); resuming would " +
              "corrupt the left-join changelog")
        store.read(leftMatchedName, matchedSchema)
      } else if ((spec.allLeftRels :+ spec.right)
          .exists(r => store.has(bufferName(r))))
        pin(matchedForm(matchJoin(dOldA, dB(oldB), "left_semi")))
      else store.read(leftMatchedName, matchedSchema)

    // Key-range narrowing (round 8): when the ON condition carries an
    // equality conjunct, each pass's STATE-side frame is pre-filtered to
    // the joining delta's key range — a parquet-pushable BETWEEN that
    // prunes row groups at the scan (buffer tiers are generational and
    // key-sorted at write, so for arrival-correlated keys the state read
    // is ~O(slice), not O(state)). Sound per pass: a state row outside
    // the delta's key range cannot satisfy the equality conjunct against
    // any delta row, whatever the other conjuncts require. Narrowing runs
    // over the DERIVED frames: for direct sides the filter hits the raw
    // buffer scan directly; for derived sides Catalyst pushes the
    // predicate through the derivation's projects/filters whenever the
    // key maps to a scanned column.
    // struct/array equi keys SERVE the join (canonical state keying) but
    // skip range narrowing: their collected min/max cannot appear in a
    // literal BETWEEN (Spark has no struct literals), and parquet cannot
    // push such predicates anyway — dropping equiC here disables only the
    // optimization, never the join itself
    val equiC: Option[(String, String)] =
      leftJoinEquiConjunct(spec, dASchema, dB(ib.df.limit(0)).schema)
        .filter { case (lk, _) => bandableKeyType(dASchema, lk) }
    /** Or-of-bands filter — the delta side is always a SEED (slice-sized)
      * frame, so it gets the gap-split multi-bands of [[keyBands]]: a
      * zipfian delta (ancient hot key + fresh monotone keys) collapses a
      * single min/max band to the full history range and un-prunes the
      * state scans (round-9 VERDICT #2). */
    private def narrowTo(
        df: DataFrame, k: String, bands: Option[Seq[(Any, Any)]]): DataFrame =
      bands match {
        case Some(bs) => df.where(bs.map { case (lo, hi) =>
          col(k) >= lit(lo) && col(k) <= lit(hi)
        }.reduce(_ || _))
        case None => df.where(lit(false)) // delta has no non-null keys
      }
    lazy val fullBJoinable: DataFrame = equiC match {
      case Some((lk, rk)) if hasDa => narrowTo(dFullB, rk, keyBands(dDeltaA, lk))
      case _                       => dFullB
    }
    // ΔB's key bands, computed once: they narrow old-A, and in the
    // row-keyed scheme also the matched set (a matched row with an
    // out-of-band key cannot whole-row-equal an in-band old-A row)
    private lazy val dbBand: Option[Option[Seq[(Any, Any)]]] =
      equiC.filter(_ => hasDb).map { case (_, rk) => keyBands(dDeltaB, rk) }
    lazy val oldAJoinable: DataFrame = (equiC, dbBand) match {
      case (Some((lk, _)), Some(r)) =>
        // multi-relation left side: when the L-join key's lineage reaches
        // a raw relation column, seed THAT relation's old buffer with
        // ΔB's bands and BFS them across the inner edges — every scan
        // under the old-L join is pruned, not just the joined output
        val interior = spec.leftColSources.get(lk.toLowerCase) match {
          case Some((rel, raw)) if leftIns.size > 1 && leftOlds.contains(rel) =>
            val seeded = leftOlds.updated(rel, narrowTo(leftOlds(rel), raw, r))
            dL(narrowFrames(seeded, Set(rel)))
          case _ => dOldA
        }
        narrowTo(interior, lk, r)
      case _ => dOldA
    }
    private lazy val matched0Joinable: DataFrame =
      if (rowKeyedMatch) (equiC, dbBand) match {
        case (Some((lk, _)), Some(r)) => narrowTo(matched0, lk, r)
        case _                        => matched0
      }
      else matched0 // offset scheme: a narrow long column, scan as-is

    /** Previously-unmatched old left rows that ΔB just matched — the p3
      * retraction term's left frame (derived rows). Pinned: consumed by
      * the p3 pass AND the matched-state update. */
    lazy val prevUnmatchedNowMatched: DataFrame =
      if (hasDb) {
        val unmatchedOld =
          if (rowKeyedMatch)
            // presence anti-join on the whole derived row, null-safe per
            // column (derived values may be null)
            oldAJoinable.alias("__a").join(matched0Joinable.alias("__m"),
              dASchema.fields.map(f =>
                col(s"__a.${f.name}") <=> col(s"__m.${f.name}"))
                .reduce(_ && _), "left_anti")
          else
            oldAJoinable.alias("__a").join(matched0Joinable.alias("__m"),
              col(s"__a.$offCol") === col(s"__m.$offCol"), "left_anti")
        pin(matchJoin(unmatchedOld, dDeltaB, "left_semi"))
      } else dOldA.limit(0)

    /** Buffer clustering columns for input `alias`: the side's equi key
      * when the raw buffer has a same-named column (the common
      * passthrough case — sort order is a storage optimization, never a
      * correctness input). */
    def bufferCluster(alias: String, raw: DataFrame): Seq[String] = {
      def inRaw(k: String): Boolean =
        raw.schema.fields.exists(_.name.equalsIgnoreCase(k))
      equiC match {
        case Some((lk, _))
            if spec.allLeftRels.contains(alias) && inRaw(lk) => Seq(lk)
        case Some((_, rk)) if alias == spec.right && inRaw(rk) => Seq(rk)
        case _ => Nil
      }
    }

    /** Append this run's matched-state delta: ΔA rows matching anything
      * now, plus the previously-unmatched old rows ΔB just matched —
      * disjoint from matched0 (offset scheme), or at worst duplicating
      * value-equal rows already there (row scheme; presence anti-joins
      * are duplicate-insensitive). Call exactly once per run. */
    def updateMatched(): Unit = {
      val newMatched = Seq(
        if (hasDa) Some(matchedForm(matchJoin(dDeltaA, fullBJoinable, "left_semi")))
        else None,
        if (hasDb) Some(matchedForm(prevUnmatchedNowMatched)) else None
      ).flatten.reduceOption(_.unionByName(_)).getOrElse(matched0.limit(0))
      store.appendCarry(leftMatchedName, newMatched,
        matched0.unionByName(newMatched),
        // cluster row-keyed matched tiers on the equi key so the narrowed
        // anti-join scan above prunes row groups on later runs
        orderBy = if (rowKeyedMatch) equiC.map(_._1).toSeq else Nil)
    }
  }

  private def runLeftDeltaJoin(spec: PlanClassifier.LeftJoinDelta): ExecResult = {
    val pl = new LeftDeltaPlumbing(spec)
    import pl.{dDeltaA, dDeltaB, dFullB, fullBJoinable, oldAJoinable,
      prevUnmatchedNowMatched, hasDa, hasDb}
    val ia = pl.ia; val ib = pl.ib
    // reuse the plumbing's buffer reads instead of re-listing state dirs
    val olds = inputs.map { i =>
      val a = i.spec.queryAlias
      a -> pl.leftOlds.getOrElse(a,
        if (a == spec.right) pl.oldB
        else store.read(bufferName(a), i.df.schema))
    }.toMap
    val oldA = pl.oldA; val oldB = pl.oldB

    /** Run the chain with both join-side frames ALREADY DERIVED: register
      * them under the side view names and skip the derivation pre-steps.
      * Identical to the round-8 raw pass when both sides are direct. */
    def pass(aDf: DataFrame, bDf: DataFrame): DataFrame = {
      aDf.drop("__seq").createOrReplaceTempView(pl.leftView)
      bDf.drop("__seq").createOrReplaceTempView(pl.rightView)
      runStepsUntapped(skipAliases = pl.skipAliases)
    }

    // Emission: three batch passes, or the Structured Streaming face —
    // same multiset of (row, op) either way (the append terms are
    // ΔA ⟕ B_full plus A_old-pairs × ΔB; the retract term is the
    // null-padded projection of previously-unmatched old left rows ΔB just
    // matched), so the deterministic sink sort yields byte-identical
    // slices. Bookkeeping below (buffers / matched state / snapshot) is
    // shared — the streaming face only swaps how the changelog is computed.
    val (appends, retractsRaw) =
      if (streamingMode)
        streamingLeftJoinEmission(spec, pl)
      else {
        val p1 = if (hasDa) Some(pass(dDeltaA, fullBJoinable)) else None
        val p2 =
          if (hasDb)
            Some(pass(pl.matchJoin(oldAJoinable, dDeltaB, "left_semi"), dDeltaB))
          else None
        val p3 =
          if (hasDb) Some(pass(prevUnmatchedNowMatched, dFullB.limit(0)))
          else None
        // pin: appends feed the emission AND the snapshot update; p3 feeds
        // the emptiness check, the emission, AND the exceptAll — without
        // pinning each consumer re-runs the whole join pass
        (Seq(p1, p2).flatten.reduceOption(_.unionByName(_)).map(pin),
          p3.map(pin).filter(!_.isEmpty))
      }

    val shape = appends.getOrElse(pass(dDeltaA, dDeltaB).limit(0))
    if (shape.columns.contains(vocab.operationTypeColumn))
      throw new InvalidQueryException(
        s"an updating query must not project the operation column " +
          s"'${vocab.operationTypeColumn}' — ops are generated by the " +
          "engine from the snapshot diff")

    val emitted = Snitch.tap(
      (appends.map(_.withColumn(vocab.operationTypeColumn, lit(Op.Append))) ++
        retractsRaw.map(_.withColumn(vocab.operationTypeColumn, lit(Op.Retract))))
        .reduceOption(_.unionByName(_))
        .getOrElse(shape.limit(0).withColumn(vocab.operationTypeColumn, lit(Op.Append))),
      "output")

    inputs.foreach { i =>
      // cluster join buffers by the side's equi key so the key-range-
      // narrowed passes above prune row groups on later runs
      store.appendCarry(bufferName(i.spec.queryAlias),
        i.df, olds(i.spec.queryAlias).unionByName(i.df),
        orderBy = pl.bufferCluster(i.spec.queryAlias, i.df))
    }
    pl.updateMatched()

    val prevSnap = store.read(snapshotName, shape.schema)
    retractsRaw match {
      case Some(r) =>
        store.write(snapshotName,
          appends.map(prevSnap.unionByName(_)).getOrElse(prevSnap).exceptAll(r))
      case None =>
        val add = appends.getOrElse(shape.limit(0))
        store.appendCarry(snapshotName, add, prevSnap.unionByName(add))
    }

    val orderCols = shape.schema.fields.filter(fd =>
      org.apache.spark.sql.catalyst.expressions.RowOrdering
        .isOrderable(fd.dataType)).map(_.name).toSeq
    ExecResult(
      emitted,
      minWm(inputs),
      None,
      emissionOrder = Some(orderCols.map(col(_).asc) :+
        col(vocab.operationTypeColumn).asc),
      retractiveInputs = ledger.retractiveInputs)
  }

  /** Append-only DISTINCT fast path: distinct the NEW SLICE only through
    * the step, then anti-join (null-safe, all columns) the persisted
    * snapshot — rows already emitted stay emitted, new distinct rows
    * append. O(slice ⋈ state) per run versus the recompute path's
    * full-history distinct plus full snapshot diff. State is maintained
    * exactly as the recompute path expects (buffers carried, snapshot
    * extended via O(slice) carry-append), so the first retraction flips to
    * [[runSnapshotDiff]] without migration.
    */
  private def runDistinctDelta(spec: PlanClassifier.DistinctDelta): ExecResult = {
    // Delta candidates: the distinct of the new slice alone — or, with an
    // inner join under the DISTINCT, of the join's delta terms (each pass
    // re-runs the chain, so the step's own DISTINCT applies per term;
    // dropDuplicates dedups across the two terms before the anti-join).
    val sliceDistinct: DataFrame = spec.join match {
      case None =>
        val i = byAlias(spec.input).get
        i.df.drop("__seq").createOrReplaceTempView(spec.input)
        runStepsUntapped()
      case Some(jd) =>
        val (positions, passFn) =
          joinDeltaBinding(jd, None, tap = false, () => runStepsUntapped())
        val (parts, emptyFrame) =
          joinDeltaTerms(positions, passFn, equiEdgesOf(positions, passFn))
        parts match {
          case Seq()   => emptyFrame()
          case Seq(p1) => p1
          case many    => many.reduce(_.unionByName(_)).dropDuplicates()
        }
    }

    if (sliceDistinct.columns.contains(vocab.operationTypeColumn))
      throw new InvalidQueryException(
        s"an updating query must not project the operation column " +
          s"'${vocab.operationTypeColumn}' — ops are generated by the " +
          "engine from the snapshot diff")

    // pinned: feeds the range probe, the anti-join, and (via delta) the
    // emission + snapshot carry
    val sliceD = pin(sliceDistinct)
    val prev = store.read(snapshotName, sliceD.schema)
    // Key-range narrowing (round 8): the anti-join only needs snapshot
    // rows that could EQUAL a slice row, so prune the state scan to the
    // slice's value range on the first atomic column (parquet-pushable;
    // the snapshot is clustered on it at write below). NULLs are kept —
    // the key equality is null-safe, and min/max ignore them.
    val rangeCol: Option[String] = {
      import org.apache.spark.sql.types._
      sliceD.schema.fields.find(f => f.dataType match {
        case _: NumericType => true
        case StringType | TimestampType | TimestampNTZType | DateType => true
        case _ => false
      }).map(_.name)
    }
    val prevNarrowed = rangeCol match {
      case Some(c) =>
        // gap-split multi-bands of the slice's values (keyBands): a hot
        // ancient value plus fresh monotone ones would otherwise collapse
        // the single band to the full snapshot range (round-9 VERDICT #2)
        keyBands(sliceD, c) match {
          case None => prev.where(col(c).isNull)
          case Some(bs) => prev.where(col(c).isNull ||
            bs.map { case (lo, hi) =>
              col(c) >= lit(lo) && col(c) <= lit(hi)
            }.reduce(_ || _))
        }
      case None => prev
    }
    val keyEq = sliceD.columns
      .map(c => col(s"n.$c") <=> col(s"p.$c")).reduce(_ && _)
    val delta = pin(Snitch.tap(
      sliceD.alias("n").join(prevNarrowed.alias("p"), keyEq, "left_anti"),
      "output"))
    val emitted = delta.withColumn(vocab.operationTypeColumn, lit(Op.Append))

    // carry ALL inputs' buffers (a later retraction flip recomputes over them)
    inputs.foreach(in => store.appendCarry(bufferName(in.spec.queryAlias), in.df,
      store.read(bufferName(in.spec.queryAlias), in.df.schema).unionByName(in.df)))
    store.appendCarry(snapshotName, delta, prev.unionByName(delta),
      orderBy = rangeCol.toSeq)

    val orderCols = sliceDistinct.schema.fields.filter(fd =>
      org.apache.spark.sql.catalyst.expressions.RowOrdering
        .isOrderable(fd.dataType)).map(_.name).toSeq
    ExecResult(
      emitted,
      minWm(inputs),
      None,
      emissionOrder = Some(orderCols.map(col(_).asc) :+
        col(vocab.operationTypeColumn).asc),
      retractiveInputs = ledger.retractiveInputs)
  }

  /** [[runSteps]] with the output step's DataFrame supplied directly (the
    * partials plan) instead of parsed from its SQL. `skipAliases` as in
    * [[runStepsUntapped]] (pre-registered override views). */
  private def runStepsWithOutput(
      outDf: => DataFrame,
      skipAliases: Set[String] = Set.empty): DataFrame = {
    var out: DataFrame = null
    steps.zipWithIndex.foreach { case ((alias, rwStep), i) =>
      if (!alias.exists(skipAliases.contains)) {
        val df = Snitch.tap(
          if (i == outputIdx) outDf else spark.sql(rwStep.sql),
          alias.getOrElse("output"))
        alias.foreach(df.createOrReplaceTempView)
        if (i == outputIdx) out = df
      }
    }
    out
  }

  /** Reduce a changelog input to its surviving multiset before stateful
    * recomputation: append/correct-to rows weigh +1, retract/correct-from
    * −1; identical rows (system columns excluded) net out and survivors are
    * re-expanded. Full recomputation over the surviving multiset yields
    * exactly what Flink's accumulator retraction produces for any
    * aggregate. Offset/system-time metadata columns are carried as min()
    * representatives — they are excluded from the netting identity because
    * a retraction always arrives at a different offset than the row it
    * cancels.
    */
  private def netChangelog(df: DataFrame, v: DatasetVocabulary): DataFrame = {
    val opCol = v.operationTypeColumn
    if (!df.columns.contains(opCol)) return df
    val meta = Seq(v.offsetColumn, v.systemTimeColumn).filter(df.columns.contains)
    val userCols = df.columns.filterNot(c => c == opCol || meta.contains(c)).toSeq
    val aggExprs =
      sum(when(col(opCol).isin(Op.Append, Op.CorrectTo), 1L)
        .otherwise(-1L)).as("__net") +: meta.map(c => min(col(c)).as(c))
    df.groupBy(userCols.map(col): _*)
      .agg(aggExprs.head, aggExprs.tail: _*)
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

  private def runSteps(
      ss: Seq[(Option[String], SqlRewriter.Rewritten)],
      skipAliases: Set[String] = Set.empty): DataFrame = {
    var out: DataFrame = null
    ss.zipWithIndex.foreach { case ((alias, rwStep), i) =>
      if (!alias.exists(skipAliases.contains)) {
        val df = Snitch.tap(spark.sql(rwStep.sql), alias.getOrElse("output"))
        alias.foreach(df.createOrReplaceTempView)
        if (i == outputIdx) out = df
      }
    }
    out
  }

  /** [[runSteps]] without Snitch taps — for delta-path passes that re-run
    * the chain per decomposition term: the pass output feeds a frame that
    * is tapped once as "output", so per-pass taps would double-count.
    * `skipAliases` steps are not executed — the caller has pre-registered
    * an override frame under their view names (left-join side
    * derivations; running the step would overwrite the override). */
  private def runStepsUntapped(
      skipAliases: Set[String] = Set.empty): DataFrame = {
    var out: DataFrame = null
    steps.zipWithIndex.foreach { case ((alias, rw), i) =>
      if (!alias.exists(skipAliases.contains)) {
        val df = spark.sql(rw.sql)
        alias.foreach(df.createOrReplaceTempView)
        if (i == outputIdx) out = df
      }
    }
    out
  }

  private lazy val inputRelNames: Set[String] = inputs.map(_.spec.queryAlias).toSet

  /** INPUT-relation scan sites across the chain, in execution order (steps
    * in sequence, leaves left-to-right within each plan) — the same
    * traversal [[runStepsOccBound]]'s rewrite walks, so position k here is
    * the site bound to frame k there. `outPlanOverride` substitutes the
    * output step's plan (the agg path's partials plan).
    */
  private def occurrenceSites(
      outPlanOverride: Option[org.apache.spark.sql.catalyst.plans.logical.LogicalPlan])
      : Vector[String] =
    steps.zipWithIndex.flatMap { case ((_, rw), i) =>
      val p =
        if (i == outputIdx && outPlanOverride.isDefined) outPlanOverride.get
        else spark.sessionState.sqlParser.parsePlan(rw.sql)
      p.collect {
        case r: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
            if inputRelNames(r.multipartIdentifier.last) =>
          r.multipartIdentifier.last
      }
    }.toVector

  /** Execute the chain with input scan site k reading occFrames(k): the
    * relation node is replaced by the frame's logical plan under a
    * SubqueryAlias carrying the original name, so qualified references
    * (`a.x` and user aliases above) still resolve. Self-join delta passes
    * need this — two sites of one relation must see DIFFERENT frames in
    * one pass, which name-keyed temp views cannot express. Pre-step alias
    * views register as usual; leaf order matches [[occurrenceSites]]
    * (collect is preorder, transformUp postorder, but relation nodes are
    * leaves, so their left-to-right sequence is identical).
    */
  private def runStepsOccBound(
      occFrames: Vector[DataFrame],
      outPlanOverride: Option[org.apache.spark.sql.catalyst.plans.logical.LogicalPlan],
      tap: Boolean): DataFrame = {
    var k = -1
    var out: DataFrame = null
    steps.zipWithIndex.foreach { case ((alias, rw), i) =>
      val base =
        if (i == outputIdx && outPlanOverride.isDefined) outPlanOverride.get
        else spark.sessionState.sqlParser.parsePlan(rw.sql)
      val rebound = base.transformUp {
        case r: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
            if inputRelNames(r.multipartIdentifier.last) =>
          k += 1
          org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias(
            r.multipartIdentifier.last, occFrames(k).queryExecution.logical)
      }
      val df0 = org.apache.spark.sql.GraftPlanExec.ofRows(spark, rebound)
      val df = if (tap) Snitch.tap(df0, alias.getOrElse("output")) else df0
      alias.foreach(df.createOrReplaceTempView)
      if (i == outputIdx) out = df
    }
    out
  }

  /** Positions + per-pass runner for a [[PlanClassifier.JoinDelta]]'s
    * telescoping. Distinct leaf names bind by temp view and re-run the
    * chain via `runNamed` (the caller's existing execution); a self-join
    * (repeated leaf name) enumerates the chain's scan sites and rebinds
    * each per occurrence — the inner-join tree is multilinear over SITES,
    * so the same old/Δ/full telescoping applies position-wise unchanged.
    */
  private def joinDeltaBinding(
      jd: PlanClassifier.JoinDelta,
      outPlanOverride: Option[org.apache.spark.sql.catalyst.plans.logical.LogicalPlan],
      tap: Boolean,
      runNamed: () => DataFrame): (Vector[String], Vector[DataFrame] => DataFrame) =
    jd.inlinedOut match {
      // A pre-step alias consumed at several sites: the classifier inlined
      // every step into ONE output plan so each consumption site is its
      // own occurrence position — bind that single plan directly (the
      // pre-steps are not executed separately; their derivations run
      // inside each inlined copy).
      case Some(ip) =>
        require(outPlanOverride.isEmpty,
          "inlined join tree does not compose with a plan override")
        val occs = ip.collect {
          case r: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
              if inputRelNames(r.multipartIdentifier.last) =>
            r.multipartIdentifier.last
        }.toVector
        require(occs.sorted == jd.rels.sorted,
          s"inlined scan-site enumeration $occs does not match classified " +
            s"leaves ${jd.rels}")
        (occs, frames => {
          var k = -1
          val rebound = ip.transformUp {
            case r: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
                if inputRelNames(r.multipartIdentifier.last) =>
              k += 1
              org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias(
                r.multipartIdentifier.last,
                frames(k).drop("__seq").queryExecution.logical)
          }
          org.apache.spark.sql.GraftPlanExec.ofRows(spark, rebound)
        })
      case None => joinDeltaBindingNamed(jd, outPlanOverride, tap, runNamed)
    }

  private def joinDeltaBindingNamed(
      jd: PlanClassifier.JoinDelta,
      outPlanOverride: Option[org.apache.spark.sql.catalyst.plans.logical.LogicalPlan],
      tap: Boolean,
      runNamed: () => DataFrame): (Vector[String], Vector[DataFrame] => DataFrame) =
    if (jd.rels.distinct.size == jd.rels.size)
      (jd.rels, frames => {
        jd.rels.zip(frames).foreach { case (n, d) =>
          d.drop("__seq").createOrReplaceTempView(n)
        }
        runNamed()
      })
    else {
      val occs = occurrenceSites(outPlanOverride)
      require(occs.sorted == jd.rels.sorted,
        s"scan-site enumeration $occs does not match classified leaves ${jd.rels}")
      (occs,
        frames => runStepsOccBound(frames.map(_.drop("__seq")), outPlanOverride, tap))
    }

  /** Run the telescoping over the binding's positions: pass i binds
    * position j<i to its old buffer, j==i to the new slice, j>i to
    * old ∪ slice; positions whose input carried no slice contribute no
    * term. Returns the term frames plus a schema-correct empty-frame thunk
    * for watermark-only runs.
    */
  private def joinDeltaTerms(
      positions: Vector[String],
      passFn: Vector[DataFrame] => DataFrame,
      /** Equi-join edges between leaf positions as
        * (posA, colOnInputA, posB, colOnInputB) — see extractEquiEdges. */
      edges: Seq[(Int, String, Int, String)] = Nil)
      : (Seq[DataFrame], () => DataFrame) = {
    val loaded = positions.map(r => byAlias(r).get)
    val olds = positions.distinct.map(r =>
      r -> store.read(bufferName(r), byAlias(r).get.df.schema)).toMap
    // Undirected adjacency over ALL positions: pos → (neighbor, colOnPos,
    // colOnNeighbor), one entry per equi edge.
    val adjAll: Map[Int, Seq[(Int, String, String)]] =
      edges.flatMap { case (a, ca, b, cb) =>
        if (a == b) Nil else Seq(a -> ((b, ca, cb)), b -> ((a, cb, ca)))
      }.groupMap(_._1)(_._2)
    val parts = positions.indices.flatMap { i =>
      if (loaded(i).spec.offsetInterval.isEmpty) None
      else {
        // Key-range narrowing (round 8; transitive since round 9): in
        // term i, Δ_i's key range BETWEEN-filters every position
        // REACHABLE from i across equi edges ([[narrowByEquiEdges]]
        // keyed on positions) — in an A⋈B⋈C chain, Δ_A narrows B, and
        // narrowed-B's key band then narrows C. Sound per term: an
        // output row must satisfy EVERY edge equality, so a k-row whose
        // edge key lies outside the narrowed neighbor frame's key range
        // cannot join any row that survives into the term. Edges are
        // extracted from INNER joins only (extractEquiEdges), so
        // dropping NULL-keyed and out-of-band rows never removes an
        // output row.
        val base: Map[Int, DataFrame] = positions.indices.map { j =>
          j -> (if (j < i) olds(positions(j))
                else if (j == i) loaded(j).df
                else olds(positions(j)).unionByName(loaded(j).df))
        }.toMap
        val narrowed = narrowByEquiEdges[Int](
          base, positions.indices.toSet, Map(i -> loaded(i).df), adjAll)
        Some(passFn(positions.indices.map(narrowed).toVector))
      }
    }
    (parts, () => passFn(positions.map(p => byAlias(p).get.df)).limit(0))
  }

  /** Transitive key-range narrowing over an undirected equi-edge graph —
    * the one BFS shared by [[LeftDeltaPlumbing]]'s relation-keyed
    * `narrowFrames` and [[joinDeltaTerms]]' position-keyed terms. Seeds
    * are the already-delta frames; each hop band-filters an unreached
    * node's base frame with the gap-split key bands ([[keyBands]]) of
    * EVERY already-narrowed neighbor (multiple edges and triangle paths
    * all tighten; a neighbor with no non-null keys prunes the node to
    * empty). The or-of-bands filters are parquet-pushable on
    * key-clustered buffer tiers, and each hop's banding aggs run over
    * the already-pruned scan — since round 11 hop neighbors band too
    * (the single min/max collapsed under a hop-side zipfian key and the
    * delta path lost to recompute, 0.87x in the `join3 hotHop` bench).
    * Nodes unreachable from the seeds keep their base frames.
    * Nodes discovered in the SAME hop do not tighten each other — their
    * mutual bands are unordered; they tighten only later hops.
    */
  private def narrowByEquiEdges[K](
      base: Map[K, DataFrame],
      nodes: Set[K],
      seeds: Map[K, DataFrame],
      adj: Map[K, Seq[(K, String, String)]]): Map[K, DataFrame] = {
    val narrowed = scala.collection.mutable.Map[K, DataFrame]() ++ seeds
    var frontier: Set[K] = seeds.keySet
    while (frontier.nonEmpty) {
      val next = scala.collection.mutable.Map.empty[K, DataFrame]
      frontier.foreach { j =>
        adj.getOrElse(j, Nil).foreach { case (k, _, _) =>
          if (!narrowed.contains(k) && !next.contains(k) && nodes(k)) {
            next(k) = adj.getOrElse(k, Nil)
              .filter { case (v, _, _) => narrowed.contains(v) }
              .foldLeft(base(k)) { case (d, (v, ck, cv)) =>
                // EVERY narrowed neighbor gets gap-split multi-bands — a
                // zipfian key set (ancient hot key + fresh monotone keys)
                // collapses the single min/max band to the full history
                // range and un-prunes every banded state scan downstream.
                // Round 10 kept hop neighbors (buffer scans) on the plain
                // min/max, reasoning the extra bucketing agg would cost
                // more than it saves; the round-11 hop-side zipfian bench
                // (`join3 … hotHop`) measured that reasoning wrong: the
                // collapsed hop band made the delta path LOSE to recompute
                // (0.87x), while the bucketing agg runs over the neighbor's
                // already-pruned scan and is one extra pass, not O(state).
                // spark.graft.maxNarrowBands=1 restores the legacy
                // single band (GRAFT_MAX_BANDS is the EngineBench
                // harness's env alias feeding that conf).
                // struct/array edge keys serve but can't band (no struct
                // literals): keep the neighbor un-narrowed on such edges
                if (!bandableKeyType(narrowed(v).schema, cv)) d
                else keyBands(narrowed(v), cv) match {
                  case Some(bs) =>
                    d.where(bs.map { case (lo, hi) =>
                      col(ck) >= lit(lo) && col(ck) <= lit(hi)
                    }.reduce(_ || _))
                  case None => d.where(lit(false))
                }
              }
          }
        }
      }
      next.foreach { case (k, d) => narrowed(k) = d }
      frontier = next.keySet.toSet
    }
    nodes.iterator.map(k => k -> narrowed.getOrElse(k, base(k))).toMap
  }

  /** Disjoint key bands (at most [[IncrementalExecutor.MaxNarrowBands]])
    * covering EVERY non-null key of `df.c` — exact coverage by
    * construction: the key range is cut into 64 equal-width buckets, a
    * per-bucket min/max aggregate finds which buckets hold keys, and runs
    * of adjacent non-empty buckets become bands carrying their true
    * min/max (so any value between two bands provably equals no key in
    * `df`; an equality join against `df` loses nothing outside the
    * bands). Non-numeric key types and gapless ranges degenerate to the
    * plain min/max band; None = no non-null keys at all (prune to empty).
    * Or-of-bands predicates stay parquet-pushable, so row-group pruning
    * on key-clustered state tiers survives a hot key at one end of the
    * range — the zipfian adversary that collapses a single band.
    */
  /** Key types [[keyBands]] can band: orderable ATOMIC types, whose
    * collected min/max round-trip through `lit(...)` into parquet-pushable
    * BETWEEN predicates. Struct/array keys (admitted as equi keys since
    * round 11) are excluded — Spark has no literal for a collected Row,
    * so callers must skip narrowing for them, never call keyBands. */
  private def bandableKeyType(
      schema: org.apache.spark.sql.types.StructType, c: String): Boolean = {
    import org.apache.spark.sql.types._
    schema.fields.find(_.name.equalsIgnoreCase(c)).map(_.dataType).exists {
      case _: NumericType => true
      case StringType | TimestampType | TimestampNTZType | DateType |
           BooleanType | BinaryType => true
      case _ => false
    }
  }

  private def keyBands(df: DataFrame, c: String): Option[Seq[(Any, Any)]] = {
    val r = df.agg(min(col(c)), max(col(c))).head
    if (r.isNullAt(0)) return None
    val (lo, hi) = (r.get(0), r.get(1))
    def toD(v: Any): Double = v match {
      case n: java.lang.Number => n.doubleValue
      case _                   => Double.NaN
    }
    val numeric = df.schema.fields
      .find(_.name.equalsIgnoreCase(c))
      .map(_.dataType)
      .exists(_.isInstanceOf[org.apache.spark.sql.types.NumericType])
    val loD = toD(lo); val hiD = toD(hi)
    if (!numeric || lo == hi || !(hiD > loD) || (hiD - loD).isInfinity)
      return Some(Seq((lo, hi)))
    val buckets = 64
    val width = (hiD - loD) / buckets
    val bucket = greatest(
      least(floor((col(c).cast("double") - lit(loD)) / lit(width)),
        lit(buckets - 1)), lit(0)).cast("int")
    val rows = df.where(col(c).isNotNull)
      .groupBy(bucket.as("__band"))
      .agg(min(col(c)).as("mn"), max(col(c)).as("mx"))
      .collect().sortBy(_.getInt(0))
    val runs = scala.collection.mutable.ArrayBuffer.empty[(Int, Any, Any)]
    rows.foreach { row =>
      runs.lastOption match {
        case Some((e, mn0, _)) if row.getInt(0) == e + 1 =>
          runs(runs.size - 1) = (row.getInt(0), mn0, row.get(2))
        case _ => runs += ((row.getInt(0), row.get(1), row.get(2)))
      }
    }
    var bands = runs.toVector.map { case (_, mn, mx) => (mn, mx) }
    // spark.graft.maxNarrowBands=1 restores the legacy single min/max
    // band (and is the A/B lever for the skew bench); malformed values
    // fall back to the default rather than failing the transform
    val maxBands = math.max(1, scala.util.Try(
      spark.conf.get("spark.graft.maxNarrowBands",
        IncrementalExecutor.MaxNarrowBands.toString).trim.toInt)
      .getOrElse(IncrementalExecutor.MaxNarrowBands))
    while (bands.size > maxBands) {
      val i = bands.indices.dropRight(1)
        .minBy(i => toD(bands(i + 1)._1) - toD(bands(i)._2))
      bands = bands.patch(i, Vector((bands(i)._1, bands(i + 1)._2)), 2)
    }
    Some(bands)
  }

  private def minWm(ins: Seq[LoadedInput]): Option[Instant] =
    if (ins.nonEmpty && ins.forall(_.watermark.isDefined))
      Some(ins.flatMap(_.watermark).min)
    else None
}

object IncrementalExecutor {

  def bufferName(alias: String): String = s"buffer_$alias"
  def versionStoreName(alias: String): String = s"versions_$alias"
  val snapshotName: String = "snapshot"
  /** Merge-path partials state (avg sum+count aux columns, pre-HAVING
    * groups) — distinct from `snapshotName`, which always holds the
    * VISIBLE output so the recompute path can diff against it after a
    * retraction flips the chain over. */
  val aggStateName: String = "agg_partials"
  /** Young-dataset dispatch threshold, in units of SLICE-sized scans: a
    * full recompute of an invertible aggregate chain costs ≈ history/slice
    * slice-scans (one pass over the buffered history; the snapshot it
    * diffs is group-count-sized, so the diff is cheap), while the merge
    * path costs a small constant number of slice-sized jobs PLUS its
    * fixed per-run overhead — partials/matched tier reads and writes,
    * and for join chains the telescoping delta terms (measured at ~2.5 s
    * extra per run against the recompute twin in `EngineBench aggleft`,
    * BENCH_NOTES round 9). The ratio is scale-free because both sides are
    * measured in units of slice scans — but it models the fixed overhead
    * as slice-proportional, which overprices the delta arm for oversized
    * slices, so [[IncrementalExecutor.youngDataset]] additionally bounds
    * the detour to a dataset's first `factor` RUNS: "young" means born
    * recently, never a mature dataset whose latest slice happens to be
    * huge. The flip pays the one-time partials rebuild the
    * checkpoint-upgrade migration already implements. Sticky thereafter:
    * a present `agg_partials` state pins the merge path even if a later
    * oversized slice drops the ratio back under the threshold (a young
    * detour would leave the tiers stale). */
  val RecomputeYoungFactor: Long = 8L
  /** Band budget for the gap-split delta-key narrowing (`keyBands`): each
    * band adds one Or(And(GtEq,LtEq)) branch to every banded state-scan
    * predicate, so the budget caps predicate size while two bands already
    * cover the canonical zipf shape (one ancient hot key + the fresh
    * monotone slice band). */
  val MaxNarrowBands: Int = 8
  /** State name for the joined-stream window buffer in AsOfWindowed mode;
    * `__` keeps it clear of user query aliases. */
  val AsOfWindowBufferAlias: String = "__asof_window"
  /** Left-join delta path: offsets of left-input rows that have ever had a
    * right-side match (see [[IncrementalExecutor.runLeftDeltaJoin]]). */
  val leftMatchedName: String = "left_matched"

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

  import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
  import org.apache.spark.sql.catalyst.expressions.{And, EqualTo, Expression}
  import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan, SubqueryAlias}

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other     => Seq(other)
  }

  /** Equality conjuncts of every inner-join condition in an ANALYZED pass
    * plan, expressed as (position, inputColumn) pairs via attribute
    * lineage: `leafOut(j)` maps each position-j probe frame's output
    * exprIds to its input column names, and aliases in stateless
    * projections propagate provenance upward — so `e.num_shipped` in a
    * pre-step-derived join key resolves back to (shipmentsPos,
    * num_shipped). Only bare pass-through aliases propagate (a computed
    * key breaks lineage and simply yields no edge — no narrowing, never
    * wrong narrowing).
    */
  def extractEquiEdges(
      analyzed: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      leafOut: Seq[Map[org.apache.spark.sql.catalyst.expressions.ExprId, String]])
      : Seq[(Int, String, Int, String)] = {
    import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, EqualTo, ExprId}
    import org.apache.spark.sql.catalyst.plans.logical.{Join, Project}
    val prov = scala.collection.mutable.Map.empty[ExprId, (Int, String)]
    leafOut.zipWithIndex.foreach { case (m, j) =>
      m.foreach { case (id, n) => prov(id) = (j, n) }
    }
    analyzed.foreachUp {
      case p: Project =>
        p.projectList.foreach {
          case a @ Alias(ar: AttributeReference, _) =>
            prov.get(ar.exprId).foreach(v => prov(a.exprId) = v)
          case _ => ()
        }
      case _ => ()
    }
    analyzed.collect {
      // INNER only: range-narrowing a preserved side of an outer join
      // would drop legitimately-unmatched rows. Current callers only build
      // inner trees, but the guard keeps a future caller sound by default.
      case j: Join if j.joinType == org.apache.spark.sql.catalyst.plans.Inner =>
        j.condition.toSeq.flatMap(conjuncts)
    }.flatten.collect {
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if prov.contains(a.exprId) && prov.contains(b.exprId) &&
            prov(a.exprId)._1 != prov(b.exprId)._1 =>
        val (pa, ca) = prov(a.exprId)
        val (pb, cb) = prov(b.exprId)
        (pa, ca, pb, cb)
    }
  }

  /** Find `probeAlias.k = buildAlias.k2` (either order) in the parsed as-of
    * step's join conditions and filters → (probeKey, buildKey). Structural:
    * quoted aliases, literals that happen to contain `alias.`, and aliases
    * prefixing other identifiers cannot confuse it (unlike the round-1–3
    * text regex).
    */
  def findAsOfKeys(
      plan: LogicalPlan,
      spec: SqlRewriter.AsOfSpec
  ): Option[(String, String)] = {
    val found = scala.collection.mutable.ListBuffer.empty[(String, String)]
    def scan(cond: Expression): Unit = conjuncts(cond).foreach {
      case EqualTo(l: UnresolvedAttribute, r: UnresolvedAttribute)
          if l.nameParts.length == 2 && r.nameParts.length == 2 =>
        val (lq, ln) = (l.nameParts.head, l.nameParts.last)
        val (rq, rn) = (r.nameParts.head, r.nameParts.last)
        if (lq.equalsIgnoreCase(spec.probeAlias) && rq.equalsIgnoreCase(spec.buildAlias))
          found += ((ln, rn))
        else if (lq.equalsIgnoreCase(spec.buildAlias) && rq.equalsIgnoreCase(spec.probeAlias))
          found += ((rn, ln))
      case _ => ()
    }
    plan.foreach {
      case j: Join   => j.condition.foreach(scan)
      case f: Filter => scan(f.condition)
      case _         => ()
    }
    found.headOption
  }

  /** Rewrite the PARSED as-of step plan to read the materialized joined
    * view: the probe×build join collapses to `__asof_joined`, and
    * alias-qualified references remap structurally — `probe.x` → `x`,
    * `build.x` → `__build_x`. The ON key equality is subsumed by the as-of
    * join materialization itself (reference
    * EngineJoinStreamToTemporalTableTest.scala:75-85,322-331 — both
    * temporal syntaxes carry only the key equality there).
    */
  def rewriteAsOfPlan(plan: LogicalPlan, spec: SqlRewriter.AsOfSpec): LogicalPlan = {
    def mentions(p: LogicalPlan, name: String): Boolean = p.collectFirst {
      case r: UnresolvedRelation if r.multipartIdentifier.last.equalsIgnoreCase(name) => ()
      case s: SubqueryAlias if s.alias.equalsIgnoreCase(name) => ()
    }.isDefined
    val collapsed = plan.transformUp {
      case j: Join
          if (mentions(j.left, spec.probeTable) || mentions(j.left, spec.probeAlias)) &&
            (mentions(j.right, spec.buildTable) || mentions(j.right, spec.buildAlias)) =>
        UnresolvedRelation(Seq("__asof_joined"))
    }
    collapsed.transformAllExpressions {
      case a: UnresolvedAttribute
          if a.nameParts.length == 2 &&
            (a.nameParts.head.equalsIgnoreCase(spec.buildAlias) ||
              a.nameParts.head.equalsIgnoreCase(spec.buildTable)) =>
        UnresolvedAttribute(Seq("__build_" + a.nameParts.last))
      case a: UnresolvedAttribute
          if a.nameParts.length == 2 &&
            (a.nameParts.head.equalsIgnoreCase(spec.probeAlias) ||
              a.nameParts.head.equalsIgnoreCase(spec.probeTable)) =>
        UnresolvedAttribute(Seq(a.nameParts.last))
    }
  }
}
