package graft.engine

import java.time.Instant

import org.apache.spark.sql.{AnalysisException, Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.protocol._

/** The `executeTransform` engine: deterministic incremental batch over
  * (new input slice ∪ restored parquet state), with an explicit watermark
  * ledger — the Spark-native realization of the reference's
  * stop-with-savepoint micro-batch model (SURVEY.md §7.2; reference
  * TransformEngine.scala:64-154).
  *
  * All relational work is plain `spark.sql` over temp views so Catalyst owns
  * pushdown/pruning/join strategy; the engine adds input buffering, emission
  * gating by a composable watermark algebra (SURVEY.md §7.4), as-of joins,
  * and Top-N changelog diffing via [[IncrementalExecutor]].
  */
final class TransformEngine(spark: SparkSession) {

  import TransformEngine._

  graft.functions.CosineSimilarityExpr.register(spark)

  def executeTransform(req: TransformRequest): TransformResponse =
    try {
      val store = new StateStore(spark, req.prevCheckpointPath, req.newCheckpointPath)
      val ledger = store.readLedger()

      // ── Load inputs ──────────────────────────────────────────────────
      val inputs = req.queryInputs.map { in =>
        // TIME_MILLIS/MICROS inputs surface as millis-of-day ints
        // (TimeAwareParquet); everything else is native inference.
        val fixed = TimeAwareParquet.readSchema(spark, in.schemaFile)
        val raw =
          if (in.dataPaths.nonEmpty)
            TimeAwareParquet.normalize(
              spark.read.schema(fixed.readSchema).parquet(in.dataPaths: _*),
              fixed)
          else emptyDf(spark, fixed.normalizedSchema)
        val sliced = in.offsetInterval match {
          case Some(OffsetInterval(s, e)) =>
            raw.where(col(in.vocab.offsetColumn).between(s, e))
          case None => raw.limit(0)
        }
        // ALL columns stay visible in the user view — offset, op,
        // system_time, event_time, data — matching the reference, which
        // registers the full table (reference TransformEngine.scala:232) and
        // relies on output validation to reject offset/system_time in
        // results. A duplicate of the offset survives as hidden `__seq`
        // (dropped from user views) — the as-of version store needs it to
        // order changelog rows within one event time (correct-to supersedes
        // correct-from) regardless of per-input vocabulary names.
        val visible = sliced
          .withColumn("__seq", col(in.vocab.offsetColumn))
        val prevWm = ledger.inputWatermarks.get(in.queryAlias)
        val explicitWm = in.explicitWatermarks.map(_.eventTime) ++ prevWm
        val wm = if (explicitWm.nonEmpty) Some(explicitWm.max) else None
        LoadedInput(in, visible, wm)
      }

      val minInputWm: Option[Instant] =
        if (inputs.nonEmpty && inputs.forall(_.watermark.isDefined))
          Some(inputs.flatMap(_.watermark).min)
        else None

      if (req.transform.queries.isEmpty)
        return TransformResponse.InvalidQuery("transform has no queries")
      val steps = req.transform.queries.map { s =>
        s.alias -> SqlRewriter.rewrite(s.query, req.systemTime, minInputWm)
      }

      val exec = new IncrementalExecutor(
        spark, store, ledger, inputs, steps, req.vocab,
        req.transform.temporalTables.map(t => t.name -> t.primaryKey).toMap,
        // opt-in Structured Streaming execution (PROTOCOL.md §3.4): same
        // request/response contract, byte-identical slices
        streamingMode = req.transform.engine.equalsIgnoreCase("spark-streaming"))
      try {
      val out = exec.run()

      // ── Validate output columns (reference TransformEngine.scala:269-308)
      val vocab = req.vocab
      val cols = out.emitted.columns.toSet
      if (!cols.contains(vocab.eventTimeColumn))
        return TransformResponse.InvalidQuery(
          s"output must contain event time column '${vocab.eventTimeColumn}'")
      if (cols.contains(vocab.offsetColumn) || cols.contains(vocab.systemTimeColumn))
        return TransformResponse.InvalidQuery(
          s"output must not contain engine-owned columns " +
            s"'${vocab.offsetColumn}'/'${vocab.systemTimeColumn}'")

      // ── Attach op / system_time / offset, write the slice ─────────────
      val withOp =
        if (cols.contains(vocab.operationTypeColumn)) out.emitted
        else out.emitted.withColumn(vocab.operationTypeColumn, lit(Op.Append))
      val withSys = withOp.withColumn(
        vocab.systemTimeColumn,
        lit(SqlRewriter.tsLiteral(req.systemTime)).cast(TimestampType))

      // __seq is internal provenance (input-order emission); never emitted.
      val userCols = out.emitted.columns
        .filter(c => c != vocab.operationTypeColumn && c != "__seq")
      val orderCols: Seq[Column] = out.emissionOrder.getOrElse(
        col(vocab.eventTimeColumn) +:
          userCols.filter(_ != vocab.eventTimeColumn).map(col).toSeq)
      // Distributed two-phase offset assignment — no single-partition
      // Window/Sort in the sink path (see OffsetAssigner).
      val (withOffset, pinned) =
        OffsetAssigner.assign(withSys, orderCols, vocab.offsetColumn, req.nextOffset)

      val ordered = withOffset.select(
        (Seq(vocab.offsetColumn, vocab.operationTypeColumn, vocab.systemTimeColumn)
          ++ userCols).map(col): _*)

      val n =
        try ParquetSliceSink.writeSingleFile(ordered, req.newDataPath)
        finally pinned.foreach(_.unpersist(blocking = false))

      val newWm = out.newWatermark.orElse(ledger.outputWatermark)
      store.writeLedger(Ledger(
        inputWatermarks =
          inputs.flatMap(i => i.watermark.map(i.spec.queryAlias -> _)).toMap,
        outputWatermark = newWm,
        emitThreshold = out.emitThreshold.orElse(ledger.emitThreshold),
        retractiveInputs = ledger.retractiveInputs ++ out.retractiveInputs,
        // cumulative offered rows + run count (offsetInterval arithmetic,
        // no job) — the history-size inputs to the young-dataset gate.
        // MERGED over the prior map: an alias absent from this run keeps
        // its cumulative count instead of restarting at 0 on reappearance
        // (round-9 ADVICE #2).
        bufferedRows = ledger.bufferedRows ++ inputs.map { i =>
          i.spec.queryAlias ->
            (ledger.bufferedRows.getOrElse(i.spec.queryAlias, 0L) +
              i.spec.offsetInterval.map(_.span).getOrElse(0L))
        }.toMap,
        stateRuns = ledger.stateRuns + 1,
        // sticky: buffers seen without counts ⇒ history unknowable forever
        historyUnknown = exec.historyUnknownNow))

      TransformResponse.Success(
        newOffsetInterval =
          if (n > 0) Some(OffsetInterval(req.nextOffset, req.nextOffset + n - 1))
          else None,
        newWatermark = newWm
      )
      // scratch dirs may back the emitted frame lazily — delete only after
      // the slice is on disk (and on every error path out of the run)
      } finally exec.cleanupScratch()
    } catch {
      case e: InvalidQueryException =>
        TransformResponse.InvalidQuery(e.getMessage)
      case e: AnalysisException =>
        TransformResponse.InvalidQuery(e.getMessage)
      case e: Throwable =>
        TransformResponse.InternalError(
          String.valueOf(e.getMessage),
          Some(e.getStackTrace.take(20).mkString("\n")))
    }
}

object TransformEngine {

  final case class LoadedInput(
      spec: TransformRequestInput,
      df: DataFrame,
      watermark: Option[Instant]
  )

  def emptyDf(spark: SparkSession, schema: StructType): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
}
