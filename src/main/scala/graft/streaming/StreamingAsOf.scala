package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.StructType

/** Streaming AS-OF join via `flatMapGroupsWithState` — the Structured
  * Streaming face of [[graft.operators.AsOfJoin]] with the engine's probe
  * hold-back semantics (reference
  * EngineJoinStreamToTemporalTableTest.scala:126-148): a probe row emits
  * only once the event-time watermark has passed its timestamp, joined
  * against the latest build version at-or-before it; until then it waits
  * in per-key state.
  *
  * Because the watermark of a union stream is the minimum across both
  * inputs, "watermark passed the probe" automatically means BOTH the probe
  * and build sides have sealed that point in time — late build versions can
  * no longer change the answer, which is exactly the hold-back rule the
  * batch engine enforces with its ledger.
  *
  * State per key: pending probes inside the watermark horizon + build
  * versions, compacted to the newest at-or-before the watermark plus
  * everything newer (the same compaction bound as the batch version store).
  * State expires via event-time timeout an hour past the last activity.
  * Rows later than the watermark are dropped by Spark's stateful-operator
  * late-row filter before reaching the join — `delay` is therefore the
  * allowed lateness, the same contract as the reference's bounded
  * out-of-orderness watermarks.
  */
object StreamingAsOf {

  /** Tagged union row: the event-time stays a REAL timestamp column (the
    * watermark must be definable on the FMGWS input — serializing it away
    * fails Spark's streaming checker); row payloads ride as bytes. `seq`
    * orders build versions within one event time (0 when no seq column is
    * supplied; probes always carry 0).
    */
  final case class Tagged(
      key: String, isBuild: Boolean, ts: Timestamp, seq: Long,
      payload: Array[Byte])

  /** Per-key state: (ts-millis, seq, serialized values) for build versions,
    * (ts-millis, serialized values) for pending probes. */
  final case class KeyState(
      versions: List[(Long, Long, Array[Byte])],
      pending: List[(Long, Array[Byte])])

  import Payload.{deser, ser}

  /** Left as-of join of two STREAMING frames.
    *
    * @param probe     streaming frame (kept 1:1 downstream once the
    *                  watermark passes; unmatched probes emit nulls)
    * @param build     streaming frame of versions
    * @param keyCol    equi-key column name, present on both sides
    * @param probeTime probe event-time column
    * @param buildTime build event-time column
    * @param buildCols build columns to attach, as (buildName -> outName)
    * @param delay     watermark delay applied to the tagged union stream
    * @param buildSeqCol optional build column ordering versions WITHIN one
    *                  event time (e.g. a changelog offset, so a correct-to
    *                  row supersedes its correct-from twin) — mirrors the
    *                  batch operator's `buildSeq`; without it, equal-ts
    *                  versions order by payload bytes (deterministic but
    *                  arbitrary)
    */
  def leftAsOf(
      spark: SparkSession,
      probe: DataFrame,
      build: DataFrame,
      keyCol: String,
      probeTime: String,
      buildTime: String,
      buildCols: Seq[(String, String)],
      delay: String = "0 seconds",
      buildSeqCol: Option[String] = None
  ): DataFrame = {
    val probeSchema = probe.schema
    val outSchema = StructType(probeSchema.fields ++ buildCols.map {
      case (b, out) => build.schema(b).copy(name = out)
    })
    val taggedEnc = Encoders.product[Tagged]

    // Watermark each branch SEPARATELY before the union: Spark's global
    // watermark is the min across watermark operators, which is what gives
    // the join its "both sides sealed" hold-back rule. One watermark on the
    // union would be max-of-all-rows and release probes the build side has
    // not caught up to.
    // canonical key serialization (not toString) — see
    // [[StreamingLeftJoin.leftJoin]]: SQL equality groups -0.0 with 0.0,
    // NaN with NaN, and byte arrays by content; toString diverges on all
    // three and would split one SQL key group into two state groups
    val probeTagged = probe.map { r =>
      Tagged(StreamingAggDiff.keyOf(Seq(r.getAs[Any](keyCol))),
        isBuild = false,
        r.getAs[Timestamp](probeTime), 0L, ser(r.toSeq))
    }(taggedEnc).withWatermark("ts", delay)
    val buildTagged = build.map { r =>
      Tagged(StreamingAggDiff.keyOf(Seq(r.getAs[Any](keyCol))),
        isBuild = true,
        r.getAs[Timestamp](buildTime),
        buildSeqCol.map(c => r.getAs[Number](c).longValue()).getOrElse(0L),
        ser(buildCols.map { case (b, _) => r.getAs[Any](b) }))
    }(taggedEnc).withWatermark("ts", delay)
    val unioned = probeTagged.union(buildTagged)

    val joined = unioned
      .groupByKey(_.key)(Encoders.STRING)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        func = (_: String, rows: Iterator[Tagged], state: GroupState[KeyState]) => {
          // A timeout is NOT cleanup here — it is the "watermark reached my
          // earliest pending probe" wake-up that releases held-back probes
          // for keys receiving no new data (no-data micro-batches only
          // invoke timed-out groups). Evaluation is identical either way.
          val prev = state.getOption.getOrElse(KeyState(Nil, Nil))
          var newVersions: List[(Long, Long, Array[Byte])] = Nil
          var pending = prev.pending
          if (!state.hasTimedOut) rows.foreach { t =>
            if (t.isBuild) newVersions ::= (t.ts.getTime, t.seq, t.payload)
            else pending ::= (t.ts.getTime, t.payload)
          }
          // Stable ascending (time, seq); newer versions win ties (a
          // changelog correct-to supersedes its correct-from twin — the
          // seq column carries the engine offset when supplied). Stored
          // state is already ascending with settled tie order — new
          // versions sort BEHIND it. WITHIN one micro-batch the group
          // iterator's order is shuffle-fetch-dependent, so (ts, seq)
          // ties are ordered by payload bytes: an arbitrary but
          // DETERMINISTIC rule — reruns and restarts pick the same winner.
          val batchOrdered = newVersions.reverse.sortBy(v =>
            (v._1, v._2, java.util.Base64.getEncoder.encodeToString(v._3)))
          val versions = (prev.versions ++ batchOrdered)
            .sortBy(v => (v._1, v._2))
          val wm = state.getCurrentWatermarkMs()

          val (ripe, waiting) = pending.partition(_._1 <= wm)
          val out = ripe.sortBy(_._1).iterator.map { case (ts, pv) =>
            val matched = versions.takeWhile(_._1 <= ts).lastOption
            val bv = matched.map(m => deser(m._3))
              .getOrElse(buildCols.map(_ => null: Any))
            Row.fromSeq(deser(pv) ++ bv)
          }.toVector

          // compact: newest version at-or-before wm + all newer
          val (sealedV, openV) = versions.partition(_._1 <= wm)
          val kept = sealedV.lastOption.toList ++ openV
          if (waiting.isEmpty && state.hasTimedOut) {
            // retention elapsed with nothing pending: drop the key
            state.remove()
          } else {
            state.update(KeyState(kept, waiting))
            // wake exactly when the wm passes the earliest pending probe
            // (each `waiting` ts is > wm, so this is legal); otherwise keep
            // versions around for `retention` to serve late probes
            val wake =
              if (waiting.nonEmpty) waiting.map(_._1).min
              else math.max(kept.map(_._1).maxOption.getOrElse(wm), wm)
            if (waiting.nonEmpty) state.setTimeoutTimestamp(wake)
            else state.setTimeoutTimestamp(wake, "1 hour")
          }
          out.iterator
        })(Encoders.product[KeyState], Encoders.row(outSchema))

    joined.toDF()
  }
}
