package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF (temporal/point-in-time) join — the reference's
  * `FOR SYSTEM_TIME AS OF` / `LATERAL TABLE(temporal_fn(t))` semantics
  * (see /root/reference/src/main/scala/dev/kamu/engine/flink/TransformEngine.scala:164-200
  * for the capability being reproduced; the implementation below is
  * Spark-native, not a port).
  *
  * For each probe row, attach the latest build row with the same key and
  * `buildTime <= probeTime`. Spark has no built-in as-of join, so we use the
  * classic union-merge formulation:
  *
  *   1. union probe and build rows, tagging the side;
  *   2. one shuffle: partition by key, order by (time, side) with the build
  *      side first at equal timestamps (inclusive as-of);
  *   3. `last(buildCol, ignoreNulls) over rowsBetween(unboundedPreceding, 0)`
  *      carries the most recent build values forward;
  *   4. keep only probe rows.
  *
  * Scale properties: a single hash shuffle on the join key (same cost as any
  * equi-join), no broadcast of the build side required, no N×M blowup — the
  * per-key merge is linear after the sort, and Spark's window exec spills.
  * Skewed keys behave like any skewed window (AQE-compatible partitioning
  * upstream; for pathological single-key skew use the range-join variant).
  */
object AsOfJoin {

  /** @param probe      probe-side rows (kept 1:1 in the output)
    * @param build      versioned build-side rows
    * @param keys       equi-join key column names (same names both sides)
    * @param probeTime  event-time column name on the probe side
    * @param buildTime  event-time column name on the build side
    * @param buildCols  build columns to attach, as (buildName -> outName)
    * @param buildSeq   optional build column ordering versions within one
    *                   event time (e.g. the changelog offset, so a
    *                   correct-to row supersedes its correct-from twin)
    */
  def leftAsOf(
      probe: DataFrame,
      build: DataFrame,
      keys: Seq[String],
      probeTime: String,
      buildTime: String,
      buildCols: Seq[(String, String)],
      buildSeq: Option[String] = None
  ): DataFrame = {
    val side = "__asof_side"
    val time = "__asof_time"
    val seq = "__asof_seq"
    val probeCols = probe.columns.toSeq

    val bundle = "__asof_bundle"

    // Versions are carried as ONE struct so a probe always sees a single
    // consistent build row — per-column last(ignoreNulls) could mix values
    // from different versions when a newer version holds nulls.
    val p = probe
      .withColumn(side, lit(1))
      .withColumn(time, col(probeTime))
      .withColumn(seq, lit(Long.MaxValue))
      .select((probeCols.map(col)
        :+ lit(null).cast(structType(build, buildCols)).as(bundle)
        :+ col(side) :+ col(time) :+ col(seq)): _*)

    // SQL equi-join semantics: NULL keys never match, so a NULL-key build
    // row must not become the carried version of a NULL-key probe (Spark's
    // window partitioning groups NULLs together, unlike join equality).
    val b = build
      .where(keys.map(col(_).isNotNull).reduce(_ && _))
      .withColumn(side, lit(0))
      .withColumn(time, col(buildTime))
      .withColumn(seq,
        buildSeq.map(c => col(c).cast("long")).getOrElse(lit(0L)))
      .select((probeCols.map {
        case k if keys.contains(k) => col(k)
        case other                 => lit(null).cast(probe.schema(other).dataType).as(other)
      } :+ struct(buildCols.map { case (in, out) => col(in).as(out) }: _*).as(bundle)
        :+ col(side) :+ col(time) :+ col(seq)): _*)

    // Build rows sort before probe rows at equal (key, time) → inclusive
    // as-of; within one build event time the seq column orders versions.
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(time).asc, col(side).asc, col(seq).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = p.unionByName(b)
      .withColumn(bundle, last(col(bundle), ignoreNulls = true).over(w))

    carried
      .where(col(side) === 1)
      .select((probeCols.map(col) ++ buildCols.map { case (_, out) =>
        col(s"$bundle.$out").as(out)
      }): _*)
  }

  private def structType(
      build: DataFrame,
      buildCols: Seq[(String, String)]
  ): org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(buildCols.map { case (in, out) =>
      org.apache.spark.sql.types.StructField(out, build.schema(in).dataType)
    })

  /** Inner as-of join: drop probe rows with no matching build version. */
  def innerAsOf(
      probe: DataFrame,
      build: DataFrame,
      keys: Seq[String],
      probeTime: String,
      buildTime: String,
      buildCols: Seq[(String, String)]
  ): DataFrame = {
    require(buildCols.nonEmpty, "innerAsOf needs at least one build column")
    val out = leftAsOf(probe, build, keys, probeTime, buildTime, buildCols)
    out.where(col(buildCols.head._2).isNotNull)
  }
}
