package graft.engine

import org.apache.spark.sql.{Column, DataFrame, GraftPlanExec}
import org.apache.spark.sql.catalyst.expressions.{JoinedRow, SpecificInternalRow, UnsafeProjection}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField}
import org.apache.spark.storage.StorageLevel

/** Assigns the engine's consecutive output offsets (reference
  * OffsetOperator.scala:15-42 — offsets follow `nextOffset` in emission
  * order) WITHOUT the single-partition global sort that
  * `row_number().over(Window.orderBy(...))` implies.
  *
  * The naive window formulation funnels every output row of every transform
  * through one task — invisible at test scale, THE scale-killer for a map
  * transform over a 100 TB slice. This is the same two-phase distributed
  * prefix sum as [[graft.operators.Pack.tokenBatches]]:
  *
  *  1. range-repartition by the emission order and sort within partitions —
  *     the one shuffle any global ordering pays, but parallel;
  *  2. pass A: per-partition row counts grouped by `spark_partition_id()` —
  *     P scalars to the driver, never rows. A Dataset action, so query
  *     listeners (Snitch) observe the step metrics here and the persisted
  *     plan materializes while task ids still equal partition ids;
  *  3. pass B: re-scan the persisted partitions via
  *     `queryExecution.toRdd.mapPartitionsWithIndex` — InternalRow in,
  *     UnsafeProjection out, so rows never round-trip through external
  *     `Row` objects — adding the exclusive prefix of earlier partitions'
  *     counts to a local running counter. The index parameter is
  *     the RDD partition id even when a downstream `coalesce(1)` (the
  *     single-file sink) packs every partition into one task —
  *     `TaskContext.getPartitionId()` would collapse to 0 there and hand
  *     every partition the first base.
  *
  * Partition order is preserved downstream (the narrow pass-B map and the
  * sink's coalesce concatenate partitions in index order), so the written
  * slice is globally ordered exactly as the window formulation produced —
  * byte-identical offsets, parallel plan.
  */
object OffsetAssigner {

  /** @return the input rows with `offsetName` appended as a Long column
    *         counting consecutively from `start` in global `orderCols`
    *         order, plus the persisted intermediates to `unpersist()` once
    *         the result is consumed.
    */
  def assign(
      df: DataFrame,
      orderCols: Seq[Column],
      offsetName: String,
      start: Long
  ): (DataFrame, Seq[DataFrame]) = {
    val spark = df.sparkSession
    val parts = math.max(spark.sparkContext.defaultParallelism, 1)
    // The range exchange SAMPLES its child to pick boundaries — a second
    // scan that re-runs any CollectMetrics (Snitch) node in the transform
    // and double-reports every step count. Persisting the pre-shuffle frame
    // materializes the transform (and its observations) exactly once; both
    // the sampling scan and the shuffle scan then read the cache.
    val pre = df.persist(StorageLevel.MEMORY_AND_DISK)
    val sorted = pre
      .repartitionByRange(parts, orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
      .persist(StorageLevel.MEMORY_AND_DISK)

    // pass A: per-partition counts (partition id → n), tiny driver collect.
    // Size the base array from the RDD's REAL partition count, not the max
    // observed id: empty partitions report no count row, but pass B's
    // closure still evaluates bases(pid) for them.
    val rdd = sorted.queryExecution.toRdd
    val counts: Map[Int, Long] = sorted
      .groupBy(spark_partition_id().as("__pid")).count()
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1))
      .toMap
    val nParts = rdd.getNumPartitions
    val bases = new Array[Long](math.max(nParts, 1))
    var acc = start
    for (p <- 0 until nParts) {
      bases(p) = acc
      acc += counts.getOrElse(p, 0L)
    }
    val bBases = spark.sparkContext.broadcast(bases)

    // pass B: local row index + broadcast base of earlier partitions, all
    // in Tungsten representation — JoinedRow(input, offset) through one
    // UnsafeProjection per partition, no external-Row materialization. The
    // projection's buffer row is reused per partition; downstream consumers
    // (projection + single-file parquet sink) are narrow and row-at-a-time.
    val outSchema = sorted.schema.add(StructField(offsetName, LongType, nullable = false))
    val withOffsets = rdd.mapPartitionsWithIndex { (pid, it) =>
      val proj = UnsafeProjection.create(outSchema)
      val extra = new SpecificInternalRow(Seq(LongType))
      val joined = new JoinedRow
      var off = bBases.value(pid)
      it.map { r =>
        extra.setLong(0, off)
        off += 1
        proj(joined(r, extra)): org.apache.spark.sql.catalyst.InternalRow
      }
    }
    (GraftPlanExec.ofInternalRows(spark, withOffsets, outSchema), Seq(pre, sorted))
  }
}
