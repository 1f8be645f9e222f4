package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.storage.StorageLevel

/** Token-budget batching for training-data pipelines: assign documents, in
  * global id order, to consecutive batches by cumulative token count —
  * `batch_id = floor(exclusive_prefix_sum(n_tokens) / budget)`.
  *
  * The naive formulation is a window over a global ORDER BY — a
  * single-partition sequential scan, the canonical 100 TB scale-killer.
  * This operator is the two-phase distributed prefix sum instead:
  *
  *  1. range-repartition by id and sort within partitions (one shuffle, the
  *     same one any global ordering pays);
  *  2. pass A: one `mapPartitions` emitting each partition's token total —
  *     P scalars to the driver (thousands of values at 100 TB, not rows);
  *  3. pass B: one `mapPartitions` re-scanning the persisted partitions,
  *     adding the exclusive sum of all earlier partitions' totals to the
  *     local running sum.
  *
  * Every row is touched exactly twice, all heavy work stays distributed,
  * and partition count — not data size — bounds driver memory.
  */
object Pack {

  /** @return (idCol, "n_tokens", "batch_id"), one row per input row whose
    *         id is non-NULL (a NULL id has no position in the global order
    *         and is excluded; NULL token counts weigh 0), batch ids dense
    *         from 0 in ascending `idCol` order.
    */
  def tokenBatches(
      df: DataFrame,
      idCol: String,
      nTokensCol: String,
      budget: Long
  ): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val spark = df.sparkSession
    val parts = spark.sparkContext.defaultParallelism
    // NULL handling up front, where both passes see the same values: a NULL
    // token count weighs 0 (pass A's InternalRow.getLong would silently
    // read 0 while pass B's Row.getLong would throw); a NULL id has no
    // position in the global order and is excluded.
    // Materialize the (id, n_tokens) projection BEFORE the range exchange
    // (round 12): RangePartitioning samples its child to pick bounds, so a
    // lazily-computed input runs the caller's whole producer pipeline
    // (tokenize, at 8+ s of executor time in q30's profile) twice — once
    // for the sample, once for the real exchange. The cached projection is
    // two longs per row, so the barrier costs far less than the second
    // producer pass at any scale.
    val keyed = graft.core.Frames.materialize(df
      .select(col(idCol).cast("long").as("__id"),
        coalesce(col(nTokensCol).cast("long"), lit(0L)).as("n_tokens"))
      .where(col("__id").isNotNull))
    val sorted = keyed
      .repartitionByRange(parts, col("__id"))
      .sortWithinPartitions("__id")
      .persist(StorageLevel.MEMORY_AND_DISK)

    // pass A: per-partition totals (index → sum), tiny driver collect
    val totals: Map[Int, Long] = sorted
      .select(col("n_tokens"))
      .queryExecution.toRdd // InternalRow, no conversion cost
      .mapPartitionsWithIndex { (pid, it) =>
        var s = 0L
        while (it.hasNext) s += it.next().getLong(0)
        Iterator((pid, s))
      }
      .collect()
      .toMap
    // Pass A just filled `sorted`'s cache (the range exchange read `keyed`
    // through it) — `keyed` is dead weight from here on; drop it so library
    // callers outside Bench (which sweeps persistent RDDs between queries)
    // don't leak it for the session lifetime. `sorted` itself must stay
    // cached: the returned DataFrame is derived from it lazily, so its
    // lifecycle belongs to the caller (Bench's sweep, or an explicit
    // unpersist once the result is consumed).
    keyed.unpersist(blocking = false)
    val nParts = totals.keys.foldLeft(-1)(math.max) + 1
    val offsets = new Array[Long](math.max(nParts, 1))
    var acc = 0L
    for (p <- 0 until nParts) {
      offsets(p) = acc
      acc += totals.getOrElse(p, 0L)
    }
    val bOffsets = spark.sparkContext.broadcast(offsets)

    // pass B: local running sum + broadcast offset of earlier partitions.
    // rdd.mapPartitionsWithIndex, NOT TaskContext.getPartitionId(): the
    // index is the RDD partition id even when a downstream coalesce packs
    // several partitions into one task (where the task id would hand every
    // partition the first base).
    val outSchema = StructType(Seq(
      StructField("__id", LongType), StructField("n_tokens", LongType),
      StructField("batch_id", LongType)))
    val withBatches = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      var running = bOffsets.value(pid)
      it.map { r =>
        val id = r.getLong(0)
        val n = r.getLong(1)
        val batch = running / budget
        running += n
        Row(id, n, batch)
      }
    }
    spark.createDataFrame(withBatches, outSchema).withColumnRenamed("__id", idCol)
  }
}
