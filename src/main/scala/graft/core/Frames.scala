package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Shared DataFrame lifecycle helpers. */
object Frames {

  /** Persist a multi-consumer frame and materialize it EAGERLY.
    *
    * A lazily persisted frame whose first action is a plan that references
    * it several times (a self-join, or two aggregates joined back) is
    * computed CONCURRENTLY by each consuming shuffle-map stage: the block
    * manager deduplicates a cached partition only once some task has
    * finished writing it, so the expensive producer pipeline runs 2–4×
    * before the cache exists (measured: the minhash/shingle kernel stage
    * appeared twice with identical input/shuffle-write bytes in q9/q27/q31,
    * and three times in q47 — see OPTIMIZATION_r12.md). One count() action
    * materializes the cache exactly once; every consumer then reads
    * InMemoryTableScan hits. The count itself IS the single producer pass,
    * so total work drops by (consumers−1) producer passes.
    */
  def materialize(df: DataFrame): DataFrame = {
    df.persist(StorageLevel.MEMORY_AND_DISK)
    df.count()
    df
  }
}
