package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Deduplication operators for training-data pipelines: exact (hash
  * group-by), MinHash+LSH near-dup (shingle → minhash signature → banded
  * bucket join → exact-Jaccard verify), and SimHash.
  *
  * Scale design (the point of LSH): candidate generation is
  * O(docs × bands) with one shuffle on (band, bucket) — never the O(n²)
  * cross join. Signatures are computed with higher-order array functions
  * inside whole-stage codegen (no UDFs). Exact verification runs only on
  * bucket-colliding pairs. At 100 TB the bucket join partitions by bucket
  * hash and AQE handles skewed buckets (e.g. boilerplate-heavy shingles).
  */
object Dedup {

  /** Exact duplicate groups by content hash of `col`. */
  def exactGroups(df: DataFrame, c: Column): DataFrame =
    df.groupBy(md5(c).as("content_hash"))
      .agg(count(lit(1)).as("n_copies"))

  /** MinHash signature (array of `numHashes` longs) over a shingle array.
    * Hash family: xxhash64(shingle ⊕ seed-index) — deterministic, codegen'd.
    */
  def minhashSignature(sh: Column, numHashes: Int): Column =
    array((0 until numHashes).map { i =>
      array_min(transform(sh, s => xxhash64(concat_ws("", s, lit(i)))))
    }: _*)

  /** LSH band hashes from a minhash signature: `bands` buckets of `rows`
    * signature positions each.
    */
  def bandHashes(sig: Column, bands: Int, rows: Int): Column =
    array((0 until bands).map { b =>
      xxhash64(concat_ws(",",
        (0 until rows).map(r => sig.getItem(b * rows + r).cast("string")): _*))
    }: _*)

  /** Near-duplicate pairs by token-n-gram Jaccard ≥ `threshold`.
    *
    * Implementation: MinHash+LSH candidate generation, then exact Jaccard on
    * the candidates only. With bands×rows sized for the threshold the miss
    * probability is negligible (e.g. 16 bands × 3 rows: P(miss | j=0.8) ≈
    * 1e-5), so results match an exact O(n²) oracle while scaling linearly.
    *
    * @return (id_a, id_b, jaccard) with id_a < id_b
    */
  def nearDupPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      shingleLen: Int = 3,
      bands: Int = 16,
      rowsPerBand: Int = 3
  ): DataFrame = {
    val numHashes = bands * rowsPerBand
    val docs = df
      .select(
        col(idCol).as("__id"),
        array_distinct(Text.shingles(Text.tokens(col(textCol)), shingleLen))
          .as("__sh"))
      .withColumn("__sig", minhashSignature(col("__sh"), numHashes))
      .withColumn("__bands", bandHashes(col("__sig"), bands, rowsPerBand))

    val buckets = docs
      .select(col("__id"), posexplode(col("__bands")).as(Seq("__band", "__bucket")))

    // Bucket-collision candidates (one shuffle on (band, bucket)); dedup pairs.
    val candidates = buckets.alias("x")
      .join(buckets.alias("y"),
        col("x.__band") === col("y.__band") &&
          col("x.__bucket") === col("y.__bucket") &&
          col("x.__id") < col("y.__id"))
      .select(col("x.__id").as("id_a"), col("y.__id").as("id_b"))
      .distinct()

    val shA = docs.select(col("__id").as("id_a"), col("__sh").as("__sh_a"))
    val shB = docs.select(col("__id").as("id_b"), col("__sh").as("__sh_b"))
    candidates
      .join(shA, "id_a")
      .join(shB, "id_b")
      .withColumn("jaccard",
        size(array_intersect(col("__sh_a"), col("__sh_b"))).cast("double") /
          size(array_union(col("__sh_a"), col("__sh_b"))))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** 64-bit SimHash over token shingles: per bit, sum +1/−1 weighted by
    * whether the shingle's xxhash64 has that bit set; bit i of the result is
    * the sign. Computed per-row with higher-order functions — no shuffle.
    */
  def simhash64(textCol: Column, shingleLen: Int = 3): Column = {
    val hashes = transform(
      array_distinct(Text.shingles(Text.tokens(textCol), shingleLen)),
      s => xxhash64(s))
    // per bit position: (count of set) − (count of unset); bit is sign
    (0 until 64).map { b =>
      val bitSum = aggregate(hashes, lit(0L), (acc, h) =>
        acc + when(shiftright(h, b).bitwiseAND(1) === 1, 1L).otherwise(-1L))
      when(bitSum > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce((a, c) => a.bitwiseOR(c))
  }

  /** Hamming distance between two 64-bit simhashes. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
