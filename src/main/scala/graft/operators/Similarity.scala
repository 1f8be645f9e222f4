package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`).
  *
  * Baseline: brute-force cosine top-k — broadcast the (small) query set,
  * score the corpus in one codegen'd pass, per-query top-k via window.
  * Scale path: random-hyperplane LSH bucketing — corpus is bucketed once
  * (one shuffle), probes join only their bucket; at 100 TB the bucket join
  * replaces the full scan per query batch. All math in double precision with
  * a fixed left-to-right fold so results are bitwise-reproducible.
  */
object Similarity {

  /** Dot product of two float-array columns, folded left in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k: for each row of `queries`, the `k` nearest
    * rows of `corpus` (excluding self-matches by id).
    *
    * @return (query_id, rank, neighbor_id, cosine)
    */
  def bruteForceTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int
  ): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
    val scored = broadcast(q)
      .join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("__qv"), col("__cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
  }

  /** Random-hyperplane signature (`nBits` sign bits packed in a long).
    * Hyperplanes are pseudo-random but deterministic: component j of plane b
    * is a hash-derived value in [-1, 1).
    */
  def rhpSignature(vec: Column, dim: Int, nBits: Int): Column =
    (0 until nBits).map { b =>
      val proj = (0 until dim).map { j =>
        // deterministic pseudo-random weight in [-1,1)
        val w = ((scala.util.hashing.MurmurHash3.productHash((b, j)) & 0xffffff)
          / 8388608.0) - 1.0
        element_at(vec, j + 1).cast("double") * w
      }.reduce(_ + _)
      when(proj > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce((a, c) => a.bitwiseOR(c))

  /** LSH-bucketed approximate top-k: probes only score corpus vectors whose
    * hyperplane signature matches on at least one band of `bandBits` bits.
    */
  def lshTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      dim: Int,
      nBits: Int = 16,
      bandBits: Int = 4
  ): DataFrame = {
    require(nBits % bandBits == 0, "nBits must be divisible by bandBits")
    val bands = nBits / bandBits
    def withBands(df: DataFrame, id: String): DataFrame = {
      val sig = rhpSignature(col(vecCol), dim, nBits)
      val bandCols = array((0 until bands).map { b =>
        shiftright(sig, b * bandBits).bitwiseAND((1L << bandBits) - 1)
          .bitwiseOR(lit(b.toLong << 32)) // tag band index into the bucket id
      }: _*)
      df.select(col(idCol).as(id), col(vecCol).as(s"__v_$id"),
        explode(bandCols).as("__bucket"))
    }
    val qb = withBands(queries, "query_id")
    val cb = withBands(corpus, "neighbor_id")
    val scored = qb.join(cb, Seq("__bucket"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        col("__v_query_id").as("__qv"), col("__v_neighbor_id").as("__cv"))
      .distinct()
      .withColumn("cosine", cosine(col("__qv"), col("__cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
  }
}
