package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding-column preprocessing for training-data pipelines: norms and
  * symmetric int8 quantization statistics (the standard precursor to
  * shipping vectors into an ANN index or a quantized store).
  *
  * Numeric design: every float is widened to double FIRST and all folds run
  * left-to-right in double — the same discipline as [[DotProductExpr]] —
  * so results replicate bit-for-bit in the DuckDB oracle (`CAST(embedding
  * AS DOUBLE[])` + `list_inner_product`/`list_transform`). Rounding is
  * expressed as `floor(x*scale + 0.5)` in BOTH engines rather than
  * `round()`, whose half-way convention differs between them.
  */
object Embeddings {

  /** Per-vector quantization/norm statistics.
    * One compiled kernel pass per vector (the higher-order-function form
    * runs interpreted per element and was ~10× slower); no shuffle, linear
    * over any corpus size. Folds accumulate in index order in double, so
    * the arithmetic is the oracle's exactly.
    *
    * Contract: `vecCol` must be `array<float>` — the same vector type the
    * rest of the embedding operators ([[DotProductExpr]], Similarity)
    * take. A double-typed column should be cast by the caller, who owns
    * the precision decision.
    * @return (idCol, dim, l2_norm, scale, n_saturated, quant_err)
    */
  def quantStatsDf(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val kernel = udf { (vIn: Array[Float]) =>
      val v = if (vIn == null) Array.empty[Float] else vIn
      var maxabs = 0.0
      var sq = 0.0
      var i = 0
      while (i < v.length) {
        val x = v(i).toDouble
        val a = math.abs(x)
        if (a > maxabs) maxabs = a
        sq += x * x
        i += 1
      }
      val scale = if (maxabs == 0.0) 0.0 else 127.0 / maxabs
      var nSat = 0L
      var qerr = 0.0
      if (maxabs != 0.0) {
        i = 0
        while (i < v.length) {
          val x = v(i).toDouble
          val q = math.floor(x * scale + 0.5)
          if (math.abs(q) == 127.0) nSat += 1
          val d = x - q / scale
          qerr += d * d
          i += 1
        }
      }
      (v.length.toLong, math.sqrt(sq), scale, nSat, qerr)
    }
    df.select(col(idCol), kernel(col(vecCol)).as("__s"))
      .select(
        col(idCol),
        col("__s._1").as("dim"),
        col("__s._2").as("l2_norm"),
        col("__s._3").as("scale"),
        col("__s._4").as("n_saturated"),
        col("__s._5").as("quant_err"))
  }
}
