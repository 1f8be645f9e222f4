package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
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

  private val xd: Column => Column = _.cast("double")

  /** Per-vector quantization/norm statistics.
    * Pure per-row map over higher-order array functions — no UDFs, no
    * shuffle; linear over any corpus size.
    * @return (idCol, dim, l2_norm, scale, n_saturated, quant_err)
    */
  def quantStatsDf(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = col(vecCol)
    // staged so `maxabs`/`scale` evaluate once per row, not per lambda use
    df.select(col(idCol), v,
        array_max(transform(v, x => abs(xd(x)))).as("__maxabs"))
      .select(col(idCol), v, col("__maxabs"),
        when(col("__maxabs") === 0.0, lit(0.0))
          .otherwise(lit(127.0) / col("__maxabs")).as("__scale"))
      .select(
        col(idCol),
        size(v).cast("long").as("dim"),
        sqrt(DotProductExpr.dotProduct(v, v)).as("l2_norm"),
        col("__scale").as("scale"),
        size(filter(v, x =>
          abs(floor(xd(x) * col("__scale") + lit(0.5))) === 127L))
          .cast("long").as("n_saturated"),
        when(col("__maxabs") === 0.0, lit(0.0))
          .otherwise(aggregate(v, lit(0.0), (acc, x) => {
            val q = floor(xd(x) * col("__scale") + lit(0.5))
            val d = xd(x) - q / col("__scale")
            acc + d * d
          })).as("quant_err"))
  }
}
