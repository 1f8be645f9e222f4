package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table loaders + deterministic-numeric helpers shared by all queries.
  *
  * Numeric determinism: the testdata money columns are 2-decimal doubles.
  * Double summation is order-dependent, so any `sum(double)` can differ in
  * the last ulp between Spark and the DuckDB oracle. We therefore aggregate
  * in exact integer "cents" (`round(x*100)` — never a tie because .5 can't
  * arise from a 2-decimal double) and divide once at the end; that final
  * bigint→double division is deterministic and identical in both engines.
  */
object Tables {

  /** Read one testdata table (parquet) from the given scale-factor dir.
    *
    * `events.parquet` stores `ts` as parquet TIMESTAMP(NANOS), which Spark's
    * TimestampType (micros) rejects. We read nanos as raw longs and floor-divide
    * to micros — exactly DuckDB's ns→µs truncation, so the oracle sees the
    * same values.
    */
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.fields.foldLeft(df) {
      case (acc, f) if f.name == "ts" && f.dataType == org.apache.spark.sql.types.LongType =>
        acc.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case (acc, _) => acc
    }
  }

  /** Exact integer cents from a 2-decimal double column. */
  def cents(c: Column): Column = round(c * 100).cast("long")

  /** Exact integer 1e-4 units from a ≤4-decimal double column. */
  def tenK(c: Column): Column = round(c * 10000).cast("long")
}
