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
    * The driver's `events.parquet` has carried `ts` under two encodings
    * across regenerations: parquet TIMESTAMP(NANOS) (read as raw longs via
    * `nanosAsLong`, floor-divided to micros — exactly DuckDB's ns→µs
    * truncation) and `Timestamp(isAdjustedToUTC=false, MICROS)` (inferred
    * as TIMESTAMP_NTZ). Both normalize to TimestampType: the session zone
    * is UTC, so the NTZ cast is value-preserving and the oracle sees the
    * same wall-clock values either way.
    */
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.fields.foldLeft(df) {
      case (acc, f) if f.name == "ts" && f.dataType == org.apache.spark.sql.types.LongType =>
        acc.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case (acc, f) if f.dataType == org.apache.spark.sql.types.TimestampNTZType =>
        acc.withColumn(f.name, col(f.name).cast(org.apache.spark.sql.types.TimestampType))
      case (acc, _) => acc
    }
  }

  /** Exact integer cents from a 2-decimal double column. */
  def cents(c: Column): Column = round(c * 100).cast("long")

  /** Exact integer 1e-4 units from a ≤4-decimal double column. */
  def tenK(c: Column): Column = round(c * 10000).cast("long")
}
