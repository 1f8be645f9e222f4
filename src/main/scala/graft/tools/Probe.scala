package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc performance probe for operator stages (not part of the contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val e = graft.core.Tables.t(spark, sfDir, "events")
    time("warmup count")(e.count())
    time("q24 current")(
      graft.SparkEntry.queries("q24_json_extract")(spark, sfDir)
        .write.format("noop").mode("overwrite").save())
    time("q24 current again")(
      graft.SparkEntry.queries("q24_json_extract")(spark, sfDir)
        .write.format("noop").mode("overwrite").save())
    time("q24 from_json")(
      e.select(from_json(col("props"),
            org.apache.spark.sql.types.StructType.fromDDL("k BIGINT, missing STRING")).as("j"),
          col("event_type"))
        .groupBy(col("event_type"))
        .agg(sum(col("j.k")).as("sum_k"), count(col("j.missing")).as("n_missing"))
        .orderBy(col("event_type"))
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
