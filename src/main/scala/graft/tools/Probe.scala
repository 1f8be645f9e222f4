package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc performance probe for operator stages (not part of the contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
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

    import graft.functions.Text
    val d = graft.core.Tables.t(spark, sfDir, "documents").repartition(col("doc_id"))
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    time("warmup count")(d.count())
    time("ws only")(noop(d.select(Text.wsTokenCount(col("text")))))
    time("word only")(noop(d.select(Text.tokenCount(col("text")))))
    time("bpe only")(noop(d.select(Text.bpeTokenCount(col("text")))))
    time("all three")(noop(d.select(Text.wsTokenCount(col("text")),
      Text.tokenCount(col("text")), Text.bpeTokenCount(col("text")))))
    spark.stop()
  }
}
