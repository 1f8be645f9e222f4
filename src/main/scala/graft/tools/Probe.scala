package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc performance probe for operator stages (not part of the contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // warmup: shuffle + noop sink init
    time("warmup") {
      graft.core.Tables.t(spark, sfDir, "nation")
        .groupBy(org.apache.spark.sql.functions.col("n_regionkey")).count()
        .write.format("noop").mode("overwrite").save()
    }
    val run = if (names.nonEmpty) names.toSeq else graft.SparkEntry.queries.keys.toSeq.sorted
    run.foreach { n =>
      time(n) {
        graft.SparkEntry.queries(n)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      }
      time(s"$n (warm)") {
        graft.SparkEntry.queries(n)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
