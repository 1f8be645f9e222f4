package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** One-off timing probe for the connected-components loop. */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
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
      println(f"[cc] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val docs = graft.core.Tables.t(spark, sfDir, "documents")
    val pairs = graft.operators.Dedup.nearDupPairs(docs, "doc_id", "text", 0.8)
      .persist(StorageLevel.MEMORY_AND_DISK)
    time("pairs materialize")(pairs.count())

    val fwd = pairs.select(col("id_a").cast("long").as("src"), col("id_b").cast("long").as("dst"))
    val sym = fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var prevSum = time("initial sum")(labels.agg(sum("comp")).head.getLong(0))
    var round = 0
    var converged = false
    while (!converged && round < 25) {
      val jumped = time(s"round $round build") {
        val nbrMin = sym
          .join(labels.select(col("id").as("dst"), col("comp").as("__nc")), Seq("dst"))
          .groupBy(col("src").as("id"))
          .agg(min("__nc").as("__nbrComp"))
        val stepped = labels
          .join(nbrMin, Seq("id"), "left")
          .select(col("id"),
            least(col("comp"), coalesce(col("__nbrComp"), col("comp"))).as("comp"))
        stepped
          .join(
            stepped.select(col("id").as("comp"), col("comp").as("__cc")),
            Seq("comp"), "left")
          .select(col("id"),
            least(col("comp"), coalesce(col("__cc"), col("comp"))).as("comp"))
          .localCheckpoint(true)
      }
      val newSum = time(s"round $round sum")(jumped.agg(sum("comp")).head.getLong(0))
      labels.unpersist()
      labels = jumped
      converged = newSum == prevSum
      prevSum = newSum
      round += 1
    }
    println(s"[cc] converged after $round rounds")
    spark.stop()
  }
}
