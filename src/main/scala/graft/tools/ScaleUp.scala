package graft.tools

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Builds a `factor`× replica of a testdata scale-factor dir for scale-up
  * benchmarking (`sbt "runMain graft.tools.ScaleUp <src> <dst> [factor]"`).
  *
  * Replicas are deterministic mutations, not copies: ~1/3 of each
  * document's tokens are salted per replica (Jaccard vs the original ≈ 0.5,
  * below near-dup thresholds) and each embedding component is nudged by a
  * replica-indexed ±0.03 — so the scaled corpus behaves like independent
  * data of `factor`× the size rather than a pathological pile of exact
  * duplicates, which is the right shape for measuring the bucketed
  * operators' scaling exponent. Other tables are file-copied unchanged.
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("/tmp/graft-sf-x10")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(dst))

    val docs = spark.read.parquet(s"$src/documents.parquet")
    val docSpan = docs.agg(max("doc_id")).head.getLong(0) + 1
    (0 until factor).map { i =>
      docs.select(
        (col("doc_id") + lit(i * docSpan)).as("doc_id"),
        (if (i == 0) col("text")
         else array_join(expr(
           s"transform(split(text, ' '), (t, j) -> " +
             s"IF(pmod(j * 31 + $i, 3) = 0, concat(t, '_$i'), t))"), " "))
          .as("text"),
        col("lang"), col("source"))
    }.reduce(_.unionByName(_))
      .withColumn("n_chars", length(col("text")))
      .repartition(16)
      .write.mode(SaveMode.Overwrite).parquet(s"$dst/documents.parquet")

    val embs = spark.read.parquet(s"$src/embeddings.parquet")
    val embSpan = embs.agg(max("vec_id")).head.getLong(0) + 1
    (0 until factor).map { i =>
      embs.select(
        (col("vec_id") + lit(i * embSpan)).as("vec_id"),
        (if (i == 0) col("embedding")
         else expr(s"transform(embedding, (v, j) -> " +
           s"cast(v + (pmod(j * 31 + $i, 7) - 3) * 0.01 AS FLOAT))"))
          .as("embedding"),
        col("label"))
    }.reduce(_.unionByName(_))
      .repartition(8)
      .write.mode(SaveMode.Overwrite).parquet(s"$dst/embeddings.parquet")

    // remaining tables: file-copy so the bench warmup finds them
    val srcDir = new java.io.File(src)
    srcDir.listFiles.filter(f => f.getName.endsWith(".parquet") &&
      f.getName != "documents.parquet" && f.getName != "embeddings.parquet")
      .foreach { f =>
        Files.copy(f.toPath, Paths.get(dst, f.getName),
          StandardCopyOption.REPLACE_EXISTING)
      }
    println(s"wrote ${factor}x of $src to $dst " +
      s"(${docs.count() * factor} docs, ${embs.count() * factor} embeddings)")
    spark.stop()
  }
}
