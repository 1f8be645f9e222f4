package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
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
  * operators' scaling exponent.
  *
  * Since round 9 the TPC-H-ish tables scale too (the full-suite sf1 bench
  * point): every synthetic surrogate key (custkey, orderkey, partkey,
  * suppkey, event_id, user_id) is offset per replica by a stride above its
  * source max — consistently across fact and dimension uses, so joins
  * never pair rows across replicas and per-key fan-outs keep the source
  * scale's density, which is the shape a real `factor`× scale-up has.
  * `region`/`nation` and low-cardinality ATTRIBUTES (source, lang,
  * event_type, mktsegment, order dates…) are kept fixed — real corpora
  * grow rows per source/day, not sources/days.
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

    // TPC-H-ish tables: key-banded replicas. Strides are clean powers of
    // 10 above each key's max at the source scale (keys are dense 0..N-1),
    // shared between the key's defining table and every referencing fact.
    val ORDER = 1000000L; val CUST = 100000L; val PART = 100000L
    val SUPP = 10000L; val EVENT = 1000000L; val USER = 10000L
    def read(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")
    def shift(c: Int, stride: Long)(cols: String*)(df: DataFrame): DataFrame =
      cols.foldLeft(df)((d, k) => d.withColumn(k, col(k) + lit(c * stride)))
    /** Banding is only sound when every shifted key lives BELOW its
      * stride at the source scale — otherwise replica c's key range
      * overlaps replica c+1's and cross-replica joins silently change
      * per-key fan-out (e.g. native TPC-H sf1 lineitem keys, or
      * re-scaling an already-scaled dir). Fail loudly instead. */
    def requireStrides(t: String)(pairs: (String, Long)*): Unit = {
      val aggs = pairs.map { case (k, _) => max(col(k)).as(k) }
      val row = read(t).agg(aggs.head, aggs.tail: _*).head
      pairs.zipWithIndex.foreach { case ((k, stride), i) =>
        val m = row.getLong(i)
        require(m < stride,
          s"ScaleUp: $t.$k max $m >= stride $stride — banded replicas " +
            "would overlap; refusing to write a corrupt corpus")
      }
    }
    requireStrides("customer")("c_custkey" -> CUST)
    requireStrides("supplier")("s_suppkey" -> SUPP)
    requireStrides("part")("p_partkey" -> PART)
    requireStrides("orders")("o_orderkey" -> ORDER, "o_custkey" -> CUST)
    requireStrides("lineitem")(
      "l_orderkey" -> ORDER, "l_partkey" -> PART, "l_suppkey" -> SUPP)
    requireStrides("events")("event_id" -> EVENT, "user_id" -> USER)
    def banded(t: String)(f: (DataFrame, Int) => DataFrame): Unit =
      (0 until factor).map(c => f(read(t), c)).reduce(_.unionByName(_))
        .repartition(16)
        .write.mode(SaveMode.Overwrite).parquet(s"$dst/$t.parquet")

    spark.read.parquet(s"$src/region.parquet")
      .write.mode(SaveMode.Overwrite).parquet(s"$dst/region.parquet")
    spark.read.parquet(s"$src/nation.parquet")
      .write.mode(SaveMode.Overwrite).parquet(s"$dst/nation.parquet")
    banded("customer")((df, c) => shift(c, CUST)("c_custkey")(df))
    banded("supplier")((df, c) => shift(c, SUPP)("s_suppkey")(df))
    banded("part")((df, c) => shift(c, PART)("p_partkey")(df))
    banded("orders")((df, c) =>
      shift(c, CUST)("o_custkey")(shift(c, ORDER)("o_orderkey")(df)))
    banded("lineitem")((df, c) =>
      shift(c, SUPP)("l_suppkey")(shift(c, PART)("l_partkey")(
        shift(c, ORDER)("l_orderkey")(df))))
    banded("events")((df, c) =>
      shift(c, USER)("user_id")(shift(c, EVENT)("event_id")(df)))

    println(s"wrote ${factor}x of $src to $dst " +
      s"(${docs.count() * factor} docs, ${embs.count() * factor} embeddings)")
    spark.stop()
  }
}
