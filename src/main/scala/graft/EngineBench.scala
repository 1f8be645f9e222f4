package graft

import java.time.Instant

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.TransformEngine
import graft.protocol._

/** Engine-lifetime benchmark: drives N consecutive `executeTransform`
  * invocations of a grouped aggregation over synthetic append slices and
  * reports the incremental-merge fast path against the full-recompute path
  * (a value-identical query shape the classifier cannot merge). The point
  * is the per-run GROWTH, not the absolute numbers: merge-path cost stays
  * flat as history accumulates, recompute grows with it.
  *
  * Usage: `sbt "runMain graft.EngineBench [nSlices] [rowsPerSlice]"`
  * (defaults 30 × 20k). Prints one JSON line.
  */
object EngineBench {
  def main(args: Array[String]): Unit = {
    val nSlices = args.lift(0).map(_.toInt).getOrElse(30)
    val rowsPer = args.lift(1).map(_.toInt).getOrElse(20000)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = java.nio.file.Files.createTempDirectory("graft-engine-bench").toString

    (1 to nSlices).foreach { s =>
      val off0 = (s - 1).toLong * rowsPer
      spark.range(rowsPer).select(
        (col("id") + off0).as("offset"),
        lit(0).as("op"),
        lit(java.sql.Timestamp.valueOf("2000-01-01 00:00:00")).as("system_time"),
        (lit(java.sql.Timestamp.valueOf("2000-01-01 00:00:00"))
          + expr(s"make_interval(0,0,0,0,0,0,$s)")).cast("timestamp").as("event_time"),
        concat(lit("k"), pmod(col("id") * 2654435761L + s, lit(5000))).as("symbol"),
        (pmod(col("id") * 31 + s, lit(1000)) + 1).cast("int").as("price"))
        .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$base/slices/s$s")
    }
    def fileOf(s: Int): String = {
      val d = new java.io.File(s"$base/slices/s$s")
      d.listFiles.filter(_.getName.endsWith(".parquet")).head.getPath
    }

    def drive(tag: String, q: String): Double = {
      val t0 = System.nanoTime()
      var prev: Option[String] = None
      (1 to nSlices).foreach { s =>
        val req = TransformRequest(
          "did:out", "out", Instant.parse(f"2000-01-02T${s % 24}%02d:00:00Z"),
          DatasetVocabulary(),
          Transform(queries = Vector(SqlQueryStep(None, q))),
          Vector(TransformRequestInput(
            datasetId = "did:t", datasetAlias = "tickers", queryAlias = "tickers",
            vocab = DatasetVocabulary(),
            offsetInterval = Some(OffsetInterval(
              (s - 1).toLong * rowsPer, s.toLong * rowsPer - 1)),
            dataPaths = Vector(fileOf(s)), schemaFile = fileOf(s),
            explicitWatermarks = Vector(RequestWatermark(
              Instant.parse("2000-01-01T00:00:00Z").plusSeconds(s),
              Instant.parse("2000-01-01T00:00:00Z").plusSeconds(s))))),
          nextOffset = 0, prevCheckpointPath = prev,
          newCheckpointPath = s"$base/$tag/cp$s",
          newDataPath = s"$base/$tag/out$s.parquet")
        new TransformEngine(spark).executeTransform(req) match {
          case _: TransformResponse.Success => ()
          case other                        => sys.error(s"$tag run $s failed: $other")
        }
        prev = Some(s"$base/$tag/cp$s")
      }
      (System.nanoTime() - t0) / 1e9
    }

    val qMerge = """SELECT max(event_time) as event_time, symbol,
                   |  count(*) as n, sum(price) as total
                   |FROM tickers GROUP BY symbol""".stripMargin
    // `+ 0` defeats AggMergeSpec extraction without changing a single value
    val qRecompute = qMerge.replace("sum(price) as total", "sum(price) + 0 as total")

    val tRecompute = drive("recompute", qRecompute)
    val tMerge = drive("merge", qMerge)
    println(f"""{"metric":"engine_lifetime","slices":$nSlices,"rowsPerSlice":$rowsPer,"merge_sec":$tMerge%.1f,"recompute_sec":$tRecompute%.1f,"speedup":${tRecompute / tMerge}%.2f}""")
    spark.stop()
  }
}
