package graft.engine

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.DataFrame

/** Writes one output slice as exactly ONE parquet file at the given path —
  * the reference's sink contract ("at most one new data file per request",
  * reference ParuqetSink.scala:21-99). Unlike the reference, nothing is
  * buffered on the driver: Spark streams the coalesced partition to disk.
  *
  * Timestamps are emitted as int64 TIMESTAMP(MILLIS) to match the reference's
  * golden output schemas (FIXTURES.md; reference EngineMapTest.scala:217-224).
  *
  * Scale note: an output *slice* is the bounded product of one micro-batch
  * transform, so a single file is part of the contract; all heavy computation
  * upstream of the final coalesce stays fully partitioned.
  */
object ParquetSliceSink {

  /** Returns the number of records written. */
  def writeSingleFile(df: DataFrame, path: String): Long = {
    val spark = df.sparkSession
    val prev = spark.conf.getOption("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MILLIS")
    val tmp = path + ".spark-tmp"
    try {
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = Files
        .list(Paths.get(tmp))
        .filter(p => p.getFileName.toString.startsWith("part-") &&
          p.getFileName.toString.endsWith(".parquet"))
        .findFirst()
        .orElseThrow(() => new IllegalStateException(s"no part file in $tmp"))
      Option(Paths.get(path).getParent).foreach(Files.createDirectories(_))
      Files.move(part, Paths.get(path), StandardCopyOption.REPLACE_EXISTING)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.parquet.outputTimestampType", v)
        case None    => spark.conf.unset("spark.sql.parquet.outputTimestampType")
      }
      // best-effort temp cleanup
      val t = Paths.get(tmp)
      if (Files.exists(t)) {
        Files.walk(t).sorted(java.util.Comparator.reverseOrder())
          .forEach(p => Files.deleteIfExists(p))
      }
    }
    // metadata-only count from the parquet footer
    df.sparkSession.read.parquet(path).count()
  }
}
