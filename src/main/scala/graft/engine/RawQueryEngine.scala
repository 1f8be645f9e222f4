package graft.engine

import org.apache.spark.sql.{AnalysisException, SparkSession}

import graft.protocol._

/** The `executeRawQuery` engine: stateless batch SQL over input parquet
  * files → one output parquet file + record count (SURVEY.md §3.2;
  * reference RawQueryEngine.scala:56-113). Used by the coordinator for
  * ingest preprocessing. No watermarks, no offsets, no state.
  */
final class RawQueryEngine(spark: SparkSession) {

  graft.functions.CosineSimilarityExpr.register(spark)

  def executeRawQuery(req: RawQueryRequest): RawQueryResponse =
    try {
      if (req.transform.queries.isEmpty)
        return RawQueryResponse.InvalidQuery("transform has no queries")

      val input =
        if (req.inputDataPaths.nonEmpty)
          TimeAwareParquet.read(spark, req.inputDataPaths)
        else
          spark.emptyDataFrame
      input.createOrReplaceTempView("input")

      // Each step becomes a view; the unaliased (final) step is the output.
      // now() is pinned from the request when provided, so retried requests
      // are deterministic; otherwise one instant is pinned per request.
      val systemTime = req.systemTime.getOrElse(java.time.Instant.now())
      var result = input
      req.transform.queries.foreach { s =>
        val rw = SqlRewriter.rewrite(s.query, systemTime, None)
        result = spark.sql(rw.sql)
        s.alias.foreach(a => result.createOrReplaceTempView(a))
      }

      val n = ParquetSliceSink.writeSingleFile(result, req.outputDataPath)
      RawQueryResponse.Success(n)
    } catch {
      case e: AnalysisException =>
        RawQueryResponse.InvalidQuery(e.getMessage)
      case e: Throwable =>
        RawQueryResponse.InternalError(
          String.valueOf(e.getMessage),
          Some(e.getStackTrace.take(20).mkString("\n")))
    }
}
