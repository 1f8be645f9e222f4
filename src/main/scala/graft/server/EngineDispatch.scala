package graft.server

import org.apache.spark.sql.SparkSession

import graft.engine.{RawQueryEngine, TransformEngine}
import graft.protocol._

/** Transport-independent request execution: the tar-checkpoint adaptation
  * and the exception→response-kind mapping shared by the YAML framed-TCP
  * transport and the gRPC transport. Mirrors the reference adapter's
  * contract (adapter/src/adapter.rs:78-125): engine failures surface as
  * InvalidQuery / InternalError response variants, never transport errors.
  */
object EngineDispatch {

  def transform(spark: SparkSession, req: TransformRequest): TransformResponse =
    try CheckpointTar.withTarCheckpoints(req)(new TransformEngine(spark).executeTransform)
    catch {
      case e: Throwable =>
        TransformResponse.InternalError(s"${e.getClass.getName}: ${e.getMessage}", None)
    }

  def rawQuery(spark: SparkSession, req: RawQueryRequest): RawQueryResponse =
    try new RawQueryEngine(spark).executeRawQuery(req)
    catch {
      case e: Throwable =>
        RawQueryResponse.InternalError(s"${e.getClass.getName}: ${e.getMessage}", None)
    }
}
