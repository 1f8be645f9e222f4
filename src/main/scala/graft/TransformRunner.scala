package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.engine.{RawQueryEngine, TransformEngine}
import graft.protocol._

/** Protocol entry point: reads a request YAML, executes, writes a response
  * YAML — the engine-side shape of the reference's in-out contract
  * (reference TransformApp.scala:22-91 / RawQueryApp.scala:22-83; the
  * gRPC/flatbuffer adapter is transport and out of scope).
  *
  * Usage:
  *   graft.TransformRunner transform <request.yaml> <response.yaml>
  *   graft.TransformRunner rawquery  <request.yaml> <response.yaml>
  */
object TransformRunner {

  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: TransformRunner <transform|rawquery> <request.yaml> <response.yaml>")
    val Array(kind, reqPath, respPath) = args

    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-engine")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    try {
      val yamlText = Files.readString(Paths.get(reqPath))
      val responseYaml = kind match {
        case "transform" =>
          val req = RequestCodec.parseTransformRequest(yamlText)
          RequestCodec.renderTransformResponse(
            CheckpointTar.withTarCheckpoints(req)(
              new TransformEngine(spark).executeTransform))
        case "rawquery" =>
          val req = RequestCodec.parseRawQueryRequest(yamlText)
          RequestCodec.renderRawQueryResponse(
            new RawQueryEngine(spark).executeRawQuery(req))
        case other =>
          sys.error(s"unknown mode '$other' (expected transform|rawquery)")
      }
      Files.writeString(Paths.get(respPath), responseYaml)
      println(s"[graft] wrote $respPath")
    } finally spark.stop()
  }
}
