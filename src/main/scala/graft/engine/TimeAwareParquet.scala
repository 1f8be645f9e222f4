package graft.engine

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.{GroupType, LogicalTypeAnnotation, MessageType, PrimitiveType, Type, Types}
import org.apache.parquet.schema.LogicalTypeAnnotation.{TimeLogicalTypeAnnotation, TimeUnit}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.datasources.parquet.ParquetToSparkSchemaConverter
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Input support for parquet TIME_MILLIS / TIME_MICROS columns.
  *
  * The reference maps both annotations to Flink `TimeType(3)` — a
  * millisecond-precision time-of-day (reference
  * ParquetSchemaConverterKamu.java:68-71 for INT32 TIME_MILLIS/MICROS,
  * :106-108 for INT64 TIME_MICROS, precision clamp at :9-10). Spark 4.1's
  * parquet reader refuses both annotations outright
  * ([PARQUET_TYPE_ILLEGAL]), and `TimeType` has no parquet I/O yet, so the
  * Spark-native realization (SURVEY.md §1.3) is: read the physical
  * int32/int64, normalize micros → millis, and surface an `IntegerType`
  * column holding milliseconds-of-day. Exactly the value a `TimeType(3)`
  * carries, in a type every downstream operator and DuckDB oracle agrees
  * on.
  *
  * Mechanics: Spark only throws when it must *infer* a schema over a TIME
  * annotation; a user-supplied schema of the matching physical type reads
  * the pages fine. So we read the footer ourselves, strip the TIME
  * annotations, convert the stripped `MessageType` with Spark's own
  * `ParquetToSparkSchemaConverter`, and read with that explicit schema —
  * then rewrite micros columns with exact integer division (`DIV 1000`).
  *
  * TIME(NANOS) and TIME columns nested inside groups are rejected with a
  * clear error — the reference rejects both shapes too (nested records are
  * wholly unsupported there, ParquetSchemaConverterKamu.java:256-259).
  */
object TimeAwareParquet {

  /** A top-level TIME-annotated column and whether it is micros (int64). */
  final case class TimeCol(name: String, micros: Boolean)

  final case class FixedSchema(
      readSchema: StructType,
      timeCols: Seq[TimeCol],
      ntzCols: Seq[String] = Nil) {
    /** Schema of frames AFTER [[normalize]] (micros long → millis int;
      * TIMESTAMP_NTZ → TIMESTAMP).
      */
    def normalizedSchema: StructType = StructType(readSchema.map { f =>
      if (timeCols.exists(tc => tc.micros && tc.name == f.name))
        f.copy(dataType = IntegerType)
      else if (ntzCols.contains(f.name)) f.copy(dataType = TimestampType)
      else f
    })
  }

  /** Top-level TIMESTAMP_NTZ columns. The reference has no NTZ notion at
    * all — any parquet `Timestamp(isAdjustedToUTC=false)` maps to its
    * TIMESTAMP(3)-UTC contract (reference
    * ParquetSchemaConverterKamu.java:72-75), so the engine surfaces these
    * as `TimestampType`. The session zone is pinned to UTC everywhere, so
    * the cast is value-preserving (same wall-clock instant, bit-identical
    * micros).
    */
  private def ntzColumns(s: StructType): Seq[String] =
    s.fields.collect { case f if f.dataType == TimestampNTZType => f.name }.toSeq

  def footerSchema(file: String): MessageType = {
    val reader = ParquetFileReader.open(
      HadoopInputFile.fromPath(new Path(file), new Configuration()))
    try reader.getFooter.getFileMetaData.getSchema
    finally reader.close()
  }

  private def timeAnnotation(t: Type): Option[TimeLogicalTypeAnnotation] =
    t.getLogicalTypeAnnotation match {
      case a: TimeLogicalTypeAnnotation => Some(a)
      case _                            => None
    }

  def hasTimeColumns(msg: MessageType): Boolean = {
    def walk(t: Type): Boolean = t match {
      case g: GroupType => g.getFields.asScala.exists(walk)
      case p            => timeAnnotation(p).isDefined
    }
    msg.getFields.asScala.exists(walk)
  }

  /** Strip top-level TIME annotations and collect the affected columns. */
  def fixSchema(spark: SparkSession, msg: MessageType): FixedSchema = {
    val cols = Seq.newBuilder[TimeCol]
    val fields = msg.getFields.asScala.map {
      case p: PrimitiveType if timeAnnotation(p).isDefined =>
        val ann = timeAnnotation(p).get
        ann.getUnit match {
          case TimeUnit.MILLIS => cols += TimeCol(p.getName, micros = false)
          case TimeUnit.MICROS => cols += TimeCol(p.getName, micros = true)
          case other =>
            throw new UnsupportedOperationException(
              s"TIME($other) column '${p.getName}' is not supported " +
                "(reference supports TIME_MILLIS/TIME_MICROS only)")
        }
        val b = Types.primitive(p.getPrimitiveTypeName, p.getRepetition)
        (if (p.getId != null) b.id(p.getId.intValue) else b).named(p.getName)
      case g: GroupType =>
        def nested(t: Type): Boolean = t match {
          case gg: GroupType => gg.getFields.asScala.exists(nested)
          case pp            => timeAnnotation(pp).isDefined
        }
        if (nested(g))
          throw new UnsupportedOperationException(
            s"TIME column nested inside group '${g.getName}' is not " +
              "supported (reference rejects nested records entirely, " +
              "ParquetSchemaConverterKamu.java:256-259)")
        g
      case other => other
    }
    val stripped = new MessageType(msg.getName, fields.toSeq.asJava)
    val converter = new ParquetToSparkSchemaConverter(spark.sessionState.conf)
    val converted = converter.convert(stripped)
    FixedSchema(converted, cols.result(), ntzColumns(converted))
  }

  /** Rewrite micros columns to exact millis-of-day ints and NTZ timestamps
    * to UTC instants, in place.
    */
  def normalize(df: DataFrame, fixed: FixedSchema): DataFrame = {
    val t = fixed.timeCols.filter(_.micros).foldLeft(df) { (d, tc) =>
      d.withColumn(tc.name, expr(s"CAST(`${tc.name}` DIV 1000 AS INT)"))
    }
    fixed.ntzCols.foldLeft(t) { (d, c) =>
      d.withColumn(c, col(c).cast(TimestampType))
    }
  }

  /** Schema of `schemaFile` as the engine will surface it, with the fix-up
    * applied only when inference actually fails on a TIME annotation — the
    * common no-TIME path stays on Spark's native inference.
    */
  def readSchema(spark: SparkSession, schemaFile: String): FixedSchema =
    try {
      val s = spark.read.parquet(schemaFile).schema
      FixedSchema(s, Nil, ntzColumns(s))
    } catch {
      case e: Throwable if isTimeIllegal(e) => fixSchema(spark, footerSchema(schemaFile))
    }

  /** `spark.read.parquet` that survives TIME-annotated and NTZ inputs. */
  def read(spark: SparkSession, paths: Seq[String]): DataFrame = {
    val fixed = readSchema(spark, paths.head)
    if (fixed.timeCols.isEmpty && fixed.ntzCols.isEmpty) spark.read.parquet(paths: _*)
    else normalize(spark.read.schema(fixed.readSchema).parquet(paths: _*), fixed)
  }

  private def isTimeIllegal(e: Throwable): Boolean = {
    var t = e
    var depth = 0
    while (t != null && depth < 10) {
      val m = t.getMessage
      if (m != null && m.contains("PARQUET_TYPE_ILLEGAL") && m.contains("TIME(")) return true
      t = if (t.getCause eq t) null else t.getCause
      depth += 1
    }
    false
  }
}
