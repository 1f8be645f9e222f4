package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{ParquetSliceSink, RawQueryEngine}
import graft.protocol._

/** Decimal/format parity with the reference's EngineFormatsTest surface:
  * string→decimal TRY_CAST round-trips, precision handling, and the
  * TIMESTAMP_MILLIS physical output encoding (FIXTURES.md golden schema).
  */
class FormatsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def transform(q: String): Transform =
    Transform(queries = Vector(SqlQueryStep(None, q)))

  test("decimal: TRY_CAST round-trip string→decimal(13,4)→string") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-fmt")
    val in = s"$dir/in.parquet"
    spark.createDataset(Seq("123.4567", "-0.0001", "9999999.9999", "garbage"))
      .toDF("value").write.parquet(in)
    val resp = new RawQueryEngine(spark).executeRawQuery(RawQueryRequest(
      Vector(in),
      transform("""SELECT value as raw,
                  |  TRY_CAST(value AS DECIMAL(13,4)) as decimal_13_4,
                  |  CAST(TRY_CAST(value AS DECIMAL(13,4)) AS STRING) as roundtrip
                  |FROM input""".stripMargin),
      s"$dir/out.parquet"))
    assert(resp == RawQueryResponse.Success(4))
    val out = spark.read.parquet(s"$dir/out.parquet")
    assert(out.schema("decimal_13_4").dataType.typeName == "decimal(13,4)")
    val m = out.collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(m("123.4567") == "123.4567")
    assert(m("garbage") == null)
    assert(m("-0.0001") == "-0.0001")
  }

  test("decimal(38,18) high precision survives parquet round-trip") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-fmt")
    val in = s"$dir/in.parquet"
    spark.createDataset(Seq("1.000000000000000001", "123456789.987654321098765432"))
      .toDF("value").write.parquet(in)
    val resp = new RawQueryEngine(spark).executeRawQuery(RawQueryRequest(
      Vector(in),
      transform("SELECT TRY_CAST(value AS DECIMAL(38,18)) as decimal_38_18 FROM input"),
      s"$dir/out.parquet"))
    assert(resp == RawQueryResponse.Success(2))
    val vals = spark.read.parquet(s"$dir/out.parquet")
      .collect().map(_.getDecimal(0).toPlainString).sorted
    assert(vals.head == "1.000000000000000001")
  }

  test("output slice timestamps are physical int64 TIMESTAMP(MILLIS)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-fmt")
    val out = s"$dir/slice.parquet"
    val df = Seq(("2000-01-01 12:34:56.789", "A"))
      .toDF("ts", "v")
      .selectExpr("CAST(ts AS TIMESTAMP) as event_time", "v")
    ParquetSliceSink.writeSingleFile(df, out)
    // read the parquet footer directly for the physical type
    val conf = new org.apache.hadoop.conf.Configuration()
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(out), conf))
    val schema = reader.getFooter.getFileMetaData.getSchema
    reader.close()
    val s = schema.toString
    assert(s.contains("int64 event_time (TIMESTAMP(MILLIS,true))"),
      s"unexpected physical schema:\n$s")
  }

  test("date/array/map/struct columns round-trip through the slice pipeline") {
    // §1.3 superset: the reference's forked reader throws on nested structs
    // and primitive-element lists ("Record types are not implemented yet",
    // ParquetSchemaConverterKamu.java:256-259) — Spark handles all of these
    // natively, so the raw-query path must pass them through unharmed.
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-fmt")
    val in = s"$dir/in.parquet"
    spark.createDataset(Seq((1L, "2000-03-04")))
      .toDF("id", "d").write.parquet(in)
    val resp = new RawQueryEngine(spark).executeRawQuery(RawQueryRequest(
      Vector(in),
      transform("""SELECT id,
                  |  CAST(d AS DATE) as dt,
                  |  array(1, 2, 3) as xs,
                  |  map('a', 1, 'b', 2) as kv,
                  |  named_struct('x', id, 'y', d) as rec
                  |FROM input""".stripMargin),
      s"$dir/out.parquet"))
    assert(resp == RawQueryResponse.Success(1))
    val out = spark.read.parquet(s"$dir/out.parquet")
    assert(out.schema("dt").dataType.typeName == "date")
    assert(out.schema("xs").dataType.typeName == "array")
    assert(out.schema("kv").dataType.typeName == "map")
    assert(out.schema("rec").dataType.typeName == "struct")
    val r = out.collect()(0)
    assert(r.getDate(r.fieldIndex("dt")).toString == "2000-03-04")
    assert(r.getSeq[Int](r.fieldIndex("xs")) == Seq(1, 2, 3))
    assert(r.getMap[String, Int](r.fieldIndex("kv"))("b") == 2)
    assert(r.getStruct(r.fieldIndex("rec")).getLong(0) == 1L)
  }

  test("single-file sink writes exactly one parquet file at the target path") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-fmt")
    val out = s"$dir/one.parquet"
    val n = ParquetSliceSink.writeSingleFile(
      (1 to 1000).toDF("x").repartition(8), out)
    assert(n == 1000)
    assert(Files.isRegularFile(java.nio.file.Paths.get(out)))
  }
}
