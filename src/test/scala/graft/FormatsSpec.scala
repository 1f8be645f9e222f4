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
    // pin the young-dataset recompute detour off: short seeded chains here
    // must exercise the same engine paths their assertions were written for
    .config("spark.graft.recomputeYoungFactor", "0")
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

  // ── TIME_MILLIS / TIME_MICROS inputs (SURVEY §1.3; reference
  // ParquetSchemaConverterKamu.java:68-71,106-108 maps both to TimeType(3)).
  // Spark's own writer can't produce these annotations, so the fixtures are
  // written with parquet-mr's example API — the same physical layout an
  // external ODF producer would hand the engine.

  private def writeTimeFixture(path: String, withSystemCols: Boolean): Unit = {
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupWriteSupport}
    import org.apache.parquet.schema.MessageTypeParser
    val sys = if (withSystemCols)
      """required int64 offset;
        |required int32 op;
        |required int64 system_time (TIMESTAMP_MILLIS);
        |required int64 event_time (TIMESTAMP_MILLIS);""".stripMargin
    else ""
    val schema = MessageTypeParser.parseMessageType(
      s"""message m {
         |  $sys
         |  required int32 id;
         |  optional int32 t_ms (TIME_MILLIS);
         |  optional int64 t_us (TIME_MICROS);
         |}""".stripMargin)
    val conf = new org.apache.hadoop.conf.Configuration()
    GroupWriteSupport.setSchema(schema, conf)
    val w = ExampleParquetWriter.builder(new org.apache.hadoop.fs.Path(path))
      .withConf(conf).withType(schema).build()
    val f = new SimpleGroupFactory(schema)
    val epochMs = 946684800000L // 2000-01-01T00:00:00Z
    def row(off: Long, id: Int, ms: Int, us: Long) = {
      val g = f.newGroup()
      if (withSystemCols)
        g.append("offset", off).append("op", 0)
          .append("system_time", epochMs).append("event_time", epochMs + off)
      g.append("id", id).append("t_ms", ms).append("t_us", us)
    }
    // 12:34:00.000 and the last representable instant of the day
    w.write(row(0, 1, 45240000, 45240000000L))
    w.write(row(1, 2, 0, 86399999999L))
    w.close()
  }

  test("TIME_MILLIS/TIME_MICROS inputs surface as millis-of-day ints") {
    val dir = Files.createTempDirectory("graft-fmt")
    val in = s"$dir/time.parquet"
    writeTimeFixture(in, withSystemCols = false)
    val df = graft.engine.TimeAwareParquet.read(spark, Seq(in))
    assert(df.schema("t_ms").dataType.typeName == "integer")
    assert(df.schema("t_us").dataType.typeName == "integer")
    val m = df.collect().map(r => r.getInt(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(m(1) == ((45240000, 45240000)))   // micros ÷ 1000 == the same instant
    assert(m(2) == ((0, 86399999)))          // exact integer division, no rounding up
  }

  test("raw query round-trips a TIME column through filter and output") {
    val dir = Files.createTempDirectory("graft-fmt")
    val in = s"$dir/time.parquet"
    writeTimeFixture(in, withSystemCols = false)
    val resp = new RawQueryEngine(spark).executeRawQuery(RawQueryRequest(
      Vector(in),
      transform("""SELECT id, t_ms, t_us FROM input
                  |WHERE t_us >= 45240000 ORDER BY id""".stripMargin),
      s"$dir/out.parquet"))
    assert(resp == RawQueryResponse.Success(2))
    val out = spark.read.parquet(s"$dir/out.parquet").orderBy("id").collect()
    assert(out.map(_.getInt(2)).toSeq == Seq(45240000, 86399999))
  }

  test("transform engine round-trips TIME columns (map over millis ints)") {
    import graft.engine.TransformEngine
    val dir = Files.createTempDirectory("graft-fmt")
    val in = s"$dir/time.parquet"
    writeTimeFixture(in, withSystemCols = true)
    val req = TransformRequest(
      datasetId = "did:out", datasetAlias = "out",
      systemTime = java.time.Instant.parse("2000-01-02T00:00:00Z"),
      vocab = DatasetVocabulary(),
      transform = Transform(queries = Vector(SqlQueryStep(None,
        "SELECT event_time, id, t_ms, t_us, t_us - t_ms AS drift_ms FROM src"))),
      queryInputs = Vector(TransformRequestInput(
        datasetId = "did:src", datasetAlias = "src", queryAlias = "src",
        offsetInterval = Some(OffsetInterval(0, 1)),
        dataPaths = Vector(in), schemaFile = in)),
      nextOffset = 0,
      prevCheckpointPath = None,
      newCheckpointPath = s"$dir/cp",
      newDataPath = s"$dir/out.parquet")
    val resp = new TransformEngine(spark).executeTransform(req)
    assert(resp == TransformResponse.Success(Some(OffsetInterval(0, 1)), None))
    val out = spark.read.parquet(s"$dir/out.parquet").orderBy("id").collect()
    assert(out.map(r => r.getInt(r.fieldIndex("t_us"))).toSeq == Seq(45240000, 86399999))
    assert(out.map(r => r.getInt(r.fieldIndex("drift_ms"))).toSeq == Seq(0, 86399999))
  }

  test("transform engine flows struct and array-of-struct inputs end to end") {
    // §1.3 superset golden on the TRANSFORM path (not just raw query): the
    // reference's forked reader rejects nested records outright ("Record
    // types are not implemented yet", ParquetSchemaConverterKamu.java:
    // 256-259; README.md:77). Spark reads them natively, so a struct and
    // an array-of-struct input column must flow transform→output with the
    // nested schema preserved, nested-field access working in the query,
    // and untouched nested values byte-equal.
    import graft.engine.TransformEngine
    val dir = Files.createTempDirectory("graft-fmt")
    val in = s"$dir/nested.parquet"
    spark.sql(
      """SELECT * FROM VALUES
        |  (0L, 0, TIMESTAMP'2000-01-01 00:00:00', TIMESTAMP'2000-01-01 00:00:00',
        |   named_struct('city', 'berlin', 'zip', 10115),
        |   array(named_struct('sku', 'a', 'qty', 2), named_struct('sku', 'b', 'qty', 1))),
        |  (1L, 0, TIMESTAMP'2000-01-01 00:00:00', TIMESTAMP'2000-01-02 00:00:00',
        |   named_struct('city', 'tokyo', 'zip', 100),
        |   array(named_struct('sku', 'c', 'qty', 5)))
        |AS t(offset, op, system_time, event_time, addr, items)""".stripMargin)
      .write.parquet(in)
    val req = TransformRequest(
      datasetId = "did:out", datasetAlias = "out",
      systemTime = java.time.Instant.parse("2000-01-03T00:00:00Z"),
      vocab = DatasetVocabulary(),
      transform = Transform(queries = Vector(SqlQueryStep(None,
        """SELECT event_time, addr, items, addr.city AS city,
          |  aggregate(items, 0, (acc, it) -> acc + it.qty) AS total_qty
          |FROM src WHERE addr.zip > 50""".stripMargin))),
      queryInputs = Vector(TransformRequestInput(
        datasetId = "did:src", datasetAlias = "src", queryAlias = "src",
        offsetInterval = Some(OffsetInterval(0, 1)),
        dataPaths = Vector(in), schemaFile = in)),
      nextOffset = 0,
      prevCheckpointPath = None,
      newCheckpointPath = s"$dir/cp",
      newDataPath = s"$dir/out.parquet")
    val resp = new TransformEngine(spark).executeTransform(req)
    assert(resp == TransformResponse.Success(Some(OffsetInterval(0, 1)), None))
    val out = spark.read.parquet(s"$dir/out.parquet")
    // nested schema preserved exactly
    assert(out.schema("addr").dataType ==
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("city",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("zip",
          org.apache.spark.sql.types.IntegerType))))
    assert(out.schema("items").dataType.typeName == "array")
    assert(out.schema("items").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType]
      .elementType.typeName == "struct")
    val rows = out.orderBy("offset").collect()
    assert(rows.length == 2)
    val r0 = rows(0)
    assert(r0.getStruct(r0.fieldIndex("addr")).getAs[String]("city") == "berlin")
    assert(r0.getAs[String]("city") == "berlin")
    assert(r0.getAs[Int]("total_qty") == 3)
    val items1 = rows(1).getSeq[org.apache.spark.sql.Row](
      rows(1).fieldIndex("items"))
    assert(items1.map(i => (i.getAs[String]("sku"), i.getAs[Int]("qty"))) ==
      Seq(("c", 5)))
  }

  // ── TIMESTAMP_NTZ inputs. The reference has no NTZ notion: any parquet
  // Timestamp(isAdjustedToUTC=false) maps to its TIMESTAMP(3)-UTC contract
  // (ParquetSchemaConverterKamu.java:72-75). Spark infers NTZ for that
  // annotation, which would poison every watermark/window downstream
  // (withWatermark rejects NTZ), so the engine normalizes at input load.

  test("TIMESTAMP_NTZ (isAdjustedToUTC=false) inputs surface as UTC timestamps") {
    val dir = Files.createTempDirectory("graft-fmt")
    val in = s"$dir/ntz.parquet"
    spark.sql(
      """SELECT * FROM VALUES
        |  (1, TIMESTAMP_NTZ'2000-01-01 12:34:56.789'),
        |  (2, TIMESTAMP_NTZ'2000-01-02 00:00:00')
        |AS t(id, event_time)""".stripMargin)
      .write.parquet(in)
    // the fixture really carries the unadjusted annotation
    val conf = new org.apache.hadoop.conf.Configuration()
    val files = new java.io.File(in).listFiles().filter(_.getName.endsWith(".parquet"))
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(files.head.getAbsolutePath), conf))
    val raw = reader.getFooter.getFileMetaData.getSchema.toString
    reader.close()
    assert(raw.contains("TIMESTAMP(MICROS,false)"), s"fixture not NTZ:\n$raw")

    val df = graft.engine.TimeAwareParquet.read(spark, Seq(in))
    assert(df.schema("event_time").dataType.typeName == "timestamp")
    val m = df.collect().map(r => r.getInt(0) -> r.getTimestamp(1).toInstant).toMap
    // session TZ is UTC → cast is value-preserving wall-clock
    assert(m(1) == java.time.Instant.parse("2000-01-01T12:34:56.789Z"))
    assert(m(2) == java.time.Instant.parse("2000-01-02T00:00:00Z"))
  }

  test("transform engine accepts NTZ event time end-to-end (watermark path)") {
    import graft.engine.TransformEngine
    val dir = Files.createTempDirectory("graft-fmt")
    val in = s"$dir/ntz.parquet"
    spark.sql(
      """SELECT * FROM VALUES
        |  (CAST(0 AS BIGINT), 0, TIMESTAMP'2000-01-05 00:00:00',
        |   TIMESTAMP_NTZ'2000-01-01 06:00:00', 'a'),
        |  (CAST(1 AS BIGINT), 0, TIMESTAMP'2000-01-05 00:00:00',
        |   TIMESTAMP_NTZ'2000-01-02 06:00:00', 'b')
        |AS t(offset, op, system_time, event_time, v)""".stripMargin)
      .coalesce(1).write.parquet(in)
    val file = new java.io.File(in).listFiles()
      .filter(_.getName.endsWith(".parquet")).head.getAbsolutePath
    val req = TransformRequest(
      datasetId = "did:out", datasetAlias = "out",
      systemTime = java.time.Instant.parse("2000-01-06T00:00:00Z"),
      vocab = DatasetVocabulary(),
      transform = Transform(queries = Vector(SqlQueryStep(None,
        "SELECT event_time, upper(v) AS v FROM src"))),
      queryInputs = Vector(TransformRequestInput(
        datasetId = "did:src", datasetAlias = "src", queryAlias = "src",
        offsetInterval = Some(OffsetInterval(0, 1)),
        dataPaths = Vector(file), schemaFile = file,
        explicitWatermarks = Vector(RequestWatermark(
          java.time.Instant.parse("2000-01-06T00:00:00Z"),
          java.time.Instant.parse("2000-01-02T06:00:00Z"))))),
      nextOffset = 0,
      prevCheckpointPath = None,
      newCheckpointPath = s"$dir/cp",
      newDataPath = s"$dir/out.parquet")
    val resp = new TransformEngine(spark).executeTransform(req)
    assert(resp == TransformResponse.Success(
      Some(OffsetInterval(0, 1)),
      Some(java.time.Instant.parse("2000-01-02T06:00:00Z"))))
    val out = spark.read.parquet(s"$dir/out.parquet").orderBy("offset").collect()
    assert(out.map(_.getAs[String]("v")).toSeq == Seq("A", "B"))
    // event_time came in NTZ and leaves as the contract's UTC-adjusted millis
    val pr = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(s"$dir/out.parquet"),
        new org.apache.hadoop.conf.Configuration()))
    val outSchema = pr.getFooter.getFileMetaData.getSchema.toString
    pr.close()
    assert(outSchema.contains("int64 event_time (TIMESTAMP(MILLIS,true))"),
      s"unexpected output schema:\n$outSchema")
    assert(out.map(_.getTimestamp(out.head.fieldIndex("event_time")).toInstant).head ==
      java.time.Instant.parse("2000-01-01T06:00:00Z"))
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
