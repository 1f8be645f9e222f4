package graft.protocol

import java.nio.{ByteBuffer, ByteOrder}
import java.time.Instant

import com.google.flatbuffers.FlatBufferBuilder

/** Hand-written FlatBuffers codec for the four engine-protocol messages.
  *
  * The reference's gRPC payloads are FlatBuffers (reference
  * adapter/src/grpc.rs:44-63, `FlatbuffersEngineProtocol`); the generated
  * schema lives in a Cargo-only dependency, so the layout here is pinned by
  * this repo's `engine.fbs` instead (field-slot ids in its comments; see
  * PROTOCOL.md §6 for the divergence note). Writers use the public
  * `FlatBufferBuilder` low-level API — the same calls flatc-generated Java
  * emits — and readers are a minimal vtable walker, so each side
  * independently exercises the wire format and the round-trip specs
  * cross-check them.
  *
  * Layout conventions (engine.fbs): instants = int64 unix millis
  * (TIMESTAMP_MILLIS is the engine-wide time precision, SURVEY §1.3);
  * optional values = vtable absence, with optional scalars wrapped in the
  * single-field `TimestampMillis` table; `OffsetInterval` = 16-byte inline
  * struct.
  */
object EngineFlatbuffers {

  // ── union type tags (engine.fbs: 0 = NONE) ─────────────────────────────
  private val ResultSuccess = 1
  private val ResultInvalidQuery = 2
  private val ResultInternalError = 3

  // ═════════════════════════════════════════════════════════════ writers ═

  private def str(b: FlatBufferBuilder, s: String): Int = b.createString(s)
  private def strOpt(b: FlatBufferBuilder, s: Option[String]): Int =
    s.map(b.createString(_: CharSequence)).getOrElse(0)
  private def strVec(b: FlatBufferBuilder, ss: Seq[String]): Int =
    b.createVectorOfTables(ss.map(s => b.createString(s: CharSequence)).toArray)

  /** engine.fbs `OffsetInterval` struct: inline, end then start (builder
    * writes backwards; field order in memory is start, end).
    */
  private def interval(b: FlatBufferBuilder, oi: OffsetInterval): Int = {
    b.prep(8, 16)
    b.putLong(oi.end)
    b.putLong(oi.start)
    b.offset()
  }

  private def timestampMillis(b: FlatBufferBuilder, t: Instant): Int = {
    b.startTable(1)
    b.addLong(0, t.toEpochMilli, 0L)
    b.endTable()
  }

  private def vocabulary(b: FlatBufferBuilder, v: DatasetVocabulary): Int = {
    val Array(o0, o1, o2, o3) = Array(
      str(b, v.offsetColumn), str(b, v.operationTypeColumn),
      str(b, v.systemTimeColumn), str(b, v.eventTimeColumn))
    b.startTable(4)
    b.addOffset(0, o0, 0); b.addOffset(1, o1, 0)
    b.addOffset(2, o2, 0); b.addOffset(3, o3, 0)
    b.endTable()
  }

  private def watermark(b: FlatBufferBuilder, w: RequestWatermark): Int = {
    b.startTable(2)
    b.addLong(0, w.systemTime.toEpochMilli, 0L)
    b.addLong(1, w.eventTime.toEpochMilli, 0L)
    b.endTable()
  }

  private def sqlStep(b: FlatBufferBuilder, s: SqlQueryStep): Int = {
    val a = strOpt(b, s.alias)
    val q = str(b, s.query)
    b.startTable(2)
    if (a != 0) b.addOffset(0, a, 0)
    b.addOffset(1, q, 0)
    b.endTable()
  }

  private def temporalTable(b: FlatBufferBuilder, t: TemporalTable): Int = {
    val n = str(b, t.name)
    val pk = strVec(b, t.primaryKey)
    b.startTable(2)
    b.addOffset(0, n, 0); b.addOffset(1, pk, 0)
    b.endTable()
  }

  private def transform(b: FlatBufferBuilder, t: Transform): Int = {
    val kind = str(b, t.kind)
    val engine = str(b, t.engine)
    val version = strOpt(b, t.version)
    val queries = b.createVectorOfTables(t.queries.map(sqlStep(b, _)).toArray)
    val temporals =
      if (t.temporalTables.isEmpty) 0
      else b.createVectorOfTables(t.temporalTables.map(temporalTable(b, _)).toArray)
    b.startTable(5)
    b.addOffset(0, kind, 0); b.addOffset(1, engine, 0)
    if (version != 0) b.addOffset(2, version, 0)
    b.addOffset(3, queries, 0)
    if (temporals != 0) b.addOffset(4, temporals, 0)
    b.endTable()
  }

  private def transformInput(b: FlatBufferBuilder, in: TransformRequestInput): Int = {
    val did = str(b, in.datasetId)
    val alias = str(b, in.datasetAlias)
    val qAlias = str(b, in.queryAlias)
    val vocab = vocabulary(b, in.vocab)
    val paths = strVec(b, in.dataPaths)
    val schema = str(b, in.schemaFile)
    val wms =
      if (in.explicitWatermarks.isEmpty) 0
      else b.createVectorOfTables(in.explicitWatermarks.map(watermark(b, _)).toArray)
    b.startTable(8)
    b.addOffset(0, did, 0); b.addOffset(1, alias, 0); b.addOffset(2, qAlias, 0)
    b.addOffset(3, vocab, 0)
    in.offsetInterval.foreach(oi => b.addStruct(4, interval(b, oi), 0))
    b.addOffset(5, paths, 0); b.addOffset(6, schema, 0)
    if (wms != 0) b.addOffset(7, wms, 0)
    b.endTable()
  }

  def writeTransformRequest(req: TransformRequest): Array[Byte] = {
    val b = new FlatBufferBuilder(1024)
    val did = str(b, req.datasetId)
    val alias = str(b, req.datasetAlias)
    val vocab = vocabulary(b, req.vocab)
    val tf = transform(b, req.transform)
    val inputs = b.createVectorOfTables(req.queryInputs.map(transformInput(b, _)).toArray)
    val prev = strOpt(b, req.prevCheckpointPath)
    val newCp = str(b, req.newCheckpointPath)
    val newData = str(b, req.newDataPath)
    b.startTable(10)
    b.addOffset(0, did, 0); b.addOffset(1, alias, 0)
    b.addLong(2, req.systemTime.toEpochMilli, 0L)
    b.addOffset(3, vocab, 0); b.addOffset(4, tf, 0); b.addOffset(5, inputs, 0)
    b.addLong(6, req.nextOffset, 0L)
    if (prev != 0) b.addOffset(7, prev, 0)
    b.addOffset(8, newCp, 0); b.addOffset(9, newData, 0)
    b.finish(b.endTable())
    b.sizedByteArray()
  }

  def writeRawQueryRequest(req: RawQueryRequest): Array[Byte] = {
    val b = new FlatBufferBuilder(512)
    val paths = strVec(b, req.inputDataPaths)
    val tf = transform(b, req.transform)
    val out = str(b, req.outputDataPath)
    val st = req.systemTime.map(timestampMillis(b, _)).getOrElse(0)
    b.startTable(4)
    b.addOffset(0, paths, 0); b.addOffset(1, tf, 0); b.addOffset(2, out, 0)
    if (st != 0) b.addOffset(3, st, 0)
    b.finish(b.endTable())
    b.sizedByteArray()
  }

  /** Shared shape of the two response tables: `result` union in slots 0
    * (type) + 1 (value).
    */
  private def finishResult(b: FlatBufferBuilder, tag: Int, value: Int): Array[Byte] = {
    b.startTable(2)
    b.addByte(0, tag.toByte, 0)
    b.addOffset(1, value, 0)
    b.finish(b.endTable())
    b.sizedByteArray()
  }

  private def invalidQuery(b: FlatBufferBuilder, message: String): Int = {
    val m = str(b, message)
    b.startTable(1); b.addOffset(0, m, 0); b.endTable()
  }

  private def internalError(b: FlatBufferBuilder, message: String, backtrace: Option[String]): Int = {
    val m = str(b, message)
    val bt = strOpt(b, backtrace)
    b.startTable(2)
    b.addOffset(0, m, 0)
    if (bt != 0) b.addOffset(1, bt, 0)
    b.endTable()
  }

  def writeTransformResponse(resp: TransformResponse): Array[Byte] = {
    val b = new FlatBufferBuilder(256)
    resp match {
      case TransformResponse.Success(oi, wm) =>
        val wmOff = wm.map(timestampMillis(b, _)).getOrElse(0)
        b.startTable(2)
        oi.foreach(i => b.addStruct(0, interval(b, i), 0))
        if (wmOff != 0) b.addOffset(1, wmOff, 0)
        finishResult(b, ResultSuccess, b.endTable())
      case TransformResponse.InvalidQuery(m) =>
        finishResult(b, ResultInvalidQuery, invalidQuery(b, m))
      case TransformResponse.InternalError(m, bt) =>
        finishResult(b, ResultInternalError, internalError(b, m, bt))
    }
  }

  def writeRawQueryResponse(resp: RawQueryResponse): Array[Byte] = {
    val b = new FlatBufferBuilder(256)
    resp match {
      case RawQueryResponse.Success(n) =>
        b.startTable(1)
        b.addLong(0, n, 0L)
        finishResult(b, ResultSuccess, b.endTable())
      case RawQueryResponse.InvalidQuery(m) =>
        finishResult(b, ResultInvalidQuery, invalidQuery(b, m))
      case RawQueryResponse.InternalError(m, bt) =>
        finishResult(b, ResultInternalError, internalError(b, m, bt))
    }
  }

  // ═════════════════════════════════════════════════════════════ readers ═

  /** Minimal FlatBuffers table walker (little-endian; field id → vtable
    * slot at byte `4 + 2*id`; 0 = absent).
    */
  private final class Tab(bb: ByteBuffer, pos: Int) {
    private def fieldPos(id: Int): Int = {
      val vt = pos - bb.getInt(pos)
      val voff = 4 + 2 * id
      if (voff >= (bb.getShort(vt) & 0xffff)) 0
      else {
        val fo = bb.getShort(vt + voff) & 0xffff
        if (fo == 0) 0 else pos + fo
      }
    }
    def long(id: Int, default: Long = 0L): Long = {
      val p = fieldPos(id); if (p == 0) default else bb.getLong(p)
    }
    def ubyte(id: Int): Int = {
      val p = fieldPos(id); if (p == 0) 0 else bb.get(p) & 0xff
    }
    def string(id: Int): Option[String] = fieldPos(id) match {
      case 0 => None
      case p =>
        val sp = p + bb.getInt(p)
        val len = bb.getInt(sp)
        val bytes = new Array[Byte](len)
        val dup = bb.duplicate(); dup.position(sp + 4); dup.get(bytes)
        Some(new String(bytes, java.nio.charset.StandardCharsets.UTF_8))
    }
    def table(id: Int): Option[Tab] = fieldPos(id) match {
      case 0 => None
      case p => Some(new Tab(bb, p + bb.getInt(p)))
    }
    /** Struct fields are inline at the field position. */
    def structPos(id: Int): Option[Int] = fieldPos(id) match {
      case 0 => None
      case p => Some(p)
    }
    def getLongAt(p: Int): Long = bb.getLong(p)
    def tables(id: Int): Vector[Tab] = fieldPos(id) match {
      case 0 => Vector.empty
      case p =>
        val vp = p + bb.getInt(p)
        val len = bb.getInt(vp)
        Vector.tabulate(len) { i =>
          val ep = vp + 4 + 4 * i
          new Tab(bb, ep + bb.getInt(ep))
        }
    }
    def strings(id: Int): Vector[String] = fieldPos(id) match {
      case 0 => Vector.empty
      case p =>
        val vp = p + bb.getInt(p)
        val len = bb.getInt(vp)
        Vector.tabulate(len) { i =>
          val ep = vp + 4 + 4 * i
          val sp = ep + bb.getInt(ep)
          val slen = bb.getInt(sp)
          val bytes = new Array[Byte](slen)
          val dup = bb.duplicate(); dup.position(sp + 4); dup.get(bytes)
          new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
        }
    }
  }

  private def root(bytes: Array[Byte]): Tab = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    new Tab(bb, bb.getInt(0))
  }

  private def readInterval(t: Tab, id: Int): Option[OffsetInterval] =
    t.structPos(id).map(p => OffsetInterval(t.getLongAt(p), t.getLongAt(p + 8)))

  private def readVocab(t: Option[Tab]): DatasetVocabulary = t match {
    case None => DatasetVocabulary()
    case Some(v) =>
      DatasetVocabulary(
        v.string(0).getOrElse("offset"),
        v.string(1).getOrElse("op"),
        v.string(2).getOrElse("system_time"),
        v.string(3).getOrElse("event_time"))
  }

  private def readTransform(t: Tab): Transform =
    Transform(
      kind = t.string(0).getOrElse("Sql"),
      engine = t.string(1).getOrElse(""),
      version = t.string(2),
      queries = t.tables(3).map(s => SqlQueryStep(s.string(0), s.string(1).getOrElse(""))),
      temporalTables = t.tables(4).map(tt =>
        TemporalTable(tt.string(0).getOrElse(""), tt.strings(1))))

  private def readInstant(t: Option[Tab]): Option[Instant] =
    t.map(x => Instant.ofEpochMilli(x.long(0)))

  def readTransformRequest(bytes: Array[Byte]): TransformRequest = {
    val t = root(bytes)
    TransformRequest(
      datasetId = t.string(0).getOrElse(""),
      datasetAlias = t.string(1).getOrElse(""),
      systemTime = Instant.ofEpochMilli(t.long(2)),
      vocab = readVocab(t.table(3)),
      transform = t.table(4).map(readTransform).getOrElse(Transform()),
      queryInputs = t.tables(5).map { in =>
        val did = in.string(0).getOrElse("")
        TransformRequestInput(
          datasetId = did,
          datasetAlias = in.string(1).getOrElse(did),
          queryAlias = in.string(2).getOrElse(did),
          vocab = readVocab(in.table(3)),
          offsetInterval = readInterval(in, 4),
          dataPaths = in.strings(5),
          schemaFile = in.string(6).getOrElse(""),
          explicitWatermarks = in.tables(7).map(w =>
            RequestWatermark(
              Instant.ofEpochMilli(w.long(0)),
              Instant.ofEpochMilli(w.long(1)))))
      },
      nextOffset = t.long(6),
      prevCheckpointPath = t.string(7),
      newCheckpointPath = t.string(8).getOrElse(""),
      newDataPath = t.string(9).getOrElse(""))
  }

  def readRawQueryRequest(bytes: Array[Byte]): RawQueryRequest = {
    val t = root(bytes)
    RawQueryRequest(
      inputDataPaths = t.strings(0),
      transform = t.table(1).map(readTransform).getOrElse(Transform()),
      outputDataPath = t.string(2).getOrElse(""),
      systemTime = readInstant(t.table(3)))
  }

  def readTransformResponse(bytes: Array[Byte]): TransformResponse = {
    val t = root(bytes)
    (t.ubyte(0), t.table(1)) match {
      case (ResultSuccess, Some(s)) =>
        TransformResponse.Success(readInterval(s, 0), readInstant(s.table(1)))
      case (ResultInvalidQuery, Some(e)) =>
        TransformResponse.InvalidQuery(e.string(0).getOrElse(""))
      case (ResultInternalError, Some(e)) =>
        TransformResponse.InternalError(e.string(0).getOrElse(""), e.string(1))
      case (tag, _) =>
        throw new IllegalArgumentException(s"TransformResponse: bad union tag $tag")
    }
  }

  def readRawQueryResponse(bytes: Array[Byte]): RawQueryResponse = {
    val t = root(bytes)
    (t.ubyte(0), t.table(1)) match {
      case (ResultSuccess, Some(s)) => RawQueryResponse.Success(s.long(0))
      case (ResultInvalidQuery, Some(e)) =>
        RawQueryResponse.InvalidQuery(e.string(0).getOrElse(""))
      case (ResultInternalError, Some(e)) =>
        RawQueryResponse.InternalError(e.string(0).getOrElse(""), e.string(1))
      case (tag, _) =>
        throw new IllegalArgumentException(s"RawQueryResponse: bad union tag $tag")
    }
  }

  // ══════════════════════════════════ protobuf `bytes flatbuffer` wrapper ═

  /** The gRPC proto messages each hold one field: `bytes flatbuffer = 1`
    * (reference grpc.rs:62,96 constructs them from the serialized
    * FlatBuffer). Wire form: tag 0x0A, varint length, payload.
    */
  object ProtoBytes {
    def wrap(payload: Array[Byte]): Array[Byte] = {
      val lenBytes = varint(payload.length)
      val out = new Array[Byte](1 + lenBytes.length + payload.length)
      out(0) = 0x0a
      System.arraycopy(lenBytes, 0, out, 1, lenBytes.length)
      System.arraycopy(payload, 0, out, 1 + lenBytes.length, payload.length)
      out
    }

    /** Extracts field 1 (LEN); skips unknown fields; empty message ⇒ empty
      * payload.
      */
    def unwrap(msg: Array[Byte]): Array[Byte] = {
      var i = 0
      while (i < msg.length) {
        val (tag, i1) = readVarint(msg, i)
        val fieldNo = (tag >>> 3).toInt
        val wire = (tag & 7).toInt
        wire match {
          case 2 =>
            val (len, i2) = readVarint(msg, i1)
            if (fieldNo == 1) return java.util.Arrays.copyOfRange(msg, i2, i2 + len.toInt)
            i = i2 + len.toInt
          case 0 => i = readVarint(msg, i1)._2
          case 5 => i = i1 + 4
          case 1 => i = i1 + 8
          case w => throw new IllegalArgumentException(s"unsupported proto wire type $w")
        }
      }
      Array.emptyByteArray
    }

    private def varint(v0: Long): Array[Byte] = {
      var v = v0
      val buf = new scala.collection.mutable.ArrayBuffer[Byte](5)
      while ((v & ~0x7fL) != 0) { buf += ((v & 0x7f) | 0x80).toByte; v >>>= 7 }
      buf += v.toByte
      buf.toArray
    }

    private def readVarint(a: Array[Byte], start: Int): (Long, Int) = {
      var v = 0L; var shift = 0; var i = start
      while (true) {
        require(i < a.length, "truncated varint")
        val b = a(i); i += 1
        v |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return (v, i)
        shift += 7
        require(shift < 64, "varint too long")
      }
      (v, i) // unreachable
    }
  }
}
