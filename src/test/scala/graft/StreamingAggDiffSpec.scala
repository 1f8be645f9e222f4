package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingAggDiff.keyOf

/** Unit pins for the streaming GROUP BY face's group-identity encoding
  * (round-9 ADVICE #3): value-equal keys must map to one key string across
  * the container identities the two diff frames actually produce — parquet
  * state rows carry the FILE's StructType inside GenericRowWithSchema,
  * freshly-merged rows carry the PLAN's, and array columns surface as
  * different Seq implementations per code path.
  */
class StreamingAggDiffSpec extends AnyFunSuite {

  test("struct keys ignore carried schema metadata and schema identity") {
    val a = StructType(Seq(StructField("x", IntegerType),
      StructField("y", StringType)))
    val b = StructType(Seq(
      StructField("x", IntegerType, nullable = false,
        new MetadataBuilder().putString("comment", "from parquet").build()),
      StructField("y", StringType)))
    val va = new GenericRowWithSchema(Array[Any](1, "k"), a)
    val vb = new GenericRowWithSchema(Array[Any](1, "k"), b)
    val plain = Row(1, "k")
    assert(keyOf(Seq(va)) == keyOf(Seq(vb)))
    assert(keyOf(Seq(va)) == keyOf(Seq(plain)))
    assert(keyOf(Seq(va)) != keyOf(Seq(Row(2, "k"))))
    assert(keyOf(Seq(va)) != keyOf(Seq(Row(1, "K"))))
  }

  test("array keys ignore the Seq implementation") {
    val wrapped: scala.collection.Seq[Any] =
      scala.collection.mutable.ArraySeq.make(Array[Any](1L, 2L, 3L))
    val vector: Seq[Any] = Vector(1L, 2L, 3L)
    assert(keyOf(Seq(wrapped)) == keyOf(Seq(vector)))
    assert(keyOf(Seq(wrapped)) != keyOf(Seq(Vector(1L, 2L))))
  }

  test("nested structs canonicalize recursively; atomics and nulls distinct") {
    val inner = StructType(Seq(StructField("z", LongType)))
    val outerA = StructType(Seq(StructField("n", inner)))
    val outerB = StructType(Seq(StructField("n",
      StructType(Seq(StructField("z", LongType, nullable = false))))))
    val ra = new GenericRowWithSchema(
      Array[Any](new GenericRowWithSchema(Array[Any](9L), inner)), outerA)
    val rb = new GenericRowWithSchema(
      Array[Any](new GenericRowWithSchema(Array[Any](9L),
        outerB.fields.head.dataType.asInstanceOf[StructType])), outerB)
    assert(keyOf(Seq(ra)) == keyOf(Seq(rb)))
    assert(keyOf(Seq(null)) == keyOf(Seq(null)))
    assert(keyOf(Seq(null)) != keyOf(Seq("null")))
    assert(keyOf(Seq(1, "a")) != keyOf(Seq(1, "b")))
  }

  test("float zero signs and NaN bit patterns collapse in nested positions") {
    val rawNaN = java.lang.Double.longBitsToDouble(0x7ff8000000000001L)
    assert(keyOf(Seq(Row(-0.0d))) == keyOf(Seq(Row(0.0d))))
    assert(keyOf(Seq(Row(rawNaN))) == keyOf(Seq(Row(Double.NaN))))
    assert(keyOf(Seq(Row(-0.0f))) == keyOf(Seq(Row(0.0f))))
    assert(keyOf(Seq(Row(1.0d))) != keyOf(Seq(Row(2.0d))))
  }
}
