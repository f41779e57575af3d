package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Schemas

class SchemaSpec extends AnyFunSuite {

  test("widen: numeric upcasts") {
    assert(Schemas.widen(IntegerType, LongType).contains(LongType))
    assert(Schemas.widen(LongType, IntegerType).contains(LongType))
    assert(Schemas.widen(FloatType, DoubleType).contains(DoubleType))
    assert(Schemas.widen(IntegerType, DoubleType).contains(DoubleType))
    assert(Schemas.widen(StringType, StringType).contains(StringType))
    assert(Schemas.widen(NullType, StringType).contains(StringType))
    assert(Schemas.widen(StringType, LongType).isEmpty)
  }

  test("mergeStructs: add nullable column, widen in place, stable order") {
    val base = StructType(Seq(
      StructField("url", StringType, nullable = false),
      StructField("n", IntegerType)))
    val incoming = StructType(Seq(
      StructField("n", LongType),
      StructField("fetch_status", IntegerType)))
    val merged = Schemas.mergeStructs(base, incoming)
    assert(merged.fieldNames.toSeq == Seq("url", "n", "fetch_status"))
    assert(merged("n").dataType == LongType)
    assert(merged("fetch_status").nullable)
  }

  test("mergeStructs: incompatible types fail loudly") {
    val a = StructType(Seq(StructField("x", StringType)))
    val b = StructType(Seq(StructField("x", LongType)))
    assertThrows[IllegalArgumentException](Schemas.mergeStructs(a, b))
  }

  test("mergeStructs is associative on the evolution fixtures") {
    val v1 = StructType(Seq(StructField("a", IntegerType)))
    val v2 = StructType(Seq(StructField("a", LongType), StructField("b", StringType)))
    val v3 = StructType(Seq(StructField("c", DoubleType)))
    val left = Schemas.mergeStructs(Schemas.mergeStructs(v1, v2), v3)
    val right = Schemas.mergeStructs(v1, Schemas.mergeStructs(v2, v3))
    assert(left == right)
  }
}
