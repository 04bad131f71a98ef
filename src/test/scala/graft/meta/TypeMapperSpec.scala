package graft.meta

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import TypeMapper.SourceType

/** Covers every row of the reference's TYPE_MAPPING
  * (translator.py:15-54) plus the parameterized/fallback paths
  * (translator.py:56-82). */
class TypeMapperSpec extends AnyFunSuite {

  private def map(name: String, p: Option[Int] = None, s: Option[Int] = None): DataType =
    TypeMapper.toSpark(SourceType(name, p, s))

  test("numeric family") {
    assert(map("NUMBER", Some(10), Some(2)) === DecimalType(10, 2))
    assert(map("NUMERIC") === DecimalType(38, 18))
    assert(map("DECIMAL", Some(38), Some(0)) === DecimalType(38, 0))
    assert(map("NUMBER", Some(99), Some(50)) === DecimalType(38, 38)) // clamped
    assert(map("INT") === IntegerType)
    assert(map("INTEGER") === IntegerType)
    assert(map("BIGINT") === LongType)
    assert(map("SMALLINT") === ShortType)
    assert(map("TINYINT") === ByteType)
    assert(map("BYTEINT") === ByteType)
  }

  test("float family") {
    assert(map("FLOAT") === DoubleType)
    assert(map("FLOAT8") === DoubleType)
    assert(map("DOUBLE") === DoubleType)
    assert(map("DOUBLE PRECISION") === DoubleType)
    assert(map("FLOAT4") === FloatType)
    assert(map("REAL") === FloatType)
  }

  test("string/binary family") {
    Seq("VARCHAR", "CHAR", "CHARACTER", "STRING", "TEXT").foreach(t =>
      assert(map(t) === StringType, t))
    assert(map("BINARY") === BinaryType)
    assert(map("VARBINARY") === BinaryType)
  }

  test("temporal family") {
    assert(map("DATE") === DateType)
    Seq("DATETIME", "TIMESTAMP", "TIMESTAMP_NTZ").foreach(t =>
      assert(map(t) === TimestampNTZType, t))
    Seq("TIMESTAMP_LTZ", "TIMESTAMP_TZ").foreach(t =>
      assert(map(t) === TimestampType, t))
    assert(map("TIME") === StringType) // documented gap: no Spark TIME
  }

  test("boolean, semi-structured, fallback") {
    assert(map("BOOLEAN") === BooleanType)
    Seq("VARIANT", "OBJECT", "ARRAY").foreach(t => assert(map(t) === StringType, t))
    assert(map("GEOGRAPHY") === StringType) // unknown → TEXT fallback
    assert(map("  number ", Some(5), Some(1)) === DecimalType(5, 1)) // case/space insensitive
  }

  test("reverse map to PostgreSQL DDL types") {
    assert(TypeMapper.toPostgres(DecimalType(12, 3)) === "NUMERIC(12,3)")
    assert(TypeMapper.toPostgres(IntegerType) === "INTEGER")
    assert(TypeMapper.toPostgres(LongType) === "BIGINT")
    assert(TypeMapper.toPostgres(DoubleType) === "DOUBLE PRECISION")
    assert(TypeMapper.toPostgres(FloatType) === "REAL")
    assert(TypeMapper.toPostgres(StringType) === "TEXT")
    assert(TypeMapper.toPostgres(BinaryType) === "BYTEA")
    assert(TypeMapper.toPostgres(DateType) === "DATE")
    assert(TypeMapper.toPostgres(TimestampNTZType) === "TIMESTAMP")
    assert(TypeMapper.toPostgres(TimestampType) === "TIMESTAMP WITH TIME ZONE")
    assert(TypeMapper.toPostgres(ArrayType(IntegerType)) === "JSONB")
  }
}
