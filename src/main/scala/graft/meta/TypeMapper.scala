package graft.meta

import java.util.Locale

import org.apache.spark.sql.types._

/** The reference's type universe, re-targeted at Spark.
  *
  * Forward map: Snowflake type string (+ precision/scale/length from
  * INFORMATION_SCHEMA) → Spark `DataType`, mirroring `TYPE_MAPPING` and
  * `map_type` (`snowflake_to_postgres/translator.py:15-82`) including the
  * unknown→TEXT fallback (translator.py:81-82).
  *
  * Reverse map: Spark `DataType` → PostgreSQL DDL type, for the DDL
  * generator — the same PG surface the reference emits.
  *
  * Documented gaps (SURVEY §1.2): Snowflake TIME has no Spark type → string;
  * VARIANT/OBJECT/ARRAY are carried as JSON text (JSONB on the PG side).
  */
object TypeMapper {

  final case class SourceType(
      typeName: String,
      precision: Option[Int] = None,
      scale: Option[Int] = None,
      length: Option[Int] = None)

  /** Snowflake → Spark. */
  def toSpark(t: SourceType): DataType =
    t.typeName.trim.toUpperCase(Locale.ROOT) match {
      case "NUMBER" | "NUMERIC" | "DECIMAL" =>
        (t.precision, t.scale) match {
          case (Some(p), s) => DecimalType(math.min(p, 38), math.min(s.getOrElse(0), 38))
          case _            => DecimalType(38, 18)
        }
      case "INT" | "INTEGER"                => IntegerType
      case "BIGINT"                         => LongType
      case "SMALLINT"                       => ShortType
      case "TINYINT" | "BYTEINT"            => ByteType
      case "FLOAT" | "FLOAT8" | "DOUBLE" | "DOUBLE PRECISION" => DoubleType
      case "FLOAT4" | "REAL"                => FloatType
      case "VARCHAR" | "CHAR" | "CHARACTER" | "STRING" | "TEXT" => StringType
      case "BINARY" | "VARBINARY"           => BinaryType
      case "DATE"                           => DateType
      case "DATETIME" | "TIMESTAMP" | "TIMESTAMP_NTZ" => TimestampNTZType
      case "TIMESTAMP_LTZ" | "TIMESTAMP_TZ" => TimestampType
      case "TIME"                           => StringType // no Spark TIME type
      case "BOOLEAN"                        => BooleanType
      case "VARIANT" | "OBJECT" | "ARRAY"   => StringType // JSON text
      case _                                => StringType // TEXT fallback
    }

  /** Spark → PostgreSQL DDL type (translator.py TYPE_MAPPING, inverted
    * through Spark). Nested types degrade to JSONB like VARIANT. */
  def toPostgres(dt: DataType): String = dt match {
    case d: DecimalType  => s"NUMERIC(${d.precision},${d.scale})"
    case ByteType        => "SMALLINT"
    case ShortType       => "SMALLINT"
    case IntegerType     => "INTEGER"
    case LongType        => "BIGINT"
    case FloatType       => "REAL"
    case DoubleType      => "DOUBLE PRECISION"
    case StringType      => "TEXT"
    case BinaryType      => "BYTEA"
    case BooleanType     => "BOOLEAN"
    case DateType        => "DATE"
    case TimestampNTZType => "TIMESTAMP"
    case TimestampType   => "TIMESTAMP WITH TIME ZONE"
    case _: ArrayType | _: MapType | _: StructType => "JSONB"
    case _               => "TEXT"
  }
}
