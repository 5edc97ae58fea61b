package graft.expr

import org.apache.spark.sql.types._

/** Config-facing dtype-name resolution.
  *
  * The reference builds `POLARS_DTYPE_MAPPING` by introspecting every dtype
  * in `polars.datatypes.classes` so configs can name any dtype as a string
  * (reference: src/polars_pipe/core/transform.py:20-22). We provide the same
  * capability: every Polars dtype name is addressable, mapped onto its Spark
  * equivalent, and any Spark DDL type string (e.g. "decimal(12,2)",
  * "array<int>") resolves through `DataType.fromDDL` as a fallback.
  *
  * Unsigned ints map to the next-wider signed type (Spark has no unsigned);
  * UInt64 maps to LongType by policy (SURVEY.md §1.3 — xxhash64 output is a
  * signed 64-bit value).
  */
object DTypes {
  private val named: Map[String, DataType] = Map(
    "int8" -> ByteType,
    "int16" -> ShortType,
    "int32" -> IntegerType,
    "int64" -> LongType,
    "uint8" -> ShortType,
    "uint16" -> IntegerType,
    "uint32" -> LongType,
    "uint64" -> LongType,
    "float32" -> FloatType,
    "float64" -> DoubleType,
    "float" -> FloatType,
    "double" -> DoubleType,
    "utf8" -> StringType,
    "string" -> StringType,
    "str" -> StringType,
    "boolean" -> BooleanType,
    "bool" -> BooleanType,
    "date" -> DateType,
    "datetime" -> TimestampType,
    "timestamp" -> TimestampType,
    "time" -> StringType, // Spark has no time-of-day type; stored as HH:mm:ss string
    "duration" -> DayTimeIntervalType(),
    "binary" -> BinaryType,
    "null" -> NullType,
    "categorical" -> StringType,
    "enum" -> StringType,
    "object" -> StringType,
    "decimal" -> DecimalType(38, 18)
  )

  /** Resolve a config dtype name to a Spark DataType.
    * Accepts Polars names ("Int64", "Utf8", ...) and Spark DDL strings. */
  def resolve(name: String): DataType =
    named.getOrElse(
      name.trim.toLowerCase,
      try DataType.fromDDL(name)
      catch {
        case _: Exception =>
          throw new IllegalArgumentException(s"unknown dtype name '$name'")
      }
    )
}
