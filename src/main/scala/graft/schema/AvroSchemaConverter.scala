package graft.schema

import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Avro `.avsc` (JSON) record schema → Spark `StructType`, with the exact
  * semantics of the reference's hand converter
  * (`/root/reference/spark-job/read.py:110-146`):
  *
  *  - type lexicon: string/int/long/float/double/boolean + logical types
  *    `timestamp-micros` → TimestampType, `date` → DateType
  *  - unknown types fall back to StringType
  *  - nullability: union containing "null" → nullable, taking the first
  *    non-null member's type; object-typed field → nullable; plain scalar
  *    → NOT nullable
  *  - no nested records/arrays/maps/decimals (reference limitation kept;
  *    unknown → string fallback applies)
  */
object AvroSchemaConverter {

  def toStructType(avscJson: String): StructType = {
    val root = JsonMethods.parse(avscJson)
    val fields = (root \ "fields") match {
      case JArray(fs) => fs
      case _ => throw new IllegalArgumentException(
        "avsc: expected a record schema with a 'fields' array")
    }
    StructType(fields.map(toStructField))
  }

  private def toStructField(field: JValue): StructField = {
    val name = (field \ "name") match {
      case JString(s) => s
      case _ => throw new IllegalArgumentException("avsc: field without name")
    }
    val (dt, nullable) = (field \ "type") match {
      case JString(t)      => (primitive(t), false)
      case JArray(members) => unionType(members)
      case obj: JObject    => (complexType(obj), true)
      case _               => (StringType, true)
    }
    StructField(name, dt, nullable)
  }

  private def primitive(t: String): DataType = t match {
    case "string"  => StringType
    case "int"     => IntegerType
    case "long"    => LongType
    case "float"   => FloatType
    case "double"  => DoubleType
    case "boolean" => BooleanType
    case _         => StringType // reference fallback (read.py:129)
  }

  /** union: nullable iff 'null' present; type = first non-null member. */
  private def unionType(members: List[JValue]): (DataType, Boolean) = {
    val nullable = members.exists {
      case JString("null") => true
      case _               => false
    }
    val firstNonNull = members.collectFirst {
      case JString(t) if t != "null" => primitive(t)
      case o: JObject                => complexType(o)
    }
    (firstNonNull.getOrElse(StringType), nullable)
  }

  /** object-typed field: honor logical types on primitives
    * (timestamp-micros, date); anything else → string fallback.
    */
  private def complexType(obj: JObject): DataType = {
    val logical = (obj \ "logicalType") match {
      case JString(s) => Some(s)
      case _          => None
    }
    val base = (obj \ "type") match {
      case JString(s) => Some(s)
      case _          => None
    }
    (logical, base) match {
      case (Some("timestamp-micros"), _) => TimestampType
      case (Some("date"), _)             => DateType
      case (_, Some(t))                  => primitive(t)
      case _                             => StringType
    }
  }

  /** Load an .avsc from a local path (scheme seam as in read.py:93-97). */
  def load(path: String): StructType =
    toStructType(new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8))
}
