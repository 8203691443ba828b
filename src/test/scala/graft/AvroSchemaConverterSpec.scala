package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.schema.AvroSchemaConverter

class AvroSchemaConverterSpec extends AnyFunSuite {

  test("primitive scalars are non-nullable with the reference type lexicon") {
    val avsc =
      """{"type":"record","name":"R","fields":[
        |{"name":"a","type":"string"},
        |{"name":"b","type":"int"},
        |{"name":"c","type":"long"},
        |{"name":"d","type":"float"},
        |{"name":"e","type":"double"},
        |{"name":"f","type":"boolean"}]}""".stripMargin
    val st = AvroSchemaConverter.toStructType(avsc)
    assert(st == StructType(Seq(
      StructField("a", StringType, nullable = false),
      StructField("b", IntegerType, nullable = false),
      StructField("c", LongType, nullable = false),
      StructField("d", FloatType, nullable = false),
      StructField("e", DoubleType, nullable = false),
      StructField("f", BooleanType, nullable = false))))
  }

  test("union with null is nullable, taking first non-null member") {
    val avsc =
      """{"type":"record","name":"R","fields":[
        |{"name":"u1","type":["null","int"]},
        |{"name":"u2","type":["string","null"]},
        |{"name":"u3","type":["long","int"]}]}""".stripMargin
    val st = AvroSchemaConverter.toStructType(avsc)
    assert(st("u1") == StructField("u1", IntegerType, nullable = true))
    assert(st("u2") == StructField("u2", StringType, nullable = true))
    assert(st("u3") == StructField("u3", LongType, nullable = false))
  }

  test("logical types and unknown-type fallback") {
    val avsc =
      """{"type":"record","name":"R","fields":[
        |{"name":"ts","type":{"type":"long","logicalType":"timestamp-micros"}},
        |{"name":"d","type":{"type":"int","logicalType":"date"}},
        |{"name":"x","type":"bytes"}]}""".stripMargin
    val st = AvroSchemaConverter.toStructType(avsc)
    assert(st("ts").dataType == TimestampType && st("ts").nullable)
    assert(st("d").dataType == DateType)
    assert(st("x").dataType == StringType) // reference fallback
  }

  test("the reference silver_orders.avsc shape converts as documented") {
    // Same shape as /root/reference/spark-job/silver_orders.avsc:4-51
    val avsc =
      """{"type":"record","name":"InvoiceRecord","fields":[
        |{"name":"invoiceid","type":"int","default":0},
        |{"name":"itemid","type":"int","default":0},
        |{"name":"category","type":"string","default":""},
        |{"name":"price","type":"float","default":0.0},
        |{"name":"quantity","type":"int","default":1},
        |{"name":"orderdate","type":"string","default":""},
        |{"name":"destinationstate","type":"string","default":""},
        |{"name":"shippingtype","type":"string","default":""},
        |{"name":"referral","type":"string","default":""}]}""".stripMargin
    val st = AvroSchemaConverter.toStructType(avsc)
    assert(st.fieldNames.toSeq == Seq("invoiceid", "itemid", "category",
      "price", "quantity", "orderdate", "destinationstate", "shippingtype",
      "referral"))
    assert(st("price").dataType == FloatType)
    assert(st.fields.forall(!_.nullable))
  }
}
