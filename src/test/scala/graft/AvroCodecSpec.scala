package graft

import graft.sources.AvroCodec

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumWriter}
import org.apache.avro.io.EncoderFactory

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** S3 Kafka value decode: Avro binary → typed struct, tested on a
  * static binary DataFrame (no broker needed) — the same decode the
  * Kafka batch/stream paths apply to the `value` column.
  */
class AvroCodecSpec extends SparkTestBase {

  private val schemaJson =
    """{"type":"record","name":"Event","fields":[
      |  {"name":"user_id","type":"long"},
      |  {"name":"event_type","type":"string"},
      |  {"name":"value","type":"double"},
      |  {"name":"note","type":["null","string"],"default":null},
      |  {"name":"tags","type":{"type":"array","items":"string"}},
      |  {"name":"props","type":{"type":"map","values":"long"}}
      |]}""".stripMargin

  private def encode(userId: Long, eventType: String, value: Double,
      note: Option[String], tags: Seq[String], props: Map[String, Long]): Array[Byte] = {
    val schema = new Schema.Parser().parse(schemaJson)
    val rec = new GenericData.Record(schema)
    rec.put("user_id", userId)
    rec.put("event_type", eventType)
    rec.put("value", value)
    rec.put("note", note.orNull)
    rec.put("tags", java.util.Arrays.asList(tags: _*))
    val pm = new java.util.HashMap[String, java.lang.Long]()
    props.foreach { case (k, v) => pm.put(k, v) }
    rec.put("props", pm)
    val out = new java.io.ByteArrayOutputStream()
    val enc = EncoderFactory.get().binaryEncoder(out, null)
    new GenericDatumWriter[GenericData.Record](schema).write(rec, enc)
    enc.flush()
    out.toByteArray
  }

  test("avro schema maps to the expected spark struct") {
    val t = AvroCodec.sparkType(new Schema.Parser().parse(schemaJson))
      .asInstanceOf[StructType]
    assert(t.fieldNames.toSeq ==
      Seq("user_id", "event_type", "value", "note", "tags", "props"))
    assert(t("user_id").dataType == LongType)
    assert(t("note").dataType == StringType && t("note").nullable)
    assert(t("tags").dataType == ArrayType(StringType, containsNull = false))
    assert(t("props").dataType == MapType(StringType, LongType, valueContainsNull = false))
  }

  test("binary avro values decode to typed struct rows (null passthrough)") {
    val bytes1 = encode(7L, "purchase", 12.5, Some("hi"), Seq("a", "b"), Map("k" -> 3L))
    val bytes2 = encode(8L, "click", 0.25, None, Nil, Map.empty)
    val df = spark.createDataFrame(
      java.util.Arrays.asList(Row(1L, bytes1), Row(2L, bytes2), Row(3L, null)),
      StructType(Seq(StructField("offset", LongType), StructField("value", BinaryType))))

    val out = AvroCodec.decode(df, "value", schemaJson).orderBy("offset").collect()
    assert(out.length == 3)
    val r1 = out(0).getStruct(2)
    assert(r1.getLong(0) == 7L && r1.getString(1) == "purchase")
    assert(r1.getDouble(2) == 12.5 && r1.getString(3) == "hi")
    assert(r1.getSeq[String](4) == Seq("a", "b"))
    assert(r1.getMap[String, Long](5) == Map("k" -> 3L))
    val r2 = out(1).getStruct(2)
    assert(r2.getLong(0) == 8L && r2.isNullAt(3) && r2.getSeq[String](4).isEmpty)
    assert(out(2).isNullAt(2))
  }

  test("decoded struct participates in relational ops") {
    val rows = (0 until 50).map { i =>
      Row(i.toLong, encode(i.toLong % 5, if (i % 2 == 0) "click" else "purchase",
        i.toDouble, None, Nil, Map.empty))
    }
    val df = spark.createDataFrame(java.util.Arrays.asList(rows: _*),
      StructType(Seq(StructField("offset", LongType), StructField("value", BinaryType))))
    import org.apache.spark.sql.functions._
    val agg = AvroCodec.decode(df, "value", schemaJson)
      .select(col("value_decoded.user_id").as("uid"),
        col("value_decoded.value").as("v"))
      .groupBy("uid").agg(sum("v").as("sv"))
      .orderBy("uid").collect()
    assert(agg.length == 5)
    assert(agg.map(_.getDouble(1)).sum == (0 until 50).map(_.toDouble).sum)
  }
}
