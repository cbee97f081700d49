package graft

import graft.sources.{AvroCodec, DataLocation, SourceResolver}
import graft.sources.kafkastub.{EmbeddedLog, StubOffset}
import graft.streaming.StreamingIngest

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S3 Kafka source executed end to end against the in-process stub
  * broker: batch scans, micro-batch streaming with incremental offsets,
  * and the Avro value codec — all through the public
  * `format("graft-kafka")` DataSourceV2 registration, the same code
  * path `format("kafka")` takes with the real connector.
  */
class KafkaStubSpec extends SparkTestBase {

  private val avroSchema =
    """{"type":"record","name":"M","fields":[
      |{"name":"id","type":"long"},
      |{"name":"label","type":["null","string"]},
      |{"name":"score","type":"double"}]}""".stripMargin

  private def publishAvro(servers: String, topic: String, partition: Int,
      id: Long, label: String, score: Double): Unit = {
    import org.apache.avro.Schema
    import org.apache.avro.generic.{GenericData, GenericDatumWriter}
    import org.apache.avro.io.EncoderFactory
    val schema = new Schema.Parser().parse(avroSchema)
    val rec = new GenericData.Record(schema)
    rec.put("id", id); rec.put("label", label); rec.put("score", score)
    val bos = new java.io.ByteArrayOutputStream()
    val enc = EncoderFactory.get().binaryEncoder(bos, null)
    new GenericDatumWriter[Any](schema).write(rec, enc)
    enc.flush()
    EmbeddedLog.publish(servers, topic, partition, null, bos.toByteArray,
      1700000000000000L + id)
  }

  test("kafkaFormat prefers the real connector, falls back to the stub") {
    // the Kafka connector jars are absent in this environment
    assert(SourceResolver.kafkaFormat == "graft-kafka")
  }

  test("batch read: Kafka record schema, partitions, offsets, Avro decode") {
    val servers = "specbroker:9092"
    EmbeddedLog.clearTopic(servers, "t1")
    (0L until 10L).foreach(i =>
      publishAvro(servers, "t1", (i % 3).toInt, i, s"l$i", i * 0.5))

    val raw = spark.read.format("graft-kafka")
      .option("kafka.bootstrap.servers", servers)
      .option("subscribe", "t1")
      .load()
    // field-for-field the real connector's schema
    assert(raw.schema.fields.map(f => f.name -> f.dataType).toSeq == Seq(
      "key" -> BinaryType, "value" -> BinaryType, "topic" -> StringType,
      "partition" -> IntegerType, "offset" -> LongType,
      "timestamp" -> TimestampType, "timestampType" -> IntegerType))
    assert(raw.count() == 10)
    assert(raw.select("partition").distinct().count() == 3)
    // offsets are dense per partition starting at 0
    val off = raw.groupBy("partition").agg(min("offset"), max("offset"), count(lit(1)))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    off.foreach { case (_, lo, hi, n) => assert(lo == 0 && hi == n - 1) }

    val decoded = AvroCodec.decode(raw, "value", avroSchema)
      .select(col("value_decoded.id"), col("value_decoded.label"),
        col("value_decoded.score"))
    assert(decoded.count() == 10)
    assert(decoded.agg(sum("id"), sum("score")).head() ==
      org.apache.spark.sql.Row(45L, 22.5))
  }

  test("DataLocation.Kafka resolves through SourceResolver with decode") {
    val servers = "specbroker2:9092"
    EmbeddedLog.clearTopic(servers, "t2")
    (0L until 5L).foreach(i => publishAvro(servers, "t2", 0, i, null, i.toDouble))
    val df = SourceResolver.read(spark,
      DataLocation.Kafka(Seq(servers), Seq("t2"), avroSchema))
    assert(df.where(col("value_decoded.label").isNull).count() == 5)
    assert(df.select(sum(col("value_decoded.id"))).head().getLong(0) == 10L)
  }

  test("streaming micro-batches advance offsets incrementally") {
    val servers = "specbroker3:9092"
    EmbeddedLog.clearTopic(servers, "t3")
    (0L until 4L).foreach(i => publishAvro(servers, "t3", (i % 2).toInt, i, "a", 1.0))

    val stream = StreamingIngest.readStream(spark,
      DataLocation.Kafka(Seq(servers), Seq("t3"), avroSchema))
    val name = s"kafka_stream_${System.nanoTime()}"
    val q = stream.select(col("value_decoded.id").as("id"))
      .writeStream.outputMode("append").format("memory").queryName(name).start()
    try {
      q.processAllAvailable()
      assert(spark.table(name).count() == 4)
      // records published after the first micro-batch arrive in the
      // next one — offset ranges are per-partition deltas, not rescans
      (4L until 7L).foreach(i => publishAvro(servers, "t3", (i % 2).toInt, i, "b", 1.0))
      q.processAllAvailable()
      assert(spark.table(name).count() == 7)
      assert(spark.table(name).agg(sum("id")).head().getLong(0) == 21L)
    } finally q.stop()
  }

  test("StubOffset json round-trip") {
    val o = StubOffset(Map("t/0" -> 3L, "t/1" -> 7L, "u/0" -> 0L))
    assert(StubOffset.parse(o.json()) == o)
    assert(StubOffset.parse(StubOffset(Map.empty).json()) == StubOffset(Map.empty))
  }

  test("AvroCodec.encode round-trips through decode (kafka wire format)") {
    import spark.implicits._
    val df = Seq((1L, "x", 0.5), (2L, "y", 1.5)).toDF("id", "label", "score")
    val encoded = AvroCodec.encode(df, avroSchema)
    val back = AvroCodec.decode(
      encoded.select(col("__avro").as("value")), "value", avroSchema)
      .select("value_decoded.id", "value_decoded.label", "value_decoded.score")
    assert(back.as[(Long, String, Double)].collect().toSet ==
      Set((1L, "x", 0.5), (2L, "y", 1.5)))
  }
}
