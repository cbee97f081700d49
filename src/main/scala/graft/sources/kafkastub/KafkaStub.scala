package graft.sources.kafkastub

import java.util

import scala.collection.concurrent.TrieMap
import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** In-process stand-in for a Kafka cluster: topic-partitioned
  * append-only logs keyed by (bootstrap-servers, topic).
  *
  * This exists so the Kafka *source path* — option wiring
  * (`kafka.bootstrap.servers`, `subscribe`), the Kafka record schema,
  * batch scans, micro-batch streaming offsets, and Avro value decode —
  * can execute end to end in an environment without the Kafka connector
  * jars (reference contract: feathr-rs/src/source.rs:563-650). The
  * engine prefers the REAL `kafka` format whenever
  * `org.apache.spark.sql.kafka010.KafkaSourceProvider` is on the
  * classpath (see [[graft.sources.SourceResolver.kafkaFormat]]); this
  * stub serves tests and single-JVM runs only — its log lives in this
  * JVM, so it is NOT a multi-executor transport.
  */
object EmbeddedLog {
  case class Record(key: Array[Byte], value: Array[Byte], tsMicros: Long)

  // (servers, topic) -> partition -> append-only record buffer
  private val logs =
    TrieMap.empty[(String, String), TrieMap[Int, ArrayBuffer[Record]]]

  def publish(servers: String, topic: String, partition: Int,
      key: Array[Byte], value: Array[Byte], tsMicros: Long): Unit = {
    val parts = logs.getOrElseUpdate((servers, topic), TrieMap.empty)
    val buf = parts.getOrElseUpdate(partition, ArrayBuffer.empty)
    buf.synchronized { buf += Record(key, value, tsMicros) }
  }

  def partitions(servers: String, topic: String): Seq[Int] =
    logs.get((servers, topic)).map(_.keys.toSeq.sorted).getOrElse(Nil)

  /** Records `[from, until)` of one topic partition (offset = index). */
  def fetch(servers: String, topic: String, partition: Int,
      from: Long, until: Long): Seq[Record] =
    logs.get((servers, topic)).flatMap(_.get(partition)) match {
      case Some(buf) => buf.synchronized {
        buf.slice(from.toInt, math.min(until, buf.size).toInt).toSeq }
      case None => Nil
    }

  def endOffset(servers: String, topic: String, partition: Int): Long =
    logs.get((servers, topic)).flatMap(_.get(partition))
      .map(b => b.synchronized(b.size.toLong)).getOrElse(0L)

  def clearTopic(servers: String, topic: String): Unit =
    logs.remove((servers, topic))
}

private[kafkastub] object KafkaStub {
  /** The Kafka source schema — field-for-field what the real connector
    * produces, so plans written against the stub run unchanged against
    * a real cluster.
    */
  val schema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  def parseOptions(options: CaseInsensitiveStringMap): (String, Seq[String]) = {
    val servers = options.get("kafka.bootstrap.servers")
    require(servers != null && servers.nonEmpty,
      "graft-kafka: option kafka.bootstrap.servers is required")
    val subscribe = options.get("subscribe")
    require(subscribe != null && subscribe.nonEmpty,
      "graft-kafka: option subscribe is required")
    (servers, subscribe.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
  }
}

/** `spark.read/readStream.format("graft-kafka")` — registered via
  * META-INF/services DataSourceRegister, exactly how the real connector
  * registers `kafka`.
  */
class KafkaStubProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-kafka"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KafkaStub.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new KafkaStubTable(new CaseInsensitiveStringMap(properties))
}

class KafkaStubTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  private val (servers, topics) = KafkaStub.parseOptions(options)

  override def name(): String = s"graft-kafka:${topics.mkString(",")}"
  override def schema(): StructType = KafkaStub.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava

  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan {
      override def build(): Scan = this
      override def readSchema(): StructType = KafkaStub.schema
      override def toBatch: Batch = new KafkaStubBatch(servers, topics)
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new KafkaStubMicroBatch(servers, topics)
    }
}

/** One input partition per (topic, stub partition) offset range —
  * the same parallelism contract as the real connector.
  */
case class StubSlice(servers: String, topic: String, partition: Int,
    from: Long, until: Long) extends InputPartition

object StubReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val s = p.asInstanceOf[StubSlice]
    // fetched in the reader (executor side), not at planning time
    val recs = EmbeddedLog.fetch(s.servers, s.topic, s.partition, s.from, s.until)
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < recs.size }
      override def get(): InternalRow = {
        val r = recs(i)
        InternalRow(r.key, r.value, UTF8String.fromString(s.topic),
          s.partition, s.from + i, r.tsMicros, 0)
      }
      override def close(): Unit = ()
    }
  }
}

class KafkaStubBatch(servers: String, topics: Seq[String]) extends Batch {
  override def planInputPartitions(): Array[InputPartition] =
    (for {
      t <- topics
      p <- EmbeddedLog.partitions(servers, t)
    } yield StubSlice(servers, t, p, 0L, EmbeddedLog.endOffset(servers, t, p))
    ).toArray
  override def createReaderFactory(): PartitionReaderFactory = StubReaderFactory
}

/** Streaming offsets: end offset per (topic, partition), JSON-encoded
  * like the real connector's `KafkaSourceOffset`.
  */
case class StubOffset(ends: Map[String, Long]) extends Offset {
  override def json(): String =
    ends.toSeq.sorted
      .map { case (tp, o) => "\"" + tp + "\":" + o }
      .mkString("{", ",", "}")
}
object StubOffset {
  def parse(json: String): StubOffset = StubOffset(
    "\"([^\"]+)\":(\\d+)".r.findAllMatchIn(json)
      .map(m => m.group(1) -> m.group(2).toLong).toMap)
  def key(topic: String, partition: Int): String = s"$topic/$partition"
}

class KafkaStubMicroBatch(servers: String, topics: Seq[String])
    extends MicroBatchStream {

  private def current: StubOffset = StubOffset(
    (for {
      t <- topics
      p <- EmbeddedLog.partitions(servers, t)
    } yield StubOffset.key(t, p) -> EmbeddedLog.endOffset(servers, t, p)).toMap)

  override def initialOffset(): Offset = StubOffset(Map.empty)
  override def latestOffset(): Offset = current
  override def deserializeOffset(json: String): Offset = StubOffset.parse(json)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[StubOffset].ends
    val e = end.asInstanceOf[StubOffset].ends
    e.toSeq.sorted.flatMap { case (tp, until) =>
      val Array(topic, part) = tp.split("/", 2)
      val from = s.getOrElse(tp, 0L)
      if (until > from) Some(StubSlice(servers, topic, part.toInt, from, until))
      else None
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory = StubReaderFactory
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
