package graft.sources

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.avro.io.DecoderFactory
import org.apache.avro.util.Utf8

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Avro value decoding for Kafka sources (SURVEY.md §2.1 S3; reference
  * `KafkaSchema`, feathr-rs/src/source.rs:48-54, builder 563-650).
  *
  * The environment ships avro-core but not the spark-avro module, so
  * this is a native decoder with the same contract as `from_avro`: an
  * Avro schema JSON + a binary column → a typed struct column. The
  * decode runs per-partition with one reused `GenericDatumReader` and
  * `BinaryDecoder` (allocation-free steady state) — the shape a
  * 100 TB Kafka backfill needs.
  */
object AvroCodec {

  /** Map an Avro schema to the corresponding Spark type.
    * Supported: primitives, records, arrays, string-keyed maps, enums,
    * fixed, and `[null, X]` unions (→ nullable X).
    */
  def sparkType(s: Schema): DataType = s.getType match {
    case Schema.Type.STRING  => StringType
    case Schema.Type.BYTES   => BinaryType
    case Schema.Type.INT     => IntegerType
    case Schema.Type.LONG    => LongType
    case Schema.Type.FLOAT   => FloatType
    case Schema.Type.DOUBLE  => DoubleType
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.ENUM    => StringType
    case Schema.Type.FIXED   => BinaryType
    case Schema.Type.NULL    => NullType
    case Schema.Type.RECORD =>
      StructType(s.getFields.asScala.toSeq.map { f =>
        StructField(f.name, sparkType(f.schema), nullable = isNullable(f.schema))
      })
    case Schema.Type.ARRAY =>
      ArrayType(sparkType(nonNull(s.getElementType)),
        containsNull = isNullable(s.getElementType))
    case Schema.Type.MAP =>
      MapType(StringType, sparkType(nonNull(s.getValueType)),
        valueContainsNull = isNullable(s.getValueType))
    case Schema.Type.UNION => sparkType(nonNull(s))
  }

  private def isNullable(s: Schema): Boolean =
    s.getType == Schema.Type.UNION &&
      s.getTypes.asScala.exists(_.getType == Schema.Type.NULL)

  /** The non-null branch of a `[null, X]` union (or the schema itself). */
  private def nonNull(s: Schema): Schema =
    if (s.getType != Schema.Type.UNION) s
    else {
      val branches = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
      require(branches.size == 1,
        s"only [null, X] unions are supported, got ${s}")
      branches.head
    }

  /** Avro runtime value → Spark external row value. */
  private def convert(v: Any, s: Schema): Any = v match {
    case null => null
    case u: Utf8 => u.toString
    case s2: java.lang.CharSequence => s2.toString
    case r: GenericRecord =>
      val rs = nonNull(s)
      Row.fromSeq(rs.getFields.asScala.toSeq.map { f =>
        convert(r.get(f.pos), f.schema) })
    case a: java.util.Collection[_] =>
      val el = nonNull(s).getElementType
      a.asScala.toSeq.map(convert(_, el))
    case m: java.util.Map[_, _] =>
      val vt = nonNull(s).getValueType
      m.asScala.map { case (k, mv) => k.toString -> convert(mv, vt) }.toMap
    case b: java.nio.ByteBuffer =>
      val arr = new Array[Byte](b.remaining()); b.duplicate().get(arr); arr
    case f: org.apache.avro.generic.GenericFixed => f.bytes().clone()
    case e: org.apache.avro.generic.GenericEnumSymbol[_] => e.toString
    case other => other // primitives arrive boxed
  }

  /** Encode each row into Avro binary (no header/framing — the Kafka
    * wire format; the inverse of [[decode]]): record fields are taken
    * from the DataFrame columns of the same name. The produce-side of a
    * Kafka pipeline, and the seeding path for source tests. Supported
    * field types: Avro primitives and `[null, X]` unions of them.
    */
  def encode(df: DataFrame, avroSchemaJson: String,
      outCol: String = "__avro"): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField(outCol, BinaryType, nullable = false))
    val enc = RowEncoder.encoderFor(outSchema)
    val colIdx = {
      val s = new Schema.Parser().parse(avroSchemaJson)
      s.getFields.asScala.toSeq.map(f => f.pos -> df.schema.fieldIndex(f.name))
    }
    df.mapPartitions { rows =>
      val schema = new Schema.Parser().parse(avroSchemaJson)
      val writer = new org.apache.avro.generic.GenericDatumWriter[Any](schema)
      val bos = new java.io.ByteArrayOutputStream()
      var encoder: org.apache.avro.io.BinaryEncoder = null
      rows.map { r =>
        val rec = new org.apache.avro.generic.GenericData.Record(schema)
        colIdx.foreach { case (pos, idx) =>
          val v = r.get(idx) match {
            case null => null
            case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
            case other => other
          }
          rec.put(pos, v)
        }
        bos.reset()
        encoder = org.apache.avro.io.EncoderFactory.get().binaryEncoder(bos, encoder)
        writer.write(rec, encoder)
        encoder.flush()
        Row.fromSeq(r.toSeq :+ bos.toByteArray)
      }
    }(enc)
  }

  /** Decode `binCol` (Avro binary, no header/framing — the Kafka wire
    * format) into a struct column `outCol`; all other columns pass
    * through. Null payloads decode to a null struct.
    */
  def decode(df: DataFrame, binCol: String, avroSchemaJson: String,
      outCol: String = "value_decoded"): DataFrame = {
    val valueType = {
      val s = new Schema.Parser().parse(avroSchemaJson)
      sparkType(s)
    }
    val outSchema = StructType(df.schema.fields :+
      StructField(outCol, valueType, nullable = true))
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      // schema JSON parsed once per partition; reader + decoder reused
      val schema = new Schema.Parser().parse(avroSchemaJson)
      val reader = new GenericDatumReader[Any](schema)
      var decoder: org.apache.avro.io.BinaryDecoder = null
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        val decoded =
          if (bytes == null) null
          else {
            decoder = DecoderFactory.get().binaryDecoder(bytes, decoder)
            convert(reader.read(null, decoder), schema)
          }
        Row.fromSeq(r.toSeq :+ decoded)
      }
    }(enc)
  }
}
