package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** Startup guard against driver fixture drift.
  *
  * Round 9 lost 9 queries and 11 tests because `events.parquet` was
  * regenerated with a new physical timestamp encoding and every reader
  * failed *individually at query time* with scattered analysis errors.
  * This probe fails FIRST, with a named table/column/type diff, so the
  * next drift is one message instead of eleven stack traces.
  *
  * It asserts two things per fixture table:
  *   1. every required column is present with a physical type the
  *      repo's readers accept (`ts` may be nanos-as-long `LongType`,
  *      micro-NTZ `TimestampNTZType`, or `TimestampType` — the three
  *      encodings the driver has shipped so far);
  *   2. [[EventTime.normalize]] actually lands event-time on
  *      `TimestampType` — so deleting a normalization arm fails here,
  *      by name, not downstream in `withWatermark`.
  */
object FixtureContract {

  /** Physical encodings of event-time that EventTime.normalize handles. */
  private val timeEncodings: Set[DataType] =
    Set(LongType, TimestampNTZType, TimestampType)

  private val integral: Set[DataType] = Set(IntegerType, LongType)

  /** table -> (column -> accepted physical types). Only load-bearing
    * columns are listed; extra driver columns are allowed.
    */
  private val contract: Map[String, Map[String, Set[DataType]]] = Map(
    "events" -> Map(
      "event_id" -> Set(LongType), "ts" -> timeEncodings,
      "user_id" -> Set(LongType), "event_type" -> Set(StringType),
      "value" -> Set(DoubleType), "props" -> Set(StringType)),
    "documents" -> Map(
      "doc_id" -> Set(LongType), "text" -> Set(StringType),
      "lang" -> Set(StringType), "source" -> Set(StringType),
      "n_chars" -> integral),
    "embeddings" -> Map(
      "vec_id" -> Set(LongType),
      "embedding" -> Set(ArrayType(FloatType), ArrayType(FloatType, false)),
      "label" -> integral),
    "lineitem" -> Map(
      "l_orderkey" -> Set(LongType), "l_quantity" -> Set(DoubleType),
      "l_returnflag" -> Set(StringType),
      "l_shipdate" -> (timeEncodings + DateType)),
    "orders" -> Map(
      "o_orderkey" -> Set(LongType), "o_custkey" -> Set(LongType),
      "o_totalprice" -> Set(DoubleType),
      "o_orderdate" -> (timeEncodings + DateType)),
    "customer" -> Map(
      "c_custkey" -> Set(LongType), "c_nationkey" -> integral,
      "c_acctbal" -> Set(DoubleType)),
    "supplier" -> Map("s_suppkey" -> Set(LongType), "s_nationkey" -> integral),
    "part" -> Map("p_partkey" -> Set(LongType), "p_size" -> integral),
    "nation" -> Map("n_nationkey" -> integral, "n_regionkey" -> integral),
    "region" -> Map("r_regionkey" -> integral))

  /** Violation messages; empty = fixtures match the contract. */
  def check(spark: SparkSession, dir: String): Seq[String] = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    contract.toSeq.sortBy(_._1).flatMap { case (table, cols) =>
      val path = s"$dir/$table.parquet"
      scala.util.Try(spark.read.parquet(path)).fold(
        e => Seq(s"$table: unreadable at $path (${e.getMessage})"),
        df => {
          val have = df.schema.fields.map(f => f.name -> f.dataType).toMap
          val colViolations = cols.toSeq.sortBy(_._1).flatMap {
            case (name, accepted) => have.get(name) match {
              case None =>
                Some(s"$table.$name: MISSING (driver dropped/renamed it; " +
                  s"have: ${have.keys.toSeq.sorted.mkString(", ")})")
              case Some(t) if !accepted(t) =>
                Some(s"$table.$name: physical type $t not in accepted " +
                  s"{${accepted.mkString(", ")}} — driver regenerated the " +
                  "fixture with a NEW encoding; extend graft.EventTime / " +
                  "this contract")
              case _ => None
            }
          }
          // the normalization arm itself must land on TimestampType
          val tsViolation =
            if (table == "events" && colViolations.isEmpty) {
              val normalized = EventTime.normalize(df).schema("ts").dataType
              if (normalized != TimestampType)
                Seq(s"events.ts: EventTime.normalize left $normalized, " +
                  "expected TimestampType — a normalization arm is missing")
              else Nil
            } else Nil
          colViolations ++ tsViolation
        })
    }
  }

  /** Throw with every named diff at once (not just the first). */
  def assertOk(spark: SparkSession, dir: String): Unit = {
    val vs = check(spark, dir)
    if (vs.nonEmpty) throw new IllegalStateException(
      s"FIXTURE CONTRACT VIOLATION (${vs.size}) under $dir:\n  " +
        vs.mkString("\n  "))
  }
}
