package graft.operators

import graft.model._
import graft.project._
import graft.sources._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.time.{Duration, Instant}

/** Output sinks (reference `OutputSink`, feathr-rs/src/materialization.rs:27-98). */
sealed trait OutputSink
object OutputSink {
  /** K1/K3: any Spark-writable format (`GenericSink`, materialization.rs:57-91);
    * `numParts` mirrors `--num-parts` (job_client/mod.rs:290-292).
    */
  case class Generic(format: String, path: String,
      mode: String = "overwrite", options: Map[String, String] = Map.empty,
      numParts: Option[Int] = None) extends OutputSink
  def hdfs(path: String, numParts: Option[Int] = None): Generic =
    Generic(DataLocation.inferFormat(path), path, numParts = numParts)

  /** K2: online KV sink (`RedisSink`, materialization.rs:27-55).
    * key = join keys, value = feature map. Store is pluggable; tests use
    * the file-backed impl below — the write path (per-partition push of
    * key → featureMap) is the real, distributed shape.
    */
  case class Online(tableName: String, store: OnlineStore) extends OutputSink
}

/** Pluggable online store (stand-in for Redis — zero-egress env). */
trait OnlineStore extends Serializable {
  def put(table: String, key: String, value: Map[String, String]): Unit
  /** Point lookup — the serving path; None for an absent key. */
  def get(table: String, key: String): Option[Map[String, String]]
  /** Bulk write — the sink path calls this once per PARTITION so a
    * real client can pipeline/batch over the wire (Redis MSET /
    * pipelined HSET). Default falls back to per-key [[put]].
    */
  def putAll(table: String, rows: Iterator[(String, Map[String, String])]): Unit =
    rows.foreach { case (k, v) => put(table, k, v) }
  /** Bulk erasure — the GDPR path ([[Materializer.deleteKeys]]). The
    * default rides [[putAll]]'s replace-on-write: an EMPTY value map
    * deletes the key (the RESP impl issues only the DEL); impls whose
    * empty-write is not a delete must override.
    */
  def deleteAll(table: String, keys: Iterator[String]): Unit =
    putAll(table, keys.map(_ -> Map.empty[String, String]))
  /** Bulk point-lookup — the serving path's batch form
    * ([[Materializer.readOnline]]); default falls back to per-key
    * [[get]] (the RESP impl pipelines HGETALL over one connection).
    */
  def getAll(table: String,
      keys: Seq[String]): Seq[(String, Option[Map[String, String]])] =
    keys.map(k => k -> get(table, k))
}

/** File-backed store for tests: one csv-ish line per key. Field names
  * and values are URL-encoded on write (as the filename already is) so
  * values containing newlines or '=' round-trip losslessly.
  */
class FileOnlineStore(dir: String) extends OnlineStore {
  private def enc(s: String): String = java.net.URLEncoder.encode(s, "UTF-8")
  private def dec(s: String): String = java.net.URLDecoder.decode(s, "UTF-8")
  private def fileOf(table: String, key: String): java.io.File =
    new java.io.File(new java.io.File(dir, table), enc(key))

  def put(table: String, key: String, value: Map[String, String]): Unit = {
    val f = fileOf(table, key)
    f.getParentFile.mkdirs()
    val body = value.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${enc(k)}=${enc(v)}" }.mkString("\n")
    java.nio.file.Files.write(f.toPath, body.getBytes("UTF-8"))
  }

  def get(table: String, key: String): Option[Map[String, String]] = {
    val f = fileOf(table, key)
    if (!f.exists()) None
    else Some(new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
      .split("\n").iterator.filter(_.contains("="))
      .map { l => val Array(k, v) = l.split("=", 2); dec(k) -> dec(v) }.toMap)
  }

  /** An empty-map write leaves an empty FILE here (key present, no
    * fields) — not a delete — so erasure removes the file itself.
    */
  override def deleteAll(table: String, keys: Iterator[String]): Unit =
    keys.foreach(k => fileOf(table, k).delete())
}

/** Backfill step resolution (reference `DateTimeResolution`,
  * feathr-rs/src/materialization.rs).
  */
sealed abstract class DateTimeResolution(val step: Duration)
object DateTimeResolution {
  case object Daily extends DateTimeResolution(Duration.ofDays(1))
  case object Hourly extends DateTimeResolution(Duration.ofHours(1))
}

/** Feature generation / materialization (SURVEY.md §2.8).
  *
  * M1 backfill: `[start, end]` is cut into daily/hourly steps, one
  * evaluation per step with `obs_ts := step end` (reference walks
  * endTime back per submitted job, materialization.rs:200-231).
  * M2 snapshot: evaluate every key's feature value as of one endTime.
  * M3 fan-out: compute once, persist, write each sink.
  *
  * The generated "observation" is the distinct key set of the anchor
  * sources at `ts <= endTime` — so generation reuses the exact PIT-join
  * planner (one code path for correctness parity between join and gen).
  */
object Materializer {

  /** Keyed contributing sources for `features`: each anchor-group
    * source scanned once, its key columns renamed to `keyColumns`, with
    * the key's first event time (`null` for time-less sources — such a
    * key is a member of every snapshot).
    */
  private def keyFirstSeen(
      spark: SparkSession,
      project: FeatureProject,
      features: Seq[String],
      keyColumns: Seq[String]): DataFrame = {
    val anchored = project.requiredAnchorFeatures(features)
    val groups = anchored
      .flatMap { case (_, base) => project.anchorFeature(base) }
      .map(_._1).distinct
    val perGroup = groups.filterNot(_.source.isInputContext).map { g =>
      val src = SourceResolver.resolve(spark, g.source)
      val keyed = g.features.head.keys.zipWithIndex.foldLeft(src) {
        case (df, (k, i)) => df.withColumn(keyColumns(i), col(k.keyColumn))
      }
      val first =
        if (g.source.timeWindow.isDefined) min(col(Internal.SrcTs))
        else min(lit(null).cast("timestamp"))
      keyed.groupBy(keyColumns.map(col): _*).agg(first.as("__first_ts"))
    }
    require(perGroup.nonEmpty, "nothing to materialize: no keyed anchor sources")
    // a null first_ts (time-less source) must win the merge — encode it
    // as the epoch minimum rather than relying on null-skipping min()
    val floor = lit(java.sql.Timestamp.from(Instant.ofEpochSecond(-62135596800L)))
    perGroup.reduce(_ unionByName _)
      .groupBy(keyColumns.map(col): _*)
      .agg(min(coalesce(col("__first_ts"), floor)).as("__first_ts"))
  }

  /** Feature-freshness monitor: per key, when its LAST source event
    * arrived vs the `asOf` the snapshot claims — the staleness signal
    * an online store is judged by ("how old is what we serve?"), plus
    * membership drift (keys with events but absent from the snapshot =
    * materialization lag; snapshot keys with no events = static or
    * orphaned). One groupBy over the source + one full-outer join with
    * the snapshot's key set; lag is integer seconds, so the report is
    * engine-exact and hash-gateable.
    */
  def freshnessReport(
      snapshotKeys: DataFrame, source: DataFrame,
      keyCol: String, tsCol: String,
      asOf: Instant): DataFrame = {
    val asOfUs = asOf.getEpochSecond * 1000000L +
      asOf.getNano / 1000L
    val last = source.groupBy(col(keyCol))
      .agg(max(unix_micros(col(tsCol))).as("last_event_us"))
    last.join(
        snapshotKeys.select(col(keyCol)).distinct()
          .withColumn("__snap", lit(true)),
        Seq(keyCol), "full_outer")
      .select(col(keyCol), col("last_event_us"),
        call_function("div", lit(asOfUs) - col("last_event_us"), lit(1000000L))
          .as("lag_s"),
        coalesce(col("__snap"), lit(false)).as("in_snapshot"))
  }

  def snapshot(
      spark: SparkSession,
      project: FeatureProject,
      features: Seq[String],
      keyColumns: Seq[String],
      endTime: Instant): DataFrame = {
    // spine = all keys observed in any contributing source up to endTime
    val spine = keyFirstSeen(spark, project, features, keyColumns)
      .where(col("__first_ts") <= lit(java.sql.Timestamp.from(endTime)))
      .select(keyColumns.map(col): _*)
      .withColumn("__graft_gen_ts", lit(java.sql.Timestamp.from(endTime)))
    PointInTimeJoin.run(spark, project, spine,
      Some(("__graft_gen_ts", "native")),
      Seq(FeatureQuery(features, keyColumns)))
      .drop("__graft_gen_ts")
  }

  /** M1: all step ends in `[start, end]` evaluated in ONE plan — the
    * spine is (key × step_end) pairs, the PIT planner computes features
    * as of each pair's step end, and every contributing source is
    * scanned once total (the reference submits one job per step,
    * materialization.rs:200-231 — at hourly resolution over a long
    * range that is hundreds of rescans of the same source). Each row is
    * stamped with its `__step_end`; M3: each step fans out to all
    * sinks, preserving the reference's one-output-per-step contract.
    */
  def backfill(
      spark: SparkSession,
      project: FeatureProject,
      features: Seq[String],
      keyColumns: Seq[String],
      start: Instant,
      end: Instant,
      resolution: DateTimeResolution,
      sinks: Seq[OutputSink]): DataFrame = {
    val steps = Iterator.iterate(end)(_.minus(resolution.step))
      .takeWhile(!_.isBefore(start)).toSeq.reverse
    val stepTs = steps.map(java.sql.Timestamp.from)
    val stepsDf = spark.createDataFrame(
      spark.sparkContext.parallelize(stepTs.map(org.apache.spark.sql.Row(_)), 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__step_end",
          org.apache.spark.sql.types.TimestampType))))
    // key is a member of every step whose end it has been seen by
    val spine = keyFirstSeen(spark, project, features, keyColumns)
      .join(broadcast(stepsDf), col("__first_ts") <= col("__step_end"))
      .select(keyColumns.map(col) :+ col("__step_end"): _*)
    val joined = PointInTimeJoin.run(spark, project, spine,
      Some(("__step_end", "native")),
      Seq(FeatureQuery(features, keyColumns)))
      .select(keyColumns.map(col) ++ features.map(col) :+ col("__step_end"): _*)
    if (sinks.nonEmpty) {
      // one evaluation, per-step writes (reference sink contract)
      val cached = joined.persist()
      try stepTs.foreach { se =>
        writeAll(cached.where(col("__step_end") === lit(se)), keyColumns, sinks)
      } finally cached.unpersist()
    }
    joined
  }

  def writeAll(df0: DataFrame, keyColumns: Seq[String], sinks: Seq[OutputSink]): Unit = {
    val df = if (sinks.size > 1) df0.persist() else df0
    try sinks.foreach(write(df, keyColumns, _))
    finally if (sinks.size > 1) df.unpersist()
  }

  /** The streaming micro-batch's partition column in file sinks. */
  val BatchIdCol = "__graft_batch_id"

  /** Idempotent per-micro-batch write — the exactly-once posture for
    * streaming `foreachBatch`, whose contract is AT-LEAST-ONCE batch
    * delivery (a failure after a partial write replays the whole batch
    * with the same `batchId`):
    *  - file sinks write the batch into its `__graft_batch_id=N`
    *    partition with DYNAMIC partition overwrite, so a replay
    *    rewrites exactly that partition instead of appending
    *    duplicates — readers of the sink path see the batch-id
    *    partition column and may drop it;
    *  - online sinks are replace-on-write per key (DEL + HSET), so
    *    replaying a deterministic batch rewrites identical state —
    *    idempotent without a transaction marker.
    * The sink's configured `mode` is intentionally ignored here:
    * within a streaming query the ONLY correct file-sink semantic is
    * own-partition overwrite.
    */
  def writeBatch(df0: DataFrame, batchId: Long, keyColumns: Seq[String],
      sinks: Seq[OutputSink]): Unit = {
    import org.apache.spark.sql.functions.lit
    val df = if (sinks.size > 1) df0.persist() else df0
    try sinks.foreach {
      case OutputSink.Generic(format, path, _, options, numParts) =>
        val out = numParts.map(df.repartition).getOrElse(df)
        out.withColumn(BatchIdCol, lit(batchId))
          .write.format(format).options(options)
          .mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy(BatchIdCol)
          .save(path)
      case s: OutputSink.Online => write(df, keyColumns, s)
    } finally if (sinks.size > 1) df.unpersist()
  }

  /** Online serving READ-BACK — the `get_online_features` client path:
    * fetch the feature rows for `keys` from an online sink as a
    * DataFrame, with the SAME key encoding the write path uses
    * (keyCols joined by '#'). Distributed: one pipelined
    * [[OnlineStore.getAll]] per partition (the write path's
    * discipline). Values come back as STRINGS — the online stores'
    * wire representation; the serving caller casts. An absent key
    * keeps its key columns and carries null features (the cold-start
    * contract: the trainer/server decides, nothing is silently
    * dropped).
    */
  def readOnline(keys: DataFrame, keyColumns: Seq[String],
      sink: OutputSink.Online, features: Seq[String]): DataFrame = {
    require(keyColumns.nonEmpty, "readOnline needs key columns")
    require(features.nonEmpty, "readOnline needs feature names")
    val spark = keys.sparkSession
    val kc = keyColumns
    val fs = features
    val table = sink.tableName
    val store = sink.store
    val schema = org.apache.spark.sql.types.StructType(
      kc.map(org.apache.spark.sql.types.StructField(_,
        org.apache.spark.sql.types.StringType, nullable = true)) ++
      fs.map(org.apache.spark.sql.types.StructField(_,
        org.apache.spark.sql.types.StringType, nullable = true)))
    // bounded chunks, not a whole-partition materialization: keys AND
    // their feature maps live only a chunk at a time (the write path's
    // streaming discipline; putAll/deleteAll take Iterators)
    val rdd = keys.select(kc.map(col): _*).distinct().rdd
      .mapPartitions { it =>
        it.map(r => kc.map(c => String.valueOf(r.getAs[Any](c))))
          .grouped(4096).flatMap { chunk =>
            val got = store.getAll(table, chunk.map(_.mkString("#")))
            chunk.iterator.zip(got.iterator).map { case (kv, (_, m)) =>
              org.apache.spark.sql.Row.fromSeq(
                kv ++ fs.map(f => m.flatMap(_.get(f)).orNull))
            }
          }
      }
    spark.createDataFrame(rdd, schema)
  }

  /** One online read-back binding: which sink serves which features
    * under which request key columns ([[readOnlineMulti]]).
    */
  final case class OnlineBinding(keyColumns: Seq[String],
      sink: OutputSink.Online, features: Seq[String])

  /** Multi-binding online read-back — J4's serving-side counterpart
    * (the [[IncrementalMaterializer.trainingSetMulti]] shape at request
    * time): ONE request frame carrying several key columns (user and
    * item of a ranking request) assembled against user-keyed AND
    * item-keyed online sinks in one call. Per binding, the distinct
    * request keys are point-read through [[readOnline]] (chunked
    * pipelined getAll) and left-joined back by the binding's key
    * columns — absent keys keep null features, request rows and
    * columns all survive. Feature names must be unique across bindings
    * and distinct from the request's own columns (refused by name —
    * a silent duplicate would emit ambiguous columns downstream).
    */
  def readOnlineMulti(requests: DataFrame,
      bindings: Seq[OnlineBinding]): DataFrame = {
    require(bindings.nonEmpty, "readOnlineMulti needs at least one binding")
    val allFeats = bindings.flatMap(_.features)
    val dups = allFeats.groupBy(identity).filter(_._2.size > 1).keys
    require(dups.isEmpty,
      s"feature name(s) ${dups.mkString(", ")} served by more than one " +
        "binding — the assembled request row would carry duplicate " +
        "columns; rename on one sink")
    val clash = allFeats.filter(requests.columns.contains)
    require(clash.isEmpty,
      s"feature name(s) ${clash.mkString(", ")} collide with request " +
        "columns — rename the request column or the served feature")
    bindings.foreach { b =>
      val missing = b.keyColumns.filterNot(requests.columns.contains)
      require(missing.isEmpty,
        s"requests are missing key column(s) ${missing.mkString(", ")} " +
          s"for the binding on table '${b.sink.tableName}'")
    }
    bindings.foldLeft(requests) { (acc, b) =>
      // readOnline returns keys as the wire's STRING encoding — join on
      // the string-cast request keys so typed request columns (longs)
      // match; the served frame's key copies are dropped after the join
      val served = readOnline(
        requests.select(b.keyColumns.map(col): _*), b.keyColumns,
        b.sink, b.features)
      val renamed = b.keyColumns.foldLeft(served)((d, c) =>
        d.withColumnRenamed(c, s"__ro_$c"))
      val cond = b.keyColumns.map(c =>
        acc(c).cast("string") <=> renamed(s"__ro_$c")).reduce(_ && _)
      acc.join(renamed, cond, "left_outer")
        .drop(b.keyColumns.map(c => s"__ro_$c"): _*)
    }
  }

  /** GDPR erasure on the ONLINE serving side: delete `keys`' rows from
    * every online sink, with the SAME key encoding the write path uses
    * (keyCols joined by '#') — the last leg of the forget cascade
    * (curation state → feature state → served features). Distributed:
    * one bulk [[OnlineStore.deleteAll]] per partition, the write
    * path's pipelining discipline. File/generic sinks are REFUSED by
    * name — offline erasure is a rewrite, owned by the merge-log /
    * store compaction paths, not a per-key mutation.
    */
  def deleteKeys(keys: DataFrame, keyColumns: Seq[String],
      sinks: Seq[OutputSink]): Unit = {
    sinks.foreach {
      case OutputSink.Generic(format, path, _, _, _) =>
        throw new IllegalArgumentException(
          s"deleteKeys cannot erase from the $format file sink at $path — " +
            "file sinks are immutable snapshots; rewrite them from the " +
            "erased upstream state (MergeLog compaction / store " +
            "forgetKeys) instead")
      case _: OutputSink.Online => ()
    }
    val kc = keyColumns
    sinks.foreach { case OutputSink.Online(table, store) =>
      keys.select(keyColumns.map(org.apache.spark.sql.functions.col): _*)
        .distinct()
        .foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
          store.deleteAll(table, rows.map(r =>
            kc.map(c => String.valueOf(r.getAs[Any](c))).mkString("#")))
        }
      case _ => ()
    }
  }

  def write(df: DataFrame, keyColumns: Seq[String], sink: OutputSink): Unit = sink match {
    case OutputSink.Generic(format, path, mode, options, numParts) =>
      val out = numParts.map(df.repartition).getOrElse(df)
      out.write.format(format).options(options).mode(mode).save(path)
    case OutputSink.Online(table, store) =>
      val keyCols = keyColumns
      val valueCols = df.columns.filterNot(keyColumns.contains).toSeq
      df.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
        // one bulk call per partition — a real store impl pipelines it.
        // SQL NULL features are OMITTED (absent hash field = null, the
        // Redis idiom) so a string feature whose legitimate value is
        // the 4-char text "null" stays distinguishable from NULL; a
        // row whose features are ALL null therefore stores nothing
        // (the same inherent hash-store limit as an empty value map).
        store.putAll(table, rows.map { r =>
          val key = keyCols.map(c => String.valueOf(r.getAs[Any](c))).mkString("#")
          val value = valueCols.flatMap(c => Option(r.getAs[Any](c))
            .map(v => c -> String.valueOf(v))).toMap
          key -> value
        })
      }
  }
}
