package graft

import graft.model._
import graft.operators._
import graft.project._
import graft.sources._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** In-process replacement for the reference's submit-to-remote-Spark
  * client path (SURVEY.md §3.1 steps 2-5 collapsed): parse DSL → feature
  * DAG → one Catalyst plan, lazily executed at the sink write.
  */
object FeathrClient {

  /** `get_offline_features` (python/src/lib.rs:1538-1595): PIT join of
    * the requested features onto the observation.
    */
  def getOfflineFeatures(
      spark: SparkSession,
      project: FeatureProject,
      observation: ObservationSettings,
      queries: Seq[FeatureQuery]): DataFrame = {
    val obsDf = SourceResolver.read(spark, observation.location)
    joinFeatures(spark, project, obsDf, observation.timestampColumn
      .map(c => (c, observation.timestampFormat)), queries)
  }

  /** Same, with a caller-supplied observation DataFrame. */
  def joinFeatures(
      spark: SparkSession,
      project: FeatureProject,
      observation: DataFrame,
      obsTime: Option[(String, String)],
      queries: Seq[FeatureQuery]): DataFrame =
    PointInTimeJoin.run(spark, project, observation, obsTime, queries)

  /** `materialize_features` (python/src/lib.rs:1656-1742): all steps in
    * one plan, each row stamped with its `__step_end`.
    */
  def materializeFeatures(
      spark: SparkSession,
      project: FeatureProject,
      features: Seq[String],
      keyColumns: Seq[String],
      start: java.time.Instant,
      end: java.time.Instant,
      resolution: DateTimeResolution,
      sinks: Seq[OutputSink]): DataFrame =
    Materializer.backfill(spark, project, features, keyColumns, start, end, resolution, sinks)

  /** Serving-side online read — the natural complement of the
    * reference's online SINK (it configures the Redis write path,
    * feathr-rs/src/job_client/mod.rs:494, and leaves reads to the
    * serving client): point-read the requested features for a batch of
    * keys from an online sink, i.e. read back what
    * [[materializeFeatures]] published. Values are the store's wire
    * strings; absent keys carry null features
    * ([[Materializer.readOnline]]).
    */
  def getOnlineFeatures(
      keys: DataFrame,
      keyColumns: Seq[String],
      sink: OutputSink.Online,
      features: Seq[String]): DataFrame =
    Materializer.readOnline(keys, keyColumns, sink, features)

  /** Multi-binding online read — ONE request frame (user and item key
    * columns of a ranking request) assembled against user-keyed AND
    * item-keyed online sinks in one call: the serving-side counterpart
    * of the multi-key training join (J4), see
    * [[Materializer.readOnlineMulti]].
    */
  def getOnlineFeaturesMulti(
      requests: DataFrame,
      bindings: Seq[Materializer.OnlineBinding]): DataFrame =
    Materializer.readOnlineMulti(requests, bindings)
}
