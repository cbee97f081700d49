package graft.project

import graft.model._
import graft.sources.Source

import scala.collection.mutable

/** A named, typed feature defined by a transformation over its anchor's
  * source, keyed by `TypedKey`s
  * (reference `AnchorFeatureImpl`, feathr-rs/src/feature.rs:213-221).
  */
case class AnchorFeature(
    name: String,
    featureType: FeatureType,
    transform: Transformation,
    keys: Seq[TypedKey]) {
  def keyAliases: Seq[String] = keys.map(_.alias)
  def isPassthrough: Boolean = keys.forall(_.isDummy)
}

/** An input to a derived feature: feature name + the key aliases it is
  * evaluated under (reference `InputFeature`, feathr-rs/src/feature.rs:292-298;
  * cross-key rebinding via as_feature/with_key python/src/lib.rs:972-993).
  */
case class InputFeature(featureName: String, keys: Seq[TypedKey])

/** Feature computed from other features, forming a DAG
  * (reference `DerivedFeatureImpl`, feathr-rs/src/feature.rs:319-328).
  */
case class DerivedFeature(
    name: String,
    featureType: FeatureType,
    transformExpr: String,
    inputs: Seq[InputFeature],
    keys: Seq[TypedKey])

/** Set of features computed from one source, sharing one key schema
  * (reference `AnchorGroupImpl`, feathr-rs/src/project.rs:600-608; the
  * same-key invariant is enforced at project.rs:501-504).
  */
case class AnchorGroup(name: String, source: Source, features: Seq[AnchorFeature]) {
  def keyAliases: Seq[String] =
    features.headOption.map(_.keyAliases).getOrElse(Nil)
}

/** Which features to attach to the observation, on which observation
  * key columns (reference `FeatureQuery`, feathr-rs/src/feature_query.rs:5-10).
  */
case class FeatureQuery(featureList: Seq[String], keyColumns: Seq[String])

/** Container of sources / anchors / derivations — the catalog the join
  * and materialization planners consume (reference `FeathrProjectImpl`,
  * feathr-rs/src/project.rs:360-372; serialized sections
  * anchors/derivations/sources project.rs:425-434).
  *
  * Validation rules mirrored from the reference:
  *  - all features in one anchor group share one key-alias schema
  *    (project.rs:501-504);
  *  - DUMMY_KEY features are only legal on INPUT_CONTEXT sources
  *    (project.rs:522-526, feature_builder.rs:75-79);
  *  - a derived feature's key aliases must be covered by its inputs'
  *    aliases (feature_builder.rs:161-186, Error::InvalidDerivedKeyAlias).
  */
class FeatureProject(val name: String) {
  private val sources = mutable.LinkedHashMap[String, Source](
    Source.INPUT_CONTEXT.name -> Source.INPUT_CONTEXT)
  private val anchorGroups = mutable.LinkedHashMap[String, AnchorGroup]()
  private val derived = mutable.LinkedHashMap[String, DerivedFeature]()
  private val aliases = mutable.LinkedHashMap[String, String]()

  /** Register an output alias for an anchor feature — the reference's
    * `as_feature` rename used with `with_key` cross-key bindings
    * (python/src/lib.rs:972-993). A feature requested under an alias
    * joins its base feature and exposes the result column as the alias,
    * so one feature can be attached multiple times under different key
    * bindings (e.g. viewer/viewee) and combined by a derived feature.
    */
  def registerAlias(alias: String, baseFeature: String): Unit = {
    require(anchorFeature(baseFeature).isDefined,
      s"alias $alias: unknown base anchor feature $baseFeature")
    aliases(alias) = baseFeature
  }
  def aliasBase(name: String): Option[String] = aliases.get(name)

  def addSource(src: Source): Source = { sources(src.name) = src; src }
  def source(name: String): Source = sources.getOrElse(name,
    throw new NoSuchElementException(s"source $name not registered"))
  def allSources: Seq[Source] = sources.values.toSeq

  def addAnchorGroup(name: String, source: Source, features: Seq[AnchorFeature]): AnchorGroup = {
    require(features.nonEmpty, s"anchor group $name has no features")
    val keySchemas = features.map(_.keyAliases).distinct
    require(keySchemas.size == 1,
      s"anchor group $name: all features must share one key schema, got $keySchemas")
    val passthrough = features.head.isPassthrough
    if (passthrough)
      require(source.isInputContext,
        s"anchor group $name: DUMMY_KEY features require INPUT_CONTEXT source")
    else
      require(!source.isInputContext || features.head.keys.nonEmpty,
        s"anchor group $name: non-passthrough features need real keys")
    if (!sources.contains(source.name)) addSource(source)
    val g = AnchorGroup(name, source, features)
    anchorGroups(name) = g
    g
  }

  def addDerived(d: DerivedFeature): DerivedFeature = {
    val inputAliases = d.inputs.flatMap(_.keys.map(_.alias)).toSet
    val bad = d.keys.map(_.alias).filterNot(a => inputAliases.contains(a) || d.keys.forall(_.isDummy))
    require(bad.isEmpty,
      s"derived ${d.name}: key aliases $bad not present in inputs (InvalidDerivedKeyAlias)")
    d.inputs.foreach { in =>
      require(featureExists(in.featureName) || derived.contains(in.featureName),
        s"derived ${d.name}: unknown input feature ${in.featureName}")
    }
    derived(d.name) = d
    d
  }

  def featureExists(name: String): Boolean =
    anchorGroups.values.exists(_.features.exists(_.name == name)) ||
      derived.contains(name) || aliases.contains(name)

  def anchorFeature(name: String): Option[(AnchorGroup, AnchorFeature)] =
    anchorGroups.values.flatMap(g => g.features.find(_.name == name).map(g -> _)).headOption

  def derivedFeature(name: String): Option[DerivedFeature] = derived.get(name)

  def groups: Seq[AnchorGroup] = anchorGroups.values.toSeq
  def derivedFeatures: Seq[DerivedFeature] = derived.values.toSeq

  /** Topologically sort the requested derived features so each is
    * computed after its inputs (SURVEY.md §2.4 J5; cycle detection
    * mirrors feature_builder.rs:161-186 error behavior).
    */
  def topoSortDerived(requested: Seq[String]): Seq[DerivedFeature] = {
    val out = mutable.LinkedHashSet[String]()
    val visiting = mutable.Set[String]()
    def visit(n: String): Unit = derived.get(n).foreach { d =>
      if (!out.contains(n)) {
        require(!visiting.contains(n), s"cycle in derived-feature DAG at $n")
        visiting += n
        d.inputs.foreach(i => visit(i.featureName))
        visiting -= n
        out += n
      }
    }
    requested.foreach(visit)
    out.toSeq.map(derived)
  }

  /** Expand a requested feature list to the anchor features that must
    * be joined first, as (outputName, baseFeature) pairs — outputName
    * differs from baseFeature for aliases. Derived-feature inputs that
    * appear in `providedElsewhere` (another query's feature list) are
    * skipped: their own query joins them under its key binding.
    */
  def requiredAnchorFeatures(
      requested: Seq[String],
      providedElsewhere: Set[String] = Set.empty): Seq[(String, String)] = {
    val anchored = mutable.LinkedHashMap[String, String]()
    def walk(n: String, top: Boolean): Unit =
      if (top || !providedElsewhere.contains(n)) derived.get(n) match {
        case Some(d) => d.inputs.foreach(i => walk(i.featureName, top = false))
        case None =>
          val base = aliases.getOrElse(n, n)
          if (anchorFeature(base).isDefined) anchored(n) = base
          else throw new NoSuchElementException(s"unknown feature $n")
      }
    requested.foreach(walk(_, top = true))
    anchored.toSeq
  }
}

object FeatureProject {
  def apply(name: String): FeatureProject = new FeatureProject(name)
}
