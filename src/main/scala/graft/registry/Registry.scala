package graft.registry

import graft.model._
import graft.project._
import graft.sources._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** Registry entity types (reference registry-provider entity model,
  * registry/registry-provider/src/models/entity.rs:50-62).
  */
object EntityType {
  val Workspace = "feathr_workspace_v1"
  val Source = "feathr_source_v1"
  val Anchor = "feathr_anchor_v1"
  val AnchorFeature = "feathr_anchor_feature_v1"
  val DerivedFeature = "feathr_derived_feature_v1"
}

/** Edge types (edge.rs:8-19). */
object EdgeType {
  val BelongsTo = "BelongsTo"
  val Contains = "Contains"
  val Consumes = "Consumes"
  val Produces = "Produces"
}

case class RegistryEntity(
    guid: String,
    typeName: String,
    name: String,
    qualifiedName: String,
    version: Int = 1,
    attributes: Map[String, String] = Map.empty)

case class RegistryEdge(from: String, to: String, edgeType: String)

/** `name`, `name:latest`, or `name:3`
  * (reference registry.rs:272-301 version parsing).
  */
case class VersionedName(name: String, version: Option[Int])
object VersionedName {
  def parse(s: String): VersionedName = s.split(":", 2) match {
    case Array(n) => VersionedName(n, None)
    case Array(n, "latest") => VersionedName(n, None)
    case Array(n, v) if v.forall(_.isDigit) && v.nonEmpty => VersionedName(n, Some(v.toInt))
    case _ => throw new IllegalArgumentException(s"bad versioned name: $s")
  }
}

/** In-memory feature-metadata catalog: CRUD + versioning (R1), lineage
  * BFS (R2). The reference backs this with SQL/Raft + REST
  * (registry/sql-provider, registry/raft-registry); the engine only
  * needs the in-process graph semantics.
  */
class InMemoryRegistry {
  private val entities = mutable.LinkedHashMap[String, RegistryEntity]()
  private val edges = mutable.ArrayBuffer[RegistryEdge]()
  // R3 full-text search: inverted token index maintained on CRUD
  private val index = mutable.HashMap[String, mutable.LinkedHashSet[String]]()

  def create(e: RegistryEntity): RegistryEntity = {
    // same qualifiedName => new version (registry.rs:11-25 semantics)
    val prior = entities.values.filter(_.qualifiedName == e.qualifiedName)
    val versioned = e.copy(version = prior.map(_.version).maxOption.getOrElse(0) + 1)
    entities(versioned.guid) = versioned
    docTerms(versioned).foreach(t =>
      index.getOrElseUpdate(t, mutable.LinkedHashSet.empty) += versioned.guid)
    versioned
  }

  /** Insert a persisted entity verbatim, version preserved (the load
    * path of [[RegistryPersistence]] — `create` would re-version
    * same-qualifiedName rows as it replayed them).
    */
  def loadEntity(e: RegistryEntity): Unit = {
    entities(e.guid) = e
    docTerms(e).foreach(t =>
      index.getOrElseUpdate(t, mutable.LinkedHashSet.empty) += e.guid)
  }

  def get(guid: String): Option[RegistryEntity] = entities.get(guid)

  /** Resolve `name`, `name:latest`, or `name:N` to an entity. */
  def resolve(versionedName: String): Option[RegistryEntity] = {
    val vn = VersionedName.parse(versionedName)
    val matches = entities.values.filter(e =>
      e.name == vn.name || e.qualifiedName == vn.name)
    vn.version match {
      case Some(v) => matches.find(_.version == v)
      case None => matches.toSeq.sortBy(_.version).lastOption
    }
  }

  def delete(guid: String): Unit = {
    entities.remove(guid)
    edges.filterInPlace(e => e.from != guid && e.to != guid)
    index.valuesIterator.foreach(_ -= guid)
  }

  // ------------------------------------------------------- R3: search

  /** Lowercased alphanumeric tokens — the searchable terms. */
  private def tokenize(s: String): Seq[String] =
    s.toLowerCase.split("[^a-z0-9]+").iterator.filter(_.nonEmpty).toSeq

  /** Index/query terms: tokenized then Porter-stemmed — the
    * reference's `en_stem` tokenizer on name and body (fts.rs:94-96),
    * so "events" matches "event" and "normalization" matches
    * "normalize" from either side. `nameScore` stays on RAW tokens:
    * the reference's str_score reads the name's characters, not its
    * stemmed terms (fts.rs:24-48,154).
    */
  private def terms(s: String): Seq[String] =
    tokenize(s).map(PorterStemmer.stem)

  /** Indexed fields mirror the reference's doc: name + id + body
    * (attributes) (registry/sql-provider/src/fts.rs:148-156).
    */
  private def docTerms(e: RegistryEntity): Seq[String] =
    (terms(e.name) ++ terms(e.qualifiedName) ++
      e.attributes.valuesIterator.flatMap(terms)).distinct

  /** Rank score: first 12 alphanumeric chars base-36, ZERO-PADDED to
    * exactly 12 digits — the reference's `str_score` (fts.rs:24-48)
    * chains a [0;12] fill before `take(12)`, so "ab" compares as
    * `ab0000000000` and sorts BEFORE "b" (positional, not magnitude —
    * an unpadded fold would order them the other way).
    */
  private def nameScore(name: String): Long = {
    val ds = tokenize(name).mkString.take(12)
      .map(c => if (c.isDigit) c - '0' else c - 'a' + 10)
    (ds ++ Seq.fill(12 - ds.length)(0)).foldLeft(0L)(_ * 36 + _)
  }

  /** R3 full-text search (reference fts.rs:59-260 semantics): OR over
    * query terms for MEMBERSHIP (Tantivy's QueryParser default is
    * disjunction), but ranking is by `name_score` ALONE —
    * `TopDocs...order_by_u64_field(name_score)` (fts.rs:241-246), i.e.
    * alphanumeric name ascending regardless of how many terms matched;
    * ties by full name. Non-alphanumeric query characters are inert
    * (the reference strips `:+()[]{}` / AND / OR / TO via its cleaner
    * regex on parse failure, fts.rs:133-135,200-205 — tokenize drops
    * them up front). Optional entity-type filter (exact term,
    * fts.rs:220-239); optional scope = restrict to entities with a
    * `BelongsTo` edge to the named scope entity (or the scope entity
    * itself); limit/offset paging. Terms are Porter-stemmed on both
    * sides mirroring `en_stem` (the reference stems with Snowball
    * English — identical on regular inflections, minor divergences on
    * exotic forms; [[PorterStemmer]]).
    */
  def search(q: String, types: Set[String] = Set.empty,
      scope: Option[String] = None, limit: Int = 10, offset: Int = 0): Seq[RegistryEntity] = {
    // membership only: any term hit qualifies, and ranking never reads
    // relevance (the reference orders purely by name_score)
    val qTerms = terms(q).distinct
    val hits = mutable.LinkedHashSet[String]()
    qTerms.foreach(t =>
      index.getOrElse(t, mutable.LinkedHashSet.empty).foreach(hits += _))
    val scopeGuids: Option[Set[String]] = scope.map { s =>
      entities.values.filter(e => e.qualifiedName == s || e.name == s)
        .map(_.guid).toSet
    }
    hits.toSeq
      .flatMap(entities.get)
      .filter(e => types.isEmpty || types.contains(e.typeName))
      .filter(e => scopeGuids.forall(sg =>
        sg.contains(e.guid) ||
          edges.exists(ed => ed.from == e.guid && sg.contains(ed.to) &&
            ed.edgeType == EdgeType.BelongsTo)))
      .sortBy(e => (nameScore(e.name), e.name))
      .slice(offset, offset + limit)
  }

  def link(from: String, to: String, edgeType: String): Unit =
    edges += RegistryEdge(from, to, edgeType)

  def allEntities: Seq[RegistryEntity] = entities.values.toSeq
  def allEdges: Seq[RegistryEdge] = edges.toSeq

  /** Lineage BFS (R2, registry.rs:83-88,249-270): `downstream` follows
    * from→to edges, upstream the reverse. Returns entities at ≤ depth
    * hops plus the traversed edges.
    */
  def lineage(startGuid: String, downstream: Boolean, maxDepth: Int = Int.MaxValue)
      : (Seq[RegistryEntity], Seq[RegistryEdge]) = {
    val seen = mutable.LinkedHashSet(startGuid)
    val usedEdges = mutable.ArrayBuffer[RegistryEdge]()
    var frontier = Set(startGuid)
    var depth = 0
    while (frontier.nonEmpty && depth < maxDepth) {
      val next = mutable.Set[String]()
      for (e <- edges) {
        val (src, dst) = if (downstream) (e.from, e.to) else (e.to, e.from)
        if (frontier.contains(src) && !seen.contains(dst)) {
          next += dst; seen += dst; usedEdges += e
        }
      }
      frontier = next.toSet
      depth += 1
    }
    (seen.toSeq.flatMap(entities.get), usedEdges.toSeq)
  }
}

/** Serialize a [[FeatureProject]] to the reference registry's
  * `EntityLineage` JSON shape (`guidEntityMap` + `relations`), the
  * inverse of [[LineageLoader.load]] — deterministic GUIDs derived from
  * qualified names so export is stable across runs.
  */
object LineageExporter {
  private val mapper = new ObjectMapper()

  private def guidOf(qualifiedName: String): String =
    java.util.UUID.nameUUIDFromBytes(qualifiedName.getBytes("UTF-8")).toString

  private def typeNode(t: FeatureType) = {
    val n = mapper.createObjectNode()
    n.put("type", "TENSOR")
    n.put("tensorCategory",
      if (t.tensorCategory == TensorCategory.SPARSE) "SPARSE" else "DENSE")
    val d = n.putArray("dimensionType")
    t.dimensionType.foreach(v => d.add(v.name))
    n.put("valType", t.valType.name)
    n
  }

  private def keyArray(keys: Seq[TypedKey]) = {
    val arr = mapper.createArrayNode()
    keys.foreach { k =>
      val n = arr.addObject()
      n.put("key_column", k.keyColumn)
      n.put("key_column_type", k.keyColumnType.name)
      n.put("key_column_alias", k.alias)
      k.fullName.foreach(n.put("full_name", _))
      k.description.foreach(n.put("description", _))
    }
    arr
  }

  private def transformNode(t: Transformation) = {
    val n = mapper.createObjectNode()
    t match {
      case Transformation.Expr(e) => n.put("transform_expr", e)
      case Transformation.Udf(name) => n.put("name", name)
      case Transformation.WindowAgg(defExpr, agg, w, groupBy, filter, limit) =>
        n.put("def_expr", defExpr)
        n.put("agg_func", agg.toString)
        n.put("window", Durations.format(w))
        groupBy.foreach(n.put("group_by", _))
        filter.foreach(n.put("filter", _))
        limit.foreach(n.put("limit", _))
    }
    n
  }

  def toJson(project: FeatureProject): String = {
    val root = mapper.createObjectNode()
    val projectQn = project.name
    root.put("baseEntityGuid", guidOf(projectQn))
    val guidMap = root.putObject("guidEntityMap")
    val relations = root.putArray("relations")

    def entity(typeName: String, qn: String, name: String): com.fasterxml.jackson.databind.node.ObjectNode = {
      val e = guidMap.putObject(guidOf(qn))
      e.put("typeName", typeName)
      e.put("guid", guidOf(qn))
      e.put("status", "ACTIVE")
      e.put("displayText", name)
      val a = e.putObject("attributes")
      a.put("qualifiedName", qn)
      a.put("name", name)
      a
    }
    def ref(qn: String, typeName: String) = {
      val r = mapper.createObjectNode()
      r.put("guid", guidOf(qn))
      r.put("typeName", typeName)
      r.putObject("uniqueAttributes").put("qualifiedName", qn)
      r
    }
    def relate(fromQn: String, toQn: String, relType: String): Unit = {
      val r = relations.addObject()
      r.put("fromEntityId", guidOf(fromQn))
      r.put("toEntityId", guidOf(toQn))
      r.put("relationshipType", relType)
      r.put("relationshipId", "00000000-0000-0000-0000-000000000000")
    }

    val ws = entity(EntityType.Workspace, projectQn, project.name)
    val wsAnchors = ws.putArray("anchor_features")
    val wsDerived = ws.putArray("derived_features")

    project.allSources.filterNot(_.isInputContext).foreach { s =>
      val qn = s"${projectQn}__${s.name}"
      val a = entity(EntityType.Source, qn, s.name)
      s.location match {
        case DataLocation.Hdfs(path, _, _) => a.put("path", path); a.put("type", "hdfs")
        case other => a.put("path", other.toString); a.put("type", "generic")
      }
      s.timeWindow.foreach { tw =>
        a.put("event_timestamp_column", tw.timestampColumn)
        a.put("timestamp_format", tw.timestampColumnFormat)
      }
      relate(projectQn, qn, EdgeType.Contains)
    }
    // INPUT_CONTEXT passthrough source entity (as the reference emits)
    val pQn = s"${projectQn}__PASSTHROUGH"
    locally {
      val a = entity(EntityType.Source, pQn, "PASSTHROUGH")
      a.put("path", "PASSTHROUGH"); a.put("type", "PASSTHROUGH")
      relate(projectQn, pQn, EdgeType.Contains)
    }

    project.groups.foreach { g =>
      val gQn = s"${projectQn}__${g.name}"
      val ga = entity(EntityType.Anchor, gQn, g.name)
      val srcQn = if (g.source.isInputContext) pQn else s"${projectQn}__${g.source.name}"
      ga.set[JsonNode]("source", ref(srcQn, EntityType.Source))
      val featArr = ga.putArray("features")
      wsAnchors.add(ref(gQn, EntityType.Anchor))
      relate(projectQn, gQn, EdgeType.Contains)
      relate(gQn, srcQn, EdgeType.Consumes)
      g.features.foreach { f =>
        val fQn = s"${gQn}__${f.name}"
        val fa = entity(EntityType.AnchorFeature, fQn, f.name)
        fa.set[JsonNode]("type", typeNode(f.featureType))
        fa.set[JsonNode]("transformation", transformNode(f.transform))
        fa.set[JsonNode]("key", keyArray(f.keys))
        featArr.add(ref(fQn, EntityType.AnchorFeature))
        relate(gQn, fQn, EdgeType.Contains)
      }
    }

    def anchorFeatureQn(name: String): String =
      project.anchorFeature(name)
        .map { case (g, _) => s"${projectQn}__${g.name}__$name" }
        .getOrElse(s"${projectQn}__$name")

    project.derivedFeatures.foreach { d =>
      val dQn = s"${projectQn}__${d.name}"
      val da = entity(EntityType.DerivedFeature, dQn, d.name)
      da.set[JsonNode]("type", typeNode(d.featureType))
      da.set[JsonNode]("transformation",
        transformNode(Transformation.Expr(d.transformExpr)))
      da.set[JsonNode]("key", keyArray(d.keys))
      val anchorIn = da.putArray("input_anchor_features")
      val derivedIn = da.putArray("input_derived_features")
      d.inputs.foreach { in =>
        if (project.derivedFeature(in.featureName).isDefined) {
          derivedIn.add(ref(s"${projectQn}__${in.featureName}", EntityType.DerivedFeature))
          relate(dQn, s"${projectQn}__${in.featureName}", EdgeType.Consumes)
        } else {
          anchorIn.add(ref(anchorFeatureQn(in.featureName), EntityType.AnchorFeature))
          relate(dQn, anchorFeatureQn(in.featureName), EdgeType.Consumes)
        }
      }
      wsDerived.add(ref(dQn, EntityType.DerivedFeature))
      relate(projectQn, dQn, EdgeType.Contains)
    }
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }
}

/** R6: reconstruct a [[FeatureProject]] (and a populated
  * [[InMemoryRegistry]]) from the reference registry's `EntityLineage`
  * JSON payload (`guidEntityMap` + `relations`) — format per
  * `registry/test-data/sample.json`, reconstruction semantics per
  * `feathr-rs/src/project.rs:742-847`.
  */
object LineageLoader {
  private val mapper = new ObjectMapper()

  private def valueType(s: String): ValueType = s match {
    // numeric serde aliases (registry attributes.rs:7-24)
    case "0" => ValueType.UNSPECIFIED
    case "1" => ValueType.BOOL
    case "2" => ValueType.INT32
    case "3" => ValueType.INT64
    case "4" => ValueType.FLOAT
    case "5" => ValueType.DOUBLE
    case "6" => ValueType.STRING
    case "7" => ValueType.BYTES
    case other => ValueType.parse(other)
  }

  private def featureType(n: JsonNode): FeatureType = {
    if (n == null || n.isNull) return FeatureType.UNSPECIFIED
    val cat = if (n.path("tensorCategory").asText("DENSE") == "SPARSE")
      TensorCategory.SPARSE else TensorCategory.DENSE
    val dims = n.path("dimensionType").elements().asScala
      .map(d => valueType(d.asText)).toSeq
    FeatureType(cat, dims, valueType(n.path("valType").asText("UNSPECIFIED")))
  }

  private def typedKeys(n: JsonNode): Seq[TypedKey] =
    n.elements().asScala.map { k =>
      TypedKey(
        keyColumn = k.path("key_column").asText,
        keyColumnType = valueType(k.path("key_column_type").asText("UNSPECIFIED")),
        keyColumnAlias = Option(k.path("key_column_alias").asText(null)),
        fullName = Option(k.path("full_name").asText(null)),
        description = Option(k.path("description").asText(null)))
    }.toSeq

  private def transformation(n: JsonNode): Transformation = {
    if (n.has("agg_func") && !n.path("agg_func").isNull) {
      Transformation.WindowAgg(
        defExpr = n.path("def_expr").asText,
        aggFunc = Aggregation.parse(n.path("agg_func").asText),
        window = Durations.parse(n.path("window").asText),
        groupBy = Option(n.path("group_by").asText(null)).filter(_.nonEmpty),
        filter = Option(n.path("filter").asText(null)).filter(_.nonEmpty),
        limit = Option(n.path("limit")).filter(x => x.isInt).map(_.asInt))
    } else if (n.has("transform_expr")) {
      Transformation.Expr(n.path("transform_expr").asText)
    } else if (n.has("name")) {
      Transformation.Udf(n.path("name").asText)
    } else Transformation.Expr("*")
  }

  private def sourceFrom(attrs: JsonNode): Source = {
    val name = attrs.path("name").asText
    val path = attrs.path("path").asText
    val loc =
      if (name == "PASSTHROUGH" || path == "PASSTHROUGH") DataLocation.InputContext
      else DataLocation.Hdfs(path)
    val tw = Option(attrs.path("event_timestamp_column").asText(null))
      .filter(_.nonEmpty)
      .map(c => TimeWindowParameters(c,
        attrs.path("timestamp_format").asText("epoch")))
    Source(name, loc, tw, preprocessing = None)
  }

  /** Parse a lineage payload into (project, registry). */
  def load(json: String, projectName: String = "loaded"): (FeatureProject, InMemoryRegistry) = {
    val root = mapper.readTree(json)
    val guidMap = root.path("guidEntityMap")
    val registry = new InMemoryRegistry
    val project = FeatureProject(projectName)

    val byGuid = guidMap.properties().asScala.map(e => e.getKey -> e.getValue).toMap
    byGuid.foreach { case (guid, ent) =>
      val attrs = ent.path("attributes")
      registry.create(RegistryEntity(
        guid = guid,
        typeName = ent.path("typeName").asText,
        name = attrs.path("name").asText,
        qualifiedName = attrs.path("qualifiedName").asText))
    }
    root.path("relations").elements().asScala.foreach { r =>
      registry.link(r.path("fromEntityId").asText, r.path("toEntityId").asText,
        r.path("relationshipType").asText)
    }

    val sources = byGuid.collect {
      case (guid, ent) if ent.path("typeName").asText == EntityType.Source =>
        guid -> project.addSource(sourceFrom(ent.path("attributes")))
    }

    // anchors: features listed inline; source referenced by guid
    byGuid.values.filter(_.path("typeName").asText == EntityType.Anchor).foreach { anchor =>
      val attrs = anchor.path("attributes")
      val src = sources.getOrElse(attrs.path("source").path("guid").asText,
        Source.INPUT_CONTEXT)
      val feats = attrs.path("features").elements().asScala.map { ref =>
        val f = byGuid(ref.path("guid").asText)
        val fa = f.path("attributes")
        AnchorFeature(
          name = fa.path("name").asText,
          featureType = featureType(fa.path("type")),
          transform = transformation(fa.path("transformation")),
          keys = typedKeys(fa.path("key")))
      }.toSeq
      project.addAnchorGroup(attrs.path("name").asText, src, feats)
    }

    // derived features: topo-insert until fixpoint (inputs may be other
    // derived features, feature.rs:319-328)
    var pending = byGuid.values
      .filter(_.path("typeName").asText == EntityType.DerivedFeature).toSeq
    var progressed = true
    while (pending.nonEmpty && progressed) {
      progressed = false
      val (ready, notReady) = pending.partition { d =>
        val fa = d.path("attributes")
        (fa.path("input_anchor_features").elements().asScala ++
         fa.path("input_derived_features").elements().asScala)
          .forall { ref =>
            val name = byGuid.get(ref.path("guid").asText)
              .map(_.path("attributes").path("name").asText).getOrElse("")
            project.featureExists(name)
          }
      }
      ready.foreach { d =>
        val fa = d.path("attributes")
        val inputs = (fa.path("input_anchor_features").elements().asScala ++
          fa.path("input_derived_features").elements().asScala).map { ref =>
          val in = byGuid(ref.path("guid").asText).path("attributes")
          InputFeature(in.path("name").asText, typedKeys(in.path("key")))
        }.toSeq
        project.addDerived(DerivedFeature(
          name = fa.path("name").asText,
          featureType = featureType(fa.path("type")),
          transformExpr = transformation(fa.path("transformation")) match {
            case Transformation.Expr(e) => e
            case other => throw new IllegalArgumentException(
              s"derived feature must be an expression, got $other")
          },
          inputs = inputs,
          keys = typedKeys(fa.path("key"))))
        progressed = true
      }
      pending = notReady
    }
    require(pending.isEmpty,
      s"unresolvable derived features: ${pending.map(_.path("attributes").path("name").asText)}")
    (project, registry)
  }
}
