package graft

import graft.registry._
import graft.model._
import org.scalatest.funsuite.AnyFunSuite

/** Registry-lite (SURVEY §2.9 R1/R2/R6) against the reference's own
  * lineage fixture (registry/test-data/sample.json).
  */
class RegistrySpec extends AnyFunSuite {

  private lazy val sampleJson = new String(java.nio.file.Files.readAllBytes(
    java.nio.file.Paths.get("/root/reference/registry/test-data/sample.json")), "UTF-8")

  test("versioned name parsing (registry.rs:272-301)") {
    assert(VersionedName.parse("f") == VersionedName("f", None))
    assert(VersionedName.parse("f:latest") == VersionedName("f", None))
    assert(VersionedName.parse("f:3") == VersionedName("f", Some(3)))
    intercept[IllegalArgumentException](VersionedName.parse("f:abc"))
  }

  test("CRUD + versioning: same qualifiedName bumps version; resolve finds latest") {
    val r = new InMemoryRegistry
    val v1 = r.create(RegistryEntity("g1", EntityType.Source, "src", "p__src"))
    val v2 = r.create(RegistryEntity("g2", EntityType.Source, "src", "p__src"))
    assert(v1.version == 1 && v2.version == 2)
    assert(r.resolve("src").map(_.guid).contains("g2"))
    assert(r.resolve("src:1").map(_.guid).contains("g1"))
    r.delete("g2")
    assert(r.resolve("src").map(_.guid).contains("g1"))
  }

  test("R6: project reconstruction from the reference lineage payload") {
    val (project, registry) = LineageLoader.load(sampleJson, "nyc")
    // sample.json: 2 sources, 2 anchors (4 passthrough + 2 agg features), 3 derived
    assert(project.groups.size == 2)
    assert(project.groups.map(_.features.size).sum == 6)
    assert(project.derivedFeatures.size == 3)
    // the agg feature round-trips its window spec
    val (_, aggFeat) = project.anchorFeature("f_location_avg_fare").get
    aggFeat.transform match {
      case Transformation.WindowAgg(defExpr, Aggregation.AVG, w, _, _, _) =>
        assert(defExpr == "cast_float(fare_amount)")
        assert(w.toDays == 90)
      case other => fail(s"unexpected transform $other")
    }
    // keys survive with the numeric type alias decoded (INT32 = "2")
    assert(aggFeat.keys.head.keyColumn == "DOLocationID")
    assert(aggFeat.keys.head.keyColumnType == ValueType.INT32)
    // derived DAG resolves and topo-sorts
    val order = project.topoSortDerived(project.derivedFeatures.map(_.name))
    assert(order.size == 3)
    // registry graph loaded: entities + edges present
    assert(registry.allEntities.size == 14)
    assert(registry.allEdges.nonEmpty)
  }

  test("lineage export round-trips through the loader") {
    import graft.project._
    import graft.sources._
    val p = FeatureProject("rt")
    val key = TypedKey("user_id", ValueType.INT64, Some("user_id"))
    p.addAnchorGroup("a1", Source("ev", DataLocation.Hdfs("/data/events.parquet"),
      timeWindow = Some(TimeWindowParameters("ts", "epoch"))), Seq(
      AnchorFeature("f_sum", FeatureType.DOUBLE,
        Transformation.WindowAgg("value", Aggregation.SUM,
          Durations.parse("90d"), filter = Some("value > 0"), limit = Some(10)),
        Seq(key)),
      AnchorFeature("f_raw", FeatureType.FLOAT,
        Transformation.Expr("cast_float(value)"), Seq(key))))
    p.addDerived(DerivedFeature("f_double", FeatureType.DOUBLE, "f_raw * 2",
      Seq(InputFeature("f_raw", Seq(key))), Seq(key)))
    p.addDerived(DerivedFeature("f_quad", FeatureType.DOUBLE, "f_double * 2",
      Seq(InputFeature("f_double", Seq(key))), Seq(key)))

    val json = LineageExporter.toJson(p)
    val (p2, reg2) = LineageLoader.load(json, "rt")
    assert(p2.groups.map(_.name) == Seq("a1"))
    assert(p2.groups.head.features.map(_.name).toSet == Set("f_sum", "f_raw"))
    assert(p2.derivedFeatures.map(_.name).toSet == Set("f_double", "f_quad"))
    val f = p2.anchorFeature("f_sum").get._2
    f.transform match {
      case Transformation.WindowAgg(d, Aggregation.SUM, w, g, flt, lim) =>
        assert(d == "value" && w.toDays == 90)
        assert(flt.contains("value > 0") && lim.contains(10) && g.isEmpty)
      case other => fail(s"unexpected $other")
    }
    assert(p2.groups.head.source.timeWindow.contains(TimeWindowParameters("ts", "epoch")))
    assert(p2.anchorFeature("f_raw").get._2.featureType == FeatureType.FLOAT)
    // exported graph supports lineage traversal too
    val ws = reg2.allEntities.find(_.typeName == EntityType.Workspace).get
    assert(reg2.lineage(ws.guid, downstream = true)._1.size > 4)
  }

  test("R2: lineage BFS reaches anchor features downstream of the workspace") {
    val (_, registry) = LineageLoader.load(sampleJson)
    val ws = registry.allEntities.find(_.typeName == EntityType.Workspace).get
    val (down, _) = registry.lineage(ws.guid, downstream = true)
    assert(down.count(_.typeName == EntityType.AnchorFeature) == 6)
    val af = registry.allEntities.find(_.typeName == EntityType.AnchorFeature).get
    val (up, _) = registry.lineage(af.guid, downstream = false)
    assert(up.exists(_.typeName == EntityType.Workspace))
  }

  test("R3: full-text search ranks, filters by type and scope, pages") {
    val r = new InMemoryRegistry
    val ws = r.create(RegistryEntity("g0", EntityType.Workspace, "proj", "proj"))
    val f1 = r.create(RegistryEntity("g1", EntityType.AnchorFeature,
      "user_purchase_sum", "proj__user_purchase_sum",
      attributes = Map("description" -> "total purchase value per user")))
    val f2 = r.create(RegistryEntity("g2", EntityType.AnchorFeature,
      "user_click_count", "proj__user_click_count",
      attributes = Map("description" -> "click events per user")))
    val s1 = r.create(RegistryEntity("g3", EntityType.Source,
      "purchase_events", "proj__purchase_events"))
    r.link("g1", "g0", EdgeType.BelongsTo)
    r.link("g2", "g0", EdgeType.BelongsTo)

    // ranking is by NAME alone (reference fts.rs:241-246 orders
    // TopDocs by the name_score fast field, never by relevance):
    // every term-matching entity returns, alphanumeric name ascending
    val byName = r.search("user purchase")
    assert(byName.map(_.guid) == Seq("g3", "g2", "g1"),
      s"expected name-ordered [g3, g2, g1], got ${byName.map(_.guid)}")
    // body (attributes) is searchable; "events" also hits g3's name,
    // which sorts first
    assert(r.search("click events").map(_.guid) == Seq("g3", "g2"))
    // type filter
    assert(r.search("purchase", types = Set(EntityType.Source)).map(_.guid) == Seq("g3"))
    // scope filter: only entities BelongsTo proj (s1 has no edge)
    assert(!r.search("purchase", scope = Some("proj")).exists(_.guid == "g3"))
    assert(r.search("purchase", scope = Some("proj")).exists(_.guid == "g1"))
    // paging
    val all = r.search("user")
    assert(r.search("user", limit = 1) == all.take(1))
    assert(r.search("user", limit = 1, offset = 1) == all.slice(1, 2))
    // deletion drops the entity from the index
    r.delete("g1")
    assert(!r.search("purchase").exists(_.guid == "g1"))
    assert(ws.guid == "g0" && f1.version == 1 && f2.version == 1)
  }
}
