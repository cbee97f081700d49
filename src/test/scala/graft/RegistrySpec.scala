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

  test("R2: lineage BFS reaches anchor features downstream of the workspace") {
    val (_, registry) = LineageLoader.load(sampleJson)
    val ws = registry.allEntities.find(_.typeName == EntityType.Workspace).get
    val (down, _) = registry.lineage(ws.guid, downstream = true)
    assert(down.count(_.typeName == EntityType.AnchorFeature) == 6)
    val af = registry.allEntities.find(_.typeName == EntityType.AnchorFeature).get
    val (up, _) = registry.lineage(af.guid, downstream = false)
    assert(up.exists(_.typeName == EntityType.Workspace))
  }
}
