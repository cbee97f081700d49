package graft

import graft.registry._
import org.scalatest.funsuite.AnyFunSuite

/** R5-lite: the catalog round-trips through the reference's SQL
  * relations (entities/edges/userroles, registry/scripts/mssql.sql)
  * on embedded Derby, and a re-save REPLACES the snapshot.
  */
class SqlRegistryStoreSpec extends AnyFunSuite {

  private val alice = Credential.User("alice")
  private val bob = Credential.User("bob")
  private val proj = Resource.NamedEntity("projA")

  private def rec(c: Credential, r: Resource, p: Permission,
      by: Credential = alice, reason: String = "test"): RbacRecord =
    RbacRecord(c, r, p, by, reason, 1700000000000L)

  private var n = 0
  private def freshUrl(): String = {
    n += 1
    s"jdbc:derby:memory:sqlreg_${System.nanoTime()}_$n;create=true"
  }

  test("entities + edges + grants round-trip through the SQL relations") {
    val reg = new InMemoryRegistry
    reg.create(RegistryEntity("g1", EntityType.Workspace, "projA", "projA"))
    val e2 = reg.create(RegistryEntity("g2", EntityType.AnchorFeature,
      "f_x", "projA__anchor__f_x", attributes = Map("type" -> "DOUBLE")))
    val e2v2 = reg.create(RegistryEntity("g3", EntityType.AnchorFeature,
      "f_x", "projA__anchor__f_x"))
    assert(e2.version == 1 && e2v2.version == 2)
    reg.link("g2", "g1", EdgeType.BelongsTo)
    val rbac = new InMemoryRbac
    rbac.loadPermissions(Seq(
      rec(alice, Resource.Global, Permission.Admin, reason = "boot"),
      rec(bob, proj, Permission.Read)))

    val url = freshUrl()
    SqlRegistryStore.save(reg, rbac, url)
    val (reg2, rbac2) = SqlRegistryStore.load(url)

    assert(reg2.allEntities.toSet == reg.allEntities.toSet)
    assert(reg2.allEdges.toSet == reg.allEdges.toSet)
    assert(reg2.resolve("f_x").map(_.guid).contains("g3")) // latest
    assert(reg2.resolve("f_x:1").map(_.guid).contains("g2"))
    assert(reg2.search("f_x").nonEmpty) // FTS index rebuilt on load
    assert(rbac2.getPermissions.toSet == rbac.getPermissions.toSet)
    assert(rbac2.checkPermission(alice, proj, Permission.Admin))

    // the physical layout is the reference DDL's: content rides as
    // JSON in entity_content keyed by entity_id
    val c = java.sql.DriverManager.getConnection(url)
    try {
      val rs = c.createStatement().executeQuery(
        "select entity_content from entities where entity_id = 'g2'")
      assert(rs.next())
      val content = rs.getString(1)
      assert(content.contains("\"qualifiedName\":\"projA__anchor__f_x\"") &&
        content.contains("\"type\":\"DOUBLE\""), content)
    } finally c.close()
  }

  test("re-save replaces the snapshot; UUID-named project keeps its kind") {
    val url = freshUrl()
    val reg = new InMemoryRegistry
    reg.create(RegistryEntity("g1", EntityType.Workspace, "old", "old"))
    val rbac = new InMemoryRbac
    rbac.loadPermissions(Seq(rec(alice, Resource.Global, Permission.Admin)))
    SqlRegistryStore.save(reg, rbac, url)

    // second catalog state: g1 gone, g9 present, an extra grant on a
    // project NAMED like a UUID (the kind discriminator must survive)
    val uuidName = "123e4567-e89b-12d3-a456-426614174000"
    val reg2 = new InMemoryRegistry
    reg2.create(RegistryEntity("g9", EntityType.Workspace, "new", "new"))
    val rbac2 = new InMemoryRbac
    rbac2.loadPermissions(Seq(
      rec(alice, Resource.Global, Permission.Admin),
      rec(bob, Resource.NamedEntity(uuidName), Permission.Read)))
    SqlRegistryStore.save(reg2, rbac2, url)

    val (got, gotRbac) = SqlRegistryStore.load(url)
    assert(got.allEntities.map(_.guid) == Seq("g9"),
      "re-save must REPLACE, not append")
    assert(gotRbac.getPermissions.exists(r =>
      r.credential == bob && r.resource == Resource.NamedEntity(uuidName)),
      "grants on a UUID-named project must reload as NamedEntity")
    assert(gotRbac.checkPermission(bob, Resource.NamedEntity(uuidName),
      Permission.Read))
  }

  test("loading an empty (never-saved) store yields an empty catalog") {
    val (reg, rbac) = SqlRegistryStore.load(freshUrl())
    assert(reg.allEntities.isEmpty && reg.allEdges.isEmpty &&
      rbac.getPermissions.isEmpty)
  }
}
