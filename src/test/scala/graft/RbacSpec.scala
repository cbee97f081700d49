package graft

import graft.registry._
import org.scalatest.funsuite.AnyFunSuite

/** R4 RBAC semantics (reference rbac_provider.rs:13-131): credential
  * parsing, the admin ⊇ producer ⊇ consumer hierarchy, global-scope
  * fallback, admin-gated grant/revoke, and the audit log.
  */
class RbacSpec extends AnyFunSuite {

  private val alice = Credential.User("alice")
  private val bob = Credential.User("bob")
  private val proj = Resource.NamedEntity("projA")

  private def rec(c: Credential, r: Resource, p: Permission,
      by: Credential = alice, reason: String = "test"): RbacRecord =
    RbacRecord(c, r, p, by, reason, 1700000000000L)

  test("credential and resource parsing: uuid -> App/Entity, else User/NamedEntity") {
    assert(Credential.parse("alice") == Credential.User("alice"))
    assert(Credential.parse("4fae0a4f-1e04-4567-9a3e-0c5a1a4d8e2b") ==
      Credential.App("4fae0a4f-1e04-4567-9a3e-0c5a1a4d8e2b"))
    assert(Credential.parse("*") == Credential.RbacDisabled)
    assert(Resource.parse("GLOBAL") == Resource.Global)
    assert(Resource.parse("projA") == Resource.NamedEntity("projA"))
    assert(Resource.parse("4fae0a4f-1e04-4567-9a3e-0c5a1a4d8e2b") ==
      Resource.Entity("4fae0a4f-1e04-4567-9a3e-0c5a1a4d8e2b"))
    assert(Permission.parse("producer") == Permission.Write)
  }

  test("resource Admin cascades to read/write; exact grants stay exact") {
    // reference sql-provider/src/lib.rs:477-486: Admin on the resource
    // passes any permission check on it; a plain grant passes only its
    // own permission
    val rbac = new InMemoryRbac
    rbac.loadPermissions(Seq(rec(alice, proj, Permission.Admin)))
    assert(rbac.checkPermission(alice, proj, Permission.Read))
    assert(rbac.checkPermission(alice, proj, Permission.Write))
    assert(rbac.checkPermission(alice, proj, Permission.Admin))
    rbac.loadPermissions(Seq(rec(bob, proj, Permission.Read)))
    assert(rbac.checkPermission(bob, proj, Permission.Read))
    assert(!rbac.checkPermission(bob, proj, Permission.Write))
  }

  test("only global ADMIN cascades to other resources; RbacDisabled bypasses") {
    // reference lib.rs:478-480: the global clause checks Admin ONLY —
    // a global Write grant authorizes nothing on a project
    val rbac = new InMemoryRbac
    rbac.loadPermissions(Seq(rec(alice, Resource.Global, Permission.Write)))
    assert(rbac.checkPermission(alice, Resource.Global, Permission.Write))
    assert(!rbac.checkPermission(alice, proj, Permission.Write))
    assert(!rbac.checkPermission(alice, proj, Permission.Read))
    rbac.loadPermissions(Seq(rec(bob, Resource.Global, Permission.Admin)))
    assert(rbac.checkPermission(bob, proj, Permission.Admin))
    assert(rbac.checkPermission(bob, Resource.NamedEntity("other"), Permission.Read))
    assert(rbac.checkPermission(Credential.RbacDisabled, proj, Permission.Admin))
  }

  test("SecuredRegistry gates catalog operations by project scope") {
    val rbac = new InMemoryRbac
    rbac.loadPermissions(Seq(
      rec(alice, Resource.NamedEntity("projA"), Permission.Admin),
      rec(bob, Resource.NamedEntity("projA"), Permission.Read)))
    val reg = new SecuredRegistry(new InMemoryRegistry, rbac)
    val e = RegistryEntity("g1", EntityType.AnchorFeature,
      "f_x", "projA__anchor__f_x")
    // producer/admin can create; consumer cannot
    reg.create(alice, e)
    intercept[PermissionDeniedException] {
      reg.create(bob, e.copy(guid = "g2", qualifiedName = "projA__anchor__f_y"))
    }
    // consumer reads fine; a stranger is denied
    assert(reg.get(bob, "g1").exists(_.name == "f_x"))
    assert(reg.resolve(bob, "f_x").isDefined)
    intercept[PermissionDeniedException] { reg.get(Credential.User("mallory"), "g1") }
    // search silently filters unreadable projects
    assert(reg.search(bob, "f_x").nonEmpty)
    assert(reg.search(Credential.User("mallory"), "f_x").isEmpty)
    // delete needs admin
    intercept[PermissionDeniedException] { reg.delete(bob, "g1") }
    reg.delete(alice, "g1")
    assert(reg.registry.get("g1").isEmpty)
  }

  test("registry persistence: entities + edges + grants round-trip through a file") {
    val reg = new InMemoryRegistry
    val e1 = reg.create(RegistryEntity("g1", EntityType.Workspace, "projA", "projA"))
    val e2 = reg.create(RegistryEntity("g2", EntityType.AnchorFeature,
      "f_x", "projA__anchor__f_x", attributes = Map("type" -> "DOUBLE")))
    // a second version of the same qualified name must survive verbatim
    val e2v2 = reg.create(RegistryEntity("g3", EntityType.AnchorFeature,
      "f_x", "projA__anchor__f_x"))
    assert(e2v2.version == 2)
    reg.link("g2", "g1", EdgeType.BelongsTo)
    val rbac = new InMemoryRbac
    rbac.loadPermissions(Seq(
      rec(alice, Resource.Global, Permission.Admin, reason = "boot"),
      rec(bob, proj, Permission.Read)))

    val path = java.nio.file.Files.createTempDirectory("graft_reg").toString + "/reg.json"
    RegistryPersistence.save(reg, rbac, path)
    val (reg2, rbac2) = RegistryPersistence.load(path)

    assert(reg2.allEntities.toSet == reg.allEntities.toSet)
    assert(reg2.allEdges == reg.allEdges)
    assert(reg2.resolve("f_x").map(_.guid).contains("g3")) // latest version
    assert(reg2.resolve("f_x:1").map(_.guid).contains("g2"))
    assert(reg2.search("f_x").nonEmpty) // FTS index rebuilt on load
    assert(rbac2.getPermissions.toSet == rbac.getPermissions.toSet)
    assert(rbac2.checkPermission(alice, proj, Permission.Admin))
  }

  test("hardening: link needs an existing source; last Admin grant survives; UUID-named project persists") {
    // link with an unknown `from` guid must fail BEFORE touching the
    // edge list — otherwise any credential injects lineage unchecked
    val rbac = new InMemoryRbac
    rbac.loadPermissions(Seq(rec(alice, Resource.Global, Permission.Admin)))
    val sr = new SecuredRegistry(new InMemoryRegistry, rbac)
    sr.create(alice, RegistryEntity("g1", EntityType.Workspace, "projA", "projA"))
    intercept[IllegalArgumentException] {
      sr.link(alice, "no-such-guid", "g1", EdgeType.BelongsTo)
    }
    assert(sr.registry.allEdges.isEmpty)

    // revoking the last Admin grant is refused (the store would be
    // unadministrable / re-open unauthenticated bootstrap)
    val rb = new InMemoryRbac
    rb.grantPermission(rec(alice, Resource.Global, Permission.Admin, by = alice))
    rb.grantPermission(rec(bob, proj, Permission.Write, by = alice))
    intercept[IllegalStateException] {
      rb.revokePermission(rec(alice, Resource.Global, Permission.Admin, by = alice))
    }
    assert(rb.checkPermission(alice, Resource.Global, Permission.Admin))

    // a project NAMED like a UUID keeps its NamedEntity grants across a
    // persistence round-trip (explicit resourceKind discriminator — the
    // repr alone would re-sniff as an entity guid)
    val uuidName = "123e4567-e89b-12d3-a456-426614174000"
    val rb2 = new InMemoryRbac
    rb2.loadPermissions(Seq(
      rec(alice, Resource.Global, Permission.Admin),
      rec(bob, Resource.NamedEntity(uuidName), Permission.Read)))
    val path = java.nio.file.Files.createTempDirectory("graft_uuid").toString + "/reg.json"
    RegistryPersistence.save(new InMemoryRegistry, rb2, path)
    val (_, rb3) = RegistryPersistence.load(path)
    assert(rb3.getPermissions.exists(r =>
      r.credential == bob && r.resource == Resource.NamedEntity(uuidName)),
      "grants on a UUID-named project must survive persistence as NamedEntity")
    assert(rb3.checkPermission(bob, Resource.NamedEntity(uuidName), Permission.Read))
  }

  test("grant/revoke are admin-gated; empty store bootstraps") {
    val rbac = new InMemoryRbac
    // bootstrap: first grant into an empty store is unchecked
    rbac.grantPermission(rec(alice, Resource.Global, Permission.Admin, by = alice,
      reason = "bootstrap"))
    // alice (global admin) grants bob producer on projA
    rbac.grantPermission(rec(bob, proj, Permission.Write, by = alice))
    assert(rbac.checkPermission(bob, proj, Permission.Write))
    // bob (not admin) cannot grant
    intercept[PermissionDeniedException] {
      rbac.grantPermission(rec(Credential.User("carol"), proj, Permission.Read, by = bob))
    }
    // revoke by admin works, by non-admin is denied
    intercept[PermissionDeniedException] {
      rbac.revokePermission(rec(bob, proj, Permission.Write, by = bob))
    }
    rbac.revokePermission(rec(bob, proj, Permission.Write, by = alice))
    assert(!rbac.checkPermission(bob, proj, Permission.Write))
    // the audit log keeps requestor + reason
    assert(rbac.getPermissions.exists(r =>
      r.reason == "bootstrap" && r.requestor == alice))
  }
}
