package graft

import graft.registry._
import org.scalatest.funsuite.AnyFunSuite

/** Reference-parity pins for the registry's FTS ranking and RBAC
  * decision matrix — each case cites the reference behavior it
  * mirrors (`registry/sql-provider/src/fts.rs`,
  * `registry/sql-provider/src/lib.rs`, `sql-provider/src/rbac_map.rs`,
  * `registry-provider/src/rbac_provider.rs`).
  */
class RegistryReferenceParitySpec extends AnyFunSuite {

  // ── FTS: str_score ordering (fts.rs:19-48) ─────────────────────────

  private def registryWith(names: String*): InMemoryRegistry = {
    val r = new InMemoryRegistry
    names.zipWithIndex.foreach { case (n, i) =>
      r.create(RegistryEntity(s"g$i", EntityType.AnchorFeature,
        n, s"proj__$n", attributes = Map("description" -> "shared term")))
    }
    r
  }

  test("str_score is positional base-36 over the first 12 alphanumerics, zero-padded") {
    // fts.rs:24-48 chains a [0;12] fill before take(12): "ab" compares
    // as ab0000000000, so it sorts BEFORE "b" (b00000000000). An
    // unpadded magnitude fold would invert that pair.
    val r = registryWith("b", "ab", "abc")
    assert(r.search("shared term").map(_.name) == Seq("ab", "abc", "b"))
  }

  test("str_score skips non-alphanumerics and case-folds (fts.rs:29-43)") {
    // 'A'-'Z' map to the same digits as 'a'-'z'; '-' is skipped, so
    // "a-very-long" scores as "averylong000" and the zero padding puts
    // the shorter "avery" (avery0000000) first at position 6
    val r = registryWith("Zeta", "a-very-long", "avery")
    assert(r.search("shared term").map(_.name) ==
      Seq("avery", "a-very-long", "Zeta"))
  }

  test("digits sort before letters (fts.rs:31-39: '0'-'9' are digits 0-9, letters 10-35)") {
    val r = registryWith("alpha", "42beta")
    assert(r.search("shared term").map(_.name) == Seq("42beta", "alpha"))
  }

  test("ranking ignores relevance: a single-term match outranks a two-term match by name (fts.rs:241-246)") {
    val r = new InMemoryRegistry
    r.create(RegistryEntity("g1", EntityType.AnchorFeature,
      "zz_user_purchase", "proj__zz_user_purchase")) // matches BOTH terms
    r.create(RegistryEntity("g2", EntityType.Source,
      "aa_purchase", "proj__aa_purchase")) // matches one term
    assert(r.search("user purchase").map(_.guid) == Seq("g2", "g1"))
  }

  test("special query characters are inert (fts.rs:133-135,200-205 cleaner regex)") {
    // the reference strips :+()[]{} and standalone AND/OR/TO on parse
    // failure and re-parses — a query wrapped in that syntax must find
    // the same entities as the bare terms
    val r = registryWith("target_feature")
    assert(r.search("(target) AND [feature]").map(_.name) ==
      Seq("target_feature"))
  }

  test("query and index terms are stemmed alike (fts.rs:94-96 en_stem)") {
    // "events" and "normalize" must reach the document indexed under
    // "event_normalization" — both sides stem to event / normal
    val r = registryWith("event_normalization")
    assert(r.search("events normalize").map(_.name) ==
      Seq("event_normalization"))
    assert(r.search("xyzzy").isEmpty, "unmatched terms find nothing")
  }

  test("type filter is an exact term, not a text match (fts.rs:220-239)") {
    val r = new InMemoryRegistry
    r.create(RegistryEntity("g1", EntityType.AnchorFeature, "x_feat", "proj__x_feat"))
    r.create(RegistryEntity("g2", EntityType.Source, "x_src", "proj__x_src"))
    assert(r.search("x", types = Set(EntityType.Source)).map(_.guid) == Seq("g2"))
    assert(r.search("x", types = Set(EntityType.Source, EntityType.AnchorFeature))
      .map(_.guid).toSet == Set("g1", "g2"))
  }

  // ── RBAC: the decision matrix (lib.rs:454-486, rbac_map.rs:62-95) ──

  private val u = Credential.User("u")
  private val projA = Resource.NamedEntity("projA")
  private val projB = Resource.NamedEntity("projB")

  private def rbacWith(grants: (Resource, Permission)*): InMemoryRbac = {
    val rbac = new InMemoryRbac
    rbac.loadPermissions(grants.map { case (res, p) =>
      RbacRecord(u, res, p, Credential.User("root"), "seed", 0L)
    })
    rbac
  }

  // (grants, checked resource, checked permission, expected, reference rule)
  private val matrix: Seq[(Seq[(Resource, Permission)], Resource, Permission,
      Boolean, String)] = Seq(
    (Seq(Resource.Global -> Permission.Admin), projA, Permission.Admin,
      true, "global Admin passes everything (lib.rs:478-480)"),
    (Seq(Resource.Global -> Permission.Admin), projA, Permission.Read,
      true, "global Admin passes everything (lib.rs:478-480)"),
    (Seq(Resource.Global -> Permission.Write), projA, Permission.Write,
      false, "global non-Admin does NOT cascade (lib.rs:478-480 checks Admin only)"),
    (Seq(Resource.Global -> Permission.Read), projA, Permission.Read,
      false, "global non-Admin does NOT cascade"),
    (Seq(projA -> Permission.Admin), projA, Permission.Read,
      true, "resource Admin passes any permission on it (lib.rs:481-483)"),
    (Seq(projA -> Permission.Admin), projA, Permission.Write,
      true, "resource Admin passes any permission on it"),
    (Seq(projA -> Permission.Admin), projB, Permission.Read,
      false, "resource Admin is per-resource (rbac_map.rs:62-73 exact set lookup)"),
    (Seq(projA -> Permission.Write), projA, Permission.Write,
      true, "exact grant passes its own permission (lib.rs:483-485)"),
    (Seq(projA -> Permission.Write), projA, Permission.Read,
      false, "Write does NOT imply Read — only the exact triple matches"),
    (Seq(projA -> Permission.Read), projA, Permission.Write,
      false, "Read does not imply Write"),
    (Seq(projA -> Permission.Read), projA, Permission.Read,
      true, "exact grant passes"),
    (Seq(), projA, Permission.Read,
      false, "no grant, no access (rbac_map.rs:70-72 unwrap_or(false))"))

  test("RBAC allow/deny matrix matches the reference check") {
    matrix.foreach { case (grants, res, perm, expected, rule) =>
      val got = rbacWith(grants: _*).checkPermission(u, res, perm)
      assert(got == expected,
        s"grants=$grants check=($res, $perm): expected $expected ($rule)")
    }
  }

  test("RbacDisabled short-circuits every check (lib.rs:460-462)") {
    assert(rbacWith().checkPermission(
      Credential.RbacDisabled, projA, Permission.Admin))
  }

  test("revoke removes only the exact triple (rbac_map.rs:88-95)") {
    val root = Credential.User("root")
    val rbac = new InMemoryRbac
    rbac.loadPermissions(Seq(
      RbacRecord(root, Resource.Global, Permission.Admin, root, "boot", 0L),
      RbacRecord(u, projA, Permission.Write, root, "w", 0L),
      RbacRecord(u, projA, Permission.Read, root, "r", 0L)))
    rbac.revokePermission(RbacRecord(u, projA, Permission.Write, root, "", 0L))
    assert(!rbac.checkPermission(u, projA, Permission.Write))
    assert(rbac.checkPermission(u, projA, Permission.Read),
      "revoking Write must not touch the Read grant")
  }
}
