package graft.registry

import scala.collection.mutable

/** Registry access control (SURVEY.md §2.9 R4; reference
  * `registry/registry-provider/src/rbac_provider.rs:13-131`): who may
  * read/write/administer a project or the whole registry.
  *
  * Model, mirroring the reference:
  *  - `Credential`: a user name or an application UUID (`User`/`App`,
  *    rbac_provider.rs:12-27); `RbacDisabled` is the `*` wildcard that
  *    short-circuits every check.
  *  - `Permission`: Read ("consumer") / Write ("producer") / Admin
  *    (rbac_provider.rs:40-57). Checks are EXACT-match plus an
  *    Admin-only cascade (sql-provider/src/lib.rs:454-486): a
  *    credential passes iff it holds global Admin, Admin on the
  *    resource, or the EXACT requested permission on the resource —
  *    Write does NOT imply Read, and a global Read/Write grant does
  *    NOT cascade to projects (only global Admin does).
  *  - `Resource`: `Global`, a named entity (so far projects,
  *    rbac_provider.rs:59-74), or an entity UUID.
  *  - `RbacRecord` is the audit-carrying grant row (credential,
  *    resource, permission, requestor, reason, time,
  *    rbac_provider.rs:102-110).
  */
sealed trait Credential { def repr: String }
object Credential {
  case object RbacDisabled extends Credential { val repr = "*" }
  case class User(name: String) extends Credential { def repr: String = name }
  case class App(uuid: String) extends Credential { def repr: String = uuid }

  private val UuidRe =
    "^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$".r

  /** UUID strings are applications, anything else a user
    * (rbac_provider.rs:29-39).
    */
  def parse(s: String): Credential =
    if (s == "*") RbacDisabled
    else if (UuidRe.matches(s)) App(s.toLowerCase)
    else User(s)
}

sealed abstract class Permission(val rank: Int, val repr: String)
object Permission {
  case object Read  extends Permission(0, "consumer")
  case object Write extends Permission(1, "producer")
  case object Admin extends Permission(2, "admin")
  val all: Seq[Permission] = Seq(Read, Write, Admin)
  def parse(s: String): Permission =
    all.find(_.repr == s.toLowerCase).getOrElse(
      throw new IllegalArgumentException(s"unknown permission: $s"))
}

sealed trait Resource { def repr: String }
object Resource {
  case object Global extends Resource { val repr = "global" }
  case class NamedEntity(name: String) extends Resource { def repr: String = name }
  case class Entity(uuid: String) extends Resource { def repr: String = uuid }

  def parse(s: String): Resource =
    if (s.equalsIgnoreCase("global")) Global
    else if (Credential.parse(s).isInstanceOf[Credential.App]) Entity(s.toLowerCase)
    else NamedEntity(s)

  /** Stable persisted discriminator: re-sniffing the repr on load
    * ([[parse]]) misclassifies a project NAMED like a UUID as an
    * `Entity` after a round-trip, silently orphaning its grants —
    * durable stores persist the kind explicitly instead.
    */
  def kindOf(r: Resource): String = r match {
    case Global         => "global"
    case _: NamedEntity => "name"
    case _: Entity      => "entity"
  }

  def fromKind(kind: String, repr: String): Resource = kind match {
    case "global" => Global
    case "name"   => NamedEntity(repr)
    case "entity" => Entity(repr.toLowerCase)
    case other => throw new IllegalArgumentException(s"unknown resource kind: $other")
  }
}

case class RbacRecord(
    credential: Credential,
    resource: Resource,
    permission: Permission,
    requestor: Credential,
    reason: String,
    timeMillis: Long)

class PermissionDeniedException(msg: String) extends RuntimeException(msg)

/** In-memory RBAC provider (the reference keeps the same store shape
  * behind its SQL/Raft persistence, which SURVEY declared out of scope).
  *
  * Grant/revoke require the requestor to hold Admin on the target
  * resource (or globally); an EMPTY store bootstraps by accepting the
  * first grant unchecked (otherwise no admin could ever exist — the
  * reference seeds this row through deployment config).
  */
/** RBAC-enforcing facade over [[InMemoryRegistry]] — R4 wired to the
  * catalog operations rather than standing alone. Permission scope is
  * the entity's PROJECT: the first `__` segment of its qualified name
  * (the reference scopes to projects too — rbac_provider.rs:62 "So far
  * only project is used"). Reads need consumer, create/link producer,
  * delete admin; search results are silently filtered to readable
  * projects (the reference API behaves the same: forbidden entities
  * don't error, they disappear).
  */
class SecuredRegistry(val registry: InMemoryRegistry, val rbac: InMemoryRbac) {
  private def projectOf(qualifiedName: String): Resource =
    Resource.NamedEntity(qualifiedName.split("__", 2)(0))

  def create(as: Credential, e: RegistryEntity): RegistryEntity = {
    rbac.requirePermission(as, projectOf(e.qualifiedName), Permission.Write)
    registry.create(e)
  }

  def get(as: Credential, guid: String): Option[RegistryEntity] =
    registry.get(guid).map { e =>
      rbac.requirePermission(as, projectOf(e.qualifiedName), Permission.Read)
      e
    }

  def resolve(as: Credential, versionedName: String): Option[RegistryEntity] =
    registry.resolve(versionedName).map { e =>
      rbac.requirePermission(as, projectOf(e.qualifiedName), Permission.Read)
      e
    }

  def delete(as: Credential, guid: String): Unit =
    registry.get(guid).foreach { e =>
      rbac.requirePermission(as, projectOf(e.qualifiedName), Permission.Admin)
      registry.delete(guid)
    }

  /** The `from` entity must EXIST: a permission check against an
    * unknown guid has nothing to check, and skipping it would let any
    * credential inject lineage edges pointing at real `to` entities
    * without Write permission.
    */
  def link(as: Credential, from: String, to: String, edgeType: String): Unit = {
    val e = registry.get(from).getOrElse(throw new IllegalArgumentException(
      s"link: unknown source entity $from"))
    rbac.requirePermission(as, projectOf(e.qualifiedName), Permission.Write)
    registry.link(from, to, edgeType)
  }

  def search(as: Credential, q: String, types: Set[String] = Set.empty,
      scope: Option[String] = None, limit: Int = 10, offset: Int = 0): Seq[RegistryEntity] =
    registry.search(q, types, scope, limit, offset)
      .filter(e => rbac.checkPermission(as, projectOf(e.qualifiedName), Permission.Read))

  def lineage(as: Credential, startGuid: String, downstream: Boolean,
      maxDepth: Int = Int.MaxValue): (Seq[RegistryEntity], Seq[RegistryEdge]) = {
    registry.get(startGuid).foreach(e =>
      rbac.requirePermission(as, projectOf(e.qualifiedName), Permission.Read))
    registry.lineage(startGuid, downstream, maxDepth)
  }
}

class InMemoryRbac {
  private val records = mutable.ArrayBuffer.empty[RbacRecord]

  /** The reference's check verbatim (sql-provider/src/lib.rs:454-486
    * over rbac_map.rs:62-73): global Admin, OR Admin on the resource,
    * OR the exact (credential, resource, permission) grant. No
    * Write-implies-Read, no global-Read/Write cascade — only Admin
    * fans out, and only from Global or the resource itself.
    */
  def checkPermission(credential: Credential, resource: Resource,
      permission: Permission): Boolean =
    credential == Credential.RbacDisabled ||
      records.synchronized {
        def holds(res: Resource, p: Permission) = records.exists(r =>
          r.credential == credential && r.permission == p && r.resource == res)
        holds(Resource.Global, Permission.Admin) ||
          holds(resource, Permission.Admin) ||
          holds(resource, permission)
      }

  def requirePermission(credential: Credential, resource: Resource,
      permission: Permission): Unit =
    if (!checkPermission(credential, resource, permission))
      throw new PermissionDeniedException(
        s"Credential ${credential.repr} doesn't have ${permission.repr} " +
          s"permission to resource ${resource.repr}")

  /** Bulk-load persisted grants, bypassing requestor checks
    * (rbac_provider.rs `load_permissions`).
    */
  def loadPermissions(rs: IterableOnce[RbacRecord]): Unit =
    records.synchronized { records ++= rs }

  def getPermissions: Seq[RbacRecord] = records.synchronized { records.toSeq }

  def grantPermission(grant: RbacRecord): Unit = records.synchronized {
    if (records.nonEmpty)
      requirePermission(grant.requestor, grant.resource, Permission.Admin)
    records += grant
  }

  /** Refuses to revoke the LAST Admin grant: an admin-less store could
    * never grant again, and draining the store to empty would re-open
    * the unauthenticated first-grant bootstrap (use [[loadPermissions]]
    * for deliberate re-seeding).
    */
  def revokePermission(revoke: RbacRecord): Unit = records.synchronized {
    requirePermission(revoke.requestor, revoke.resource, Permission.Admin)
    val remaining = records.filterNot(r => r.credential == revoke.credential &&
      r.resource == revoke.resource && r.permission == revoke.permission)
    if (records.exists(_.permission == Permission.Admin) &&
        !remaining.exists(_.permission == Permission.Admin))
      throw new IllegalStateException(
        "refusing to revoke the last Admin grant: the store would be " +
          "unadministrable and an empty store re-opens unauthenticated bootstrap")
    records.filterInPlace(r => !(r.credential == revoke.credential &&
      r.resource == revoke.resource && r.permission == revoke.permission))
  }
}
