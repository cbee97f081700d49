package graft.registry

import com.fasterxml.jackson.databind.ObjectMapper
import scala.jdk.CollectionConverters._

/** Durable registry state: one JSON document holding entities, edges,
  * and RBAC grants (SURVEY.md §2.9 R5's in-process counterpart — the
  * reference persists the same three relations to SQL tables
  * `entities`/`edges`/`userroles`, registry/scripts/mssql.sql:1-16, or
  * a Raft-replicated log; a single-process engine needs a durable file,
  * not a database server).
  */
object RegistryPersistence {
  private val mapper = new ObjectMapper()

  /** The ONE entity-JSON shape (typeName/name/qualifiedName/version/
    * attributes), shared by the file persistence (guid added by the
    * caller) and [[SqlRegistryStore]]'s `entity_content` column (guid
    * is the row key) — a field added to the entity model is serialized
    * in one place, not two.
    */
  private[registry] def entityInto(
      n: com.fasterxml.jackson.databind.node.ObjectNode,
      e: RegistryEntity): Unit = {
    n.put("typeName", e.typeName)
    n.put("name", e.name); n.put("qualifiedName", e.qualifiedName)
    n.put("version", e.version)
    val attrs = n.putObject("attributes")
    e.attributes.foreach { case (k, v) => attrs.put(k, v) }
  }

  /** Inverse of [[entityInto]]; `guid` rides outside the node. */
  private[registry] def entityFrom(guid: String,
      n: com.fasterxml.jackson.databind.JsonNode): RegistryEntity =
    RegistryEntity(
      guid, n.get("typeName").asText, n.get("name").asText,
      n.get("qualifiedName").asText, n.get("version").asInt,
      Option(n.get("attributes")).map(_.properties.asScala
        .map(e => e.getKey -> e.getValue.asText).toMap).getOrElse(Map.empty))

  def save(reg: InMemoryRegistry, rbac: InMemoryRbac, path: String): Unit = {
    val root = mapper.createObjectNode()
    val ents = root.putArray("entities")
    reg.allEntities.foreach { e =>
      val n = ents.addObject()
      n.put("guid", e.guid)
      entityInto(n, e)
    }
    val edges = root.putArray("edges")
    reg.allEdges.foreach { e =>
      val n = edges.addObject()
      n.put("from", e.from); n.put("to", e.to); n.put("edgeType", e.edgeType)
    }
    val grants = root.putArray("userroles")
    rbac.getPermissions.foreach { r =>
      val n = grants.addObject()
      n.put("credential", r.credential.repr)
      n.put("resource", r.resource.repr)
      // explicit discriminator: the repr alone is ambiguous (a project
      // named like a UUID would re-sniff as an entity guid on load)
      n.put("resourceKind", Resource.kindOf(r.resource))
      n.put("permission", r.permission.repr)
      n.put("requestor", r.requestor.repr)
      n.put("reason", r.reason)
      n.put("time", r.timeMillis)
    }
    val p = java.nio.file.Paths.get(path)
    Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.write(p,
      mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(root))
  }

  def load(path: String): (InMemoryRegistry, InMemoryRbac) = {
    val root = mapper.readTree(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)))
    val reg = new InMemoryRegistry
    Option(root.get("entities")).toSeq.flatMap(_.elements.asScala).foreach { n =>
      // loadEntity preserves the persisted version (create() would
      // re-version same-qualifiedName rows as it replays them)
      reg.loadEntity(entityFrom(n.get("guid").asText, n))
    }
    Option(root.get("edges")).toSeq.flatMap(_.elements.asScala).foreach { n =>
      reg.link(n.get("from").asText, n.get("to").asText, n.get("edgeType").asText)
    }
    val rbac = new InMemoryRbac
    rbac.loadPermissions(
      Option(root.get("userroles")).toSeq.flatMap(_.elements.asScala).map { n =>
        RbacRecord(
          Credential.parse(n.get("credential").asText),
          Option(n.get("resourceKind"))
            .map(k => Resource.fromKind(k.asText, n.get("resource").asText))
            // legacy files without the discriminator: best-effort sniff
            .getOrElse(Resource.parse(n.get("resource").asText)),
          Permission.parse(n.get("permission").asText),
          Credential.parse(n.get("requestor").asText),
          n.get("reason").asText,
          n.get("time").asLong)
      })
    (reg, rbac)
  }
}
