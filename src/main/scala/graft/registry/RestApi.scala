package graft.registry

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.sun.net.httpserver.{HttpExchange, HttpServer}

import java.net.InetSocketAddress
import scala.jdk.CollectionConverters._

/** R5-lite REST facade over [[SecuredRegistry]] (reference registry
  * HTTP API, registry/registry-api/src/api_provider.rs:539-922 — CRUD,
  * lineage, search, and userrole verbs). The JDK's built-in
  * `HttpServer` keeps it dependency-free (the reference runs
  * poem/actix; SURVEY §2.9 keeps a server framework out of scope for a
  * query engine, so this is the durable-API shape, not a product
  * server: no TLS, single process).
  *
  * ==Trust model==
  * The caller identity arrives in the `x-registry-requestor` header
  * (the reference extracts it from AAD bearer tokens,
  * api_provider.rs:70-91); absent ⇒ anonymous `User("anonymous")`,
  * which only succeeds where grants allow it. Every RBAC denial maps
  * to 403, unknown routes/entities to 404, bad payloads to 400.
  *
  * The header is TRUSTED AS-IS: this facade is an in-process /
  * same-host test stand-in for the reference's authenticated API, NOT
  * an authentication boundary. Any client that can reach the socket
  * can claim any identity. Deploying it beyond localhost requires
  * putting a real authn layer (token-validating reverse proxy or an
  * AAD-style bearer-token validator) in front and having THAT set the
  * header; the server also binds 127.0.0.1 only.
  *
  * Routes:
  *  - GET    /entities/{guid}                      → entity JSON
  *  - GET    /entities?name={versionedName}        → resolve by name
  *  - POST   /entities                             → create
  *  - DELETE /entities/{guid}                      → delete
  *  - POST   /edges                                → link {from,to,edgeType}
  *  - GET    /lineage/{guid}?direction=&depth=     → {entities, edges}
  *  - GET    /search?q=&type=&scope=&limit=&offset=→ entity list
  *  - GET    /userroles                            → grant list (admin)
  *  - POST   /userroles                            → grant
  *  - DELETE /userroles                            → revoke
  */
class RegistryRestApi(secured: SecuredRegistry, port: Int = 0) {
  private val mapper = new ObjectMapper()
  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)

  /** Bound port (useful with port = 0 → ephemeral). */
  def boundPort: Int = server.getAddress.getPort

  def start(): RegistryRestApi = { server.start(); this }
  def stop(): Unit = server.stop(0)

  private def caller(ex: HttpExchange): Credential =
    Option(ex.getRequestHeaders.getFirst("x-registry-requestor"))
      .map(Credential.parse).getOrElse(Credential.User("anonymous"))

  private def query(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getQuery).toSeq
      .flatMap(_.split("&").toSeq).flatMap { kv =>
        kv.split("=", 2) match {
          case Array(k, v) => Some(k ->
            java.net.URLDecoder.decode(v, "UTF-8"))
          case _ => None
        }
      }.toMap

  private def entityJson(e: RegistryEntity): JsonNode = {
    val n = mapper.createObjectNode()
    n.put("guid", e.guid); n.put("typeName", e.typeName)
    n.put("name", e.name); n.put("qualifiedName", e.qualifiedName)
    n.put("version", e.version)
    val attrs = n.putObject("attributes")
    e.attributes.foreach { case (k, v) => attrs.put(k, v) }
    n
  }

  private def respond(ex: HttpExchange, status: Int, body: JsonNode): Unit = {
    val bytes = mapper.writeValueAsBytes(body)
    ex.getResponseHeaders.set("content-type", "application/json")
    ex.sendResponseHeaders(status, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def error(ex: HttpExchange, status: Int, msg: String): Unit = {
    val n = mapper.createObjectNode(); n.put("error", msg)
    respond(ex, status, n)
  }

  /** Uniform handler wrapper: JSON errors for RBAC denials and bad
    * input instead of a dropped connection.
    */
  private def handle(path: String)(f: HttpExchange => Unit): Unit =
    server.createContext(path, (ex: HttpExchange) =>
      try f(ex)
      catch {
        case e: PermissionDeniedException => error(ex, 403, e.getMessage)
        case e: IllegalArgumentException  => error(ex, 400, String.valueOf(e.getMessage))
        case e: IllegalStateException     => error(ex, 409, String.valueOf(e.getMessage))
        case e: Throwable                 => error(ex, 500, String.valueOf(e.getMessage))
      })

  private def tailOf(ex: HttpExchange, prefix: String): Option[String] = {
    val p = ex.getRequestURI.getPath.stripPrefix(prefix)
    if (p.isEmpty || p.contains("/")) None else Some(p)
  }

  private def readBody(ex: HttpExchange): JsonNode =
    mapper.readTree(ex.getRequestBody.readAllBytes())

  private def textOf(n: JsonNode, field: String): String = {
    val v = n.get(field)
    if (v == null || v.isNull)
      throw new IllegalArgumentException(s"missing field: $field")
    v.asText
  }

  handle("/entities") { ex =>
    val as = caller(ex)
    (ex.getRequestMethod, tailOf(ex, "/entities/")) match {
      case ("GET", Some(guid)) =>
        secured.get(as, guid) match {
          case Some(e) => respond(ex, 200, entityJson(e))
          case None    => error(ex, 404, s"no entity $guid")
        }
      case ("GET", None) =>
        query(ex).get("name") match {
          case Some(name) => secured.resolve(as, name) match {
            case Some(e) => respond(ex, 200, entityJson(e))
            case None    => error(ex, 404, s"no entity named $name")
          }
          case None => error(ex, 400, "GET /entities needs ?name= or /{guid}")
        }
      case ("POST", None) =>
        val b = readBody(ex)
        val created = secured.create(as, RegistryEntity(
          textOf(b, "guid"), textOf(b, "typeName"), textOf(b, "name"),
          textOf(b, "qualifiedName"),
          attributes = Option(b.get("attributes"))
            .map(_.properties.asScala.map(e => e.getKey -> e.getValue.asText).toMap)
            .getOrElse(Map.empty)))
        respond(ex, 201, entityJson(created))
      case ("DELETE", Some(guid)) =>
        secured.delete(as, guid)
        respond(ex, 200, mapper.createObjectNode())
      case (m, _) => error(ex, 405, s"unsupported: $m ${ex.getRequestURI.getPath}")
    }
  }

  handle("/edges") { ex =>
    ex.getRequestMethod match {
      case "POST" =>
        val b = readBody(ex)
        secured.link(caller(ex), textOf(b, "from"), textOf(b, "to"),
          textOf(b, "edgeType"))
        respond(ex, 201, mapper.createObjectNode())
      case m => error(ex, 405, s"unsupported: $m /edges")
    }
  }

  handle("/lineage/") { ex =>
    tailOf(ex, "/lineage/") match {
      case Some(guid) if ex.getRequestMethod == "GET" =>
        val q = query(ex)
        val downstream = !q.get("direction").contains("upstream")
        val depth = q.get("depth").map(_.toInt).getOrElse(Int.MaxValue)
        val (ents, edges) = secured.lineage(caller(ex), guid, downstream, depth)
        val n = mapper.createObjectNode()
        val ea = n.putArray("entities")
        ents.foreach(e => ea.add(entityJson(e)))
        val ga = n.putArray("edges")
        edges.foreach { e =>
          val g = ga.addObject()
          g.put("from", e.from); g.put("to", e.to); g.put("edgeType", e.edgeType)
        }
        respond(ex, 200, n)
      case _ => error(ex, 404, "GET /lineage/{guid}")
    }
  }

  handle("/search") { ex =>
    val q = query(ex)
    val hits = secured.search(caller(ex), q.getOrElse("q", ""),
      types = q.get("type").toSet,
      scope = q.get("scope"),
      limit = q.get("limit").map(_.toInt).getOrElse(10),
      offset = q.get("offset").map(_.toInt).getOrElse(0))
    val arr = mapper.createArrayNode()
    hits.foreach(e => arr.add(entityJson(e)))
    respond(ex, 200, arr)
  }

  handle("/userroles") { ex =>
    val as = caller(ex)
    def record(b: JsonNode) = RbacRecord(
      Credential.parse(textOf(b, "credential")),
      Resource.fromKind(textOf(b, "resourceKind"), textOf(b, "resource")),
      Permission.parse(textOf(b, "permission")),
      requestor = as,
      reason = Option(b.get("reason")).map(_.asText).getOrElse(""),
      timeMillis = System.currentTimeMillis())
    ex.getRequestMethod match {
      case "GET" =>
        // listing every grant is itself admin-gated (global scope)
        secured.rbac.requirePermission(as, Resource.Global, Permission.Admin)
        val arr = mapper.createArrayNode()
        secured.rbac.getPermissions.foreach { r =>
          val n = arr.addObject()
          n.put("credential", r.credential.repr)
          n.put("resource", r.resource.repr)
          n.put("resourceKind", Resource.kindOf(r.resource))
          n.put("permission", r.permission.repr)
          n.put("requestor", r.requestor.repr)
          n.put("reason", r.reason)
        }
        respond(ex, 200, arr)
      case "POST" =>
        secured.rbac.grantPermission(record(readBody(ex)))
        respond(ex, 201, mapper.createObjectNode())
      case "DELETE" =>
        secured.rbac.revokePermission(record(readBody(ex)))
        respond(ex, 200, mapper.createObjectNode())
      case m => error(ex, 405, s"unsupported: $m /userroles")
    }
  }
}
