package graft

import graft.registry._
import org.scalatest.funsuite.AnyFunSuite

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

/** End-to-end HTTP coverage for the R5-lite REST facade: CRUD, lineage,
  * search, and userrole verbs over a live (ephemeral-port) server, with
  * RBAC enforced per request via the `x-registry-requestor` header.
  */
class RestApiSpec extends AnyFunSuite {

  private val client = HttpClient.newHttpClient()

  private def send(port: Int, method: String, path: String,
      as: Option[String] = None, body: Option[String] = None): (Int, String) = {
    val b = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
      .method(method, body.map(HttpRequest.BodyPublishers.ofString(_))
        .getOrElse(HttpRequest.BodyPublishers.noBody()))
    as.foreach(b.header("x-registry-requestor", _))
    val r = client.send(b.build(), HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), r.body())
  }

  test("REST facade: CRUD + edges + lineage + search + userroles with RBAC") {
    val rbac = new InMemoryRbac
    rbac.loadPermissions(Seq(
      RbacRecord(Credential.User("alice"), Resource.Global, Permission.Admin,
        Credential.User("alice"), "boot", 0L),
      RbacRecord(Credential.User("bob"), Resource.NamedEntity("projA"),
        Permission.Read, Credential.User("alice"), "", 0L)))
    val api = new RegistryRestApi(
      new SecuredRegistry(new InMemoryRegistry, rbac)).start()
    val port = api.boundPort
    try {
      // create needs Write: bob (consumer) 403, alice 201
      val ent =
        """{"guid":"g1","typeName":"feathr_workspace_v1",
          |"name":"projA","qualifiedName":"projA",
          |"attributes":{"owner":"alice"}}""".stripMargin
      assert(send(port, "POST", "/entities", Some("bob"), Some(ent))._1 == 403)
      assert(send(port, "POST", "/entities", Some("alice"), Some(ent))._1 == 201)
      val feat =
        """{"guid":"g2","typeName":"feathr_anchor_feature_v1",
          |"name":"f_x","qualifiedName":"projA__anchor__f_x"}""".stripMargin
      assert(send(port, "POST", "/entities", Some("alice"), Some(feat))._1 == 201)

      // reads: consumer ok (by guid and by name), anonymous 403, missing 404
      val (gs, gb) = send(port, "GET", "/entities/g1", Some("bob"))
      assert(gs == 200 && gb.contains("\"owner\":\"alice\""))
      assert(send(port, "GET", "/entities?name=f_x", Some("bob"))._1 == 200)
      assert(send(port, "GET", "/entities/g1", None)._1 == 403)
      assert(send(port, "GET", "/entities/nope", Some("alice"))._1 == 404)

      // edges: producer-gated; unknown source 400
      val edge = """{"from":"g2","to":"g1","edgeType":"BelongsTo"}"""
      assert(send(port, "POST", "/edges", Some("bob"), Some(edge))._1 == 403)
      assert(send(port, "POST", "/edges", Some("alice"), Some(edge))._1 == 201)
      assert(send(port, "POST", "/edges", Some("alice"),
        Some("""{"from":"ghost","to":"g1","edgeType":"BelongsTo"}"""))._1 == 400)

      // lineage from the feature reaches the workspace
      val (ls, lb) = send(port, "GET", "/lineage/g2?direction=downstream", Some("bob"))
      assert(ls == 200 && lb.contains("\"guid\":\"g1\""))

      // search: bob sees projA hits, a stranger sees none
      val (ss, sb) = send(port, "GET", "/search?q=f_x", Some("bob"))
      assert(ss == 200 && sb.contains("g2"))
      val (ms, mb) = send(port, "GET", "/search?q=f_x", Some("mallory"))
      assert(ms == 200 && mb == "[]")

      // userroles: listing and granting are admin-gated
      assert(send(port, "GET", "/userroles", Some("bob"))._1 == 403)
      val (us, ub) = send(port, "GET", "/userroles", Some("alice"))
      assert(us == 200 && ub.contains("\"credential\":\"bob\""))
      val grant =
        """{"credential":"carol","resource":"projA","resourceKind":"name",
          |"permission":"producer","reason":"onboard"}""".stripMargin
      assert(send(port, "POST", "/userroles", Some("bob"), Some(grant))._1 == 403)
      assert(send(port, "POST", "/userroles", Some("alice"), Some(grant))._1 == 201)
      assert(rbac.checkPermission(Credential.User("carol"),
        Resource.NamedEntity("projA"), Permission.Write))
      assert(send(port, "DELETE", "/userroles", Some("alice"), Some(grant))._1 == 200)
      assert(!rbac.checkPermission(Credential.User("carol"),
        Resource.NamedEntity("projA"), Permission.Write))

      // delete needs admin; after it the entity is gone
      assert(send(port, "DELETE", "/entities/g2", Some("bob"))._1 == 403)
      assert(send(port, "DELETE", "/entities/g2", Some("alice"))._1 == 200)
      assert(send(port, "GET", "/entities/g2", Some("alice"))._1 == 404)
    } finally api.stop()
  }
}
