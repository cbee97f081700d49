package graft.registry

import com.fasterxml.jackson.databind.ObjectMapper

import java.sql.{Connection, DriverManager}

/** R5-lite: registry persistence to the reference's SQL relations —
  * `entities(entity_id, entity_content)`, `edges(from_id, to_id,
  * edge_type)`, `userroles(project_name, user_name, role_name,
  * create_by, create_reason, create_time, delete_*)` — per
  * registry/scripts/mssql.sql:1-16 and the sql-provider's
  * entity-as-JSON-content storage model. Typed for embedded Derby
  * (nvarchar(max) → long varchar, datetime → timestamp, int identity →
  * generated-always identity); any JDBC database with these four types
  * works.
  *
  * The in-process semantics stay in [[InMemoryRegistry]]/[[InMemoryRbac]]
  * (the reference keeps the same split: sql-provider is storage, the
  * graph/FTS/RBAC logic lives above it); save/load snapshot the whole
  * catalog — registry metadata is KB-scale, so a full snapshot per
  * save is simpler and safer than row-level DML, and save is
  * transactional (single commit: a crashed save leaves the previous
  * catalog intact).
  *
  * One deviation, documented: the reference's `project_name` column
  * holds project names only (its RBAC is project-scoped); this
  * engine's resources are global/project/entity, so the column stores
  * `<kind>:<repr>` — the same explicit discriminator the JSON
  * persistence carries, for the same reason (a project NAMED like a
  * UUID must not re-sniff as an entity guid on load).
  */
object SqlRegistryStore {
  private val mapper = new ObjectMapper()

  private def connect(url: String): Connection = {
    // derbytools registers the embedded driver via ServiceLoader; the
    // explicit load keeps exotic classloader setups working
    try Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
    catch { case _: ClassNotFoundException => () }
    DriverManager.getConnection(url)
  }

  /** Reference DDL, Derby-typed. Idempotent (Derby has no CREATE TABLE
    * IF NOT EXISTS; the duplicate-table error X0Y32 is swallowed).
    */
  private def ensureTables(c: Connection): Unit = {
    val ddl = Seq(
      """create table entities (
        |  entity_id      varchar(50) not null primary key,
        |  entity_content long varchar not null)""".stripMargin,
      """create table edges (
        |  from_id   varchar(50) not null,
        |  to_id     varchar(50) not null,
        |  edge_type varchar(50) not null,
        |  constraint edges_pk primary key (from_id, to_id, edge_type))""".stripMargin,
      """create table userroles (
        |  record_id     int generated always as identity,
        |  project_name  varchar(100) not null,
        |  user_name     varchar(100) not null,
        |  role_name     varchar(100) not null,
        |  create_by     varchar(100) not null,
        |  create_reason long varchar not null,
        |  create_time   timestamp not null,
        |  delete_by     varchar(100),
        |  delete_reason long varchar,
        |  delete_time   timestamp)""".stripMargin)
    val st = c.createStatement()
    try ddl.foreach { sql =>
      try st.executeUpdate(sql)
      catch {
        case e: java.sql.SQLException if e.getSQLState == "X0Y32" => ()
      }
    } finally st.close()
  }

  /** Snapshot the catalog into the SQL store — one transaction. */
  def save(reg: InMemoryRegistry, rbac: InMemoryRbac, url: String): Unit = {
    val c = connect(url)
    try {
      c.setAutoCommit(false)
      ensureTables(c)
      val st = c.createStatement()
      try Seq("userroles", "edges", "entities")
        .foreach(t => st.executeUpdate(s"delete from $t"))
      finally st.close()

      val entIns = c.prepareStatement(
        "insert into entities (entity_id, entity_content) values (?, ?)")
      try reg.allEntities.foreach { e =>
        val n = mapper.createObjectNode()
        RegistryPersistence.entityInto(n, e) // the ONE entity-JSON shape
        entIns.setString(1, e.guid)
        entIns.setString(2, mapper.writeValueAsString(n))
        entIns.executeUpdate()
      } finally entIns.close()

      val edgeIns = c.prepareStatement(
        "insert into edges (from_id, to_id, edge_type) values (?, ?, ?)")
      try reg.allEdges.foreach { e =>
        edgeIns.setString(1, e.from); edgeIns.setString(2, e.to)
        edgeIns.setString(3, e.edgeType)
        edgeIns.executeUpdate()
      } finally edgeIns.close()

      val roleIns = c.prepareStatement(
        "insert into userroles (project_name, user_name, role_name, " +
          "create_by, create_reason, create_time) values (?, ?, ?, ?, ?, ?)")
      try rbac.getPermissions.foreach { r =>
        roleIns.setString(1,
          s"${Resource.kindOf(r.resource)}:${r.resource.repr}")
        roleIns.setString(2, r.credential.repr)
        roleIns.setString(3, r.permission.repr)
        roleIns.setString(4, r.requestor.repr)
        roleIns.setString(5, r.reason)
        roleIns.setTimestamp(6, new java.sql.Timestamp(r.timeMillis))
        roleIns.executeUpdate()
      } finally roleIns.close()

      c.commit()
    } catch {
      case t: Throwable =>
        try c.rollback() catch { case _: Throwable => () }
        throw t
    } finally c.close()
  }

  /** Rebuild the in-process catalog (graph, FTS index, RBAC store)
    * from the SQL relations.
    */
  def load(url: String): (InMemoryRegistry, InMemoryRbac) = {
    val c = connect(url)
    try {
      ensureTables(c)
      val reg = new InMemoryRegistry
      val st = c.createStatement()
      try {
        val ents = st.executeQuery(
          "select entity_id, entity_content from entities")
        while (ents.next())
          reg.loadEntity(RegistryPersistence.entityFrom(
            ents.getString(1), mapper.readTree(ents.getString(2))))
        ents.close()
        val edges = st.executeQuery(
          "select from_id, to_id, edge_type from edges")
        while (edges.next())
          reg.link(edges.getString(1), edges.getString(2), edges.getString(3))
        edges.close()
        val rbac = new InMemoryRbac
        val roles = st.executeQuery(
          "select project_name, user_name, role_name, create_by, " +
            "create_reason, create_time from userroles " +
            "where delete_time is null order by record_id")
        val recs = Iterator.continually(roles)
          .takeWhile(_.next())
          .map { rs =>
            val Array(kind, repr) = rs.getString(1).split(":", 2)
            RbacRecord(
              Credential.parse(rs.getString(2)),
              Resource.fromKind(kind, repr),
              Permission.parse(rs.getString(3)),
              Credential.parse(rs.getString(4)),
              rs.getString(5),
              rs.getTimestamp(6).getTime)
          }.toList
        roles.close()
        rbac.loadPermissions(recs)
        (reg, rbac)
      } finally st.close()
    } finally c.close()
  }
}
