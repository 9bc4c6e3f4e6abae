package graft.sink

import scala.collection.mutable.ArrayBuffer

import org.scalatest.funsuite.AnyFunSuite

/** P7 schema swap + grant re-application through the connection seam
  * (reference schema.ts semantics) — pure driver-side admin, no Spark.
  */
class SchemaAdminSpec extends AnyFunSuite {

  /** Records every statement; serves a canned grantee list; can be told
    * to fail on a given statement prefix to test rollback.
    */
  private class AdminConn(grantees: Seq[String],
                          failOn: Option[String] = None,
                          usageGrantees: Seq[String] = Nil) extends SqlConnection {
    val statements = ArrayBuffer.empty[String]
    var closed = false
    override def executeUpdate(sql: String, params: Seq[Any]): Int = {
      statements += sql
      failOn.foreach(p => if (sql.startsWith(p)) sys.error(s"boom: $sql"))
      0
    }
    override def executeQuery(sql: String, params: Seq[Any]): Seq[Seq[Any]] = {
      statements += sql
      if (sql.contains("information_schema.role_table_grants")) {
        assert(params == Seq("old_live", "SELECT"))
        grantees.map(Seq(_))
      } else {
        assert(sql.contains("has_schema_privilege"), s"unexpected query: $sql")
        assert(params == Seq("old_live"))
        usageGrantees.map(Seq(_))
      }
    }
    override def close(): Unit = closed = true
  }

  private class AdminFactory(conn: AdminConn) extends SqlConnectionFactory {
    override def connect(): SqlConnection = conn
  }

  test("createSchema issues CREATE SCHEMA IF NOT EXISTS, quoted") {
    val conn = new AdminConn(Nil)
    new SchemaAdmin(new AdminFactory(conn)).createSchema("shadow")
    assert(conn.statements == Seq("""CREATE SCHEMA IF NOT EXISTS "shadow""""))
    assert(conn.closed)
  }

  test("switchSchema: rename-rename-regrant-drop inside one transaction") {
    val conn = new AdminConn(Seq("reader", "grafana"))
    val users = new SchemaAdmin(new AdminFactory(conn))
      .switchSchema("shadow", "live")
    assert(users == Seq("reader", "grafana"))
    val s = conn.statements.toSeq
    assert(s.head == "BEGIN" && s.last == "COMMIT")
    val renames = Seq(
      """ALTER SCHEMA "live" RENAME TO "old_live"""",
      """ALTER SCHEMA "shadow" RENAME TO "live"""")
    assert(s.slice(1, 3) == renames)
    // 5 grant statements per discovered role, all against the promoted name
    val grants = s.filter(x => x.startsWith("GRANT") || x.startsWith("ALTER DEFAULT"))
    assert(grants.size == 10)
    assert(grants.count(_.contains(""""reader"""")) == 5)
    assert(grants.count(_.contains(""""grafana"""")) == 5)
    assert(grants.forall(_.contains(""""live"""")))
    assert(grants.exists(_.startsWith("""GRANT USAGE ON SCHEMA "live" TO "reader"""")))
    assert(grants.exists(_ ==
      """ALTER DEFAULT PRIVILEGES IN SCHEMA "live" GRANT SELECT ON SEQUENCES TO "grafana""""))
    // old schema dropped after grants, before commit
    assert(s.indexOf("""DROP SCHEMA IF EXISTS "old_live" CASCADE""") == s.size - 2)
  }

  test("no readers on the old schema -> swap still completes, zero grants") {
    val conn = new AdminConn(Nil)
    val users = new SchemaAdmin(new AdminFactory(conn)).switchSchema("shadow", "live")
    assert(users.isEmpty)
    assert(!conn.statements.exists(_.startsWith("GRANT")))
    assert(conn.statements.last == "COMMIT")
  }

  test("a failing statement rolls the transaction back and rethrows") {
    val conn = new AdminConn(Seq("reader"), failOn = Some("DROP SCHEMA"))
    val ex = intercept[RuntimeException] {
      new SchemaAdmin(new AdminFactory(conn)).switchSchema("shadow", "live")
    }
    assert(ex.getMessage.contains("boom"))
    assert(conn.statements.last == "ROLLBACK")
    assert(!conn.statements.contains("COMMIT"))
    assert(conn.closed)
  }

  test("USAGE-only readers (no table grants yet) are still carried over") {
    // a role granted access while the schema was empty has no
    // role_table_grants rows; discovery must still find it via
    // has_schema_privilege or it silently loses access on promote
    val conn = new AdminConn(Nil, usageGrantees = Seq("early_reader"))
    val users = new SchemaAdmin(new AdminFactory(conn)).switchSchema("shadow", "live")
    assert(users == Seq("early_reader"))
    assert(conn.statements.exists(
      _ == """GRANT USAGE ON SCHEMA "live" TO "early_reader""""))
  }

  test("PUBLIC pseudo-role is granted unquoted (quoted it is a missing role)") {
    val conn = new AdminConn(Seq("PUBLIC"))
    new SchemaAdmin(new AdminFactory(conn)).switchSchema("shadow", "live")
    val grants = conn.statements.filter(_.startsWith("GRANT"))
    assert(grants.exists(_ == """GRANT USAGE ON SCHEMA "live" TO PUBLIC"""),
      s"PUBLIC wrongly quoted: $grants")
    assert(!grants.exists(_.contains("\"PUBLIC\"")))
  }

  test("identifiers with embedded quotes are escaped, not injected") {
    val conn = new AdminConn(Nil)
    new SchemaAdmin(new AdminFactory(conn)).createSchema("""we"ird""")
    assert(conn.statements == Seq("""CREATE SCHEMA IF NOT EXISTS "we""ird""""))
  }

  test("writer-only connections reject executeQuery by default") {
    val writerOnly = new SqlConnection {
      override def executeUpdate(sql: String, params: Seq[Any]): Int = 0
      override def close(): Unit = ()
    }
    intercept[UnsupportedOperationException] {
      writerOnly.executeQuery("SELECT 1", Nil)
    }
  }
}
