package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The `spark.sql.extensions` deployment path: a session built with
  * ONLY the extensions config (no register() calls anywhere) resolves
  * every graft function from SQL text, and the injected builders are
  * the same ones per-session registration binds.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    // a dedicated session: the suite must prove functions resolve with
    // NO per-session registration, so it cannot share SparkSpec's
    // session (other suites register() on it, and getOrCreate would
    // hand that one back with the extensions config silently ignored).
    // Clearing the default forces a NEW SparkSession — still on the
    // shared SparkContext, so this is cheap — and the previous default
    // is restored for the other suites.
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val s = graft.GraftSession.builder("4")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    prevDefault.foreach(SparkSession.setDefaultSession)
    prevActive.foreach(SparkSession.setActiveSession)
    s.newSession() // clone proves injection survives newSession()
  }

  test("every graft function resolves from SQL with no register() call") {
    val reg = spark.sessionState.functionRegistry
    GraftFunctions.all.foreach { case (name, _) =>
      assert(reg.lookupFunctionBuilder(
        org.apache.spark.sql.catalyst.FunctionIdentifier(name)).isDefined,
        s"$name not injected")
    }
  }

  test("injected functions compute: dot, minhash, normalize, bloom") {
    import spark.implicits._
    Seq((Array(1f, 2f, 3f), Array(4f, 5f, 6f), "café", 42L))
      .toDF("a", "b", "t", "x").createOrReplaceTempView("v")
    val row = spark.sql(
      """SELECT graft_dot(a, b) AS d,
        |  size(graft_minhash_sigs(array('x','y','z'), 8)) AS k,
        |  graft_unicode_normalize(t, 'NFD') AS n,
        |  graft_bloom_might_contain(
        |    (SELECT graft_bloom_agg(x, 64L, 4096L) FROM v), x) AS hit
        |FROM v""".stripMargin).head()
    assert(row.getDouble(0) == 1.0 * 4 + 2.0 * 5 + 3.0 * 6)
    assert(row.getInt(1) == 8)
    assert(row.getString(2) == "café")
    assert(row.getBoolean(3))
  }
}
