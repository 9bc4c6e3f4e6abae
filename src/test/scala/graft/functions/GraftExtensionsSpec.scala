package graft.functions

import graft.SparkSpec

/** The `spark.sql.extensions` deployment path: GraftSession ships
  * `graft.functions.GraftExtensions` in its builder, so every session
  * it produces — and every `newSession()` CLONE, which per-session
  * temp-function registration would NOT survive — resolves graft_*
  * functions from SQL text with no register() call. The clone is the
  * discriminating assertion: a temp-registered function dies with the
  * session it was registered on; an injected built-in does not.
  *
  * (Spark reads `spark.sql.extensions` from the SparkContext's conf,
  * i.e. at context creation — GraftSession's scaladoc documents the
  * foreign-context fallback to the modules' idempotent register().)
  */
class GraftExtensionsSpec extends SparkSpec {

  // a FRESH clone: no suite has registered anything on it, so only
  // extension-injected built-ins can resolve here
  private lazy val cloned = spark.newSession()

  test("every graft function resolves in a newSession() clone, unregistered") {
    val reg = cloned.sessionState.functionRegistry
    GraftFunctions.all.foreach { case (name, _) =>
      assert(reg.lookupFunctionBuilder(
        org.apache.spark.sql.catalyst.FunctionIdentifier(name)).isDefined,
        s"$name not injected")
    }
  }

  test("injected functions compute from SQL: dot, minhash, normalize, bloom") {
    val session = cloned
    import session.implicits._
    Seq((Array(1f, 2f, 3f), Array(4f, 5f, 6f), "café", 42L))
      .toDF("a", "b", "t", "x").createOrReplaceTempView("v")
    val row = session.sql(
      """SELECT graft_dot(a, b) AS d,
        |  size(graft_minhash_sigs(array('x','y','z'), 8)) AS k,
        |  graft_unicode_normalize(t, 'NFD') AS n,
        |  graft_bloom_might_contain(
        |    (SELECT graft_bloom_agg(x, 64L, 4096L) FROM v), x) AS hit
        |FROM v""".stripMargin).head()
    assert(row.getDouble(0) == 1.0 * 4 + 2.0 * 5 + 3.0 * 6)
    assert(row.getInt(1) == 8)
    assert(row.getString(2) == "café") // NFD decomposes the e-acute
    assert(row.getBoolean(3))
  }

  test("round-8 functions compute from SQL: int8 cosine, BPE tokens") {
    val row = cloned.sql(
      """SELECT graft_int8_cos(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |    array(CAST(2 AS TINYINT), CAST(4 AS TINYINT))) AS c,
        |  graft_bpe_tokens('lowest low', array('e s', 'es t</w>', 'l o')) AS t
        |""".stripMargin).head()
    // parallel vectors -> cosine exactly 1
    assert(math.abs(row.getDouble(0) - 1.0) < 1e-12)
    assert(row.getSeq[String](1) ==
      Seq("lo", "w", "est</w>", "lo", "w</w>"))
  }
}
