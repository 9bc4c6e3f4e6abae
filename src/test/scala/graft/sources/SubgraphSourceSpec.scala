package graft.sources

import scala.collection.mutable

import graft.SparkSpec
import graft.model._

/** Connector semantics with a mock transport — batching/demux/pagination/
  * degradation, mirroring batching.test.ts + subgraphSyncer.test.ts.
  */
class SubgraphSourceSpec extends SparkSpec {

  private val provider = ProviderConfig("main", "http://x", "sub-id", "key", 3)

  private val builder = EntityDef("Builder", Seq(
    ColumnDef("id", ColumnType.StringCol),
    ColumnDef("name", ColumnType.StringCol)), Seq("id"), "main")

  private val proposal = EntityDef("Proposal", Seq(
    ColumnDef("id", ColumnType.StringCol),
    ColumnDef("builder", ColumnType.Reference("Builder"), nullable = true)),
    Seq("id"), "main")

  private val schema = SchemaMap(Seq(builder, proposal))

  private final class CannedTransport(responses: Iterator[String]) extends Transport {
    val requests: mutable.Buffer[String] = mutable.Buffer.empty
    def post(endpoint: String, body: String): String = {
      requests += body
      responses.next()
    }
  }

  test("endpoint = url/apiKey/subgraphs/id/id") {
    val src = new SubgraphSource(provider, new CannedTransport(Iterator.empty))
    assert(src.endpoint == "http://x/key/subgraphs/id/sub-id")
  }

  test("batched response demuxes per alias and extracts _meta") {
    val body =
      """{"data": {"builders_0": [{"id": "1", "name": "a"}],
        |"proposals_1": [{"id": "2", "builder": {"id": "1"}}],
        |"_meta": {"block": {"number": 12345, "hash": "0xabc", "timestamp": 1710000000},
        |"deployment": "Qm", "hasIndexingErrors": false}}}""".stripMargin
    val src = new SubgraphSource(provider, new CannedTransport(Iterator(body)))
    val res = src.execute(Seq(
      SubgraphQueryBuilder.QuerySpec(builder), SubgraphQueryBuilder.QuerySpec(proposal)))
    assert(res.records("builders_0") == Seq(Map("id" -> "1", "name" -> "a")))
    assert(res.records("proposals_1").head("builder") == Map("id" -> "1"))
    assert(res.meta.contains(BlockMeta(BigInt(12345), "0xabc", BigInt(1710000000))))
  }

  test("one HTTP request per batch (5 queries -> 1 request, the 80% effect)") {
    val t = new CannedTransport(Iterator("""{"data": {}}"""))
    new SubgraphSource(provider, t).execute(Seq.fill(5)(
      SubgraphQueryBuilder.QuerySpec(builder)))
    assert(t.requests.size == 1)
    assert(t.requests.head.contains("builders_4"))
  }

  test("GraphQL errors / missing data / bad JSON degrade to empty AND flag failure") {
    val src = new SubgraphSource(provider, new CannedTransport(Iterator.empty))
    val errored = src.parseResponse("""{"data": {}, "errors": [{"message": "x"}]}""")
    assert(errored.records.isEmpty && errored.failed)
    assert(src.parseResponse("""{"something": 1}""").failed)
    assert(src.parseResponse("not json").failed)
    // a genuinely empty data object is NOT a failure
    assert(!src.parseResponse("""{"data": {}}""").failed)
  }

  test("transport failure degrades to empty result with the failed flag (R2)") {
    val src = new SubgraphSource(provider, (_, _) => throw new RuntimeException("down"))
    val res = src.execute(Seq(SubgraphQueryBuilder.QuerySpec(builder)))
    assert(res.records.isEmpty && res.failed)
  }

  test("keyset pagination: full pages chain via id_gt until a short page") {
    def page(ids: Seq[Int]): String =
      s"""{"data": {"builders_0": [${ids.map(i =>
        s"""{"id": "$i", "name": "n$i"}""").mkString(",")}]}}"""
    val t = new CannedTransport(Iterator(
      page(Seq(1, 2, 3)), page(Seq(4, 5, 6)), page(Seq(7))))
    val src = new SubgraphSource(provider, t) // maxRowsPerRequest = 3
    val all = src.fetchAll(builder)
    assert(all.map(_("id")) == Seq("1", "2", "3", "4", "5", "6", "7"))
    assert(t.requests.size == 3)
    assert(t.requests(1).contains("""id_gt: \"3\"""")
      || t.requests(1).contains("""id_gt: "3""""))
  }

  test("first page carries NO synthetic id_gt floor (ids like \"0\" survive)") {
    val t = new CannedTransport(Iterator(
      """{"data": {"builders_0": [{"id": "0", "name": "singleton"}]}}"""))
    val src = new SubgraphSource(provider, t)
    val all = src.fetchAll(builder)
    assert(all.map(_("id")) == Seq("0")) // "0" < "0x00": the old floor lost it
    assert(!t.requests.head.contains("id_gt"),
      s"synthetic start cursor present: ${t.requests.head}")
  }

  test("non-advancing keyset cursor throws instead of truncating silently") {
    def page(ids: Seq[String]): String =
      s"""{"data": {"builders_0": [${ids.map(i =>
        s"""{"id": "$i", "name": "n"}""").mkString(",")}]}}"""
    // server keeps returning the same full page: the cursor never advances
    val t = new CannedTransport(Iterator.continually(page(Seq("a", "b", "c"))))
    val src = new SubgraphSource(provider, t)
    val e = intercept[IllegalStateException] { src.fetchAll(builder) }
    assert(e.getMessage.contains("did not advance"))
  }

  test("non-string wire ids fail pagination loudly (keyset needs strings)") {
    def page(ids: Seq[Int]): String =
      s"""{"data": {"builders_0": [${ids.map(i =>
        s"""{"id": $i, "name": "n"}""").mkString(",")}]}}""" // numeric ids
    val t = new CannedTransport(Iterator.continually(page(Seq(1, 2, 3))))
    val src = new SubgraphSource(provider, t)
    val e = intercept[IllegalStateException] { src.fetchAll(builder) }
    assert(e.getMessage.contains("string id"))
  }

  test("batch failure falls back to individual queries (R3)") {
    // batch request fails; each single query succeeds
    val t = new Transport {
      var calls = 0
      def post(endpoint: String, body: String): String = {
        calls += 1
        if (body.contains("builders_1")) throw new RuntimeException("batch too big")
        else """{"data": {"builders_0": [{"id": "x", "name": "n"}]}}"""
      }
    }
    val src = new SubgraphSource(provider, t)
    val res = src.executeWithFallback(Seq(
      SubgraphQueryBuilder.QuerySpec(builder), SubgraphQueryBuilder.QuerySpec(builder)))
    assert(res.records.keySet == Set("builders_0", "builders_1"))
    assert(res.records.values.forall(_.nonEmpty))
    assert(!res.failed && res.failedKeys.isEmpty)
  }

  test("legitimately empty batch does NOT trigger individual fallback") {
    val t = new CannedTransport(Iterator("""{"data": {"builders_0": [], "builders_1": []}}"""))
    val src = new SubgraphSource(provider, t)
    val res = src.executeWithFallback(Seq(
      SubgraphQueryBuilder.QuerySpec(builder), SubgraphQueryBuilder.QuerySpec(builder)),
      withMetadata = false)
    assert(t.requests.size == 1) // no N individual re-requests for an empty table
    assert(!res.failed)
  }

  test("fallback names specs that still fail in failedKeys") {
    // every request fails: batch AND both individuals
    val src = new SubgraphSource(provider,
      (_, _) => throw new RuntimeException("down"),
      maxRetries = 0, sleep = _ => ())
    val res = src.executeWithFallback(Seq(
      SubgraphQueryBuilder.QuerySpec(builder), SubgraphQueryBuilder.QuerySpec(builder)))
    assert(res.failed)
    assert(res.failedKeys == Set("builders_0", "builders_1"))
  }

  test("mid-pagination failure retries, then throws — never truncates silently") {
    def page(ids: Seq[Int]): String =
      s"""{"data": {"builders_0": [${ids.map(i =>
        s"""{"id": "$i", "name": "n$i"}""").mkString(",")}]}}"""
    // page 1 full; page 2 fails forever -> fetchAll must throw, not
    // return the 3-row prefix as a complete scan
    var calls = 0
    val t = new Transport {
      def post(endpoint: String, body: String): String = {
        calls += 1
        if (calls == 1) page(Seq(1, 2, 3)) else throw new RuntimeException("down")
      }
    }
    val src = new SubgraphSource(provider, t, maxRetries = 2, sleep = _ => ())
    assertThrows[java.io.IOException] { src.fetchAll(builder) }
    assert(calls == 4) // 1 good page + 1 failed + 2 retries

    // transient failure: one error then recovery -> full result, no loss
    var calls2 = 0
    val t2 = new Transport {
      def post(endpoint: String, body: String): String = {
        calls2 += 1
        calls2 match {
          case 1 => page(Seq(1, 2, 3))
          case 2 => throw new RuntimeException("blip")
          case _ => page(Seq(4))
        }
      }
    }
    val src2 = new SubgraphSource(provider, t2, maxRetries = 2, sleep = _ => ())
    assert(src2.fetchAll(builder).map(_("id")) == Seq("1", "2", "3", "4"))
  }

  test("fetchAllBatched: one request serves all entities' first pages, full pages paginate on") {
    def rec(i: Int) = s"""{"id": "$i", "name": "n$i"}"""
    val t = new CannedTransport(Iterator(
      // batched doc: Builder full page (3 = maxRows), Proposal short page
      s"""{"data": {"builders_0": [${rec(1)},${rec(2)},${rec(3)}],
         |"proposals_1": [{"id": "p1", "builder": null}]}}""".stripMargin,
      // Builder keyset continuation
      s"""{"data": {"builders_0": [${rec(4)}]}}"""))
    val src = new SubgraphSource(provider, t)
    val res = src.fetchAllBatched(Seq(
      builder -> Map.empty[String, Any], proposal -> Map.empty[String, Any]))
    assert(res("Builder").map(_("id")) == Seq("1", "2", "3", "4"))
    assert(res("Proposal").map(_("id")) == Seq("p1"))
    assert(t.requests.size == 2) // 1 batched + 1 continuation, not 1-per-entity
    assert(t.requests.head.contains("proposals_1"))
  }

  test("bytesToHex is the inverse of hexToBytes (canonical lowercase)") {
    val bytes = Array(0x0a.toByte, 0xff.toByte, 0x00.toByte)
    assert(SubgraphSource.bytesToHex(bytes) == "0x0aff00")
    assert(SubgraphSource.hexToBytes(SubgraphSource.bytesToHex(bytes)).toSeq == bytes.toSeq)
  }

  test("metrics: batching reduction = 1 - http/queries (the 80% effect)") {
    val t = new CannedTransport(Iterator.continually("""{"data": {"x_0": []}}""").take(5))
    val src = new SubgraphSource(provider, t)
    src.execute(Seq.fill(5)(SubgraphQueryBuilder.QuerySpec(builder)))
    assert(src.metrics.queries.get == 5)
    assert(src.metrics.httpRequests.get == 1)
    assert(math.abs(src.metrics.batchingReduction - 0.8) < 1e-9)
  }

  test("toDataFrame flattens FK objects and drops unknown fields") {
    val records = Seq(
      Map[String, Any]("id" -> "p1", "builder" -> Map("id" -> "b1"),
        "extraneousField" -> "dropped"),
      Map[String, Any]("id" -> "p2", "builder" -> null))
    val df = SubgraphSource.toDataFrame(spark, schema, proposal, records)
    assert(df.columns.toSeq == Seq("id", "builder"))
    val rows = df.collect().sortBy(_.getString(0))
    assert(rows(0).getString(1) == "b1")
    assert(rows(1).isNullAt(1))
  }

  test("toDataFrame coerces wire types: hex->bytes, bigint->decimal, arrays") {
    val e = EntityDef("E", Seq(
      ColumnDef("id", ColumnType.BytesCol),
      ColumnDef("amount", ColumnType.BigIntCol),
      ColumnDef("tags", ColumnType.ArrayCol(ColumnType.StringCol)),
      ColumnDef("day", ColumnType.IntegerCol)), Seq("id"), "main")
    val sm = SchemaMap(Seq(e))
    // 38 nines: the widest value under the DecimalType(38,0) policy
    // (SURVEY §1.2 — full uint256 needs 78 digits and does NOT fit).
    val wide = "9" * 38
    val df = SubgraphSource.toDataFrame(spark, sm, e, Seq(Map[String, Any](
      "id" -> "0x0a1b", "amount" -> BigInt(wide),
      "tags" -> Seq("x", "y"), "day" -> BigInt(7))))
    val r = df.head()
    assert(r.getAs[Array[Byte]]("id").toSeq == Seq(0x0a.toByte, 0x1b.toByte))
    assert(r.getDecimal(1).toBigInteger.toString == wide)
    assert(r.getSeq[String](2) == Seq("x", "y"))
    assert(r.getInt(3) == 7)
  }

  test("toDataFrame rejects BigInt beyond the Decimal(38,0) policy width") {
    val e = EntityDef("E", Seq(
      ColumnDef("id", ColumnType.StringCol),
      ColumnDef("amount", ColumnType.BigIntCol)), Seq("id"), "main")
    val sm = SchemaMap(Seq(e))
    assertThrows[Exception] {
      SubgraphSource.toDataFrame(spark, sm, e, Seq(Map[String, Any](
        "id" -> "x", "amount" -> BigInt("9" * 39)))).collect()
    }
  }
}
