package graft.sync

import java.nio.file.Files

import scala.collection.mutable

import graft.SparkSpec
import graft.model.ConfigLoader
import graft.sink.UpsertSink
import graft.sources.Transport

/** End-to-end batch sync over a mock subgraph: config -> paginated fetch
  * -> FK flatten -> PK merge (the §3.1 lifecycle).
  */
class SyncerSpec extends SparkSpec {

  private val yaml =
    """database:   { batchSize: 100, maxRetries: 1, initialRetryDelay: 1 }
      |subgraphProviders:
      |  main: { url: "http://x", maxRowsPerRequest: 2, id: sub, apiKey: k }
      |entities:
      |  - name: Builder
      |    primaryKey: [id]
      |    subgraphProvider: main
      |    columns:
      |      - { name: id, type: String }
      |      - { name: totalAllocation, type: BigInt }
      |  - name: Proposal
      |    primaryKey: [id]
      |    subgraphProvider: main
      |    columns:
      |      - { name: id, type: String }
      |      - { name: builder, type: Builder }
      |  - name: LastProcessedBlock
      |    primaryKey: [id]
      |    subgraphProvider: main
      |    columns: [{ name: id, type: Boolean }]
      |""".stripMargin

  /** Mock subgraph: serves builders (3 rows -> 2 pages at pageSize 2) and
    * proposals with nested FK objects; records every request body.
    */
  private final class FakeSubgraph extends Transport {
    val requests: mutable.Buffer[String] = mutable.Buffer.empty
    def post(endpoint: String, body: String): String = {
      requests += body
      if (body.contains("builders_0")) {
        if (!body.contains("""id_gt: \"b2\"""))
          """{"data": {"builders_0": [
            |{"id": "b1", "totalAllocation": "1000000000000000000"},
            |{"id": "b2", "totalAllocation": "2000000000000000000"}]}}""".stripMargin
        else """{"data": {"builders_0": [{"id": "b3", "totalAllocation": "3"}]}}"""
      } else if (body.contains("proposals_0")) {
        // exactly pageSize rows on page 1 -> the syncer MUST request a
        // follow-up page; serve it empty (short page ends the loop)
        if (body.contains("""id_gt: \"p2\""""))
          """{"data": {"proposals_0": []}}"""
        else
          """{"data": {"proposals_0": [
            |{"id": "p1", "builder": {"id": "b1"}, "ignored": 1},
            |{"id": "p2", "builder": {"id": "b3"}}]}}""".stripMargin
      } else """{"data": {}}"""
    }
  }

  test("syncAll: pages, flattens, merges every entity except LastProcessedBlock") {
    import spark.implicits._
    val cfg = ConfigLoader.load(yaml)
    val sink = new UpsertSink(spark, Files.createTempDirectory("graft_sync").toString)
    val transport = new FakeSubgraph
    val syncer = new Syncer(spark, cfg, transport, sink)

    val counts = syncer.syncAll()
    assert(counts == Map("Builder" -> 3L, "Proposal" -> 2L))
    assert(!sink.exists("LastProcessedBlock"))

    val builders = sink.read("Builder").select("id", "totalAllocation")
      .as[(String, BigDecimal)].collect().sortBy(_._1)
    assert(builders.map(_._1).toSeq == Seq("b1", "b2", "b3"))
    assert(builders.head._2 == BigDecimal("1000000000000000000"))

    val proposals = sink.read("Proposal").as[(String, String)]
      .collect().sortBy(_._1)
    assert(proposals.toSeq == Seq(("p1", "b1"), ("p2", "b3"))) // FK flattened

    // keyset pagination: builders took 2 requests (full page then short)
    assert(transport.requests.count(_.contains("builders_0")) == 2)
  }

  test("re-running sync is idempotent; selective sync filters by change set") {
    val cfg = ConfigLoader.load(yaml)
    val sink = new UpsertSink(spark, Files.createTempDirectory("graft_sync2").toString)
    val syncer = new Syncer(spark, cfg, new FakeSubgraph, sink)
    syncer.syncAll()
    syncer.syncAll()
    assert(sink.read("Builder").count() == 3)

    val transport = new FakeSubgraph
    val syncer2 = new Syncer(spark, cfg, transport,
      new UpsertSink(spark, Files.createTempDirectory("graft_sync3").toString))
    val counts = syncer2.syncChanged(Set("Proposal"), BigInt(12345))
    assert(counts.keySet == Set("Proposal"))
    // incremental predicate pushed into the generated query (P4)
    assert(transport.requests.exists(r =>
      r.contains("_change_block") && r.contains("number_gte: 12345")))
  }
}
