package graft

import java.nio.file.Files

import scala.collection.mutable

import org.apache.spark.sql.functions._

import graft.model.ConfigLoader
import graft.sink.UpsertSink
import graft.sources.Transport
import graft.streaming._
import graft.sync.Syncer

/** The full reference lifecycle in one flow (SURVEY §3): initial sync,
  * CDC-driven selective re-sync on new blocks, proposal-state reconcile
  * against the chain, and reorg-triggered rebuild — all over mock
  * chain/subgraph boundaries.
  */
class EndToEndSpec extends SparkSpec {

  import spark.implicits._

  private val yaml =
    """database: { batchSize: 100, maxRetries: 1, initialRetryDelay: 1 }
      |subgraphProviders:
      |  main: { url: "http://x", maxRowsPerRequest: 100, id: sub, apiKey: k }
      |entities:
      |  - name: Builder
      |    primaryKey: [id]
      |    subgraphProvider: main
      |    columns:
      |      - { name: id, type: String }
      |      - { name: totalAllocation, type: BigInt }
      |""".stripMargin

  /** Mutable "subgraph" whose contents evolve between blocks. */
  private final class EvolvingSubgraph extends Transport {
    @volatile var builders: Seq[(String, String)] = Seq("b1" -> "100", "b2" -> "200")
    val changeBlockFilters: mutable.Buffer[String] = mutable.Buffer.empty
    def post(endpoint: String, body: String): String = {
      if (body.contains("_change_block")) changeBlockFilters += body
      val rows = builders.map { case (id, alloc) =>
        s"""{"id": "$id", "totalAllocation": "$alloc"}"""
      }.mkString(",")
      s"""{"data": {"builders_0": [$rows]}}"""
    }
  }

  test("sync -> CDC selective re-sync -> reconcile -> reorg rebuild") {
    val cfg = ConfigLoader.load(yaml)
    val sink = new UpsertSink(spark, Files.createTempDirectory("graft_e2e").toString)
    val graphql = new EvolvingSubgraph
    val syncer = new Syncer(spark, cfg, graphql, sink)

    // --- 1. initial full sync (§3.1)
    assert(syncer.syncAll() == Map("Builder" -> 2L))
    assert(sink.read("Builder").count() == 2)

    // --- 2. a new block updates Builder; the change log names it (T4)
    graphql.builders = Seq("b1" -> "150", "b2" -> "200", "b3" -> "50")
    val changeLog = Seq(
      ("0xaaa", BigDecimal(11), Seq("Builder")),
      ("0xbbb", BigDecimal(10), Seq("SomethingUnknown"))
    ).toDF("id", "blockNumber", "updatedEntities")
    val changed = ChangeLog.changedEntities(changeLog, fromBlock = BigInt(10),
      known = cfg.schema.entities.keySet)
    assert(changed == Set("Builder"))
    syncer.syncChanged(changed, fromBlock = BigInt(11))
    // incremental predicate reached the wire; merged state reflects block 11
    assert(graphql.changeBlockFilters.exists(_.contains("number_gte: 11")))
    val allocs = sink.read("Builder").select("id", "totalAllocation")
      .as[(String, BigDecimal)].collect().toMap
    assert(allocs.view.mapValues(_.toBigInt).toMap ==
      Map("b1" -> BigInt(150), "b2" -> BigInt(200), "b3" -> BigInt(50)))

    // --- 3. proposal-state reconcile against the chain (§3.3)
    val proposals = Seq(("p1", 1, "Active"), ("p2", 1, "Active"))
      .toDF("id", "rawState", "state")
    val updates = StateReconcile.reconcile(spark, proposals,
      Map("p1" -> 7, "p2" -> 1))
    sink.createIfMissing("Proposal", proposals)
    sink.merge("Proposal", updates, Seq("id"))
    val states = sink.read("Proposal").select("id", "state")
      .as[(String, String)].collect().toMap
    assert(states == Map("p1" -> "Executed", "p2" -> "Active"))

    // --- 4. reorg: stored head hash contradicts the chain -> rebuild (T7)
    val chain = new BlockSource {
      def latest(): Block = Block(BigInt(20), "0xREAL20", BigInt(0))
      def hashAt(n: BigInt): String = s"0xREAL$n"
      def blockAt(n: BigInt): Block = Block(n, hashAt(n), BigInt(0))
      def multicall(ids: Seq[String]): Map[String, Int] = Map.empty
    }
    graphql.builders = Seq("b1" -> "111") // canonical chain disagrees
    val guard = new ReorgGuard(chain, sink)
    val fired = guard.check(Some(Block(BigInt(19), "0xORPHANED", BigInt(0)))) { () =>
      // full rebuild = re-run the initial sync into replacement tables
      val records = graphql.builders.map { case (id, a) =>
        Map[String, Any]("id" -> id, "totalAllocation" -> BigInt(a))
      }
      Map("Builder" -> graft.sources.SubgraphSource.toDataFrame(
        spark, cfg.schema, cfg.schema("Builder"), records))
    }
    assert(fired)
    val rebuilt = sink.read("Builder").as[(String, BigDecimal)].collect()
    assert(rebuilt.map(_._1).toSeq == Seq("b1")) // orphaned rows are gone
  }

  // --- composite primary key through the full lifecycle (J2/K1) -------
  // The reference's Vote shape (schema.test.ts "composite primary
  // keys"): primaryKey [proposalId, voterId], no surrogate id. The
  // merge must conflict on BOTH columns — a re-sync that changes one
  // vote and adds a second vote on the SAME proposal from a different
  // voter must update in place without clobbering the proposal's other
  // votes.

  private val voteYaml =
    """database: { batchSize: 100, maxRetries: 1, initialRetryDelay: 1 }
      |subgraphProviders:
      |  main: { url: "http://x", maxRowsPerRequest: 100, id: sub, apiKey: k }
      |entities:
      |  - name: Vote
      |    primaryKey: [proposalId, voterId]
      |    subgraphProvider: main
      |    columns:
      |      - { name: proposalId, type: String }
      |      - { name: voterId, type: Bytes }
      |      - { name: support, type: Boolean }
      |""".stripMargin

  private final class VoteSubgraph extends Transport {
    @volatile var votes: Seq[(String, String, Boolean)] =
      Seq(("p1", "0x0a", true), ("p1", "0x0b", false), ("p2", "0x0a", true))
    def post(endpoint: String, body: String): String = {
      val rows = votes.map { case (p, v, s) =>
        s"""{"proposalId": "$p", "voterId": "$v", "support": $s}"""
      }.mkString(",")
      s"""{"data": {"votes_0": [$rows]}}"""
    }
  }

  test("composite-PK entity syncs and merges on the FULL key") {
    val cfg = ConfigLoader.load(voteYaml)
    val sink = new UpsertSink(spark,
      Files.createTempDirectory("graft_e2e_comp").toString)
    val graphql = new VoteSubgraph
    val syncer = new Syncer(spark, cfg, graphql, sink)

    assert(syncer.syncAll() == Map("Vote" -> 3L))
    def state(): Map[(String, String), Boolean] =
      sink.read("Vote").select("proposalId", "voterId", "support")
        .as[(String, Array[Byte], Boolean)].collect()
        .map { case (p, v, s) =>
          (p, graft.sources.SubgraphSource.bytesToHex(v)) -> s
        }.toMap
    val first = state()
    // Bytes PK component coerced to binary on the way in, and all three
    // (proposalId, voterId) combinations landed as distinct rows
    assert(first == Map(("p1", "0x0a") -> true, ("p1", "0x0b") -> false,
      ("p2", "0x0a") -> true))

    // re-sync: voter 0x0b flips their p1 vote, and a NEW voter 0x0c
    // votes on p1. Conflict must hit (proposalId, voterId) — a merge
    // keyed on either column alone would collapse p1's votes.
    graphql.votes = Seq(("p1", "0x0a", true), ("p1", "0x0b", true),
      ("p2", "0x0a", true), ("p1", "0x0c", false))
    assert(syncer.syncEntity(cfg.schema("Vote")) == 4L)
    assert(state() == Map(("p1", "0x0a") -> true, ("p1", "0x0b") -> true,
      ("p2", "0x0a") -> true, ("p1", "0x0c") -> false))
  }
}
