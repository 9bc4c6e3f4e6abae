package graft.model

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The shipped production schema (config/entities.yml) — the reference's
  * full 26-entity model — loads, validates, and resolves.
  */
class ProductionConfigSpec extends AnyFunSuite {

  private lazy val cfg = ConfigLoader.load(
    Files.readString(Paths.get("config/entities.yml")))

  test("all 26 entities across 3 providers load and validate") {
    assert(cfg.schema.entities.size == 26)
    val byProvider = cfg.schema.entities.values.groupBy(_.subgraphProvider)
      .view.mapValues(_.size).toMap
    assert(byProvider == Map(
      "collective-rewards" -> 21, "governance" -> 4, "usd-vault" -> 1))
    assert(cfg.schema.validate().isEmpty)
  }

  test("every entity resolves to a StructType (FKs included)") {
    cfg.schema.entities.keys.foreach { name =>
      val st = cfg.schema.structTypeOf(name)
      assert(st.fields.nonEmpty, s"$name resolved to empty struct")
    }
  }

  test("spot checks: singleton PK, CDC array column, FK chains, nullable") {
    assert(cfg.schema.structTypeOf("LastProcessedBlock")("id").dataType
      == BooleanType)
    assert(cfg.schema.structTypeOf("BlockChangeLog")("updatedEntities").dataType
      == ArrayType(StringType, containsNull = false))
    // VoteCast.proposal -> Proposal.id (Bytes)
    assert(cfg.schema.structTypeOf("VoteCast")("proposal").dataType == BinaryType)
    // Proposal arrays of BigInt -> decimal(38,0)
    assert(cfg.schema.structTypeOf("Proposal")("values").dataType
      == ArrayType(DecimalType(38, 0), containsNull = false))
    // the single nullable column in the production schema
    val crh = cfg.schema.structTypeOf("ClaimedRewardsHistory")
    assert(crh("backer").nullable)
    assert(!crh("id").nullable)
  }

  test("BackerToBuilder FK triple resolves through three entities") {
    val st = cfg.schema.structTypeOf("BackerToBuilder")
    assert(st("backer").dataType == BinaryType)
    assert(st("builder").dataType == BinaryType)
    assert(st("builderState").dataType == BinaryType)
  }

  // --- node-config-style environment overlays (reference config/) ---

  private val defaultYaml =
    """database: { batchSize: 10000, maxRetries: 3, initialRetryDelay: 1000 }
      |blockchain: { network: testnet, blockIntervalThreshold: 3 }
      |subgraphProviders:
      |  collective-rewards:
      |    url: "https://gw.example/api"
      |    id: "deployments/id/QmDEFAULT"
      |    maxRowsPerRequest: 1000
      |""".stripMargin

  // the reference's mainnet.yml shape: flips network + poll threshold
  // and repoints the subgraph id, leaving everything else inherited
  private val mainnetYaml =
    """blockchain: { network: mainnet, blockIntervalThreshold: 1 }
      |subgraphProviders:
      |  collective-rewards:
      |    id: "deployments/id/QmMAINNET"
      |""".stripMargin

  private val envMappingYaml =
    """subgraphProviders:
      |  collective-rewards:
      |    apiKey: "THE_GRAPH_API_KEY_CR"
      |""".stripMargin

  test("mainnet overlay deep-merges: blockIntervalThreshold 3 -> 1, url inherited") {
    val cfg = ConfigLoader.loadLayered(defaultYaml, Some(mainnetYaml),
      Some(envMappingYaml), env = Map("THE_GRAPH_API_KEY_CR" -> "sekret"))
    assert(cfg.blockchain.network == "mainnet")
    assert(cfg.blockchain.blockIntervalThreshold == 1L) // was 3 in default
    val p = cfg.providers("collective-rewards")
    assert(p.id == "deployments/id/QmMAINNET")     // overlay replaced
    assert(p.url == "https://gw.example/api")      // sibling key inherited
    assert(p.maxRowsPerRequest == 1000)            // sibling key inherited
    assert(p.apiKey == "sekret")                   // env-var override
  }

  test("no overlay / unset env vars leave defaults untouched") {
    val cfg = ConfigLoader.loadLayered(defaultYaml,
      envMappingYaml = Some(envMappingYaml), env = Map.empty)
    assert(cfg.blockchain.blockIntervalThreshold == 3L)
    assert(cfg.providers("collective-rewards").apiKey == "")
  }

  test("an unset env mapping must not materialize phantom config nodes") {
    // maps a provider that default.yml does NOT define: with the var
    // unset, no ProviderConfig may appear (an empty {} node would
    // surface as a phantom provider with url="")
    val mappingWithExtra =
      """subgraphProviders:
        |  phantom-provider:
        |    apiKey: "UNSET_VAR_1"
        |blockchain: "UNSET_VAR_2"
        |""".stripMargin
    val cfg = ConfigLoader.loadLayered(defaultYaml,
      envMappingYaml = Some(mappingWithExtra), env = Map.empty)
    assert(!cfg.providers.contains("phantom-provider"),
      s"phantom provider materialized: ${cfg.providers.keySet}")
    // the scalar-vs-mapping mismatch with an unset var must not clobber
    // the configured blockchain object either
    assert(cfg.blockchain.blockIntervalThreshold == 3L)
  }
}
