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
}
