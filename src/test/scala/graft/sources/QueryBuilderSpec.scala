package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.model.{ColumnDef, ColumnType, EntityDef}
import graft.sources.SubgraphQueryBuilder._

/** Query-text generation — mirrors the reference's largest suite
  * (src/handlers/subgraphQueryBuilder.test.ts, 826 LoC): filters, order,
  * first, aliasing, metadata, edge cases.
  */
class QueryBuilderSpec extends AnyFunSuite {

  private val builder = EntityDef("Builder", Seq(
    ColumnDef("id", ColumnType.BytesCol),
    ColumnDef("name", ColumnType.StringCol),
    ColumnDef("activated", ColumnType.BooleanCol)), Seq("id"), "main")

  private val proposal = EntityDef("Proposal", Seq(
    ColumnDef("id", ColumnType.StringCol),
    ColumnDef("proposalId", ColumnType.StringCol),
    ColumnDef("builder", ColumnType.Reference("Builder"))), Seq("id"), "main")

  test("toCamelCase lowercases only the first character") {
    assert(toCamelCase("BlockChangeLog") == "blockChangeLog")
    assert(toCamelCase("") == "")
    assert(toCamelCase("a") == "a")
  }

  test("pluralize: +s default, y->ies") {
    assert(pluralize("Builder") == "Builders")
    assert(pluralize("StakingHistory") == "StakingHistories")
    assert(resultKey("BlockChangeLog") == "blockChangeLogs")
  }

  test("field list selects { id } for reference columns") {
    assert(fieldList(proposal) == "id proposalId builder { id }")
  }

  test("formatValue: strings quoted, numbers/booleans bare") {
    assert(formatValue("0xabc") == "\"0xabc\"")
    assert(formatValue(BigInt("123456789012345678901234567890"))
      == "123456789012345678901234567890")
    assert(formatValue(true) == "true")
    assert(formatValue(42) == "42")
  }

  test("formatValue: escapes quotes and backslashes in strings") {
    assert(formatValue("""a"b\c""") == """"a\"b\\c"""")
  }

  test("formatValue: control characters escape to \\uXXXX (GraphQL forbids raw)") {
    assert(formatValue("a\nb") == "\"a\\u000ab\"")
    assert(formatValue("t\tr\r") == "\"t\\u0009r\\u000d\"")
    assert(formatValue("\u0000") == "\"\\u0000\"")
  }

  test("formatValue: arrays and nested objects") {
    assert(formatValue(Seq("a", "b")) == """["a", "b"]""")
    assert(formatValue(Map("number_gte" -> BigInt(5)))
      == "{number_gte: 5}")
  }

  test("formatValue: nested nulls are skipped inside objects") {
    assert(formatValue(Map("a" -> BigInt(1), "b" -> null)) == "{a: 1}")
  }

  test("formatValue: depth guard trips on cycles") {
    val deep = (1 to 20).foldLeft(Map.empty[String, Any])((m, _) => Map("x" -> m))
    assertThrows[IllegalArgumentException](formatValue(deep))
  }

  test("arguments renders first/orderBy/orderDirection/where in order") {
    val spec = QuerySpec(builder, where = Map("id_gt" -> "0x00"),
      orderBy = Some("id"), orderDirection = Some("asc"), first = Some(1000))
    assert(arguments(spec) ==
      """(first: 1000, orderBy: id, orderDirection: asc, where: {id_gt: "0x00"})""")
  }

  test("arguments empty when no constraints") {
    assert(arguments(QuerySpec(builder)) == "")
  }

  test("entityQuery aliases as pluralCamel_index") {
    val q = entityQuery(QuerySpec(builder, first = Some(10)), 3)
    assert(q == "builders_3: builders(first: 10) { id name activated }")
  }

  test("batchQuery merges N specs into one document with _meta") {
    val doc = batchQuery(Seq(QuerySpec(builder), QuerySpec(proposal)))
    assert(doc.startsWith("query { builders_0: builders { id name activated } " +
      "proposals_1: proposals { id proposalId builder { id } }"))
    assert(doc.contains("_meta { block { number hash timestamp }"))
    // the reference's measured batching effect: 5 queries -> 1 document
    val five = batchQuery(Seq.fill(5)(QuerySpec(builder)))
    assert(five.split("builders_").length == 6)
  }

  test("batchQuery without metadata omits _meta") {
    assert(!batchQuery(Seq(QuerySpec(builder)), withMetadata = false).contains("_meta"))
  }

  test("nextPage sets the keyset cursor id_gt") {
    val spec = QuerySpec(builder, where = Map("id_gt" -> "0x00"), first = Some(2))
    val next = nextPage(spec, "0x1f")
    assert(next.where("id_gt") == "0x1f")
    assert(arguments(next).contains("""id_gt: "0x1f""""))
  }
}
