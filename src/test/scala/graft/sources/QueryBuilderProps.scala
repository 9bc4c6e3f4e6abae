package graft.sources

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.sources.SubgraphQueryBuilder._

/** Property tests for the pure query-generation layer (SURVEY §5: add
  * what the reference lacks — property-based testing of the
  * serialization round trips).
  */
object QueryBuilderProps extends Properties("SubgraphQueryBuilder") {

  private val identifier: Gen[String] =
    for {
      h <- Gen.alphaUpperChar
      t <- Gen.listOfN(8, Gen.alphaNumChar)
    } yield (h :: t).mkString

  property("toCamelCase preserves length and all but the first char") =
    forAll(identifier) { s =>
      val c = toCamelCase(s)
      c.length == s.length && c.tail == s.tail && c.head == s.head.toLower
    }

  property("pluralize ends in s and never leaves a trailing y") =
    forAll(identifier) { s =>
      val p = pluralize(s)
      p.endsWith("s") && !p.endsWith("ys") &&
        (if (s.endsWith("y")) p == s.dropRight(1) + "ies" else p == s + "s")
    }

  property("formatValue quotes every string safely (no raw quotes)") =
    forAll(Gen.asciiPrintableStr) { s =>
      val out = formatValue(s)
      out.startsWith("\"") && out.endsWith("\"") &&
        !out.drop(1).dropRight(1).replace("\\\\", "").replace("\\\"", "")
          .contains("\"")
    }

  property("formatValue renders any BigInt losslessly") =
    forAll(Gen.chooseNum(Long.MinValue, Long.MaxValue)) { n =>
      val big = BigInt(n) * BigInt(n) // up to ~38 digits
      formatValue(big) == big.toString
    }

  property("nextPage always overwrites the cursor") =
    forAll(identifier, identifier) { (c1, c2) =>
      val e = graft.model.EntityDef("E",
        Seq(graft.model.ColumnDef("id", graft.model.ColumnType.StringCol)),
        Seq("id"), "p")
      val spec = QuerySpec(e, where = Map("id_gt" -> c1))
      nextPage(spec, c2).where("id_gt") == c2
    }

  property("batchQuery aliases are positional and unique") =
    forAll(Gen.chooseNum(1, 8)) { n =>
      val e = graft.model.EntityDef("Builder",
        Seq(graft.model.ColumnDef("id", graft.model.ColumnType.StringCol)),
        Seq("id"), "p")
      val doc = batchQuery(Seq.fill(n)(QuerySpec(e)), withMetadata = false)
      (0 until n).forall(i => doc.contains(s"builders_$i:")) &&
        !doc.contains(s"builders_$n:")
    }
}
