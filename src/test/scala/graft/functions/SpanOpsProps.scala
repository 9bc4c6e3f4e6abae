package graft.functions

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Property pins for the pure span kernels behind q68/q115/q117 —
  * randomized inputs against an independently-written brute-force
  * reference, no Spark session needed.
  */
object SpanOpsProps extends Properties("SpanOps") {

  private def arr(tokens: Seq[String]): GenericArrayData =
    new GenericArrayData(tokens.map(t =>
      UTF8String.fromString(t): Any).toArray)

  private def ints(xs: Seq[Int]): GenericArrayData =
    new GenericArrayData(xs.toArray)

  private val tokenGen: Gen[String] =
    Gen.chooseNum(1, 6).flatMap(n =>
      Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))

  private val docGen: Gen[List[String]] =
    Gen.chooseNum(0, 60).flatMap(n => Gen.listOfN(n, tokenGen))

  property("cutSpans == brute-force coverage filter") =
    forAll(docGen, Gen.chooseNum(1, 8),
      Gen.listOf(Gen.chooseNum(0, 70))) { (toks, n, rawStarts) =>
      val starts = rawStarts.sorted
      // brute force: token p survives iff no start covers it
      val expect = toks.zipWithIndex.collect {
        case (t, p) if !starts.exists(s => s <= p && p < s + n) => t
      }.mkString(" ")
      val got = SpanOps.cutSpans(arr(toks), ints(starts), n).toString
      got == expect
    }

  property("gramMd5s: window count and per-window digest equal a naive re-hash") =
    forAll(docGen, Gen.chooseNum(1, 8)) { (toks, n) =>
      val out = SpanOps.gramMd5s(arr(toks), n)
      val expected = math.max(toks.length - n + 1, 0)
      val md = java.security.MessageDigest.getInstance("MD5")
      out.numElements() == expected && (0 until expected).forall { i =>
        val naive = md.digest(
          toks.slice(i, i + n).mkString(" ").getBytes("UTF-8"))
        java.util.Arrays.equals(out.getBinary(i), naive)
      }
    }
}
