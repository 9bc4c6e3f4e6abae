package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Unicode normalization expression: UAX #15 semantics, codegen and
  * interpreted parity, totality, and the compile-time form contract.
  */
class NormalizeExpressionsSpec extends SparkSpec {

  import spark.implicits._

  private def nfc(s: String): String = {
    NormalizeFunctions.register(spark)
    Seq(Tuple1(s)).toDF("t")
      .select(NormalizeFunctions.normalize($"t", "NFC")).as[String].head()
  }

  test("NFC composes combining sequences and maps singletons") {
    assert(nfc("cafe\u0301") == "caf\u00E9")       // e + acute -> \u00E9
    assert(nfc("nai\u0308ve") == "na\u00EFve")     // i + diaeresis -> \u00EF
    assert(nfc("\u212B") == "\u00C5")              // angstrom sign -> \u00C5
    assert(nfc("\uFB01n") == "\uFB01n")            // fi ligature: NFC keeps it
    assert(nfc("plain ascii 42") == "plain ascii 42")
    assert(nfc("") == "")
  }

  test("NFKC additionally folds compatibility forms") {
    NormalizeFunctions.register(spark)
    val out = Seq(Tuple1("\uFB01n \uFF14\uFF12 cafe\u0301")).toDF("t")
      .select(NormalizeFunctions.normalize($"t", "NFKC")).as[String].head()
    // ligature decomposes, fullwidth digits fold, combining still composes
    assert(out == "fin 42 caf\u00E9")
  }

  test("normalization is idempotent and total on nulls") {
    NormalizeFunctions.register(spark)
    val df = Seq(Some("A\u030A"), Some("x"), None).toDF("t")
    val once = df.select(NormalizeFunctions.normalize($"t", "NFC").as("n"))
    val twice = once.select(NormalizeFunctions.normalize($"n", "NFC"))
      .as[Option[String]].collect().toSeq
    assert(twice == Seq(Some("\u00C5"), Some("x"), None))
  }

  test("interpreted eval agrees with codegen") {
    NormalizeFunctions.register(spark)
    val df = Seq(Tuple1("cafe\u0301")).toDF("t")
    // the filter forces the interpreted (eval) path for the predicate
    // while the projection runs through whole-stage codegen
    val n = df.filter(NormalizeFunctions.normalize($"t", "NFC") === "caf\u00E9")
      .count()
    assert(n == 1)
  }

  test("an unknown form fails at plan construction, not mid-job") {
    NormalizeFunctions.register(spark)
    val e = intercept[Exception] {
      Seq(Tuple1("x")).toDF("t")
        .select(NormalizeFunctions.normalize($"t", "NFX")).collect()
    }
    assert(e.getMessage.contains("unknown normalization form")
      || Option(e.getCause).exists(_.getMessage.contains("unknown normalization form")),
      s"wrong error: $e")
  }

  test("hash-operator motivation: decomposed dup only collides after NFC") {
    NormalizeFunctions.register(spark)
    val docs = Seq((1L, "caf\u00E9 society"), (2L, "cafe\u0301 society"))
      .toDF("id", "text")
    val rawKeys = docs.select(md5(encode($"text", "UTF-8"))).distinct().count()
    val nfcKeys = docs.select(
        md5(encode(NormalizeFunctions.normalize($"text", "NFC"), "UTF-8")))
      .distinct().count()
    assert(rawKeys == 2, "fixture should differ byte-wise before NFC")
    assert(nfcKeys == 1, "NFC must collapse the invisible difference")
  }
}
