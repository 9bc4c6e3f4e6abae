package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.TextOps

/** Hand-computed repetition signals (the Gopher filter family) + the
  * codegen/interpreted agreement of the O(n) mode-count expression.
  */
class RepetitionExpressionsSpec extends SparkSpec {

  import spark.implicits._

  private def signals(text: String): (Long, Long, Long) = {
    RepetitionFunctions.register(spark)
    Seq(text).toDF("text")
      .select(TextOps.dupLineRatioMil($"text").as("l"),
        TextOps.dupWordRatioMil($"text").as("w"),
        TextOps.topBigramShareMil($"text").as("b"))
      .as[(Long, Long, Long)].head()
  }

  test("hand-computed repetition per-milles") {
    // non-empty trimmed lines: "spam eggs" x2, "eggs ham", "ham spam"
    //   -> 4 lines, 3 distinct -> 1/4 dup = 250
    // words span lines: spam eggs spam eggs eggs ham ham spam
    //   -> 8 words, 3 distinct -> 5/8 dup = 625
    // bigrams (7): spam-eggs, eggs-spam, spam-eggs, eggs-eggs,
    //   eggs-ham, ham-ham, ham-spam -> top "spam eggs" 2/7 = 285
    val (l, w, b) = signals("spam eggs\n  \nspam eggs\neggs ham\nham spam")
    assert(l == 250, s"dup_line_mil $l")
    assert(w == 625, s"dup_word_mil $w")
    assert(b == 285, s"top_bigram_mil $b")
  }

  test("degenerate inputs are total: empty, one word, no letters") {
    assert(signals("") == ((0L, 0L, 0L)))
    assert(signals("word") == ((0L, 0L, 0L)))
    assert(signals("12345 !!!") == ((0L, 0L, 0L)))
    // fully repeated text maxes the signals
    val (l, w, b) = signals("dup\ndup\ndup\ndup")
    assert(l == 750 && w == 750) // 3 of 4 repeated
    assert(b == 1000)            // "dup dup" is every bigram
  }

  test("topShareMil equals the naive O(n²) mode count on random arrays") {
    import org.scalacheck.Gen
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val gen = Gen.listOf(Gen.oneOf("a", "b", "c", "dd", "", "a b"))
    val seeds = org.scalacheck.rng.Seed(42L)
    var s = seeds
    (1 to 200).foreach { _ =>
      val arr = gen.pureApply(Gen.Parameters.default, s); s = s.next
      val got = RepetitionOps.topShareMil(
        new GenericArrayData(arr.map(UTF8String.fromString).toArray[Any]))
      val want =
        if (arr.isEmpty) 0
        else (1000L * arr.map(x => arr.count(_ == x)).max / arr.size).toInt
      assert(got == want, s"$arr: $got != $want")
    }
  }

  test("codegen and interpreted mode-count agree; empty array is 0") {
    RepetitionFunctions.register(spark)
    val df = Seq(
      (1L, Seq("a", "b", "a", "a")),
      (2L, Seq.empty[String]),
      (3L, Seq("x"))).toDF("id", "arr")
    val gen = df.select($"id", RepetitionFunctions.topShareMil($"arr").as("s"))
      .as[(Long, Int)].collect().toMap
    assert(gen == Map(1L -> 750, 2L -> 0, 3L -> 1000))
    // force the interpreted path through a filter condition
    val interp = df.filter(RepetitionFunctions.topShareMil($"arr") === 750)
      .select("id").as[Long].collect().toSeq
    assert(interp == Seq(1L))
  }

  test("true interpreted plan (NO_CODEGEN) matches codegen end-to-end") {
    RepetitionFunctions.register(spark)
    val df = Seq(
      (1L, "spam eggs\n  \nspam eggs\neggs ham\nham spam"),
      (2L, ""), (3L, "word"), (4L, "dup\ndup\ndup\ndup"),
      (5L, null: String)).toDF("id", "text")
      .select($"id", TextOps.dupLineRatioMil($"text").as("l"),
        TextOps.dupWordRatioMil($"text").as("w"),
        TextOps.topBigramShareMil($"text").as("b"))
    def run() = df.collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    val viaCodegen = run()
    val interp = withInterpreted(run())
    assert(interp == viaCodegen)
  }
}
