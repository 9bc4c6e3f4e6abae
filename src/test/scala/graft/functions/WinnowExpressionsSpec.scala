package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec
import graft.ops.TextOps

/** WinnowHash must agree with a naive reference (per-gram re-hash, no
  * rolling) — the rolling removal step is the only part that can drift —
  * and the near-dup operator must find exactly the planted overlaps.
  */
class WinnowExpressionsSpec extends SparkSpec {

  import spark.implicits._

  private val P = WinnowHash.Prime
  private val B = WinnowHash.Base

  /** Naive reference: hash every k-gram from scratch. */
  private def refGrams(s: String, k: Int): Seq[Long] = {
    def fold(t: String): Long =
      t.foldLeft(0L)((h, c) => (h * B + c.toLong) % P)
    if (s.length < k) Seq(fold(s))
    else (0 to s.length - k).map(i => fold(s.substring(i, i + k)))
  }

  private def refFps(s: String, k: Int, w: Int): Seq[Long] = {
    val g = refGrams(s, k)
    val wins =
      if (g.length <= w) Seq(g.min)
      else g.sliding(w).map(_.min).toSeq
    wins.distinct.sorted
  }

  test("rolling gram hashes match the naive per-gram fold") {
    for (s <- Seq("the quick brown fox jumps", "aaaaaaaaaa", "ab", "",
                  "a b a b a b a b")) {
      val got = WinnowHash.gramHashes(UTF8String.fromString(s), 8).toSeq
      assert(got == refGrams(s, 8), s"text '$s'")
    }
  }

  test("fingerprints are the sorted distinct window minima") {
    for (s <- Seq("the quick brown fox jumps over the lazy dog and more text",
                  "short", "", "aaaaaaaaaaaaaaaaaaaa")) {
      val got = WinnowHash.fingerprints(UTF8String.fromString(s), 8, 4)
        .toLongArray.toSeq
      assert(got == refFps(s, 8, 4), s"text '$s'")
      assert(got.nonEmpty, "fingerprint set is never empty")
    }
  }

  test("interpreted eval, codegen, and the reference agree") {
    val s = "winnowing local algorithms for document fingerprinting"
    val expr = WinnowFingerprints(
      BoundReference(0, StringType, nullable = false), 8, 4)
    val interp = expr.nullSafeEval(UTF8String.fromString(s))
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray.toSeq
    WinnowFunctions.register(spark)
    val codegen = Seq(Tuple1(s)).toDF("t")
      .select(WinnowFunctions.fingerprints($"t", 8, 4))
      .head().getSeq[Long](0).toSeq
    assert(interp == refFps(s, 8, 4))
    assert(codegen == interp)
  }

  test("true interpreted plan (NO_CODEGEN) matches codegen end-to-end") {
    WinnowFunctions.register(spark)
    val df = Seq(
      (1L, "winnowing local algorithms for document fingerprinting"),
      (2L, "short"), (3L, ""), (4L, "aaaaaaaaaaaaaaaaaaaa"),
      (5L, null: String)).toDF("id", "t")
      .select($"id", WinnowFunctions.fingerprints($"t", 8, 4).as("fp"),
        WinnowFunctions.sortedIntersectCount(
          array(lit(1L), lit(3L), lit(9L)), array(lit(3L), lit(9L)))
          .as("ic"))
    val viaCodegen = df.collect()
      .map(r => r.getLong(0) -> (r.getSeq[Long](1), r.getInt(2))).toMap
    val interp = withInterpreted {
      df.collect()
        .map(r => r.getLong(0) -> (r.getSeq[Long](1), r.getInt(2))).toMap
    }
    assert(interp == viaCodegen)
  }

  test("null in, null out; type errors rejected") {
    WinnowFunctions.register(spark)
    val out = Seq(Tuple1(null: String)).toDF("t")
      .select(WinnowFunctions.fingerprints($"t", 8, 4)).head()
    assert(out.isNullAt(0))
    intercept[Exception] {
      Seq(Tuple1(1L)).toDF("x")
        .select(WinnowFunctions.fingerprints($"x", 8, 4)).collect()
    }
    intercept[IllegalArgumentException] {
      WinnowFingerprints(Literal("a"), 0, 4)
    }
  }

  test("sortedIntersectCount equals array_intersect size on sorted arrays") {
    WinnowFunctions.register(spark)
    val rnd = new scala.util.Random(3)
    val rows = (1 to 200).map { _ =>
      val a = Seq.fill(rnd.nextInt(30))(rnd.nextInt(40).toLong).distinct.sorted
      val b = Seq.fill(rnd.nextInt(30))(rnd.nextInt(40).toLong).distinct.sorted
      (a, b)
    }
    val out = rows.toDF("a", "b").select(
      WinnowFunctions.sortedIntersectCount($"a", $"b").as("c"),
      size(array_intersect($"a", $"b")).as("e")).collect()
    out.foreach(r => assert(r.getInt(0) == r.getInt(1)))
  }

  test("near-dup pairs: rare-print pairs AND template-only pairs both found") {
    val common = "the and of to in is that it with as " * 20 // one hot doc body
    val docs = (
      Seq(
        (1L, "completely unique prose about alpine marmots and glaciers " +
          "whistling across the high meadows every summer morning"),
        (2L, "completely unique prose about alpine marmots and glaciers " +
          "whistling across the high meadows every summer evening"), // ~dup of 1
        (3L, "an entirely different report concerning submarine volcanic " +
          "vents and the chemosynthetic ecosystems around them")
      ) ++ (10L to 30L).map(i => (i, common)) // every print shared by 21 docs
    ).toDF("doc_id", "text")
    val pairs = TextOps.winnowNearDupPairs(docs, "doc_id", "text",
        threshold = 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), "planted near-dup pair missed")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      "unrelated doc flagged as near-dup")
    // the 21 identical template docs share only HOT fingerprints (df 21
    // for every print they carry); a df cut in candidate gen would miss
    // all of them — the prefix filter must report every one of the 210
    // pairs, because each doc's prefix still holds SOME shared print
    assert(pairs.count(p => p._1 >= 10L && p._2 >= 10L) == 21 * 20 / 2,
      "template-only near-dup pairs missed by candidate generation")
  }
}
