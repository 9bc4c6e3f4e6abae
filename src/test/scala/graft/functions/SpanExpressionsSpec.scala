package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SpanExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("GramMd5s is bit-identical to md5(concat_ws(' ', window)) per position") {
    SpanFunctions.register(spark)
    ChunkFunctions.register(spark)
    val docs = Seq(
      (1L, (1 to 50).map("tok" + _)),
      (2L, (1 to 20).map("tok" + _)),      // exactly one window at L=20
      (3L, (1 to 19).map("tok" + _)),      // shorter than a window
      (4L, Seq.empty[String]),
      (5L, Seq("solo")))
      .toDF("id", "toks")
    // reference: every stride-1 chunk of exactly L tokens, joined + md5'd
    val relational = docs.select($"id",
      transform(
        filter(ChunkFunctions.arrayChunks($"toks", lit(20), lit(1)),
          c => size(c) === 20),
        c => md5(concat_ws(" ", c))).as("ref"))
      .as[(Long, Seq[String])].collect().toMap
    val native = docs.select($"id",
      transform(SpanFunctions.gramMd5s($"toks", 20), b => hex(b)).as("g"))
      .as[(Long, Seq[String])].collect().toMap
    relational.foreach { case (id, ref) =>
      assert(native(id).map(_.toLowerCase) == ref,
        s"digest drift for id=$id")
    }
    assert(native(3L).isEmpty && native(4L).isEmpty && native(5L).isEmpty)
  }

  test("CutSpans removes exactly the union of [s, s+L) and keeps order") {
    SpanFunctions.register(spark)
    val toks = (0 until 30).map("w" + _)
    def cut(starts: Seq[Int], n: Int): String =
      Seq((toks, starts)).toDF("t", "s")
        .select(SpanFunctions.cutSpans($"t", $"s", n).as("c"))
        .as[String].head()
    assert(cut(Seq.empty, 5) == toks.mkString(" "))
    assert(cut(Seq(0), 30) == "")
    assert(cut(Seq(0), 5) == toks.drop(5).mkString(" "))
    assert(cut(Seq(25), 5) == toks.take(25).mkString(" "))
    // overlapping spans merge; adjacent spans stay contiguous
    assert(cut(Seq(3, 5), 5) == (toks.take(3) ++ toks.drop(10)).mkString(" "))
    assert(cut(Seq(3, 8), 5) == (toks.take(3) ++ toks.drop(13)).mkString(" "))
    // disjoint spans leave the middle island
    assert(cut(Seq(0, 20), 5) ==
      (toks.slice(5, 20) ++ toks.drop(25)).mkString(" "))
    // duplicate starts are harmless
    assert(cut(Seq(4, 4, 4), 6) ==
      (toks.take(4) ++ toks.drop(10)).mkString(" "))
    // spans past the end cap at the array length
    assert(cut(Seq(28), 5) == toks.take(28).mkString(" "))
  }

  test("CutSpans rejects unsorted starts loudly — even past the token range") {
    SpanFunctions.register(spark)
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: causes(t.getCause)
    def rejects(starts: Seq[Int]): Unit = {
      val ex = intercept[Exception] {
        Seq((Seq("a", "b", "c", "d"), starts)).toDF("t", "s")
          .select(SpanFunctions.cutSpans($"t", $"s", 2))
          .collect()
      }
      assert(causes(ex).exists(c =>
        c.getMessage != null && c.getMessage.contains("sorted ascending")),
        s"unsorted starts $starts not rejected: $ex")
    }
    rejects(Seq(2, 0))
    // the lazy-while-consuming check's blind spot: a first start AT or
    // past the token count is never consumed by the walk, so the
    // out-of-order start behind it would silently under-remove
    rejects(Seq(10, 2))
    // negative starts rejected too — they would silently truncate the
    // span to [0, s+n) instead of removing n tokens
    val neg = intercept[Exception] {
      Seq((Seq("a", "b", "c", "d"), Seq(-1, 2))).toDF("t", "s")
        .select(SpanFunctions.cutSpans($"t", $"s", 2)).collect()
    }
    assert(causes(neg).exists(c =>
      c.getMessage != null && c.getMessage.contains("non-negative")),
      s"negative start not rejected: $neg")
    // in-range starts past the end are legal (spans cap at the array)
    val ok = Seq((Seq("a", "b", "c", "d"), Seq(1, 9))).toDF("t", "s")
      .select(SpanFunctions.cutSpans($"t", $"s", 2).as("c"))
      .as[String].head()
    assert(ok == "a d", s"tail-start handling wrong: $ok")
  }

  test("interpreted and codegen paths agree; null children yield null") {
    SpanFunctions.register(spark)
    val df = (1 to 48).map { i =>
      val toks = (1 to i).map("w" + _)
      val starts = (0 until i by 7).filter(_ % 2 == 0)
      (i.toLong, toks, starts)
    }.toDF("id", "t", "s")
      .unionByName(Seq((998L, null.asInstanceOf[Seq[String]], Seq(0)),
        (999L, Seq("a"), null.asInstanceOf[Seq[Int]]))
        .toDF("id", "t", "s"))
    val exprs = Seq(
      transform(SpanFunctions.gramMd5s($"t", 5), b => hex(b)).as("g"),
      SpanFunctions.cutSpans($"t", coalesce($"s",
        typedlit(Array.empty[Int])), 5).as("c"))
    val viaCodegen = df.select($"id" +: exprs: _*)
      .as[(Long, Seq[String], String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // factoryMode=NO_CODEGEN forces InterpretedUnsafeProjection, which
    // actually runs nullSafeEval — wholeStage=false alone still calls
    // each expression's doGenCode through GenerateUnsafeProjection
    val prev = spark.conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interpreted = df.select($"id" +: exprs: _*)
        .as[(Long, Seq[String], String)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(viaCodegen == interpreted)
    } finally spark.conf.set("spark.sql.codegen.factoryMode", prev)
    assert(viaCodegen(998L) == ((null, null)))
    // null starts coalesced to empty -> full text survives
    assert(viaCodegen(999L) == ((Seq.empty, "a")))
  }
}
