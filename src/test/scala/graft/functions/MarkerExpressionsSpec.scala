package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MarkerExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("groupHits matches the per-group filter-HOF counts it replaced") {
    val groups = Seq(
      Seq("the", "and", "of"),
      Seq("der", "und", "die"),
      Seq("de", "shi", "le"),   // overlaps fr ("le") below
      Seq("le", "les", "de"))   // multi-membership tokens
    val docs = Seq(
      (1L, Seq("the", "cat", "and", "the", "dog")),
      (2L, Seq("der", "hund", "und", "die", "katze")),
      (3L, Seq("le", "de", "le", "shi")),
      (4L, Seq.empty[String]),
      (5L, Seq("zzz")))
      .toDF("id", "toks")
    val native = docs.select($"id",
      MarkerFunctions.groupHits($"toks", groups).as("c"))
      .as[(Long, Seq[Int])].collect().toMap
    val hof = docs.select($"id" +: groups.zipWithIndex.map { case (g, i) =>
        size(filter($"toks", t => t.isInCollection(g))).as(s"g$i")
      }: _*)
      .as[(Long, Int, Int, Int, Int)].collect()
      .map(r => r._1 -> Seq(r._2, r._3, r._4, r._5)).toMap
    assert(native == hof, s"native=$native hof=$hof")
    // duplicate tokens count every occurrence; multi-group tokens count
    // in EVERY containing group
    assert(native(3L) == Seq(0, 0, 4, 3))
  }

  test("LangGuess matches the relational when/greatest/coalesce decision it replaced") {
    import graft.ops.TextOps
    val langs = TextOps.langMarkers.keys.toSeq.sorted
    // the pre-rewrite formulation, verbatim, as the reference
    def refLangId(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
      val hits = langs.map(l =>
        size(filter(TextOps.tokens(text),
          t => t.isInCollection(TextOps.langMarkers(l)))))
      val maxHits = hits.reduce((a, b) => greatest(a, b))
      val winners = langs.zip(hits).map { case (l, h) =>
        when(h === maxHits && maxHits > 0, lit(l)).otherwise(lit(null))
      }
      val nWinners = winners.map(w =>
        when(w.isNotNull, 1).otherwise(0)).reduce(_ + _)
      when(maxHits === 0 || nWinners > 1, lit("und"))
        .otherwise(coalesce(winners: _*))
    }
    val docs = Seq(
      (1L, "the cat and of the dog is to in"),        // en, clear win
      (2L, "der hund und die katze ist das"),         // de
      (3L, "xyzzy qwerty plugh"),                     // no markers -> und
      (4L, "the der und and"),                        // 2-2 tie -> und
      (5L, "de shi bu le wo"),                        // zh markers ("de" also de)
      (6L, ""),                                       // empty
      (7L, null.asInstanceOf[String]))                // null
      .toDF("doc_id", "text")
    val got = docs.select($"doc_id",
        TextOps.langId($"text").as("g"), refLangId($"text").as("r"))
      .as[(Long, String, String)].collect().sortBy(_._1)
    got.foreach { case (id, g, r) =>
      assert(g == r, s"doc $id: native=$g relational=$r")
    }
    // and the native guess survives inside a FILTER predicate (the
    // no-CSE shape that motivated the single node)
    val n = docs.filter(TextOps.langId($"text") === "en").count()
    assert(n == got.count(_._2 == "en"))
  }

  test("interpreted and codegen agree; null tokens yield null") {
    val groups = Seq(Seq("a", "b"), Seq("b", "c"))
    val df = (1 to 40).map { i =>
      (i.toLong, (1 to i).map(j => Seq("a", "b", "c", "x")(j % 4)))
    }.toDF("id", "toks")
      .unionByName(Seq((99L, null.asInstanceOf[Seq[String]]))
        .toDF("id", "toks"))
    val expr = MarkerFunctions.groupHits($"toks", groups).as("c")
    val viaCodegen = df.select($"id", expr)
      .as[(Long, Seq[Int])].collect().toMap
    // factoryMode=NO_CODEGEN forces InterpretedUnsafeProjection, which
    // actually runs nullSafeEval — wholeStage=false alone still calls
    // each expression's doGenCode through GenerateUnsafeProjection
    val prev = spark.conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interpreted = df.select($"id", expr)
        .as[(Long, Seq[Int])].collect().toMap
      assert(viaCodegen == interpreted)
    } finally spark.conf.set("spark.sql.codegen.factoryMode", prev)
    assert(viaCodegen(99L) == null)
  }

  test("langId and quality plans carry ONE tokenizer and no interpreted lambda") {
    val df = Seq((1L, "the cat and the dog sat le de")).toDF("doc_id", "text")
    val plan = df.select(
        graft.ops.TextOps.qualityScoreMil($"text").as("q"),
        graft.ops.TextOps.langId($"text").as("l"))
      .queryExecution.executedPlan.toString
    // quality tokenizes for the stopword ratio; langId for the marker
    // counts; each must appear ONCE (subexpression-eliminated), never
    // per marker list
    assert(plan.split("regexp_extract_all").length - 1 <= 2,
      s"tokenizer duplicated across marker lists:\n$plan")
    assert(!plan.contains("lambdafunction"),
      s"interpreted lambda left in the scoring plan:\n$plan")
  }
}
