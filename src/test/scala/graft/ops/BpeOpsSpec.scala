package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BpeOpsSpec extends SparkSpec {
  import spark.implicits._

  test("merge loop reproduces the hand-computable Sennrich dictionary") {
    // the ACL-2016 paper's worked example: {low:5, lower:2, newest:6,
    // widest:3}. Pair (e,s) carries 6+3=9 -> first; (es,t</w>) inherits
    // the 9 -> second; (l,o) carries 5+2=7 -> third; then the three-way
    // 6-count tie (e,w)/(n,e)/(w,est</w>) breaks lexicographically.
    val merges = BpeOps.learnFromCounts(
      Array(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L)),
      numMerges = 4)
    assert(merges == Seq(("e", "s"), ("es", "t</w>"), ("l", "o"),
      ("e", "w")))
  }

  test("merge loop stops below minFreq instead of learning noise") {
    val merges = BpeOps.learnFromCounts(
      Array(("ab", 1L), ("cd", 1L)), numMerges = 10, minFreq = 2)
    assert(merges.isEmpty)
  }

  test("greedy encoder applies the LOWEST rank first, not left-to-right") {
    // ranks: (e,s)=0, (es,t</w>)=1, (l,o)=2. "lowest" must become
    // [lo, w, est</w>]: the rank-0 (e,s) merge fires before the
    // leftmost candidate (l,o) ever would.
    val codec = new graft.functions.BpeCodec(
      Array(("e", "s"), ("es", "t</w>"), ("l", "o")))
    assert(codec.encodeWord("lowest").toSeq == Seq("lo", "w", "est</w>"))
    // unknown word -> falls back to characters + sentinel
    assert(codec.encodeWord("zq").toSeq == Seq("z", "q</w>"))
  }

  test("encoding round-trips losslessly over the real corpus") {
    val docs = graft.Tables.load(spark, sf, "documents")
    val model = BpeOps.learnBpe(docs, "text", numMerges = 60,
      maxWords = 20000)
    assert(model.merges.nonEmpty)
    assert(model.keptMass <= model.totalMass &&
      model.keptWords <= model.totalWords)
    // per doc: concatenating the BPE tokens must equal the tokenized
    // words each suffixed with </w> — BPE re-segments, never rewrites
    val enc = BpeOps.encode(docs, "text", model.merges)
      .withColumn("__joined", array_join(col("bpe_tokens"), ""))
      .withColumn("__words", TextOps.tokens(col("text"), "unicode"))
      .withColumn("__expect",
        when(size(col("__words")) === 0, lit(""))
          .otherwise(concat(array_join(col("__words"), "</w>"), lit("</w>"))))
    assert(enc.filter(col("__joined") =!= col("__expect")).isEmpty,
      "BPE tokens do not reconcatenate to the tokenized text")
    // merges genuinely compress: fewer tokens than characters-per-word
    val sums = enc.agg(
      sum(size(col("bpe_tokens"))).as("toks"),
      sum(length(array_join(col("__words"), ""))).as("chars")).collect()(0)
    assert(sums.getLong(0) < sums.getLong(1),
      "learned merges produced no compression over character encoding")
  }

  test("identical corpora learn identical merges (determinism)") {
    val docs = graft.Tables.load(spark, sf, "documents")
    val a = BpeOps.learnBpe(docs, "text", numMerges = 30, maxWords = 5000)
    val b = BpeOps.learnBpe(docs, "text", numMerges = 30, maxWords = 5000)
    assert(a.merges == b.merges && a.keptMass == b.keptMass)
  }

  test("model persists through the sink and round-trips exactly") {
    val docs = graft.Tables.load(spark, sf, "documents")
    val model = BpeOps.learnBpe(docs, "text", numMerges = 25,
      maxWords = 5000)
    val sink = new graft.sink.UpsertSink(spark,
      java.nio.file.Files.createTempDirectory("graft_bpe").toString)
    BpeOps.saveModel(sink, model)
    val loaded = BpeOps.loadModel(sink)
    assert(loaded == model, "persisted model diverged from the learned one")
    // encoding from the loaded model is identical to the in-memory one
    val a = BpeOps.encode(docs, "text", model.merges)
      .select("doc_id", "n_tokens").as[(Long, Int)].collect().toMap
    val b = BpeOps.encode(docs, "text", loaded.merges)
      .select("doc_id", "n_tokens").as[(Long, Int)].collect().toMap
    assert(a == b)
    intercept[IllegalArgumentException] {
      BpeOps.loadModel(new graft.sink.UpsertSink(spark,
        java.nio.file.Files.createTempDirectory("graft_bpe_empty").toString))
    }
  }

  test("the encode pass is map-only codegen — no exchange, no UDF") {
    val docs = graft.Tables.load(spark, sf, "documents")
    val model = BpeOps.learnBpe(docs, "text", numMerges = 20,
      maxWords = 5000)
    val plan = BpeOps.encode(docs, "text", model.merges)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"BPE encode shuffles:\n$plan")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      s"BPE encode fell off codegen onto a UDF:\n$plan")
  }
}
