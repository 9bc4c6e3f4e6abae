package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.TextOps

class BloomFunctionsSpec extends SparkSpec {

  import spark.implicits._

  test("build + mightContain: no false negatives, bounded false positives") {
    BloomFunctions.register(spark)
    val keys = (0L until 5000L).map(_ * 7L)
    val blob = BloomFunctions.build(keys.toDF("k"), col("k"),
      numItems = 10000L, numBits = 131072L)
    assert(blob != null)
    val probes = (0L until 40000L).toDF("k")
      .select(col("k"), BloomFunctions.mightContain(blob, col("k")).as("hit"))
      .as[(Long, Boolean)].collect().toMap
    // every inserted key must hit
    assert(keys.forall(probes(_)))
    // false-positive rate over non-members stays near the sizing target
    val nonMembers = (0L until 40000L).filterNot(k => k % 7 == 0 && k / 7 < 5000)
    val fp = nonMembers.count(probes(_)).toDouble / nonMembers.size
    assert(fp < 0.05, s"false-positive rate $fp")
  }

  test("build on empty input returns null (no-hits semantics)") {
    BloomFunctions.register(spark)
    assert(BloomFunctions.build(Seq.empty[Long].toDF("k"), col("k"),
      1000L, 8192L) == null)
  }

  test("bloomContaminationHits equals the exact contaminationHits") {
    val docs = graft.Tables.load(spark, sf, "documents")
    val corpus = docs.filter(col("doc_id") % 17 =!= 0)
    val bench = docs.filter(col("doc_id") % 17 === 0)
    val exact = TextOps.contaminationHits(corpus, bench, "doc_id", "text", 5)
      .as[(Long, Long)].collect().toMap
    val bloom = TextOps.bloomContaminationHits(corpus, bench, "doc_id", "text", 5)
      .as[(Long, Long)].collect().toMap
    assert(bloom == exact)
  }

  test("true interpreted plan (NO_CODEGEN) matches codegen end-to-end") {
    BloomFunctions.register(spark)
    val keys = (0L until 2000L).map(_ * 7L)
    val blob = BloomFunctions.build(keys.toDF("k"), col("k"),
      numItems = 4000L, numBits = 65536L)
    val df = (0L until 10000L).toDF("k")
      .select(col("k"), BloomFunctions.mightContain(blob, col("k")).as("hit"))
    def run() = df.as[(Long, Boolean)].collect().toMap
    val viaCodegen = run()
    val interp = withInterpreted(run())
    assert(interp == viaCodegen)
  }

  test("empty benchmark yields zero contamination rows") {
    val docs = graft.Tables.load(spark, sf, "documents")
    val none = docs.filter(lit(false))
    assert(TextOps.bloomContaminationHits(docs, none, "doc_id", "text", 5)
      .isEmpty)
  }
}
