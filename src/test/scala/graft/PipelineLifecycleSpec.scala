package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops.{BpeOps, ClassifierOps, SimOps, TextOps}
import graft.sink.UpsertSink

/** The round-8 artifact lifecycles exercised TOGETHER, the way a real
  * training-data pipeline composes them: learned models (BPE
  * vocabulary, quality classifier) train once, persist through one
  * sink, reload in a "different process" (a fresh sink handle), and
  * apply map-only over the corpus; the same store then takes sink
  * maintenance (PK delete + rebucket) without invalidating anything
  * the models persisted. Each piece has its own unit spec — this one
  * pins that the composition holds on one shared store.
  */
class PipelineLifecycleSpec extends SparkSpec {

  import spark.implicits._

  test("train -> persist -> reload -> apply lifecycles share one store") {
    val root = Files.createTempDirectory("graft_lifecycle").toString
    val store = new UpsertSink(spark, root, numBuckets = 4)
    val docs = Tables.load(spark, sf, "documents")

    // 1. learn + persist the BPE vocabulary
    val bpe = BpeOps.learnBpe(docs, "text", numMerges = 40, maxWords = 8000)
    BpeOps.saveModel(store, bpe)

    // 2. train + persist the quality classifier (distilling the
    //    integer quality-gate rule, the q95 shape)
    val labeled = docs.withColumn("y",
      (TextOps.qualityScoreMil(col("text")) >= 500).cast("int"))
    val clf = ClassifierOps.trainHashedClassifier(labeled, "text", "y",
      buckets = 256, iters = 5)
    ClassifierOps.saveModel(store, clf)

    // 3. "another process": fresh handles reload both artifacts and
    //    apply them in ONE map-only pass over the corpus
    val reader = new UpsertSink(spark, root, numBuckets = 4)
    val bpe2 = BpeOps.loadModel(reader)
    val clf2 = ClassifierOps.loadModel(reader)
    assert(bpe2.merges == bpe.merges)
    assert(clf2.weights.toSeq == clf.weights.toSeq && clf2.bias == clf.bias)
    val applied = BpeOps.encode(docs, "text", bpe2.merges)
      .withColumn("quality_margin", clf2.margin(col("text")))
      .select(col("doc_id"), col("n_tokens"), col("quality_margin"))
    val plan = applied.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning") &&
      !plan.contains("ScalaUDF") && !plan.contains("BatchEvalPython"),
      s"combined apply is not one map-only scan:\n$plan")
    val rows = applied.collect()
    assert(rows.length == docs.count())
    assert(rows.forall(_.getInt(1) > 0), "a document encoded to no tokens")

    // 4. sink maintenance on the SAME store: corpus table merges,
    //    deletes, rebuckets — model tables stay intact throughout
    store.merge("corpus", docs.select(col("doc_id"), col("text")),
      Seq("doc_id"), pkUnique = true)
    val someIds = docs.select(col("doc_id")).limit(5)
    store.delete("corpus", someIds, Seq("doc_id"))
    store.rebucket("corpus", Seq("doc_id"), newBuckets = 8)
    assert(store.read("corpus").count() == docs.count() - 5)
    val bpe3 = BpeOps.loadModel(reader)
    val clf3 = ClassifierOps.loadModel(reader)
    assert(bpe3.merges == bpe.merges &&
      clf3.weights.toSeq == clf.weights.toSeq,
      "sink maintenance on a sibling table disturbed persisted models")

    // 5. retraining overwrites in place; readers see the new generation
    val clfB = ClassifierOps.trainHashedClassifier(labeled, "text", "y",
      buckets = 256, iters = 9)
    ClassifierOps.saveModel(store, clfB)
    assert(ClassifierOps.loadModel(reader).weights.toSeq
      == clfB.weights.toSeq)
  }

  test("the ANN index lifecycle composes with drift-triggered rebuild") {
    val root = Files.createTempDirectory("graft_lifecycle_ann").toString
    val store = new UpsertSink(spark, root, numBuckets = 4)
    val e = Tables.load(spark, sf, "embeddings")
    // build WITH SQ8, probe self-contained
    SimOps.buildIvfPqIndex(e, "vec_id", "embedding", store,
      storeSq8 = true).collect()
    val q = e.filter($"vec_id" % 50 === 0)
    assert(SimOps.ivfPqProbeIndex(q, e, "vec_id", "embedding", store, 3,
      refineFromSq8 = true).count() > 0)
    // the drift monitor fires on a collapsed batch -> owner rebuilds
    val collapsed = e.limit(100).select($"vec_id",
      transform($"embedding", x => x * lit(0.0f) + lit(0.4f)).as("embedding"))
    val tv = SimOps.ivfIndexDriftStats(collapsed, "vec_id", "embedding",
        store).agg(sum($"gap_ppm")).as[Long].head() / 2e6
    assert(tv > 0.5, f"collapsed batch drift $tv%.2f not flagged")
    // rebuild WITHOUT SQ8: the stale table must be gone, the SQ8 probe
    // must fail loudly, and the exact-refine probe must keep working
    SimOps.buildIvfPqIndex(e, "vec_id", "embedding", store).collect()
    intercept[IllegalArgumentException] {
      SimOps.ivfPqProbeIndex(q, e, "vec_id", "embedding", store, 3,
        refineFromSq8 = true)
    }
    assert(SimOps.ivfPqProbeIndex(q, e, "vec_id", "embedding", store, 3)
      .count() > 0)
  }
}
