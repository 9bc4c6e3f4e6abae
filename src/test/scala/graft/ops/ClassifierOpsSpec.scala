package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ClassifierOpsSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = {
    val spam = (1 to 40).map(i =>
      (i.toLong, 1, s"buy cheap pills now limited offer click here deal $i"))
    val ham = (41 to 80).map(i =>
      (i.toLong, 0, s"the committee reviewed the governance proposal $i in detail today"))
    (spam ++ ham).toDF("id", "y", "text")
  }

  test("LR separates token-identifiable classes") {
    val df = corpus
    val m = ClassifierOps.trainHashedClassifier(df, "text", "y",
      buckets = 512, iters = 30, lr = 1.0)
    val preds = df.select($"y",
      (m.margin($"text") > 0).cast("int").as("p")).collect()
    val acc = preds.count(r => r.getInt(0) == r.getInt(1)).toDouble / preds.length
    assert(acc >= 0.95, f"train accuracy $acc%.2f below bound")
    // and it generalizes to unseen docs built from the same vocabulary
    val held = Seq((1001L, 1, "cheap pills offer"),
      (1002L, 0, "committee reviewed proposal")).toDF("id", "y", "text")
    val hp = held.select($"y", (m.margin($"text") > 0).cast("int").as("p"))
      .collect()
    assert(hp.forall(r => r.getInt(0) == r.getInt(1)),
      "held-out docs misclassified")
  }

  test("margin self-registers: a directly constructed model works on a session that never trained") {
    // ADVICE r10: the margin resolved via call_function and failed at
    // analysis with 'undefined function' unless trainHashedClassifier/
    // loadModel had run on the session — a model constructed directly
    // (public case class) or applied on a DIFFERENT SparkSession broke
    // where the old HOF formulation was session-independent. margin now
    // registers idempotently on the ACTIVE session.
    val m = ClassifierOps.HashedLinearModel(Array(0.5, -0.25), 0.1)
    val fresh = spark.newSession() // its OWN FunctionRegistry, untrained
    val prev = org.apache.spark.sql.SparkSession.getActiveSession
    org.apache.spark.sql.SparkSession.setActiveSession(fresh)
    try {
      val out = fresh.createDataFrame(Seq(Tuple1("a b"))).toDF("text")
        .select(m.margin(col("text")).as("mg")).collect()
      assert(out.length == 1 && !out(0).isNullAt(0))
    } finally prev.foreach(org.apache.spark.sql.SparkSession.setActiveSession)
  }

  test("training is deterministic at any parallelism (decimal gradients)") {
    val a = ClassifierOps.trainHashedClassifier(corpus, "text", "y",
      buckets = 256, iters = 8)
    val b = ClassifierOps.trainHashedClassifier(corpus.repartition(13),
      "text", "y", buckets = 256, iters = 8)
    assert(a.bias == b.bias, "bias drifted across parallelism")
    assert(a.weights.toSeq == b.weights.toSeq,
      "weights drifted across parallelism")
  }

  test("probability is a sigmoid of the margin, in (0, 1)") {
    val m = ClassifierOps.trainHashedClassifier(corpus, "text", "y",
      buckets = 256, iters = 5)
    val rows = corpus.select(m.margin($"text").as("mg"),
      m.probability($"text").as("p")).collect()
    rows.foreach { r =>
      val (mg, p) = (r.getDouble(0), r.getDouble(1))
      assert(p > 0.0 && p < 1.0)
      assert(math.abs(p - 1.0 / (1.0 + math.exp(-mg))) < 1e-12)
    }
  }

  test("model persists through the sink and round-trips exactly") {
    val m = ClassifierOps.trainHashedClassifier(corpus, "text", "y",
      buckets = 256, iters = 6)
    val sink = new graft.sink.UpsertSink(spark,
      java.nio.file.Files.createTempDirectory("graft_clf").toString)
    ClassifierOps.saveModel(sink, m)
    val loaded = ClassifierOps.loadModel(sink)
    assert(loaded.bias == m.bias &&
      loaded.weights.toSeq == m.weights.toSeq)
    // margins from the loaded model are bit-identical
    val a = corpus.select($"id", m.margin($"text").as("mg"))
      .as[(Long, Double)].collect().toMap
    val b = corpus.select($"id", loaded.margin($"text").as("mg"))
      .as[(Long, Double)].collect().toMap
    assert(a == b)
    intercept[IllegalArgumentException] {
      ClassifierOps.loadModel(new graft.sink.UpsertSink(spark,
        java.nio.file.Files.createTempDirectory("graft_clf_e").toString))
    }
  }

  test("the apply (margin) plan is map-only — no exchange, no UDF") {
    val m = ClassifierOps.trainHashedClassifier(corpus, "text", "y",
      buckets = 128, iters = 2)
    val plan = corpus.select(m.margin($"text").as("mg"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"classifier apply shuffles:\n$plan")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      s"classifier apply fell off codegen onto a UDF:\n$plan")
  }
}
