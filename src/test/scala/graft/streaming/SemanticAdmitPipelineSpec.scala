package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sink.UpsertSink

/** Streaming semantic admission over the persisted ANN index: stored
  * near-dups block admission across batches, in-batch dups collapse,
  * novel vectors land, and a restarted stream resumes from the
  * checkpoint without disturbing the admitted corpus.
  */
class SemanticAdmitPipelineSpec extends SparkSpec {

  import spark.implicits._

  private val dim = 16

  /** Deterministic pseudo-random vectors (splitmix64 mix): empirically
    * the max |cosine| over all distinct pairs used below is 0.70 —
    * safely under the 0.9 admission threshold — while a 0.3-jittered
    * copy scores 0.991, safely above it.
    */
  private def mix(x0: Long): Long = {
    var x = x0
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  private def vec(seed: Int, jitter: Float = 0f): Array[Float] =
    Array.tabulate(dim) { i =>
      val u = java.lang.Long.remainderUnsigned(mix(seed * 1000003L + i), 1000L)
      u / 500f - 1f + (if (i == 0) jitter else 0f)
    }

  test("cross-batch dups die via the index, novel vectors land, replay is clean") {
    val root = Files.createTempDirectory("graft_semadmit")
    val src = root.resolve("src").toString
    val sink = new UpsertSink(spark, root.resolve("sink").toString)
    val ckpt = root.resolve("ckpt").toString
    def write(rows: Seq[(Long, Array[Float])]): Unit =
      rows.toDF("vec_id", "embedding").coalesce(1)
        .write.mode("append").parquet(src)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("vec_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("embedding",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType))))
    def run(): Unit =
      SemanticAdmitPipeline.start(spark, src, schema, sink, "sem_corpus",
          ckpt, "vec_id", "embedding", threshold = 0.9,
          nlist = 4, m = 4, ksub = 8, nprobe = 4)
        .awaitTermination()
    def admitted(): Set[Long] =
      sink.read("sem_corpus").select("vec_id").as[Long].collect().toSet

    // batch 1 bootstraps: 40 distinct vectors + one in-batch exact dup
    // (id 1040 duplicates id 1001's vector -> larger id dies)
    write((0 until 40).map(i => (1000L + i, vec(i))) :+ (1040L, vec(1)))
    run()
    val first = admitted()
    assert(first == (0 until 40).map(1000L + _).toSet,
      s"bootstrap admission wrong: ${first.size} ids")
    assert(graft.ops.SimOps.ivfPqIndexExists(sink), "bootstrap must build the index")

    // batch 2 after restart: an exact copy of a stored vector (2001 ->
    // vec(3)) and a jittered near-dup (2002 ~ vec(7)) must DIE via the
    // stored-index probe; a genuinely novel direction (2003) must land
    write(Seq((2001L, vec(3)), (2002L, vec(7, jitter = 0.3f)),
      (2003L, vec(777))))
    run()
    val second = admitted()
    assert(!second.contains(2001L), "exact stored dup was admitted")
    assert(!second.contains(2002L), "near stored dup was admitted")
    assert(second.contains(2003L), "novel vector was rejected")
    assert(first.subsetOf(second), "replay disturbed stored rows")

    // the novel vector joined the CODE LISTS too, not just the corpus:
    // replaying its exact copy in batch 3 must now die via the index
    write(Seq((3001L, vec(777))))
    run()
    assert(!admitted().contains(3001L),
      "index was not extended with batch-2 admissions")
  }

  test("cadenced maintenance: stable stream never rebuilds, drifted one does, once") {
    val root = Files.createTempDirectory("graft_semadmit_maint")
    val sink = new UpsertSink(spark, root.resolve("sink").toString)
    val corpus = (1L to 120L).map(i => (i, vec(i.toInt)))
    // bootstrap: admit batch 1 and train
    SemanticAdmitPipeline.admitBatch(sink, "sem_corpus",
      corpus.toDF("vec_id", "embedding"), "vec_id", "embedding",
      threshold = 0.9, nlist = 4, m = 4, ksub = 8, nprobe = 4)
    // pre-bootstrap guard shape: a sink with no index measures nothing
    val virgin = new UpsertSink(spark, root.resolve("virgin").toString)
    assert(SemanticAdmitPipeline.maintainIndex(virgin, "sem_corpus",
      corpus.take(5).toDF("vec_id", "embedding"), "vec_id", "embedding").isEmpty)
    val v0 = sink.version("ann_codes")
    // a self-like batch is the trained distribution: measured, no rebuild
    val stable = SemanticAdmitPipeline.maintainIndex(sink, "sem_corpus",
      corpus.filter(_._1 % 3 == 0).toDF("vec_id", "embedding"),
      "vec_id", "embedding", nlist = 4, m = 4, ksub = 8)
    assert(stable.exists(!_.rebuilt) && sink.version("ann_codes") == v0)
    // a mode-collapsed batch (every vector one direction) crosses the
    // threshold: rebuild fires atomically from the accumulated corpus
    val collapsed = (200L to 260L).map(i => (i, Array.fill(dim)(0.37f)))
    val drifted = SemanticAdmitPipeline.maintainIndex(sink, "sem_corpus",
      collapsed.toDF("vec_id", "embedding"), "vec_id", "embedding",
      nlist = 4, m = 4, ksub = 8)
    assert(drifted.exists(_.rebuilt), s"drift not flagged: $drifted")
    assert(sink.version("ann_codes") != v0, "rebuild did not land")
    // admission keeps working off the rebuilt index: a stored dup dies,
    // a novel vector lands
    SemanticAdmitPipeline.admitBatch(sink, "sem_corpus",
      Seq((500L, vec(1, jitter = 0.001f)), (501L, vec(9999)))
        .toDF("vec_id", "embedding"), "vec_id", "embedding",
      threshold = 0.9, nlist = 4, m = 4, ksub = 8, nprobe = 4)
    val ids = sink.read("sem_corpus").select("vec_id").as[Long].collect().toSet
    assert(!ids.contains(500L), "near-dup of stored vector admitted post-rebuild")
    assert(ids.contains(501L), "novel vector lost post-rebuild")
  }

  test("LSH in-batch dedup path admits the same set as the exact path") {
    // exactDedupMaxBatch = 0 forces every batch onto the banded-LSH
    // in-batch dedup (the auto-switch large deployments hit); at these
    // settings (48 tables x 4 planes, threshold 0.9) collision recall
    // is ~1 on this corpus, so the admitted set must MATCH the exact
    // path's — pinning that the switch changes cost shape, not results.
    val batches = Seq(
      (0 until 40).map(i => (1000L + i, vec(i))) :+ (1040L, vec(1)),
      Seq((2001L, vec(3)), (2002L, vec(7, jitter = 0.3f)),
        (2003L, vec(777))),
      Seq((3001L, vec(777)), (3002L, vec(888))))
    def admitAll(exactMax: Int): Set[Long] = {
      val root = Files.createTempDirectory("graft_semadmit_parity")
      val sink = new UpsertSink(spark, root.resolve("sink").toString)
      batches.foreach { rows =>
        SemanticAdmitPipeline.admitBatch(sink, "sem_corpus",
          rows.toDF("vec_id", "embedding"), "vec_id", "embedding",
          threshold = 0.9, nlist = 4, m = 4, ksub = 8, nprobe = 4,
          exactDedupMaxBatch = exactMax)
      }
      sink.read("sem_corpus").select("vec_id").as[Long].collect().toSet
    }
    val exact = admitAll(Int.MaxValue)
    val lsh = admitAll(0)
    assert(exact == lsh,
      s"paths diverged: exact-only ${exact -- lsh}, lsh-only ${lsh -- exact}")
    assert(!exact.contains(1040L) && !exact.contains(3001L) &&
      exact.contains(2003L) && exact.contains(3002L))
  }

  test("per-batch admission cost stays flat as the corpus accumulates (the 100 TB claim)") {
    // q89's scale claim, MEASURED (the q83/CurationPipelineSpec
    // pattern): the stored-index probe bounds screen candidates to the
    // probed lists and the in-batch dedup is batch-local, so batch N
    // must cost what batch 2 cost even though the admitted corpus is
    // N× larger. Batch 1 additionally pays the bootstrap TRAIN and is
    // excluded from the baseline. GC-adjusted wall time; the late
    // figure is the MIN of the last two batches so a single load/GC
    // spike cannot trip the bound — only monotone corpus-proportional
    // growth can.
    val root = Files.createTempDirectory("graft_semadmit_flat")
    val sink = new UpsertSink(spark, root.resolve("sink").toString)
    val perBatch = 50
    val gcBeans = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans
    def gcSec(): Double = {
      var s = 0L
      gcBeans.forEach(b => s += b.getCollectionTime.max(0L))
      s / 1e3
    }
    val timings = (1 to 6).map { b =>
      val rows = (0 until perBatch)
        .map(i => (b * 10000L + i, vec(b * 1000 + i)))
      val t0 = System.nanoTime()
      val g0 = gcSec()
      SemanticAdmitPipeline.admitBatch(sink, "flat_corpus",
        rows.toDF("vec_id", "embedding"), "vec_id", "embedding",
        threshold = 0.9, nlist = 4, m = 4, ksub = 8, nprobe = 4)
      ((System.nanoTime() - t0) / 1e9 - (gcSec() - g0)).max(0.001)
    }
    info(s"per-batch seconds (gc-adjusted): ${timings.map(t => f"$t%.2f").mkString(", ")}")
    assert(sink.read("flat_corpus").count() >= 5L * perBatch)
    val mid = timings.slice(1, 4).sorted
    val baseline = mid(mid.length / 2)
    val late = math.min(timings(4), timings(5))
    assert(late <= baseline * 3.5,
      f"late batches ${timings(4)}%.2f/${timings(5)}%.2f s vs baseline " +
        f"$baseline%.2f s — per-batch admission cost is growing with " +
        "the corpus")
  }
}
