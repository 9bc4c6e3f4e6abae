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
}
