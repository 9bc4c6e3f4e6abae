package graft.app

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.ops.SimOps

/** Dev profiler for q89's semantic-admission stream: replays the
  * catalog's four micro-batches and times each admitBatch STAGE
  * separately (probe screen / in-batch dedup / lineage cut / merge /
  * bootstrap train), so the 14 s round-7 headline is attributable
  * line-by-line — the round-7 verdict asked for exactly this
  * breakdown. Mirrors [[graft.streaming.SemanticAdmitPipeline
  * .admitBatch]] stage-for-stage; keep the two in sync when the
  * pipeline changes.
  */
object AdmitProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.create()
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    val e = Tables.load(spark, dir, "embeddings")
    for (pass <- 1 to 2) {
      println(s"--- pass $pass ---")
      val root = java.nio.file.Files.createTempDirectory("admit_profile")
      val sink = new graft.sink.UpsertSink(spark, root.toString)
      val corpusTable = "sem_corpus"
      val threshold = 0.45
      time(s"pass $pass total") {
        (0 until 4).foreach { b =>
          println(s"  -- batch $b --")
          val rawBatch = e.filter(col("vec_id") % 4 === b)
          val batch = rawBatch.dropDuplicates("vec_id").cache()
          var screenedRef: org.apache.spark.sql.DataFrame = null
          try {
            val bootstrapped = SimOps.ivfPqIndexExists(sink) &&
              sink.exists(corpusTable)
            // CACHED like the pipeline (the round-8 fix this profiler
            // motivated): the count materializes the cache, so later
            // stages read it instead of re-running the probe — stage
            // timings then attribute each subtree once
            val screened =
              if (!bootstrapped) batch
              else time("screen (stored probe)") {
                val hits = SimOps.ivfPqProbeIndex(batch,
                    sink.read(corpusTable), "vec_id", "embedding", sink,
                    k = 1, nprobe = 10)
                  .filter(col("rank") === 1 && col("cosine") >= threshold)
                  .select(col("query_id").as("vec_id"))
                val s = batch.join(hits, Seq("vec_id"), "left_anti").cache()
                screenedRef = s
                s.count() // materialization boundary for timing only
                s
              }
            val inBatchDups = time("in-batch dedup pairs") {
              val d = SimOps.cosineNearDupPairs(screened, "vec_id",
                  "embedding", threshold)
                .select(col("b_id").as("vec_id")).distinct()
              d.count()
              d
            }
            val admitted = time("anti-join + localCheckpoint") {
              screened.join(inBatchDups, Seq("vec_id"), "left_anti")
                .localCheckpoint()
            }
            if (!admitted.isEmpty) {
              if (!bootstrapped) {
                time("bootstrap merge") {
                  sink.merge(corpusTable, admitted, Seq("vec_id"),
                    pkUnique = true)
                }
                time("bootstrap index TRAIN") {
                  SimOps.buildIvfPqIndex(sink.read(corpusTable), "vec_id",
                    "embedding", sink, nlist = 16, m = 16, ksub = 32)
                    .collect()
                }
              } else time("fused mergeMany") {
                sink.mergeMany(graft.sink.TableMerge(corpusTable, admitted,
                  Seq("vec_id"), pkUnique = true)
                  +: SimOps.ivfPqIndexAddMerges(admitted, "vec_id",
                    "embedding", sink))
              }
            }
          } finally {
            if (screenedRef != null) screenedRef.unpersist()
            batch.unpersist()
          }
        }
      }
    }
    spark.stop()
  }
}
