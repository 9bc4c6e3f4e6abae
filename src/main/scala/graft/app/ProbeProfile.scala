package graft.app

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.ops.SimOps

/** Dev profiler for the q82 stored-index probe: times each stage
  * separately so a slow pass is attributable line-by-line (the round-6
  * verdict asked for exactly this breakdown).
  */
object ProbeProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.create()
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    val root = java.nio.file.Files.createTempDirectory("probe_profile")
    val sink = new graft.sink.UpsertSink(spark, root.toString)
    val e = Tables.load(spark, dir, "embeddings")
    time("build (once)") {
      SimOps.buildIvfPqIndex(e, "vec_id", "embedding", sink).collect()
    }
    for (pass <- 1 to 3) {
      println(s"--- pass $pass ---")
      time(s"pass $pass total") {
        val q = e.filter(col("vec_id") % 100 === 0)
        val df = time("construct plan") {
          SimOps.ivfPqProbeIndex(q, e, "vec_id", "embedding", sink, 5)
            .orderBy("query_id", "rank")
        }
        time("analyze")(df.schema)
        val out = time("execute") { df.collect() }
        println(s"rows=${out.length}")
      }
    }
    spark.stop()
  }
}
