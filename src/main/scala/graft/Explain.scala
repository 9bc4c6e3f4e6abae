package graft

/** Dev tool: print the formatted physical plan and wall time of one
  * catalog query. Usage: Explain <queryName> [sfDir] [runs]
  * With GRAFT_EXPLAIN_CODEGEN=1, also prints per-subtree generated-code
  * stats (source size, max JVM method bytecode size, constant-pool
  * size) — the bounded-codegen audit (a plan literal that expands into
  * generated SOURCE grows these; a reference object does not).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val runs = if (args.length > 2) args(2).toInt else 1
    val spark = GraftSession.create()
    val q = Catalog.byName(name)
    val df = q.fn(spark, sfDir)
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    if (sys.env.contains("GRAFT_EXPLAIN_CODEGEN")) {
      // under AQE the WholeStageCodegen nodes only exist in the
      // materialized final plan — execute THIS QueryExecution (a
      // writer would build its own), then unwrap
      df.queryExecution.toRdd.foreach(_ => ())
      val plan = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
      val subtrees = org.apache.spark.sql.execution.debug.codegenStringSeq(plan)
      println(s"[codegen] ${subtrees.size} whole-stage subtrees")
      subtrees.zipWithIndex.foreach { case ((subtree, code, stats), i) =>
        println(f"[codegen] subtree $i: source ${code.length}%,d chars, " +
          s"maxMethodCodeSize ${stats.maxMethodCodeSize} bytecode bytes, " +
          s"maxConstPoolSize ${stats.maxConstPoolSize}, " +
          s"innerClasses ${stats.numInnerClasses}")
        println(subtree.linesIterator.take(4).mkString("  ", "\n  ", "\n"))
      }
    }
    (1 to runs).foreach { i =>
      val t0 = System.nanoTime()
      val n = q.fn(spark, sfDir).count()
      println(f"run $i: $n rows in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
