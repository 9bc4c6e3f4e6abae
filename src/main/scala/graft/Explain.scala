package graft

/** Dev tool: print the formatted physical plan and wall time of one
  * catalog query. Usage: Explain <queryName> [sfDir] [runs]
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
    (1 to runs).foreach { i =>
      val t0 = System.nanoTime()
      val n = q.fn(spark, sfDir).count()
      println(f"run $i: $n rows in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
