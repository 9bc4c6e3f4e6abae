package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The bounded top-k aggregate: exact agreement with the row_number
  * window it replaces, partitioning-invariance (the merge path), and the
  * deterministic tie-break (score DESC, id ASC).
  */
class TopKAggregateSpec extends SparkSpec {

  import spark.implicits._

  private def rows: Seq[(Long, Double, Long)] =
    for {
      g <- 0L until 7L
      i <- 0L until 200L
    } yield (g, math.sin(g * 1000 + i) * 100, g * 1000 + i)

  test("matches the row_number window formulation exactly") {
    val df = rows.toDF("g", "score", "id")
    val k = 9
    val viaAgg = df.groupBy("g")
      .agg(TopKAggregate.topIds($"score", $"id", k).as("top"))
      .select($"g", posexplode($"top").as(Seq("rk", "id")))
      .select($"g", ($"rk" + 1).as("rk"), $"id")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy($"score".desc, $"id".asc)
    val viaWindow = df.withColumn("rk", row_number().over(w))
      .filter($"rk" <= k).select($"g", $"rk".cast("int"), $"id")
    assert(viaAgg.exceptAll(viaWindow).isEmpty
      && viaWindow.exceptAll(viaAgg).isEmpty)
  }

  test("partitioning-invariant: 1 vs 16 partitions, same result") {
    val df = rows.toDF("g", "score", "id")
    def run(parts: Int): Array[(Long, Seq[Long])] =
      df.repartition(parts)
        .groupBy("g").agg(TopKAggregate.topIds($"score", $"id", 5).as("top"))
        .orderBy("g").as[(Long, Seq[Long])].collect()
    assert(run(1).toSeq == run(16).toSeq)
  }

  test("ties break to the lower id, and k > group size returns all") {
    val df = Seq((1L, 2.0, 30L), (1L, 2.0, 10L), (1L, 2.0, 20L),
      (1L, 5.0, 99L)).toDF("g", "score", "id")
    val got = df.groupBy("g")
      .agg(TopKAggregate.topIds($"score", $"id", 10).as("top"))
      .as[(Long, Seq[Long])].collect().head._2
    assert(got == Seq(99L, 10L, 20L, 30L))
  }

  test("map-side partial aggregation: the plan carries a partial_ stage") {
    val df = rows.toDF("g", "score", "id")
    val plan = df.groupBy("g")
      .agg(TopKAggregate.topIds($"score", $"id", 5).as("top"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_"),
      s"expected a partial aggregate below the exchange:\n$plan")
  }
}
