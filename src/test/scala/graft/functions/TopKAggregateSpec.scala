package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The bounded top-k aggregate: exact agreement with the row_number
  * window it replaces (ids AND scores AND ranks), partitioning-
  * invariance (the merge path), deterministic tie-break (score DESC,
  * id ASC), and exact-duplicate suppression (what lets multi-bucket
  * candidate generators skip their pre-aggregation distinct()).
  */
class TopKAggregateSpec extends SparkSpec {

  import spark.implicits._

  private def rows: Seq[(Long, Double, Long)] =
    for {
      g <- 0L until 7L
      i <- 0L until 200L
    } yield (g, math.sin(g * 1000 + i) * 100, g * 1000 + i)

  test("matches the row_number window formulation exactly (id, score, rank)") {
    val df = rows.toDF("g", "score", "id")
    val k = 9
    val viaAgg = df.groupBy("g")
      .agg(TopKAggregate.top($"score", $"id", k).as("top"))
      .select($"g", posexplode($"top").as(Seq("i", "e")))
      .select($"g", ($"i" + 1).as("rk"), $"e._1".as("id"), $"e._2".as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy($"score".desc, $"id".asc)
    val viaWindow = df.withColumn("rk", row_number().over(w))
      .filter($"rk" <= k).select($"g", $"rk".cast("int"), $"id", $"score")
    assert(viaAgg.exceptAll(viaWindow).isEmpty
      && viaWindow.exceptAll(viaAgg).isEmpty)
  }

  test("partitioning-invariant: 1 vs 16 partitions, same result") {
    val df = rows.toDF("g", "score", "id")
    def run(parts: Int): Array[(Long, Seq[(Long, Double)])] =
      df.repartition(parts)
        .groupBy("g").agg(TopKAggregate.top($"score", $"id", 5).as("top"))
        .orderBy("g").as[(Long, Seq[(Long, Double)])].collect()
    assert(run(1).toSeq == run(16).toSeq)
  }

  test("ties break to the lower id, and k > group size returns all") {
    val df = Seq((1L, 2.0, 30L), (1L, 2.0, 10L), (1L, 2.0, 20L),
      (1L, 5.0, 99L)).toDF("g", "score", "id")
    val got = df.groupBy("g")
      .agg(TopKAggregate.top($"score", $"id", 10).as("top"))
      .as[(Long, Seq[(Long, Double)])].collect().head._2
    assert(got.map(_._1) == Seq(99L, 10L, 20L, 30L))
  }

  test("exact (score, id) duplicates collapse — across partitions too") {
    // the same pair emitted from several LSH tables / partitions must
    // occupy ONE slot, not crowd out distinct candidates
    val dup = (1 to 6).map(_ => (1L, 7.0, 42L)) ++
      Seq((1L, 5.0, 1L), (1L, 4.0, 2L), (1L, 3.0, 3L))
    val got = dup.toDF("g", "score", "id").repartition(4)
      .groupBy("g").agg(TopKAggregate.top($"score", $"id", 3).as("top"))
      .as[(Long, Seq[(Long, Double)])].collect().head._2
    assert(got.map(_._1) == Seq(42L, 1L, 2L))
  }

  test("true interpreted plan (NO_CODEGEN) matches codegen end-to-end") {
    val df = rows.toDF("g", "score", "id")
    def run() = df.groupBy("g")
      .agg(TopKAggregate.top($"score", $"id", 5).as("top"))
      .orderBy("g").as[(Long, Seq[(Long, Double)])].collect().toSeq
    val viaCodegen = run()
    val interp = withInterpreted(run())
    assert(interp == viaCodegen)
  }

  test("map-side partial aggregation: the plan carries a partial_ stage") {
    val df = rows.toDF("g", "score", "id")
    val plan = df.groupBy("g")
      .agg(TopKAggregate.top($"score", $"id", 5).as("top"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_"),
      s"expected a partial aggregate below the exchange:\n$plan")
  }
}
