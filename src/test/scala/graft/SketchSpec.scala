package graft

import org.apache.spark.sql.functions._

/** Error bounds for the approximate sketch queries (q54/q55): the driver
  * can only rows-check them, so accuracy is pinned here against the exact
  * computations at sf0.001.
  */
class SketchSpec extends SparkSpec {

  test("q54: percentile_approx within 1% relative error of exact percentile") {
    val li = Tables.load(spark, sf, "lineitem")
    val approx = Catalog.byName("q54_quantile_sketch").fn(spark, sf).collect()
      .map(r => r.getString(0) -> Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    val exact = li.groupBy("l_returnflag")
      .agg(percentile(col("l_extendedprice"), lit(0.5)).as("p50"),
        percentile(col("l_extendedprice"), lit(0.9)).as("p90"),
        percentile(col("l_extendedprice"), lit(0.99)).as("p99"))
      .collect().map(r => r.getString(0) -> Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(approx.keySet == exact.keySet)
    for ((flag, aq) <- approx; (a, e) <- aq.zip(exact(flag)))
      assert(math.abs(a - e) / e < 0.01, s"$flag: approx $a vs exact $e")
  }

  test("q61: count-min estimates only overcount, within the eps bound") {
    val docs = Tables.load(spark, sf, "documents")
    val rows = Catalog.byName("q61_cms_heavy_hitters").fn(spark, sf).collect()
    assert(rows.length == 20)
    // the bounded-candidate path must reproduce the exhaustive top-k
    // exactly: Misra-Gries guarantees coverage, exact verify the counts
    val exhaustive = docs
      .select(explode(graft.ops.TextOps.shingles(col("text"), 2)).as("g"))
      .groupBy("g").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("g")).limit(20).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSeq
      .sortBy(p => (-p._2, p._1)) == exhaustive,
      "candidate-based top-k diverged from the exhaustive top-k")
    val totalGrams = docs
      .select(explode(graft.ops.TextOps.shingles(col("text"), 2)).as("g"))
      .count()
    val epsBound = (0.0001 * totalGrams).ceil.toLong
    rows.foreach { r =>
      val (cnt, est) = (r.getLong(1), r.getLong(2))
      assert(est >= cnt, s"${r.getString(0)}: CMS undercounted $est < $cnt")
      assert(est <= cnt + epsBound,
        s"${r.getString(0)}: est $est exceeds cnt $cnt + eps*N $epsBound")
    }
  }

  test("q62: integer TF-IDF ranks rarer terms higher at equal tf") {
    val got = Catalog.byName("q62_keyword_search").fn(spark, sf).collect()
    assert(got.length == 20)
    // scores strictly ordered (desc, ties broken by id ascending)
    val scores = got.map(_.getLong(1)).toSeq
    assert(scores == scores.sorted.reverse)
    assert(scores.head > 0)
  }

  test("q55: approx_count_distinct within 5% of exact distinct counts") {
    val li = Tables.load(spark, sf, "lineitem")
    val approx = Catalog.byName("q55_distinct_sketch").fn(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_orderkey")).as("o"), countDistinct(col("l_partkey")).as("p"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    for ((flag, (ao, ap)) <- approx) {
      val (eo, ep) = exact(flag)
      assert(math.abs(ao - eo).toDouble / eo < 0.05, s"$flag orders: $ao vs $eo")
      assert(math.abs(ap - ep).toDouble / ep < 0.05, s"$flag parts: $ap vs $ep")
    }
  }
}
