package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Exact uint256-width aggregation beyond the Decimal(38) cap. */
class BigIntAggregatesSpec extends SparkSpec {

  import spark.implicits._

  private val uint256Max =
    BigInt("115792089237316195423570985008687907853269984665640564039457584007913129639935")

  test("sums 78-digit values exactly (past DecimalType's 38-digit cap)") {
    val df = Seq(uint256Max.toString, uint256Max.toString, "1", null)
      .toDF("wei")
    val got = df.agg(BigIntAggregates.sum($"wei").as("total"))
      .as[String].head()
    assert(BigInt(got) == uint256Max * 2 + 1)
  }

  test("partial aggregation across partitions agrees with single-partition") {
    val values = (1 to 1000).map(i => (BigInt(10).pow(40) + i).toString)
    val one = values.toDF("v").coalesce(1)
      .agg(BigIntAggregates.sum($"v")).as[String].head()
    val many = values.toDF("v").repartition(13)
      .agg(BigIntAggregates.sum($"v")).as[String].head()
    assert(one == many)
    assert(BigInt(one) == values.map(BigInt(_)).sum)
  }

  test("grouped exact sums") {
    val df = Seq(("a", "1"), ("a", uint256Max.toString), ("b", "5"))
      .toDF("k", "v")
    val got = df.groupBy("k").agg(BigIntAggregates.sum($"v").as("s"))
      .as[(String, String)].collect().toMap
    assert(BigInt(got("a")) == uint256Max + 1)
    assert(got("b") == "5")
  }
}
