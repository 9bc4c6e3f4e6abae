package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Misra-Gries candidate-summary guarantees: coverage of true heavy
  * hitters at tiny capacity, under real partitioned merges.
  */
class FreqSummarySpec extends SparkSpec {

  import spark.implicits._

  test("every item with count > N/capacity survives the summary") {
    // Zipf-ish stream: item i appears 1000/i times, shuffled and spread
    // over many partitions so partial summaries genuinely merge
    val stream = scala.util.Random.shuffle(
      (1 to 50).flatMap(i => Seq.fill(1000 / i)(s"item$i")).toList)
    val n = stream.size
    val capacity = 16
    val df = stream.toDF("g").repartition(8)
    val cand = df.agg(FreqSummary.candidates(col("g"), capacity))
      .head.getSeq[String](0).toSet
    assert(cand.size <= capacity, s"summary exceeded capacity: ${cand.size}")
    val mustHave = (1 to 50).filter(i => 1000 / i > n / capacity)
      .map(i => s"item$i").toSet
    assert(mustHave.nonEmpty, "test lost its heavy hitters")
    assert(mustHave.subsetOf(cand),
      s"missed guaranteed heavy hitters: ${mustHave -- cand}")
  }

  test("capacity >= vocabulary keeps every item exactly") {
    val df = Seq("a", "b", "a", "c", "a", "b").toDF("g").repartition(3)
    val cand = df.agg(FreqSummary.candidates(col("g"), 100))
      .head.getSeq[String](0)
    assert(cand.sorted == Seq("a", "b", "c"))
  }

  test("nulls are skipped, empty input yields an empty summary") {
    val df = Seq(Some("a"), None, Some("a")).toDF("g")
    assert(df.agg(FreqSummary.candidates(col("g"), 4))
      .head.getSeq[String](0) == Seq("a"))
    assert(df.filter(lit(false)).agg(FreqSummary.candidates(col("g"), 4))
      .head.getSeq[String](0).isEmpty)
  }
}
