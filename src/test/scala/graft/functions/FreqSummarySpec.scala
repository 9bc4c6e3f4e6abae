package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Misra-Gries candidate-summary guarantees: coverage of true heavy
  * hitters at tiny capacity, under real partitioned merges.
  */
class FreqSummarySpec extends SparkSpec {

  import spark.implicits._

  private def summarize(df: org.apache.spark.sql.DataFrame,
                        capacity: Int): (Seq[String], Boolean) = {
    val row = df.agg(FreqSummary.candidates(col("g"), capacity))
      .head.getStruct(0)
    (row.getSeq[String](0), row.getBoolean(1))
  }

  test("every item with count > N/capacity survives the summary") {
    // Zipf-ish stream: item i appears 1000/i times, shuffled and spread
    // over many partitions so partial summaries genuinely merge
    val stream = scala.util.Random.shuffle(
      (1 to 50).flatMap(i => Seq.fill(1000 / i)(s"item$i")).toList)
    val n = stream.size
    val capacity = 16
    val (cand, overflowed) = summarize(stream.toDF("g").repartition(8), capacity)
    assert(cand.size <= capacity, s"summary exceeded capacity: ${cand.size}")
    assert(overflowed, "50 distinct items through capacity 16 must evict")
    val mustHave = (1 to 50).filter(i => 1000 / i > n / capacity)
      .map(i => s"item$i").toSet
    assert(mustHave.nonEmpty, "test lost its heavy hitters")
    assert(mustHave.subsetOf(cand.toSet),
      s"missed guaranteed heavy hitters: ${mustHave -- cand}")
  }

  test("capacity >= vocabulary keeps every item exactly, un-overflowed") {
    val (cand, overflowed) =
      summarize(Seq("a", "b", "a", "c", "a", "b").toDF("g").repartition(3), 100)
    assert(cand.sorted == Seq("a", "b", "c"))
    assert(!overflowed, "nothing evicted -> the summary is the exact dictionary")
  }

  test("nulls are skipped, empty input yields an empty summary") {
    val df = Seq(Some("a"), None, Some("a")).toDF("g")
    assert(summarize(df, 4) == (Seq("a"), false))
    assert(summarize(df.filter(lit(false)), 4)._1.isEmpty)
  }
}
