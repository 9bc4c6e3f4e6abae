package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver's synthetic TPC-H-ish tables (TESTDATA.md).
  *
  * Every query in [[Catalog]] reads through here so that scan-level
  * concerns (schema, pruning-friendly layout) live in one place. At
  * cluster scale these would be external-catalog tables (partitioned,
  * stats-collected); in this harness they are raw parquet files.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // events.ts is TIMESTAMP(NANOS) in parquet, which Spark surfaces as a
    // nanosecond long (spark.sql.legacy.parquet.nanosAsLong). The data is
    // microsecond-resolution, so `div 1000` is lossless. Integer division:
    // double math would lose precision above 2^53 ns.
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }

  /** Register all tables as temp views (for spark.sql paths). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
