package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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

  /** Timestamp-flavor policy (see [[graft.ops.RelOps.epochUs]]): every
    * table enters the engine with instant (TIMESTAMP) event time under
    * the pinned UTC session zone. The upstream writer has shipped the
    * same data as TIMESTAMP(NANOS) (read as a nanos long under
    * `nanosAsLong`), as UTC-adjusted TIMESTAMP(MICROS), and as
    * TIMESTAMP(MICROS) without `isAdjustedToUTC` (Spark: TIMESTAMP_NTZ)
    * across regenerations — all three flavors normalize here, so no
    * downstream operator ever branches on flavor.
    */
  /** Parquet SCHEMA cache for the read-only source tables: schema
    * inference is a per-read 1-task Spark job + driver footer work
    * (~20-50 ms) that every catalog query pays 1-3x per invocation —
    * across a full bench run that is tens of seconds for metadata that
    * never changes (the test data is immutable within a run; schemas
    * are session-independent StructTypes). Data is NOT cached — every
    * invocation still scans the parquet files.
    */
  private val schemaCache = scala.collection.concurrent.TrieMap
    .empty[String, org.apache.spark.sql.types.StructType]

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val df = schemaCache.get(path) match {
      case Some(s) => spark.read.schema(s).parquet(path)
      case None =>
        val d = spark.read.parquet(path)
        schemaCache.put(path, d.schema)
        d
    }
    // events.ts as TIMESTAMP(NANOS) surfaces as a nanosecond long
    // (spark.sql.legacy.parquet.nanosAsLong). The data is microsecond-
    // resolution, so `div 1000` is lossless. Integer division: double
    // math would lose precision above 2^53 ns.
    val nanosFixed =
      if (name == "events" && df.schema("ts").dataType == LongType)
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else df
    // TIMESTAMP_NTZ -> TIMESTAMP is a lossless reinterpretation under the
    // UTC session zone, and matches the DuckDB oracle's naive epoch_us.
    nanosFixed.schema.fields.filter(_.dataType == TimestampNTZType)
      .foldLeft(nanosFixed) { (d, f) =>
        d.withColumn(f.name, col(f.name).cast(TimestampType))
      }
  }

  /** Register all tables as temp views (for spark.sql paths). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
