package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

import graft.sink.UpsertSink

/** Timestamp-flavor robustness (the round-6 breakage, pinned forever).
  *
  * The upstream writer has shipped `events.ts` in three parquet flavors
  * across regenerations: TIMESTAMP(NANOS) (a nanos long under
  * `nanosAsLong`), UTC-adjusted TIMESTAMP(MICROS), and TIMESTAMP(MICROS)
  * without `isAdjustedToUTC` — which Spark surfaces as TIMESTAMP_NTZ and
  * which broke `unix_micros` (q37) and `withWatermark`
  * (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE) in round 6. This spec writes an
  * explicitly-NTZ copy of the fixtures and pins that (a) the loader
  * normalizes it, (b) every event-time catalog query is flavor-invariant,
  * and (c) the streaming watermark pipelines accept an NTZ source.
  */
class TimestampFlavorSpec extends SparkSpec {

  /** Fixture dir whose events.parquet is explicitly TIMESTAMP_NTZ; all
    * other tables symlink to the real fixtures so any catalog query runs.
    */
  private lazy val ntzDir: String = {
    val root = Files.createTempDirectory("graft_ntz")
    sys.addShutdownHook(graft.sink.Fs.deleteRecursively(root))
    Tables.load(spark, sf, "events")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
      .write.parquet(root.resolve("events.parquet").toString)
    for (n <- Tables.names if n != "events")
      Files.createSymbolicLink(
        root.resolve(s"$n.parquet"), Paths.get(s"$sf/$n.parquet"))
    root.toString
  }

  test("fixture is genuinely NTZ on disk and the loader normalizes it") {
    val raw = spark.read.parquet(s"$ntzDir/events.parquet")
    assert(raw.schema("ts").dataType == TimestampNTZType,
      "fixture must exercise the NTZ path")
    val loaded = Tables.load(spark, ntzDir, "events")
    assert(loaded.schema("ts").dataType == TimestampType,
      "Tables.load must normalize NTZ to instant TIMESTAMP")
  }

  test("epochUs is flavor-proof (NTZ == instant under UTC session)") {
    val raw = spark.read.parquet(s"$ntzDir/events.parquet")
      .select(graft.ops.RelOps.epochUs(col("ts")).as("us"), col("event_id"))
    val norm = Tables.load(spark, sf, "events")
      .select(graft.ops.RelOps.epochUs(col("ts")).as("us"), col("event_id"))
    assert(raw.exceptAll(norm).isEmpty && norm.exceptAll(raw).isEmpty)
  }

  // Every catalog query that consumes event time must be flavor-invariant:
  // identical rows whether events.ts arrives as TIMESTAMP or TIMESTAMP_NTZ.
  private val tsQueries = Seq("q13_daily_rollup", "q19_sliding_window",
    "q21_window_lag", "q22_asof_join", "q36_quantiles", "q37_sessionize")

  for (name <- tsQueries) {
    test(s"$name is timestamp-flavor-invariant") {
      val q = Catalog.byName(name)
      val a = q.fn(spark, sf).collect()
      val b = q.fn(spark, ntzDir).collect()
      assert(a.length == b.length, s"row counts differ: ${a.length} vs ${b.length}")
      assert(a.sameElements(b), "rows differ between flavors")
    }
  }

  test("daily-rollup watermark stream accepts an NTZ source") {
    val root = Files.createTempDirectory("graft_ntz_stream")
    sys.addShutdownHook(graft.sink.Fs.deleteRecursively(root))
    val src = root.resolve("src").toString
    spark.read.parquet(s"$ntzDir/events.parquet")
      .filter(col("event_id") <= 500).coalesce(1).write.parquet(src)
    val schema = spark.read.parquet(src).schema
    assert(schema("ts").dataType == TimestampNTZType)
    val sink = new UpsertSink(spark, root.resolve("sink").toString)
    val q = graft.streaming.IncrementalPipeline.dailyRollup(
      spark, src, schema, sink, "daily", root.resolve("ckpt").toString)
    q.awaitTermination()
    val got = sink.read("daily").agg(sum(col("n"))).head.getLong(0)
    val want = Tables.load(spark, sf, "events")
      .filter(col("event_id") <= 500).count()
    assert(got == want)
  }
}
