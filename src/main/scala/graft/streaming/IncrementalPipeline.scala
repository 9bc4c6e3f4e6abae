package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.sink.UpsertSink

/** Structured-Streaming incremental pipeline: file-backed event stream ->
  * watermarked transforms -> idempotent PK merge via foreachBatch.
  *
  * This is the Spark-native shape of the reference's watch loop (SURVEY
  * §3.2): the micro-batch trigger replaces the 1 s block poll (T1),
  * checkpointing + `foreachBatch` merge give effectively-once delivery
  * (T8 — at-least-once + idempotent upsert), and the sink-side high-water
  * mark stays consistent with committed contents because the merge itself
  * is the commit (T5).
  */
object IncrementalPipeline {

  /** Start a stream that upserts the latest event per (user_id) into the
    * sink table — the streaming equivalent of q14_upsert_latest. The
    * per-batch reduction keeps the shuffle inside the micro-batch; the
    * merge dedupes across batches.
    */
  def latestEventPerUser(spark: SparkSession, sourceDir: String,
                         schema: StructType, sink: UpsertSink,
                         table: String, checkpoint: String,
                         trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val stream = graft.ops.RelOps.toEventTime(
      spark.readStream.schema(schema).parquet(sourceDir), "ts")
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val order = Seq(col("ts").desc, col("event_id").desc)
          val reduced = graft.ops.RelOps.latestByKey(batch, Seq("user_id"), order)
          // merge replaces stored rows WHOLESALE, and a later micro-batch
          // can legitimately carry an OLDER event (late file): fold the
          // stored rows for the touched users back in and re-reduce, so
          // the newest event survives whatever order batches arrive in
          val withStored =
            if (!sink.exists(table)) reduced
            else reduced.unionByName(sink.read(table)
              .join(reduced.select("user_id"), Seq("user_id"), "left_semi"))
          val latest = graft.ops.RelOps.latestByKey(withStored, Seq("user_id"), order)
          sink.merge(table, latest, Seq("user_id"), versionCol = Some("ts"))
        }
      }
      .start()
  }

  /** Windowed daily rollup with a watermark — append-mode aggregation over
    * event time (the DailyAllocation shape, A6, computed by the engine
    * instead of upstream).
    */
  def dailyRollup(spark: SparkSession, sourceDir: String, schema: StructType,
                  sink: UpsertSink, table: String, checkpoint: String): StreamingQuery = {
    val stream = graft.ops.RelOps.toEventTime(
      spark.readStream.schema(schema).parquet(sourceDir), "ts")
    stream
      .withWatermark("ts", "1 day")
      .groupBy(window(col("ts"), "1 day").as("w"))
      .agg(sum(col("value")).as("total_value"), count(lit(1)).as("n"))
      .select(to_date(col("w.start")).as("day"), col("total_value"), col("n"))
      .writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("update")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) sink.merge(table, batch, Seq("day"))
      }
      .start()
  }
}
