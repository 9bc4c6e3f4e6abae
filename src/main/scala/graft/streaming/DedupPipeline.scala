package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.ops.TextOps
import graft.sink.UpsertSink

/** Streaming exact deduplication for a training-data ingest: documents
  * stream in, the canonical content fingerprint (md5 over
  * whitespace-normalized lowercase — the same expression as the batch
  * q27/q28 operators) keys a streaming dropDuplicates, and the first
  * occurrence of each fingerprint lands in the corpus table.
  *
  * State posture at 100 TB: plain `dropDuplicates` keeps every seen
  * fingerprint in state forever — exact across the whole stream, but
  * state grows with corpus cardinality. Passing `within` switches to
  * `dropDuplicatesWithinWatermark`, which evicts fingerprints once the
  * event-time watermark passes the delay: duplicates arriving within the
  * window are still caught, state stays bounded by the window's
  * fingerprint cardinality, and far-apart re-crawls are left to the
  * batch dedup pass (q28) — the standard two-tier dedup layout.
  *
  * The sink merge is keyed by fingerprint, and because the stream
  * delivers at most one row per fingerprint (state filtered), replayed
  * micro-batches after a restart merge idempotently (T8).
  */
object DedupPipeline {

  def exactDedupStream(spark: SparkSession, sourceDir: String,
                       schema: StructType, sink: UpsertSink, table: String,
                       checkpoint: String, tsCol: Option[String] = None,
                       within: Option[String] = None,
                       trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val docs = spark.readStream.schema(schema).parquet(sourceDir)
      .withColumn("fingerprint", TextOps.fingerprint(col("text")))
    val deduped = (tsCol, within) match {
      case (Some(ts), Some(delay)) =>
        docs.withWatermark(ts, delay).dropDuplicatesWithinWatermark("fingerprint")
      case _ => docs.dropDuplicates("fingerprint")
    }
    deduped.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          sink.merge(table, batch, Seq("fingerprint"))
      }
      .start()
  }
}
