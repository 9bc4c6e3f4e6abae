package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.ops.{TextOps, WebOps}
import graft.sink.UpsertSink

/** The COMPOSED streaming curation pipeline: every micro-batch runs the
  * full crawl-admission chain —
  *
  *   URL screen -> boilerplate line filter -> PII scrub -> near-dup admit
  *
  * (q76 -> q72 -> q71 -> q64 as one `foreachBatch`). The first three
  * stages are deliberately BATCH-LOCAL: the URL screen's canonical-key
  * shuffle, the line filter's row-local HOFs and the PII regex columns
  * never read persisted state, so their cost is O(batch) no matter how
  * large the accumulated corpus grows. Only the final admission stage
  * touches state, and it already bounds its corpus verify-joins to
  * band-key collisions ([[DedupPipeline.admitNearDups]]) — so the
  * screens' per-batch cost cannot depend on the accumulated corpus.
  * CurationPipelineSpec pins this structurally (the screens never see
  * the sink handle; their plan's only scans are the batch itself) and
  * pins the chain's semantics end-to-end across batches and restarts.
  */
object CurationPipeline {

  /** The stateless screens of one micro-batch, exactly as the stream
    * runs them: URL screen (canonicalize, in-batch crawl-dup collapse,
    * domain blocklist), then line filter (drop lines with fewer than
    * `minLineWords` word tokens), then PII redaction. Returns the
    * surviving (idCol, textCol) rows — the admission stage's input.
    *
    * In-batch-only URL dedup, documented choice: a canonical URL seen
    * in an EARLIER batch does not suppress this batch's copy here —
    * cross-batch content dedup is the admission stage's job (and its
    * near-dup screen subsumes the exact-dup case, since two crawls of
    * one canonical URL carry near-identical text). Keeping the URL
    * stage stateless is what keeps it map-shaped at 100 TB.
    */
  def curateBatch(batch: DataFrame, idCol: String, urlCol: String,
                  textCol: String, blocked: Seq[String],
                  minLineWords: Int = 4): DataFrame = {
    val kept = WebOps.screenUrls(
      batch.select(col(idCol), col(urlCol)), idCol, urlCol, blocked)
    batch.join(kept.select(col(idCol)), Seq(idCol), "left_semi")
      .select(col(idCol),
        TextOps.filterLines(col(textCol),
          TextOps.contentLine(minLineWords)).as("__clean"))
      .select(col(idCol), TextOps.redactPii(col("__clean")).as(textCol))
  }

  /** File-source streaming form: each arriving parquet batch of
    * (doc_id, url, text) rows is curated ([[curateBatch]]) and the
    * survivors screened into the persistent corpus
    * ([[DedupPipeline.admitNearDups]] — MinHash-LSH vs the admitted
    * corpus, survivors merged). Checkpointed and replay-idempotent for
    * the same reasons as [[DedupPipeline.nearDupDedupStream]].
    */
  def curatedAdmitStream(spark: SparkSession, sourceDir: String,
                         schema: StructType, sink: UpsertSink,
                         corpusTable: String, bandsTable: String,
                         checkpoint: String, urlCol: String,
                         blocked: Seq[String], minLineWords: Int = 4,
                         trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val docs = spark.readStream.schema(schema).parquet(sourceDir)
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (rawBatch: DataFrame, _: Long) =>
        DedupPipeline.admitNearDups(sink, corpusTable, bandsTable,
          curateBatch(rawBatch, "doc_id", urlCol, "text", blocked,
            minLineWords))
      }
      .start()
  }
}
