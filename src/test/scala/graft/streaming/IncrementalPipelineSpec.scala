package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.sink.UpsertSink

/** Structured Streaming integration: file-backed micro-batches ->
  * foreachBatch PK merge; restart resumes from the checkpoint.
  */
class IncrementalPipelineSpec extends SparkSpec {

  import spark.implicits._

  private def stage(): (String, String, UpsertSink, org.apache.spark.sql.types.StructType) = {
    val root = Files.createTempDirectory("graft_stream")
    val src = root.resolve("src").toString
    val events = Tables.load(spark, sf, "events")
    // first half of the stream arrives
    events.filter($"event_id" <= 500).coalesce(1).write.parquet(src)
    (src, root.resolve("ckpt").toString,
      new UpsertSink(spark, root.resolve("sink").toString), events.schema)
  }

  test("latest-per-user stream merges micro-batches and resumes after restart") {
    val (src, ckpt, sink, schema) = stage()
    val q1 = IncrementalPipeline.latestEventPerUser(spark, src, schema, sink,
      "latest", ckpt)
    q1.awaitTermination()
    val firstHalf = sink.read("latest")
    val expected1 = Tables.load(spark, sf, "events").filter($"event_id" <= 500)
      .groupBy("user_id").agg(max(struct($"ts", $"event_id")).as("m"))
      .select($"user_id", $"m.event_id".as("event_id"))
    assert(firstHalf.count() == expected1.count())

    // late data arrives; a NEW query on the same checkpoint picks up only
    // the new files (T8: resume from committed offsets)
    Tables.load(spark, sf, "events").filter($"event_id" > 500)
      .coalesce(1).write.mode("append").parquet(src)
    val q2 = IncrementalPipeline.latestEventPerUser(spark, src, schema, sink,
      "latest", ckpt)
    q2.awaitTermination()

    val got = sink.read("latest").select("user_id", "event_id")
      .as[(Long, Long)].collect().toMap
    val want = Tables.load(spark, sf, "events")
      .groupBy("user_id").agg(max(struct($"ts", $"event_id")).as("m"))
      .select($"user_id", $"m.event_id".as("event_id"))
      .as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("daily rollup stream aggregates with watermark into the sink") {
    val (src, ckpt, sink, schema) = stage()
    val q = IncrementalPipeline.dailyRollup(spark, src, schema, sink, "daily", ckpt)
    q.awaitTermination()
    val got = sink.read("daily").select("day", "n").as[(java.sql.Date, Long)]
      .collect().toMap
    val want = Tables.load(spark, sf, "events").filter($"event_id" <= 500)
      .groupBy(to_date($"ts").as("day")).agg(count(lit(1)).as("n"))
      .as[(java.sql.Date, Long)].collect().toMap
    assert(got == want)
  }
}
