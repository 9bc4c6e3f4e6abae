package graft.sink

import java.nio.file.Files

import graft.SparkSpec

/** The DSv2 write face: df.write modes map onto the sink's merge /
  * overwrite semantics.
  */
class StateStoreWriterSpec extends SparkSpec {

  import spark.implicits._

  private def fresh(): (UpsertSink, String) = {
    val sink = new UpsertSink(spark, Files.createTempDirectory("graft_w").toString)
    val key = s"w${System.nanoTime()}"
    StateStoreWriter.registry(key) = sink
    (sink, key)
  }

  private def write(key: String, df: org.apache.spark.sql.DataFrame,
                    mode: String): Unit =
    df.write.format("graft.sink.StateStoreWriter")
      .option("sink", key).option("table", "Builder").option("pk", "id")
      .mode(mode).save()

  test("append mode merges by primary key (ON CONFLICT semantics)") {
    val (sink, key) = fresh()
    write(key, Seq((1L, "a"), (2L, "b")).toDF("id", "v"), "append")
    write(key, Seq((2L, "B2"), (3L, "c")).toDF("id", "v"), "append")
    assert(sink.read("Builder").as[(Long, String)].collect().sorted.toSeq
      == Seq((1L, "a"), (2L, "B2"), (3L, "c")))
  }

  test("overwrite mode truncates and rewrites") {
    val (sink, key) = fresh()
    write(key, Seq((1L, "a"), (2L, "b")).toDF("id", "v"), "append")
    write(key, Seq((9L, "z")).toDF("id", "v"), "overwrite")
    assert(sink.read("Builder").as[(Long, String)].collect().toSeq
      == Seq((9L, "z")))
    // and merging after an overwrite works on the rewritten layout
    write(key, Seq((9L, "Z2"), (10L, "y")).toDF("id", "v"), "append")
    assert(sink.read("Builder").as[(Long, String)].collect().sorted.toSeq
      == Seq((9L, "Z2"), (10L, "y")))
  }

  test("composite primary key via the pk option") {
    val (sink, key) = fresh()
    Seq(("a", 1, "x"), ("a", 2, "y")).toDF("k1", "k2", "v")
      .write.format("graft.sink.StateStoreWriter")
      .option("sink", key).option("table", "T").option("pk", "k1, k2")
      .mode("append").save()
    Seq(("a", 2, "Y2")).toDF("k1", "k2", "v")
      .write.format("graft.sink.StateStoreWriter")
      .option("sink", key).option("table", "T").option("pk", "k1, k2")
      .mode("append").save()
    assert(sink.read("T").as[(String, Int, String)].collect().sorted.toSeq
      == Seq(("a", 1, "x"), ("a", 2, "Y2")))
  }

  test("unknown registry key fails loudly") {
    val e = intercept[Exception] {
      write("nope", Seq((1L, "a")).toDF("id", "v"), "append")
    }
    assert(e.getMessage.contains("no sink registered")
      || e.getCause != null && e.getCause.getMessage.contains("no sink registered"))
  }
}
