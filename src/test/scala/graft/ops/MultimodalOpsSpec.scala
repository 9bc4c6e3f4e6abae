package graft.ops

import graft.{SparkSpec, Tables}

/** Multimodal plumbing: binary payload column, per-partition batch
  * decode, deterministic features feeding the similarity ops.
  */
class MultimodalOpsSpec extends SparkSpec {

  import spark.implicits._

  test("payload column is binary; metadata decode is typed and total") {
    val docs = Tables.load(spark, sf, "documents").limit(50)
    val withBlob = MultimodalOps.withPayload(docs, "text")
    assert(withBlob.schema("payload").dataType
      == org.apache.spark.sql.types.BinaryType)
    val meta = MultimodalOps.decodeMeta(withBlob, "doc_id", MultimodalOps.FakeCodec)
    val rows = meta.collect()
    assert(rows.length == 50)
    assert(rows.forall(m => m.bytes > 0 && m.width < 640 && m.height < 480))
  }

  test("feature extraction is deterministic and partition-invariant") {
    val docs = Tables.load(spark, sf, "documents").limit(40)
    val blob = MultimodalOps.withPayload(docs, "text")
    def run(parts: Int): Map[Long, Seq[Float]] =
      MultimodalOps.extractFeatures(blob.repartition(parts), "doc_id",
          MultimodalOps.FakeCodec, dim = 16)
        .as[(Long, Seq[Float])].collect().toMap
    val a = run(1)
    val b = run(7)
    assert(a == b) // same features regardless of partitioning
    assert(a.values.forall(_.length == 16))
  }

  test("extracted features flow into similarity search") {
    val docs = Tables.load(spark, sf, "documents").limit(30)
    val feats = MultimodalOps.extractFeatures(
      MultimodalOps.withPayload(docs, "text"), "doc_id", MultimodalOps.FakeCodec)
    val top = SimOps.bruteForceTopK(
      feats.filter($"doc_id" === 0), feats, "doc_id", "embedding", 3)
    assert(top.count() == 3)
  }
}
