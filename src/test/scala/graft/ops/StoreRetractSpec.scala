package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sink.UpsertSink

/** Right-to-erasure over the persisted store groups: retracting ids
  * removes them from EVERY member table in one group delete, later
  * probes can never surface them as candidates, and untouched
  * documents' pairs are unaffected.
  */
class StoreRetractSpec extends SparkSpec {

  import spark.implicits._

  // digits tokenize OUT under the [a-z]+ tokenizer, so seeds encode as
  // letters — every doc gets a genuinely distinct token stream
  private def letters(n: Long): String =
    n.toString.map(c => ('a' + (c - '0')).toChar).mkString
  private def text(seed: Long): String =
    (0 until 12).map(i => s"w${letters(seed)}${letters(i)}").mkString(" ")

  test("minhashStoreRetract: erased docs vanish from both tables and all probes") {
    val sink = new UpsertSink(spark,
      Files.createTempDirectory("graft_retract_mh").toString, numBuckets = 4)
    // archive: 20 docs; batch doc 101 dups archive doc 3, 102 dups doc 7
    val archive = (1L to 20L).map(i => (i, text(i))).toDF("doc_id", "text")
    TextOps.minhashStoreBuild(archive, "doc_id", "text", sink,
      n = 3, k = 32, bands = 8)
    val batch = Seq((101L, text(3)), (102L, text(7))).toDF("doc_id", "text")
    val before = TextOps.minhashStoreProbe(batch, "doc_id", "text", sink,
        threshold = 0.9, n = 3, k = 32, bands = 8)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(before == Set((3L, 101L), (7L, 102L)), s"fixture broken: $before")
    // erase doc 3 (and an absent id — no-op)
    TextOps.minhashStoreRetract(Seq(3L, 999L).toDF("doc_id"), "doc_id", sink)
    assert(sink.read("neardup_bands").filter($"doc_id" === 3L).isEmpty)
    assert(sink.read("neardup_shingles").filter($"doc_id" === 3L).isEmpty)
    val after = TextOps.minhashStoreProbe(batch, "doc_id", "text", sink,
        threshold = 0.9, n = 3, k = 32, bands = 8)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(after == Set((7L, 102L)),
      s"erased doc still probes (or bystander lost): $after")
    // the other 19 docs' state is intact
    assert(sink.read("neardup_shingles").count() == 19)
  }

  test("embLshStoreRetract: erased vectors vanish from postings and vectors") {
    val sink = new UpsertSink(spark,
      Files.createTempDirectory("graft_retract_emb").toString, numBuckets = 4)
    // pseudo-random components (a sin(seed*31+i) family planted an
    // accidental 0.999-cosine pair at seeds 3 vs 18 — phase shift
    // nearly a 2-pi multiple); hashing spreads pairwise cosines near 0
    def vec(seed: Int): Array[Float] =
      Array.tabulate(16)(i =>
        ((((seed * 31L + i) * 2654435761L) % 1000L) / 1000.0f) - 0.5f)
    val archive = (1 to 20).map(i => (i.toLong, vec(i)))
      .toDF("vec_id", "embedding")
    SimOps.embLshStoreBuild(archive, "vec_id", "embedding", sink,
      planes = 4, tables = 8, dim = 16)
    val batch = Seq((101L, vec(3)), (102L, vec(7)))
      .toDF("vec_id", "embedding")
    val before = SimOps.embLshStoreProbe(batch, "vec_id", "embedding",
        sink, threshold = 0.999, planes = 4, tables = 8, dim = 16)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(before == Set((3L, 101L), (7L, 102L)), s"fixture broken: $before")
    SimOps.embLshStoreRetract(Seq(3L).toDF("vec_id"), "vec_id", sink)
    assert(sink.read("embdup_sigs").filter($"id" === 3L).isEmpty)
    assert(sink.read("embdup_vecs").filter($"id" === 3L).isEmpty)
    val after = SimOps.embLshStoreProbe(batch, "vec_id", "embedding",
        sink, threshold = 0.999, planes = 4, tables = 8, dim = 16)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(after == Set((7L, 102L)), s"retract broke the probe: $after")
    assert(sink.read("embdup_vecs").count() == 19)
  }
}
