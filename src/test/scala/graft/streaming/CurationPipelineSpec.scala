package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.sink.UpsertSink

/** The composed crawl-curation chain (URL screen -> line filter -> PII
  * scrub -> near-dup admit): stage semantics compose, the stateless
  * screens never see the sink, and the streaming form holds its
  * admission guarantees across batches and restarts.
  */
class CurationPipelineSpec extends SparkSpec {

  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("raw_url", StringType),
    StructField("text", StringType)))

  private val contentA =
    "the quick brown fox jumps over the lazy dog\nhome login\n" +
      "contact me at user1@example.com for more details today"
  private val contentD =
    "completely different content words appear here for the fourth document"

  private def batch1 = Seq(
    // survives: canonical keeper, content lines kept, email redacted
    (1L, "https://A.Example.org/x?utm=1", contentA),
    // blocked host dies, and so does a subdomain of a blocked entry
    (2L, "https://spam.example/x", "spam text with many words in this line"),
    (7L, "https://deep.spam.example/y", "subdomain spam with many words here"),
    // same canonical URL as doc 1 (case/query/fragment differences):
    // crawl-dup collapses to the SMALLEST id regardless of its text
    (3L, "https://a.example.org/x#frag",
      "totally unrelated text that still has many words"),
    (4L, "https://b.example.org/y", contentD))

  test("curateBatch: screen order and semantics compose") {
    val out = CurationPipeline.curateBatch(
        batch1.toDF("doc_id", "raw_url", "text"),
        "doc_id", "raw_url", "text", Seq("spam.example"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.keySet == Set(1L, 4L),
      s"expected the canonical keeper + the clean doc, got ${out.keySet}")
    // the 2-word boilerplate line is gone, the content lines survive
    val t1 = out(1L)
    assert(!t1.contains("home login"))
    assert(t1.startsWith("the quick brown fox"))
    // PII redaction ran AFTER filtering, on the surviving lines
    assert(t1.contains("<EMAIL>") && !t1.contains("user1@example.com"))
    assert(out(4L) == contentD)
  }

  test("curateBatch is structurally stateless: no sink, plan scans only the batch") {
    // the screens take no sink handle at all — per-batch cost cannot
    // depend on the accumulated corpus. The plan check pins the same
    // fact at the physical level: one scan subtree, of the batch.
    val curated = CurationPipeline.curateBatch(
      batch1.toDF("doc_id", "raw_url", "text"),
      "doc_id", "raw_url", "text", Seq("spam.example"))
    val scans = curated.queryExecution.optimizedPlan.collectLeaves()
    // leaves: the batch (twice — screen branch and payload branch) and
    // the broadcast blocklist literal; nothing file- or state-backed
    assert(scans.forall(l =>
      l.getClass.getSimpleName.contains("LocalRelation")
        || l.getClass.getSimpleName.contains("LogicalRDD")),
      s"unexpected stateful scan in the stateless screens: $scans")
  }

  test("curated admission stream: cross-batch near-dups die, restarts replay clean") {
    val root = Files.createTempDirectory("graft_curation")
    val src = root.resolve("docs"); Files.createDirectories(src)
    val sink = new UpsertSink(spark, root.resolve("sink").toString)
    val checkpoint = root.resolve("chk").toString

    def write(rows: Seq[(Long, String, String)]): Unit =
      rows.toDF("doc_id", "raw_url", "text").coalesce(1)
        .write.mode("append").parquet(src.toString)

    def run(): Unit =
      CurationPipeline.curatedAdmitStream(spark, src.toString, schema,
          sink, "corpus", "bands", checkpoint, "raw_url",
          Seq("spam.example"))
        .awaitTermination(120000)

    write(batch1)
    run()
    def corpus(): Map[Long, String] =
      sink.read("corpus").select("doc_id", "text").as[(Long, String)]
        .collect().toMap
    val first = corpus()
    assert(first.keySet == Set(1L, 4L), s"batch-1 admission wrong: ${first.keySet}")
    assert(first(1L).contains("<EMAIL>"))

    // batch 2 after a restart: doc 5 carries doc 1's exact raw text from
    // a DIFFERENT allowed URL — the URL screen (batch-local) passes it,
    // the near-dup admission against the PERSISTED corpus must kill it.
    // Doc 6 is genuinely new and must land.
    write(Seq(
      (5L, "https://c.example.org/z", contentA),
      (6L, "https://d.example.org/w",
        "another brand new document carrying plenty of unique words")))
    run()
    val second = corpus()
    assert(!second.contains(5L), "cross-batch near-dup was admitted")
    assert(second.contains(6L))
    assert(second.view.filterKeys(first.keySet).toMap == first,
      "replay altered previously admitted documents")
    assert(second.keySet == Set(1L, 4L, 6L))
  }

  test("per-batch cost stays flat as the corpus accumulates (the 100 TB claim)") {
    // The structural guarantee (screens never see the sink; admission
    // bounds corpus reads to band collisions) predicts batch N costs
    // what batch 1 cost even though the persisted corpus is N× larger.
    // Measure it: 6 equal-size batches of mutually-unique documents; a
    // LATE batch must not cost more than a small multiple of the
    // cheapest earlier batch (generous bound — wall time on a shared
    // test box is noisy; what must NOT appear is the monotone growth a
    // corpus-sized verify join would show).
    val root = Files.createTempDirectory("graft_curation_flat")
    val src = root.resolve("docs"); Files.createDirectories(src)
    val sink = new UpsertSink(spark, root.resolve("sink").toString)
    val checkpoint = root.resolve("chk").toString
    val perBatch = 40
    // letters-only words: the tokenizer is [a-z]+, so digits would split
    // every id into the SAME token stream and make all docs near-dups
    def alpha(n: Int): String = n.toString.map(c => ('a' + (c - '0')).toChar)
    def uniqueDoc(b: Int, i: Int): String =
      (0 until 12).map(w => s"tok${alpha(b)}q${alpha(i)}q${alpha(w)} unique")
        .mkString(" ")
    // GC-ADJUSTED wall time: a late-batch GC pause on a loaded box was
    // the one spurious way this spec could trip (round-7 advice), and
    // JVM-wide collection time is directly measurable — subtract it so
    // the comparison sees compute+IO, not collector luck
    val gcBeans = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans
    def gcSec(): Double = {
      var s = 0L
      gcBeans.forEach(b => s += b.getCollectionTime.max(0L))
      s / 1e3
    }
    val timings = (1 to 6).map { b =>
      (0 until perBatch).map(i => (b * 1000L + i,
          s"https://host$b.example.org/p$i", uniqueDoc(b, i)))
        .toDF("doc_id", "raw_url", "text").coalesce(1)
        .write.mode("append").parquet(src.toString)
      val t0 = System.nanoTime()
      val g0 = gcSec()
      CurationPipeline.curatedAdmitStream(spark, src.toString, schema,
          sink, "flat_corpus", "flat_bands", checkpoint, "raw_url",
          Seq("spam.example"))
        .awaitTermination(120000)
      ((System.nanoTime() - t0) / 1e9 - (gcSec() - g0)).max(0.001)
    }
    info(s"per-batch seconds (gc-adjusted): ${timings.map(t => f"$t%.2f").mkString(", ")}")
    assert(sink.read("flat_corpus").count() == 6L * perBatch)
    // median of batches 2-4 as the baseline (batch 1 pays state init; a
    // median shrugs off a single load spike where a min would not) vs
    // the MIN of the two late batches — one contaminated late batch
    // cannot trip the bound alone. Generous 3.5x: a loaded box inflates
    // every batch roughly alike, so only genuine corpus-proportional
    // growth trips this.
    val mid = timings.slice(1, 4).sorted
    val baseline = mid(mid.length / 2)
    val late = math.min(timings(4), timings(5))
    assert(late <= baseline * 3.5,
      f"late batches ${timings(4)}%.2f/${timings(5)}%.2f s vs baseline " +
        f"$baseline%.2f s — per-batch cost is growing with the corpus")
  }
}
