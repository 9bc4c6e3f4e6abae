package graft.ops

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

class GraphOpsSpec extends SparkSpec {

  import spark.implicits._

  /** In-test oracle: classic union-find with path compression. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x
      else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(ra.max(rb)) = ra.min(rb)
    }
    // root every node, then relabel each root to the component MIN id
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val byRoot = nodes.groupBy(find)
    byRoot.flatMap { case (_, ns) =>
      val m = ns.min; ns.map(_ -> m)
    }.toMap
  }

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] =
    GraphOps.connectedComponents(
        edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap

  test("chain collapses to one component labeled by its min") {
    val chain = (0L until 20L).sliding(2).map(s => (s(1), s(0))).toSeq
    val got = run(chain)
    assert(got.size == 20 && got.values.forall(_ == 0L))
  }

  test("disjoint components keep separate min labels") {
    val got = run(Seq((5L, 3L), (3L, 9L), (20L, 21L), (30L, 30L)))
    assert(got(5L) == 3L && got(9L) == 3L && got(3L) == 3L)
    assert(got(20L) == 20L && got(21L) == 20L)
    assert(got(30L) == 30L) // self-loop = singleton
  }

  test("empty edge list yields empty labeling") {
    assert(run(Seq.empty).isEmpty)
  }

  test("random graphs match union-find exactly") {
    val rnd = new Random(42)
    for (trial <- 1 to 5) {
      val n = 30 + trial * 20
      val m = n * 2
      val edges = Seq.fill(m)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      assert(run(edges) == unionFind(edges), s"trial $trial")
    }
  }

  test("materialized cluster table is reused across consumers, not recomputed") {
    val sink = new graft.sink.UpsertSink(spark,
      java.nio.file.Files.createTempDirectory("graft_cc_share").toString)
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 3L)).toDF("doc_id", "cluster")
    var computes = 0
    def compute() = { computes += 1; labels }
    // first consumer: table absent -> computes and materializes
    val first = GraphOps.readOrMaterialize(sink, "dup_clusters",
      Seq("doc_id"))(compute())
    assert(computes == 1)
    assert(first.as[(Long, Long)].collect().sorted.toSeq
      == Seq((1L, 1L), (2L, 1L), (3L, 3L)))
    // second consumer: reads the stored table, computation never re-runs
    val second = GraphOps.readOrMaterialize(sink, "dup_clusters",
      Seq("doc_id"))(compute())
    assert(computes == 1, "cluster table recomputed despite being stored")
    assert(second.as[(Long, Long)].collect().sorted.toSeq
      == Seq((1L, 1L), (2L, 1L), (3L, 3L)))
    // a producer refresh overwrites atomically; consumers see new labels
    GraphOps.materializeClusters(Seq((1L, 1L), (2L, 2L), (3L, 3L))
      .toDF("doc_id", "cluster"), sink, "dup_clusters", Seq("doc_id"))
    assert(GraphOps.readOrMaterialize(sink, "dup_clusters",
        Seq("doc_id"))(compute())
      .as[(Long, Long)].collect().sorted.toSeq
      == Seq((1L, 1L), (2L, 2L), (3L, 3L)))
    assert(computes == 1)
  }

  test("q59 cluster invariants hold on real near-dup pairs") {
    val docs = graft.Tables.load(spark, sf, "documents")
    val pairs = TextOps.simhashNearDupPairs(docs, "doc_id", "text", 2)
      .select(col("a_id"), col("b_id")).as[(Long, Long)].collect()
    val got = run(pairs.toSeq)
    // every adjacent pair agrees on its cluster, and labels are component mins
    val expect = unionFind(pairs.toSeq)
    assert(got == expect)
  }
}
