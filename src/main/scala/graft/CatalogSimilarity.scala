package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{MinHashFunctions, WinnowFunctions}
import graft.ops.{BpeOps, ChatOps, ClassifierOps, GraphOps, MultimodalOps, RelOps, SampleOps, SelectOps, SimOps, TextOps, WebOps}

/** Similarity search + multimodal metadata (q32-q35). */
private[graft] trait CatalogSimilarity extends CatalogShared {

  // ---------------------------------------------------------------------
  // Training-data pipeline: similarity search + multimodal (SimOps)
  // ---------------------------------------------------------------------

  val similarity: Seq[QueryDef] = Seq(

    QueryDef("q32_cosine_topk",
      "Similarity search baseline: exact cosine top-5 per query vector " +
        "(query side broadcast; corpus never shuffles).",
      Some(s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
             |q AS (SELECT vec_id AS query_id, embedding AS qv FROM e
             |      WHERE vec_id % 100 = 0),
             |p AS (SELECT q.query_id, e.vec_id AS neighbor_id,
             |    ${sqlCosine("q.qv", "e.embedding")} AS c
             |  FROM q JOIN e ON e.vec_id <> q.query_id),
             |r AS (SELECT query_id, neighbor_id, c,
             |    row_number() OVER (PARTITION BY query_id
             |                       ORDER BY c DESC, neighbor_id) AS rank
             |  FROM p)
             |SELECT query_id, neighbor_id, round(c, 6) AS cosine, rank
             |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin),
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        SimOps.bruteForceTopK(
          e.filter(col("vec_id") % 100 === 0), e, "vec_id", "embedding", 5)
          .orderBy("query_id", "rank")
      }),

    QueryDef("q33_embed_neardup",
      "Embedding-cosine near-dup pairs (threshold 0.45), exhaustive " +
        "all-pairs formulation — kept ONLY as the oracle baseline; the " +
        "default operator a user reaches for is q41 (SimOps.lshNearDupPairs, " +
        "bucketed candidate gen + exact verify).",
      Some(s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
             |p AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id,
             |    ${sqlCosine("a.embedding", "b.embedding")} AS c
             |  FROM e a JOIN e b ON a.vec_id < b.vec_id)
             |SELECT a_id, b_id, round(c, 6) AS cosine FROM p
             |WHERE round(c, 6) >= 0.45 ORDER BY a_id, b_id""".stripMargin),
      (s, dir) => SimOps.cosineNearDupPairs(
          t(s, dir, "embeddings"), "vec_id", "embedding", 0.45)
        .orderBy("a_id", "b_id")),

    QueryDef("q34_ann_lsh",
      "ANN scale path: random-hyperplane LSH bucketing + exact re-rank. " +
        "Approximate by design -> no SQL oracle (driver rows-only check); " +
        "recall is a FIRST-CLASS audit column (recall_mil per query vs " +
        "the in-query exact baseline over the bounded probe set — the " +
        "q105 audit pattern), bounds pinned in CatalogSpec/SimOpsSpec.",
      None,
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val q = e.filter(col("vec_id") % 100 === 0)
        // short signatures / many tables: this corpus's neighbors are
        // weakly similar (cos ~0.45) — see SimOpsSpec recall analysis
        SimOps.withRecallAudit(
            SimOps.lshTopK(q, e, "vec_id", "embedding", 5,
              planes = 4, tables = 16),
            SimOps.bruteForceTopK(q, e, "vec_id", "embedding", 5), 5)
          .orderBy("query_id", "rank")
      }),

    QueryDef("q35_multimodal_meta",
      "Multimodal plumbing: opaque binary payload column + typed metadata " +
        "extraction (the decode itself is the deterministic stub in " +
        "MultimodalOps; here the SQL-expressible byte-level metadata).",
      Some("""SELECT doc_id, octet_length(CAST(text AS BLOB)) AS bytes,
             |  octet_length(CAST(text AS BLOB)) % 640 AS fake_width,
             |  (octet_length(CAST(text AS BLOB)) * 31) % 480 AS fake_height
             |FROM documents ORDER BY doc_id""".stripMargin),
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("blob"))
        .select(col("doc_id"), length(col("blob")).as("bytes"),
          (length(col("blob")) % 640).as("fake_width"),
          (length(col("blob")) * 31 % 480).as("fake_height"))
        .orderBy("doc_id"))
  )
}
