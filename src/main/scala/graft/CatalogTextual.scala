package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{MinHashFunctions, WinnowFunctions}
import graft.ops.{BpeOps, ChatOps, ClassifierOps, GraphOps, MultimodalOps, RelOps, SampleOps, SelectOps, SimOps, TextOps, WebOps}

/** Text analysis + text dedup (q24-q31, q59, q63, q64, q66). */
private[graft] trait CatalogTextual extends CatalogShared {

  // ---------------------------------------------------------------------
  // Training-data pipeline: text analysis (TextOps)
  // ---------------------------------------------------------------------

  val textual: Seq[QueryDef] = Seq(

    QueryDef("q24_token_stats",
      "Token counting: whitespace tokens + a BPE-ish subword count, " +
        "all codegen'd regexp expressions.",
      Some(s"""SELECT doc_id, length(text) AS chars,
             |  len(regexp_extract_all(text, '\\S+')) AS ws_tokens,
             |  len(regexp_extract_all(lower(text),
             |      '[a-z]{1,4}|[0-9]{1,3}|[^a-z0-9\\s]')) AS subwords
             |FROM documents ORDER BY doc_id""".stripMargin),
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"), length(col("text")).as("chars"),
          TextOps.tokenCount(col("text")).as("ws_tokens"),
          TextOps.subwordCount(col("text")).as("subwords"))
        .orderBy("doc_id")),

    QueryDef("q25_quality_score",
      "Quality scoring: length / punctuation / stopword-ratio heuristic in " +
        "pure integer arithmetic (oracle-reproducible).",
      Some(s"""SELECT doc_id,
             |  $sqlPunctMil AS punct_mil,
             |  $sqlStopMil AS stop_mil,
             |  $sqlQualityMil AS quality_mil
             |FROM documents ORDER BY doc_id""".stripMargin),
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"),
          TextOps.punctRatioMil(col("text")).as("punct_mil"),
          TextOps.stopwordRatioMil(col("text")).as("stop_mil"),
          TextOps.qualityScoreMil(col("text")).as("quality_mil"))
        .orderBy("doc_id")),

    QueryDef("q26_langid",
      "Language-ID n-gram/stopword heuristic with deterministic argmax.",
      Some {
        val (hitExprs, maxExpr, nWin, firstWin) = sqlLangPieces
        s"""WITH h AS (SELECT doc_id, lang, $hitExprs FROM documents),
           |m AS (SELECT *, $maxExpr AS mx FROM h)
           |SELECT doc_id, lang, CASE WHEN mx = 0 OR ($nWin) > 1
           |  THEN 'und' ELSE ($firstWin) END AS guess
           |FROM m ORDER BY doc_id""".stripMargin
      },
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          TextOps.langId(col("text")).as("guess"))
        .orderBy("doc_id")),

    QueryDef("q27_fingerprint",
      "Document fingerprinting: md5 of whitespace-normalized text (stable " +
        "across engines).",
      Some("""SELECT doc_id,
             |  md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp
             |FROM documents ORDER BY doc_id""".stripMargin),
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
        .orderBy("doc_id")),

    QueryDef("q28_dedup_exact",
      "Exact dedup: hash-groupBy on the content fingerprint; keeper = " +
        "min doc_id per group (one shuffle on the hash).",
      Some("""SELECT md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp,
             |  min(doc_id) AS keeper, count(*) AS n
             |FROM documents GROUP BY fp ORDER BY fp""".stripMargin),
      (s, dir) => t(s, dir, "documents")
        .groupBy(TextOps.fingerprint(col("text")).as("fp"))
        .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n"))
        .orderBy("fp")),

    QueryDef("q29_dedup_minhash",
      "Near-dup detection: MinHash(128) -> 32 LSH bands -> candidate pairs " +
        "-> exact 3-gram-shingle Jaccard >= 0.5. The oracle computes " +
        "exhaustive Jaccard; the planted near-dups sit at j>=0.9 with the " +
        "organic background at j<=0.07, so band recall is exact here " +
        "(miss probability (1-0.9^4)^32 ~ 1e-15).",
      Some("""WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') w
             |  FROM documents),
             |sh AS (SELECT doc_id, CASE WHEN len(w) < 3
             |    THEN [array_to_string(w, ' ')]
             |    ELSE list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
             |                        for i in range(1, len(w) - 1)]) END AS s
             |  FROM toks),
             |p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
             |    CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
             |      / len(list_distinct(list_concat(a.s, b.s))) AS j
             |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
             |SELECT a_id, b_id, round(j, 4) AS jac FROM p
             |WHERE j >= 0.5 ORDER BY a_id, b_id""".stripMargin),
      (s, dir) => {
        val docs = t(s, dir, "documents")
        // shuffle-free candidate generation: MinHashBandKeys computes all
        // 128 minima + 32 band keys in one codegen pass per document, so
        // the only shuffle in the query is the band equi-join itself
        MinHashFunctions.register(s)
        val banded = docs.select(col("doc_id"),
          explode(MinHashFunctions.bandKeys(
            TextOps.shingles(col("text"), 3), 128, 32)).as("band"))
        val cands = banded.as("x").join(banded.as("y"),
            col("x.band") === col("y.band") && col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
          .distinct()
        val sets = docs.select(col("doc_id"), TextOps.shingles(col("text"), 3).as("sh"))
        val a = sets.select(col("doc_id").as("a_id"), col("sh").as("a_sh"))
        val b = sets.select(col("doc_id").as("b_id"), col("sh").as("b_sh"))
        cands.join(a, "a_id").join(b, "b_id")
          .withColumn("j", TextOps.jaccard(col("a_sh"), col("b_sh")))
          .filter(col("j") >= 0.5)
          .select(col("a_id"), col("b_id"), round(col("j"), 4).as("jac"))
          .orderBy("a_id", "b_id")
      }),

    QueryDef("q30_simhash",
      "SimHash document signatures (16-bit, md5-derived word hashes so the " +
        "SQL oracle reproduces every bit).",
      Some("""WITH w AS (SELECT doc_id,
             |    unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
             |  FROM documents),
             |wc AS (SELECT doc_id, word, count(*) AS cnt FROM w GROUP BY doc_id, word),
             |h AS (SELECT doc_id, cnt,
             |    CAST(concat('0x', substr(md5(word), 1, 15)) AS BIGINT) AS hv
             |  FROM wc),
             |bits AS (SELECT doc_id, t.b,
             |    sum(CASE WHEN (hv >> CAST(t.b AS INTEGER)) & 1 = 1
             |             THEN cnt ELSE -cnt END) AS sgn
             |  FROM h, range(16) t(b) GROUP BY doc_id, t.b)
             |SELECT doc_id,
             |  CAST(sum(CASE WHEN sgn >= 0
             |       THEN CAST(1 AS BIGINT) << CAST(b AS INTEGER) ELSE 0 END) AS BIGINT) AS simhash
             |FROM bits GROUP BY doc_id ORDER BY doc_id""".stripMargin),
      (s, dir) => TextOps.simhash(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),

    QueryDef("q31_simhash_neardup",
      "SimHash near-dup pairs: hamming distance <= 2 over the 16-bit " +
        "signature. Spark prunes candidates by 4-bit bands (pigeonhole: " +
        "hamming<=2 over 4 bands guarantees a shared band, so recall is " +
        "exactly 1); the oracle compares all pairs.",
      Some("""WITH w AS (SELECT doc_id,
             |    unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
             |  FROM documents),
             |wc AS (SELECT doc_id, word, count(*) AS cnt FROM w GROUP BY doc_id, word),
             |h AS (SELECT doc_id, cnt,
             |    CAST(concat('0x', substr(md5(word), 1, 15)) AS BIGINT) AS hv
             |  FROM wc),
             |bits AS (SELECT doc_id, t.b,
             |    sum(CASE WHEN (hv >> CAST(t.b AS INTEGER)) & 1 = 1
             |             THEN cnt ELSE -cnt END) AS sgn
             |  FROM h, range(16) t(b) GROUP BY doc_id, t.b),
             |sig AS (SELECT doc_id,
             |    CAST(sum(CASE WHEN sgn >= 0
             |         THEN CAST(1 AS BIGINT) << CAST(b AS INTEGER) ELSE 0 END) AS BIGINT) AS sh
             |  FROM bits GROUP BY doc_id)
             |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
             |  CAST(bit_count(xor(a.sh, b.sh)) AS INTEGER) AS dist
             |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
             |WHERE bit_count(xor(a.sh, b.sh)) <= 2
             |ORDER BY a_id, b_id""".stripMargin),
      (s, dir) => TextOps.simhashNearDupPairs(
          t(s, dir, "documents"), "doc_id", "text", maxDist = 2)
        .orderBy("a_id", "b_id")),

    QueryDef("q59_dup_clusters",
      "Duplicate CLUSTERS from near-dup pairs: distributed connected " +
        "components (min-label propagation + pointer jumping, O(log D) " +
        "rounds, every shuffle equi-keyed on a node id) over the q31 " +
        "SimHash pair graph; every doc gets its component's min id as " +
        "cluster plus the cluster size. Pairwise kill rules over-delete " +
        "on chains (a~b~c) — clusters are what dedup actually needs. " +
        "Oracle: recursive-CTE transitive closure.",
      Some("""WITH RECURSIVE w AS (SELECT doc_id,
             |    unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
             |  FROM documents),
             |wc AS (SELECT doc_id, word, count(*) AS cnt FROM w GROUP BY doc_id, word),
             |h AS (SELECT doc_id, cnt,
             |    CAST(concat('0x', substr(md5(word), 1, 15)) AS BIGINT) AS hv
             |  FROM wc),
             |bits AS (SELECT doc_id, t.b,
             |    sum(CASE WHEN (hv >> CAST(t.b AS INTEGER)) & 1 = 1
             |             THEN cnt ELSE -cnt END) AS sgn
             |  FROM h, range(16) t(b) GROUP BY doc_id, t.b),
             |sig AS (SELECT doc_id,
             |    CAST(sum(CASE WHEN sgn >= 0
             |         THEN CAST(1 AS BIGINT) << CAST(b AS INTEGER) ELSE 0 END) AS BIGINT) AS sh
             |  FROM bits GROUP BY doc_id),
             |e AS (SELECT a.doc_id AS s, b.doc_id AS d
             |  FROM sig a JOIN sig b
             |  ON a.doc_id <> b.doc_id AND bit_count(xor(a.sh, b.sh)) <= 2),
             |reach(s, d) AS (
             |  SELECT s, d FROM e
             |  UNION
             |  SELECT r.s, e2.d FROM reach r JOIN e e2 ON r.d = e2.s),
             |comp AS (SELECT s AS doc_id, least(s, min(d)) AS cluster
             |  FROM reach GROUP BY s)
             |SELECT d.doc_id, COALESCE(c.cluster, d.doc_id) AS cluster,
             |  CAST(count(*) OVER (PARTITION BY COALESCE(c.cluster, d.doc_id))
             |    AS BIGINT) AS csize
             |FROM documents d LEFT JOIN comp c USING (doc_id)
             |ORDER BY doc_id""".stripMargin),
      (s, dir) => {
        // producer: always recomputes CC, then materializes the cluster
        // table for every later consumer (q63) in this session
        val labeled = GraphOps.materializeClusters(
          dupClusterLabels(s, dir), tempStore.sink(s, "clusters", dir),
          "dup_clusters", Seq("doc_id"))
        labeled
          .withColumn("csize",
            count(lit(1)).over(Window.partitionBy("cluster")))
          .orderBy("doc_id")
      }),

    QueryDef("q63_cluster_best_keep",
      "Quality-aware dedup apply: each q59 duplicate cluster keeps its " +
        "HIGHEST-quality member (ties -> lowest id) — the min-id kill " +
        "rule can keep a worse copy of the same content. One row per " +
        "cluster: keeper id, its quality, cluster size. The per-cluster " +
        "argmax is a map-side-combinable max over (score, -id) structs, " +
        "never a window over the corpus.",
      Some(s"""WITH RECURSIVE w AS (SELECT doc_id,
             |    unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
             |  FROM documents),
             |wc AS (SELECT doc_id, word, count(*) AS cnt FROM w GROUP BY doc_id, word),
             |h AS (SELECT doc_id, cnt,
             |    CAST(concat('0x', substr(md5(word), 1, 15)) AS BIGINT) AS hv
             |  FROM wc),
             |bits AS (SELECT doc_id, t.b,
             |    sum(CASE WHEN (hv >> CAST(t.b AS INTEGER)) & 1 = 1
             |             THEN cnt ELSE -cnt END) AS sgn
             |  FROM h, range(16) t(b) GROUP BY doc_id, t.b),
             |sig AS (SELECT doc_id,
             |    CAST(sum(CASE WHEN sgn >= 0
             |         THEN CAST(1 AS BIGINT) << CAST(b AS INTEGER) ELSE 0 END) AS BIGINT) AS sh
             |  FROM bits GROUP BY doc_id),
             |e AS (SELECT a.doc_id AS s, b.doc_id AS d
             |  FROM sig a JOIN sig b
             |  ON a.doc_id <> b.doc_id AND bit_count(xor(a.sh, b.sh)) <= 2),
             |reach(s, d) AS (
             |  SELECT s, d FROM e
             |  UNION
             |  SELECT r.s, e2.d FROM reach r JOIN e e2 ON r.d = e2.s),
             |comp AS (SELECT s AS doc_id, least(s, min(d)) AS cluster
             |  FROM reach GROUP BY s),
             |lab AS (SELECT d.doc_id, COALESCE(c.cluster, d.doc_id) AS cluster,
             |    $sqlQualityMil AS score
             |  FROM documents d LEFT JOIN comp c USING (doc_id)),
             |ranked AS (SELECT *, row_number() OVER (PARTITION BY cluster
             |    ORDER BY score DESC, doc_id) AS rn FROM lab),
             |agg AS (SELECT cluster, count(*) AS csize FROM lab GROUP BY cluster)
             |SELECT a.cluster, r.doc_id AS keeper,
             |  CAST(r.score AS BIGINT) AS best_score,
             |  CAST(a.csize AS BIGINT) AS csize
             |FROM agg a JOIN ranked r ON a.cluster = r.cluster AND r.rn = 1
             |ORDER BY a.cluster""".stripMargin),
      (s, dir) => {
        // consumer: reads the cluster table q59 materialized (recompute
        // only when running standalone in a fresh session) — CC runs
        // once per pipeline, not once per consumer
        val clusters = GraphOps.readOrMaterialize(
          tempStore.sink(s, "clusters", dir), "dup_clusters", Seq("doc_id"))(
          dupClusterLabels(s, dir))
        val lab = t(s, dir, "documents")
          .select(col("doc_id"), TextOps.qualityScoreMil(col("text")).as("score"))
          .join(clusters, Seq("doc_id"))
        lab.groupBy("cluster")
          .agg(count(lit(1)).as("csize"),
            max(struct(col("score"), (-col("doc_id")).as("nid"))).as("__m"))
          .select(col("cluster"), (-col("__m.nid")).as("keeper"),
            col("__m.score").as("best_score"), col("csize"))
          .orderBy("cluster")
      }),

    QueryDef("q64_stream_admit",
      "Streaming near-dup ADMISSION, batch-replay form: documents arrive " +
        "in 4 ordered micro-batches (batch = doc_id % 4) and each batch " +
        "runs the EXACT foreachBatch core of DedupPipeline." +
        "nearDupDedupStream — MinHash-LSH band keys equi-join the batch " +
        "against the persisted band table of previously ADMITTED docs, " +
        "candidates verify with exact 3-gram Jaccard >= 0.5, smaller " +
        "doc_id survives within a batch; survivors merge into the corpus " +
        "and band tables (UpsertSink). Output: the admitted set. The " +
        "oracle replays the same 4 batches with exhaustive Jaccard — " +
        "parity also proves LSH candidate recall 1 on this corpus.",
      Some("""WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') w
             |  FROM documents),
             |sh AS (SELECT doc_id, CASE WHEN len(w) < 3
             |    THEN [array_to_string(w, ' ')]
             |    ELSE list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
             |                        for i in range(1, len(w) - 1)]) END AS s
             |  FROM toks),
             |d AS (SELECT doc_id, doc_id % 4 AS b, s FROM sh),
             |pair AS (SELECT a.doc_id AS a_id, x.doc_id AS b_id, x.b AS bb
             |  FROM d a JOIN d x ON a.doc_id <> x.doc_id
             |  WHERE CAST(len(list_intersect(a.s, x.s)) AS DOUBLE)
             |        / len(list_distinct(list_concat(a.s, x.s))) >= 0.5),
             |a0 AS (SELECT doc_id FROM d WHERE b = 0 AND NOT EXISTS (
             |    SELECT 1 FROM pair p WHERE p.a_id = d.doc_id
             |      AND p.bb = 0 AND p.b_id < d.doc_id)),
             |a1 AS (SELECT doc_id FROM d WHERE b = 1
             |  AND NOT EXISTS (SELECT 1 FROM pair p WHERE p.a_id = d.doc_id
             |    AND p.bb = 1 AND p.b_id < d.doc_id)
             |  AND NOT EXISTS (SELECT 1 FROM pair p JOIN a0 ON p.b_id = a0.doc_id
             |    WHERE p.a_id = d.doc_id)),
             |adm01 AS (SELECT doc_id FROM a0 UNION ALL SELECT doc_id FROM a1),
             |a2 AS (SELECT doc_id FROM d WHERE b = 2
             |  AND NOT EXISTS (SELECT 1 FROM pair p WHERE p.a_id = d.doc_id
             |    AND p.bb = 2 AND p.b_id < d.doc_id)
             |  AND NOT EXISTS (SELECT 1 FROM pair p JOIN adm01 ON p.b_id = adm01.doc_id
             |    WHERE p.a_id = d.doc_id)),
             |adm012 AS (SELECT doc_id FROM adm01 UNION ALL SELECT doc_id FROM a2),
             |a3 AS (SELECT doc_id FROM d WHERE b = 3
             |  AND NOT EXISTS (SELECT 1 FROM pair p WHERE p.a_id = d.doc_id
             |    AND p.bb = 3 AND p.b_id < d.doc_id)
             |  AND NOT EXISTS (SELECT 1 FROM pair p JOIN adm012 ON p.b_id = adm012.doc_id
             |    WHERE p.a_id = d.doc_id))
             |SELECT doc_id, doc_id % 4 AS batch FROM (
             |  SELECT doc_id FROM adm012 UNION ALL SELECT doc_id FROM a3)
             |ORDER BY doc_id""".stripMargin),
      (s, dir) => {
        val docs = t(s, dir, "documents")
        // fresh (emptied) store per invocation: the replay always starts
        // from an empty corpus, exactly like a new stream with a new
        // checkpoint — but reuses one disk root, deleted on JVM exit
        val sink = tempStore.freshSink(s, "admit", dir)
        (0 until 4).foreach { b =>
          graft.streaming.DedupPipeline.admitNearDups(sink, "corpus",
            "bands", docs.filter(col("doc_id") % 4 === b))
        }
        sink.read("corpus")
          .select(col("doc_id"), (col("doc_id") % 4).as("batch"))
          .orderBy("doc_id")
      }),

    QueryDef("q66_segment_dedup",
      "Segment-level exact dedup (the C4/RefinedWeb move): 25-word " +
        "segments, drop every segment whose exact content occurred " +
        "earlier in the corpus (global (doc_id, seg_idx) order), rebuild " +
        "documents from survivors. Catches boilerplate repeated ACROSS " +
        "distinct documents that doc-level dedup (q28) cannot see. ONE " +
        "tokenize+explode+md5 pass: the keeper is a row_number window " +
        "partitioned by the segment hash (group size = a segment's " +
        "duplication count), and n_segs/n_kept/rebuilt text all derive " +
        "from the same exploded rows.",
      Some("""WITH toks AS (SELECT doc_id,
             |    regexp_extract_all(lower(text), '[a-z]+') w FROM documents),
             |segl AS (SELECT doc_id,
             |    [{'i': i, 's': array_to_string(w[(i*25+1):(i*25+25)], ' ')}
             |     for i in range(0, CAST(ceil(len(w)/25.0) AS INTEGER))] AS ss
             |  FROM toks),
             |seg AS (SELECT doc_id, u.i AS seg_idx, u.s AS s
             |  FROM (SELECT doc_id, unnest(ss) AS u FROM segl)),
             |keep AS (SELECT doc_id, seg_idx, s,
             |    row_number() OVER (PARTITION BY md5(s)
             |      ORDER BY doc_id, seg_idx) AS rn
             |  FROM seg),
             |k AS (SELECT doc_id, CAST(count(*) AS INTEGER) AS n_kept,
             |    string_agg(s, ' ' ORDER BY seg_idx) AS text_kept
             |  FROM keep WHERE rn = 1 GROUP BY doc_id),
             |n AS (SELECT doc_id,
             |    CAST(COALESCE(ceil(len(w)/25.0), 0) AS INTEGER) AS n_segs
             |  FROM toks)
             |SELECT n.doc_id, n.n_segs,
             |  COALESCE(k.n_kept, 0) AS n_kept,
             |  COALESCE(k.text_kept, '') AS text_kept
             |FROM n LEFT JOIN k USING (doc_id) ORDER BY doc_id""".stripMargin),
      (s, dir) => TextOps.segmentDedup(t(s, dir, "documents"),
          "doc_id", "text", segWords = 25)
        .orderBy("doc_id"))
  )

}
