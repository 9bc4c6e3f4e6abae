package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{MinHashFunctions, WinnowFunctions}
import graft.ops.{BpeOps, ChatOps, ClassifierOps, EraseOps, GraphOps, MultimodalOps, RelOps, SampleOps, SearchOps, SelectOps, SimOps, TextOps, WebOps}

/** Incremental stores + lifecycle capstones (q106-q132). */
private[graft] trait CatalogStores extends CatalogShared {

  // ---------------------------------------------------------------------
  // Serving-side analytics beyond the reference's own surface
  // ---------------------------------------------------------------------

  val stores: Seq[QueryDef] = Seq(

    QueryDef("q106_dsir_resample",
      "DSIR's actual SELECTION step (Xie et al. 2023 §2): k draws " +
        "WITHOUT replacement with inclusion odds proportional to the " +
        "importance weights, via the Gumbel-max trick — each doc's key " +
        "is log_w + Gumbel(0,1) with the noise derived " +
        "deterministically from md5(id:seed), so the sample is fully " +
        "reproducible given (seed, corpus) yet statistically correct. " +
        "Float log-weights inside -> rows-only; SelectOpsSpec pins " +
        "seeded determinism and weight-monotone inclusion (in-domain " +
        "docs dominate across seeds). topk_overlap_mil rides every row " +
        "(r12 verdict #7): the Gumbel draws' overlap with the exact " +
        "top-k by pure weight — uniform sampling reads ~k/corpus, " +
        "deterministic arg-top-k reads 1000, a correct importance " +
        "sampler sits between, CatalogSpec-bounded. Plan: two bounded " +
        "histograms driver-side, then ONE map-only scoring scan + two " +
        "TakeOrderedAndProject over the same scored frame — resampling " +
        "100 TB never sorts globally.",
      None,
      (s, dir) => {
        val docs = t(s, dir, "documents")
        SelectOps.dsirResampleAudited(docs,
          docs.filter(col("doc_id") % 11 === 0),
          "doc_id", "text", k = 50, seed = 42L, buckets = 512)
      }),

    QueryDef("q107_perplexity_scale",
      "The perplexity-bucketing 100 TB PATH as a driver-visible query " +
        "(q103 is the exact ntile oracle form): ONE LM pass " +
        "(perplexityScored, materialized), percentile_approx " +
        "per-language cutoffs (GK sketch — single-pass, mergeable; " +
        "#langs rows), then map-side tier assignment through a " +
        "BROADCAST cutoff join — no per-language window, no global " +
        "sort, the corpus never shuffles. Sketch-derived cutoffs have " +
        "no cross-engine oracle -> rows-only, but the agreement with " +
        "the EXACT ntile form is DRIVER-CHECKED every round (r12, the " +
        "recall_mil pattern): agree_mil — the per-mille of docs whose " +
        "sketch tier equals the exact tier, computed off the SAME " +
        "checkpointed scored frame — rides every row; CatalogSpec " +
        "bounds it >= 800 and pins no two-tier flips. The exact-tier " +
        "window is the AUDIT harness, not the scale path (at 100 TB " +
        "run the sketch path alone); PlanShapeSpec pins the " +
        "broadcast/no-window/no-recomputed-LM plan on the operator.",
      None,
      (s, dir) => {
        val scored = SelectOps
          .perplexityScored(t(s, dir, "documents"), "doc_id", "text")
          .localCheckpoint() // ONE LM pass feeds thresholds AND tiers
        val tiers = SelectOps.perplexityBucketsByThresholdFromScored(
          scored, "doc_id", SelectOps.perplexityThresholdsFromScored(scored))
        val exact = SelectOps.perplexityBucketsFromScored(scored, "doc_id")
          .select(col("doc_id"), col("ppl_bucket").as("__exact"))
        // NOT checkpointed: the agreement agg and the returned rows do
        // re-execute the tier join + exact window, but both read the
        // checkpointed `scored`, and an A/B measured the extra
        // checkpoint WRITE at +0.2 s vs the re-execution it saves
        val joined = tiers.join(exact, "doc_id")
        val agree = joined.agg(
          floor(avg(when(col("ppl_bucket") === col("__exact"), lit(1000.0))
            .otherwise(lit(0.0)))).cast("long").as("__agree")).collect()(0)
          .getLong(0)
        joined.drop("__exact")
          .withColumn("agree_mil", lit(agree))
          .orderBy("doc_id")
      }),

    QueryDef("q108_curation_select",
      "The pretraining-data pipeline COMPOSED, end to end, under one " +
        "exact oracle: quality gate (q25's integer heuristic >= 500) " +
        "-> exact dedup (q28's fingerprint, min-id keeper via one " +
        "fp-keyed window) -> language filter (q26's deterministic " +
        "argmax = 'en') -> DSIR selection (q102's integer affinity, " +
        "target = every 11th surviving doc, histograms fit on the " +
        "SURVIVORS — selection composes after cleaning, as the papers " +
        "do) -> top-100 by (dsir_mil desc, id). Every stage is " +
        "integer/hash-exact, so the whole composition hash-matches " +
        "DuckDB — the integration check that the stages agree on " +
        "SHARED intermediate data, not just in isolation. Scale " +
        "shape: map-only gates, ONE corpus-scale shuffle (the " +
        "fingerprint window), two bounded histograms, map-only " +
        "scoring, TakeOrderedAndProject.",
      Some {
        val (hitExprs, maxExpr, nWin, firstWin) = sqlLangPieces
        s"""WITH q AS (SELECT doc_id, text FROM documents
           |  WHERE $sqlQualityMil >= 500),
           |fp AS (SELECT doc_id, text, row_number() OVER (
           |    PARTITION BY md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'))
           |    ORDER BY doc_id) AS rn FROM q),
           |d AS (SELECT doc_id, text FROM fp WHERE rn = 1),
           |h AS (SELECT doc_id, $hitExprs FROM d),
           |m AS (SELECT *, $maxExpr AS mx FROM h),
           |lg AS (SELECT doc_id, CASE WHEN mx = 0 OR ($nWin) > 1
           |    THEN 'und' ELSE ($firstWin) END AS lang FROM m),
           |en AS (SELECT d.doc_id, d.text FROM d
           |  JOIN lg ON d.doc_id = lg.doc_id WHERE lg.lang = 'en'),
           |g AS (SELECT doc_id, doc_id % 11 = 0 AS tgt,
           |    regexp_extract_all(lower(text), '[a-z]+') AS ws FROM en),
           |gr AS (SELECT doc_id, tgt, ws || CASE WHEN len(ws) < 2
           |      THEN CAST([] AS VARCHAR[])
           |      ELSE [ws[i] || ' ' || ws[i+1] for i in range(1, len(ws))]
           |    END AS grams
           |  FROM g),
           |occ AS (SELECT doc_id, tgt,
           |    CAST(concat('0x', substr(md5(unnest(grams)), 1, 15))
           |      AS BIGINT) % 512 AS b
           |  FROM gr),
           |ht AS (SELECT b, COUNT(*) AS ct FROM occ WHERE tgt GROUP BY b),
           |hr AS (SELECT b, COUNT(*) AS cr FROM occ WHERE NOT tgt GROUP BY b),
           |aff AS (SELECT doc_id,
           |    (1000 * (COALESCE(ct, 0) + 1))
           |      // (COALESCE(ct, 0) + COALESCE(cr, 0) + 2) AS a
           |  FROM occ LEFT JOIN ht USING (b) LEFT JOIN hr USING (b)),
           |sc AS (SELECT doc_id, COUNT(*) AS n, SUM(a) AS sa
           |  FROM aff GROUP BY doc_id)
           |SELECT doc_id, CAST(sc.n AS INTEGER) AS n_grams,
           |  CAST(sc.sa // sc.n AS BIGINT) AS dsir_mil
           |FROM sc
           |ORDER BY dsir_mil DESC, doc_id LIMIT 100""".stripMargin
      },
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val quality = docs
          .filter(TextOps.qualityScoreMil(col("text")) >= 500)
        val w = Window
          .partitionBy(TextOps.fingerprint(col("text")))
          .orderBy("doc_id")
        val kept = quality
          .withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1)
        val en = kept.filter(TextOps.langId(col("text")) === "en")
          .select("doc_id", "text")
        SelectOps.dsirAffinityMil(en,
            en.filter(col("doc_id") % 11 === 0),
            "doc_id", "text", buckets = 512)
          .filter(col("dsir_mil").isNotNull)
          .orderBy(col("dsir_mil").desc, col("doc_id"))
          .limit(100)
      }),

    QueryDef("q109_incremental_neardup",
      "INCREMENTAL near-dup admission — dedup a new batch against a " +
        "persisted archive WITHOUT re-shingling the archive (the only " +
        "dedup shape that works when the archive is 100 TB and the " +
        "batch is a day's crawl): the archive's MinHash band postings " +
        "+ shingle sets are built once into the store (one atomic " +
        "group write), then the probe broadcasts the batch's band " +
        "keys against the posting scan (map-only — the archive side " +
        "never shuffles), broadcasts the batch-bounded candidate set " +
        "against the shingle-set scan (map-only again), and " +
        "exact-verifies Jaccard >= 0.5 on candidates only. Oracle: " +
        "exhaustive archive x batch Jaccard (q29's recall argument — " +
        "planted dups sit at j >= 0.9, miss probability ~1e-15).",
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
             |  FROM sh a JOIN sh b
             |    ON a.doc_id % 3 <> 0 AND b.doc_id % 3 = 0)
             |SELECT a_id, b_id, round(j, 4) AS jac FROM p
             |WHERE j >= 0.5 ORDER BY a_id, b_id""".stripMargin),
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val sink = tempStore.freshSink(s, "neardup", dir)
        TextOps.minhashStoreBuild(docs.filter(col("doc_id") % 3 =!= 0),
          "doc_id", "text", sink)
        TextOps.minhashStoreProbe(docs.filter(col("doc_id") % 3 === 0),
            "doc_id", "text", sink, threshold = 0.5)
          .orderBy("a_id", "b_id")
      }),

    QueryDef("q110_incremental_segdedup",
      "INCREMENTAL C4-style segment screen — q66's boilerplate removal " +
        "for a daily batch against a persisted archive inventory, " +
        "without re-tokenizing the archive: the store holds 16 bytes + " +
        "a count per distinct 25-word segment; the probe broadcasts " +
        "the batch's segment hashes against the inventory scan " +
        "(map-only — the store never shuffles, and unlike q66 there " +
        "is NO corpus-wide window: the archive's ordering work was " +
        "paid once at build), drops every batch segment the archive " +
        "has seen, and rebuilds the documents. Exact md5/integer " +
        "semantics end to end -> full DuckDB oracle.",
      Some("""WITH toks AS (SELECT doc_id,
             |    regexp_extract_all(lower(text), '[a-z]+') w FROM documents),
             |segl AS (SELECT doc_id,
             |    [{'i': i, 's': array_to_string(w[(i*25+1):(i*25+25)], ' ')}
             |     for i in range(0, CAST(ceil(len(w)/25.0) AS INTEGER))] AS ss
             |  FROM toks),
             |seg AS (SELECT doc_id, u.i AS seg_idx, u.s AS s
             |  FROM (SELECT doc_id, unnest(ss) AS u FROM segl)),
             |arch AS (SELECT DISTINCT md5(s) AS h FROM seg
             |  WHERE doc_id % 3 <> 0),
             |bat AS (SELECT doc_id, seg_idx, s FROM seg WHERE doc_id % 3 = 0),
             |keep AS (SELECT * FROM bat
             |  WHERE md5(s) NOT IN (SELECT h FROM arch)),
             |k AS (SELECT doc_id, CAST(count(*) AS INTEGER) AS n_kept,
             |    string_agg(s, ' ' ORDER BY seg_idx) AS text_kept
             |  FROM keep GROUP BY doc_id),
             |n AS (SELECT doc_id,
             |    CAST(COALESCE(ceil(len(w)/25.0), 0) AS INTEGER) AS n_segs
             |  FROM toks WHERE doc_id % 3 = 0)
             |SELECT n.doc_id, n.n_segs,
             |  COALESCE(k.n_kept, 0) AS n_kept,
             |  COALESCE(k.text_kept, '') AS text_kept
             |FROM n LEFT JOIN k USING (doc_id) ORDER BY doc_id""".stripMargin),
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val sink = tempStore.freshSink(s, "segdedup", dir)
        TextOps.segmentStoreBuild(docs.filter(col("doc_id") % 3 =!= 0),
          "doc_id", "text", sink)
        TextOps.segmentStoreProbe(docs.filter(col("doc_id") % 3 === 0),
            "doc_id", "text", sink)
          .orderBy("doc_id")
      }),

    QueryDef("q111_incremental_admission",
      "The COMPOSED incremental admission screen — the daily-crawl " +
        "operating mode at 100 TB, under ONE exact oracle: every " +
        "per-document gate (quality heuristic, exact dedup vs the " +
        "archive's fingerprint store, 25-word segment screen vs its " +
        "segment inventory, MinHash near-dup vs its band+shingle " +
        "store, language id) computed independently as audit columns, " +
        "`admitted` their conjunction. The archive is touched ONLY " +
        "through its three compact stores (built once here; amortized " +
        "across batches in production) — no archive text is " +
        "re-tokenized at screen time, every store-side join is a " +
        "map-only broadcast. Integer/hash-exact gates -> the whole " +
        "composition hash-matches DuckDB, including the near-dup " +
        "column (q29's LSH recall argument).",
      Some {
        val (hitExprs, maxExpr, nWin, firstWin) = sqlLangPieces
        s"""WITH b AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0),
           |a AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0),
           |h AS (SELECT doc_id, $sqlQualityMil AS quality_mil,
           |  $hitExprs FROM b),
           |m AS (SELECT *, $maxExpr AS mx FROM h),
           |lg AS (SELECT doc_id, quality_mil, CASE WHEN mx = 0 OR ($nWin) > 1
           |    THEN 'und' ELSE ($firstWin) END AS lang FROM m),
           |afp AS (SELECT DISTINCT
           |    md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp
           |  FROM a),
           |ex AS (SELECT doc_id, CASE WHEN
           |    md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'))
           |      IN (SELECT fp FROM afp) THEN 1 ELSE 0 END AS dup_exact
           |  FROM b),
           |toksall AS (SELECT doc_id,
           |    regexp_extract_all(lower(text), '[a-z]+') w FROM documents),
           |segl AS (SELECT doc_id,
           |    [{'i': i, 's': array_to_string(w[(i*25+1):(i*25+25)], ' ')}
           |     for i in range(0, CAST(ceil(len(w)/25.0) AS INTEGER))] AS ss
           |  FROM toksall),
           |seg AS (SELECT doc_id, u.i AS seg_idx, u.s AS s
           |  FROM (SELECT doc_id, unnest(ss) AS u FROM segl)),
           |archs AS (SELECT DISTINCT md5(s) AS hsh FROM seg
           |  WHERE doc_id % 3 <> 0),
           |batk AS (SELECT doc_id, count(*) FILTER (
           |      WHERE md5(s) NOT IN (SELECT hsh FROM archs)) AS kept
           |  FROM seg WHERE doc_id % 3 = 0 GROUP BY doc_id),
           |segk AS (SELECT t.doc_id,
           |    CAST(COALESCE(ceil(len(w)/25.0), 0) AS INTEGER) AS n_segs,
           |    CAST(COALESCE(batk.kept, 0) AS INTEGER) AS n_kept
           |  FROM toksall t LEFT JOIN batk USING (doc_id)
           |  WHERE t.doc_id % 3 = 0),
           |sh AS (SELECT doc_id, CASE WHEN len(w) < 3
           |    THEN [array_to_string(w, ' ')]
           |    ELSE list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
           |                        for i in range(1, len(w) - 1)]) END AS sss
           |  FROM toksall),
           |ndh AS (SELECT DISTINCT bsh.doc_id FROM sh ash JOIN sh bsh
           |  ON ash.doc_id % 3 <> 0 AND bsh.doc_id % 3 = 0
           |  AND CAST(len(list_intersect(ash.sss, bsh.sss)) AS DOUBLE)
           |      / len(list_distinct(list_concat(ash.sss, bsh.sss))) >= 0.5)
           |SELECT lg.doc_id, lg.quality_mil, lg.lang, ex.dup_exact,
           |  segk.n_segs, segk.n_kept,
           |  CASE WHEN ndh.doc_id IS NOT NULL THEN 1 ELSE 0 END AS neardup_hit,
           |  CASE WHEN lg.quality_mil >= 500 AND lg.lang = 'en'
           |       AND ex.dup_exact = 0 AND ndh.doc_id IS NULL
           |       THEN 1 ELSE 0 END AS admitted
           |FROM lg JOIN ex USING (doc_id) JOIN segk USING (doc_id)
           |  LEFT JOIN ndh USING (doc_id)
           |ORDER BY doc_id""".stripMargin
      },
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val sink = tempStore.freshSink(s, "admit111", dir)
        val archive = docs.filter(col("doc_id") % 3 =!= 0)
        // independent store tables — overlapped builds (guide §2.6)
        graft.ops.Par.run(Seq(
          () => TextOps.fingerprintStoreBuild(archive, "doc_id", "text", sink),
          () => TextOps.segmentStoreBuild(archive, "doc_id", "text", sink),
          () => TextOps.minhashStoreBuild(archive, "doc_id", "text", sink)))
        TextOps.admissionScreen(docs.filter(col("doc_id") % 3 === 0),
            "doc_id", "text", sink)
          .orderBy("doc_id")
      }),

    QueryDef("q112_store_retention",
      "Inventory RETENTION as a lifecycle query (the q100/q105 pattern " +
        "applied to the segment store): build the archive's segment " +
        "inventory, COMPACT it to cnt >= 2 — at 100 TB the Zipfian " +
        "singleton tail is most of the rows and none of the screening " +
        "signal, and compaction preserves every screen at " +
        "minArchiveCount >= 2 exactly — then screen the batch at " +
        "minArchiveCount = 2 off the compacted store. The compaction " +
        "sizes ride every row as audit columns (inv_kept/inv_dropped) " +
        "so the harness grades the retention arithmetic, not just the " +
        "screen. Exact md5/integer semantics -> full DuckDB oracle.",
      Some("""WITH toks AS (SELECT doc_id,
             |    regexp_extract_all(lower(text), '[a-z]+') w FROM documents),
             |segl AS (SELECT doc_id,
             |    [{'i': i, 's': array_to_string(w[(i*25+1):(i*25+25)], ' ')}
             |     for i in range(0, CAST(ceil(len(w)/25.0) AS INTEGER))] AS ss
             |  FROM toks),
             |seg AS (SELECT doc_id, u.i AS seg_idx, u.s AS s
             |  FROM (SELECT doc_id, unnest(ss) AS u FROM segl)),
             |ac AS (SELECT md5(s) AS hsh, count(*) AS c FROM seg
             |  WHERE doc_id % 3 <> 0 GROUP BY md5(s)),
             |inv AS (SELECT CAST(count(*) FILTER (WHERE c >= 2) AS BIGINT)
             |      AS inv_kept,
             |    CAST(count(*) FILTER (WHERE c < 2) AS BIGINT) AS inv_dropped
             |  FROM ac),
             |archs AS (SELECT hsh FROM ac WHERE c >= 2),
             |batk AS (SELECT doc_id, count(*) FILTER (
             |      WHERE md5(s) NOT IN (SELECT hsh FROM archs)) AS kept
             |  FROM seg WHERE doc_id % 3 = 0 GROUP BY doc_id),
             |segk AS (SELECT t.doc_id,
             |    CAST(COALESCE(ceil(len(w)/25.0), 0) AS INTEGER) AS n_segs,
             |    CAST(COALESCE(batk.kept, 0) AS INTEGER) AS n_kept
             |  FROM toks t LEFT JOIN batk USING (doc_id)
             |  WHERE t.doc_id % 3 = 0)
             |SELECT doc_id, n_segs, n_kept, inv_kept, inv_dropped
             |FROM segk, inv ORDER BY doc_id""".stripMargin),
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val sink = tempStore.freshSink(s, "segretain", dir)
        TextOps.segmentStoreBuild(docs.filter(col("doc_id") % 3 =!= 0),
          "doc_id", "text", sink)
        val (kept, dropped) = TextOps.segmentStoreCompact(sink, minCount = 2)
        TextOps.segmentStoreProbe(docs.filter(col("doc_id") % 3 === 0),
            "doc_id", "text", sink, minArchiveCount = 2)
          .drop("text_kept")
          .withColumn("inv_kept", lit(kept))
          .withColumn("inv_dropped", lit(dropped))
          .orderBy("doc_id")
      }),

    QueryDef("q113_incremental_embdup",
      "INCREMENTAL embedding near-dup — the q109 operating mode for the " +
        "EMBEDDING modality: the archive's LSH bucket postings + exact " +
        "vectors persist as one atomic group write; the probe " +
        "broadcasts the batch's signatures against the posting scan " +
        "and the batch-bounded candidate set against the vector scan " +
        "(both map-only — the archive never re-hashes, never " +
        "shuffles), then exact-cosine-verifies candidates at >= 0.45. " +
        "Oracle: exhaustive archive x batch cosine (q41's recall " +
        "argument — candidate recall 1.0 at these parameters).",
      Some(s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
             |p AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id,
             |    ${sqlCosine("a.embedding", "b.embedding")} AS c
             |  FROM e a JOIN e b
             |    ON a.vec_id % 3 <> 0 AND b.vec_id % 3 = 0)
             |SELECT a_id, b_id, round(c, 6) AS cosine FROM p
             |WHERE round(c, 6) >= 0.45 ORDER BY a_id, b_id""".stripMargin),
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val sink = tempStore.freshSink(s, "embdup", dir)
        SimOps.embLshStoreBuild(e.filter(col("vec_id") % 3 =!= 0),
          "vec_id", "embedding", sink)
        SimOps.embLshStoreProbe(e.filter(col("vec_id") % 3 === 0),
            "vec_id", "embedding", sink, threshold = 0.45)
          .orderBy("a_id", "b_id")
      }),

    QueryDef("q114_multimodal_admission",
      "The MULTIMODAL admission capstone: q111's text gates (quality, " +
        "exact dedup, segment screen, MinHash near-dup, langid) JOINED " +
        "with q113's embedding near-dup gate over the 1:1 " +
        "documents-embeddings pairing — a real pipeline dedups on BOTH " +
        "surface text and semantic similarity, because paraphrases " +
        "evade string dedup and templated text evades embedding " +
        "dedup. Every gate an independent audit column; `admitted` is " +
        "the full conjunction. The archive exists only as its FOUR " +
        "compact stores (fingerprints, segment inventory, MinHash " +
        "bands+shingles, embedding LSH postings+vectors); all probe " +
        "joins broadcast. Exact end to end -> one composed DuckDB " +
        "oracle across both tables.",
      Some {
        val (hitExprs, maxExpr, nWin, firstWin) = sqlLangPieces
        s"""WITH b AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0),
           |a AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0),
           |h AS (SELECT doc_id, $sqlQualityMil AS quality_mil,
           |  $hitExprs FROM b),
           |m AS (SELECT *, $maxExpr AS mx FROM h),
           |lg AS (SELECT doc_id, quality_mil, CASE WHEN mx = 0 OR ($nWin) > 1
           |    THEN 'und' ELSE ($firstWin) END AS lang FROM m),
           |afp AS (SELECT DISTINCT
           |    md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp
           |  FROM a),
           |ex AS (SELECT doc_id, CASE WHEN
           |    md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'))
           |      IN (SELECT fp FROM afp) THEN 1 ELSE 0 END AS dup_exact
           |  FROM b),
           |toksall AS (SELECT doc_id,
           |    regexp_extract_all(lower(text), '[a-z]+') w FROM documents),
           |segl AS (SELECT doc_id,
           |    [{'i': i, 's': array_to_string(w[(i*25+1):(i*25+25)], ' ')}
           |     for i in range(0, CAST(ceil(len(w)/25.0) AS INTEGER))] AS ss
           |  FROM toksall),
           |seg AS (SELECT doc_id, u.i AS seg_idx, u.s AS s
           |  FROM (SELECT doc_id, unnest(ss) AS u FROM segl)),
           |archs AS (SELECT DISTINCT md5(s) AS hsh FROM seg
           |  WHERE doc_id % 3 <> 0),
           |batk AS (SELECT doc_id, count(*) FILTER (
           |      WHERE md5(s) NOT IN (SELECT hsh FROM archs)) AS kept
           |  FROM seg WHERE doc_id % 3 = 0 GROUP BY doc_id),
           |segk AS (SELECT t.doc_id,
           |    CAST(COALESCE(ceil(len(w)/25.0), 0) AS INTEGER) AS n_segs,
           |    CAST(COALESCE(batk.kept, 0) AS INTEGER) AS n_kept
           |  FROM toksall t LEFT JOIN batk USING (doc_id)
           |  WHERE t.doc_id % 3 = 0),
           |sh AS (SELECT doc_id, CASE WHEN len(w) < 3
           |    THEN [array_to_string(w, ' ')]
           |    ELSE list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
           |                        for i in range(1, len(w) - 1)]) END AS sss
           |  FROM toksall),
           |ndh AS (SELECT DISTINCT bsh.doc_id FROM sh ash JOIN sh bsh
           |  ON ash.doc_id % 3 <> 0 AND bsh.doc_id % 3 = 0
           |  AND CAST(len(list_intersect(ash.sss, bsh.sss)) AS DOUBLE)
           |      / len(list_distinct(list_concat(ash.sss, bsh.sss))) >= 0.5),
           |emb AS (SELECT vec_id, embedding FROM embeddings),
           |edh AS (SELECT DISTINCT eb.vec_id AS doc_id
           |  FROM emb ea JOIN emb eb
           |  ON ea.vec_id % 3 <> 0 AND eb.vec_id % 3 = 0
           |  AND round(${sqlCosine("ea.embedding", "eb.embedding")}, 6)
           |      >= 0.45)
           |SELECT lg.doc_id, lg.quality_mil, lg.lang, ex.dup_exact,
           |  segk.n_segs, segk.n_kept,
           |  CASE WHEN ndh.doc_id IS NOT NULL THEN 1 ELSE 0 END AS neardup_hit,
           |  CASE WHEN edh.doc_id IS NOT NULL THEN 1 ELSE 0 END AS embdup_hit,
           |  CASE WHEN lg.quality_mil >= 500 AND lg.lang = 'en'
           |       AND ex.dup_exact = 0 AND ndh.doc_id IS NULL
           |       AND edh.doc_id IS NULL
           |       THEN 1 ELSE 0 END AS admitted
           |FROM lg JOIN ex USING (doc_id) JOIN segk USING (doc_id)
           |  LEFT JOIN ndh USING (doc_id) LEFT JOIN edh USING (doc_id)
           |ORDER BY doc_id""".stripMargin
      },
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val e = t(s, dir, "embeddings")
        val sink = tempStore.freshSink(s, "admit114", dir)
        val archive = docs.filter(col("doc_id") % 3 =!= 0)
        // independent store tables — overlapped builds (guide §2.6)
        graft.ops.Par.run(Seq(
          () => TextOps.fingerprintStoreBuild(archive, "doc_id", "text", sink),
          () => TextOps.segmentStoreBuild(archive, "doc_id", "text", sink),
          () => TextOps.minhashStoreBuild(archive, "doc_id", "text", sink),
          () => SimOps.embLshStoreBuild(e.filter(col("vec_id") % 3 =!= 0),
            "vec_id", "embedding", sink)))
        val txt = TextOps.admissionScreen(
          docs.filter(col("doc_id") % 3 === 0), "doc_id", "text", sink)
        val embHits = SimOps.embLshStoreProbe(
            e.filter(col("vec_id") % 3 === 0), "vec_id", "embedding",
            sink, threshold = 0.45)
          .select(col("b_id").as("doc_id")).distinct()
          .withColumn("__ed", lit(1))
        txt.join(broadcast(embHits), Seq("doc_id"), "left")
          .select(col("doc_id"), col("quality_mil"), col("lang"),
            col("dup_exact"), col("n_segs"), col("n_kept"),
            col("neardup_hit"),
            coalesce(col("__ed"), lit(0)).as("embdup_hit"))
          .withColumn("admitted",
            (col("quality_mil") >= 500 && col("lang") === "en" &&
              col("dup_exact") === 0 && col("neardup_hit") === 0 &&
              col("embdup_hit") === 0).cast("int"))
          .orderBy("doc_id")
      }),

    QueryDef("q115_incremental_substrdedup",
      "INCREMENTAL arbitrary-offset substring dedup — q68's ExactSubstr " +
        "semantics against a PERSISTED archive: the archive's 20-token " +
        "window inventory (16-byte digest + count per DISTINCT window — " +
        "the per-position granularity the published suffix-array " +
        "implementation also pays, paid ONCE) is built into the store; " +
        "the probe broadcasts the batch's window digests over the " +
        "inventory scan (map-only — the archive is never re-tokenized " +
        "and never shuffles), the matched batch-bounded set broadcasts " +
        "back, and the span cut is the native map-only CutSpans walk. " +
        "NO window operator anywhere in the probe — the archive's " +
        "ordering work was paid at build. Output = q68's contract on " +
        "the batch. Oracle: exact window-membership replication.",
      Some("""WITH toks AS (SELECT doc_id,
             |    regexp_extract_all(lower(text), '[a-z]+') w FROM documents),
             |aw AS (SELECT DISTINCT u AS h FROM (
             |  SELECT unnest([md5(array_to_string(w[(i+1):(i+20)], ' '))
             |                 for i in range(0, len(w) - 19)]) AS u
             |  FROM toks WHERE doc_id % 3 <> 0)),
             |ex AS (SELECT doc_id, u.i AS pos, u.t AS tok, u.h AS h FROM (
             |  SELECT doc_id, unnest([{'i': i, 't': w[i+1],
             |      'h': CASE WHEN i <= len(w) - 20
             |        THEN md5(array_to_string(w[(i+1):(i+20)], ' ')) END}
             |    for i in range(0, len(w))]) u
             |  FROM toks WHERE doc_id % 3 = 0)),
             |mk AS (SELECT doc_id, pos, tok,
             |    CASE WHEN h IS NOT NULL AND h IN (SELECT h FROM aw)
             |      THEN 1 ELSE 0 END AS ds
             |  FROM ex),
             |cov AS (SELECT doc_id, pos, tok,
             |    sum(ds) OVER (PARTITION BY doc_id ORDER BY pos
             |      ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) > 0 AS covered
             |  FROM mk),
             |k AS (SELECT doc_id, CAST(count(*) AS INTEGER) AS n_tokens,
             |    CAST(count(*) FILTER (WHERE covered) AS INTEGER) AS n_removed,
             |    string_agg(tok, ' ' ORDER BY pos)
             |      FILTER (WHERE NOT covered) AS text_kept
             |  FROM cov GROUP BY doc_id)
             |SELECT d.doc_id, COALESCE(k.n_tokens, 0) AS n_tokens,
             |  COALESCE(k.n_removed, 0) AS n_removed,
             |  COALESCE(k.text_kept, '') AS text_kept
             |FROM (SELECT doc_id FROM documents WHERE doc_id % 3 = 0) d
             |LEFT JOIN k USING (doc_id)
             |ORDER BY doc_id""".stripMargin),
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val sink = tempStore.freshSink(s, "substrstore", dir)
        TextOps.substrStoreBuild(docs.filter(col("doc_id") % 3 =!= 0),
          "doc_id", "text", sink)
        TextOps.substrStoreProbe(docs.filter(col("doc_id") % 3 === 0),
            "doc_id", "text", sink)
          .orderBy("doc_id")
      }),

    QueryDef("q116_incremental_selection",
      "INCREMENTAL targeted selection — a persisted DSIR POLICY store: " +
        "the per-bucket affinity table (q102's integer fixed-point " +
        "form, Xie et al. 2023) is fit ONCE on the archive (target " +
        "sample = archive docs with id % 11 = 0, raw pool = archive " +
        "minus target by id) and persisted as 512 (bucket, aff_mil) " +
        "rows; a new batch is then scored + admission-gated WITHOUT " +
        "touching the archive at all — the store read is bounded (= " +
        "buckets rows, verified dense), and scoring is ONE map-only " +
        "codegen scan with the table riding the plan as a single " +
        "array literal. Completes the incremental-store family: dedup " +
        "stores screen what the archive has SEEN; the policy store " +
        "screens what the target DISTRIBUTION wants. Integer " +
        "arithmetic end to end -> bit-exact DuckDB oracle.",
      Some("""WITH g AS (SELECT doc_id,
             |    CASE WHEN doc_id % 3 <> 0 AND doc_id % 11 = 0 THEN 'tgt'
             |         WHEN doc_id % 3 <> 0 THEN 'raw' ELSE 'bat' END AS part,
             |    regexp_extract_all(lower(text), '[a-z]+') AS ws
             |  FROM documents),
             |gr AS (SELECT doc_id, part, ws || CASE WHEN len(ws) < 2
             |      THEN CAST([] AS VARCHAR[])
             |      ELSE [ws[i] || ' ' || ws[i+1] for i in range(1, len(ws))]
             |    END AS grams
             |  FROM g),
             |occ AS (SELECT doc_id, part,
             |    CAST(concat('0x', substr(md5(unnest(grams)), 1, 15))
             |      AS BIGINT) % 512 AS b
             |  FROM gr),
             |ht AS (SELECT b, COUNT(*) AS ct FROM occ WHERE part = 'tgt'
             |  GROUP BY b),
             |hr AS (SELECT b, COUNT(*) AS cr FROM occ WHERE part = 'raw'
             |  GROUP BY b),
             |aff AS (SELECT doc_id,
             |    (1000 * (COALESCE(ct, 0) + 1))
             |      // (COALESCE(ct, 0) + COALESCE(cr, 0) + 2) AS a
             |  FROM occ LEFT JOIN ht USING (b) LEFT JOIN hr USING (b)
             |  WHERE part = 'bat'),
             |sc AS (SELECT doc_id, COUNT(*) AS n, SUM(a) AS sa
             |  FROM aff GROUP BY doc_id)
             |SELECT d.doc_id, CAST(COALESCE(sc.n, 0) AS INTEGER) AS n_grams,
             |  CAST(sc.sa // sc.n AS BIGINT) AS dsir_mil,
             |  CAST(CASE WHEN sc.sa // sc.n >= 101 THEN 1 ELSE 0 END
             |    AS INTEGER) AS admitted
             |FROM (SELECT doc_id FROM documents WHERE doc_id % 3 = 0) d
             |LEFT JOIN sc USING (doc_id)
             |ORDER BY d.doc_id""".stripMargin),
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val sink = tempStore.freshSink(s, "selstore", dir)
        val archive = docs.filter(col("doc_id") % 3 =!= 0)
        SelectOps.selectionStoreBuild(archive,
          archive.filter(col("doc_id") % 11 === 0),
          "doc_id", "text", sink, buckets = 512)
        SelectOps.selectionStoreScore(
            docs.filter(col("doc_id") % 3 === 0), "doc_id", "text", sink,
            // the synthetic corpus's in-pool median (the target sample
            // is sparse, so absolute scores sit low): the gate must
            // actually SPLIT the batch for the audit column to mean
            // anything — 520 would admit nobody here
            minMil = 101L)
          .orderBy("doc_id")
      }),

    QueryDef("q117_curation_admission",
      "The GRAND admission capstone: every store-backed gate the " +
        "engine ships, composed over one batch under ONE exact " +
        "oracle — q114's gates (quality, langid, exact-dup " +
        "fingerprints, segment screen, MinHash near-dup, embedding " +
        "near-dup) PLUS the round's two new stores: the substring " +
        "WINDOW inventory (gate: >= 80% of tokens survive " +
        "arbitrary-offset span removal — heavy boilerplate overlap " +
        "rejects even when no whole segment matches) and the DSIR " +
        "selection POLICY (gate: target-affinity at or above the " +
        "pool median — dedup says UNSEEN, selection says WANTED; a " +
        "real curation pipeline requires both). The archive exists " +
        "only as its SIX compact stores; every probe join broadcasts; " +
        "the only window is the batch-side span-coverage frame. " +
        "Every gate rides as an independent audit column; `admitted` " +
        "is the full conjunction.",
      Some {
        val (hitExprs, maxExpr, nWin, firstWin) = sqlLangPieces
        s"""WITH b AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0),
           |a AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0),
           |h AS (SELECT doc_id, $sqlQualityMil AS quality_mil,
           |  $hitExprs FROM b),
           |m AS (SELECT *, $maxExpr AS mx FROM h),
           |lg AS (SELECT doc_id, quality_mil, CASE WHEN mx = 0 OR ($nWin) > 1
           |    THEN 'und' ELSE ($firstWin) END AS lang FROM m),
           |afp AS (SELECT DISTINCT
           |    md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp
           |  FROM a),
           |ex AS (SELECT doc_id, CASE WHEN
           |    md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'))
           |      IN (SELECT fp FROM afp) THEN 1 ELSE 0 END AS dup_exact
           |  FROM b),
           |toksall AS (SELECT doc_id,
           |    regexp_extract_all(lower(text), '[a-z]+') w FROM documents),
           |segl AS (SELECT doc_id,
           |    [{'i': i, 's': array_to_string(w[(i*25+1):(i*25+25)], ' ')}
           |     for i in range(0, CAST(ceil(len(w)/25.0) AS INTEGER))] AS ss
           |  FROM toksall),
           |seg AS (SELECT doc_id, u.i AS seg_idx, u.s AS s
           |  FROM (SELECT doc_id, unnest(ss) AS u FROM segl)),
           |archs AS (SELECT DISTINCT md5(s) AS hsh FROM seg
           |  WHERE doc_id % 3 <> 0),
           |batk AS (SELECT doc_id, count(*) FILTER (
           |      WHERE md5(s) NOT IN (SELECT hsh FROM archs)) AS kept
           |  FROM seg WHERE doc_id % 3 = 0 GROUP BY doc_id),
           |segk AS (SELECT t.doc_id,
           |    CAST(COALESCE(ceil(len(w)/25.0), 0) AS INTEGER) AS n_segs,
           |    CAST(COALESCE(batk.kept, 0) AS INTEGER) AS n_kept
           |  FROM toksall t LEFT JOIN batk USING (doc_id)
           |  WHERE t.doc_id % 3 = 0),
           |sh AS (SELECT doc_id, CASE WHEN len(w) < 3
           |    THEN [array_to_string(w, ' ')]
           |    ELSE list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
           |                        for i in range(1, len(w) - 1)]) END AS sss
           |  FROM toksall),
           |ndh AS (SELECT DISTINCT bsh.doc_id FROM sh ash JOIN sh bsh
           |  ON ash.doc_id % 3 <> 0 AND bsh.doc_id % 3 = 0
           |  AND CAST(len(list_intersect(ash.sss, bsh.sss)) AS DOUBLE)
           |      / len(list_distinct(list_concat(ash.sss, bsh.sss))) >= 0.5),
           |emb AS (SELECT vec_id, embedding FROM embeddings),
           |edh AS (SELECT DISTINCT eb.vec_id AS doc_id
           |  FROM emb ea JOIN emb eb
           |  ON ea.vec_id % 3 <> 0 AND eb.vec_id % 3 = 0
           |  AND round(${sqlCosine("ea.embedding", "eb.embedding")}, 6)
           |      >= 0.45),
           |swa AS (SELECT DISTINCT u AS hh FROM (
           |  SELECT unnest([md5(array_to_string(w[(i+1):(i+20)], ' '))
           |                 for i in range(0, len(w) - 19)]) AS u
           |  FROM toksall WHERE doc_id % 3 <> 0)),
           |sex AS (SELECT doc_id, u.i AS pos, u.h AS hh FROM (
           |  SELECT doc_id, unnest([{'i': i,
           |      'h': CASE WHEN i <= len(w) - 20
           |        THEN md5(array_to_string(w[(i+1):(i+20)], ' ')) END}
           |    for i in range(0, len(w))]) u
           |  FROM toksall WHERE doc_id % 3 = 0)),
           |smk AS (SELECT doc_id, pos, CASE WHEN hh IS NOT NULL
           |      AND hh IN (SELECT hh FROM swa) THEN 1 ELSE 0 END AS ds
           |  FROM sex),
           |scov AS (SELECT doc_id,
           |    sum(ds) OVER (PARTITION BY doc_id ORDER BY pos
           |      ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) > 0 AS covered
           |  FROM smk),
           |sk AS (SELECT doc_id, CAST(count(*) AS INTEGER) AS n_tokens,
           |    CAST(count(*) FILTER (WHERE covered) AS INTEGER)
           |      AS n_span_removed
           |  FROM scov GROUP BY doc_id),
           |dgr AS (SELECT doc_id,
           |    CASE WHEN doc_id % 3 <> 0 AND doc_id % 11 = 0 THEN 'tgt'
           |         WHEN doc_id % 3 <> 0 THEN 'raw' ELSE 'bat' END AS part,
           |    w || CASE WHEN len(w) < 2 THEN CAST([] AS VARCHAR[])
           |      ELSE [w[i] || ' ' || w[i+1] for i in range(1, len(w))]
           |    END AS grams
           |  FROM toksall),
           |docc AS (SELECT doc_id, part,
           |    CAST(concat('0x', substr(md5(unnest(grams)), 1, 15))
           |      AS BIGINT) % 512 AS bk
           |  FROM dgr),
           |dht AS (SELECT bk, COUNT(*) AS ct FROM docc WHERE part = 'tgt'
           |  GROUP BY bk),
           |dhr AS (SELECT bk, COUNT(*) AS cr FROM docc WHERE part = 'raw'
           |  GROUP BY bk),
           |daff AS (SELECT doc_id,
           |    (1000 * (COALESCE(ct, 0) + 1))
           |      // (COALESCE(ct, 0) + COALESCE(cr, 0) + 2) AS aa
           |  FROM docc LEFT JOIN dht USING (bk) LEFT JOIN dhr USING (bk)
           |  WHERE part = 'bat'),
           |dsc AS (SELECT doc_id, COUNT(*) AS n, SUM(aa) AS sa
           |  FROM daff GROUP BY doc_id)
           |SELECT lg.doc_id, lg.quality_mil, lg.lang, ex.dup_exact,
           |  segk.n_segs, segk.n_kept,
           |  CASE WHEN ndh.doc_id IS NOT NULL THEN 1 ELSE 0 END AS neardup_hit,
           |  CASE WHEN edh.doc_id IS NOT NULL THEN 1 ELSE 0 END AS embdup_hit,
           |  COALESCE(sk.n_tokens, 0) AS n_tokens,
           |  COALESCE(sk.n_span_removed, 0) AS n_span_removed,
           |  CAST(dsc.sa // dsc.n AS BIGINT) AS dsir_mil,
           |  CAST(CASE WHEN dsc.sa // dsc.n >= 101 THEN 1 ELSE 0 END
           |    AS INTEGER) AS sel_admit,
           |  CASE WHEN lg.quality_mil >= 500 AND lg.lang = 'en'
           |       AND ex.dup_exact = 0 AND ndh.doc_id IS NULL
           |       AND edh.doc_id IS NULL
           |       AND COALESCE(sk.n_span_removed, 0) * 5
           |           <= COALESCE(sk.n_tokens, 0)
           |       AND COALESCE(dsc.sa // dsc.n >= 101, FALSE)
           |       THEN 1 ELSE 0 END AS admitted
           |FROM lg JOIN ex USING (doc_id) JOIN segk USING (doc_id)
           |  LEFT JOIN ndh USING (doc_id) LEFT JOIN edh USING (doc_id)
           |  LEFT JOIN sk USING (doc_id) LEFT JOIN dsc USING (doc_id)
           |ORDER BY doc_id""".stripMargin
      },
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val e = t(s, dir, "embeddings")
        val sink = tempStore.freshSink(s, "admit117", dir)
        val archive = docs.filter(col("doc_id") % 3 =!= 0)
        // the six stores are INDEPENDENT tables under one root — build
        // them overlapped (guide §2.6): content identical to the
        // sequential build, the wall pays one store's fixed costs
        graft.ops.Par.run(Seq(
          () => TextOps.fingerprintStoreBuild(archive, "doc_id", "text", sink),
          () => TextOps.segmentStoreBuild(archive, "doc_id", "text", sink),
          () => TextOps.minhashStoreBuild(archive, "doc_id", "text", sink),
          () => TextOps.substrStoreBuild(archive, "doc_id", "text", sink),
          () => SelectOps.selectionStoreBuild(archive,
            archive.filter(col("doc_id") % 11 === 0),
            "doc_id", "text", sink, buckets = 512),
          () => SimOps.embLshStoreBuild(e.filter(col("vec_id") % 3 =!= 0),
            "vec_id", "embedding", sink)))
        val batch = docs.filter(col("doc_id") % 3 === 0)
        val txt = TextOps.admissionScreen(batch, "doc_id", "text", sink)
          .drop("admitted")
        val sub = TextOps.substrStoreProbe(batch, "doc_id", "text", sink)
          .select(col("doc_id"), col("n_tokens"),
            col("n_removed").as("n_span_removed"))
        val sel = SelectOps.selectionStoreScore(batch, "doc_id", "text",
            sink, minMil = 101L)
          .select(col("doc_id"), col("dsir_mil"),
            col("admitted").as("sel_admit"))
        val embHits = SimOps.embLshStoreProbe(
            e.filter(col("vec_id") % 3 === 0), "vec_id", "embedding",
            sink, threshold = 0.45)
          .select(col("b_id").as("doc_id")).distinct()
          .withColumn("__ed", lit(1))
        txt.join(broadcast(embHits), Seq("doc_id"), "left")
          .join(broadcast(sub), Seq("doc_id"), "left")
          .join(broadcast(sel), Seq("doc_id"), "left")
          .select(col("doc_id"), col("quality_mil"), col("lang"),
            col("dup_exact"), col("n_segs"), col("n_kept"),
            col("neardup_hit"),
            coalesce(col("__ed"), lit(0)).as("embdup_hit"),
            col("n_tokens"), col("n_span_removed"), col("dsir_mil"),
            col("sel_admit"))
          .withColumn("admitted",
            (col("quality_mil") >= 500 && col("lang") === "en" &&
              col("dup_exact") === 0 && col("neardup_hit") === 0 &&
              col("embdup_hit") === 0 &&
              col("n_span_removed") * 5 <= col("n_tokens") &&
              col("sel_admit") === 1).cast("int"))
          .orderBy("doc_id")
      }),

    QueryDef("q118_table_profile",
      "ONE-PASS table profile — the trust-but-verify step before a " +
        "100 TB input enters a pipeline: per column, row count, null " +
        "count, exact distinct count, and min/max in canonical string " +
        "form (cast AFTER the native-ordered min/max, so numeric and " +
        "timestamp ordering is never lexicographic). Counts/min/max " +
        "ride ONE global aggregate over one pruned scan; exact " +
        "distincts come from a SECOND pruned scan unpivoted to " +
        "(column, canonical value) with a per-column two-phase " +
        "count-distinct — hash aggregation throughout, NO Expand " +
        "(the naive multi-distinct aggregate plans a k-way Expand + " +
        "SortAggregate on an all-columns key: measured 4.7x slower). " +
        "The approx_count_distinct variant profiles in the single " +
        "pass with no shuffle and is the 100 TB default, spec-pinned " +
        "within HLL bounds.",
      Some {
        val cols = Seq("l_orderkey", "l_partkey", "l_suppkey",
          "l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
          "l_tax", "l_returnflag", "l_linestatus", "l_shipdate")
        cols.map { c =>
          s"""SELECT '$c' AS col_name, COUNT(*) AS n_rows,
             |  COUNT(*) FILTER (WHERE $c IS NULL) AS n_null,
             |  COUNT(DISTINCT $c) AS n_distinct,
             |  CAST(MIN($c) AS VARCHAR) AS min_val,
             |  CAST(MAX($c) AS VARCHAR) AS max_val FROM lineitem""".stripMargin
        }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
      },
      (s, dir) => RelOps.profile(t(s, dir, "lineitem"),
        Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
          "l_quantity", "l_extendedprice", "l_discount", "l_tax",
          "l_returnflag", "l_linestatus", "l_shipdate"),
        exact = true)),

    QueryDef("q119_exactly_once_admission",
      "EXACTLY-ONCE incremental admission under re-delivery — the " +
        "crash-replay case every streaming fold must survive: the " +
        "substring-window fold is keyed (win_hash, batch_id), so " +
        "re-admitting the SAME batch (here: admitted twice, the " +
        "simulated foreachBatch replay) merges byte-identical rows " +
        "instead of double-counting. The query screens a second " +
        "batch at minArchiveCount = 2, the threshold built to EXPOSE " +
        "double-counting: the oracle counts the replayed batch ONCE, " +
        "so an at-least-once additive fold (substrStoreAdmit's " +
        "contract) would over-remove every window unique to the " +
        "replayed batch and hash-mismatch. Store scans stay map-only " +
        "(semi-join against broadcast batch digests); only the " +
        "batch-bounded matched subset aggregates.",
      Some("""WITH toks AS (SELECT doc_id,
             |    regexp_extract_all(lower(text), '[a-z]+') w FROM documents),
             |wocc AS (SELECT unnest([md5(array_to_string(w[(i+1):(i+20)], ' '))
             |                 for i in range(0, len(w) - 19)]) AS h
             |  FROM toks WHERE doc_id % 3 <> 0 OR doc_id % 2 = 0),
             |dup AS (SELECT h FROM wocc GROUP BY h HAVING COUNT(*) >= 2),
             |ex AS (SELECT doc_id, u.i AS pos, u.t AS tok, u.h AS h FROM (
             |  SELECT doc_id, unnest([{'i': i, 't': w[i+1],
             |      'h': CASE WHEN i <= len(w) - 20
             |        THEN md5(array_to_string(w[(i+1):(i+20)], ' ')) END}
             |    for i in range(0, len(w))]) u
             |  FROM toks WHERE doc_id % 3 = 0 AND doc_id % 2 = 1)),
             |mk AS (SELECT doc_id, pos, tok,
             |    CASE WHEN h IS NOT NULL AND h IN (SELECT h FROM dup)
             |      THEN 1 ELSE 0 END AS ds
             |  FROM ex),
             |cov AS (SELECT doc_id, pos, tok,
             |    sum(ds) OVER (PARTITION BY doc_id ORDER BY pos
             |      ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) > 0 AS covered
             |  FROM mk),
             |k AS (SELECT doc_id, CAST(count(*) AS INTEGER) AS n_tokens,
             |    CAST(count(*) FILTER (WHERE covered) AS INTEGER) AS n_removed,
             |    string_agg(tok, ' ' ORDER BY pos)
             |      FILTER (WHERE NOT covered) AS text_kept
             |  FROM cov GROUP BY doc_id)
             |SELECT d.doc_id, COALESCE(k.n_tokens, 0) AS n_tokens,
             |  COALESCE(k.n_removed, 0) AS n_removed,
             |  COALESCE(k.text_kept, '') AS text_kept
             |FROM (SELECT doc_id FROM documents
             |      WHERE doc_id % 3 = 0 AND doc_id % 2 = 1) d
             |LEFT JOIN k USING (doc_id)
             |ORDER BY doc_id""".stripMargin),
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val sink = tempStore.freshSink(s, "substrdelta", dir)
        TextOps.substrDeltaBuild(docs.filter(col("doc_id") % 3 =!= 0),
          "doc_id", "text", sink)
        val b1 = docs.filter(col("doc_id") % 3 === 0 &&
          col("doc_id") % 2 === 0)
        // the simulated crash re-delivery: the SAME batch admitted
        // TWICE under the same batch id — the second admit must leave
        // the store byte-identical or the oracle below mismatches
        TextOps.substrDeltaAdmit(b1, "doc_id", "text", sink,
          batchId = 1L, minArchiveCount = 2)
        TextOps.substrDeltaAdmit(b1, "doc_id", "text", sink,
          batchId = 1L, minArchiveCount = 2)
        TextOps.substrDeltaProbe(
            docs.filter(col("doc_id") % 3 === 0 && col("doc_id") % 2 === 1),
            "doc_id", "text", sink, minArchiveCount = 2)
          .orderBy("doc_id")
      }),

    QueryDef("q120_scaled_rebuild",
      "q105's maintenance arc with the quantizer-width lifecycle " +
        "CLOSED (the q89 floor analysis's design gap): per-batch probe " +
        "work is ~corpus x nprobe/nlist, so an index rebuilt forever " +
        "at its bootstrap-era nlist silently converts flat per-batch " +
        "admission into a linear one as the corpus accumulates. Here " +
        "the index bootstraps deliberately narrow (nlist=4), a " +
        "mode-collapsed batch fires the drift gate, and the rebuild " +
        "re-derives nlist from the CURRENT corpus (FAISS's 4*sqrt(N) " +
        "rule, trainability- and envelope-clamped) — probes adapt " +
        "automatically off the stored metadata. nlist_before/after " +
        "and the drift decision ride as audit columns; recall_mil " +
        "audits the served quality vs exact brute force in-query. " +
        "k-means + approximate probes inside -> rows-only; SimOpsSpec " +
        "pins the clamp arithmetic and the fixed-vs-scaled arc.",
      None,
      (s, dir) => {
        val e = t(s, dir, "embeddings").select("vec_id", "embedding")
        val sink = tempStore.freshSink(s, "scalerb", dir)
        def width(): Long =
          sink.read("ann_centroids").select("list").distinct().count()
        SimOps.buildIvfPqIndex(e, "vec_id", "embedding", sink, nlist = 4)
        val before = width()
        val batch = e.filter(col("vec_id") % 3 === 1)
          .select((col("vec_id") + lit(10000000L)).as("vec_id"),
            transform(col("embedding"), x => x * lit(0.0f) + lit(0.37f))
              .as("embedding"))
        val corpus2 = e.unionByName(batch)
        val d = SimOps.rebuildIfDrifted(batch, corpus2, "vec_id",
          "embedding", sink, nlist = 4, scaleNlist = true)
        val after = width()
        val queries = e.filter(col("vec_id") % 100 === 0)
        SimOps.withRecallAudit(
            SimOps.ivfPqProbeIndex(queries, corpus2, "vec_id", "embedding",
              sink, k = 3),
            SimOps.bruteForceTopK(queries, corpus2, "vec_id", "embedding", 3),
            3)
          .withColumn("nlist_before", lit(before))
          .withColumn("nlist_after", lit(after))
          .withColumn("rebuilt", lit(if (d.rebuilt) 1 else 0))
          .orderBy("query_id", "rank")
      }),

    QueryDef("q122_store_erasure",
      "RIGHT-TO-ERASURE over the incremental near-dup store, under an " +
        "EXACT oracle: build the archive's MinHash band+shingle store " +
        "(q109), ERASE a subject set (archive ids divisible by 5) " +
        "through ONE group delete — both member tables under a single " +
        "writer lease, touched buckets only (the merge cost model in " +
        "the delete direction: O(erasure batch + touched buckets), " +
        "never O(store)), no torn group for concurrent snapshotMany " +
        "readers — then probe the daily batch. The oracle is q109's " +
        "exhaustive archive x batch Jaccard MINUS the erased subjects: " +
        "an erased document can never resurface as a candidate, and " +
        "every bystander pair survives byte-for-byte. " +
        "StoreRetractSpec pins the op; UpsertSinkSpec pins deleteMany's " +
        "group semantics incl. the live-deleter snapshot race.",
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
             |  FROM sh a JOIN sh b
             |    ON a.doc_id % 3 <> 0 AND a.doc_id % 5 <> 0
             |   AND b.doc_id % 3 = 0)
             |SELECT a_id, b_id, round(j, 4) AS jac FROM p
             |WHERE j >= 0.5 ORDER BY a_id, b_id""".stripMargin),
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val sink = tempStore.freshSink(s, "erasure", dir)
        val archive = docs.filter(col("doc_id") % 3 =!= 0)
        TextOps.minhashStoreBuild(archive, "doc_id", "text", sink)
        TextOps.minhashStoreRetract(
          archive.filter(col("doc_id") % 5 === 0).select("doc_id"),
          "doc_id", sink)
        TextOps.minhashStoreProbe(docs.filter(col("doc_id") % 3 === 0),
            "doc_id", "text", sink, threshold = 0.5)
          .orderBy("a_id", "b_id")
      }),

    QueryDef("q121_sharded_ann",
      "SHARDED vector search — the scale path PAST the single-index " +
        "envelope q120's nlist scaling tops out at: the corpus hash-" +
        "routes into independent full IVF-PQ indexes (one per shard, " +
        "own quantizers, own sub-root — builds/rebuilds are " +
        "independent jobs a 1000-executor cluster runs in parallel, " +
        "and a drifted shard rebuilds ALONE), the probe fans out to " +
        "every shard's ordinary list-bounded probe and one bounded " +
        "TopKAggregate re-ranks the union to the global top-k — the " +
        "distributed-top-k identity, exact relative to the per-shard " +
        "results; ids partition across shards so no neighbor can " +
        "duplicate. Build amortized across invocations (the q81/q82 " +
        "split); k-means + approximate probes inside -> rows-only; " +
        "recall_mil audits served quality vs exact brute force " +
        "in-query; SimOpsSpec pins union exactness, dupe-freedom, " +
        "per-shard scaleNlist.",
      None,
      (s, dir) => {
        val e = t(s, dir, "embeddings").select("vec_id", "embedding")
        val sink = tempStore.sink(s, "annshard", dir)
        if (!SimOps.shardedIndexExists(s, sink))
          SimOps.buildShardedIvfPqIndex(e, "vec_id", "embedding", sink,
            shards = 4, nlist = 16)
        val q = e.filter(col("vec_id") % 100 === 0)
        SimOps.withRecallAudit(
            SimOps.shardedProbeIndex(q, e, "vec_id", "embedding", sink, 5),
            SimOps.bruteForceTopK(q, e, "vec_id", "embedding", 5), 5)
          .orderBy("query_id", "rank")
      }),

    QueryDef("q123_erasure_sweep",
      "The ERASURE capstone closing what q122 started: right-to-" +
        "erasure over the FULL q117 store composition — fingerprint " +
        "counts, segment inventory, MinHash band+shingle postings, " +
        "substring-window inventory, DSIR policy histograms, embedding " +
        "LSH postings+vectors — in ONE EraseOps sweep: all eight " +
        "member tables under a single writer lease (a concurrent " +
        "snapshotMany can never capture the subject gone from one " +
        "gate but flagged by another), every key/decrement derived " +
        "INSIDE the lease, count stores retracted by subtracting the " +
        "subjects' re-derived additive contribution (zero rows " +
        "physically removed; the policy histogram stays dense at " +
        "zero), posting stores by touched-bucket PK delete — " +
        "O(subjects + touched buckets), never O(store). The oracle is " +
        "q117's full admission screen with the archive REPLACED by " +
        "archive-minus-subjects: erased documents never resurface " +
        "through ANY gate, and every bystander signal is " +
        "byte-identical to a world that never admitted them.",
      Some {
        val (hitExprs, maxExpr, nWin, firstWin) = sqlLangPieces
        s"""WITH b AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0),
           |a AS (SELECT doc_id, text FROM documents
           |      WHERE doc_id % 3 <> 0 AND doc_id % 5 <> 0),
           |h AS (SELECT doc_id, $sqlQualityMil AS quality_mil,
           |  $hitExprs FROM b),
           |m AS (SELECT *, $maxExpr AS mx FROM h),
           |lg AS (SELECT doc_id, quality_mil, CASE WHEN mx = 0 OR ($nWin) > 1
           |    THEN 'und' ELSE ($firstWin) END AS lang FROM m),
           |afp AS (SELECT DISTINCT
           |    md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp
           |  FROM a),
           |ex AS (SELECT doc_id, CASE WHEN
           |    md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'))
           |      IN (SELECT fp FROM afp) THEN 1 ELSE 0 END AS dup_exact
           |  FROM b),
           |toksall AS (SELECT doc_id,
           |    regexp_extract_all(lower(text), '[a-z]+') w FROM documents),
           |segl AS (SELECT doc_id,
           |    [{'i': i, 's': array_to_string(w[(i*25+1):(i*25+25)], ' ')}
           |     for i in range(0, CAST(ceil(len(w)/25.0) AS INTEGER))] AS ss
           |  FROM toksall),
           |seg AS (SELECT doc_id, u.i AS seg_idx, u.s AS s
           |  FROM (SELECT doc_id, unnest(ss) AS u FROM segl)),
           |archs AS (SELECT DISTINCT md5(s) AS hsh FROM seg
           |  WHERE doc_id % 3 <> 0 AND doc_id % 5 <> 0),
           |batk AS (SELECT doc_id, count(*) FILTER (
           |      WHERE md5(s) NOT IN (SELECT hsh FROM archs)) AS kept
           |  FROM seg WHERE doc_id % 3 = 0 GROUP BY doc_id),
           |segk AS (SELECT t.doc_id,
           |    CAST(COALESCE(ceil(len(w)/25.0), 0) AS INTEGER) AS n_segs,
           |    CAST(COALESCE(batk.kept, 0) AS INTEGER) AS n_kept
           |  FROM toksall t LEFT JOIN batk USING (doc_id)
           |  WHERE t.doc_id % 3 = 0),
           |sh AS (SELECT doc_id, CASE WHEN len(w) < 3
           |    THEN [array_to_string(w, ' ')]
           |    ELSE list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
           |                        for i in range(1, len(w) - 1)]) END AS sss
           |  FROM toksall),
           |ndh AS (SELECT DISTINCT bsh.doc_id FROM sh ash JOIN sh bsh
           |  ON ash.doc_id % 3 <> 0 AND ash.doc_id % 5 <> 0
           |  AND bsh.doc_id % 3 = 0
           |  AND CAST(len(list_intersect(ash.sss, bsh.sss)) AS DOUBLE)
           |      / len(list_distinct(list_concat(ash.sss, bsh.sss))) >= 0.5),
           |emb AS (SELECT vec_id, embedding FROM embeddings),
           |edh AS (SELECT DISTINCT eb.vec_id AS doc_id
           |  FROM emb ea JOIN emb eb
           |  ON ea.vec_id % 3 <> 0 AND ea.vec_id % 5 <> 0
           |  AND eb.vec_id % 3 = 0
           |  AND round(${sqlCosine("ea.embedding", "eb.embedding")}, 6)
           |      >= 0.45),
           |swa AS (SELECT DISTINCT u AS hh FROM (
           |  SELECT unnest([md5(array_to_string(w[(i+1):(i+20)], ' '))
           |                 for i in range(0, len(w) - 19)]) AS u
           |  FROM toksall WHERE doc_id % 3 <> 0 AND doc_id % 5 <> 0)),
           |sex AS (SELECT doc_id, u.i AS pos, u.h AS hh FROM (
           |  SELECT doc_id, unnest([{'i': i,
           |      'h': CASE WHEN i <= len(w) - 20
           |        THEN md5(array_to_string(w[(i+1):(i+20)], ' ')) END}
           |    for i in range(0, len(w))]) u
           |  FROM toksall WHERE doc_id % 3 = 0)),
           |smk AS (SELECT doc_id, pos, CASE WHEN hh IS NOT NULL
           |      AND hh IN (SELECT hh FROM swa) THEN 1 ELSE 0 END AS ds
           |  FROM sex),
           |scov AS (SELECT doc_id,
           |    sum(ds) OVER (PARTITION BY doc_id ORDER BY pos
           |      ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) > 0 AS covered
           |  FROM smk),
           |sk AS (SELECT doc_id, CAST(count(*) AS INTEGER) AS n_tokens,
           |    CAST(count(*) FILTER (WHERE covered) AS INTEGER)
           |      AS n_span_removed
           |  FROM scov GROUP BY doc_id),
           |dgr AS (SELECT doc_id,
           |    CASE WHEN doc_id % 3 = 0 THEN 'bat'
           |         WHEN doc_id % 5 = 0 THEN 'gone'
           |         WHEN doc_id % 11 = 0 THEN 'tgt'
           |         ELSE 'raw' END AS part,
           |    w || CASE WHEN len(w) < 2 THEN CAST([] AS VARCHAR[])
           |      ELSE [w[i] || ' ' || w[i+1] for i in range(1, len(w))]
           |    END AS grams
           |  FROM toksall),
           |docc AS (SELECT doc_id, part,
           |    CAST(concat('0x', substr(md5(unnest(grams)), 1, 15))
           |      AS BIGINT) % 512 AS bk
           |  FROM dgr),
           |dht AS (SELECT bk, COUNT(*) AS ct FROM docc WHERE part = 'tgt'
           |  GROUP BY bk),
           |dhr AS (SELECT bk, COUNT(*) AS cr FROM docc WHERE part = 'raw'
           |  GROUP BY bk),
           |daff AS (SELECT doc_id,
           |    (1000 * (COALESCE(ct, 0) + 1))
           |      // (COALESCE(ct, 0) + COALESCE(cr, 0) + 2) AS aa
           |  FROM docc LEFT JOIN dht USING (bk) LEFT JOIN dhr USING (bk)
           |  WHERE part = 'bat'),
           |dsc AS (SELECT doc_id, COUNT(*) AS n, SUM(aa) AS sa
           |  FROM daff GROUP BY doc_id)
           |SELECT lg.doc_id, lg.quality_mil, lg.lang, ex.dup_exact,
           |  segk.n_segs, segk.n_kept,
           |  CASE WHEN ndh.doc_id IS NOT NULL THEN 1 ELSE 0 END AS neardup_hit,
           |  CASE WHEN edh.doc_id IS NOT NULL THEN 1 ELSE 0 END AS embdup_hit,
           |  COALESCE(sk.n_tokens, 0) AS n_tokens,
           |  COALESCE(sk.n_span_removed, 0) AS n_span_removed,
           |  CAST(dsc.sa // dsc.n AS BIGINT) AS dsir_mil,
           |  CAST(CASE WHEN dsc.sa // dsc.n >= 101 THEN 1 ELSE 0 END
           |    AS INTEGER) AS sel_admit,
           |  CASE WHEN lg.quality_mil >= 500 AND lg.lang = 'en'
           |       AND ex.dup_exact = 0 AND ndh.doc_id IS NULL
           |       AND edh.doc_id IS NULL
           |       AND COALESCE(sk.n_span_removed, 0) * 5
           |           <= COALESCE(sk.n_tokens, 0)
           |       AND COALESCE(dsc.sa // dsc.n >= 101, FALSE)
           |       THEN 1 ELSE 0 END AS admitted
           |FROM lg JOIN ex USING (doc_id) JOIN segk USING (doc_id)
           |  LEFT JOIN ndh USING (doc_id) LEFT JOIN edh USING (doc_id)
           |  LEFT JOIN sk USING (doc_id) LEFT JOIN dsc USING (doc_id)
           |ORDER BY doc_id""".stripMargin
      },
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val e = t(s, dir, "embeddings")
        val sink = tempStore.freshSink(s, "erasesweep", dir)
        val archive = docs.filter(col("doc_id") % 3 =!= 0)
        // independent store tables — overlapped builds (guide §2.6),
        // content identical to the sequential build
        graft.ops.Par.run(Seq(
          () => TextOps.fingerprintStoreBuild(archive, "doc_id", "text", sink),
          () => TextOps.segmentStoreBuild(archive, "doc_id", "text", sink),
          () => TextOps.minhashStoreBuild(archive, "doc_id", "text", sink),
          () => TextOps.substrStoreBuild(archive, "doc_id", "text", sink),
          () => SelectOps.selectionStoreBuild(archive,
            archive.filter(col("doc_id") % 11 === 0),
            "doc_id", "text", sink, buckets = 512),
          () => SimOps.embLshStoreBuild(e.filter(col("vec_id") % 3 =!= 0),
            "vec_id", "embedding", sink)))
        // THE ERASURE: archive subjects (ids divisible by 5) leave every
        // store in one group-atomic sweep
        val subjects = archive.filter(col("doc_id") % 5 === 0)
        EraseOps.eraseSubjects(subjects, "doc_id", "text", sink,
          sweepId = "q123_sweep",
          fromTarget = Some(subjects.filter(col("doc_id") % 11 === 0)),
          fromRaw = Some(subjects.filter(col("doc_id") % 11 =!= 0)),
          vecIds = Some(e.filter(col("vec_id") % 3 =!= 0 &&
            col("vec_id") % 5 === 0).select("vec_id")))
        // q117's probe block, unchanged: the screen must behave as if
        // the subjects were never admitted
        val batch = docs.filter(col("doc_id") % 3 === 0)
        val txt = TextOps.admissionScreen(batch, "doc_id", "text", sink)
          .drop("admitted")
        val sub = TextOps.substrStoreProbe(batch, "doc_id", "text", sink)
          .select(col("doc_id"), col("n_tokens"),
            col("n_removed").as("n_span_removed"))
        val sel = SelectOps.selectionStoreScore(batch, "doc_id", "text",
            sink, minMil = 101L)
          .select(col("doc_id"), col("dsir_mil"),
            col("admitted").as("sel_admit"))
        val embHits = SimOps.embLshStoreProbe(
            e.filter(col("vec_id") % 3 === 0), "vec_id", "embedding",
            sink, threshold = 0.45)
          .select(col("b_id").as("doc_id")).distinct()
          .withColumn("__ed", lit(1))
        txt.join(broadcast(embHits), Seq("doc_id"), "left")
          .join(broadcast(sub), Seq("doc_id"), "left")
          .join(broadcast(sel), Seq("doc_id"), "left")
          .select(col("doc_id"), col("quality_mil"), col("lang"),
            col("dup_exact"), col("n_segs"), col("n_kept"),
            col("neardup_hit"),
            coalesce(col("__ed"), lit(0)).as("embdup_hit"),
            col("n_tokens"), col("n_span_removed"), col("dsir_mil"),
            col("sel_admit"))
          .withColumn("admitted",
            (col("quality_mil") >= 500 && col("lang") === "en" &&
              col("dup_exact") === 0 && col("neardup_hit") === 0 &&
              col("embdup_hit") === 0 &&
              col("n_span_removed") * 5 <= col("n_tokens") &&
              col("sel_admit") === 1).cast("int"))
          .orderBy("doc_id")
      }),

    QueryDef("q124_sharded_maintenance",
      "The sharded index's OPERATIONAL payoff, driver-visible (q121 " +
        "builds+probes; this is the maintenance arc): a STABLE " +
        "in-distribution batch measures drift per shard and rebuilds " +
        "NOTHING — every shard's content version byte-pinned unchanged " +
        "via the sink fingerprint — then a mode-collapsed batch " +
        "hash-routed entirely into ONE shard fires that shard's drift " +
        "gate ALONE: 1/shards of the fleet re-trains, the other " +
        "shards' versions stay byte-identical, and the post-swap " +
        "sharded probe serves the grown corpus (recall_mil vs exact " +
        "brute force rides every row). Per-shard decisions and " +
        "version-moved flags are the audit columns; k-means inside -> " +
        "rows-only; CatalogSpec pins the no-rebuild/one-rebuild/" +
        "byte-pin contract and the recall floor.",
      None,
      (s, dir) => {
        val e = t(s, dir, "embeddings").select("vec_id", "embedding")
        val sink = tempStore.freshSink(s, "shardmaint", dir)
        // coarseIters=1: the arc under test is the maintenance contract
        // (who rebuilds, whose bytes move), not quantizer quality — the
        // recall floor is still enforced on the served result
        SimOps.buildShardedIvfPqIndex(e, "vec_id", "embedding", sink,
          shards = 4, nlist = 8, coarseIters = 1)
        val v0 = SimOps.shardedIndexVersions(s, sink)
        // stable batch: a self-sample (the q105 convention — same ids,
        // same vectors, so each slice routes to its own shard and the
        // measured distribution IS the trained one) — nothing rebuilds
        val stable = e.filter(col("vec_id") % 3 === 0)
        val c1 = e
        val d1 = SimOps.maintainShardedIndex(stable, c1, "vec_id",
          "embedding", sink, nlist = 8)
        val v1 = SimOps.shardedIndexVersions(s, sink)
        // drift batch: mode-collapsed vectors, hash-routed into shard 0
        // ONLY — exactly one shard re-trains
        val collapsed = e.filter(col("vec_id") % 3 === 1)
          .select((col("vec_id") + lit(40000000L)).as("vec_id"),
            transform(col("embedding"), x => x * lit(0.0f) + lit(0.41f))
              .as("embedding"))
          .filter(SimOps.shardOf("vec_id", 4) === 0)
        val c2 = c1.unionByName(collapsed)
        val d2 = SimOps.maintainShardedIndex(collapsed, c2, "vec_id",
          "embedding", sink, nlist = 8)
        val v2 = SimOps.shardedIndexVersions(s, sink)
        val q = e.filter(col("vec_id") % 200 === 0)
        // bounded: one scalar aggregate over the audited probe
        val recall = SimOps.withRecallAudit(
            SimOps.shardedProbeIndex(q, c2, "vec_id", "embedding", sink, 5),
            SimOps.bruteForceTopK(q, c2, "vec_id", "embedding", 5), 5)
          .agg(avg(col("recall_mil")).cast("long")).collect()(0).getLong(0)
        import s.implicits._
        def decision(ds: Seq[SimOps.ShardDrift], sh: Int): Int =
          ds.find(_.shard == sh).map(x => if (x.decision.rebuilt) 1 else 0)
            .getOrElse(-1) // -1 = empty batch slice, nothing measured
        (0 until 4).map { sh =>
          (sh, decision(d1, sh), if (v1(sh) != v0(sh)) 1 else 0,
            decision(d2, sh), if (v2(sh) != v1(sh)) 1 else 0, recall)
        }.toDF("shard", "stable_rebuilt", "stable_ver_changed",
          "drift_rebuilt", "drift_ver_changed", "recall_mil")
          .orderBy("shard")
      }),

    QueryDef("q125_incremental_exactdedup",
      "CUMULATIVE exact-dedup admission — the fingerprint store's " +
        "write path (q109's arc for the exact modality, closing the " +
        "store family: every modality now ships build/probe/admit/" +
        "erase): archive fps persisted as (fp, cnt), day-1 batch " +
        "ADMITTED (probe, then fold its fp counts in — touched fps " +
        "only, map-only broadcast joins), day-2 batch probed against " +
        "the CUMULATIVE store — a day-2 document duplicating a day-1 " +
        "admission is flagged without ever re-reading archive or " +
        "day-1 text. Exact oracle: dup_exact vs the fingerprints of " +
        "archive UNION day-1.",
      Some("""WITH nf AS (SELECT doc_id,
             |    md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp
             |  FROM documents),
             |known AS (SELECT DISTINCT fp FROM nf
             |  WHERE doc_id % 3 <> 0 OR doc_id % 2 = 0)
             |SELECT doc_id, CASE WHEN fp IN (SELECT fp FROM known)
             |  THEN 1 ELSE 0 END AS dup_exact
             |FROM nf WHERE doc_id % 3 = 0 AND doc_id % 2 = 1
             |ORDER BY doc_id""".stripMargin),
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val sink = tempStore.freshSink(s, "fpadmit", dir)
        TextOps.fingerprintStoreBuild(docs.filter(col("doc_id") % 3 =!= 0),
          "doc_id", "text", sink)
        TextOps.fingerprintStoreAdmit(
          docs.filter(col("doc_id") % 3 === 0 && col("doc_id") % 2 === 0),
          "doc_id", "text", sink)
        TextOps.fingerprintStoreProbe(
            docs.filter(col("doc_id") % 3 === 0 && col("doc_id") % 2 === 1),
            "doc_id", "text", sink)
          .orderBy("doc_id")
      }),

    QueryDef("q126_erasure_ledger",
      "The DURABLE record that an erasure HAPPENED — the compliance " +
        "officer's receipt (q123 proves the sweep erases exactly; this " +
        "proves it leaves an auditable trail): an eraseSubjects sweep " +
        "over a fingerprint + segment store group (plus the " +
        "batch-keyed substring DELTA store as the documented " +
        "present-but-excluded member, its containing batches resolved) " +
        "writes one erasure_ledger row per member table — action, " +
        "subject count, rows removed / counts decremented, and the " +
        "sink content-version fingerprints bracketing the sweep " +
        "(ver_changed=1 pins that bytes moved). The sweep is then " +
        "REPLAYED under the SAME sweep id — the crashed-sweep recovery " +
        "path: the erasure journal converges the data without a double " +
        "decrement (replay_ver_moved=0 on every member) and " +
        "first-write-wins keeps the original receipt " +
        "(receipt_stable=1). Version fingerprints hash file metadata " +
        "-> rows-only; CatalogSpec pins the receipt shape and the " +
        "replay invariants.",
      None,
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val sink = tempStore.freshSink(s, "eraseledger", dir)
        val archive = docs.filter(col("doc_id") % 3 =!= 0)
        // independent store tables — overlapped builds (guide §2.6)
        graft.ops.Par.run(Seq(
          () => TextOps.fingerprintStoreBuild(archive, "doc_id", "text", sink),
          () => TextOps.segmentStoreBuild(archive, "doc_id", "text", sink),
          () => TextOps.substrDeltaBuild(archive, "doc_id", "text", sink)))
        TextOps.substrDeltaAdmit(docs.filter(col("doc_id") % 3 === 0),
          "doc_id", "text", sink, batchId = 1L)
        val subjects = archive.filter(col("doc_id") % 5 === 0)
        val r1 = EraseOps.eraseSubjects(subjects, "doc_id", "text", sink,
          sweepId = "q126_sweep")
        // bounded driver state: one version per member table, one
        // ledger row per member table
        val vers1 = r1.erased.map(tn => tn -> sink.version(tn)).toMap
        val led1 = sink.read(EraseOps.LedgerTable)
          .collect().map(_.toSeq).toSet
        // THE REPLAY (same sweep id — the crash-recovery protocol): the
        // journal skips every member, the receipt stands
        EraseOps.eraseSubjects(subjects, "doc_id", "text", sink,
          sweepId = "q126_sweep")
        val led2 = sink.read(EraseOps.LedgerTable)
          .collect().map(_.toSeq).toSet
        val receiptStable = if (led1 == led2) 1 else 0
        import s.implicits._
        val aud = r1.erased
          .map(tn => tn -> (if (sink.version(tn) != vers1(tn)) 1 else 0))
          .toDF("member_table", "replay_ver_moved")
        sink.read(EraseOps.LedgerTable)
          .select(col("member_table"), col("action"), col("subjects"),
            col("removed"),
            (col("ver_before") =!= col("ver_after")).cast("int")
              .as("ver_changed"))
          .join(broadcast(aud), Seq("member_table"), "left")
          .select(col("member_table"), col("action"), col("subjects"),
            col("removed"), col("ver_changed"),
            coalesce(col("replay_ver_moved"), lit(0)).as("replay_ver_moved"),
            lit(receiptStable).as("receipt_stable"))
          .orderBy("member_table")
      }),

    QueryDef("q127_exactly_once_admit",
      "Exactly-once ADMISSION under crash-replay, pinned by an EXACT " +
        "oracle through the one observable that exposes a double " +
        "fold: COUNT-correct erasure. The day-1 batch is admitted " +
        "into the fingerprint store TWICE under one admit id (the " +
        "crashed-admit recovery path — the _graft_admits journal + " +
        "per-bucket markers make the replay a no-op), a day-1 subset " +
        "is then ERASED, and day-2 — day-1's texts re-keyed under " +
        "fresh ids, the constructed-duplicates convention (q124's " +
        "re-key trick), so discrimination never depends on the SF's " +
        "natural dup draw — probes the store. A replayed fold that " +
        "double-counted leaves every erased document's fingerprint " +
        "alive at cnt=1: its day-2 duplicate would flag as a dup of " +
        "text the store no longer holds, and holder_cnt (the STORED " +
        "post-erasure count riding every row, which the oracle " +
        "recomputes as the surviving world's per-fp holder count) " +
        "inflates on EVERY day-1 fp. Hash-exact only if the fold ran " +
        "exactly once AND the retraction subtracted exactly what one " +
        "admission added.",
      Some("""WITH nf AS (SELECT doc_id,
             |    md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp
             |  FROM documents),
             |cnts AS (SELECT fp, COUNT(*) AS holder_cnt FROM nf
             |  WHERE doc_id % 3 <> 0 OR doc_id % 2 = 1
             |  GROUP BY fp)
             |SELECT nf.doc_id + 10000000 AS doc_id,
             |  CASE WHEN cnts.fp IS NOT NULL THEN 1 ELSE 0 END AS dup_exact,
             |  COALESCE(cnts.holder_cnt, 0) AS holder_cnt
             |FROM nf LEFT JOIN cnts ON nf.fp = cnts.fp
             |WHERE nf.doc_id % 3 = 0
             |ORDER BY 1""".stripMargin),
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val sink = tempStore.freshSink(s, "onceadmit", dir)
        val day1 = docs.filter(col("doc_id") % 3 === 0)
        TextOps.fingerprintStoreBuild(docs.filter(col("doc_id") % 3 =!= 0),
          "doc_id", "text", sink)
        TextOps.fingerprintStoreAdmit(day1, "doc_id", "text", sink,
          admitId = Some("q127_day1"))
        // THE REPLAY: same batch, same admit id — the journal must make
        // this a no-op, or the counts below inflate and the erasure
        // under-retracts
        TextOps.fingerprintStoreAdmit(day1, "doc_id", "text", sink,
          admitId = Some("q127_day1"))
        TextOps.fingerprintStoreRetract(
          day1.filter(col("doc_id") % 2 === 0), "doc_id", "text", sink)
        // day-2: day-1's texts under fresh ids — every probe document
        // duplicates a known day-1 admission by construction
        val day2 = day1.select(
          (col("doc_id") + lit(10000000L)).as("doc_id"), col("text"))
        val flags = TextOps.fingerprintStoreProbe(day2, "doc_id", "text",
          sink)
        // the count-exact audit column: the store's post-erasure per-fp
        // count, fetched with the probe's own shape (batch fps
        // broadcast against the column-pruned store scan, the bounded
        // match set broadcast back onto the batch)
        val day2fps = day2.select(col("doc_id"),
          TextOps.fingerprint(col("text")).as("fp"))
        val counts = day2fps
          .join(broadcast(sink.read("fingerprint_store")
            .join(broadcast(day2fps.select(col("fp")).distinct()), "fp")),
            Seq("fp"), "left")
          .select(col("doc_id"), coalesce(col("cnt"), lit(0L)).as("holder_cnt"))
        flags.join(broadcast(counts), Seq("doc_id"))
          .orderBy("doc_id")
      }),

    QueryDef("q128_ann_right_to_erasure",
      "Right-to-erasure reaches the ANN SERVING layer (q123 erases " +
        "the admission stores; without this the subjects' PQ codes — " +
        "a reconstructible approximation of their embeddings — keep " +
        "serving, and probes keep returning the erased ids as " +
        "neighbors): a self-contained persisted IVF-PQ index (SQ8 " +
        "refine stored) is built over the full embedding corpus, the " +
        "subjects (vec_id % 5 = 0) are removed via ivfPqIndexRemove — " +
        "FAISS remove_ids for this layout: ONE eraseMany group over " +
        "ann_codes + ann_vecs8, keys derived from the ids alone, " +
        "O(subjects + touched buckets), trained quantizers untouched " +
        "— and the removal is REPLAYED under the same op id (the " +
        "crashed-erasure recovery path; the journal makes it a " +
        "no-op). Exact oracle: post-removal membership of every " +
        "vec_id in the code lists AND in the SQ8 refine table equals " +
        "the survivor set exactly, and leaked_hits — how often each " +
        "ERASED id appears as a neighbor in a post-removal " +
        "index-tables-only probe — is zero for every subject.",
      Some("""SELECT vec_id,
             |  CAST(CASE WHEN vec_id % 5 = 0 THEN 0 ELSE 1 END AS INTEGER)
             |    AS in_codes,
             |  CAST(CASE WHEN vec_id % 5 = 0 THEN 0 ELSE 1 END AS INTEGER)
             |    AS in_sq8,
             |  CAST(CASE WHEN vec_id % 5 = 0 THEN 0 ELSE -1 END AS BIGINT)
             |    AS leaked_hits
             |FROM embeddings ORDER BY vec_id""".stripMargin),
      (s, dir) => {
        val e = t(s, dir, "embeddings").select("vec_id", "embedding")
        val sink = tempStore.freshSink(s, "annerase", dir)
        SimOps.buildIvfPqIndex(e, "vec_id", "embedding", sink,
          nlist = 8, coarseIters = 1, storeSq8 = true)
        val subjects = e.filter(col("vec_id") % 5 === 0).select("vec_id")
        SimOps.ivfPqIndexRemove(subjects, "vec_id", sink,
          opId = Some("q128_erase"))
        // THE REPLAY: same ids, same op id — the erasure journal must
        // make it a no-op (the crash-recovery protocol)
        SimOps.ivfPqIndexRemove(subjects, "vec_id", sink,
          opId = Some("q128_erase"))
        // post-removal probe, self-contained (SQ8 refine — the serving
        // box's shape: index tables only); erased queries are fair
        // game — the query side is the caller's frame, not the index
        val q = e.filter(col("vec_id") % 7 === 0)
        val hits = SimOps.ivfPqProbeIndex(q, e, "vec_id", "embedding",
            sink, k = 5, refineFromSq8 = true)
          .groupBy(col("neighbor_id").as("vec_id"))
          .agg(count(lit(1)).as("__hits"))
        val inCodes = sink.read(SimOps.IdxCodes)
          .select(col("id").as("vec_id")).withColumn("__ic", lit(1))
        val inSq8 = sink.read(SimOps.IdxVecs8)
          .select(col("id").as("vec_id")).withColumn("__i8", lit(1))
        e.select(col("vec_id"))
          .join(inCodes, Seq("vec_id"), "left")
          .join(inSq8, Seq("vec_id"), "left")
          .join(hits, Seq("vec_id"), "left")
          .select(col("vec_id"),
            coalesce(col("__ic"), lit(0)).as("in_codes"),
            coalesce(col("__i8"), lit(0)).as("in_sq8"),
            when(col("vec_id") % 5 === 0, coalesce(col("__hits"), lit(0L)))
              .otherwise(lit(-1L)).as("leaked_hits"))
          .orderBy("vec_id")
      }),

    QueryDef("q129_search_index_lifecycle",
      "The keyword-search SERVING layer joins the store family — a " +
        "persisted BM25 inverted index (bm25_postings + bm25_doclens " +
        "+ the additively-maintained bm25_stats row, one atomic " +
        "group) through its full lifecycle: built from the archive " +
        "(tokenize ONCE — q87 re-tokenizes the corpus on every query, " +
        "the wrong amortization for serving), a day-1 batch ADMITTED " +
        "(PK-merged postings + lengths, touched buckets only; the " +
        "(count, token-sum) stats fold rides the admit journal), " +
        "subjects ERASED (posting keys re-derived from their text — " +
        "no store scan — plus their length rows plus the exact stats " +
        "decrement, one erasure group: a search can never see a doc " +
        "gone from postings but still inflating N/avgdl), the erasure " +
        "REPLAYED under the same op id (journaled no-op), then " +
        "SEARCHED from index tables alone — the query-term isin " +
        "filter reaches the posting scan as a pushed parquet " +
        "predicate, df aggregates terms-sized, (N, avgdl) is the " +
        "1-row stats read (never a corpus-sized aggregate at query " +
        "time). Exact oracle: the served scores equal q87's direct " +
        "BM25 over the surviving world (archive minus subjects, plus " +
        "day-1), rounded 6 dp.",
      Some("""WITH corpus AS (SELECT doc_id, text FROM documents
             |  WHERE doc_id % 3 = 0 OR doc_id % 5 <> 0),
             |lens AS (SELECT doc_id,
             |    len(regexp_extract_all(lower(text), '[a-z]+')) AS dl
             |  FROM corpus),
             |stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             |    AVG(dl) AS avgdl FROM lens),
             |tok AS (SELECT doc_id,
             |    unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
             |  FROM corpus),
             |tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM tok
             |  WHERE w IN ('vector', 'merge', 'stream') GROUP BY doc_id, w),
             |dfr AS (SELECT w, CAST(COUNT(*) AS DOUBLE) AS df
             |  FROM tf GROUP BY w)
             |SELECT tf.doc_id,
             |  ROUND(SUM(ln((n - df + 0.5) / (df + 0.5) + 1.0)
             |    * (tf * (1.2 + 1.0)
             |       / (tf + 1.2 * ((1.0 - 0.75) + 0.75 * (dl / avgdl))))), 6)
             |    AS score
             |FROM tf JOIN dfr USING (w) CROSS JOIN stats
             |  JOIN lens ON tf.doc_id = lens.doc_id
             |GROUP BY tf.doc_id ORDER BY tf.doc_id""".stripMargin),
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val sink = tempStore.freshSink(s, "searchidx", dir)
        val archive = docs.filter(col("doc_id") % 3 =!= 0)
        SearchOps.invertedIndexBuild(archive, "doc_id", "text", sink)
        SearchOps.invertedIndexAdmit(docs.filter(col("doc_id") % 3 === 0),
          "doc_id", "text", sink, admitId = Some("q129_admit"))
        val subjects = archive.filter(col("doc_id") % 5 === 0)
        SearchOps.invertedIndexRetract(subjects, "doc_id", "text", sink,
          opId = Some("q129_erase"))
        // THE REPLAY (crash-recovery protocol): the erasure journal
        // makes it a no-op — double deletion of posting keys would be
        // harmless, but the replay fence is the family contract
        SearchOps.invertedIndexRetract(subjects, "doc_id", "text", sink,
          opId = Some("q129_erase"))
        // snapshot-consistent serving read — the r16 verdict's default
        // for every serving composition (materialize inside `use`)
        SearchOps.invertedIndexSearchSnapshot(
            Seq("vector", "merge", "stream"), sink) { served =>
          served.select(col("doc_id"), round(col("score"), 6).as("score"))
            .orderBy("doc_id")
            .localCheckpoint(true)
        }
      }),

    QueryDef("q130_hybrid_serving_erasure",
      "The serving-layer capstone: HYBRID retrieval (lexical BM25 + " +
        "dense cosine, fused by RRF — the q88 composition) served " +
        "ENTIRELY from persisted stores, after ONE GDPR sweep erased " +
        "the subjects from both serving layers. Both indexes are " +
        "built over the full corpus (the inverted index; the " +
        "embedding store with exact vectors), one eraseSubjects call " +
        "removes the subjects (doc/vec % 5 = 0) from postings, " +
        "lengths, stats, LSH postings AND vectors with ledger " +
        "receipts, and the hybrid query then runs store-only: BM25 " +
        "from the inverted index (pushed term filter, 1-row stats), " +
        "the dense side an exact cosine of every STORED vector " +
        "against a surviving query document's stored embedding, both " +
        "6-dp-rounded before ranking (rank selection cannot flip on " +
        "float ulps), RRF-fused at k0=60 over each side's top-100. " +
        "An erased subject can appear in NEITHER ranking — its " +
        "postings are gone, its vector is gone, and its mass is out " +
        "of (N, avgdl). Exact oracle: the full hybrid ranking vs " +
        "DuckDB over the surviving world.",
      Some(s"""WITH corpus AS (SELECT doc_id, text FROM documents
             |  WHERE doc_id % 5 <> 0),
             |lens AS (SELECT doc_id,
             |    len(regexp_extract_all(lower(text), '[a-z]+')) AS dl
             |  FROM corpus),
             |stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             |    AVG(dl) AS avgdl FROM lens),
             |tok AS (SELECT doc_id,
             |    unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
             |  FROM corpus),
             |tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM tok
             |  WHERE w IN ('vector', 'merge', 'stream') GROUP BY doc_id, w),
             |dfr AS (SELECT w, CAST(COUNT(*) AS DOUBLE) AS df
             |  FROM tf GROUP BY w),
             |bm AS (SELECT tf.doc_id,
             |    ROUND(SUM(ln((n - df + 0.5) / (df + 0.5) + 1.0)
             |      * (tf * (1.2 + 1.0)
             |         / (tf + 1.2 * ((1.0 - 0.75) + 0.75 * (dl / avgdl))))), 6)
             |      AS score
             |  FROM tf JOIN dfr USING (w) CROSS JOIN stats
             |    JOIN lens ON tf.doc_id = lens.doc_id
             |  GROUP BY tf.doc_id),
             |emb AS (SELECT vec_id, embedding FROM embeddings
             |  WHERE vec_id % 5 <> 0),
             |qv AS (SELECT embedding AS q FROM embeddings WHERE vec_id = 1),
             |dn AS (SELECT vec_id AS doc_id,
             |    ROUND(${sqlCosine("embedding", "q")}, 6) AS score
             |  FROM emb CROSS JOIN qv WHERE vec_id <> 1),
             |ra AS (SELECT doc_id, CAST(row_number() OVER (
             |      ORDER BY score DESC, doc_id) AS INTEGER) AS rank_a
             |  FROM (SELECT * FROM bm ORDER BY score DESC, doc_id LIMIT 100)),
             |rb AS (SELECT doc_id, CAST(row_number() OVER (
             |      ORDER BY score DESC, doc_id) AS INTEGER) AS rank_b
             |  FROM (SELECT * FROM dn ORDER BY score DESC, doc_id LIMIT 100))
             |SELECT COALESCE(ra.doc_id, rb.doc_id) AS doc_id,
             |  rank_a, rank_b,
             |  ROUND(COALESCE(1.0 / (60 + rank_a), 0.0)
             |      + COALESCE(1.0 / (60 + rank_b), 0.0), 6) AS rrf
             |FROM ra FULL OUTER JOIN rb ON ra.doc_id = rb.doc_id
             |ORDER BY doc_id""".stripMargin),
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val e = t(s, dir, "embeddings")
        val sink = tempStore.freshSink(s, "hybrid", dir)
        // independent serving layers — overlapped builds (guide §2.6)
        graft.ops.Par.run(Seq(
          () => SearchOps.invertedIndexBuild(docs, "doc_id", "text", sink),
          () => SimOps.embLshStoreBuild(e, "vec_id", "embedding", sink)))
        // ONE sweep erases the subjects from BOTH serving layers, with
        // ledger receipts — the compliance arc the stores exist for
        EraseOps.eraseSubjects(docs.filter(col("doc_id") % 5 === 0),
          "doc_id", "text", sink, sweepId = "q130_sweep",
          vecIds = Some(e.filter(col("vec_id") % 5 === 0)
            .select("vec_id")))
        // lexical side: served BM25, 6-dp rounded BEFORE ranking (the
        // q88 convention — rank selection never rides a float ulp);
        // snapshot-consistent read, the serving default (r16 verdict)
        val bm = SearchOps.invertedIndexSearchSnapshot(
            Seq("vector", "merge", "stream"), sink) { served =>
          served.select(col("doc_id"), round(col("score"), 6).as("score"))
            .localCheckpoint(true)
        }
        // dense side: exact cosine of every STORED vector against a
        // SURVIVING query document's stored embedding — store-only,
        // so erased vectors cannot score
        val vecs = sink.read(SimOps.EmbVecs)
        val qv = vecs.filter(col("id") === 1L).select(col("v").as("__qv"))
        val dense = vecs.crossJoin(broadcast(qv))
          .filter(col("id") =!= 1L)
          .select(col("id").as("doc_id"),
            round(SimOps.cosine(col("v"), col("__qv")), 6).as("score"))
        TextOps.rrfFuse(bm, dense, "doc_id")
          .select(col("doc_id"), col("rank_a"), col("rank_b"),
            round(col("rrf"), 6).as("rrf"))
          .orderBy("doc_id")
      }),

    QueryDef("q131_ann_hybrid_serving",
      "q130 with the LAST corpus-sized serving term removed (r14 " +
        "verdict #1): the dense side of hybrid retrieval served from " +
        "the SHARDED ANN index instead of an exact cosine over every " +
        "stored vector — the 100 TB query path. Both serving layers " +
        "build over the full corpus (the BM25 inverted index; the " +
        "sharded IVF-PQ index with SQ8 refine codes), ONE eraseSubjects " +
        "sweep removes the subjects (doc/vec % 5 = 0) from postings, " +
        "lengths, stats AND every subject shard's code+refine lists " +
        "(q128's erasure arc, ledger receipts included), and the " +
        "hybrid query then runs index-only: BM25 from the posting " +
        "scan's pushed term filter + 1-row stats read, the dense side " +
        "a sharded probe (per-shard list-bounded ADC shortlist, SQ8 " +
        "refine — index tables only, the q93 self-contained shape) " +
        "re-ranked to the global top-k by one bounded TopKAggregate, " +
        "RRF-fused at k0=60. An erased subject can appear in NEITHER " +
        "ranking: its postings are gone, its mass is out of (N, " +
        "avgdl), and its codes left every shard (leaked = 0 per row, " +
        "CatalogSpec-pinned). Both serving reads are SNAPSHOT-" +
        "consistent (r16 verdict #1 — the shipped default: a probe " +
        "racing a one-shard rebuild can never pair torn generations; " +
        "StoreConcurrencySpec proves the tear real for the plain " +
        "reads). ANN inside -> rows-only; recall_mil " +
        "rides every row — the served dense ranking vs the EXACT " +
        "surviving-world top-k (q130's ground truth, one bounded " +
        "audit-only brute pass that never runs on the serving path; " +
        "PlanShapeSpec pins the serving plan corpus-scan-free).",
      None,
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val e = t(s, dir, "embeddings").select("vec_id", "embedding")
        // build ONCE per process (the q121/q81 amortization — index
        // construction is the offline job, serving+erasure the steady
        // state); each invocation then runs the full sweep -> serve ->
        // RE-ADMIT round trip, restoring the store bit-exactly for the
        // next pass: the re-encoded codes are deterministic under the
        // unchanged quantizers and the stats fold adds back exactly
        // the (count, token-sum) the sweep subtracted
        val sink = tempStore.sink(s, "annhybrid", dir)
        // DEFENSIVE restore detection (r15 advice): the process-wide
        // sink relies on every pass completing its sweep -> serve ->
        // re-admit round trip — a pass killed inside it leaves both
        // layers short one cohort, and the NEXT pass's sweep would
        // decrement already-retracted mass out of (N, avgdl) forever
        // (clamping only applies at zero). An on-disk marker brackets
        // the mutation window: present at pass start = a prior pass
        // died inside its round trip -> rebuild both layers (atomic
        // overwrites) before sweeping. O(1) file probes, no Spark jobs
        val openMarker = java.nio.file.Paths.get(sink.rootPath)
          .resolve("_graft_roundtrip_open")
        val crashed = java.nio.file.Files.exists(openMarker)
        // the two layers' (re)builds are independent — overlapped
        graft.ops.Par.run(Seq(
          () => if (crashed || !SearchOps.invertedIndexExists(sink))
            SearchOps.invertedIndexBuild(docs, "doc_id", "text", sink),
          () => if (crashed || !SimOps.shardedIndexExists(s, sink))
            SimOps.buildShardedIvfPqIndex(e, "vec_id", "embedding", sink,
              shards = 2, nlist = 16, m = 8, ksub = 16, coarseIters = 1,
              storeSq8 = true)))
        java.nio.file.Files.write(openMarker, Array.emptyByteArray)
        val pass = java.util.UUID.randomUUID().toString.take(8)
        val subjects = docs.filter(col("doc_id") % 5 === 0)
        val subjectVecs = e.filter(col("vec_id") % 5 === 0)
        EraseOps.eraseSubjects(subjects, "doc_id", "text", sink,
          sweepId = s"q131_sweep_$pass",
          vecIds = Some(subjectVecs.select("vec_id")))
        // the two serving reads are independent (disjoint table groups,
        // both snapshot-pinned, no writer live between sweep and
        // re-admit) — run them overlapped (guide §2.6):
        // lexical side: served BM25, 6-dp rounded BEFORE ranking (the
        // q88/q130 convention); SNAPSHOT-consistent read — the serving
        // default (r16 verdict #1): even a search racing a live
        // admit/erase can never pair torn index generations.
        // dense side: the sharded ANN probe, index tables only — the
        // snapshot form pins every shard's generation for the probe
        // window (its SQ8 refine is exactly this row's serving shape);
        // probe cosines are already 6-dp rounded
        val q = e.filter(col("vec_id") === 1L)
        val serving = graft.ops.Par.map(Seq[() => DataFrame](
          () => SearchOps.invertedIndexSearchSnapshot(
              Seq("vector", "merge", "stream"), sink) { served =>
            served.select(col("doc_id"), round(col("score"), 6).as("score"))
              .localCheckpoint(true)
          },
          () => SimOps.shardedProbeIndexSnapshot(q, "vec_id",
              "embedding", sink, k = 100, nprobe = 12) {
            _.localCheckpoint(true)
          }))(_())
        val (bm, probed) = (serving(0), serving(1))
        // materialized above BEFORE the restore below: the returned
        // frame must capture the post-sweep serving state, not the
        // re-admitted one. The two re-admits write DISJOINT table
        // groups (BM25 tables vs per-shard sub-sinks) — overlapped
        graft.ops.Par.run(Seq(
          () => SearchOps.invertedIndexAdmit(subjects, "doc_id", "text",
            sink, admitId = Some(s"q131_readmit_$pass")),
          () => { SimOps.shardedIndexAdd(subjectVecs, "vec_id",
            "embedding", sink); () }))
        // round trip complete — the stores hold the full world again
        // (the serving reads above are checkpointed, so everything
        // after this line consumes materialized frames)
        java.nio.file.Files.deleteIfExists(openMarker)
        // AUDIT ONLY: the exact surviving-world top-k (q130's dense
        // ranking) — the one brute pass, off the serving path
        val exact = SimOps.bruteForceTopK(q,
          e.filter(col("vec_id") % 5 =!= 0), "vec_id", "embedding", 100)
        val recall = SimOps.withRecallAudit(probed, exact, 100)
          .agg(max(col("recall_mil")).as("recall_mil"))
        val dense = probed
          .select(col("neighbor_id").as("doc_id"), col("cosine").as("score"))
        TextOps.rrfFuse(bm, dense, "doc_id")
          .select(col("doc_id"), col("rank_a"), col("rank_b"),
            round(col("rrf"), 6).as("rrf"),
            (col("doc_id") % 5 === 0).cast("int").as("leaked"))
          .crossJoin(broadcast(recall))
          .orderBy("doc_id")
      }),

    QueryDef("q132_search_stream_admit",
      "STREAMING admission into the search serving layer, batch-replay " +
        "form (the q64 convention — the catalog runs the EXACT " +
        "foreachBatch core of DedupPipeline.searchIndexAdmitStream, " +
        "per-batch ids derived exactly as the stream derives them from " +
        "its checkpoint-stable batchId): the archive builds the BM25 " +
        "inverted index, two micro-batches of new documents admit " +
        "under journaled ids <prefix>-b0/-b1 (touched-bucket posting/" +
        "length merges + the 1-row stats fold riding the admit " +
        "journal), and batch 0 is then RE-DELIVERED under its own id — " +
        "the kill/restart recovery path: the journal must make the " +
        "replayed fold a no-op, or (N, avgdl) inflates and every " +
        "served score below drifts. Exact oracle: the post-stream " +
        "search equals DuckDB's direct BM25 over the full world — " +
        "hash-exact only if each batch's mass folded exactly once.",
      Some("""WITH lens AS (SELECT doc_id,
             |    len(regexp_extract_all(lower(text), '[a-z]+')) AS dl
             |  FROM documents),
             |stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             |    AVG(dl) AS avgdl FROM lens),
             |tok AS (SELECT doc_id,
             |    unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
             |  FROM documents),
             |tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM tok
             |  WHERE w IN ('vector', 'merge', 'stream') GROUP BY doc_id, w),
             |dfr AS (SELECT w, CAST(COUNT(*) AS DOUBLE) AS df
             |  FROM tf GROUP BY w)
             |SELECT tf.doc_id,
             |  ROUND(SUM(ln((n - df + 0.5) / (df + 0.5) + 1.0)
             |    * (tf * (1.2 + 1.0)
             |       / (tf + 1.2 * ((1.0 - 0.75) + 0.75 * (dl / avgdl))))), 6)
             |    AS score
             |FROM tf JOIN dfr USING (w) CROSS JOIN stats
             |  JOIN lens ON tf.doc_id = lens.doc_id
             |GROUP BY tf.doc_id ORDER BY tf.doc_id""".stripMargin),
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val sink = tempStore.freshSink(s, "searchstream", dir)
        SearchOps.invertedIndexBuild(docs.filter(col("doc_id") % 3 =!= 0),
          "doc_id", "text", sink)
        // two micro-batches, ids exactly as searchIndexAdmitStream
        // derives them from its checkpoint-stable batchId
        val prefix = "q132si"
        Seq(0, 1).foreach { b =>
          SearchOps.invertedIndexAdmit(
            docs.filter(col("doc_id") % 6 === b * 3L), "doc_id", "text",
            sink, admitId = Some(s"$prefix-b$b"))
        }
        // THE RE-DELIVERY (kill/restart): batch 0 under its own id —
        // the journal fences the fold, the merges converge by PK
        SearchOps.invertedIndexAdmit(
          docs.filter(col("doc_id") % 6 === 0), "doc_id", "text",
          sink, admitId = Some(s"$prefix-b0"))
        // snapshot-consistent serving read (the r16-verdict default)
        SearchOps.invertedIndexSearchSnapshot(
            Seq("vector", "merge", "stream"), sink) { served =>
          served.select(col("doc_id"), round(col("score"), 6).as("score"))
            .orderBy("doc_id")
            .localCheckpoint(true)
        }
      }),

    QueryDef("q133_ann_stream_admit",
      "STREAMING admission into the sharded ANN serving layer, batch-" +
        "replay form (the q132 convention — the catalog runs the EXACT " +
        "foreachBatch core of DedupPipeline.annIndexAdmitStream, " +
        "per-batch ids derived exactly as the stream derives them from " +
        "its checkpoint-stable batchId), closing the two serving " +
        "layers' lifecycle symmetry (r15 verdict #1). The sharded " +
        "IVF-PQ index is built ONCE per process over the full corpus " +
        "(the q131 amortization); each pass then runs the ingest round " +
        "trip: shardedIndexRemove evicts two vector cohorts, two " +
        "micro-batches stream them back under journaled ids " +
        "<prefix>-b0/-b1 (touched-bucket code+SQ8 merges in each " +
        "batch's home shards only), and batch 0 is RE-DELIVERED under " +
        "its own id — the kill/restart recovery path. The audit " +
        "columns make the replay's byte-freedom and the serving " +
        "quality measurable per row: replay_moved = shards whose " +
        "content-version pin moved on the re-delivery (must be 0 — " +
        "the journal fences every bucket the first delivery swapped), " +
        "recall_mil = the served top-k vs the exact full-world brute " +
        "ranking (ANN inside -> rows-only; CatalogSpec pins both).",
      None,
      (s, dir) => {
        val e = t(s, dir, "embeddings").select("vec_id", "embedding")
        val sink = tempStore.sink(s, "annstream", dir)
        // amortized build + the q131 marker protocol: a pass killed
        // inside its evict -> stream-back round trip leaves cohorts
        // out of the index — the marker detects it at O(1) file-probe
        // cost and the next pass rebuilds before serving short
        val openMarker = java.nio.file.Paths.get(sink.rootPath)
          .resolve("_graft_roundtrip_open")
        if (java.nio.file.Files.exists(openMarker) ||
            !SimOps.shardedIndexExists(s, sink))
          SimOps.buildShardedIvfPqIndex(e, "vec_id", "embedding", sink,
            shards = 2, nlist = 16, m = 8, ksub = 16, coarseIters = 1,
            storeSq8 = true)
        java.nio.file.Files.write(openMarker, Array.emptyByteArray)
        val pass = java.util.UUID.randomUUID().toString.take(8)
        val b0 = e.filter(col("vec_id") % 6 === 0)
        val b1 = e.filter(col("vec_id") % 6 === 3)
        // evict the two cohorts, then stream them back in
        SimOps.shardedIndexRemove(
          b0.unionByName(b1).select("vec_id"), "vec_id", sink,
          opId = Some(s"q133rm_$pass"))
        Seq(0 -> b0, 1 -> b1).foreach { case (b, batch) =>
          SimOps.shardedIndexAdd(batch, "vec_id", "embedding", sink,
            opId = Some(s"q133ai_$pass-b$b"))
        }
        // THE RE-DELIVERY (kill/restart): batch 0 under its own id —
        // every bucket the first delivery swapped is fenced, so the
        // replay is byte-free and no shard's version pin moves
        val versBefore = SimOps.shardedIndexVersions(s, sink)
        SimOps.shardedIndexAdd(b0, "vec_id", "embedding", sink,
          opId = Some(s"q133ai_$pass-b0"))
        val versAfter = SimOps.shardedIndexVersions(s, sink)
        val moved = versBefore.count { case (sh, v) =>
          versAfter.get(sh).forall(_ != v)
        }
        // ingest round trip complete: every cohort is back in its shard
        java.nio.file.Files.deleteIfExists(openMarker)
        // serve from the restored index; exact full-world ranking is
        // the AUDIT ONLY (the q131 pattern — never on the serving path).
        // Checkpointed: one probe materialization feeds BOTH the recall
        // audit and the output rows
        val q = e.filter(col("vec_id") === 1L)
        val probed = SimOps.shardedProbeIndexSnapshot(q, "vec_id",
            "embedding", sink, k = 100, nprobe = 12) {
          _.localCheckpoint(true)
        }
        val exact = SimOps.bruteForceTopK(q, e, "vec_id", "embedding", 100)
        val recall = SimOps.withRecallAudit(probed, exact, 100)
          .agg(max(col("recall_mil")).as("recall_mil"))
        probed
          .select(col("neighbor_id"), round(col("cosine"), 6).as("cosine"),
            col("rank"))
          .withColumn("replay_moved", lit(moved))
          .crossJoin(broadcast(recall))
          .orderBy("rank", "neighbor_id")
      }),

    QueryDef("q136_erasure_stream",
      "STREAMING right-to-erasure, batch-replay form (the q132/q133 " +
        "convention — the catalog runs the EXACT foreachBatch core of " +
        "DedupPipeline.erasureSweepStream, sweep ids derived exactly " +
        "as the stream derives them from its checkpoint-stable " +
        "batchId): the GDPR request queue is a stream in production, " +
        "and this arc is its terminal. The archive (the even fixture " +
        "slice) builds the BM25 index; two micro-batches of erasure " +
        "requests sweep the subjects out under ledger-receipted ids " +
        "<prefix>-b0/-b1 (pending/final receipts, matched-row counts, " +
        "erasure-journaled data phases); batch 0 is then RE-DELIVERED " +
        "under its own id — the kill/restart recovery path: the " +
        "journal must make the replayed decrements byte-free no-ops " +
        "and the finalized receipts must survive untouched, or " +
        "(N, avgdl) deflates and every served score below drifts. " +
        "Exact oracle: the post-stream search equals DuckDB's direct " +
        "BM25 over the SURVIVING world — hash-exact only if each " +
        "batch's mass left exactly once.",
      Some("""WITH surv AS (SELECT * FROM documents
             |  WHERE doc_id % 2 = 0 AND doc_id % 6 <> 0),
             |lens AS (SELECT doc_id,
             |    len(regexp_extract_all(lower(text), '[a-z]+')) AS dl
             |  FROM surv),
             |stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             |    AVG(dl) AS avgdl FROM lens),
             |tok AS (SELECT doc_id,
             |    unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
             |  FROM surv),
             |tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM tok
             |  WHERE w IN ('vector', 'merge', 'stream') GROUP BY doc_id, w),
             |dfr AS (SELECT w, CAST(COUNT(*) AS DOUBLE) AS df
             |  FROM tf GROUP BY w)
             |SELECT tf.doc_id,
             |  ROUND(SUM(ln((n - df + 0.5) / (df + 0.5) + 1.0)
             |    * (tf * (1.2 + 1.0)
             |       / (tf + 1.2 * ((1.0 - 0.75) + 0.75 * (dl / avgdl))))), 6)
             |    AS score
             |FROM tf JOIN dfr USING (w) CROSS JOIN stats
             |  JOIN lens ON tf.doc_id = lens.doc_id
             |GROUP BY tf.doc_id ORDER BY tf.doc_id""".stripMargin),
      (s, dir) => {
        // fixture corpus = the even slice: the claim under test is the
        // STREAM core's exactly-once sweep replay, not sweep cost at
        // corpus scale (q123 prices that) — the slice keeps the three
        // fixture sweeps cheap while the oracle stays hash-exact
        val docs = t(s, dir, "documents").filter(col("doc_id") % 2 === 0)
        val sink = tempStore.freshSink(s, "erasestream", dir)
        // one serving-layer member keeps the fixture lean (q123 prices
        // the wide sweep; DedupPipelineSpec's kill/restart covers the
        // fingerprint member through the same stream core)
        SearchOps.invertedIndexBuild(docs, "doc_id", "text", sink)
        // two erasure-request micro-batches, sweep ids exactly as
        // erasureSweepStream derives them from its batchId
        val prefix = "q136er"
        Seq(0, 1).foreach { b =>
          EraseOps.eraseSubjects(docs.filter(col("doc_id") % 12 === b * 6L),
            "doc_id", "text", sink, sweepId = s"$prefix-b$b")
        }
        // THE RE-DELIVERY (kill/restart): batch 0 under its own sweep
        // id — the erasure journal fences the data phases, the
        // finalized receipt wins exactly once
        EraseOps.eraseSubjects(docs.filter(col("doc_id") % 12 === 0),
          "doc_id", "text", sink, sweepId = s"$prefix-b0")
        // snapshot-consistent serving read (the r16-verdict default)
        SearchOps.invertedIndexSearchSnapshot(
            Seq("vector", "merge", "stream"), sink) { served =>
          served.select(col("doc_id"), round(col("score"), 6).as("score"))
            .orderBy("doc_id")
            .localCheckpoint(true)
        }
      }),

    QueryDef("q134_ledger_audit",
      "AUDIT surface over the erasure ledger (r15 verdict, Missing #2): " +
        "EraseOps.pendingSweeps answers the compliance reader's first " +
        "question — which sweeps are STUCK (pending receipt rows whose " +
        "final receipt never landed, i.e. a sweep that durably declared " +
        "intent and crashed before finalizing)? Fixture: the BM25 index " +
        "builds over the doc_id%3=0 corpus slice; one sweep " +
        "COMPLETES (its finalized receipts must not surface); a second " +
        "sweep runs and its receipts are rolled back to their pending " +
        "form on disk — byte-for-byte the state a crash between the " +
        "data commit and the final receipt merge leaves behind (the " +
        "StoreRetractSpec crash-reconstruction convention), so the " +
        "stuck rows carry REAL pre-counted receipt figures. Exact " +
        "oracle: DuckDB re-derives every figure from the corpus — " +
        "subjects (distinct stuck ids), matched doclens rows, matched " +
        "(term, doc) posting keys, the stats (count + token-sum) " +
        "decrement. Fixture corpus = the doc_id%3=0 slice: the claim " +
        "under test is the AUDIT OP's semantics, not sweep cost (q123 " +
        "prices sweeps) — the slice keeps the two fixture sweeps cheap.",
      Some("""WITH corp AS (SELECT * FROM documents WHERE doc_id % 3 = 0),
             |surv AS (SELECT * FROM corp WHERE doc_id % 5 <> 0),
             |stuck AS (SELECT doc_id,
             |    regexp_extract_all(lower(text), '[a-z]+') AS toks
             |  FROM surv WHERE doc_id % 7 = 1),
             |lens AS (SELECT doc_id, len(toks) AS dl FROM stuck),
             |tok AS (SELECT DISTINCT doc_id, unnest(toks) AS w FROM stuck)
             |SELECT * FROM (
             |  SELECT 'q134_stuck' AS sweep_id,
             |    'bm25_doclens' AS member_table,
             |    (SELECT COUNT(*) FROM stuck) AS subjects,
             |    (SELECT COUNT(*) FROM lens) AS removed
             |  UNION ALL
             |  SELECT 'q134_stuck', 'bm25_postings',
             |    (SELECT COUNT(*) FROM stuck),
             |    (SELECT COUNT(*) FROM tok)
             |  UNION ALL
             |  SELECT 'q134_stuck', 'bm25_stats',
             |    (SELECT COUNT(*) FROM stuck),
             |    (SELECT CAST(COUNT(*) + SUM(dl) AS BIGINT) FROM lens)
             |) ORDER BY member_table""".stripMargin),
      (s, dir) => {
        val docs = t(s, dir, "documents").filter(col("doc_id") % 3 === 0)
        val sink = tempStore.freshSink(s, "ledgeraudit", dir)
        SearchOps.invertedIndexBuild(docs, "doc_id", "text", sink)
        // a COMPLETED sweep: finalized receipts must NOT surface
        EraseOps.eraseSubjects(docs.filter(col("doc_id") % 5 === 0),
          "doc_id", "text", sink, sweepId = "q134_done")
        // THE CRASH STATE, reconstructed on disk: run the second sweep
        // for real, then roll its final receipts back to their pending
        // form — byte-for-byte the state a crash between the data
        // commit and the final receipt merge leaves behind, with the
        // REAL pre-counted figures intact
        val stuck = docs.filter(col("doc_id") % 5 =!= 0 &&
          col("doc_id") % 7 === 1)
        EraseOps.eraseSubjects(stuck, "doc_id", "text", sink,
          sweepId = "q134_stuck")
        val pending = sink.read(EraseOps.LedgerTable)
          .filter(col("sweep_id") === "q134_stuck")
          .withColumn("action", lit(EraseOps.LedgerPending))
          .withColumn("ver_after", lit(0L))
          .localCheckpoint(true)
        sink.merge(EraseOps.LedgerTable, pending,
          Seq("sweep_id", "member_table"), pkUnique = true)
        EraseOps.pendingSweeps(sink)
          .select(col("sweep_id"), col("member_table"), col("subjects"),
            col("removed"))
          .orderBy("member_table")
      }),

    QueryDef("q135_ann_hybrid_batch",
      "q131's index-only hybrid serving composition driven by a QUERY " +
        "BATCH (r15 verdict #7): the 100x posture claim is PER-QUERY " +
        "cost, so N query vectors ride ONE plan through the same " +
        "serving path — the sharded ANN probe broadcasts the whole " +
        "query batch into every shard's list-bounded ADC shortlist + " +
        "SQ8 refine (broadcastQueries — per-shard work is one " +
        "broadcast-hash-join pass regardless of N), the per-shard " +
        "top-k unions re-rank per query_id through one bounded " +
        "TopKAggregate, and each query's dense ranking RRF-fuses with " +
        "the shared served-BM25 lexical ranking. Serves the FULL " +
        "corpus (build amortized with q133's sink; no sweep — the " +
        "erasure arc is q131's claim), so the per-pass cost IS the " +
        "batch serving cost; both serving reads are snapshot-" +
        "consistent (the r16-verdict default). ANN inside -> " +
        "rows-only; recall_mil " +
        "rides every row as the MINIMUM per-query recall vs the exact " +
        "brute top-k of the same batch (one audit-only pass off the " +
        "serving path); PlanShapeSpec pins the batch composition " +
        "corpus-scan-free, exactly like q131's single-query pin.",
      None,
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val e = t(s, dir, "embeddings").select("vec_id", "embedding")
        val sink = tempStore.sink(s, "annstream", dir)
        // shares q133's sink and marker: a q133 pass killed mid-round-
        // trip left cohorts out — rebuild to the full world and clear
        // the marker (no mutation is in flight; the catalog is
        // single-threaded). The BM25 layer here never mutates after
        // its build, so existence is its whole consistency check
        val openMarker = java.nio.file.Paths.get(sink.rootPath)
          .resolve("_graft_roundtrip_open")
        if (java.nio.file.Files.exists(openMarker) ||
            !SimOps.shardedIndexExists(s, sink)) {
          SimOps.buildShardedIvfPqIndex(e, "vec_id", "embedding", sink,
            shards = 2, nlist = 16, m = 8, ksub = 16, coarseIters = 1,
            storeSq8 = true)
          java.nio.file.Files.deleteIfExists(openMarker)
        }
        if (!SearchOps.invertedIndexExists(sink))
          SearchOps.invertedIndexBuild(docs, "doc_id", "text", sink)
        // the query BATCH: a deterministic cohort, broadcast once into
        // every shard's probe
        val qs = e.filter(col("vec_id") % 97 === 1)
        // the two serving reads are independent (disjoint table groups,
        // both snapshot-pinned, no live writer) — overlapped (§2.6):
        // dense side the sharded snapshot probe; lexical side ONE
        // served-BM25 ranking shared by every query (terms are the
        // request's; the dense side is what the batch varies — q138 is
        // the per-query-terms form) — the q131 scoring path, 6-dp
        // rounded before ranking, snapshot read
        val serving = graft.ops.Par.map(Seq[() => DataFrame](
          () => SimOps.shardedProbeIndexSnapshot(qs, "vec_id",
              "embedding", sink, k = 50, nprobe = 12) {
            _.localCheckpoint(true)
          },
          () => SearchOps.invertedIndexSearchSnapshot(
              Seq("vector", "merge", "stream"), sink) { served =>
            served.select(col("doc_id"), round(col("score"), 6).as("score"))
              .localCheckpoint(true)
          }))(_())
        val (probed, bm) = (serving(0), serving(1))
        // AUDIT ONLY: exact brute top-k for the same batch; the audit
        // column is the batch's WORST per-query recall
        val exact = SimOps.bruteForceTopK(qs, e, "vec_id", "embedding", 50)
        val recall = SimOps.withRecallAudit(probed, exact, 50)
          .agg(min(col("recall_mil")).as("recall_mil"))
        // per-query RRF against the ONE shared lexical ranking — the
        // rrfFuse convention's batch form (one implementation, shared
        // with the PlanShapeSpec pin)
        TextOps.rrfFuseBatch(bm,
            probed.select(col("query_id"),
              col("neighbor_id").as("doc_id"), col("cosine").as("score")),
            "doc_id", "query_id")
          .select(col("query_id"), col("doc_id"), col("rank_a"),
            col("rank_b"), round(col("rrf"), 6).as("rrf"))
          .crossJoin(broadcast(recall))
          .orderBy("query_id", "doc_id")
      }),

    QueryDef("q137_bm25_batch",
      "PER-QUERY-TERMS batch lexical serving (r16 verdict \"What's " +
        "wrong #1\" closed): N queries, each with ITS OWN term set, " +
        "score through one shared postings read — the union of every " +
        "query's terms pushes into the scan as one parquet In " +
        "predicate, per-term document frequencies aggregate once (df " +
        "is corpus-global), and one broadcast (query, term) join " +
        "replicates each matching posting to exactly the queries that " +
        "asked — never N looped single-query plans (PlanShapeSpec " +
        "pins the posting scan count at 2 — the tf side + the df " +
        "aggregate, CONSTANT in N, where the loop would pay 2N). " +
        "Served through the " +
        "snapshot-consistent read (the shipped default). Exact " +
        "oracle: per-query scores equal DuckDB's direct BM25 over " +
        "the same corpus restricted to each query's term set — the " +
        "q87/q129 parity, now per query.",
      Some("""WITH req(query_id, w) AS (VALUES
             |    (CAST(0 AS BIGINT), 'vector'), (0, 'merge'),
             |    (1, 'stream'), (1, 'join'),
             |    (2, 'hash'), (2, 'scan'), (2, 'filter'),
             |    (3, 'vector'), (3, 'stream')),
             |lens AS (SELECT doc_id,
             |    len(regexp_extract_all(lower(text), '[a-z]+')) AS dl
             |  FROM documents),
             |stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             |    AVG(dl) AS avgdl FROM lens),
             |tok AS (SELECT doc_id,
             |    unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
             |  FROM documents),
             |tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM tok
             |  WHERE w IN (SELECT DISTINCT w FROM req) GROUP BY doc_id, w),
             |dfr AS (SELECT w, CAST(COUNT(*) AS DOUBLE) AS df
             |  FROM tf GROUP BY w)
             |SELECT req.query_id, tf.doc_id,
             |  ROUND(SUM(ln((n - df + 0.5) / (df + 0.5) + 1.0)
             |    * (tf * (1.2 + 1.0)
             |       / (tf + 1.2 * ((1.0 - 0.75) + 0.75 * (dl / avgdl))))), 6)
             |    AS score
             |FROM tf JOIN dfr USING (w) JOIN req USING (w)
             |  CROSS JOIN stats JOIN lens ON tf.doc_id = lens.doc_id
             |GROUP BY req.query_id, tf.doc_id
             |ORDER BY req.query_id, tf.doc_id""".stripMargin),
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents")
        // build amortized: the index never mutates here (lifecycle
        // costs are q129/q132/q136's claims — this row prices the
        // BATCH SERVING read alone)
        val sink = tempStore.sink(s, "searchbatch", dir)
        if (!SearchOps.invertedIndexExists(sink))
          SearchOps.invertedIndexBuild(docs, "doc_id", "text", sink)
        // the request payload: per-query term sets, one row per
        // (query, term) — exactly the serving API's input shape
        val req = Seq(
          0L -> "vector", 0L -> "merge",
          1L -> "stream", 1L -> "join",
          2L -> "hash", 2L -> "scan", 2L -> "filter",
          3L -> "vector", 3L -> "stream").toDF("query_id", "w")
        SearchOps.invertedIndexSearchBatchSnapshot(req, sink) { served =>
          served.select(col("query_id"), col("doc_id"),
              round(col("score"), 6).as("score"))
            .orderBy("query_id", "doc_id")
            .localCheckpoint(true)
        }
      }),

    QueryDef("q138_hybrid_batch_paired",
      "FULL-DUPLEX batch hybrid serving — the q135 composition with " +
        "the lexical side now per-query too (r16 verdict \"What's " +
        "wrong #1\"): N (terms, vector) request pairs ride ONE plan " +
        "per side — the dense rankings through the sharded snapshot " +
        "probe (whole batch broadcast into every shard's list-bounded " +
        "ADC + SQ8 refine), the lexical rankings through " +
        "invertedIndexSearchBatch's single pushed-predicate postings " +
        "scan (q137's op), and each query's two rankings RRF-fuse " +
        "per (query, doc) via rrfFusePerQuery. Serves the full " +
        "corpus from q133's amortized sink; per-query term sets " +
        "derive deterministically from the query id (three fixed " +
        "variants). ANN inside -> rows-only; recall_mil = the " +
        "batch's WORST per-query dense recall vs the exact brute " +
        "top-k (audit-only pass, off the serving path); PlanShapeSpec " +
        "pins the whole fused composition corpus-scan-free with ONE " +
        "postings scan.",
      None,
      (s, dir) => {
        val e = t(s, dir, "embeddings").select("vec_id", "embedding")
        val docs = t(s, dir, "documents")
        // q133/q135's sink and marker discipline (amortized builds)
        val sink = tempStore.sink(s, "annstream", dir)
        val openMarker = java.nio.file.Paths.get(sink.rootPath)
          .resolve("_graft_roundtrip_open")
        if (java.nio.file.Files.exists(openMarker) ||
            !SimOps.shardedIndexExists(s, sink)) {
          SimOps.buildShardedIvfPqIndex(e, "vec_id", "embedding", sink,
            shards = 2, nlist = 16, m = 8, ksub = 16, coarseIters = 1,
            storeSq8 = true)
          java.nio.file.Files.deleteIfExists(openMarker)
        }
        if (!SearchOps.invertedIndexExists(sink))
          SearchOps.invertedIndexBuild(docs, "doc_id", "text", sink)
        val qs = e.filter(col("vec_id") % 97 === 1)
        // per-query term sets, derived deterministically from the id:
        // the request payload a real batch endpoint would carry
        val termsOf = when(col("vec_id") % 3 === 0,
            array(lit("vector"), lit("merge")))
          .when(col("vec_id") % 3 === 1, array(lit("stream"), lit("join")))
          .otherwise(array(lit("hash"), lit("scan"), lit("filter")))
        val req = qs.select(col("vec_id").as("query_id"),
          explode(termsOf).as("w"))
        // independent snapshot serving reads (disjoint table groups) —
        // overlapped (guide §2.6)
        val serving = graft.ops.Par.map(Seq[() => DataFrame](
          () => SimOps.shardedProbeIndexSnapshot(qs, "vec_id",
              "embedding", sink, k = 50, nprobe = 12) {
            _.localCheckpoint(true)
          },
          () => SearchOps.invertedIndexSearchBatchSnapshot(req, sink) {
            served => served.select(col("query_id"), col("doc_id"),
                round(col("score"), 6).as("score"))
              .localCheckpoint(true)
          }))(_())
        val (probed, bm) = (serving(0), serving(1))
        // AUDIT ONLY: worst per-query dense recall (q135 convention)
        val exact = SimOps.bruteForceTopK(qs, e, "vec_id", "embedding", 50)
        val recall = SimOps.withRecallAudit(probed, exact, 50)
          .agg(min(col("recall_mil")).as("recall_mil"))
        TextOps.rrfFusePerQuery(bm,
            probed.select(col("query_id"),
              col("neighbor_id").as("doc_id"), col("cosine").as("score")),
            "doc_id", "query_id")
          .select(col("query_id"), col("doc_id"), col("rank_a"),
            col("rank_b"), round(col("rrf"), 6).as("rrf"))
          .crossJoin(broadcast(recall))
          .orderBy("query_id", "doc_id")
      }),

    QueryDef("q139_erasure_stream_ann",
      "STREAMING right-to-erasure with an EMBEDDING-KEYED member in " +
        "the sweep (r16 verdict, Missing #2 — the one streaming " +
        "contract with zero coverage): the q136 batch-replay form " +
        "over a sink holding BOTH serving layers (the BM25 inverted " +
        "index and the sharded IVF-PQ ANN index), so every per-batch " +
        "sweep must derive the subjects' vector ids from the raw " +
        "batch exactly as erasureSweepStream's vecIds hook does " +
        "(batch in, ids out). Two erasure micro-batches sweep under " +
        "checkpoint-stable ids <prefix>-b0/-b1 (ledger receipts, " +
        "per-shard erasure journals), then batch 0 RE-DELIVERS under " +
        "its own id — replayed decrements must be byte-free no-ops " +
        "in BOTH layers. ANN inside -> rows-only with the audit " +
        "columns carrying the compliance claim: the post-stream " +
        "snapshot probe's neighbors with leaked = served-an-erased-" +
        "subject (must be 0 on every row), stuck = pendingSweeps " +
        "rows after the stream (must be 0 — every sweep finalized), " +
        "recall_mil vs the exact brute top-k over the SURVIVING " +
        "vectors (CatalogSpec pins all three).",
      None,
      (s, dir) => {
        import s.implicits._
        // the even fixture slice (the q136 convention: the claim is
        // the stream core's exactly-once sweep over both layers, not
        // sweep cost at corpus scale — q123 prices that)
        val docs = t(s, dir, "documents").filter(col("doc_id") % 2 === 0)
        val e = t(s, dir, "embeddings")
          .filter(col("vec_id") % 2 === 0).select("vec_id", "embedding")
        val sink = tempStore.freshSink(s, "erasestreamann", dir)
        // the two serving layers are independent table groups — build
        // them overlapped (guide §2.6)
        graft.ops.Par.run(Seq(
          () => SearchOps.invertedIndexBuild(docs, "doc_id", "text", sink),
          () => SimOps.buildShardedIvfPqIndex(e, "vec_id", "embedding",
            sink, shards = 2, nlist = 8, m = 8, ksub = 16, coarseIters = 1,
            storeSq8 = true)))
        // two erasure-request micro-batches; the vecIds derivation is
        // the stream hook's contract — raw batch in, vector ids out
        // (id-keyed convention: a subject's vector shares its id; a
        // subject with no vector routes to an absent key, which the
        // removal counts as matched-nothing)
        val prefix = "q139er"
        def vecIdsOf(batch: DataFrame): DataFrame =
          batch.select(col("doc_id").as("vec_id"))
        Seq(0, 1).foreach { b =>
          val batch = docs.filter(col("doc_id") % 12 === b * 6L)
          EraseOps.eraseSubjects(batch, "doc_id", "text", sink,
            sweepId = s"$prefix-b$b", vecIds = Some(vecIdsOf(batch)))
        }
        // THE RE-DELIVERY (kill/restart): batch 0 under its own sweep
        // id — the erasure journal fences the data phases in BOTH
        // layers (per-shard journals on the ANN side), the finalized
        // receipts win exactly once
        val b0 = docs.filter(col("doc_id") % 12 === 0)
        EraseOps.eraseSubjects(b0, "doc_id", "text", sink,
          sweepId = s"$prefix-b0", vecIds = Some(vecIdsOf(b0)))
        val stuck = EraseOps.pendingSweeps(sink).count()
        // serve from the swept index (snapshot probe — the serving
        // default); a surviving query vector, fresh id (self-match
        // exclusion convention)
        val qVec = e.filter(col("vec_id") === 2L)
          .select(col("embedding")).as[Array[Float]].head()
        val q = Seq((999999999L, qVec)).toDF("vec_id", "embedding")
        val probed = SimOps.shardedProbeIndexSnapshot(q, "vec_id",
            "embedding", sink, k = 20, nprobe = 12) {
          _.localCheckpoint(true)
        }
        val survivors = e.filter(col("vec_id") % 6 =!= 0)
        val exact = SimOps.bruteForceTopK(q, survivors, "vec_id",
          "embedding", 20)
        val recall = SimOps.withRecallAudit(probed, exact, 20)
          .agg(max(col("recall_mil")).as("recall_mil"))
        probed
          .select(col("neighbor_id"), round(col("cosine"), 6).as("cosine"),
            col("rank"))
          .withColumn("leaked",
            (col("neighbor_id") % 6 === 0).cast("int"))
          .withColumn("stuck", lit(stuck))
          .crossJoin(broadcast(recall))
          .orderBy("rank", "neighbor_id")
      }),

    QueryDef("q140_duplex_replay",
      "FULL-DUPLEX serving-sink lifecycle, batch-replay form (the " +
        "q132/q136 convention — the catalog runs the EXACT foreachBatch " +
        "cores of searchIndexAdmitStream AND erasureSweepStream, " +
        "interleaved against ONE sink, ids derived exactly as each " +
        "stream derives them from its checkpoint-stable batchId): the " +
        "production topology is both arcs racing the same index — new " +
        "documents admitting while GDPR requests erase old ones — and " +
        "this row makes the convergence claim DRIVER-CHECKED every " +
        "round. Sequence: admit b0, sweep b0, admit b1, RE-DELIVER " +
        "admit b0 (its journal must skip the guard AND the additive " +
        "stats fold — the admitted cohort's mass folds once), sweep " +
        "b1, RE-DELIVER sweep b0 (its journal must no-op the data " +
        "phases — the erased cohort's mass leaves once). Exact oracle: " +
        "the post-duplex search equals DuckDB's direct BM25 over the " +
        "sequential world (archive minus both erased cohorts, plus " +
        "both admitted batches) — hash-exact only if every batch's " +
        "mass moved exactly once through the interleaving.",
      Some("""WITH world AS (SELECT * FROM documents
             |  WHERE (doc_id % 3 <> 0 AND doc_id % 5 NOT IN (0, 1))
             |     OR doc_id % 3 = 0),
             |lens AS (SELECT doc_id,
             |    len(regexp_extract_all(lower(text), '[a-z]+')) AS dl
             |  FROM world),
             |stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             |    AVG(dl) AS avgdl FROM lens),
             |tok AS (SELECT doc_id,
             |    unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
             |  FROM world),
             |tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM tok
             |  WHERE w IN ('vector', 'merge', 'stream') GROUP BY doc_id, w),
             |dfr AS (SELECT w, CAST(COUNT(*) AS DOUBLE) AS df
             |  FROM tf GROUP BY w)
             |SELECT tf.doc_id,
             |  ROUND(SUM(ln((n - df + 0.5) / (df + 0.5) + 1.0)
             |    * (tf * (1.2 + 1.0)
             |       / (tf + 1.2 * ((1.0 - 0.75) + 0.75 * (dl / avgdl))))), 6)
             |    AS score
             |FROM tf JOIN dfr USING (w) CROSS JOIN stats
             |  JOIN lens ON tf.doc_id = lens.doc_id
             |GROUP BY tf.doc_id ORDER BY tf.doc_id""".stripMargin),
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val sink = tempStore.freshSink(s, "duplex", dir)
        // archive = the %3<>0 slice; admits bring the %3=0 ids (always
        // disjoint from every erase cohort, so the sequential result is
        // interleaving-free); erasures take archive cohorts
        val archive = docs.filter(col("doc_id") % 3 =!= 0)
        SearchOps.invertedIndexBuild(archive, "doc_id", "text", sink)
        val admitB = Seq(0, 1).map(b =>
          docs.filter(col("doc_id") % 6 === b * 3L))
        val eraseB = Seq(0, 1).map(b =>
          archive.filter(col("doc_id") % 5 === b.toLong))
        def admit(b: Int): Unit =
          SearchOps.invertedIndexAdmit(admitB(b), "doc_id", "text", sink,
            admitId = Some(s"q140ad-b$b"))
        def sweep(b: Int): Unit = {
          EraseOps.eraseSubjects(eraseB(b), "doc_id", "text", sink,
            sweepId = s"q140er-b$b")
          ()
        }
        // the interleaving, both recovery paths exercised mid-stream
        admit(0); sweep(0); admit(1)
        admit(0) // RE-DELIVERY: the admit journal fences guard + fold
        sweep(1)
        sweep(0) // RE-DELIVERY: the erasure journal no-ops the phases
        // snapshot-consistent serving read (the r16-verdict default)
        SearchOps.invertedIndexSearchSnapshot(
            Seq("vector", "merge", "stream"), sink) { served =>
          served.select(col("doc_id"), round(col("score"), 6).as("score"))
            .orderBy("doc_id")
            .localCheckpoint(true)
        }
      })
  )
}
