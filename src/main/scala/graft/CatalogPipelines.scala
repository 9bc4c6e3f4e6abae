package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{MinHashFunctions, WinnowFunctions}
import graft.ops.{BpeOps, ChatOps, ClassifierOps, GraphOps, MultimodalOps, RelOps, SampleOps, SelectOps, SimOps, TextOps, WebOps}

/** Training-data pipeline operators, first arc (q36-q79). */
private[graft] trait CatalogPipelines extends CatalogShared {

  // ---------------------------------------------------------------------
  // Serving-side analytics beyond the reference's own surface
  // ---------------------------------------------------------------------

  val pipelines: Seq[QueryDef] = Seq(

    QueryDef("q36_quantiles",
      "Exact percentiles per group (linear interpolation — identical " +
        "definition in Spark `percentile` and DuckDB `quantile_cont`).",
      Some("""SELECT event_type,
             |  round(quantile_cont(CAST(value AS DOUBLE), 0.5), 6) AS p50,
             |  round(quantile_cont(CAST(value AS DOUBLE), 0.9), 6) AS p90,
             |  count(*) AS n
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),
      (s, dir) => t(s, dir, "events")
        .groupBy("event_type")
        .agg(
          round(expr("percentile(CAST(value AS DOUBLE), 0.5)"), 6).as("p50"),
          round(expr("percentile(CAST(value AS DOUBLE), 0.9)"), 6).as("p90"),
          count(lit(1)).as("n"))
        .orderBy("event_type")),

    QueryDef("q37_sessionize",
      "Gap-based sessionization (30-min inactivity) via window functions — " +
        "integer epoch arithmetic so both engines agree exactly.",
      Some("""WITH e AS (SELECT user_id, event_id, ts,
             |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
             |  FROM events),
             |f AS (SELECT user_id, event_id, ts,
             |    CASE WHEN prev_ts IS NULL
             |           OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
             |         THEN 1 ELSE 0 END AS is_new
             |  FROM e),
             |s AS (SELECT user_id, event_id,
             |    CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |                           ROWS UNBOUNDED PRECEDING) AS BIGINT)
             |      AS session_no
             |  FROM f)
             |SELECT user_id, session_no, count(*) AS n_events
             |FROM s GROUP BY user_id, session_no
             |ORDER BY user_id, session_no""".stripMargin),
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        t(s, dir, "events")
          .withColumn("prev_us", lag(RelOps.epochUs(col("ts")), 1).over(w))
          .withColumn("is_new",
            when(col("prev_us").isNull
              || RelOps.epochUs(col("ts")) - col("prev_us") > 1800000000L, 1L)
              .otherwise(0L))
          .withColumn("session_no",
            sum(col("is_new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
          .groupBy("user_id", "session_no")
          .agg(count(lit(1)).as("n_events"))
          .orderBy("user_id", "session_no")
      }),

    QueryDef("q38_ngram_topk",
      "Corpus n-gram statistics: top-20 trigram shingles by document " +
        "frequency (explode -> count -> top-k).",
      Some("""WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS w
             |  FROM documents),
             |g AS (SELECT doc_id,
             |    unnest(list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
             |                          for i in range(1, len(w) - 1)])) AS s
             |  FROM t WHERE len(w) >= 3)
             |SELECT s AS shingle, count(*) AS df FROM g
             |GROUP BY s ORDER BY df DESC, shingle LIMIT 20""".stripMargin),
      (s, dir) => t(s, dir, "documents")
        .filter(size(TextOps.tokens(col("text"))) >= 3)
        .select(explode(TextOps.shingles(col("text"), 3)).as("shingle"))
        .groupBy("shingle").agg(count(lit(1)).as("df"))
        .orderBy(col("df").desc, col("shingle")).limit(20)),

    QueryDef("q39_dedup_apply",
      "End-to-end dedup application: drop every document that near-" +
        "duplicates (3-gram jaccard >= 0.5) a lower-id keeper — the " +
        "cleaned-corpus anti-join a training pipeline actually ships.",
      Some("""WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS w
             |  FROM documents),
             |sh AS (SELECT doc_id, CASE WHEN len(w) < 3
             |    THEN [array_to_string(w, ' ')]
             |    ELSE list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
             |                        for i in range(1, len(w) - 1)]) END AS s
             |  FROM toks),
             |dupes AS (SELECT DISTINCT b.doc_id AS dup_id
             |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
             |  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
             |      / len(list_distinct(list_concat(a.s, b.s))) >= 0.5)
             |SELECT d.doc_id, d.lang, d.n_chars FROM documents d
             |WHERE NOT EXISTS (SELECT 1 FROM dupes WHERE dup_id = d.doc_id)
             |ORDER BY d.doc_id""".stripMargin),
      (s, dir) => {
        val pairs = Catalog.byName("q29_dedup_minhash").fn(s, dir) // LSH + exact verify
        val dupIds = pairs.select(col("b_id").as("doc_id")).distinct()
        RelOps.antiJoin(t(s, dir, "documents"), dupIds, Seq("doc_id"))
          .select("doc_id", "lang", "n_chars")
          .orderBy("doc_id")
      }),

    QueryDef("q40_quality_gate",
      "Quality gating: per-language doc counts surviving the quality " +
        "threshold with agreeing language-ID — the composed text-pipeline " +
        "filter stage.",
      Some {
        val (hitExprs, maxExpr, nWin, firstWin) = sqlLangPieces
        s"""WITH h AS (SELECT doc_id, lang, length(text) AS chars, $hitExprs
           |  FROM documents),
           |m AS (SELECT *, $maxExpr AS mx FROM h),
           |g AS (SELECT doc_id, lang, chars, CASE WHEN mx = 0 OR ($nWin) > 1
           |    THEN 'und' ELSE ($firstWin) END AS guess
           |  FROM m)
           |SELECT lang, count(*) AS n_docs,
           |  CAST(sum(chars) AS BIGINT) AS total_chars
           |FROM g WHERE chars >= 150 AND guess = 'en'
           |GROUP BY lang ORDER BY lang""".stripMargin
      },
      (s, dir) => t(s, dir, "documents")
        .withColumn("chars", length(col("text")))
        .withColumn("guess", TextOps.langId(col("text")))
        .filter(col("chars") >= 150 && col("guess") === "en")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("chars")).cast("long").as("total_chars"))
        .orderBy("lang")),

    QueryDef("q41_embed_neardup_lsh",
      "DEFAULT embedding near-dup op: LSH candidate generation (equi-join " +
        "on (table, signature) buckets — no all-pairs join anywhere) + " +
        "exact cosine verify. Oracle: the same exhaustive SQL as q33 — " +
        "candidate recall is 1.0 on this data (params tuned for the weak " +
        "0.45-cosine regime), so results match the all-pairs baseline " +
        "bit-for-bit.",
      Some(s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
             |p AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id,
             |    ${sqlCosine("a.embedding", "b.embedding")} AS c
             |  FROM e a JOIN e b ON a.vec_id < b.vec_id)
             |SELECT a_id, b_id, round(c, 6) AS cosine FROM p
             |WHERE round(c, 6) >= 0.45 ORDER BY a_id, b_id""".stripMargin),
      (s, dir) => SimOps.lshNearDupPairs(
          t(s, dir, "embeddings"), "vec_id", "embedding", 0.45)
        .orderBy("a_id", "b_id")),

    QueryDef("q42_ann_ivf",
      "ANN scale path #2: IVF-FLAT — deterministic sampled coarse " +
        "quantizer, inverted-list assignment, nprobe-list exact re-rank. " +
        "Approximate by design -> no SQL oracle (driver rows-only check); " +
        "recall vs the exact baseline is asserted in SimOpsSpec.",
      None,
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val q = e.filter(col("vec_id") % 100 === 0)
        SimOps.withRecallAudit(
            SimOps.ivfTopK(q, e, "vec_id", "embedding", 5,
              nlist = 16, nprobe = 6),
            SimOps.bruteForceTopK(q, e, "vec_id", "embedding", 5), 5)
          .orderBy("query_id", "rank")
      }),

    QueryDef("q43_winnow_fp",
      "Rolling-hash document fingerprints (MOSS winnowing): Rabin-Karp " +
        "8-gram hashes over the canonical char stream, min of each " +
        "4-window, distinct. The mod-prime fold is reproduced exactly by " +
        "the SQL oracle; summarized to scalars per doc.",
      Some(s"""$winnowFpsCte
             |SELECT doc_id, len(fps) AS n_fp, fps[1] AS fp_first,
             |  fps[len(fps)] AS fp_last, CAST(list_sum(fps) AS BIGINT) AS fp_sum
             |FROM f ORDER BY doc_id""".stripMargin),
      (s, dir) => {
        WinnowFunctions.register(s)
        t(s, dir, "documents")
          .select(col("doc_id"), WinnowFunctions.fingerprints(
            TextOps.canonText(col("text")), 8, 4).as("fps"))
          .select(col("doc_id"), size(col("fps")).as("n_fp"),
            element_at(col("fps"), 1).as("fp_first"),
            element_at(col("fps"), -1).as("fp_last"),
            aggregate(col("fps"), lit(0L), (acc, x) => acc + x).as("fp_sum"))
          .orderBy("doc_id")
      }),

    QueryDef("q44_winnow_neardup",
      "Winnowing near-dup pairs: prefix-filtered candidates (each doc's " +
        "rarest |s|-ceil(t|s|)+1 prints probe the full posting lists — " +
        "recall exactly 1 by the prefix theorem, hot keys bounded because " +
        "hot prints enter few prefixes) + exact overlap verify on the " +
        "full sets. Oracle compares ALL pairs exhaustively.",
      Some(s"""$winnowFpsCte
             |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
             |  round(CAST(len(list_intersect(a.fps, b.fps)) AS DOUBLE)
             |    / least(len(a.fps), len(b.fps)), 4) AS overlap
             |FROM f a JOIN f b ON a.doc_id < b.doc_id
             |WHERE CAST(len(list_intersect(a.fps, b.fps)) AS DOUBLE)
             |    / least(len(a.fps), len(b.fps)) >= 0.6
             |ORDER BY a_id, b_id""".stripMargin),
      (s, dir) => TextOps.winnowNearDupPairs(t(s, dir, "documents"),
          "doc_id", "text", k = 8, window = 4, threshold = 0.6)
        .orderBy("a_id", "b_id")),

    QueryDef("q45_frame_sample",
      "Multimodal frame sampling: each binary payload fans out to one row " +
        "per sampled frame through the per-partition codec boundary " +
        "(streaming flatMap — no per-doc frame list on the heap). The " +
        "oracle replicates the stub codec's deterministic arithmetic " +
        "(duration = bytes % 3600 ms, frame = first <=256 bytes) to check " +
        "the fan-out row counts and byte totals end-to-end.",
      Some("""WITH m AS (SELECT doc_id,
             |    octet_length(CAST(text AS BLOB)) AS n FROM documents)
             |SELECT doc_id, CAST((n % 3600) // 500 + 1 AS BIGINT) AS n_frames,
             |  CAST(((n % 3600) // 500 + 1) * least(n, 256) AS BIGINT) AS frame_bytes
             |FROM m ORDER BY doc_id""".stripMargin),
      (s, dir) => {
        val withP = MultimodalOps.withPayload(t(s, dir, "documents"), "text")
        MultimodalOps.sampleFrames(withP, "doc_id", MultimodalOps.FakeCodec,
            everyMs = 500)
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_frames"),
            sum(length(col("frame"))).as("frame_bytes"))
          .orderBy("doc_id")
      }),

    QueryDef("q46_ann_ivf_trained",
      "ANN scale path #3: IVF-FLAT with a TRAINED coarse quantizer — two " +
        "Lloyd rounds over the corpus with decimal-exact (and therefore " +
        "partitioning-independent) centroid sums. Approximate by design " +
        "-> no SQL oracle (driver rows-only check); determinism and " +
        "recall vs the exact baseline are asserted in SimOpsSpec.",
      None,
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val q = e.filter(col("vec_id") % 100 === 0)
        SimOps.withRecallAudit(
            SimOps.ivfTopKTrained(q, e, "vec_id", "embedding", 5,
              nlist = 16, nprobe = 6, iters = 2),
            SimOps.bruteForceTopK(q, e, "vec_id", "embedding", 5), 5)
          .orderBy("query_id", "rank")
      }),

    QueryDef("q47_jaccard_neardup",
      "Exact n-gram-Jaccard near-dup pairs via AllPairs prefix filtering: " +
        "global rarest-first gram order, per-doc prefix of " +
        "|s|-ceil(t|s|)+1 grams, candidate equi-join on prefix grams, " +
        "exact verify. Recall is exactly 1 by the prefix-filter theorem — " +
        "no signatures — so the exhaustive oracle must match bit-for-bit.",
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
      (s, dir) => TextOps.jaccardNearDupPairs(t(s, dir, "documents"),
          "doc_id", "text", n = 3, threshold = 0.5)
        .orderBy("a_id", "b_id")),

    QueryDef("q48_hash_split",
      "Deterministic train/val/test split (80/10/10) by portable md5 " +
        "bucket of the id — reproducible across runs, engines, and " +
        "corpus versions; a pure narrow projection, zero shuffles.",
      Some("""WITH b AS (SELECT doc_id,
             |    CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
             |      AS BIGINT) % 100 AS bucket
             |  FROM documents)
             |SELECT doc_id, bucket,
             |  CASE WHEN bucket < 80 THEN 'train'
             |       WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split
             |FROM b ORDER BY doc_id""".stripMargin),
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"),
          SampleOps.bucket(col("doc_id"), 100).as("bucket"),
          SampleOps.splitLabel(col("doc_id"),
            Seq("train" -> 80, "val" -> 10, "test" -> 10)).as("split"))
        .orderBy("doc_id")),

    QueryDef("q49_decontaminate",
      "Benchmark decontamination (GPT-3-style n-gram overlap): docs whose " +
        "id % 17 == 0 act as the held-out eval set; every other doc " +
        "reports how many distinct 5-gram hashes it shares with ANY eval " +
        "doc. Grams travel as 8-byte md5 hashes; the distinct benchmark " +
        "side stays broadcast-small, so the corpus is never shuffled.",
      Some("""WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') w
             |  FROM documents),
             |sh AS (SELECT doc_id, CASE WHEN len(w) < 5
             |    THEN [array_to_string(w, ' ')]
             |    ELSE list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
             |                        || ' ' || w[i+3] || ' ' || w[i+4]
             |                        for i in range(1, len(w) - 3)]) END AS s
             |  FROM toks),
             |h AS (SELECT doc_id,
             |    CAST(concat('0x', substr(md5(g), 1, 15)) AS BIGINT) AS gh
             |  FROM (SELECT doc_id, unnest(s) AS g FROM sh)),
             |bench AS (SELECT DISTINCT gh FROM h WHERE doc_id % 17 = 0)
             |SELECT doc_id, count(DISTINCT gh) AS hits
             |FROM h JOIN bench USING (gh) WHERE doc_id % 17 <> 0
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin),
      (s, dir) => {
        val docs = t(s, dir, "documents")
        TextOps.contaminationHits(
            docs.filter(col("doc_id") % 17 =!= 0),
            docs.filter(col("doc_id") % 17 === 0),
            "doc_id", "text", n = 5)
          .orderBy("doc_id")
      }),

    QueryDef("q60_bloom_decontaminate",
      "q49's decontamination with the scale-path build side: the " +
        "benchmark gram set is compressed into a FIXED-SIZE Bloom filter " +
        "(Spark's own BloomFilterAggregate / BloomFilterMightContain, " +
        "registered as callable functions), probed map-side in codegen; " +
        "only might-contain survivors reach the exact verify join, so " +
        "the result is bit-identical while the build side stays O(bits) " +
        "however many grams the eval suite has. Oracle: q49's exact SQL.",
      Some("""WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') w
             |  FROM documents),
             |sh AS (SELECT doc_id, CASE WHEN len(w) < 5
             |    THEN [array_to_string(w, ' ')]
             |    ELSE list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
             |                        || ' ' || w[i+3] || ' ' || w[i+4]
             |                        for i in range(1, len(w) - 3)]) END AS s
             |  FROM toks),
             |h AS (SELECT doc_id,
             |    CAST(concat('0x', substr(md5(g), 1, 15)) AS BIGINT) AS gh
             |  FROM (SELECT doc_id, unnest(s) AS g FROM sh)),
             |bench AS (SELECT DISTINCT gh FROM h WHERE doc_id % 17 = 0)
             |SELECT doc_id, count(DISTINCT gh) AS hits
             |FROM h JOIN bench USING (gh) WHERE doc_id % 17 <> 0
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin),
      (s, dir) => {
        val docs = t(s, dir, "documents")
        TextOps.bloomContaminationHits(
            docs.filter(col("doc_id") % 17 =!= 0),
            docs.filter(col("doc_id") % 17 === 0),
            "doc_id", "text", n = 5)
          .orderBy("doc_id")
      }),

    QueryDef("q50_stratified_sample",
      "Deterministic per-language stratified sampling: keep a doc iff its " +
        "per-mille md5 bucket is under its language's rate (en down to " +
        "100 per mille, the rest at 400) — the row-local, shuffle-free, " +
        "reproducible counterpart of sampleBy for corpus rebalancing.",
      Some("""WITH b AS (SELECT doc_id, lang,
             |    CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
             |      AS BIGINT) % 1000 AS bk
             |  FROM documents)
             |SELECT doc_id, lang FROM b
             |WHERE bk < CASE lang WHEN 'en' THEN 100 WHEN 'de' THEN 400
             |  WHEN 'es' THEN 400 WHEN 'fr' THEN 400 WHEN 'zh' THEN 400
             |  ELSE 0 END
             |ORDER BY doc_id""".stripMargin),
      (s, dir) => SampleOps.stratifiedSample(t(s, dir, "documents"),
          "doc_id", "lang",
          Map("en" -> 100, "de" -> 400, "es" -> 400, "fr" -> 400, "zh" -> 400))
        .select("doc_id", "lang")
        .orderBy("doc_id")),

    QueryDef("q51_repetition",
      "Gopher-style repetition signals: duplicate-2-gram fraction (with " +
        "multiplicity) and most-frequent-2-gram fraction, per-mille " +
        "integer arithmetic. Relational shape: explode -> (doc,gram) " +
        "count -> per-doc rollup; shuffle key is (doc,gram).",
      Some("""WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') w
             |  FROM documents),
             |g AS (SELECT doc_id, unnest([w[i] || ' ' || w[i+1]
             |                             for i in range(1, len(w))]) AS gr
             |  FROM toks WHERE len(w) >= 2),
             |c AS (SELECT doc_id, gr, count(*) AS cnt FROM g GROUP BY doc_id, gr),
             |st AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS total,
             |    count(*) AS uniq, max(cnt) AS maxc
             |  FROM c GROUP BY doc_id)
             |SELECT t.doc_id,
             |  COALESCE(CAST(floor(1000 * (total - uniq) / total) AS BIGINT), 0) AS dup2_mil,
             |  COALESCE(CAST(floor(1000 * maxc / total) AS BIGINT), 0) AS top2_mil
             |FROM toks t LEFT JOIN st ON t.doc_id = st.doc_id
             |ORDER BY t.doc_id""".stripMargin),
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val toks = docs.select(col("doc_id"), TextOps.tokens(col("text")).as("w"))
        val grams = toks.filter(size(col("w")) >= 2)
          .select(col("doc_id"), explode(zip_with(col("w"),
            slice(col("w"), lit(2), size(col("w"))),
            (a, b) => concat(a, lit(" "), b))).as("gr"))
          .filter(col("gr").isNotNull)
        val st = grams.groupBy("doc_id", "gr").agg(count(lit(1)).as("cnt"))
          .groupBy("doc_id").agg(sum("cnt").as("total"),
            count(lit(1)).as("uniq"), max("cnt").as("maxc"))
        toks.select("doc_id").join(st, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(floor(lit(1000) * (col("total") - col("uniq")) / col("total"))
              .cast("long"), lit(0L)).as("dup2_mil"),
            coalesce(floor(lit(1000) * col("maxc") / col("total"))
              .cast("long"), lit(0L)).as("top2_mil"))
          .orderBy("doc_id")
      }),

    QueryDef("q52_curation_pipeline",
      "Flagship corpus-curation composition in ONE declarative plan: " +
        "exact-dup keepers only -> quality gate (>=500 mil) -> language " +
        "guess -> deterministic 80/10/10 split -> per-(lang,split) doc and " +
        "token rollup. Every stage is an operator the catalog verifies " +
        "individually; this proves they compose without driver-side glue.",
      Some {
        val (hitExprs, maxExpr, nWin, firstWin) = sqlLangPieces
        s"""WITH keep AS (SELECT min(doc_id) AS doc_id FROM documents
           |  GROUP BY md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'))),
           |d AS (SELECT doc_id, text FROM documents
           |  WHERE doc_id IN (SELECT doc_id FROM keep)
           |    AND $sqlQualityMil >= 500),
           |h AS (SELECT doc_id, text, $hitExprs FROM d),
           |m AS (SELECT *, $maxExpr AS mx FROM h),
           |g AS (SELECT doc_id,
           |    CASE WHEN mx = 0 OR ($nWin) > 1 THEN 'und' ELSE ($firstWin) END AS glang,
           |    len(regexp_extract_all(text, '\\S+')) AS ntok,
           |    CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
           |      AS BIGINT) % 100 AS bucket
           |  FROM m)
           |SELECT glang,
           |  CASE WHEN bucket < 80 THEN 'train'
           |       WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
           |  count(*) AS n_docs, CAST(sum(ntok) AS BIGINT) AS tok_sum
           |FROM g GROUP BY glang, split ORDER BY glang, split""".stripMargin
      },
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val keepers = docs
          .groupBy(TextOps.fingerprint(col("text")).as("fp"))
          .agg(min("doc_id").as("doc_id"))
          .select("doc_id")
        docs.join(keepers, "doc_id")
          .filter(TextOps.qualityScoreMil(col("text")) >= 500)
          .select(col("doc_id"),
            TextOps.langId(col("text")).as("glang"),
            TextOps.tokenCount(col("text")).as("ntok"),
            SampleOps.splitLabel(col("doc_id"),
              Seq("train" -> 80, "val" -> 10, "test" -> 10)).as("split"))
          .groupBy("glang", "split")
          .agg(count(lit(1)).as("n_docs"), sum("ntok").as("tok_sum"))
          .orderBy("glang", "split")
      }),

    QueryDef("q53_pack_sequences",
      "Sequence packing: deterministic hash order, global running token " +
        "sum, fixed 2048-token windows; per-bin doc/token rollup. The " +
        "Spark plan computes the prefix sum two-level (parallel cumsum " +
        "inside hash-range buckets + tiny per-bucket offsets) so no " +
        "single-partition window exists; the oracle is the naive global " +
        "window — results are identical by construction.",
      Some("""WITH d AS (SELECT doc_id, len(regexp_extract_all(text, '\S+')) AS ntok,
             |    CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
             |      AS BIGINT) AS h
             |  FROM documents),
             |c AS (SELECT doc_id, ntok,
             |    CAST(COALESCE(sum(ntok) OVER (ORDER BY h, doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS pre
             |  FROM d)
             |SELECT CAST(floor(pre / 2048) AS BIGINT) AS bin, count(*) AS n_docs,
             |  CAST(sum(ntok) AS BIGINT) AS tok_sum
             |FROM c GROUP BY bin ORDER BY bin""".stripMargin),
      (s, dir) => SampleOps.packBins(t(s, dir, "documents"), "doc_id",
          TextOps.tokenCount(col("text")), 2048)
        .groupBy("bin")
        .agg(count(lit(1)).as("n_docs"), sum("ntok").as("tok_sum"))
        .orderBy("bin")),

    QueryDef("q54_quantile_sketch",
      "Mergeable quantile sketch: percentile_approx (Greenwald-Khanna) — " +
        "single-pass, map-side-combinable, fixed memory per group; the " +
        "scale path next to q36's exact sort-based percentile. " +
        "Approximate by design -> no SQL oracle, but the sketch error is " +
        "DRIVER-CHECKED every round (the recall_mil pattern): each " +
        "returned value carries its exact RANK error — GK's actual " +
        "guarantee — as a *_err_ppm column (distance from the target " +
        "quantile to the value's true rank interval, from one map-only " +
        "conditional-count pass), bounded in CatalogSpec + SketchSpec. " +
        "The audit pass is the harness, not the scale path. Output is " +
        "scalar doubles/longs only: the driver harness hash-compares " +
        "pandas frames, which cannot sort array cells.",
      None,
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        // pass 1: the sketch itself (cheap GK), collected — group
        // cardinality is 3 return flags, a bounded driver read (the
        // recall_mil pattern's ground-truth bootstrap)
        val ap = li.groupBy("l_returnflag")
          .agg(
            percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("p50_price"),
            percentile_approx(col("l_extendedprice"), lit(0.9), lit(10000)).as("p90_price"),
            percentile_approx(col("l_extendedprice"), lit(0.99), lit(10000)).as("p99_price"),
            percentile_approx(col("l_quantity"), lit(0.5), lit(10000)).as("med_qty"))
          // 3 rows, but its PLAN is a corpus GK pass — checkpoint so the
          // driver bootstrap and the final join both read it once
          .localCheckpoint()
        val rows = ap.collect()
        // pass 2: audit GK's ACTUAL guarantee — the returned value's
        // RANK sits within accuracy of the target rank — as ONE
        // map-only conditional-count aggregate (an exact `percentile`
        // audit column was measured at +3.7 s here: it builds a
        // value->count map over ~1M distinct prices; the rank audit is
        // the same guarantee for ~0.3 s). For each (flag, quantile):
        // err = distance from target p to [rank_lt, rank_le]/n, in ppm
        // (ties make the value's rank an interval; inside = 0).
        def flagVal(q: String): Column = rows.foldLeft(lit(null).cast("double")) {
          (acc, r) => when(col("l_returnflag") === r.getString(0),
            lit(r.getAs[Any](q).toString.toDouble)).otherwise(acc)
        }
        val targets = Seq(
          ("p50_price", col("l_extendedprice"), 0.5),
          ("p90_price", col("l_extendedprice"), 0.9),
          ("p99_price", col("l_extendedprice"), 0.99),
          ("med_qty", col("l_quantity"), 0.5))
        val audits = targets.flatMap { case (q, c, _) => Seq(
          count(when(c < flagVal(q), lit(1))).as(s"__lt_$q"),
          count(when(c <= flagVal(q), lit(1))).as(s"__le_$q"))
        }
        val allAudits = count(lit(1)).as("__n") +: audits
        val ranked = li.groupBy("l_returnflag")
          .agg(allAudits.head, allAudits.tail: _*)
        def rankErr(q: String, p: Double): Column = {
          val lo = col(s"__lt_$q").cast("double") / col("__n")
          val hi = col(s"__le_$q").cast("double") / col("__n")
          floor(greatest(lit(p) - hi, lo - lit(p), lit(0.0)) * lit(1e6))
            .cast("long")
        }
        ap.join(ranked, "l_returnflag")
          .select(col("l_returnflag"),
            col("p50_price"), col("p90_price"), col("p99_price"),
            col("med_qty"),
            rankErr("p50_price", 0.5).as("p50_err_ppm"),
            rankErr("p90_price", 0.9).as("p90_err_ppm"),
            rankErr("p99_price", 0.99).as("p99_err_ppm"),
            rankErr("med_qty", 0.5).as("med_err_ppm"))
          .orderBy("l_returnflag")
      }),

    QueryDef("q55_distinct_sketch",
      "Cardinality sketch: approx_count_distinct (HyperLogLog++) per " +
        "group — constant memory, one pass, no distinct shuffle; the " +
        "scale path for count-distinct rollups. Approximate by design -> " +
        "no SQL oracle, but the sketch error is DRIVER-CHECKED every " +
        "round: exact distincts from per-column TWO-PHASE dedup scans " +
        "(partial dedup below the exchange — NOT count_distinct columns " +
        "in the sketch aggregate, whose multi-distinct Expand+Sort was " +
        "measured at +4 s here; see RelOps.profile) broadcast-join back " +
        "as *_err_ppm audit columns, bounded in CatalogSpec + " +
        "SketchSpec. The audit scans are the harness, not the scale path.",
      None,
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        def errPpm(a: Column, e: Column): Column =
          floor(abs(a - e) * lit(1e6) / greatest(e, lit(1L))).cast("long")
        def exactDistinct(c: String, as: String): DataFrame =
          li.select(col("l_returnflag"), col(c)).distinct()
            .groupBy("l_returnflag").agg(count(lit(1)).as(as))
        li.groupBy("l_returnflag")
          .agg(
            approx_count_distinct(col("l_orderkey"), 0.02).as("nd_orders"),
            approx_count_distinct(col("l_partkey"), 0.02).as("nd_parts"))
          .join(broadcast(exactDistinct("l_orderkey", "__eo")), "l_returnflag")
          .join(broadcast(exactDistinct("l_partkey", "__ep")), "l_returnflag")
          .select(col("l_returnflag"), col("nd_orders"), col("nd_parts"),
            errPpm(col("nd_orders"), col("__eo")).as("orders_err_ppm"),
            errPpm(col("nd_parts"), col("__ep")).as("parts_err_ppm"))
          .orderBy("l_returnflag")
      }),

    QueryDef("q61_cms_heavy_hitters",
      "Frequency sketch: count-min over 2-gram hashes (Spark's own " +
        "count_min_sketch aggregate — single-pass, mergeable, fixed " +
        "eps x delta memory per partition), decoded on the driver and " +
        "probed for the exact top-20. Completes the mergeable-sketch " +
        "family (q54 quantiles, q55 cardinality, q61 frequency). " +
        "Estimates are engine-hash-specific -> rows-only check, but the " +
        "sketch error is DRIVER-CHECKED every round: cnt is exact, and " +
        "err_ppm = (est-cnt)*1e6/cnt rides each row (>= 0 always — CMS " +
        "overcounts only; eps bound asserted in SketchSpec).",
      None,
      (s, dir) => TextOps.cmsHeavyHitters(t(s, dir, "documents"), "text", 20)
        .withColumn("err_ppm",
          floor((col("est") - col("cnt")) * lit(1e6) /
            greatest(col("cnt"), lit(1L))).cast("long"))),

    QueryDef("q62_keyword_search",
      "Corpus keyword search, integer-exact TF-IDF: tf = term " +
        "occurrences, idf_mil = (N*1e6) div df (integer division, no " +
        "ln() — bit-identical across engines), top-20 docs by score. " +
        "The term filter runs in the scan projection, df is a " +
        "terms-sized broadcast, top-k is TakeOrdered.",
      Some("""WITH tok AS (SELECT doc_id,
             |    unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
             |  FROM documents),
             |tf AS (SELECT doc_id, w, count(*) AS tf FROM tok
             |  WHERE w IN ('vector', 'merge', 'stream') GROUP BY doc_id, w),
             |dfr AS (SELECT w, count(*) AS df FROM tf GROUP BY w),
             |n AS (SELECT count(*) * 1000000 AS nmil FROM documents)
             |SELECT doc_id,
             |  CAST(sum(tf * (n.nmil // dfr.df)) AS BIGINT) AS score
             |FROM tf JOIN dfr USING (w) CROSS JOIN n
             |GROUP BY doc_id
             |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin),
      (s, dir) => TextOps.keywordSearch(t(s, dir, "documents"),
        "doc_id", "text", Seq("vector", "merge", "stream"), 20)),

    QueryDef("q56_embed_dedup_apply",
      "Embedding dedup APPLIED (the q39 pattern for vectors): the cleaned " +
        "embedding corpus after dropping every vector whose near-dup pair " +
        "has a lower id, with pairs from the DEFAULT LSH operator (q41) — " +
        "candidate gen stays bucketed, the kill set is an anti-join. " +
        "Oracle recomputes the pairs exhaustively.",
      Some(s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
             |p AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id,
             |    ${sqlCosine("a.embedding", "b.embedding")} AS c
             |  FROM e a JOIN e b ON a.vec_id < b.vec_id)
             |SELECT vec_id FROM embeddings
             |WHERE vec_id NOT IN (SELECT DISTINCT b_id FROM p WHERE round(c, 6) >= 0.45)
             |ORDER BY vec_id""".stripMargin),
      (s, dir) => {
        val dups = SimOps.lshNearDupPairs(
            t(s, dir, "embeddings"), "vec_id", "embedding", 0.45)
          .select(col("b_id").as("vec_id")).distinct()
        RelOps.antiJoin(t(s, dir, "embeddings").select("vec_id"), dups,
            Seq("vec_id"))
          .orderBy("vec_id")
      }),

    QueryDef("q57_mixture_sample",
      "Target-mixture sampling: derive each language's keep-rate from " +
        "corpus counts so a 200-doc budget lands at the configured " +
        "mixture (en 30% / de 25% / es 20% / fr 15% / zh 10%) however " +
        "skewed the input is. Stats pass = map-side-combinable count per " +
        "stratum (driver-scale result, broadcast back); keep decision = " +
        "row-local md5 bucket. No corpus shuffle anywhere.",
      Some("""WITH c AS (SELECT lang, count(*) AS cnt FROM documents GROUP BY lang),
             |r AS (SELECT lang, LEAST(1000, CAST(floor(200 * CASE lang
             |      WHEN 'en' THEN 300 WHEN 'de' THEN 250 WHEN 'es' THEN 200
             |      WHEN 'fr' THEN 150 WHEN 'zh' THEN 100 ELSE 0 END / cnt)
             |    AS BIGINT)) AS rate
             |  FROM c),
             |b AS (SELECT doc_id, lang,
             |    CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
             |      AS BIGINT) % 1000 AS bk
             |  FROM documents)
             |SELECT doc_id, lang FROM b JOIN r USING (lang) WHERE bk < rate
             |ORDER BY doc_id""".stripMargin),
      (s, dir) => SampleOps.mixtureSample(t(s, dir, "documents"),
          "doc_id", "lang",
          Map("en" -> 300, "de" -> 250, "es" -> 200, "fr" -> 150, "zh" -> 100),
          budgetDocs = 200L)
        .select("doc_id", "lang")
        .orderBy("doc_id")),

    QueryDef("q58_curriculum",
      "Curriculum ordering: every doc's 1-based position in the " +
        "(quality DESC, hash, id) training order — quality-first " +
        "curriculum with a deterministic shuffle inside each quality " +
        "class. The Spark plan avoids the single-partition global " +
        "row_number: ranks are computed per (score, hash-range bucket) " +
        "partition in parallel and shifted by driver-scale broadcast " +
        "offsets (the q53 two-level trick keyed on the bounded score " +
        "domain); the oracle IS the naive global window — identical " +
        "output by construction.",
      Some(s"""WITH q AS (SELECT doc_id, $sqlQualityMil AS score,
             |    CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
             |      AS BIGINT) AS h
             |  FROM documents)
             |SELECT doc_id, score,
             |  CAST(row_number() OVER (ORDER BY score DESC, h, doc_id) AS BIGINT) AS pos
             |FROM q ORDER BY doc_id""".stripMargin),
      (s, dir) => SampleOps.curriculumRank(t(s, dir, "documents"),
          "doc_id", TextOps.qualityScoreMil(col("text")))
        .select(col("doc_id"), col("score"), col("rank").as("pos"))
        .orderBy("doc_id")),

    QueryDef("q65_salted_skew_join",
      "Skew-salted fact-dim join: a zero-address-style whale key (a " +
        "third of all events collapse onto wallet 1) would put ~33% of " +
        "the fact table in ONE shuffle partition of a plain equi-join. " +
        "RelOps.saltedJoin splits the hot key across 16 salt buckets " +
        "(fact rows salt randomly, the dim replicates 16x) so no " +
        "partition holds more than ~1/16 of the whale. The dim side " +
        "pins SHUFFLE_HASH — at 100 TB a wallet dim outgrows broadcast, " +
        "and a broadcast join would make salting moot. Results equal " +
        "the plain join exactly (the oracle IS the plain join); the " +
        "salt never reaches the output.",
      Some("""WITH ev AS (SELECT CASE WHEN user_id % 3 = 0 THEN 1
             |    ELSE user_id END AS wallet, value
             |  FROM events),
             |j AS (SELECT c.c_mktsegment, ev.value
             |  FROM ev JOIN customer c ON ev.wallet = c.c_custkey)
             |SELECT c_mktsegment, count(*) AS n_events,
             |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
             |FROM j GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin),
      (s, dir) => {
        val ev = t(s, dir, "events")
          .select(when(col("user_id") % 3 === 0, lit(1L))
            .otherwise(col("user_id")).as("wallet"), col("value"))
        val dim = t(s, dir, "customer")
          .select(col("c_custkey").as("wallet"), col("c_mktsegment"))
          .hint("shuffle_hash")
        RelOps.saltedJoin(ev, dim, Seq("wallet"), buckets = 16)
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n_events"),
            sum(dec(col("value"))).cast("double").as("sum_value"))
          .orderBy("c_mktsegment")
      }),

    QueryDef("q67_chunk_tokens",
      "Sliding token-window chunking (sequence prep): size-32 chunks at " +
        "stride 16 (16 tokens of overlap preserves context across chunk " +
        "boundaries), chunk count = ceil(max(n-size,0)/stride)+1 — " +
        "chunks start at stride multiples until one reaches the document " +
        "end and none after, so every token is covered and no chunk is a " +
        "redundant suffix of its predecessor. Pure per-row fan-out — " +
        "tokens computed once per document and sliced per chunk, no " +
        "shuffle beyond the presentation orderBy.",
      Some("""WITH toks AS (SELECT doc_id,
             |    regexp_extract_all(lower(text), '[a-z]+') w FROM documents),
             |cl AS (SELECT doc_id,
             |    [{'i': i, 'c': w[(i*16+1):(i*16+32)]}
             |     for i in range(0, CASE WHEN len(w) > 0
             |       THEN CAST(ceil(greatest(len(w) - 32, 0) / 16.0) AS INTEGER) + 1
             |       ELSE 0 END)] AS cs
             |  FROM toks)
             |SELECT doc_id, u.i AS chunk_idx,
             |  CAST(len(u.c) AS INTEGER) AS ntok,
             |  array_to_string(u.c, ' ') AS chunk
             |FROM (SELECT doc_id, unnest(cs) AS u FROM cl)
             |ORDER BY doc_id, chunk_idx""".stripMargin),
      (s, dir) => SampleOps.chunkTokens(t(s, dir, "documents"),
          "doc_id", "text", size = 32, stride = 16)
        .orderBy("doc_id", "chunk_idx")),

    QueryDef("q68_substring_dedup",
      "Arbitrary-offset repeated-substring dedup (Lee et al. 2022 " +
        "ExactSubstr): every token covered by a 20-token window whose " +
        "exact content occurred earlier in the corpus (global " +
        "(doc_id, position) order) is removed; the first occurrence " +
        "survives whole. Offset-invariant where q66's fixed segments " +
        "are not — shifted boilerplate (a header preceded by one extra " +
        "word) is caught because every window at stride 1 is hashed. " +
        "Window digests are native map-only codegen (GramMd5s: one md5 " +
        "per position off the token bytes, bit-identical to the SQL " +
        "md5-of-joined-window so collisions transfer); keeper = " +
        "row_number partitioned by the 16-byte digest — the ONE " +
        "corpus-scale shuffle; span coverage + rebuild are the native " +
        "CutSpans sorted-merge walk, map-only.",
      Some("""WITH toks AS (SELECT doc_id,
             |    regexp_extract_all(lower(text), '[a-z]+') w FROM documents),
             |ex AS (SELECT doc_id, u.i AS pos, u.t AS tok, u.h AS h FROM (
             |  SELECT doc_id, unnest([{'i': i, 't': w[i+1],
             |      'h': CASE WHEN i <= len(w) - 20
             |        THEN md5(array_to_string(w[(i+1):(i+20)], ' ')) END}
             |    for i in range(0, len(w))]) u FROM toks)),
             |mk AS (SELECT doc_id, pos, tok,
             |    CASE WHEN h IS NOT NULL AND row_number()
             |        OVER (PARTITION BY h ORDER BY doc_id, pos) > 1
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
             |FROM documents d LEFT JOIN k USING (doc_id)
             |ORDER BY doc_id""".stripMargin),
      (s, dir) => TextOps.substringDedup(t(s, dir, "documents"),
          "doc_id", "text", minTokens = 20)
        .orderBy("doc_id")),

    QueryDef("q69_image_decode",
      "REAL image decode through the in-JDK codec: per document, a " +
        "deterministic RGB raster (width 16 + id mod 17, height " +
        "16 + id mod 13) is PNG-encoded in-engine, decoded back via " +
        "javax.imageio (JdkImageCodec.decode), resized to 8x8 through " +
        "java.awt and re-decoded — so every output dimension comes from " +
        "an actual PNG decode, while an arithmetic oracle knows the " +
        "expected values in advance. The per-partition mapPartitions " +
        "codec boundary is the same one a real multimodal pipeline " +
        "amortizes decoder init over.",
      Some("""SELECT doc_id,
             |  CAST(16 + doc_id % 17 AS INTEGER) AS width,
             |  CAST(16 + doc_id % 13 AS INTEGER) AS height,
             |  CAST(3 AS INTEGER) AS channels,
             |  CAST(8 AS INTEGER) AS r_width,
             |  CAST(8 AS INTEGER) AS r_height
             |FROM documents ORDER BY doc_id""".stripMargin),
      (s, dir) => {
        val codec = MultimodalOps.JdkImageCodec
        val docs = t(s, dir, "documents").select("doc_id")
        // materialized once: both the meta branch and the resize branch
        // consume the generated payloads — without the checkpoint every
        // document's raster fill + PNG encode would run once per branch.
        // The checkpointed blocks are GC-scoped (ContextCleaner frees
        // them once the DataFrame is unreachable) — accepted over
        // cache(), whose plan-keyed reuse would let a later benchmark
        // pass read the previous pass's blocks and under-measure.
        val payloads = MultimodalOps.syntheticImagePayloads(docs, "doc_id")
          .localCheckpoint()
        val meta = MultimodalOps.decodeMeta(payloads, "doc_id", codec)
          .toDF().select(col("doc_id"), col("width"), col("height"),
            col("channels"))
        val rmeta = MultimodalOps.decodeMeta(
            MultimodalOps.resizePayloads(payloads, "doc_id", codec, 8, 8),
            "doc_id", codec)
          .toDF().select(col("doc_id"), col("width").as("r_width"),
            col("height").as("r_height"))
        meta.join(rmeta, "doc_id").orderBy("doc_id")
      }),

    QueryDef("q70_ann_ivfpq",
      "ANN scale path #4: IVF-PQ, SINGLE-SHOT form — trains the coarse " +
        "quantizer and PQ codebooks, encodes the corpus, and probes all " +
        "inside one query. This is the calibration/one-off shape (and " +
        "deliberately the worst-case cost point): any serving path " +
        "should use the q81 build / q82 probe split, which persists the " +
        "training products and pays neither training nor corpus encode " +
        "per query batch. Probe internals are shared with q82: m=16 " +
        "one-byte codes per in-list vector (16x smaller than floats), " +
        "asymmetric-distance scoring straight from the codes " +
        "(PqAdcScore), bounded top-k shortlist aggregate, exact-cosine " +
        "refine on refine*k rows per query (the FAISS refine stage). " +
        "Approximate by design -> no SQL oracle (driver rows-only " +
        "check); recall >= 0.8 vs the exact baseline at these defaults " +
        "and the bytes-per-vector contract are asserted in SimOpsSpec.",
      None,
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val q = e.filter(col("vec_id") % 100 === 0)
        SimOps.withRecallAudit(
            SimOps.ivfPqTopK(q, e, "vec_id", "embedding", 5),
            SimOps.bruteForceTopK(q, e, "vec_id", "embedding", 5), 5)
          .orderBy("query_id", "rank")
      }),

    QueryDef("q71_pii_redact",
      "PII detection + redaction (the pre-training scrub every public " +
        "corpus needs): per-type match counts (email, E.164-ish phone, " +
        "IPv4) and a typed-placeholder masked text, all pure codegen'd " +
        "regex column expressions — a map-only scan at 100 TB, no " +
        "shuffle, no UDF. The corpus is words-only, so deterministic " +
        "PII is synthesized into each document from doc_id IDENTICALLY " +
        "on both sides (emails everywhere, phones on id%3=0, IPs on " +
        "id%5=0) — the oracle then proves the patterns match " +
        "byte-identically under RE2 and java.util.regex (the patterns " +
        "are confined to the engines' common subset; see TextOps).",
      Some("""WITH p AS (SELECT doc_id,
             |  text || ' contact user' || doc_id || '@example.com'
             |    || CASE WHEN doc_id % 3 = 0 THEN ' call +1415555' ||
             |         lpad(CAST(doc_id % 1000 AS VARCHAR), 4, '0') ELSE '' END
             |    || CASE WHEN doc_id % 5 = 0 THEN ' from 10.' ||
             |         CAST(doc_id % 256 AS VARCHAR) || '.0.' ||
             |         CAST(doc_id % 200 + 1 AS VARCHAR) ELSE '' END AS t
             |  FROM documents)
             |SELECT doc_id,
             |  CAST(len(regexp_extract_all(t,
             |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INTEGER) AS n_email,
             |  CAST(len(regexp_extract_all(t,
             |    '\+[0-9]{1,3}[0-9 -]{6,12}[0-9]')) AS INTEGER) AS n_phone,
             |  CAST(len(regexp_extract_all(t,
             |    '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS INTEGER) AS n_ip,
             |  regexp_replace(regexp_replace(regexp_replace(t,
             |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             |    '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g'),
             |    '\+[0-9]{1,3}[0-9 -]{6,12}[0-9]', '<PHONE>', 'g') AS redacted
             |FROM p ORDER BY doc_id""".stripMargin),
      (s, dir) => {
        val withPii = concat(
          col("text"),
          lit(" contact user"), col("doc_id").cast("string"), lit("@example.com"),
          when(col("doc_id") % 3 === 0,
            concat(lit(" call +1415555"),
              lpad((col("doc_id") % 1000).cast("string"), 4, "0")))
            .otherwise(lit("")),
          when(col("doc_id") % 5 === 0,
            concat(lit(" from 10."), (col("doc_id") % 256).cast("string"),
              lit(".0."), (col("doc_id") % 200 + 1).cast("string")))
            .otherwise(lit("")))
        t(s, dir, "documents")
          .select(col("doc_id"), withPii.as("__t"))
          .select(col("doc_id") +: TextOps.piiCounts(col("__t")) :+
            TextOps.redactPii(col("__t")).as("redacted"): _*)
          .orderBy("doc_id")
      }),

    QueryDef("q72_line_filter",
      "Boilerplate line filtering (jusText/trafilatura-style): drop the " +
        "short navigation/footer lines of a document, keep content " +
        "lines, rebuild. Row-local higher-order functions only — no " +
        "explode, no shuffle: a map-only scan at 100 TB. The corpus is " +
        "single-line, so line structure is synthesized IDENTICALLY on " +
        "both sides (6-word lines, a 3-word 'home login menu' " +
        "boilerplate line injected before every even line); the filter " +
        "then keeps lines with >= 4 word tokens, which also drops a " +
        "short trailing remainder line — the oracle agrees exactly. " +
        "Both sides are TOTAL on NULL text: Spark's when(size>0) sends " +
        "NULL down the empty-array branch (n_lines=1, n_kept=0, " +
        "cleaned=''), so the oracle COALESCEs its token list to [] to " +
        "land on the identical row rather than propagating NULL.",
      Some("""WITH toks AS (SELECT doc_id,
             |    COALESCE(regexp_extract_all(lower(text), '[a-z]+'),
             |             CAST([] AS VARCHAR[])) AS w FROM documents),
             |ln AS (SELECT doc_id, CASE WHEN len(w) = 0 THEN CAST([] AS VARCHAR[])
             |    ELSE [array_to_string(w[(i*6+1):(i*6+6)], ' ')
             |          for i in range(0, CAST(ceil(len(w)/6.0) AS INTEGER))] END AS lines
             |  FROM toks),
             |tx AS (SELECT doc_id, array_to_string(flatten(
             |    [CASE WHEN i % 2 = 1 THEN ['home login menu', lines[i]]
             |          ELSE [lines[i]] END
             |     for i in range(1, len(lines)+1)]), chr(10)) AS t FROM ln),
             |sp AS (SELECT doc_id, string_split(t, chr(10)) AS ls FROM tx)
             |SELECT doc_id, CAST(len(ls) AS INTEGER) AS n_lines,
             |  CAST(len([l for l in ls
             |    if len(regexp_extract_all(lower(l), '[a-z]+')) >= 4]) AS INTEGER) AS n_kept,
             |  array_to_string([l for l in ls
             |    if len(regexp_extract_all(lower(l), '[a-z]+')) >= 4], chr(10)) AS cleaned
             |FROM sp ORDER BY doc_id""".stripMargin),
      (s, dir) => {
        val toks = TextOps.tokens(col("text"))
        val lines = when(size(toks) > 0,
          transform(sequence(lit(0),
              ceil(size(toks) / lit(6.0)).cast("int") - 1),
            i => array_join(slice(toks, i * 6 + 1, lit(6)), " ")))
          .otherwise(array().cast("array<string>"))
        val lined = array_join(flatten(transform(lines, (l, i) =>
          when(i % 2 === 0, array(lit("home login menu"), l))
            .otherwise(array(l)))), "\n")
        t(s, dir, "documents")
          .select(col("doc_id"), lined.as("__t"))
          .select(col("doc_id"),
            size(TextOps.docLines(col("__t"))).as("n_lines"),
            size(filter(TextOps.docLines(col("__t")),
              TextOps.contentLine(4))).as("n_kept"),
            TextOps.filterLines(col("__t"), TextOps.contentLine(4))
              .as("cleaned"))
          .orderBy("doc_id")
      }),

    QueryDef("q73_image_neardup",
      "Image near-duplicate detection through the REAL codec: per doc a " +
        "deterministic PNG (plus, for id%10=0, a planted variant row — " +
        "same raster, new id, one perturbed pixel), decoded via " +
        "javax.imageio and perceptually hashed (56-bit dHash on an " +
        "integer-sampled 8x8 gray grid — sampling chosen so an " +
        "arithmetic oracle reproduces every bit; see MultimodalOps." +
        "dHash56), then paired within hamming<=3 by 4x14-bit band " +
        "pigeonhole equi-join + exact verify — the LSH shape of the " +
        "text near-dup paths, applied to images. The oracle recomputes " +
        "each hash from the raster formula and joins exhaustively.",
      Some("""WITH imgs AS (
             |  SELECT doc_id AS id, doc_id AS seed, FALSE AS tweak FROM documents
             |  UNION ALL
             |  SELECT doc_id + (SELECT MAX(doc_id) + 1 FROM documents) AS id,
             |    doc_id AS seed, TRUE AS tweak
             |  FROM documents WHERE doc_id % 10 = 0),
             |gr AS (SELECT id,
             |  [ (299 * v + 587 * (255 - v) + 114 * ((3 * v) % 256)) // 1000
             |    for v in
             |    [ CASE WHEN tweak AND ((i % 8) * (16 + seed % 17)) // 8 = 0
             |                AND ((i // 8) * (16 + seed % 13)) // 8 = 0
             |      THEN xor((seed * 31 + (((i % 8) * (16 + seed % 17)) // 8) * 7
             |                + (((i // 8) * (16 + seed % 13)) // 8) * 13) % 256, 128)
             |      ELSE (seed * 31 + (((i % 8) * (16 + seed % 17)) // 8) * 7
             |            + (((i // 8) * (16 + seed % 13)) // 8) * 13) % 256 END
             |      for i in range(0, 64) ] ] AS g
             |  FROM imgs),
             |hs AS (SELECT id, CAST(list_sum(
             |    [ CASE WHEN g[(j // 7) * 8 + (j % 7) + 1] > g[(j // 7) * 8 + (j % 7) + 2]
             |      THEN CAST(1 AS BIGINT) << j ELSE CAST(0 AS BIGINT) END
             |      for j in range(0, 56) ]) AS BIGINT) AS dhash FROM gr)
             |SELECT a.id AS a_id, b.id AS b_id,
             |  CAST(bit_count(xor(a.dhash, b.dhash)) AS INTEGER) AS hamming
             |FROM hs a JOIN hs b ON a.id > b.id
             |WHERE bit_count(xor(a.dhash, b.dhash)) <= 3
             |ORDER BY a_id, b_id""".stripMargin),
      (s, dir) => {
        val docs = t(s, dir, "documents").select("doc_id")
        val base = docs.select(col("doc_id").as("id"),
          col("doc_id").as("seed"), lit(false).as("tweak"))
        // variant ids offset past max(doc_id), not a fixed constant — a
        // constant collides with real ids once the table outgrows it,
        // and duplicate ids would make the pair output nondeterministic
        val vars = docs.filter(col("doc_id") % 10 === 0)
          .crossJoin(docs.agg(max(col("doc_id")).as("__mx")))
          .select((col("doc_id") + col("__mx") + 1).as("id"),
            col("doc_id").as("seed"), lit(true).as("tweak"))
        val payloads = MultimodalOps.syntheticImagePayloads(
          base.unionByName(vars), "id", "seed", "tweak")
        MultimodalOps.dhashNearDupPairs(
            MultimodalOps.dHashes(payloads, "id"), "id")
          .orderBy("a_id", "b_id")
      }),

    QueryDef("q74_bigram_lm",
      "Corpus-trained bigram language-model quality scoring (the CCNet/" +
        "KenLM perplexity-filter shape, self-trained): unigram + bigram " +
        "counts over the whole corpus, Laplace-smoothed conditional " +
        "probability per document bigram, integer mean per document — " +
        "fluent (common-bigram) documents score high, disfluent ones " +
        "low. Exact integer arithmetic end to end (probabilities in " +
        "parts-per-million, floor division) so the oracle matches " +
        "bit-for-bit; see TextOps.bigramLmScores for the ln-space " +
        "drop-in. Two vocab-keyed count shuffles + two co-keyed joins " +
        "+ one per-doc aggregate — nothing corpus-sized on the driver.",
      Some("""WITH toks AS (SELECT doc_id,
             |    regexp_extract_all(lower(text), '[a-z]+') AS w FROM documents),
             |uni AS (SELECT w1, COUNT(*) AS c1 FROM (
             |    SELECT unnest(w) AS w1 FROM toks) GROUP BY w1),
             |v AS (SELECT COUNT(*) AS vs FROM uni),
             |bg AS (SELECT doc_id, u.w1 AS w1, u.w2 AS w2 FROM (
             |    SELECT doc_id, unnest([{'w1': w[i], 'w2': w[i+1]}
             |      for i in range(1, len(w))]) AS u FROM toks)),
             |big AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY w1, w2),
             |per AS (SELECT doc_id,
             |    (1000000 * (c12 + 1)) // (c1 + vs) AS ppm
             |  FROM bg JOIN big USING (w1, w2) JOIN uni USING (w1) CROSS JOIN v),
             |sc AS (SELECT doc_id, COUNT(*) AS nb, SUM(ppm) AS sp
             |  FROM per GROUP BY doc_id)
             |SELECT t.doc_id, CAST(COALESCE(sc.nb, 0) AS INTEGER) AS n_bigrams,
             |  CAST(sc.sp // sc.nb AS BIGINT) AS score_ppm
             |FROM toks t LEFT JOIN sc ON t.doc_id = sc.doc_id
             |ORDER BY t.doc_id""".stripMargin),
      (s, dir) =>
        TextOps.bigramLmScores(t(s, dir, "documents"), "doc_id", "text")
          .orderBy("doc_id")),

    QueryDef("q75_semdedup",
      "SemDeDup (Abbas et al. 2023): semantic dedup scoped to trained " +
        "k-means clusters — pairwise cosine runs only WITHIN a cluster " +
        "(equi-join on the cluster id, never n² — the scale path q33's " +
        "exhaustive baseline exists to calibrate), larger id of any " +
        "pair at cosine >= 0.45 is dropped, survivors keep their " +
        "cluster label. probes=2 multi-probe assignment mitigates the " +
        "paper's cross-cluster blind spot: each vector is candidate-" +
        "visible in its top-2 clusters, so a dup pair straddling one " +
        "boundary still meets (~2x pair volume, still equi-keyed). " +
        "Clustering is k-means -> no SQL oracle (driver " +
        "rows-only check); SimOpsSpec pins the semantics: planted dups " +
        "die (including a boundary-straddling pair), kills are a subset " +
        "of the exhaustive q33 kill set, partition-invariant. " +
        "kill_recall_mil rides every row (r12 verdict #7, the " +
        "recall_mil pattern): semDedup's kill count vs the EXHAUSTIVE " +
        "same-threshold kill set (kills are provably a subset, so the " +
        "count ratio IS recall) — the exhaustive pass is the AUDIT " +
        "harness over the fixed-size vector table, q33's exempt class; " +
        "at 100 TB run the operator alone.",
      None,
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val out = SimOps.semDedup(e, "vec_id", "embedding",
            nlist = 16, threshold = 0.45, probes = 2)
          .localCheckpoint(true) // survivors feed the count AND the rows
        val exKills = SimOps.cosineNearDupPairs(e, "vec_id", "embedding",
          0.45).select(col("b_id")).distinct().count()
        val semKills = e.count() - out.count()
        val recall =
          if (exKills == 0) 1000L else semKills * 1000L / exKills
        out.withColumn("kill_recall_mil", lit(recall)).orderBy("vec_id")
      }),

    QueryDef("q76_url_screen",
      "Web-crawl URL admission screen (the stage before any text is " +
        "read): canonicalize URLs (lowercase, strip fragment/query/" +
        "trailing slash), collapse crawl duplicates to the smallest " +
        "doc_id per canonical URL, drop blocklisted domains by 2-label " +
        "suffix via a broadcast anti-join. URLs are synthesized " +
        "deterministically on both sides (case-variant hosts, tracking " +
        "params, fragments, trailing slashes, and id%4=0 docs on a " +
        "blocked domain) so every canonicalization rule is actually " +
        "exercised. One canonical-key shuffle + a broadcast anti-join.",
      Some("""WITH u AS (SELECT doc_id,
             |  'https://Site' || CAST(doc_id % 10 AS VARCHAR)
             |   || CASE WHEN doc_id % 4 = 0 THEN '.spam.example'
             |           ELSE '.example.org' END
             |   || '/p/' || CAST(doc_id % 50 AS VARCHAR)
             |   || CASE WHEN doc_id % 7 = 0 THEN '/' ELSE '' END
             |   || CASE WHEN doc_id % 3 = 0 THEN '?utm=x' ELSE '' END
             |   || CASE WHEN doc_id % 5 = 0 THEN '#frag' ELSE '' END AS raw
             |  FROM documents),
             |s AS (SELECT doc_id, regexp_replace(regexp_replace(
             |    raw, '#.*$', ''), '\?.*$', '') AS st FROM u),
             |c AS (SELECT doc_id, regexp_replace(
             |    lower(regexp_extract(st, '^([A-Za-z][A-Za-z0-9+.-]*://[^/]*)', 1))
             |      || substr(st, len(regexp_extract(st,
             |           '^([A-Za-z][A-Za-z0-9+.-]*://[^/]*)', 1)) + 1),
             |    '/$', '') AS url FROM s),
             |h AS (SELECT doc_id, url,
             |    regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1) AS host
             |  FROM c),
             |k AS (SELECT url, host, MIN(doc_id) AS doc_id FROM h GROUP BY url, host)
             |SELECT doc_id, host, url FROM k
             |WHERE NOT (host = 'spam.example' OR ends_with(host, '.spam.example'))
             |ORDER BY doc_id""".stripMargin),
      (s, dir) => {
        val raw = concat(lit("https://Site"),
          (col("doc_id") % 10).cast("string"),
          when(col("doc_id") % 4 === 0, lit(".spam.example"))
            .otherwise(lit(".example.org")),
          lit("/p/"), (col("doc_id") % 50).cast("string"),
          when(col("doc_id") % 7 === 0, lit("/")).otherwise(lit("")),
          when(col("doc_id") % 3 === 0, lit("?utm=x")).otherwise(lit("")),
          when(col("doc_id") % 5 === 0, lit("#frag")).otherwise(lit("")))
        WebOps.screenUrls(
            t(s, dir, "documents").select(col("doc_id"), raw.as("raw_url")),
            "doc_id", "raw_url", Seq("spam.example"))
          .orderBy("doc_id")
      }),

    QueryDef("q77_pool_embeddings",
      "Chunk -> document embedding pooling (the RAG/retrieval move): " +
        "element-wise mean of each group's vectors (group = vec_id % " +
        "50, a chunks-of-one-doc proxy). Floating-point addition does " +
        "not commute, so the per-component sum folds in EXPLICIT vec_id " +
        "order (group-size-bounded sorted collect) rather than a " +
        "merge-order-dependent sum() — same-order folds are " +
        "bit-identical across engines, so the oracle checks pooled " +
        "doubles exactly. The catalog entry emits one SCALAR row per " +
        "(group, component) — array-valued result columns break " +
        "external comparison harnesses that sort/hash scalar cells " +
        "(the q54 lesson), so the pooled vector is exploded here and " +
        "reassembled by callers that want the array shape " +
        "(SimOps.meanPool itself still returns it). " +
        "Two equi-shuffles, both keyed by group.",
      Some("""WITH c AS (SELECT vec_id % 50 AS grp, vec_id,
             |    unnest([{'i': i, 'x': CAST(embedding[i+1] AS DOUBLE)}
             |            for i in range(0, len(embedding))]) AS u
             |  FROM embeddings),
             |f AS (SELECT grp, u.i AS i, COUNT(*) AS n,
             |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |      list(u.x ORDER BY vec_id)), (a, b) -> a + b) AS s
             |  FROM c GROUP BY grp, u.i)
             |SELECT grp, CAST(i AS INTEGER) AS i,
             |  CAST(n AS INTEGER) AS n_vecs, round(s / n, 6) AS mean
             |FROM f ORDER BY grp, i""".stripMargin),
      (s, dir) =>
        SimOps.meanPool(
            t(s, dir, "embeddings").select((col("vec_id") % 50).as("grp"),
              col("vec_id"), col("embedding")),
            "vec_id", "grp", "embedding")
          .select(col("grp"), col("n_vecs"),
            posexplode(col("pooled")).as(Seq("i", "mean")))
          .select(col("grp"), col("i"), col("n_vecs"), col("mean"))
          .orderBy("grp", "i")),

    QueryDef("q78_chat_flatten",
      "SFT conversation formatting: instruction data arrives as JSON " +
        "conversations and leaves as flat training text — parse the " +
        "turn array (from_json), count turns, gate on ends-with-" +
        "assistant (a trailing user turn has no target tokens), and " +
        "flatten to <|role|>content sentinel format. Row-local " +
        "from_json + HOFs: no explode, no shuffle, no UDF. " +
        "Conversations are synthesized from each document's tokens " +
        "IDENTICALLY on both sides (2 turns, +1 trailing user turn for " +
        "id%3=0 making those invalid); the oracle re-parses with " +
        "DuckDB's JSON functions.",
      Some("""WITH toks AS (SELECT doc_id,
             |    regexp_extract_all(lower(text), '[a-z]+') AS w FROM documents),
             |j AS (SELECT doc_id,
             |  '[{"role":"user","content":"' || array_to_string(w[1:4], ' ')
             |   || '"},{"role":"assistant","content":"' || array_to_string(w[5:8], ' ')
             |   || '"}' || CASE WHEN doc_id % 3 = 0
             |        THEN ',{"role":"user","content":"' || array_to_string(w[9:12], ' ') || '"}'
             |        ELSE '' END || ']' AS conv
             |  FROM toks)
             |SELECT doc_id,
             |  CAST(json_array_length(conv) AS INTEGER) AS n_turns,
             |  json_extract_string(conv,
             |    '$[' || (json_array_length(conv) - 1) || '].role') = 'assistant' AS valid,
             |  array_to_string(['<|' || json_extract_string(conv, '$[' || i || '].role')
             |      || '|>' || json_extract_string(conv, '$[' || i || '].content')
             |    for i in range(0, CAST(json_array_length(conv) AS INTEGER))], '') AS flat
             |FROM j ORDER BY doc_id""".stripMargin),
      (s, dir) => {
        val toks = TextOps.tokens(col("text"))
        val conv = concat(
          lit("""[{"role":"user","content":""""),
          array_join(slice(toks, 1, 4), " "),
          lit(""""},{"role":"assistant","content":""""),
          array_join(slice(toks, 5, 4), " "),
          lit(""""}"""),
          when(col("doc_id") % 3 === 0,
            concat(lit(""",{"role":"user","content":""""),
              array_join(slice(toks, 9, 4), " "), lit(""""}""")))
            .otherwise(lit("")),
          lit("]"))
        t(s, dir, "documents")
          .select(col("doc_id"), conv.as("__conv"))
          .select(col("doc_id"),
            ChatOps.turnCount(col("__conv")).as("n_turns"),
            ChatOps.endsWithAssistant(col("__conv")).as("valid"),
            ChatOps.flattenChat(col("__conv")).as("flat"))
          .orderBy("doc_id")
      }),

    QueryDef("q79_classifier_score",
      "Quality-classifier application at corpus scale (the fastText/" +
        "CCNet shape): every document scored by a linear model over " +
        "hashed bag-of-words features — token -> md5-stable bucket -> " +
        "integer weight, margin = sum, keep = margin > 0. One aggregate " +
        "HOF over the token array: no explode, no shuffle, no UDF — a " +
        "map-only scan at 100 TB. Weights are a deterministic stand-in " +
        "table (documented; a trained model's coefficients swap in with " +
        "the identical plan), which is what lets the oracle recompute " +
        "every margin exactly.",
      Some("""WITH toks AS (SELECT doc_id,
             |    regexp_extract_all(lower(text), '[a-z]+') AS w FROM documents)
             |SELECT doc_id, CAST(len(w) AS INTEGER) AS n_tokens,
             |  CAST(COALESCE(list_sum(
             |    [ ((CAST(concat('0x', substr(md5(t), 1, 15)) AS BIGINT) % 4096)
             |        * 2654435761) % 1001 - 500 for t in w ]), 0) AS BIGINT) AS margin,
             |  COALESCE(list_sum(
             |    [ ((CAST(concat('0x', substr(md5(t), 1, 15)) AS BIGINT) % 4096)
             |        * 2654435761) % 1001 - 500 for t in w ]), 0) > 0 AS keep
             |FROM toks ORDER BY doc_id""".stripMargin),
      (s, dir) => {
        val margin = TextOps.hashedLinearMargin(col("text"),
          TextOps.pseudoWeight(_))
        t(s, dir, "documents")
          .select(col("doc_id"),
            size(TextOps.tokens(col("text"))).as("n_tokens"),
            margin.as("margin"), (margin > 0).as("keep"))
          .orderBy("doc_id")
      })
  )
}
