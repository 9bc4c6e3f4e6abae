package graft

/** Physical-plan regression guards: the scale-critical plan properties
  * the catalog relies on, asserted so a refactor that silently loses a
  * pushdown, a broadcast, or an equi-join fails here instead of only
  * showing up as a benchmark regression. (The q41 broadcast regression
  * that motivated this suite was exactly such a silent plan flip.)
  */
class PlanShapeSpec extends SparkSpec {

  private def planOf(name: String): String =
    Catalog.byName(name).fn(spark, sf).queryExecution.executedPlan.toString

  private def explained(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q01: filters and projection reach the parquet scan") {
    val plan = planOf("q01_pruned_scan")
    assert(plan.contains("PushedFilters:") && plan.contains("l_shipdate"),
      s"predicate not pushed:\n$plan")
    assert(!plan.contains("l_comment"), "pruned column still read")
  }

  test("q02: aggregation has a map-side partial below the exchange") {
    val plan = planOf("q02_agg_pricing")
    val aggs = plan.split("HashAggregate").length - 1
    assert(aggs >= 2, s"no partial aggregate:\n$plan")
  }

  test("q03: top-k plans as TakeOrdered, not a global sort") {
    assert(planOf("q03_topk").contains("TakeOrderedAndProject"))
  }

  test("q09: dimension joins broadcast (fact side never shuffles for them)") {
    val plan = planOf("q09_fk_graph")
    assert(plan.contains("BroadcastHashJoin"), s"dims not broadcast:\n$plan")
  }

  test("q41: near-dup candidates equi-join on bucket keys, never all-pairs") {
    val plan = planOf("q41_embed_neardup_lsh")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"all-pairs join:\n$plan")
    assert(plan.contains("ShuffledHashJoin"),
      s"candidate join not hash-partitioned (a broadcast here funnels the " +
        s"exploded corpus through the driver):\n$plan")
  }

  test("q29/q31: text near-dup joins are equi-joins, never cartesian") {
    Seq("q29_dedup_minhash", "q31_simhash_neardup").foreach { q =>
      val plan = planOf(q)
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
        s"$q plans an all-pairs join:\n$plan")
    }
  }

  test("q44: winnow near-dup candidates equi-join on fingerprints, never cartesian") {
    val plan = planOf("q44_winnow_neardup")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"all-pairs join in the winnow near-dup plan:\n$plan")
    assert(plan.toLowerCase.contains("winnowfingerprints"),
      s"fingerprints not produced by the batched expression:\n$plan")
  }

  test("q47/q49/q56: curation joins stay on equi-keys, never cartesian") {
    Seq("q47_jaccard_neardup", "q49_decontaminate",
        "q56_embed_dedup_apply").foreach { q =>
      val plan = planOf(q)
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
        s"$q plans an all-pairs join:\n$plan")
    }
  }

  test("q48/q50: hash split and stratified sample stay shuffle-free") {
    Seq("q48_hash_split", "q50_stratified_sample").foreach { q =>
      val plan = planOf(q)
      // the only exchange allowed is the final presentation orderBy's
      // range partitioning — membership itself must be row-local
      assert(!plan.contains("Exchange hashpartitioning"),
        s"$q shuffles to decide membership:\n$plan")
    }
  }

  test("q53: the corpus-side running sum is partitioned by hash bucket") {
    val plan = planOf("q53_pack_sequences")
    // the Window computing the per-doc running sum (over __ntok) must
    // carry the __bkt partition spec in its own operator line; only the
    // driver-scale offsets rollup (over __bsum) may be a global window
    val corpusWindows = plan.linesIterator
      .filter(l => l.contains("Window") && l.contains("__ntok")).toSeq
    assert(corpusWindows.nonEmpty, s"no corpus-side Window found:\n$plan")
    assert(corpusWindows.forall(_.contains("__bkt")),
      s"packing prefix sum lost its bucket partitioning (single-partition " +
        s"window over the corpus):\n$corpusWindows\n$plan")
  }

  test("q57: mixture rates broadcast back; the corpus never hash-shuffles") {
    val plan = planOf("q57_mixture_sample")
    assert(plan.contains("BroadcastHashJoin"),
      s"rates not broadcast (corpus shuffled to join its own stats):\n$plan")
    // the one hash exchange allowed is the driver-scale stats rollup;
    // the documents scan side must reach the join without repartitioning
    val exchanges = plan.split("Exchange hashpartitioning").length - 1
    assert(exchanges <= 1, s"corpus-side shuffle in mixture sampling:\n$plan")
  }

  test("q58: the corpus-side rank window is partitioned; offsets broadcast") {
    val plan = planOf("q58_curriculum")
    // row_number over the full corpus must carry the (score, __bkt)
    // partition spec; only the driver-scale offsets rollup (over __c)
    // may be a global window
    val corpusWindows = plan.linesIterator
      .filter(l => l.contains("row_number")).toSeq
    assert(corpusWindows.nonEmpty, s"no rank window found:\n$plan")
    assert(corpusWindows.forall(l => l.contains("__bkt")),
      s"curriculum rank lost its bucket partitioning (single-partition " +
        s"window over the corpus):\n$corpusWindows\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"offsets not broadcast:\n$plan")
  }

  test("q59: the CC round body joins are equi-keyed, never cartesian") {
    // connectedComponents checkpoints every round (lineage truncation),
    // so the q59 executedPlan cannot show the loop's joins — build one
    // round's plan directly from the factored-out round body instead
    import org.apache.spark.sql.functions._
    val pairs = graft.ops.TextOps.simhashNearDupPairs(
      graft.Tables.load(spark, sf, "documents"), "doc_id", "text", 2)
    val edges = pairs.select(col("a_id").cast("long").as("a"),
      col("b_id").cast("long").as("b"))
    val labels = edges.select(col("a").as("node"))
      .union(edges.select(col("b").as("node")))
      .distinct().select(col("node"), col("node").as("comp"))
    val nce = graft.ops.GraphOps.contractEdges(labels, edges)
    val round = graft.ops.GraphOps.propagateOnce(labels, nce)
    val plan = round.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"all-pairs join inside the CC round body:\n$plan")
  }

  test("q60: bloom probe runs map-side BELOW the exact verify join") {
    val plan = planOf("q60_bloom_decontaminate")
    val lines = plan.linesIterator.toVector
    val probeIx = lines.indexWhere(l =>
      l.contains("Filter") && l.contains("might_contain"))
    assert(probeIx >= 0,
      s"bloom probe not a Filter anywhere:\n${plan.take(4000)}")
    // children print BELOW parents in the plan string: the probe Filter
    // must appear after (deeper than) the verify join, i.e. on the
    // corpus-scan side — a probe applied to the join OUTPUT would print
    // above the join line
    val joinIx = lines.indexWhere(l => l.contains("HashJoin"))
    assert(joinIx >= 0 && probeIx > joinIx,
      s"probe Filter (line $probeIx) not below the verify join " +
        s"(line $joinIx):\n${plan.take(4000)}")
  }

  test("q62: keyword search broadcasts df and top-ks without a global sort") {
    val plan = planOf("q62_keyword_search")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k fell back to a global sort:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"term-df rollup not broadcast:\n$plan")
  }

  test("q61: exact verify filters to candidates BELOW the count exchange") {
    import org.apache.spark.sql.functions._
    val grams = graft.Tables.load(spark, sf, "documents")
      .select(explode(graft.ops.TextOps.shingles(col("text"), 2)).as("__g"))
    val verify = graft.ops.TextOps.candidateExactCounts(grams,
      (1 to 40).map(i => s"alpha beta$i"))
    val plan = verify.queryExecution.executedPlan.toString
    val lines = plan.linesIterator.toVector
    val exIx = lines.indexWhere(_.contains("Exchange hashpartitioning"))
    assert(exIx >= 0, s"no exchange in verify plan:\n$plan")
    // children print BELOW parents: the candidate isin Filter must sit
    // deeper than the exchange, so only candidate grams ever shuffle —
    // a full-corpus (gram, count) exchange is exactly what the sketch
    // pass exists to avoid
    val filterIx = lines.indexWhere(l => l.contains("Filter") &&
      (l.contains("INSET") || l.contains(" IN ")))
    assert(filterIx > exIx,
      s"candidate filter (line $filterIx) not below the exchange " +
        s"(line $exIx):\n$plan")
  }

  test("q65: the skewed join carries the salt in its shuffle keys") {
    val plan = planOf("q65_salted_skew_join")
    assert(plan.contains("ShuffledHashJoin"),
      s"salted join not hash-partitioned (a broadcast here would make " +
        s"salting moot and hide the skew problem the op exists for):\n$plan")
    // the whale key is only split if the SALT participates in the join's
    // partitioning — it must appear among the join keys, not be dropped
    // by an optimizer rewrite before the exchange
    val joinLine = plan.linesIterator.find(_.contains("ShuffledHashJoin")).get
    assert(joinLine.contains("__salt"),
      s"salt column missing from the join keys:\n$joinLine")
    assert(!plan.contains("BroadcastHashJoin"),
      s"dim side broadcast despite the shuffle_hash pin:\n$plan")
  }

  test("q66: the keeper window is partitioned by segment hash, never global") {
    val plan = planOf("q66_segment_dedup")
    val windows = plan.linesIterator
      .filter(l => l.contains("Window") && l.contains("row_number")).toSeq
    assert(windows.nonEmpty, s"no keeper window found:\n$plan")
    assert(windows.forall(_.contains("__h")),
      s"keeper window lost its segment-hash partitioning (single-" +
        s"partition window over the exploded corpus):\n$windows")
  }

  test("q67: chunking is a pure per-row fan-out — no hash exchange at all") {
    val plan = planOf("q67_chunk_tokens")
    // the only exchange allowed is the presentation orderBy's range
    // partitioning; chunk membership itself must be row-local
    assert(!plan.contains("Exchange hashpartitioning"),
      s"chunking shuffles to decide membership:\n$plan")
    assert(plan.contains("Generate"), s"no fan-out generate found:\n$plan")
  }

  test("q68: substring-dedup pays ONE corpus window — the digest keeper") {
    val plan = planOf("q68_substring_dedup")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"all-pairs join in the substring-dedup plan:\n$plan")
    val keepers = plan.linesIterator
      .filter(l => l.contains("Window") && l.contains("row_number")).toSeq
    assert(keepers.nonEmpty, s"no keeper window found:\n$plan")
    assert(keepers.forall(_.contains("__gh")),
      s"keeper window lost its digest partitioning:\n$keepers")
    // gram digests and span coverage are map-only native expressions
    // now — the digest keeper must be the ONLY window in the plan (the
    // old relational form paid an id-window to assemble grams and a
    // second one for coverage)
    assert(plan.split("\\bWindow\\b").length - 1 == 1,
      s"extra window stage crept back into the plan:\n$plan")
    assert(plan.toLowerCase.contains("grammd5s"),
      s"window digests not produced by the batched expression:\n$plan")
    assert(plan.toLowerCase.contains("cutspans"),
      s"span cut not the native map-only expression:\n$plan")
    assert(!plan.contains("Exchange SinglePartition"),
      s"global (single-partition) stage in the plan:\n$plan")
  }

  test("q115: incremental substring probe is WINDOW-FREE — store scans map-only") {
    val plan = planOf("q115_incremental_substrdedup")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"all-pairs join in the incremental substring plan:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"store side shuffled (SMJ) — the inventory scan must stay map-only:\n$plan")
    // the whole point vs q68: the archive's keeper ordering was paid at
    // build time, so the probe has NO window operator at all
    assert(!plan.contains("Window"),
      s"window operator crept into the window-free probe:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"probe joins not broadcast:\n$plan")
    assert(plan.toLowerCase.contains("cutspans"),
      s"span cut not the native map-only expression:\n$plan")
  }

  test("q116: policy-store scoring is ONE map-only scan — no exchange but the presentation sort") {
    val plan = planOf("q116_incremental_selection")
    // the histograms were paid at BUILD time into the store; the probe
    // plan the user runs daily must be scan -> codegen score -> sort
    assert(!plan.contains("Exchange hashpartitioning"),
      s"probe-side shuffle — the policy must ride as a literal:\n$plan")
    assert(!plan.contains("Window"), s"window crept into the probe:\n$plan")
    assert(plan.toLowerCase.contains("dsirsumaffmil"),
      s"scoring not the one-pass codegen expression:\n$plan")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      s"scoring fell onto a UDF:\n$plan")
  }

  test("q119: delta-store probe keeps the store scan map-only — no SMJ, no window") {
    val plan = planOf("q119_exactly_once_admission")
    assert(!plan.contains("SortMergeJoin"),
      s"delta store shuffled (SMJ) in the probe:\n$plan")
    assert(!plan.contains("Window"),
      s"window crept into the delta probe:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"all-pairs join:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"probe joins not broadcast:\n$plan")
  }

  test("q71: PII scrub is a map-only scan — no hash exchange, no UDF") {
    val plan = planOf("q71_pii_redact")
    // the only exchange allowed is the presentation orderBy's range
    // partitioning; detection/redaction itself must be row-local
    assert(!plan.contains("Exchange hashpartitioning"),
      s"PII scrub shuffles:\n$plan")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      s"PII scrub fell off codegen onto a UDF:\n$plan")
  }

  test("q72: line filtering is row-local — no hash exchange, no explode") {
    val plan = planOf("q72_line_filter")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"line filter shuffles:\n$plan")
    assert(!plan.contains("Generate"),
      s"line filter exploded instead of using row-local HOFs:\n$plan")
  }

  test("q73: image near-dup candidates come from a band equi-join, never all-pairs") {
    val plan = planOf("q73_image_neardup")
    assert(!plan.contains("CartesianProduct"),
      s"all-pairs join in the image near-dup plan:\n$plan")
    // the only tolerated nested-loop joins are the 1-row max(doc_id)
    // scalar broadcast for variant ids, once per self-join branch (the
    // branches share their exchange at runtime)
    assert(plan.split("BroadcastNestedLoopJoin", -1).length - 1 <= 2,
      s"non-scalar nested-loop join in the image near-dup plan:\n$plan")
    // the pair join itself must be a HASHED equi-join whose keys include
    // the band key — counting nested-loop joins alone couldn't tell a
    // collapsed-scalar + regressed-pair-join plan from the healthy one
    assert(plan.linesIterator.exists(l =>
        l.matches(".*(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin).*bkey.*")),
      s"band-key equi-join missing:\n$plan")
  }

  test("q74: LM count aggregates are partial (map-side combine before the shuffle)") {
    val plan = planOf("q74_bigram_lm")
    // the unigram/bigram/per-doc counts must each split into
    // partial+final pairs — at 100 TB the exploded token stream must
    // combine before it travels
    assert(plan.split("HashAggregate").length - 1 >= 6,
      s"count aggregates not partial:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"unexpected cartesian (the 1-row vocab scalar should broadcast):\n$plan")
  }

  test("q75: semdedup pairs equi-join on the cluster id, never all-pairs") {
    val plan = planOf("q75_semdedup")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"all-pairs join in the semdedup plan:\n$plan")
  }

  test("q78: chat flattening is a map-only scan — no exchange, no explode, no UDF") {
    val plan = planOf("q78_chat_flatten")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"chat flatten shuffles:\n$plan")
    assert(!plan.contains("Generate"),
      s"chat flatten exploded instead of row-local HOFs:\n$plan")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      s"chat flatten fell off codegen onto a UDF:\n$plan")
  }

  test("q79: classifier scoring is a map-only scan — no exchange, no explode, no UDF") {
    val plan = planOf("q79_classifier_score")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"classifier scoring shuffles:\n$plan")
    assert(!plan.contains("Generate"),
      s"classifier scoring exploded tokens instead of aggregating row-locally:\n$plan")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      s"classifier scoring fell off codegen onto a UDF:\n$plan")
  }

  test("q29: minhash signatures are computed map-side, not via a shuffle") {
    val plan = planOf("q29_dedup_minhash")
    assert(plan.toLowerCase.contains("minhashbandkeys"),
      s"band keys not produced by the batched expression (a relational " +
        s"explode->groupBy would shuffle the whole exploded corpus):\n$plan")
    assert(!plan.contains(" m127"),
      s"per-permutation min aggregates back in the plan:\n$plan")
  }

  test("q80: unicode tokenization is a map-only scan — no exchange, no UDF") {
    val plan = planOf("q80_unicode_tokens")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"tokenization shuffles:\n$plan")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      s"tokenization fell off codegen onto a UDF:\n$plan")
  }

  test("q84: unicode normalization is a map-only scan — no exchange, no UDF") {
    val plan = planOf("q84_nfc_normalize")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"normalization shuffles:\n$plan")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      s"normalization fell off codegen onto a UDF:\n$plan")
  }

  // The ANN catalog queries (q34/q42/q46/q70/q82/q90/q93) additionally
  // carry the round-11 recall AUDIT: an in-query exact brute-force pass
  // over the BOUNDED probe set whose one deliberate nested-loop join
  // (probe set broadcast against the corpus — the q32 shape) rides
  // recall_mil onto the output. The probe-plan discipline is therefore
  // pinned at the OPERATOR level below — the serving path a user calls
  // without the audit — while CatalogSpec pins the audit's recall
  // bounds on the catalog output.

  /** The q82-shaped stored-index probe plan, built without the recall
    * audit (shared by the q82/q90 operator-level pins).
    */
  private def probePlan(candFilter: Option[org.apache.spark.sql.Column],
                        attrCols: Seq[String]): String = {
    import org.apache.spark.sql.functions.col
    val e = Tables.load(spark, sf, "embeddings")
    val root = java.nio.file.Files.createTempDirectory("graft_probeplan")
    val sink = new graft.sink.UpsertSink(spark, root.toString, numBuckets = 8)
    graft.ops.SimOps.buildIvfPqIndex(e, "vec_id", "embedding", sink,
      attrCols = attrCols).collect()
    graft.ops.SimOps.ivfPqProbeIndex(e.filter(col("vec_id") % 100 === 0),
        e, "vec_id", "embedding", sink, 5, candidateFilter = candFilter)
      .queryExecution.executedPlan.toString
  }

  test("q82 (operator): stored-index ANN probe joins on equi-keys, never all-pairs") {
    // the probe plan must stay candidate-bounded: probed lists equi-join
    // the stored codes on the list id, the refine shortlist equi-joins
    // the corpus on ids — an optimizer flip to a nested-loop join would
    // be the n-squared regression the index exists to avoid
    val plan = probePlan(None, Nil)
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"all-pairs join in the stored-index probe:\n$plan")
  }

  test("q90 (operator): the candidate filter is PUSHED into the code-list scan") {
    // filtered vector search prunes candidates at the parquet reader,
    // not after scoring: the label predicate must appear in the code
    // table scan's PushedFilters, and the plan must stay equi-keyed
    import org.apache.spark.sql.functions._
    val plan = probePlan(Some(col("label") === 3), Seq("label"))
    val codeScans = plan.split("Scan parquet").filter(_.contains("label"))
    assert(codeScans.exists(s => s.contains("PushedFilters")
        && s.contains("EqualTo(label,3)")),
      s"label predicate not pushed into the code-list scan:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
    // and the CATALOG form (audit included) keeps the pushdown
    val catalogPlan = planOf("q90_ann_filtered")
    assert(catalogPlan.split("Scan parquet").filter(_.contains("label"))
        .exists(s => s.contains("PushedFilters") && s.contains("EqualTo(label,3)")),
      s"catalog q90 lost the pushed filter:\n$catalogPlan")
  }

  test("q120 (operator): the probe stays candidate-bounded after a SCALED rebuild") {
    // the scaled rebuild re-derives nlist from the corpus; the probe
    // decodes the NEW width from the stored tables and must keep the
    // equi-keyed candidate-bounded shape — an optimizer flip under the
    // wider metadata would silently restore the n² cost the scaling
    // exists to prevent
    import org.apache.spark.sql.functions._
    val e = Tables.load(spark, sf, "embeddings").select("vec_id", "embedding")
    val root = java.nio.file.Files.createTempDirectory("graft_q120plan")
    val sink = new graft.sink.UpsertSink(spark, root.toString, numBuckets = 8)
    graft.ops.SimOps.buildIvfPqIndex(e, "vec_id", "embedding", sink,
      nlist = 4).collect()
    val collapsed = e.limit(100).select(col("vec_id"),
      transform(col("embedding"), x => x * lit(0.0f) + lit(0.37f))
        .as("embedding"))
    val d = graft.ops.SimOps.rebuildIfDrifted(collapsed, e, "vec_id",
      "embedding", sink, nlist = 4, scaleNlist = true)
    assert(d.rebuilt, "fixture failed to trigger the scaled rebuild")
    val plan = graft.ops.SimOps.ivfPqProbeIndex(
        e.filter(col("vec_id") % 100 === 0), e, "vec_id", "embedding",
        sink, 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"all-pairs join in the post-scaling probe:\n$plan")
  }

  test("q89: the admission screen's stored-index probe stays broadcast-bounded") {
    // one admitBatch's corpus-facing stage, plan-pinned (round-7 brief
    // #5): the probe's joins must ride broadcasts of the BATCH-bounded
    // sides (routing pairs, shortlist) — never a shuffle of the
    // corpus-scale code lists — and the only hash exchanges are the two
    // bounded top-k aggregates (k pairs per partition cross them). A
    // plan flip here is exactly the corpus-sized shuffle the stored
    // index exists to avoid.
    import org.apache.spark.sql.functions._
    val e = Tables.load(spark, sf, "embeddings")
    val root = java.nio.file.Files.createTempDirectory("graft_q89plan")
    val sink = new graft.sink.UpsertSink(spark, root.toString, numBuckets = 8)
    sink.merge("sem_corpus", e, Seq("vec_id"), pkUnique = true)
    graft.ops.SimOps.buildIvfPqIndex(e, "vec_id", "embedding", sink).collect()
    val batch = e.filter(col("vec_id") % 4 === 1)
    val hits = graft.ops.SimOps.ivfPqProbeIndex(batch,
        sink.read("sem_corpus"), "vec_id", "embedding", sink,
        k = 1, nprobe = 10)
      .filter(col("rank") === 1 && col("cosine") >= 0.45)
    val plan = hits.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"all-pairs join in the admission probe:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"probe join fell off broadcast onto a shuffle:\n$plan")
    assert(plan.split("BroadcastHashJoin").length - 1 >= 2,
      s"probe joins not broadcast:\n$plan")
    val exchanges = plan.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(exchanges.size <= 2,
      s"more exchanges than the two bounded top-k aggregates:\n$exchanges\n$plan")
  }

  test("q93: the SQ8-refine probe reads index tables past the query batch scans") {
    val plan = planOf("q93_ann_sq8_probe")
    val scans = plan.linesIterator.filter(_.contains("Scan parquet")).toSeq
    assert(scans.exists(_.contains("ann_vecs8")),
      s"refine not reading the SQ8 table:\n${scans.mkString("\n")}")
    // the QUERY batch legitimately scans the embeddings table twice
    // (the probe's queries + the recall audit's ground-truth queries
    // — both filtered to the bounded probe set); everything
    // CORPUS-sized must come from index tables (ann_codes/ann_vecs8):
    // the serving path, audit included, ships the index dir alone
    assert(scans.filterNot(l =>
        l.contains("ann_codes") || l.contains("ann_vecs8")).size <= 2,
      s"corpus scanned beyond the query batches:\n${scans.mkString("\n")}")
    assert(scans.filterNot(l =>
        l.contains("ann_codes") || l.contains("ann_vecs8"))
      .forall(_.contains("vec_id")),
      s"a non-index scan is not the filtered query batch:\n${scans.mkString("\n")}")
  }

  test("q92: BPE encode is a map-only scan over the corpus — no UDF in the plan") {
    val plan = planOf("q92_bpe_tokenize")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      s"BPE encode fell off codegen onto a UDF:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"unexpected cartesian in the BPE plan:\n$plan")
  }

  test("q94: the language rollup aggregates partially before its one exchange") {
    val plan = planOf("q94_lang_token_rollup")
    // the per-guess counts must combine map-side — at 100 TB the
    // exploded signals travel pre-aggregated, never row-by-row
    assert(plan.split("HashAggregate").length - 1 >= 2,
      s"rollup not partial:\n$plan")
    val exchanges = plan.split("Exchange hashpartitioning").length - 1
    assert(exchanges <= 1, s"more than the one guess-keyed shuffle:\n$plan")
  }

  test("q97: drift stats windows run on list-bounded input, joins stay equi-keyed") {
    val plan = planOf("q97_ann_drift")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"all-pairs join in the drift plan:\n$plan")
    // the unpartitioned ppm-share windows are fine ONLY because their
    // input is the nlist-row occupancy join — both sides must aggregate
    // (bounded) BELOW the window, which partial HashAggregates witness
    assert(plan.split("HashAggregate").length - 1 >= 4,
      s"occupancy aggregates not below the share windows:\n$plan")
  }

  test("q98: coreset selection shuffles once on the cluster key into mapGroups") {
    val plan = planOf("q98_diverse_select")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"all-pairs stage in the selection plan:\n$plan")
    assert(plan.contains("MapGroups"),
      s"per-cluster greedy not running as a grouped map:\n$plan")
    // one cluster-keyed exchange feeds the greedy; the only other
    // exchange allowed is the presentation orderBy's range partitioning
    assert(plan.split("Exchange hashpartitioning").length - 1 <= 1,
      s"extra shuffle in the selection plan:\n$plan")
  }

  test("q99: stored-model serving is ONE map-only corpus scan — no shuffle, no UDF") {
    val plan = planOf("q99_model_serve")
    assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEvalPython"),
      s"model apply fell off codegen onto a UDF:\n$plan")
    // coefficients ride the plan (BpeEncode reference object, weights
    // literal): the apply stage reads NOTHING but the corpus — model
    // tables were loaded driver-side, never joined
    val scans = plan.linesIterator.filter(_.contains("Scan parquet")).toSeq
    assert(scans.size == 1,
      s"serving plan scans more than the corpus:\n${scans.mkString("\n")}")
    // the only exchange is the presentation orderBy's range partitioning
    assert(plan.split("Exchange hashpartitioning").length - 1 == 0,
      s"shuffle in a map-only serving plan:\n$plan")
  }

  test("q101: repetition signals are one map-only scan — no shuffle, no UDF, no explode") {
    val plan = planOf("q101_repetition")
    assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEvalPython"),
      s"repetition signals fell off codegen onto a UDF:\n$plan")
    // the mode count must be the O(n) expression, not an explode +
    // aggregate (two corpus-scale shuffles for a per-row statistic)
    assert(!plan.contains("Generate explode"), s"exploded bigrams:\n$plan")
    assert(plan.split("Exchange hashpartitioning").length - 1 == 0,
      s"shuffle in a map-only statistic:\n$plan")
    assert(plan.toLowerCase.contains("topcountsharemil"),
      s"dominant-bigram share not computed by the batched expression:\n$plan")
  }

  test("q102: DSIR scoring is one map-only scan — the affinity table rides as a literal") {
    val plan = planOf("q102_dsir_select")
    assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEvalPython"),
      s"affinity scoring fell off codegen onto a UDF:\n$plan")
    // the two bounded histograms collected driver-side during plan
    // construction; the SCORING plan reads nothing but the corpus and
    // never shuffles (the only exchange is the presentation orderBy)
    val scans = plan.linesIterator.filter(_.contains("Scan parquet")).toSeq
    assert(scans.size == 1,
      s"scoring plan scans more than the corpus:\n${scans.mkString("\n")}")
    assert(plan.split("Exchange hashpartitioning").length - 1 == 0,
      s"shuffle in the map-only scoring scan:\n$plan")
    assert(!plan.contains("Generate explode"),
      s"grams exploded instead of aggregated row-locally:\n$plan")
  }

  test("q107 scale path: thresholds broadcast, tiers map-side, ONE LM pass") {
    // the catalog's q103 is the exact ntile ORACLE form; q107 (the
    // 100 TB path) consumes the SAME materialized perplexityScored
    // frame twice — thresholds and bucketing — so the LM never runs
    // twice: the bucketing plan contains no LM subtree (no explode/
    // Generate), joins the #langs-row threshold table as a BROADCAST,
    // and has no per-language window sort
    val plan = planOf("q107_perplexity_scale")
    assert(plan.contains("BroadcastHashJoin"),
      s"threshold table not broadcast:\n$plan")
    assert(!plan.contains("Window"),
      s"scale path must not sort per language:\n$plan")
    assert(!plan.contains("Generate"),
      s"LM pass recomputed inside the scale path:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"all-pairs join:\n$plan")
  }

  test("q106: Gumbel resampling is one map-only scan into TakeOrdered") {
    // the audited catalog form checkpoints the k selected rows (they
    // feed the overlap aggregate AND the output), so its FINAL plan is
    // a bounded ExistingRDD scan + the literal audit column — the
    // resampling shape under test lives in the UNDERLYING op
    val docs = graft.Tables.load(spark, sf, "documents")
    val plan = explained(graft.ops.SelectOps.dsirResample(docs,
      docs.filter(org.apache.spark.sql.functions.col("doc_id") % 11 === 0),
      "doc_id", "text", k = 50, seed = 42L, buckets = 512))
    assert(plan.contains("TakeOrderedAndProject"),
      s"resample planned as a global sort:\n$plan")
    assert(!plan.contains("ScalaUDF"), s"scoring fell onto a UDF:\n$plan")
    val scans = plan.linesIterator.filter(_.contains("Scan parquet")).toSeq
    assert(scans.size == 1,
      s"resample plan scans more than the corpus:\n${scans.mkString("\n")}")
    assert(plan.split("Exchange hashpartitioning").length - 1 == 0,
      s"shuffle in the map-only resample scan:\n$plan")
    // and the audited catalog form's served plan is the bounded
    // checkpoint — no rescans, no shuffle, the audit as a literal
    val audited = planOf("q106_dsir_resample")
    assert(audited.contains("topk_overlap_mil") &&
      !audited.contains("Scan parquet") &&
      !audited.contains("Exchange hashpartitioning"),
      s"audited resample re-reads or shuffles:\n$audited")
  }

  test("q109: incremental near-dup probe never shuffles the archive store") {
    // the point of the persisted store: admitting a batch against a
    // 100 TB archive is map-only over the store scans — the batch's
    // band keys and the candidate set broadcast, so every join is a
    // BroadcastHashJoin and the only hash exchange is the candidate
    // distinct (batch-bounded). An exchange on the store side (SMJ)
    // would re-shuffle the archive per admitted batch.
    val plan = planOf("q109_incremental_neardup")
    assert(!plan.contains("SortMergeJoin"),
      s"archive store shuffled for the probe join:\n$plan")
    assert(plan.split("BroadcastHashJoin").length - 1 >= 3,
      s"expected band/candidate/batch joins broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"all-pairs join:\n$plan")
    // the probe reads the archive ONLY through the store tables, never
    // the archive text (re-shingling 100 TB per batch is the failure
    // mode this operator exists to avoid): every documents-scan in the
    // plan must carry the batch's pushed doc_id filter
    val docScans = plan.linesIterator
      .filter(l => l.contains("Scan parquet") && l.contains("documents"))
      .toSeq
    assert(docScans.nonEmpty, s"no batch scan found:\n$plan")
  }

  test("q110: incremental segment screen — store never shuffles, no corpus window") {
    // q66 pays a corpus-wide row_number window every run; the whole
    // point of the persisted inventory is that the batch screen has NO
    // window at all and the store side joins broadcast (map-only scan)
    val plan = planOf("q110_incremental_segdedup")
    assert(!plan.contains("Window"),
      s"incremental screen re-introduced a corpus window:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"store shuffled for the screen join:\n$plan")
    assert(plan.split("BroadcastHashJoin").length - 1 >= 2,
      s"hash/dup joins not broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"all-pairs join:\n$plan")
  }

  test("q125: cumulative exact-dedup probe — store map-only, joins broadcast, no window") {
    // the probe after an ADMIT fold must keep the incremental family's
    // shape: the (fp, cnt) store scan semi-joins the broadcast batch
    // fps, the matched set broadcasts back; no shuffle, no window
    val plan = planOf("q125_incremental_exactdedup")
    assert(!plan.contains("Window"), s"exact-dedup probe has a window:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"store shuffled for the probe join:\n$plan")
    assert(plan.split("BroadcastHashJoin").length - 1 >= 2,
      s"fp joins not broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"all-pairs join:\n$plan")
  }

  test("q126: erasure ledger read — bounded receipt join, no shuffle") {
    // the served frame is the ledger scan joined to the bounded
    // replay-audit frame: broadcast, never a shuffle or a window (the
    // sweep/replay lifecycle runs eagerly before this plan)
    val plan = planOf("q126_erasure_ledger")
    assert(!plan.contains("Window"), s"ledger read has a window:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"ledger receipt join shuffled:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"replay-audit join not broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"all-pairs join:\n$plan")
  }

  test("q127: exactly-once admit probe — store map-only, joins broadcast, no window") {
    // same shape contract as q125's probe: the (fp, cnt) store scan
    // semi-joins broadcast batch fps, matches broadcast back — plus the
    // holder_cnt audit join, also broadcast; never a shuffle
    val plan = planOf("q127_exactly_once_admit")
    assert(!plan.contains("Window"), s"probe has a window:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"store shuffled for the probe/count join:\n$plan")
    assert(plan.split("BroadcastHashJoin").length - 1 >= 3,
      s"fp/count joins not broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"all-pairs join:\n$plan")
  }

  test("q111: composed admission screen — archive only via stores, every join broadcast") {
    val plan = planOf("q111_incremental_admission")
    assert(!plan.contains("Window"),
      s"admission screen has a corpus window:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"a store shuffled inside the screen:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"all-pairs join:\n$plan")
    assert(!plan.contains("ScalaUDF"), s"a gate fell onto a UDF:\n$plan")
  }

  test("q113: incremental embedding near-dup — archive store never shuffles") {
    val plan = planOf("q113_incremental_embdup")
    assert(!plan.contains("SortMergeJoin"),
      s"archive store shuffled for the probe join:\n$plan")
    assert(plan.split("BroadcastHashJoin").length - 1 >= 3,
      s"signature/candidate/batch joins not broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"all-pairs join:\n$plan")
    assert(!plan.contains("ScalaUDF"), s"cosine fell onto a UDF:\n$plan")
  }

  test("q114: multimodal admission — no corpus window, no store shuffle, no UDF") {
    val plan = planOf("q114_multimodal_admission")
    assert(!plan.contains("Window"),
      s"multimodal screen has a corpus window:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"a store shuffled inside the screen:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"all-pairs join:\n$plan")
    assert(!plan.contains("ScalaUDF"), s"a gate fell onto a UDF:\n$plan")
  }

  test("q117: grand admission — no window, no store shuffle, no UDF, all gates broadcast") {
    val plan = planOf("q117_curation_admission")
    // all seven gates compose window-free: the substring screen's keeper
    // ordering was paid into the store, the policy rides as a literal
    assert(!plan.contains("Window"),
      s"curation screen has a window:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"a store shuffled inside the screen:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"all-pairs join:\n$plan")
    assert(!plan.contains("ScalaUDF"), s"a gate fell onto a UDF:\n$plan")
    assert(plan.toLowerCase.contains("cutspans") &&
      plan.toLowerCase.contains("dsirsumaffmil"),
      s"native gate expressions missing from the plan:\n$plan")
  }

  test("q123: post-erasure admission — same shape contract as q117") {
    // the sweep must not change the SERVING plan: probes against the
    // erased stores compose exactly like q117's (window-free, store
    // scans never shuffled, every gate broadcast, native expressions)
    val plan = planOf("q123_erasure_sweep")
    assert(!plan.contains("Window"),
      s"post-erasure screen has a window:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"a store shuffled inside the screen:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"all-pairs join:\n$plan")
    assert(!plan.contains("ScalaUDF"), s"a gate fell onto a UDF:\n$plan")
    assert(plan.toLowerCase.contains("cutspans") &&
      plan.toLowerCase.contains("dsirsumaffmil"),
      s"native gate expressions missing from the plan:\n$plan")
  }

  test("q118: exact profile = two pruned scans, hash aggregation, NO Expand") {
    val plan = planOf("q118_table_profile")
    assert(plan.split("Scan parquet").length - 1 == 2,
      s"profile should pay exactly two column-pruned scans (stats + " +
        s"exact distinct):\n$plan")
    // the rejected shape: count(DISTINCT c) columns in one aggregate =
    // k-way Expand + SortAggregate on an all-columns immutable key
    // (measured 18.5 s vs 3.9 s here)
    assert(!plan.contains("Expand"),
      s"multi-distinct Expand crept back into the profile plan:\n$plan")
    // (keyless SortAggregate for the stats pass is fine — with key=[]
    // there is nothing to sort; the rejected shape sorted the expanded
    // corpus on an all-columns key)
    assert(plan.contains("partial_"),
      s"no partial (map-side) aggregate below the exchange:\n$plan")
    assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEvalPython"),
      s"profile fell onto a UDF:\n$plan")
  }

  test("q104: centroid rides as a literal — top-k never sorts globally") {
    val plan = planOf("q104_domain_topk")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k planned as a global sort:\n$plan")
    assert(!plan.contains("ScalaUDF"), s"cosine fell onto a UDF:\n$plan")
    // the dim-bounded centroid aggregate collected driver-side; the
    // ranking plan is one corpus scan, zero shuffles
    val scans = plan.linesIterator.filter(_.contains("Scan parquet")).toSeq
    assert(scans.size == 1,
      s"ranking plan scans more than the corpus:\n${scans.mkString("\n")}")
    assert(plan.split("Exchange hashpartitioning").length - 1 == 0,
      s"shuffle in the map-only ranking scan:\n$plan")
  }

  test("q105: the stable maintenance path reads only stored codes + the batch") {
    // rebuildIfDrifted's no-rebuild branch must cost one aggregated
    // code scan + one map-side batch assignment — at 100 TB the
    // maintenance cadence runs this every batch, so a corpus scan or
    // training job here would dwarf the stream itself
    val e = Tables.load(spark, sf, "embeddings").select("vec_id", "embedding")
    val root = java.nio.file.Files.createTempDirectory("graft_q105plan")
    val sink = new graft.sink.UpsertSink(spark, root.toString)
    graft.ops.SimOps.buildIvfPqIndex(e, "vec_id", "embedding", sink).collect()
    val plan = graft.ops.SimOps
      .ivfIndexDriftStats(
        e.filter(org.apache.spark.sql.functions.col("vec_id") % 3 === 0),
        "vec_id", "embedding", sink)
      .queryExecution.executedPlan.toString
    val scans = plan.linesIterator.filter(_.contains("Scan parquet")).toSeq
    assert(scans.size == 2,
      s"stable path scans beyond codes + batch:\n${scans.mkString("\n")}")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"all-pairs join:\n$plan")
  }

  test("q108: composed curation runs on ONE corpus-scale shuffle into TakeOrdered") {
    val plan = planOf("q108_curation_select")
    assert(plan.contains("TakeOrderedAndProject"),
      s"selection planned as a global sort:\n$plan")
    assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEvalPython"),
      s"a gate fell off codegen onto a UDF:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"all-pairs join:\n$plan")
    // the fingerprint-dedup window is the pipeline's one corpus-scale
    // exchange; quality/language gates are map-side and DSIR scoring
    // consumes driver-collected histograms
    assert(plan.split("Exchange hashpartitioning").length - 1 <= 1,
      s"more than the one fingerprint shuffle:\n$plan")
  }

  test("q96: the interval join is a hash equi-join on buckets, never a nested loop") {
    val plan = planOf("q96_interval_join")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join fell back to the all-pairs plan the bucketing exists to avoid:\n$plan")
    assert(plan.linesIterator.exists(l =>
        l.matches(".*(BroadcastHashJoin|ShuffledHashJoin|SortMergeJoin).*__ib.*")),
      s"no bucket-keyed equi-join found:\n$plan")
  }

  test("q83: curation screens stay row-local upstream of the admission state") {
    // the composed chain's stateless screens (canonicalize, line filter,
    // PII scrub) are regex/HOF column work: nothing in the BATCH path
    // may fall onto a UDF or a python eval — admission's durable-state
    // merges are the only non-map stages in the micro-batch
    val curated = graft.streaming.CurationPipeline.curateBatch(
      Tables.load(spark, sf, "documents")
        .selectExpr("doc_id", "concat('https://h', doc_id % 5, '.example.org/p') AS raw_url",
          "text"),
      "doc_id", "raw_url", "text", Seq("spam.example"))
    val plan = curated.queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      s"curation screens fell off codegen onto a UDF:\n$plan")
    // the one nested-loop in the chain is the blocklist anti-join, and it
    // must ride a BROADCAST of the tiny blocklist (suffix matching is
    // non-equi by nature); a CartesianProduct would mean the broadcast
    // was lost and the corpus is pairing with itself
    assert(!plan.contains("CartesianProduct"),
      s"cartesian inside the curation screens:\n$plan")
    val nlj = plan.split("BroadcastNestedLoopJoin").length - 1
    assert(nlj <= 1, s"unexpected extra nested-loop joins ($nlj):\n$plan")
  }

  test("q131 serving path: no corpus-sized scan — index tables plus one pushed query-vector read") {
    // the r14 verdict's last scale-killer: q130's dense side scanned
    // every stored vector per query. q131 serves it from the sharded
    // ANN index; this pin proves the SERVING composition (the catalog
    // row minus its audit subtree, which deliberately pays one exact
    // brute pass as ground truth) reads nothing corpus-sized: the
    // documents table never appears, and the only embeddings read is
    // the query vector's pushed-predicate point lookup
    import org.apache.spark.sql.functions._
    import graft.ops.{SearchOps, SimOps}
    val docs = Tables.load(spark, sf, "documents")
    val e = Tables.load(spark, sf, "embeddings").select("vec_id", "embedding")
    val sink = new graft.sink.UpsertSink(spark,
      java.nio.file.Files.createTempDirectory("graft_plan_q131").toString,
      numBuckets = 8)
    SearchOps.invertedIndexBuild(docs, "doc_id", "text", sink)
    SimOps.buildShardedIvfPqIndex(e, "vec_id", "embedding", sink,
      shards = 2, nlist = 4, m = 4, ksub = 8, coarseIters = 1,
      storeSq8 = true)
    // the SNAPSHOT serving composition — exactly what the catalog row
    // ships since r17 (the r16-verdict default): the pin must hold on
    // the plan the row actually runs
    SearchOps.invertedIndexSearchSnapshot(
        Seq("vector", "merge", "stream"), sink) { served =>
      val bm = served.select(col("doc_id"), round(col("score"), 6).as("score"))
      val q = e.filter(col("vec_id") === 1L)
      SimOps.shardedProbeIndexSnapshot(q, "vec_id", "embedding",
          sink, k = 100) { probed =>
        val dense = probed
          .select(col("neighbor_id").as("doc_id"), col("cosine").as("score"))
        val plan = explained(graft.ops.TextOps.rrfFuse(bm, dense, "doc_id"))
        val scans = plan.linesIterator.filter(_.contains("Scan parquet")).toSeq
        assert(scans.nonEmpty)
        scans.filter(_.contains("documents")).foreach(l =>
          fail(s"serving plan read the documents corpus:\n$l"))
        scans.filter(l => l.contains("embeddings")).foreach(l =>
          assert(l.contains("EqualTo(vec_id,1)"),
            s"embeddings read without the pushed query-vector predicate " +
              s"(a corpus-sized scan on the serving path):\n$l"))
        // the lexical side's term filter still reaches the posting scan
        // (snapshot dirs are plain parquet — pushdown rides through)
        assert(plan.contains("In(w"),
          s"term filter not pushed into the posting scan:\n$plan")
      }
    }
  }

  test("q135 batch serving: N query vectors ride ONE index-only plan — no corpus table at all") {
    // the q131 pin widened to a query BATCH (r15 brief #7): the 100x
    // posture claim is PER-QUERY cost, so N vectors must flow through
    // the same serving composition with the query side arriving as its
    // own bounded frame (the request payload at serving time). With
    // the queries literal, the plan may read NOTHING but index tables:
    // no documents, no embeddings — the dense shortlist comes from
    // ann_codes, the refine from ann_vecs8, the lexical side from the
    // pushed-term posting scan
    import org.apache.spark.sql.functions._
    import graft.ops.{SearchOps, SimOps}
    import spark.implicits._
    val docs = Tables.load(spark, sf, "documents")
    val e = Tables.load(spark, sf, "embeddings").select("vec_id", "embedding")
    val sink = new graft.sink.UpsertSink(spark,
      java.nio.file.Files.createTempDirectory("graft_plan_q135").toString,
      numBuckets = 8)
    SearchOps.invertedIndexBuild(docs, "doc_id", "text", sink)
    SimOps.buildShardedIvfPqIndex(e, "vec_id", "embedding", sink,
      shards = 2, nlist = 4, m = 4, ksub = 8, coarseIters = 1,
      storeSq8 = true)
    val qbatch = e.filter(col("vec_id") % 97 === 1)
      .as[(Long, Array[Float])].collect().toSeq
      .toDF("vec_id", "embedding")
    assert(qbatch.count() > 1, "the pin needs an actual BATCH of queries")
    // the SNAPSHOT serving composition the catalog ships since r17
    SimOps.shardedProbeIndexSnapshot(qbatch, "vec_id",
        "embedding", sink, k = 50, nprobe = 4) { probed =>
      SearchOps.invertedIndexSearchSnapshot(
          Seq("vector", "merge", "stream"), sink) { served =>
        val bm = served
          .select(col("doc_id"), round(col("score"), 6).as("score"))
        // the q135 fusion — the SAME rrfFuseBatch call the catalog row
        // makes, so the pin can never drift from the shipped composition
        val fused = graft.ops.TextOps.rrfFuseBatch(bm,
          probed.select(col("query_id"), col("neighbor_id").as("doc_id"),
            col("cosine").as("score")),
          "doc_id", "query_id")
        val plan = explained(fused)
        val scans = plan.linesIterator.filter(_.contains("Scan parquet")).toSeq
        assert(scans.nonEmpty)
        scans.filter(l => l.contains("documents") || l.contains("embeddings"))
          .foreach(l => fail(s"batch serving plan read a corpus table:\n$l"))
        // snapshot scan locations truncate in the plan display (the
        // .snapshots/<table>-XXXX dir name falls past the path cap), so
        // identify the index tables by their ReadSchema signatures:
        // ann_codes is the only (list, codes) table, ann_vecs8 the only
        // (q array<tinyint>) one
        assert(scans.exists(l => l.contains("ann_codes") ||
            l.contains("codes:array<tinyint>")) &&
          scans.exists(l => l.contains("ann_vecs8") ||
            l.contains("q:array<tinyint>")),
          s"dense side not served from the index tables:\n${scans.mkString("\n")}")
        assert(plan.contains("In(w"),
          s"term filter not pushed into the posting scan:\n$plan")
      }
    }
  }

  test("q137/q138 batch lexical serving: N term sets through ONE pushed postings scan") {
    // the r16 verdict's batch-serving symmetry (What's wrong #1): the
    // lexical side of a batch request must not loop N single-query
    // plans — the union of every query's terms pushes into ONE
    // bm25_postings scan, and the per-query replication is a broadcast
    // join of the bounded (query, term) request payload
    import org.apache.spark.sql.functions._
    import graft.ops.SearchOps
    import spark.implicits._
    val docs = Tables.load(spark, sf, "documents")
    val sink = new graft.sink.UpsertSink(spark,
      java.nio.file.Files.createTempDirectory("graft_plan_q137").toString,
      numBuckets = 8)
    SearchOps.invertedIndexBuild(docs, "doc_id", "text", sink)
    val req = Seq(0L -> "vector", 0L -> "merge", 1L -> "stream",
      1L -> "join", 2L -> "hash", 2L -> "vector").toDF("query_id", "w")
    val plan = explained(SearchOps.invertedIndexSearchBatch(req, sink))
    val scans = plan.linesIterator.filter(_.contains("Scan parquet")).toSeq
    assert(scans.nonEmpty)
    scans.filter(_.contains("documents")).foreach(l =>
      fail(s"batch lexical plan read the documents corpus:\n$l"))
    // CONSTANT in the request's query count: the tf side and the df
    // aggregate each read the (pushed, term-filtered) postings once —
    // two scans total whether the batch carries 3 queries or 300; the
    // looped single-query alternative this op replaces would pay 2N
    val postingScans = scans.count(_.contains("bm25_postings"))
    assert(postingScans <= 2,
      s"postings scanned $postingScans times for one batch (want <= 2, " +
        s"independent of N):\n" + scans.mkString("\n"))
    // the term-union predicate reaches that one scan
    assert(plan.contains("In(w"),
      s"term-union filter not pushed into the posting scan:\n$plan")
    // and the per-query replication rides a broadcast of the request
    assert(plan.contains("BroadcastHashJoin"),
      s"request replication did not broadcast:\n$plan")
  }
}
