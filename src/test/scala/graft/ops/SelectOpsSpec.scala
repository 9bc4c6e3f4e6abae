package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Adversarial pins for the targeted data-selection family (SelectOps):
  * DSIR hashed-ngram importance scoring, CCNet perplexity bucketing, and
  * embedding domain-centroid selection. The float forms (log weights,
  * Gumbel resampling) get ranking/invariance properties here because
  * they have no SQL oracle by design (catalog rows-only entries q106
  * resample, q107 threshold scale path); the integer forms additionally
  * go through the DuckDB harness via q102–q104.
  */
class SelectOpsSpec extends SparkSpec {
  import spark.implicits._

  // Two vocabularies that share no tokens: "medical" (the target domain)
  // and "finance" (off-domain), plus mixed docs. Bigram structure varies
  // with i so grams aren't all identical.
  private def pool = {
    val med = (1 to 20).map(i =>
      (i.toLong, s"patient dosage clinical trial symptom diagnosis case $i note"))
    val fin = (21 to 40).map(i =>
      (i.toLong, s"market equity dividend portfolio hedge yield quarter $i report"))
    val mix = (41 to 50).map(i =>
      (i.toLong, s"patient portfolio clinical hedge symptom yield item $i"))
    (med ++ fin ++ mix).toDF("id", "text")
  }

  private def target = pool.filter($"id" <= 6) // small in-domain sample

  test("DSIR affinity ranks in-domain docs above off-domain docs") {
    val scored = SelectOps.dsirAffinityMil(pool, target, "id", "text",
      buckets = 512).collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val medMin = (7L to 20L).map(scored).min
    val finMax = (21L to 40L).map(scored).max
    assert(medMin > finMax,
      s"held-out in-domain floor $medMin not above off-domain ceiling $finMax")
    // mixed docs sit strictly between the two blocks' extremes
    val mix = (41L to 50L).map(scored)
    assert(mix.forall(s => s > finMax - 1 && s < scored(1L) + 1))
  }

  test("DSIR affinity is exact: repartition-invariant, gram-count audited") {
    val a = SelectOps.dsirAffinityMil(pool, target, "id", "text", buckets = 256)
      .orderBy("id").collect()
    val b = SelectOps.dsirAffinityMil(pool.repartition(13), target.repartition(7),
      "id", "text", buckets = 256).orderBy("id").collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq,
      "integer DSIR scores drifted across parallelism")
    // n_grams = unigrams + bigrams = 2*tokens - 1 for these all-letter docs
    val row = a.find(_.getLong(0) == 1L).get
    val ntok = pool.filter($"id" === 1).select(size(TextOps.tokens($"text")))
      .head().getInt(0)
    assert(row.getInt(1) == 2 * ntok - 1)
  }

  test("DSIR affinity: gram-less doc scores null, in-pool target above neutral") {
    val df = Seq((1L, "patient dosage clinical"), (2L, "12345 !!!"))
      .toDF("id", "text")
    val t = df.filter($"id" === 1L)
    val out = SelectOps.dsirAffinityMil(df, t, "id", "text", buckets = 64)
      .orderBy("id").collect()
    assert(out(1).isNullAt(2), "doc with no grams must score null")
    assert(out(1).getInt(1) == 0)
    // target ⊆ pool: the raw histogram excludes the target's own rows,
    // so target-exclusive grams score 666 (ct=1, cr=0), NOT the ct==cr
    // self-cancellation to the 500 neutral prior (collisions at
    // buckets=64 can only push ct higher -> above 666; the exact
    // collision-free integer pins live in the exclusion test below)
    assert(out(0).getLong(2) > 500,
      s"in-pool target doc must score above neutral, got ${out(0).getLong(2)}")
  }

  test("DSIR affinity: raw histogram excludes the target sample by id") {
    // 'shared' appears once in the target and once in a raw doc; with
    // exclusion ct=1, cr=1 -> 500 exactly; without (the self-counting
    // bug) cr would be 2 -> 400. 'tgtonly' is target-exclusive -> 666.
    val df = Seq((1L, "shared tgtonly"), (2L, "shared rawword"))
      .toDF("id", "text")
    val t = df.filter($"id" === 1L)
    val out = SelectOps.dsirAffinityMil(df, t, "id", "text", buckets = 4096)
      .orderBy("id").collect()
    // doc 1 grams: shared(500) + tgtonly(666) + bigram "shared tgtonly"
    // (ct=1, cr=0 -> 666); mean = (500+666+666)/3 = 610
    assert(out(0).getLong(2) == 610L,
      s"exclusion semantics broken: ${out(0).getLong(2)}")
    // a target disjoint from the corpus passes through unchanged:
    // scoring the raw doc against itself as corpus keeps cr intact
    val ext = Seq((10L, "shared tgtonly")).toDF("id", "text")
    val out2 = SelectOps.dsirAffinityMil(df.filter($"id" === 2L), ext,
      "id", "text", buckets = 4096).collect()
    // doc 2 grams: shared (ct=1,cr=1 -> 500), rawword (ct=0,cr=1 -> 333),
    // bigram "shared rawword" (ct=0,cr=1 -> 333); mean = 1166/3 = 388
    assert(out2(0).getLong(2) == 388L)
  }

  test("DSIR integer scores equal a naive in-memory reference on random corpora") {
    // third implementation (after the Column expression and the DuckDB
    // oracle), driven over random corpora with the edge shapes a fixed
    // corpus never hits: empty/digit/unicode texts, single-token docs,
    // an empty target, target == whole pool (raw histogram empty)
    import org.scalacheck.Gen
    def md5hash60(s: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15),
      16)
    def gramBuckets(text: String, buckets: Int): Seq[Long] = {
      val ws = "[a-z]+".r.findAllIn(text.toLowerCase).toSeq
      val bg = ws.zip(ws.drop(1)).map { case (a, b) => s"$a $b" }
      (ws ++ bg).map(g => math.floorMod(md5hash60(g), buckets.toLong))
    }
    def naive(corpus: Seq[(Long, String)], targetIds: Set[Long],
              buckets: Int): Map[Long, (Int, Option[Long])] = {
      def hist(docs: Seq[(Long, String)]) = docs
        .flatMap(d => gramBuckets(d._2, buckets))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val ht = hist(corpus.filter(d => targetIds.contains(d._1)))
      val hr = hist(corpus.filterNot(d => targetIds.contains(d._1)))
      corpus.map { case (id, text) =>
        val gs = gramBuckets(text, buckets)
        val affs = gs.map { b =>
          val ct = ht.getOrElse(b, 0L); val cr = hr.getOrElse(b, 0L)
          (1000L * (ct + 1)) / (ct + cr + 2)
        }
        id -> (gs.size, if (gs.isEmpty) None else Some(affs.sum / gs.size))
      }.toMap
    }
    val word = Gen.oneOf("alpha", "beta", "gamma", "x", "zz", "the",
      "Ünïcode", "12", "a1b", "", "!?")
    val textGen = Gen.listOf(word).map(_.mkString(" "))
    var s = org.scalacheck.rng.Seed(7L)
    def next[A](g: Gen[A]): A = {
      val v = g.pureApply(Gen.Parameters.default, s); s = s.next; v
    }
    (1 to 8).foreach { round =>
      val n = next(Gen.choose(1, 12))
      val corpus = (1 to n).map(i => (i.toLong, next(textGen)))
      val tgtIds: Set[Long] = round match {
        case 1 => Set.empty // empty target: pure raw-rarity prior
        case 2 => corpus.map(_._1).toSet // target == pool: raw hist empty
        case _ => corpus.map(_._1).filter(_ => next(Gen.prob(0.3))).toSet
      }
      val want = naive(corpus, tgtIds, buckets = 64)
      val got = SelectOps.dsirAffinityMil(corpus.toDF("id", "text"),
          corpus.filter(d => tgtIds.contains(d._1)).toDF("id", "text"),
          "id", "text", buckets = 64)
        .collect()
        .map(r => r.getLong(0) ->
          (r.getInt(1), if (r.isNullAt(2)) None else Some(r.getLong(2))))
        .toMap
      assert(got == want,
        s"round $round (target=$tgtIds, corpus=$corpus): $got != $want")
    }
  }

  test("selection store: persisted policy scores a batch exactly like an in-memory fit") {
    val root = java.nio.file.Files.createTempDirectory("graft_selstore")
    val sink = new graft.sink.UpsertSink(spark, root.toString, numBuckets = 4)
    val archive = pool.filter($"id" <= 40)
    // target = ALL medical docs: the raw pool is then purely finance,
    // so medical grams sit high (~954) and finance grams low (~45) —
    // a clean admission split around the 520 gate
    val target = archive.filter($"id" <= 20)
    SelectOps.selectionStoreBuild(archive, target, "id", "text", sink,
      buckets = 64)
    // round-trip: the persisted dense (ct, cr) histograms derive exactly
    // affinityTableMil's output under the shared integer arithmetic
    val expected = SelectOps.affinityTableMil(
      target, archive.join(broadcast(target.select($"id")), Seq("id"),
        "left_anti"), "text", 64)
    val stored = sink.read("dsir_affinity")
      .as[(Int, Long, Long)].collect().sortBy(_._1)
    assert(stored.map(_._1).toSeq == (0 until 64),
      "persisted policy is not dense")
    assert(stored.map { case (_, ct, cr) =>
      (1000L * (ct + 1)) / (ct + cr + 2) }.toSeq == expected.toSeq,
      "persisted policy drifted from the in-memory fit")
    // batch scoring: medical-leaning docs admitted, finance not; the
    // scores must be exactly what scoring against `expected` yields
    val batch = Seq(
      (101L, "patient dosage clinical trial symptom diagnosis extra"),
      (102L, "market equity dividend portfolio hedge yield extra"),
      (103L, "")).toDF("id", "text")
    val out = SelectOps.selectionStoreScore(batch, "id", "text", sink,
        minMil = 520L)
      .orderBy("id")
      .as[(Long, Int, Option[Long], Int)].collect().toSeq
    assert(out.map(_._1) == Seq(101L, 102L, 103L))
    val med = out(0); val fin = out(1); val empty = out(2)
    assert(med._3.get > fin._3.get,
      s"in-domain batch doc must outscore off-domain: $out")
    assert(med._4 == 1 && fin._4 == 0,
      s"admission gate wrong at minMil=520: $out")
    assert(empty == ((103L, 0, None, 0)), s"gram-less row wrong: $empty")
  }

  test("selection store: a torn (non-dense) policy table is rejected loudly") {
    val root = java.nio.file.Files.createTempDirectory("graft_selstore_torn")
    val sink = new graft.sink.UpsertSink(spark, root.toString, numBuckets = 4)
    // bucket ids 0,2 with a hole at 1: collect() sees 2 rows and a
    // bucket id outside the dense 0..1 range
    sink.overwrite("dsir_affinity",
      Seq((0, 5L, 5L), (2, 7L, 3L)).toDF("bucket", "ct", "cr"),
      Seq("bucket"))
    val ex = intercept[IllegalArgumentException] {
      SelectOps.selectionStoreScore(
        Seq((1L, "a b")).toDF("id", "text"), "id", "text", sink)
    }
    assert(ex.getMessage.contains("torn"), s"wrong rejection: $ex")
  }

  test("null text propagates as null scores; never NPEs, never skews") {
    // the synthetic corpus has no null text, so neither the DuckDB
    // oracle nor the randomized reference exercises this edge
    val df = Seq((1L, "patient dosage clinical"), (2L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val t = df.filter($"id" === 1L)
    val out = SelectOps.dsirAffinityMil(df, t, "id", "text", buckets = 64)
      .orderBy("id").collect()
    assert(out(0).getLong(2) > 500) // scored row unaffected by the null
    assert(out(1).isNullAt(1) && out(1).isNullAt(2),
      "null text must yield null n_grams/dsir_mil, not 0 or a crash")
    val lw = SelectOps.dsirLogWeights(df, t, "id", "text", buckets = 64)
      .orderBy("id").collect()
    assert(lw(1).isNullAt(1) && lw(1).isNullAt(2))
    // perplexityScored simply has no row for it (no bigrams, no lang)
    val ps = SelectOps.perplexityScored(df, "id", "text").collect()
    assert(ps.map(_.getLong(0)).toSet == Set(1L))
  }

  test("log-weight form agrees with the integer form on domain ordering") {
    val lw = SelectOps.dsirLogWeights(pool, target, "id", "text", buckets = 512)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val medMin = (1L to 20L).map(lw).min
    val finMax = (21L to 40L).map(lw).max
    assert(medMin > finMax, "log weights lost the domain separation")
    // empty product convention: gram-less doc weighs exactly 0
    val e = SelectOps.dsirLogWeights(Seq((9L, "???")).toDF("id", "text"),
      target, "id", "text", buckets = 512).head()
    assert(e.getDouble(2) == 0.0)
  }

  test("Gumbel resample: seeded-deterministic, weight-monotone inclusion") {
    def draw(seed: Long) = SelectOps.dsirResample(pool, target, "id", "text",
      k = 10, seed = seed, buckets = 512).select("id")
      .collect().map(_.getLong(0)).toSet
    assert(draw(7L) == draw(7L), "same seed must reproduce the same sample")
    val seeds = (1L to 20L)
    val counts = seeds.flatMap(draw).groupBy(identity).view.mapValues(_.size)
    val medHits = (1L to 20L).map(id => counts.getOrElse(id, 0)).sum
    val finHits = (21L to 40L).map(id => counts.getOrElse(id, 0)).sum
    assert(medHits > finHits * 2,
      s"in-domain docs ($medHits hits) must dominate off-domain ($finHits)")
  }

  // --- perplexity buckets -------------------------------------------------

  // Per "language", a fluency GRADIENT: doc i keeps (19-i) copies of the
  // language's common sentence plus i one-off letter tokens, so score_ppm
  // is strictly decreasing in i — every score DISTINCT. (The threshold
  // path is tie-block granular while ntile splits ties by id, so
  // agreement between the two forms is only defined on distinct scores —
  // the documented tie rule; an earlier fixture with 9 identical docs per
  // tier measured exactly that undefined case.)
  private def junkTok(i: Int, j: Int) = ("x" * j) + "q" + ("z" * i)
  private def multiLang = {
    val en = (1 to 18).map { i =>
      val fluent = Seq.fill(19 - i)(
        "the plan is good and the team is strong").mkString(" ")
      val junk = (1 to i).map(j => junkTok(i, j)).mkString(" ")
      (i.toLong, s"$fluent $junk")
    }
    val de = (19 to 36).map { i =>
      val k = i - 18
      val fluent = Seq.fill(19 - k)(
        "der plan ist gut und der code ist gut").mkString(" ")
      val junk = (1 to k).map(j => "v" + junkTok(k, j)).mkString(" ")
      (i.toLong, s"$fluent $junk")
    }
    (en ++ de).toDF("doc_id", "text")
  }

  test("Gumbel resample is DISTRIBUTIONALLY correct: inclusion frequencies match Plackett-Luce within CLT bounds") {
    // Round-10 verdict #6: determinism and monotonicity were pinned,
    // but a sampler can be deterministic, monotone, and still draw
    // from the WRONG law. The Gumbel-max theorem gives the exact law:
    //  - k=1: P(doc i wins) = w_i / sum(w)          (softmax of log_w)
    //  - k=2 (without replacement, = Plackett-Luce): P(i in top-2)
    //      = p_i + sum_{j != i} p_j * w_i / (sum(w) - w_j)
    //    (first pick j, then i wins the renormalized remainder).
    // Bound derivation: across S independent seeds each doc's
    // inclusion count is Binomial(S, p); the CLT gives
    // |freq - p| <= z * sqrt(p(1-p)/S) with z = 4 (two-sided
    // P(miss) ~ 6e-5 per comparison, ~1e-3 over the 10 comparisons
    // here — a failure means the hash-derived noise is biased, not
    // bad luck). The 1e-6 grid the noise u lives on adds O(1e-6)
    // discretization error, negligible against the CLT term.
    // The noise column is the PRODUCTION expression (gumbelNoise is
    // shared with dsirResample), so this tests the sampler, not a
    // reimplementation.
    val weights = Seq(1.0, 2.0, 3.0, 6.0, 8.0)
    val wSum = weights.sum
    val docs = weights.zipWithIndex
      .map { case (w, i) => (i.toLong, math.log(w)) }
      .toDF("id", "log_w")
    val nSeeds = 2000
    val seeds = spark.range(nSeeds).select($"id".as("seed"))
    val keyed = docs.join(seeds) // 5 x 2000 rows — one tiny job
      .select($"id", $"seed",
        ($"log_w" + SelectOps.gumbelNoise($"id", $"seed")).as("sel_key"))
    val ranked = keyed.select($"id", $"seed",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("seed")
          .orderBy($"sel_key".desc, $"id")).as("rk"))
      .filter($"rk" <= 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    def freq(pred: ((Long, Long, Int)) => Boolean): Map[Long, Double] =
      ranked.filter(pred).groupBy(_._1).map { case (id, rows) =>
        id -> rows.length.toDouble / nSeeds }.withDefaultValue(0.0)
    val top1 = freq(_._3 == 1)
    val top2 = freq(_ => true) // rk <= 2 already filtered
    weights.zipWithIndex.foreach { case (w, i) =>
      val p1 = w / wSum
      val bound1 = 4.0 * math.sqrt(p1 * (1 - p1) / nSeeds)
      assert(math.abs(top1(i.toLong) - p1) <= bound1,
        f"doc $i top-1 freq ${top1(i.toLong)}%.4f vs p=$p1%.4f " +
          f"(bound $bound1%.4f) — biased noise")
      val p2 = p1 + weights.zipWithIndex.filter(_._2 != i).map {
        case (wj, _) => (wj / wSum) * (w / (wSum - wj))
      }.sum
      val bound2 = 4.0 * math.sqrt(p2 * (1 - p2) / nSeeds)
      assert(math.abs(top2(i.toLong) - p2) <= bound2,
        f"doc $i top-2 freq ${top2(i.toLong)}%.4f vs p=$p2%.4f " +
          f"(bound $bound2%.4f) — without-replacement law violated")
    }
  }

  test("perplexity tiers: heads outscore tails within every language") {
    val out = SelectOps.perplexityBuckets(multiLang, "doc_id", "text")
    val rows = out.collect()
    for (lang <- rows.map(_.getString(1)).distinct) {
      val of = rows.filter(_.getString(1) == lang)
      val head = of.filter(_.getString(3) == "head").map(_.getLong(2))
      val tail = of.filter(_.getString(3) == "tail").map(_.getLong(2))
      assert(head.nonEmpty && tail.nonEmpty, s"missing tiers for $lang")
      assert(head.min >= tail.max, s"head/tail inverted for $lang")
      // ntile keeps tiers balanced within 1
      val sizes = Seq("head", "middle", "tail")
        .map(b => of.count(_.getString(3) == b))
      assert(sizes.max - sizes.min <= 1, s"unbalanced tiers for $lang: $sizes")
    }
  }

  test("threshold (scale) path agrees with the exact window form") {
    // ONE LM pass feeds exact tiers, thresholds, and the scale path —
    // the FromScored forms exist so 100 TB never runs the LM twice
    val scored = SelectOps.perplexityScored(multiLang, "doc_id", "text")
    // the fixture guarantees distinct scores per language — agreement
    // is only defined on distinct scores (documented tie rule)
    val perLang = scored.collect()
      .groupBy(_.getString(1)).view.mapValues(_.map(_.getLong(2)).toSeq)
    perLang.foreach { case (lang, ss) =>
      assert(ss.distinct.size == ss.size, s"fixture has tied scores in $lang")
    }
    val exact = SelectOps.perplexityBucketsFromScored(scored, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    val th = SelectOps.perplexityThresholdsFromScored(scored)
    assert(th.count() <= 5, "thresholds must be one row per language")
    val approx = SelectOps.perplexityBucketsByThresholdFromScored(scored,
      "doc_id", th).collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(approx.keySet == exact.keySet)
    val agree = exact.keys.count(k => exact(k) == approx(k)).toDouble / exact.size
    assert(agree >= 0.8,
      f"threshold bucketing agrees with ntile on only $agree%.2f of docs")
    // and never disagrees by two tiers (head <-> tail flip)
    assert(!exact.keys.exists(k =>
      Set(exact(k), approx(k)) == Set("head", "tail")),
      "threshold path flipped a doc across two tiers")
  }

  test("a language with no thresholds buckets to NULL, not tail") {
    val scored = SelectOps.perplexityScored(multiLang, "doc_id", "text")
    val enOnly = SelectOps.perplexityThresholdsFromScored(
      scored.filter($"lang" === "en"))
    val out = SelectOps.perplexityBucketsByThresholdFromScored(scored,
      "doc_id", enOnly).collect()
    val de = out.filter(_.getString(1) == "de")
    assert(de.nonEmpty && de.forall(_.isNullAt(3)),
      "a language absent from the threshold table must get NULL buckets")
    val en = out.filter(_.getString(1) == "en")
    assert(en.forall(!_.isNullAt(3)))
  }

  // --- domain-centroid selection ------------------------------------------

  private def clusteredVecs = {
    val dim = 8
    def v(axis: Int, jitter: Int): Array[Float] =
      Array.tabulate(dim)(d =>
        (if (d == axis) 1.0f else 0.0f) + (jitter % 7) * 0.01f)
    val a = (1 to 30).map(i => (i.toLong, v(0, i)))
    val b = (31 to 60).map(i => (i.toLong, v(1, i)))
    (a ++ b).toDF("vec_id", "embedding")
  }

  test("domainTopK returns only the target cluster, ordered and bounded") {
    val corpus = clusteredVecs
    val tgt = corpus.filter($"vec_id" <= 5)
    val out = SelectOps.domainTopK(corpus, tgt, "vec_id", "embedding", 20)
      .collect()
    assert(out.length == 20)
    assert(out.forall(_.getLong(0) <= 30),
      "an off-cluster vector leaked into the domain top-k")
    val cs = out.map(_.getDouble(1))
    assert(cs.zip(cs.tail).forall { case (x, y) => x >= y }, "not ordered desc")
  }

  test("fixed-point centroid is bit-identical at any parallelism") {
    val corpus = clusteredVecs
    val tgt = corpus.filter($"vec_id" <= 7)
    val c1 = SelectOps.centroidMilFloat(tgt, "embedding")
    val c2 = SelectOps.centroidMilFloat(tgt.repartition(11), "embedding")
    assert(c1.toSeq == c2.toSeq, "centroid drifted across parallelism")
    assert(c1.length == 8)
    // negative components floor toward -inf identically (floorDiv, not /)
    val neg = Seq((1L, Array(-0.0015f, 0.5f)), (2L, Array(-0.0015f, 0.5f)))
      .toDF("vec_id", "embedding")
    val cn = SelectOps.centroidMilFloat(neg, "embedding")
    assert(cn(0) == -0.002f, s"negative floor division broke: ${cn(0)}")
  }

  test("domainTopK plan: no cartesian product, top-k never sorts globally") {
    val corpus = clusteredVecs
    val tgt = corpus.filter($"vec_id" <= 5)
    val plan = SelectOps.domainTopK(corpus, tgt, "vec_id", "embedding", 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(plan.contains("TakeOrderedAndProject"),
      "top-k should plan as TakeOrderedAndProject, not a global Sort")
  }
}
