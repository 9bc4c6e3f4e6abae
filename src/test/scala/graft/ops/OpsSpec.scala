package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** RelOps / TextOps unit behavior on small in-memory frames. */
class OpsSpec extends SparkSpec {

  import spark.implicits._

  test("latestByKey keeps exactly the newest row per key with tie-break") {
    val df = Seq(
      (1L, 10L, "a"), (1L, 20L, "b"), (1L, 20L, "c"), (2L, 5L, "d")
    ).toDF("k", "ver", "v")
    val out = RelOps.latestByKey(df, Seq("k"), Seq($"ver".desc, $"v".desc))
      .as[(Long, Long, String)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, 20L, "c"), (2L, 5L, "d")))
  }

  test("keysetPage returns the page strictly after the cursor, ordered") {
    val df = (1L to 50L).toDF("id")
    val page = RelOps.keysetPage(df, "id", 20L, 5).as[Long].collect()
    assert(page.toSeq == Seq(21L, 22L, 23L, 24L, 25L))
  }

  test("aboveHighWaterMark with lookback window") {
    val df = (1L to 100L).toDF("n")
    assert(RelOps.aboveHighWaterMark(df, df, "n", 0).as[Long].collect().isEmpty)
    // EMPTY mark table = no high-water mark yet: the first incremental
    // sync must bootstrap with ALL rows, not filter everything against
    // a null mark
    val noMark = Seq.empty[Long].toDF("n")
    assert(RelOps.aboveHighWaterMark(df, noMark, "n", 0)
      .as[Long].collect().sorted.toSeq == (1L to 100L))
    assert(RelOps.slidingWindow(df, "n", 10).as[Long].collect().sorted.toSeq
      == (91L to 100L))
  }

  test("enumDecode maps labels to codes, null otherwise") {
    val df = Seq("signup", "click", "bogus").toDF("t")
      .select(RelOps.enumDecode($"t", Seq("signup" -> 0, "click" -> 1)).as("c"))
    assert(df.as[Option[Int]].collect().toSeq == Seq(Some(0), Some(1), None))
  }

  test("shingles: trigrams, distinct, short-doc fallback") {
    val df = Seq("a b c d", "x y", "").toDF("t")
      .select(TextOps.shingles($"t", 3).as("s"))
    val out = df.as[Seq[String]].collect()
    assert(out(0) == Seq("a b c", "b c d"))
    assert(out(1) == Seq("x y")) // fewer than n tokens -> whole-token join
    assert(out(2) == Seq(""))
  }

  test("jaccard on shingle arrays") {
    val df = Seq(("a b c", "a b c"), ("a b", "c d")).toDF("x", "y")
      .select(TextOps.jaccard(
        TextOps.shingles($"x", 1), TextOps.shingles($"y", 1)).as("j"))
    assert(df.as[Double].collect().toSeq == Seq(1.0, 0.0))
  }

  test("minhash signatures: identical shingle sets get identical signatures") {
    val df = Seq((1L, "the quick brown fox jumps"), (2L, "the quick brown fox jumps"),
      (3L, "completely different words here now")).toDF("doc_id", "text")
    val sigs = TextOps.minhashSignatures(df, "doc_id", $"text", 3, 16)
      .collect().map(r => r.getLong(0) -> (1 to 16).map(r.getLong)).toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L) != sigs(3L))
  }

  test("simhash: identical docs hash identically; hamming(a,a)=0") {
    val df = Seq((1L, "alpha beta gamma"), (2L, "alpha beta gamma"),
      (3L, "delta epsilon zeta eta")).toDF("doc_id", "text")
    val s = TextOps.simhash(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(s(1L) == s(2L))
    assert(s.values.forall(v => v >= 0 && v < (1 << 16)))
    val d = Seq((s(1L), s(2L), s(3L))).toDF("a", "b", "c")
      .select(TextOps.hamming($"a", $"b"), TextOps.hamming($"a", $"c"))
      .as[(Int, Int)].head()
    assert(d._1 == 0)
  }

  test("langId picks the language with most marker hits, und on ties") {
    val df = Seq(
      "the cat and the dog of the house",  // en markers
      "der hund und die katze ist das",    // de markers
      "zzz qqq www")                       // nothing
      .toDF("text").select(TextOps.langId($"text").as("g"))
    assert(df.as[String].collect().toSeq == Seq("en", "de", "und"))
  }

  test("piiCounts / redactPii: typed masks, counts, null propagation") {
    val df = Seq(
      (1L, "mail a.b+c@ex-1.org or x@y.io, call +1 415-555-0042, host 10.0.0.1"),
      (2L, "no pii here at all"),
      (3L, null.asInstanceOf[String]),
      // 999.999.999.999 is still the IPv4 SHAPE (the pattern is a
      // detector, not a validator); 1.2.3 is not; user@192.168.0.1
      // has a numeric TLD so the email pattern must NOT take it
      (4L, "999.999.999.999 and 1.2.3 and user@192.168.0.1"))
      .toDF("doc_id", "text")
    val out = df.select(col("doc_id") +: TextOps.piiCounts(col("text")) :+
        TextOps.redactPii(col("text")).as("r"): _*)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else (r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4))))
      .toMap
    assert(out(1L) == ((2, 1, 1,
      "mail <EMAIL> or <EMAIL>, call <PHONE>, host <IP>")))
    assert(out(2L) == ((0, 0, 0, "no pii here at all")))
    assert(out(3L) == null)
    // email pattern must not swallow the host-part IP; IP detector is
    // shape-based; '1.2.3' stays
    assert(out(4L) == ((0, 0, 2, "<IP> and 1.2.3 and user@<IP>")))
  }

  test("filterLines drops short boilerplate lines, keeps content, is total") {
    val df = Seq(
      (1L, "the quick brown fox jumps high\nhome login menu\nanother full content line here\nok"),
      (2L, "no newline single line document"),
      (3L, ""),
      (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
        TextOps.filterLines(col("text"), TextOps.contentLine(4)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // 3-word 'home login menu' and 1-word 'ok' go; 6- and 5-word lines stay
    assert(out(1L) ==
      "the quick brown fox jumps high\nanother full content line here")
    assert(out(2L) == "no newline single line document")
    assert(out(3L) == "")   // one empty line, 0 tokens -> dropped -> empty doc
    assert(out(4L) == null) // null propagates
  }

  test("q72 pipeline shape is TOTAL on null text: (n_lines=1, n_kept=0, '')") {
    // Replicates the q72_line_filter catalog pipeline: when(size(toks)>0)
    // sends NULL text down the empty-array branch (size(NULL) is NULL,
    // which is falsy), so a NULL document lands on the same
    // (n_lines=1, n_kept=0, cleaned='') row as an empty one — the
    // contract the DuckDB oracle's COALESCE(w, []) mirrors exactly.
    val df = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, null.asInstanceOf[String]), (3L, ""))
      .toDF("doc_id", "text")
    val toks = TextOps.tokens(col("text"))
    val lines = when(size(toks) > 0,
      transform(sequence(lit(0), ceil(size(toks) / lit(6.0)).cast("int") - 1),
        i => array_join(slice(toks, i * 6 + 1, lit(6)), " ")))
      .otherwise(array().cast("array<string>"))
    val lined = array_join(flatten(transform(lines, (l, i) =>
      when(i % 2 === 0, array(lit("home login menu"), l))
        .otherwise(array(l)))), "\n")
    val out = df.select(col("doc_id"), lined.as("__t"))
      .select(col("doc_id"),
        size(TextOps.docLines(col("__t"))).as("n_lines"),
        size(filter(TextOps.docLines(col("__t")),
          TextOps.contentLine(4))).as("n_kept"),
        TextOps.filterLines(col("__t"), TextOps.contentLine(4)).as("c"))
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
    // 8 tokens -> lines [6-word, 2-word remainder]; boilerplate lands
    // before alternate lines (index%2==0) -> 3 lines; only the 6-word
    // line survives the >=4 gate
    assert(out(1L) == ((3, 1, "alpha beta gamma delta epsilon zeta")))
    assert(out(2L) == ((1, 0, "")))
    assert(out(3L) == ((1, 0, "")))
  }

  test("bigramLmScores: common-bigram docs outscore gibberish; totality") {
    val df = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat sat on the mat"),
      (3L, "the cat sat on the mat again"),
      (4L, "zq wv xj kp qz vw"),   // every bigram unseen elsewhere
      (5L, "one"),                 // < 2 tokens -> no bigrams
      (6L, ""))
      .toDF("doc_id", "text")
    val out = TextOps.bigramLmScores(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    assert(out(1L)._1 == 5 && out(4L)._1 == 5)
    // docs 1-3 share their bigrams (c12 = 3 each for the common ones);
    // doc 4's bigrams occur once each -> strictly lower smoothed prob
    assert(out(1L)._2 > out(4L)._2,
      s"fluent ${out(1L)._2} should outscore gibberish ${out(4L)._2}")
    assert(out(1L)._2 == out(2L)._2) // identical docs, identical score
    assert(out(5L) == ((0, -1L)) && out(6L) == ((0, -1L))) // null score, 0 bigrams
  }

  test("bigramLmScoresLn ranks like ppm on fluent vs disfluent, perplexity sane") {
    val df = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat sat on the mat"),
      (3L, "the cat sat on the mat again"),
      (4L, "zq wv xj kp qz vw"),
      (5L, "one"),
      (6L, ""))
      .toDF("doc_id", "text")
    val ln = TextOps.bigramLmScoresLn(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getInt(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    val ppm = TextOps.bigramLmScores(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    // same count/join subtree -> identical bigram counts and nullability
    assert(ln(1L)._1 == 5 && ln(4L)._1 == 5 && ln(5L)._1 == 0 && ln(6L)._1 == 0)
    assert(ln(5L)._2.isEmpty && ln(6L)._3.isEmpty)
    // ranking parity with the integer ppm score on every scored pair:
    // ln is a monotone transform of the same smoothed probabilities
    val scored = Seq(1L, 2L, 3L, 4L)
    for (a <- scored; b <- scored if a < b) {
      val byLn = ln(a)._2.get.compareTo(ln(b)._2.get).sign
      val byPpm = ppm(a).get.compareTo(ppm(b).get).sign
      assert(byLn == byPpm || byPpm == 0,
        s"ln/ppm ranking diverged on ($a,$b): ln=$byLn ppm=$byPpm")
    }
    assert(ln(1L)._2.get > ln(4L)._2.get, "fluent must out-rank gibberish in ln space")
    // perplexity = exp(-avg_ln_p), and avg ln p of probabilities is < 0
    for (id <- scored) {
      assert(ln(id)._2.get < 0.0)
      assert(math.abs(ln(id)._3.get - math.exp(-ln(id)._2.get)) < 1e-9)
      assert(ln(id)._3.get > 1.0) // smoothed probs < 1 => perplexity > 1
    }
    // identical docs, identical score (and gibberish is MORE perplexing)
    assert(ln(1L)._2 == ln(2L)._2)
    assert(ln(4L)._3.get > ln(1L)._3.get)
  }

  test("tokens unicode mode keeps digits and non-Latin; letters mode contract") {
    val df = Seq(
      (1L, "Hello WORLD 42 café δύο 模型7 données"),
      (2L, null.asInstanceOf[String]))
      .toDF("id", "t")
    val uni = df.select($"id",
        TextOps.tokens($"t", "unicode").as("u"),
        TextOps.tokens($"t", "letters").as("l"),
        TextOps.tokens($"t").as("d"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[String](1).toList,
         if (r.isNullAt(2)) null else r.getSeq[String](2).toList,
         if (r.isNullAt(3)) null else r.getSeq[String](3).toList)).toMap
    // unicode: every letter/number run survives, lowercased
    assert(uni(1L)._1 ==
      List("hello", "world", "42", "café", "δύο", "模型7", "données"))
    // letters: the historical [a-z]+ contract — accents/digits SPLIT runs
    assert(uni(1L)._2 == List("hello", "world", "caf", "donn", "es"))
    // tokens(c) and tokens(c, "letters") are the same function
    assert(uni(1L)._2 == uni(1L)._3)
    // null text propagates (regexp_extract_all is null-total)
    assert(uni(2L)._1 == null && uni(2L)._2 == null)
    // unknown mode fails fast at plan time, not silently as letters
    intercept[IllegalArgumentException] {
      TextOps.tokens($"t", "ascii")
    }
  }

  test("hashedLinearMargin: deterministic, additive, empty/null-total") {
    val df = Seq(
      (1L, "alpha beta"),
      (2L, "alpha beta"),
      (3L, "alpha beta alpha beta"), // multiplicity: exactly double
      (4L, ""),
      (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
        TextOps.hashedLinearMargin(col("text"), TextOps.pseudoWeight(_)).as("m"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else java.lang.Long.valueOf(r.getLong(1)))).toMap
    assert(out(1L) == out(2L))                       // deterministic
    assert(out(3L) == out(1L) * 2)                   // linear in counts
    assert(out(4L) == 0L)                            // empty doc -> 0 margin
    assert(out(5L) == null)                          // null text propagates
    // weights genuinely spread over both signs (a degenerate all-positive
    // table would make keep=margin>0 vacuous)
    val ws = (0L until 4096L).toDF("b")
      .select(TextOps.pseudoWeight(col("b"))).as[Long].collect()
    assert(ws.exists(_ < 0) && ws.exists(_ > 0) && ws.forall(w => w >= -500 && w <= 500))
  }

  test("quality score stays in [0,1000] and penalizes punctuation soup") {
    val df = Seq(
      "the quick brown fox is a good and long document about the things of life",
      "!!!###$$$%%%^^^&&&***((()))").toDF("text")
      .select(TextOps.qualityScoreMil($"text").as("q"))
    val Seq(good, bad) = df.as[Long].collect().toSeq
    assert(good > bad)
    assert(good <= 1000 && bad >= 0)
  }

  // tokens() keeps [a-z]+ only, so fixture words must be letter-only
  private def lw(p: String, i: Int): String =
    p + ('a' + (i - 1) % 26).toChar + ('a' + (i - 1) / 26).toChar

  test("segmentDedup drops cross-document boilerplate, keeps first occurrence") {
    val boiler = (1 to 25).map(lw("nav", _)).mkString(" ") // one full segment
    val bodyA = (1 to 25).map(lw("alpha", _)).mkString(" ")
    val bodyB = (1 to 25).map(lw("beta", _)).mkString(" ")
    val docs = Seq(
      (1L, s"$boiler $bodyA"),  // boilerplate first occurs here
      (2L, s"$boiler $bodyB"),  // same header: must be dropped
      (3L, boiler))             // doc that IS only boilerplate -> empty
      .toDF("doc_id", "text").repartition(3)
    val out = TextOps.segmentDedup(docs, "doc_id", "text", segWords = 25)
      .orderBy("doc_id")
      .as[(Long, Int, Int, String)].collect()
    assert(out(0) == ((1L, 2, 2, s"$boiler $bodyA")))
    assert(out(1) == ((2L, 2, 1, bodyB)), s"boilerplate survived: ${out(1)}")
    // totality: a fully-deduped doc still appears, with empty text
    assert(out(2) == ((3L, 1, 0, "")))
  }

  test("substringDedup removes shifted boilerplate q66's aligned segments miss") {
    val boiler = (1 to 25).map(lw("nav", _)).mkString(" ")    // 25 words
    val pre = (1 to 3).map(lw("pre", _)).mkString(" ")        // 3-word shift
    val bodyA = (1 to 10).map(lw("alpha", _)).mkString(" ")
    val bodyB = (1 to 10).map(lw("beta", _)).mkString(" ")
    val spanX = (1 to 20).map(lw("gam", _)).mkString(" ")     // exactly L
    val fill = (1 to 5).map(lw("fil", _)).mkString(" ")
    val docs = Seq(
      (1L, s"$boiler $bodyA"),       // first occurrence: survives whole
      (2L, s"$pre $boiler $bodyB"),  // SHIFTED +3 words: boiler still cut
      (3L, boiler),                  // all-boilerplate -> emptied, still present
      (4L, s"$spanX $fill $spanX"),  // WITHIN-doc repeat: 2nd span cut
      (5L, null.asInstanceOf[String])) // null text -> totality row
      .toDF("doc_id", "text").repartition(3)
    val out = TextOps.substringDedup(docs, "doc_id", "text", minTokens = 20)
      .orderBy("doc_id")
      .as[(Long, Int, Int, String)].collect()
    assert(out(0) == ((1L, 35, 0, s"$boiler $bodyA")))
    // exactly the 25 boilerplate tokens go; the 3-word prefix and body stay
    assert(out(1) == ((2L, 38, 25, s"$pre $bodyB")), s"shifted: ${out(1)}")
    assert(out(2) == ((3L, 25, 25, "")))
    assert(out(3) == ((4L, 45, 20, s"$spanX $fill")), s"within-doc: ${out(3)}")
    assert(out(4) == ((5L, 0, 0, "")))
  }

  test("substr store: probe cuts archive-seen spans at any offset; admit folds cumulative") {
    val root = java.nio.file.Files.createTempDirectory("graft_substrstore")
    val sink = new graft.sink.UpsertSink(spark, root.toString, numBuckets = 4)
    def words(prefix: String, n: Int) =
      (1 to n).map(i => prefix + ("a" * i)).mkString(" ")
    val boiler = words("boil", 8)
    val archive = Seq(
      (1L, s"$boiler ${words("tail", 4)}"),
      (2L, words("uniq", 6))).toDF("doc_id", "text")
    TextOps.substrStoreBuild(archive, "doc_id", "text", sink, minTokens = 5)
    // doc1: 12 tokens -> 8 windows; doc2: 6 -> 2; all distinct
    val inv = sink.read("substr_windows").as[(Array[Byte], Long)].collect()
    assert(inv.length == 10 && inv.map(_._2).sum == 10L,
      s"inventory wrong: ${inv.length} rows")
    val pre = words("pre", 2)
    val fresh = words("fresh", 6)
    val batch = Seq(
      (10L, s"$pre $boiler $fresh"), // boiler SHIFTED +2: still cut whole
      (11L, words("new", 8)),        // untouched
      (12L, words("tiny", 3)))       // below one window
      .toDF("doc_id", "text")
    val p = TextOps.substrStoreAdmit(batch, "doc_id", "text", sink,
        minTokens = 5)
      .as[(Long, Int, Int, String)].collect().sortBy(_._1).toSeq
    assert(p == Seq(
      (10L, 16, 8, s"$pre $fresh"),
      (11L, 8, 0, words("new", 8)),
      (12L, 3, 0, words("tiny", 3))), s"probe wrong: $p")
    // admit folded the batch in: a later batch repeating doc10's fresh
    // span (at a different offset) is screened against it
    val p2 = TextOps.substrStoreProbe(
        Seq((20L, s"$fresh ${words("later", 2)}")).toDF("doc_id", "text"),
        "doc_id", "text", sink, minTokens = 5)
      .as[(Long, Int, Int, String)].collect().toSeq
    assert(p2 == Seq((20L, 8, 6, words("later", 2))),
      s"cumulative screen wrong: $p2")
  }

  test("substr delta store: re-delivered admit is a no-op; totals screen exactly once") {
    val root = java.nio.file.Files.createTempDirectory("graft_substrdelta")
    val sink = new graft.sink.UpsertSink(spark, root.toString, numBuckets = 4)
    def words(prefix: String, n: Int) =
      (1 to n).map(i => prefix + ("a" * i)).mkString(" ")
    val shared = words("share", 6)   // in archive AND in batch1
    val b1only = words("bonly", 6)   // ONLY in batch1 (once)
    TextOps.substrDeltaBuild(
      Seq((1L, s"$shared ${words("arch", 4)}")).toDF("doc_id", "text"),
      "doc_id", "text", sink, minTokens = 5)
    val b1 = Seq((10L, s"$shared $b1only")).toDF("doc_id", "text")
    TextOps.substrDeltaAdmit(b1, "doc_id", "text", sink, batchId = 1L,
      minTokens = 5, minArchiveCount = 2)
    val snap1 = sink.read("substr_windows_delta")
      .as[(Array[Byte], Long, Long)].collect()
      .map(r => (r._1.toSeq, r._2, r._3)).sortBy(_.toString)
    // the RE-DELIVERY: same batch, same id — store must not move
    TextOps.substrDeltaAdmit(b1, "doc_id", "text", sink, batchId = 1L,
      minTokens = 5, minArchiveCount = 2)
    val snap2 = sink.read("substr_windows_delta")
      .as[(Array[Byte], Long, Long)].collect()
      .map(r => (r._1.toSeq, r._2, r._3)).sortBy(_.toString)
    assert(snap1.toSeq == snap2.toSeq,
      "re-delivered admit changed the store — the fold double-counted")
    // screen at total >= 2: `shared` (archive 1 + batch1 1 = 2) is cut;
    // `b1only` (1, and still 1 after the replay) must SURVIVE — an
    // additive fold would have pushed it to 2 and over-removed
    val p = TextOps.substrDeltaProbe(
        Seq((20L, s"$shared $b1only")).toDF("doc_id", "text"),
        "doc_id", "text", sink, minTokens = 5, minArchiveCount = 2)
      .as[(Long, Int, Int, String)].collect().toSeq
    assert(p == Seq((20L, 12, 6, b1only)), s"once-counted screen wrong: $p")
    // compaction folds settled batches into the archive row and
    // preserves the probe exactly
    val (before, after) = TextOps.substrDeltaCompact(sink, settledBefore = 1L)
    assert(after < before, s"compact dropped nothing: $before -> $after")
    val p2 = TextOps.substrDeltaProbe(
        Seq((21L, s"$shared $b1only")).toDF("doc_id", "text"),
        "doc_id", "text", sink, minTokens = 5, minArchiveCount = 2)
      .as[(Long, Int, Int, String)].collect().toSeq
    assert(p2 == Seq((21L, 12, 6, b1only)),
      s"compaction changed the screen: $p2")
  }

  test("chunkTokens: stride overlap, no redundant suffix chunk, every token covered") {
    val words = (1 to 40).map(lw("w", _))
    val docs = Seq((1L, words.mkString(" ")), (2L, "a b c"), (3L, ""))
      .toDF("doc_id", "text")
    val out = SampleOps.chunkTokens(docs, "doc_id", "text", size = 32, stride = 16)
      .orderBy("doc_id", "chunk_idx")
      .as[(Long, Int, Int, String)].collect()
    val d1 = out.filter(_._1 == 1L)
    // ceil(max(40-32,0)/16)+1 = 2 — NOT ceil(40/16)=3: a third chunk
    // (tokens 33..40) would be a strict suffix of chunk 1 (17..40),
    // pure duplicated training data
    assert(d1.length == 2)
    assert(d1(0)._3 == 32 && d1(0)._4 == words.take(32).mkString(" "))
    assert(d1(1)._3 == 24 && d1(1)._4 == words.drop(16).mkString(" "),
      "final chunk must reach the document end from the last stride start")
    // short doc: one short chunk; empty doc: no chunks
    assert(out.filter(_._1 == 2L).toSeq == Seq((2L, 0, 3, "a b c")))
    assert(!out.exists(_._1 == 3L))
  }

  test("minhash store: probe matches direct cross-set Jaccard; admit makes batches cumulative") {
    val root = java.nio.file.Files.createTempDirectory("graft_neardup")
    val sink = new graft.sink.UpsertSink(spark, root.toString, numBuckets = 4)
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val archive = Seq(
      (1L, base),
      (2L, base + " with a tiny tail edit"),
      (3L, "completely unrelated text about distributed query engines")
    ).toDF("doc_id", "text")
    val batch1 = Seq(
      (10L, base), // near-dup of 1 and 2
      (11L, "nothing in common with anything stored here at all today")
    ).toDF("doc_id", "text")
    TextOps.minhashStoreBuild(archive, "doc_id", "text", sink)
    // both store tables land as ONE generation
    assert(sink.groupId("neardup_bands").nonEmpty &&
      sink.groupId("neardup_bands") == sink.groupId("neardup_shingles"))
    val p1 = TextOps.minhashStoreAdmit(batch1, "doc_id", "text", sink,
        threshold = 0.5)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(p1 == Set((1L, 10L), (2L, 10L)),
      s"probe pairs wrong: $p1")
    // admit folded batch1 in: a later batch dedups against it too
    val batch2 = Seq((20L, base + " with one more word")).toDF("doc_id", "text")
    val p2 = TextOps.minhashStoreProbe(batch2, "doc_id", "text", sink,
        threshold = 0.5)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(p2 == Set((1L, 20L), (2L, 20L), (10L, 20L)),
      s"cumulative probe pairs wrong: $p2")
  }

  test("segment store: probe matches segmentDedup semantics cross-set; admit sums counts") {
    val root = java.nio.file.Files.createTempDirectory("graft_segstore")
    val sink = new graft.sink.UpsertSink(spark, root.toString, numBuckets = 4)
    // letters only: TextOps.tokens is [a-z]+, digits would collapse
    // every "w1 w2 ..." fixture into identical tokens
    def words(prefix: String, n: Int) =
      (1 to n).map(i => prefix + ("a" * i)).mkString(" ")
    val boiler = words("boiler", 4) // one exact 4-word segment
    val archive = Seq(
      (1L, boiler + " " + words("uniqa", 4)),
      (2L, boiler + " " + words("uniqb", 4))
    ).toDF("doc_id", "text")
    TextOps.segmentStoreBuild(archive, "doc_id", "text", sink, segWords = 4)
    // archive saw `boiler` twice, the unique tails once each
    val cnt = sink.read("segdedup_segs")
      .as[(String, Long)].collect().toMap
    assert(cnt.values.toSeq.sorted == Seq(1L, 1L, 2L))
    val batch = Seq(
      (10L, boiler + " " + words("fresh", 4)), // boiler dropped, tail kept
      (11L, words("allnew", 8))                // untouched
    ).toDF("doc_id", "text")
    val p = TextOps.segmentStoreAdmit(batch, "doc_id", "text", sink,
        segWords = 4)
      .as[(Long, Int, Int, String)].collect().sortBy(_._1).toSeq
    assert(p == Seq(
      (10L, 2, 1, words("fresh", 4)),
      (11L, 2, 2, words("allnew", 8))),
      s"probe output wrong: $p")
    // admit SUMMED the batch's 4 segment occurrences in (boiler now 3)
    val cnt2 = sink.read("segdedup_segs").as[(String, Long)].collect().toMap
    assert(cnt2.values.sum == cnt.values.sum + 4 &&
      cnt2.values.max == 3L, s"counts not summed: $cnt2")
    // and a later batch screens against batch1's segments too
    val p2 = TextOps.segmentStoreProbe(
        Seq((20L, words("fresh", 4) + " " + words("later", 4)))
          .toDF("doc_id", "text"),
        "doc_id", "text", sink, segWords = 4)
      .as[(Long, Int, Int, String)].collect().toSeq
    assert(p2 == Seq((20L, 2, 1, words("later", 4))),
      s"cumulative screen wrong: $p2")
  }

  test("segmentStoreCompact: drops the sub-threshold tail, preserves screening at >= minCount exactly") {
    val rootA = java.nio.file.Files.createTempDirectory("graft_segcompA")
    val rootB = java.nio.file.Files.createTempDirectory("graft_segcompB")
    val sinkA = new graft.sink.UpsertSink(spark, rootA.toString, numBuckets = 4)
    val sinkB = new graft.sink.UpsertSink(spark, rootB.toString, numBuckets = 4)
    def words(prefix: String, n: Int) =
      (1 to n).map(i => prefix + ("a" * i)).mkString(" ")
    val boiler = words("boiler", 4)
    val once = words("once", 4)
    val archive = Seq(
      (1L, boiler + " " + once),
      (2L, boiler + " " + words("uniqb", 4))
    ).toDF("doc_id", "text")
    TextOps.segmentStoreBuild(archive, "doc_id", "text", sinkA, segWords = 4)
    TextOps.segmentStoreBuild(archive, "doc_id", "text", sinkB, segWords = 4)
    val (kept, dropped) = TextOps.segmentStoreCompact(sinkA, minCount = 2)
    // boiler (cnt 2) survives; the two singleton tails are evicted
    assert((kept, dropped) == ((1L, 2L)), s"sizes wrong: ($kept, $dropped)")
    val batch = Seq(
      (10L, boiler + " " + once + " " + words("fresh", 4))
    ).toDF("doc_id", "text")
    def screen(sink: graft.sink.UpsertSink) =
      TextOps.segmentStoreProbe(batch, "doc_id", "text", sink,
          segWords = 4, minArchiveCount = 2)
        .as[(Long, Int, Int, String)].collect().toSeq
    val compacted = screen(sinkA)
    // parity: compaction to minCount=2 cannot change a >=2 screen
    assert(compacted == screen(sinkB), "compaction changed the screen")
    // and the screen itself: boiler (archive cnt 2) dropped; `once`
    // (archive cnt 1, below minArchiveCount) and fresh kept
    assert(compacted == Seq((10L, 3, 2, once + " " + words("fresh", 4))),
      s"screen wrong: $compacted")
  }

  test("fingerprint store + admissionScreen: gates independent, admitted is their conjunction") {
    val root = java.nio.file.Files.createTempDirectory("graft_admit")
    val sink = new graft.sink.UpsertSink(spark, root.toString, numBuckets = 4)
    val good = "the cat and the dog of the house sat in the big warm room " +
      "and the day was long and the light was good and the end was near"
    val archive = Seq((1L, good)).toDF("doc_id", "text")
    TextOps.fingerprintStoreBuild(archive, "doc_id", "text", sink)
    TextOps.segmentStoreBuild(archive, "doc_id", "text", sink)
    TextOps.minhashStoreBuild(archive, "doc_id", "text", sink)
    val batch = Seq(
      (10L, "  THE cat and the dog of the house sat in the big warm room " +
        "and the day was long and the light was good and the end was near  "),
      (11L, good.replace("near", "here")), // near-dup, not exact
      (12L, "der hund und die katze ist das haus und der tag war lang " +
        "und das licht war gut und das ende war nah so ist das eben gut"),
      (13L, "!!! ??? ... ;;;")
    ).toDF("doc_id", "text")
    val out = TextOps.admissionScreen(batch, "doc_id", "text", sink)
      .select("doc_id", "dup_exact", "neardup_hit", "lang", "admitted")
      .as[(Long, Int, Int, String, Int)].collect().sortBy(_._1).toSeq
    val byId = out.map(r => r._1 -> r).toMap
    // 10: exact dup (fingerprint is case/whitespace-normalized) — the
    // near-dup gate fires too (identical content), both independent
    assert(byId(10L)._2 == 1 && byId(10L)._3 == 1 && byId(10L)._5 == 0)
    // 11: one word changed — not exact, IS a near-dup
    assert(byId(11L)._2 == 0 && byId(11L)._3 == 1 && byId(11L)._5 == 0)
    // 12: german — fails only the language gate
    assert(byId(12L)._2 == 0 && byId(12L)._3 == 0 &&
      byId(12L)._4 == "de" && byId(12L)._5 == 0)
    // 13: punctuation soup — fails quality (and lang): not admitted
    assert(byId(13L)._5 == 0)
  }

  test("profile: exact per-column stats over one pass, nulls and ordering honest") {
    val df = Seq(
      (1L, Some(10.5), Some("b")),
      (2L, None, Some("a")),
      (3L, Some(2.25), None),
      (4L, Some(10.5), Some("a")),
      (5L, None, Some("c")))
      .toDF("id", "v", "s")
    val out = RelOps.profile(df, Seq("id", "v", "s"), exact = true)
      .as[(String, Long, Long, Long, String, String)].collect().toSeq
    assert(out == Seq(
      ("id", 5L, 0L, 5L, "1", "5"),
      // native numeric ordering: 2.25 < 10.5 (lexicographic would flip)
      ("s", 5L, 1L, 3L, "a", "c"),
      ("v", 5L, 2L, 2L, "2.25", "10.5")), s"profile wrong: $out")
    // approx mode: distinct within HLL bounds, everything else identical
    val ap = RelOps.profile(df, Seq("id", "v", "s"))
      .as[(String, Long, Long, Long, String, String)].collect()
      .map(r => r._1 -> r).toMap
    out.foreach { e =>
      val a = ap(e._1)
      assert((a._4 - e._4).abs <= math.max(1L, e._4 / 10),
        s"approx distinct off for ${e._1}: ${a._4} vs ${e._4}")
      assert((a._2, a._3, a._5, a._6) == ((e._2, e._3, e._5, e._6)))
    }
    // unknown columns rejected loudly
    val ex = intercept[IllegalArgumentException] {
      RelOps.profile(df, Seq("nope"))
    }
    assert(ex.getMessage.contains("no such columns"))
    // duplicate columns rejected loudly (they would otherwise fail later
    // with an opaque ambiguous-reference analysis error)
    val dup = intercept[IllegalArgumentException] {
      RelOps.profile(df, Seq("id", "v", "id"))
    }
    assert(dup.getMessage.contains("duplicate"))
    // nested columns rejected in exact mode: the canonical string image
    // is not injective for them (array('a, b') renders like array('a','b'))
    val nested = df.withColumn("arr", array($"s", $"s"))
    val nx = intercept[IllegalArgumentException] {
      RelOps.profile(nested, Seq("id", "arr"), exact = true)
    }
    assert(nx.getMessage.contains("non-atomic"))
    // ...but approx (HLL) mode profiles nested columns fine
    assert(RelOps.profile(nested, Seq("arr")).count() == 1)
  }

  test("saltedJoin equals the plain join on a skewed key (incl. misses)") {
    // 10k rows of one whale key + a long tail; dimension misses key 99
    val big = ((1 to 10000).map(_ => 1L) ++ (2L to 99L)).toDF("k")
      .withColumn("v", $"k" * 10)
    val dim = (1L to 98L).map(k => (k, s"d$k")).toDF("k", "name")
    val plain = big.join(dim, Seq("k")).select("k", "v", "name")
    val salted = RelOps.saltedJoin(big, dim, Seq("k"), buckets = 8)
      .select("k", "v", "name")
    assert(salted.count() == plain.count())
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
    // left-join misses survive exactly once per big row
    val left = RelOps.saltedJoin(big, dim, Seq("k"), buckets = 8, joinType = "left")
    assert(left.filter($"k" === 99L).count() == 1)
    assert(left.count() == big.count())
  }

  test("bm25Scores: idf weighting, tf saturation, length normalization") {
    val filler = (1 to 40).map(i => s"pad$i").mkString(" ")
    val df = Seq(
      (1L, "vector stream"),                    // two terms, short doc
      (2L, "vector vector vector vector"),      // stuffed single term
      (3L, "vector"),                           // single occurrence, short
      (4L, s"vector $filler"),                  // same tf, much longer doc
      (5L, "merge"),                            // rare term (df=1)
      (6L, filler))                             // no terms -> no row
      .toDF("doc_id", "text")
    val out = TextOps.bm25Scores(df, "doc_id", "text",
        Seq("vector", "merge", "stream"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(!out.contains(6L), "termless doc must not be scored")
    // two distinct terms beat one (idf sums across terms)
    assert(out(1L) > out(3L))
    // tf saturation: 4x the tf must score higher, but NOWHERE near 4x
    assert(out(2L) > out(3L) && out(2L) < out(3L) * 2.5,
      s"saturation violated: tf4=${out(2L)} vs tf1=${out(3L)}")
    // length normalization: same tf in a longer doc scores strictly lower
    assert(out(4L) < out(3L),
      s"length norm violated: long=${out(4L)} vs short=${out(3L)}")
    // rare 'merge' (df=1) outweighs common 'vector' (df=4) at equal tf
    assert(out(5L) > out(3L))
  }

  test("rrfFuse: both-list docs sum reciprocals, single-list docs keep one") {
    val a = Seq((1L, 9.0), (2L, 8.0), (3L, 7.0)).toDF("doc_id", "score")
    val b = Seq((2L, 0.9), (4L, 0.8)).toDF("doc_id", "score")
    val out = TextOps.rrfFuse(a, b, "doc_id", n = 2, k0 = 60)
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)), r.getDouble(3))).toMap
    // doc 3 fell off a's top-2; doc 2 is rank 2 in a AND rank 1 in b
    assert(!out.contains(3L))
    assert(out(1L) == ((Some(1), None, 1.0 / 61)))
    assert(out(2L) == ((Some(2), Some(1), 1.0 / 62 + 1.0 / 61)))
    assert(out(4L) == ((None, Some(2), 1.0 / 62)))
  }

  test("intervalJoin matches the naive BETWEEN join at every bucket width") {
    import java.sql.Timestamp
    def ts(min: Long): Timestamp = new Timestamp(min * 60000L)
    val events = Seq((1L, ts(0)), (2L, ts(59)), (3L, ts(60)), (4L, ts(61)),
      (5L, ts(119)), (6L, ts(3000))).toDF("eid", "t")
    val windows = Seq(
      (10L, ts(30), ts(90)),    // straddles an hour-bucket boundary
      (11L, ts(60), ts(60)),    // degenerate single-instant window
      (12L, ts(200), ts(100)),  // malformed: end < start -> matches nothing
      (13L, ts(2990), ts(3010))
    ).toDF("wid", "s", "e")
    val naive = events.join(windows,
        col("t") >= col("s") && col("t") <= col("e"))
      .select("eid", "wid").as[(Long, Long)].collect().toSet
    // boundary events land inclusively on both ends
    assert(naive.contains((2L, 10L)) && naive.contains((3L, 11L)) &&
      naive.contains((6L, 13L)) && !naive.exists(_._2 == 12L))
    for (w <- Seq(60L, 3600L, 7L)) { // incl. a width that misaligns everything
      val got = RelOps.intervalJoin(events, "t", windows, "s", "e",
          bucketWidthSec = w)
        .select("eid", "wid").as[(Long, Long)].collect()
      assert(got.length == got.toSet.size, s"width $w produced duplicate pairs")
      assert(got.toSet == naive, s"width $w diverged from BETWEEN")
    }
    // round-8 advice: shared column names would survive the join twice
    // (every downstream reference ambiguous) — rejected loudly
    val err = intercept[IllegalArgumentException] {
      RelOps.intervalJoin(events, "t",
        windows.withColumnRenamed("wid", "eid"), "s", "e")
    }
    assert(err.getMessage.contains("disjoint column names"))
    // ...and a caller's own __ib column is never silently replaced: the
    // working column dodges it, and the caller's values survive intact
    val withIb = RelOps.intervalJoin(
        events.withColumn("__ib", col("eid") * 1000), "t",
        windows, "s", "e", bucketWidthSec = 60L)
      .select("eid", "wid", "__ib").as[(Long, Long, Long)].collect()
    assert(withIb.map(t => (t._1, t._2)).toSet == naive)
    assert(withIb.forall(t => t._3 == t._1 * 1000),
      "caller's __ib column was clobbered by the working bucket column")
  }
}
