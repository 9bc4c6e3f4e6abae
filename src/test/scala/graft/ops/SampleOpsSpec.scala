package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Deterministic sampling/splitting + corpus-hygiene operators. */
class SampleOpsSpec extends SparkSpec {

  import spark.implicits._

  test("splitLabel covers every row, roughly at the configured weights") {
    val df = (1L to 10000L).toDF("id")
      .select($"id", SampleOps.splitLabel($"id",
        Seq("train" -> 80, "val" -> 10, "test" -> 10)).as("split"))
    val counts = df.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.values.sum == 10000L)
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts("train") > 7500 && counts("train") < 8500)
    assert(counts("val") > 700 && counts("val") < 1300)
    assert(counts("test") > 700 && counts("test") < 1300)
  }

  test("splitLabel membership is stable under corpus growth") {
    def labels(n: Long): Map[Long, String] = (1L to n).toDF("id")
      .select($"id", SampleOps.splitLabel($"id", Seq("a" -> 50, "b" -> 50)).as("s"))
      .as[(Long, String)].collect().toMap
    val small = labels(100)
    val big = labels(5000)
    assert(small.forall { case (id, s) => big(id) == s })
  }

  test("stratifiedSample keeps per-stratum rates; unknown strata drop") {
    val df = (1L to 4000L).map(i => (i, if (i % 2 == 0) "en" else "xx"))
      .toDF("id", "lang")
    val kept = SampleOps.stratifiedSample(df, "id", "lang", Map("en" -> 250))
      .as[(Long, String)].collect()
    assert(kept.forall(_._2 == "en"))
    assert(kept.length > 300 && kept.length < 700) // ~25% of 2000
    // deterministic: same input -> same rows
    val again = SampleOps.stratifiedSample(df, "id", "lang", Map("en" -> 250))
      .as[(Long, String)].collect()
    assert(kept.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("jaccardNearDupPairs matches exhaustive all-pairs Jaccard exactly") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    def doc(): String = Seq.fill(12)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val base = (1L to 30L).map(i => (i, doc()))
    // plant two near-dup pairs: identical and one-word-edit copies
    val docs = base ++ Seq((31L, base.head._2),
      (32L, base(1)._2.replaceFirst("\\w+", "omega")))
    val df = docs.toDF("doc_id", "text")

    val got = TextOps.jaccardNearDupPairs(df, "doc_id", "text", 3, 0.5)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet

    // exhaustive reference on the driver
    def sh(t: String): Set[String] = {
      val w = t.split(" ").toSeq
      if (w.size < 3) Set(w.mkString(" "))
      else w.sliding(3).map(_.mkString(" ")).toSet
    }
    val exp = (for {
      (a, ta) <- docs; (b, tb) <- docs if a < b
      j = sh(ta).intersect(sh(tb)).size.toDouble / sh(ta).union(sh(tb)).size
      if j >= 0.5
    } yield (a, b)).toSet
    assert(got == exp)
    assert(exp.contains((1L, 31L))) // the planted identical pair qualifies
  }

  test("packBins two-level prefix sum matches the naive global cumsum") {
    val df = (1L to 500L).map(i => (i, 30 + (i % 7) * 10)).toDF("id", "ntok")
    val got = SampleOps.packBins(df, "id", $"ntok", 256, bucketBits = 4)
      .select("id", "bin").as[(Long, Long)].collect().toMap

    // naive reference: order by (hash, id), running pre-sum, floor-div
    val hashes = df.select($"id",
      TextOps.stableHash64($"id".cast("string")).as("h"))
      .as[(Long, Long)].collect().toMap
    var acc = 0L
    val exp = (1L to 500L).map(i => (i, 30 + (i % 7) * 10))
      .sortBy { case (i, _) => (hashes(i), i) }
      .map { case (i, n) => val b = acc / 256; acc += n; (i, b) }.toMap
    assert(got == exp)
    // bins are contiguous from 0
    val bins = got.values.toSet
    assert(bins.min == 0L && bins.max == bins.size - 1L)
  }

  test("prefix-filter join equals brute force across thresholds and doc shapes") {
    // tiny vocab + short docs force a dense jaccard spectrum (0..1) and
    // exercise the <n-token fallback, the ceil boundary in the prefix
    // length, and the PPJoin length filter at several thresholds
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    def sh(t: String): Set[String] = {
      val w = t.split(" ").filter(_.nonEmpty).toSeq
      if (w.size < 3) Set(w.mkString(" "))
      else w.sliding(3).map(_.mkString(" ")).toSet
    }
    // 0.34 and 0.56 are rounding-hostile: t*n lands just above an integer
    // in IEEE doubles (0.56*25 = 14.000000000000002), which would shorten
    // the prefix by one without the epsilon guard in jaccardNearDupPairs
    for (seed <- Seq(11, 42); threshold <- Seq(0.34, 0.4, 0.5, 0.56, 0.7, 0.9)) {
      val rnd = new scala.util.Random(seed)
      val docs = (1L to 25L).map { i =>
        val len = 1 + rnd.nextInt(14)
        (i, Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val got = TextOps.jaccardNearDupPairs(docs.toDF("doc_id", "text"),
          "doc_id", "text", 3, threshold)
        .select("a_id", "b_id").as[(Long, Long)].collect().toSet
      val exp = (for {
        (a, ta) <- docs; (b, tb) <- docs if a < b
        j = sh(ta).intersect(sh(tb)).size.toDouble / sh(ta).union(sh(tb)).size
        if j >= threshold
      } yield (a, b)).toSet
      assert(got == exp, s"seed=$seed t=$threshold: got ${got.size}, expected ${exp.size}; " +
        s"missing=${exp -- got} extra=${got -- exp}")
    }
  }

  test("mixtureSample lands near the budget at the target mixture") {
    // 3000 en / 600 de / 400 fr — heavily skewed toward en
    val df = ((1L to 3000L).map((_, "en")) ++ (3001L to 3600L).map((_, "de")) ++
      (3601L to 4000L).map((_, "fr"))).toDF("id", "lang")
    val kept = SampleOps.mixtureSample(df, "id", "lang",
      Map("en" -> 500, "de" -> 300, "fr" -> 200), budgetDocs = 1000L)
      .select("id", "lang").as[(Long, String)].collect()
    val by = kept.groupBy(_._2).view.mapValues(_.length).toMap
    // expected ~500 en, ~300 de, ~200 fr; md5 buckets are uniform-ish
    assert(by("en") > 400 && by("en") < 600, s"en=${by("en")}")
    assert(by("de") > 220 && by("de") < 380, s"de=${by("de")}")
    assert(by("fr") > 140 && by("fr") < 260, s"fr=${by("fr")}")
    // deterministic
    val again = SampleOps.mixtureSample(df, "id", "lang",
      Map("en" -> 500, "de" -> 300, "fr" -> 200), budgetDocs = 1000L)
      .select("id").as[Long].collect().toSet
    assert(kept.map(_._1).toSet == again)
  }

  test("mixtureSample caps over-requested strata at keep-everything") {
    // de has only 50 docs but the mixture asks for 500 of them
    val df = ((1L to 2000L).map((_, "en")) ++ (2001L to 2050L).map((_, "de")))
      .toDF("id", "lang")
    val kept = SampleOps.mixtureSample(df, "id", "lang",
      Map("en" -> 500, "de" -> 500), budgetDocs = 1000L)
      .select("id", "lang").as[(Long, String)].collect()
    assert(kept.count(_._2 == "de") == 50) // rate capped at 1000 per-mille
    val en = kept.count(_._2 == "en")
    assert(en > 400 && en < 600)
  }

  test("curriculumRank equals the naive global row_number") {
    import org.apache.spark.sql.expressions.Window
    val df = (1L to 800L).map(i => (i, s"doc $i " + ("x " * (i % 13).toInt)))
      .toDF("doc_id", "text")
    val score = TextOps.qualityScoreMil($"text")
    val got = SampleOps.curriculumRank(df, "doc_id", score, bucketBits = 3)
      .select("doc_id", "rank").as[(Long, Long)].collect().toMap
    val naive = df.select($"doc_id", score.as("s"),
        TextOps.stableHash64($"doc_id".cast("string")).as("h"))
      .withColumn("rank", row_number().over(
        Window.orderBy(col("s").desc, col("h"), col("doc_id"))).cast("long"))
      .select("doc_id", "rank").as[(Long, Long)].collect().toMap
    assert(got == naive)
    // ranks are a permutation of 1..n
    assert(got.values.toSeq.sorted == (1L to 800L))
  }

  test("curriculumRank is invariant to input partitioning") {
    val df = (1L to 300L).map(i => (i, i % 5)).toDF("id", "q")
    def run(parts: Int): Map[Long, Long] =
      SampleOps.curriculumRank(df.repartition(parts), "id", $"q", bucketBits = 2)
        .select("id", "rank").as[(Long, Long)].collect().toMap
    assert(run(1) == run(13))
  }

  test("contaminationHits counts shared distinct 5-grams; decontaminate drops hits") {
    val bench = Seq((100L, "one two three four five six")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "one two three four five seven"), // shares "one two three four five"
      (2L, "totally unrelated words in this document here"),
      (3L, "zzz one two three four five six yyy") // shares 2 distinct 5-grams
    ).toDF("doc_id", "text")

    val hits = TextOps.contaminationHits(corpus, bench, "doc_id", "text", 5)
      .as[(Long, Long)].collect().toMap
    assert(hits == Map(1L -> 1L, 3L -> 2L))

    val clean = TextOps.decontaminate(corpus, bench, "doc_id", "text", 5)
      .select("doc_id").as[Long].collect().toSet
    assert(clean == Set(2L))
  }
}
