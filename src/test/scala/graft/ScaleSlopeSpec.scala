package graft

/** The scale-slope audit's machinery, pinned deterministically, plus a
  * live two-SF growth measurement of representative shuffle-heavy
  * queries. The authoritative audit runs inside every full Bench
  * invocation (top-20 queries, sf0.001/sf0.01 decades vs the bench
  * SF) and lands in the bench artifact's `scale` section — this spec
  * guarantees the judge/warn wiring cannot rot and that the growth
  * bound itself holds where a spec can afford to measure it.
  */
class ScaleSlopeSpec extends SparkSpec {

  test("siblingDirs derives the two smaller existing SF decades, ascending") {
    val dirs = ScaleSlope.siblingDirs("/root/testdata/sf0.1")
    assert(dirs.map(_._1) == Seq("sf0.001", "sf0.01"), dirs.toString)
    assert(dirs.forall(d => d._2.endsWith(d._1)))
    // the smallest SF has no smaller siblings on disk
    assert(ScaleSlope.siblingDirs("/root/testdata/sf0.001").isEmpty)
    // non-sf dirs opt out silently (slope audit off, never a crash)
    assert(ScaleSlope.siblingDirs("/tmp").isEmpty)
    assert(ScaleSlope.siblingDirs("/root/testdata/sfoo").isEmpty)
  }

  test("immediateSibling: only the sf/10 decade qualifies as the verdict denominator") {
    // with sf0.01 missing but sf0.001 present, a two-decade ratio
    // judged against the one-decade threshold would flag every linear
    // expensive query — the verdict denominator must be sf/10 or none
    assert(ScaleSlope.immediateSibling("/root/testdata/sf0.1")
      .map(_._1) == Some("sf0.01"))
    assert(ScaleSlope.immediateSibling("/root/testdata/sf0.001").isEmpty)
    assert(ScaleSlope.immediateSibling("/tmp").isEmpty)
  }

  test("judge: linear growth passes, quadratic flags, the overhead floor protects small queries") {
    // linear with overhead: 10x data, ~6x time — well under 13x
    assert(!ScaleSlope.judge("q", midSec = 1.0, benchSec = 6.0).superlinear)
    // quadratic: 10x data, ~100x time — flagged
    assert(ScaleSlope.judge("q", midSec = 0.5, benchSec = 50.0).superlinear)
    // the floor: a mid-SF time in the overhead regime (< MinDenomSec)
    // cannot flag anything cheaper than maxRatio x floor at bench SF
    assert(!ScaleSlope.judge("q", midSec = 0.01, benchSec = 1.5).superlinear)
    assert(ScaleSlope.judge("q", midSec = 0.01, benchSec = 4.0).superlinear)
    // exemption rides the verdict; warnings() suppresses it
    val v33 = ScaleSlope.judge("q33_embed_neardup", 0.3, 30.0)
    assert(v33.superlinear && v33.exempt)
    val warns = ScaleSlope.warnings(Map(
      "q33_embed_neardup" -> v33,
      "q_bad" -> ScaleSlope.judge("q_bad", 0.5, 50.0),
      "q_ok" -> ScaleSlope.judge("q_ok", 1.0, 6.0)))
    assert(warns == Seq("q_bad"), warns.toString)
  }

  test("every exempt query exists in the catalog and documents its reason") {
    ScaleSlope.Exempt.foreach { case (name, why) =>
      assert(SparkEntry.queries.contains(name), s"exempt '$name' not a query")
      assert(why.length > 30, s"exemption for $name lacks a real reason")
    }
  }

  test("live growth bound: shuffle-heavy queries stay ~linear across the sf0.001 -> sf0.01 decade") {
    // The spec-affordable slice of the real audit: three queries whose
    // plans carry the engine's scale-critical shapes (banded near-dup
    // join, connected components, corpus window dedup) measured over
    // one real 10x decade. The bound is deliberately generous (2x the
    // harness bound) because at these tiny SFs overhead dominates and
    // box contention is real — this is the catastrophic-superlinearity
    // tripwire; the tight 13x bound runs in Bench where the decade is
    // 100x bigger.
    val probes = Seq("q29_dedup_minhash", "q59_dup_clusters",
      "q68_substring_dedup")
    def run(name: String, dir: String): Double = {
      def once(): Double = {
        val t0 = System.nanoTime()
        Catalog.byName(name).fn(spark, dir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warmup (codegen, file listing)
      math.min(once(), once())
    }
    probes.foreach { name =>
      val small = run(name, "/root/testdata/sf0.001")
      val mid = run(name, "/root/testdata/sf0.01")
      val ratio = mid / math.max(small, ScaleSlope.MinDenomSec)
      assert(ratio <= 2 * ScaleSlope.maxRatio,
        f"$name grew ${ratio}%.1fx across a 10x decade " +
          f"($small%.2fs -> $mid%.2fs) — superlinear term suspected")
    }
  }
}
