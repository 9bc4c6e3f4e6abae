package graft

import java.lang.management.ManagementFactory
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Benchmark main: runs every catalog query against
  * `SPARK_GRAFT_SF_DIR`, prints ONE JSON line with per-query seconds,
  * and writes the full artifact to a FILE (`target/bench.json`, or
  * `SPARK_GRAFT_BENCH_OUT`). The file is the authoritative artifact:
  * stdout arrives wrapped in the build tool's log prefix (`[info] `)
  * and tail-capture windows, both of which have broken machine parsing
  * of the stdout line in past rounds; a file has neither problem.
  *
  * Each query is forced through the `noop` sink so the whole result is
  * materialized (`count()` would let Catalyst prune projection-only
  * plans down to a row count). One untimed warmup run amortizes codegen
  * and file-listing.
  *
  * Timing is the MINIMUM of `SPARK_GRAFT_BENCH_PASSES` (default 3)
  * timed passes per query: the minimum is the best estimator of the
  * machine-load-free cost, so a run contaminated by concurrent load on
  * the box still reports the clean number as long as any single pass ran
  * unimpeded. The file artifact additionally records EVERY pass's time
  * (`times`) and per-query GC milliseconds, so a contaminated pass is
  * visible from the artifact alone (min ≪ max ⇒ load, not the plan) —
  * plus per-query JIT-compilation-time deltas and code-cache occupancy
  * (`jit_ms`, `code_cache_mb` vs `code_cache_max_mb`), and a
  * `band_exceeded` map against checked-in known-good per-query bands
  * (`bench_bands.properties`), so the BENCH_r08 failure mode — code
  * cache full, compiler disabled, codegen running interpreted at 5-15x
  * — is diagnosable from the artifact with no re-run.
  *
  * After the timed loop, the SCALE-SLOPE audit ([[ScaleSlope]])
  * re-times the TopN most expensive queries at the smaller sibling
  * SFs and records each query's top-decade growth ratio in the
  * artifact (`scale`, `slope_warn`, `slope_exempt`) — the measured
  * answer to "would this plan survive a 10x data decade", judged
  * against ~1.3x-linear with explicit exemptions. Runs after the
  * timed passes so it can never contaminate the headline numbers.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "3").toInt.max(2)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "target/bench.json")
    val spark = GraftSession.create()
    val gcBeans = ManagementFactory.getGarbageCollectorMXBeans.asScala
    def gcMillis(): Long = gcBeans.map(_.getCollectionTime.max(0L)).sum
    // JIT self-diagnosis (BENCH_r08 post-mortem): a full-catalog JVM that
    // exhausts its code cache stops compiling and runs codegen-heavy
    // scans interpreted at 5-15x — and the only way to see that from the
    // artifact was inference. Record, per query, (a) cumulative JIT
    // compilation time (a delta that flatlines while wall time climbs =
    // compilation ceased) and (b) code-cache occupancy out of its
    // reserved max (>=95% without flushing = compiler disabled).
    val codeHeaps = ManagementFactory.getMemoryPoolMXBeans.asScala
      .filter(p => p.getName.contains("CodeHeap") || p.getName.contains("CodeCache"))
    def codeCacheUsedMb(): Long =
      codeHeaps.map(_.getUsage.getUsed).sum >> 20
    val codeCacheMaxMb: Long = codeHeaps.map(_.getUsage.getMax.max(0L)).sum >> 20
    val jitBean = Option(ManagementFactory.getCompilationMXBean)
      .filter(_.isCompilationTimeMonitoringSupported)
    def jitMillis(): Long = jitBean.map(_.getTotalCompilationTime).getOrElse(0L)
    // Expected per-query upper bounds (seconds) for a HEALTHY pass —
    // checked-in known-good numbers x3 headroom (see the resource's
    // header). A min-of-passes above its band means this JVM could not
    // reproduce a number it has already achieved: flag it loudly in the
    // artifact and on stderr so a degraded run is identifiable without
    // re-running anything. One shared loader with CatalogSpec's
    // band-sync guard, so the format cannot drift between them.
    val bands: Map[String, Double] = BenchBands.load()
    def force(name: String, dir: String = sfDir): Unit =
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
    // ---- calibration probe (round-16, r15 verdict "What's wrong #1"):
    // a FIXED deterministic CPU+shuffle microbench, catalog-external,
    // timed at suite start, at suite end, and alongside every floor
    // redraw — so an above-threshold redraw can be adjudicated FROM THE
    // ARTIFACT (redraw slow + calibration slow = the box, not the
    // plan; redraw slow + calibration at its start-of-suite reading =
    // regression suspected). 24M xxhash64 rows through one 512-way
    // hash aggregate: big enough to exercise codegen, shuffle write/
    // read, and all 32 slots (~1 s clean); no data dependence, no
    // caching effects (nothing to cache), bit-identical work each call.
    def calibrate(): Double = {
      import org.apache.spark.sql.functions._
      val t0 = System.nanoTime()
      spark.range(0L, 24000000L, 1L, 32)
        .select(pmod(xxhash64(col("id")), lit(512L)).as("k"),
          // modular before summing: an ANSI sum of 24M raw 64-bit
          // hashes overflows Long
          pmod(xxhash64(col("id") + lit(1L)), lit(1000000007L)).as("h"))
        .groupBy("k").agg(sum(col("h")).as("s"), count(lit(1)).as("c"))
        .agg(sum(col("s")), sum(col("c")))
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // two untimed warmups: the first full-catalog runs showed a single
    // warmup leaves the start reading ~1.8x the probe's settled value
    // (JIT still compiling the aggregate paths) — a polluted baseline
    // would make every later contention ratio read low
    calibrate(); calibrate()
    val calStart = Seq(calibrate(), calibrate(), calibrate()).min
    // SPARK_GRAFT_BENCH_ONLY=q64_stream_admit,q65_salted_skew_join
    // restricts the run for iterating on one query's cost — the official
    // artifact never sets it. Names must match EXACTLY (a prefix like
    // "q6" used to silently select q60–q67); unknown names fail loudly.
    // A set-but-empty var means "no filter", not "run nothing" — an
    // empty run would emit a plausible zero-total artifact.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .filter(_.nonEmpty)
    only.foreach { o =>
      val unknown = o -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"SPARK_GRAFT_BENCH_ONLY names not in the catalog: ${unknown.toSeq.sorted.mkString(", ")}")
    }
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    names.foreach(n => try force(n) catch { case _: Throwable => () }) // warmup
    // a failing query must NOT record its near-zero failure latency as a
    // benchmark time (a broken build would "benchmark" faster than a
    // working one): failures are reported in their own artifact field
    // and excluded from the per-query map and the total
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    case class QResult(name: String, min: Double, times: Seq[Double],
                       gcMs: Long, jitMs: Long, ccUsedMb: Long,
                       bandExceeded: Option[Double], extraPasses: Int,
                       spreadPasses: Int)
    // A min-of-passes above its band gets up to this many EXTRA passes
    // before the flag sticks: a transient co-tenant spike (the
    // documented 8-20x box-contention swings) often passes within the
    // run, and one clean pass is all a min needs — while a genuinely
    // degraded JVM (dead compiler) fails the retries too and keeps the
    // flag. Bounded, and only for flagged queries, so a healthy run
    // pays nothing.
    val bandRetries =
      sys.env.get("SPARK_GRAFT_BENCH_BAND_RETRIES").map(_.toInt).getOrElse(2)
    val results = names.flatMap { name =>
      val gc0 = gcMillis()
      val jit0 = jitMillis()
      def timed(): Double = {
        val t0 = System.nanoTime()
        try force(name) catch {
          case e: Throwable =>
            errors.getOrElseUpdate(name,
              s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(120)}")
        }
        (System.nanoTime() - t0) / 1e9
      }
      var times = (1 to passes).map(_ => timed())
      var extra = 0
      while (!errors.contains(name) && extra < bandRetries &&
          bands.get(name).exists(times.min > _)) {
        val t = timed()
        if (errors.contains(name)) {
          // a failure during an OPTIONAL extra pass must not convert a
          // query whose nominal passes all succeeded into an error —
          // the valid measurements stand (band-flagged), the transient
          // retry failure is dropped
          errors.remove(name)
          extra = bandRetries
        } else {
          times = times :+ t
          extra += 1
        }
      }
      // In-band CONVERGENCE re-pass (round-9 brief #7): a query whose
      // min sits inside its band can still be contention-inflated when
      // EVERY nominal pass hit co-tenant load (r9's q44: min 8.28 vs
      // 3.87-4.30 clean, all passes 2x+). High pass spread is the
      // signal: if max/min > 2 on a non-trivial query, grant extra
      // passes WHILE they keep improving the min (>=10% per pass) —
      // converging the stdout total toward the clean number. A stable
      // spread (min already clean, max a one-off spike) stops after
      // one wasted pass; a healthy low-spread run pays nothing.
      val spreadRetries = sys.env.get("SPARK_GRAFT_BENCH_SPREAD_RETRIES")
        .map(_.toInt).getOrElse(2)
      var spreadExtra = 0
      var spreadStop = false
      while (!errors.contains(name) && !spreadStop &&
          spreadExtra < spreadRetries && times.min > 1.0 &&
          times.max / times.min > 2.0 &&
          bands.get(name).forall(times.min <= _)) {
        val prevMin = times.min
        val t = timed()
        if (errors.contains(name)) {
          errors.remove(name) // same transient-retry rule as band passes
          spreadStop = true
        } else {
          times = times :+ t
          spreadExtra += 1
          spreadStop = t > prevMin * 0.9 // stopped improving -> min is real
        }
      }
      if (errors.contains(name)) None
      else {
        val min = times.min
        val ccUsed = codeCacheUsedMb()
        val band = bands.get(name).filter(min > _)
        band.foreach { b =>
          System.err.println(
            f"bench: WARN $name min $min%.2fs exceeds expected band $b%.1fs " +
              f"after $extra extra pass(es) — suspect JVM degradation, not the " +
              f"plan (code cache $ccUsed/${codeCacheMaxMb}MB, " +
              f"jit +${jitMillis() - jit0}ms this query; " +
              "see src/main/resources/graft/bench_bands.properties)")
        }
        Some(QResult(name, min, times, gcMillis() - gc0, jitMillis() - jit0,
          ccUsed, band, extra, spreadExtra))
      }
    }
    // ---- floor adjudication (round-15, r14 verdict #2): the per-query
    // bands are sized to catch the 5-15x interpreted-codegen pathology,
    // which leaves them too loose (mean ~2.6x actuals) to catch a
    // genuine 2x regression — and loose enough that r14's q83 draw
    // (17.29 s in-suite vs 7.89 s judge-isolated) sailed through
    // in-band. The StoreSlope two-draw discipline, applied here: any
    // query whose min-of-passes exceeds max(1.5 x its rolling isolated
    // floor, floor + 0.5 s) gets ONE end-of-suite re-draw — after every
    // other query's timed work, the in-run approximation of an isolated
    // run — and BOTH draws land in the artifact (`floor_redraw`), so a
    // consumer can tell "box contention at first-draw time, re-draw
    // clean" from "genuinely slower than the floor says possible". The
    // adjudicated minimum (over all draws — a re-draw is a valid
    // measurement of identical code) is what the headline reports.
    // Floors are a rolling RECORD (bench_floors.properties), refreshed
    // when a query demonstrates a faster clean min, never raised to
    // excuse a regression.
    val floors: Map[String, Double] = BenchBands.loadFloors()
    // CAL-NORMALIZED thresholds (round-17, r16 verdict "What's wrong
    // #3"): the builder box reads a uniform 1.3-1.7x of the clean-box
    // floors, so every full run paid 5-7 redraws whose WARNs always
    // adjudicated environmental — a standing WARN trains readers to
    // ignore WARNs. The calibration probe is catalog-external (a code
    // regression cannot move it), so its suite-start reading over the
    // checked-in clean value is exactly the box's uniform slowdown:
    // scale the redraw threshold by it. A single-query regression
    // still flags (its ratio to floor exceeds the box factor); the
    // always-environmental flags stop. The normalization factor lands
    // in the artifact (calibration.norm) so a consumer sees what the
    // run excused.
    def floorThreshold(f: Double): Double =
      BenchBands.calNormalizedThreshold(f, calStart)
    case class RedrawRec(floor: Double, firstMin: Double,
                         redraw: Option[Double], cal: Double)
    val floorRedraws =
      scala.collection.mutable.LinkedHashMap.empty[String, RedrawRec]
    val adjudicated = results.map { r =>
      // the redraw triggers on EITHER record (round-16, r15 advice):
      // the floor threshold, or the band — an override band can sit
      // BELOW the floor threshold (q89: band 17.0, threshold 20.98),
      // and an in-band-but-flagged min deserves the same end-of-suite
      // adjudication the floor regime promises
      val f = floors.getOrElse(r.name, Double.MaxValue)
      val flagged = (floors.contains(r.name) && r.min > floorThreshold(f)) ||
        r.bandExceeded.isDefined
      if (!flagged) r
      else {
        // the calibration reading RIDES the redraw record: a consumer
        // can normalize this exact moment's box state (cal >> calStart
        // = contention; cal ~ calStart = the redraw is trustworthy)
        val cal = calibrate()
        val t0 = System.nanoTime()
        val ok = try { force(r.name); true }
          catch { case _: Throwable => false }
        val t = (System.nanoTime() - t0) / 1e9
        if (!ok) {
          // a redraw failure must not convert a measured query into
          // an error — the nominal passes stand, the hole is visible
          // in the artifact (redraw: null)
          floorRedraws(r.name) = RedrawRec(f, r.min, None, cal)
          r
        } else {
          floorRedraws(r.name) = RedrawRec(f, r.min, Some(t), cal)
          val newMin = r.min.min(t)
          // the redraw's OWN cal reading normalizes its verdict: the
          // box state at redraw time, not at suite start, is what the
          // redraw measurement paid
          if (floors.contains(r.name) &&
              t > BenchBands.calNormalizedThreshold(f, cal))
            System.err.println(
              f"bench: WARN ${r.name} end-of-suite re-draw $t%.2fs still " +
                f"exceeds its cal-normalized floor threshold (floor " +
                f"$f%.2fs, calibration $cal%.2fs vs clean " +
                f"${BenchBands.CalCleanSec}%.2fs) — regression suspected: " +
                "the calibration probe cannot be moved by a code change")
          r.copy(min = newMin, times = r.times :+ t,
            bandExceeded = bands.get(r.name).filter(newMin > _))
        }
      }
    }
    val calEnd = calibrate()

    // ---- scale-slope audit (round-10 verdict #1): re-time the TopN
    // most expensive queries at the two smaller sibling SFs (10x data
    // decades) and judge each top-decade growth ratio against
    // ~1.3x-linear (ScaleSlope.judge — overhead-floored, exemptions
    // explicit). Default-on for the official full-catalog run; off
    // under SPARK_GRAFT_BENCH_ONLY (iteration runs) or
    // SPARK_GRAFT_BENCH_SLOPE=0. Runs AFTER the timed loop so the
    // measured sf numbers above are never contaminated by slope work.
    val slopeDirs = ScaleSlope.siblingDirs(sfDir)
    val slopeOn = sys.env.getOrElse("SPARK_GRAFT_BENCH_SLOPE", "1") != "0" &&
      slopeDirs.nonEmpty && only.isEmpty
    val mainLbl = Paths.get(sfDir).toAbsolutePath.getFileName.toString
    case class SlopeRow(name: String, times: Seq[(String, Double)],
                        verdict: Option[ScaleSlope.Verdict])
    val slopeRows: Seq[SlopeRow] =
      if (!slopeOn) Nil
      else adjudicated.sortBy(-_.min).take(ScaleSlope.TopN).map { r =>
        def timedAt(dir: String): Option[Double] = {
          val t0 = System.nanoTime()
          val ok = try { force(r.name, dir); true }
            catch { case _: Throwable => false }
          if (ok) Some((System.nanoTime() - t0) / 1e9) else None
        }
        val smalls = slopeDirs.map { case (lbl, dir) =>
          // first touch of this (query, SF) pays file listing and any
          // per-store index build — warm it untimed, then min of 2
          timedAt(dir)
          lbl -> (for (a <- timedAt(dir); b <- timedAt(dir))
            yield a.min(b))
        }
        // a query that fails at a small SF records no verdict (its
        // near-zero failure time must not flag as superlinear); the
        // artifact shows the hole instead of a fake ratio. The verdict
        // denominator must be the IMMEDIATE sf/10 sibling — with only
        // sf/100 on disk, a two-decade ratio against the one-decade
        // threshold would flag every linear expensive query
        val midLbl = ScaleSlope.immediateSibling(sfDir).map(_._1)
        val verdict = smalls.find(s => midLbl.contains(s._1))
          .flatMap(_._2)
          .map(mid => ScaleSlope.judge(r.name, mid, r.min))
        SlopeRow(r.name,
          smalls.collect { case (l, Some(t)) => l -> t } :+ (mainLbl -> r.min),
          verdict)
      }
    val slopeWarnNames = ScaleSlope.warnings(
      slopeRows.collect { case SlopeRow(n, _, Some(v)) => n -> v }.toMap)
    slopeWarnNames.foreach(n => System.err.println(
      s"bench: WARN $n grew superlinearly across the top SF decade — " +
        "see the 'scale' section of the bench artifact"))

    // ---- store-slope audit (round-11 verdict #1): the incremental-
    // store family's headline claim — probe cost does NOT scale with
    // the ARCHIVE — measured per modality: build each store at the
    // bench SF's archive and at its sf/10 sibling's, probe the SAME
    // sibling batch against both, record the growth ratio (StoreSlope).
    // Same gating as the scale-slope audit: off under BENCH_ONLY or
    // SPARK_GRAFT_BENCH_STORE_SLOPE=0, and runs after everything timed.
    val storeOn =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_STORE_SLOPE", "1") != "0" &&
        only.isEmpty
    val storeRows: Seq[StoreSlope.Result] =
      if (!storeOn) Nil
      else ScaleSlope.immediateSibling(sfDir) match {
        case Some((_, smallDir)) =>
          try StoreSlope.measure(spark, smallDir, sfDir)
          catch {
            case scala.util.control.NonFatal(e) =>
              System.err.println(s"bench: store-slope audit failed: $e")
              Nil
          }
        case None => Nil
      }
    val storeWarn =
      storeRows.count(r => r.warn || r.admitWarn || r.eraseWarn)
    storeRows.filter(r => r.warn || r.admitWarn || r.eraseWarn).foreach(r =>
      System.err.println(
        f"bench: WARN store '${r.name}' probe/admit/erase grew " +
          f"${r.ratio}%.2fx/${r.admitRatio.getOrElse(0.0)}%.2fx/" +
          f"${r.eraseRatio.getOrElse(0.0)}%.2fx across " +
          f"a 10x ARCHIVE decade (probe ${r.tSmall}%.2fs -> ${r.tBig}%.2fs, " +
          f"same batch/subjects) — archive-scaled term suspected"))

    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    // The driver tail-captures a fixed ~2 KB window of stdout; the r05
    // artifact shows the full-name per-query map (~2.6 KB) overflowing
    // it, cutting the line's HEAD off mid-JSON ("parsed": null five
    // rounds running). The stdout line therefore uses the short "q64"
    // prefix of each catalog name (the driver's documented example shape
    // is {"queries":{"q1":sec,...}}) and 2-decimal seconds — ~1.1 KB
    // total, inside the window with room for the build tool's epilogue.
    // The FILE artifact keeps full names and full precision.
    def shortKey(name: String): String = name.takeWhile(_ != '_')
    val shortsUnique =
      adjudicated.map(r => shortKey(r.name)).distinct.size == adjudicated.size
    val qs = adjudicated.map { r =>
      "\"" + (if (shortsUnique) shortKey(r.name) else r.name) + f"""\":${r.min}%.2f"""
    }.mkString("{", ",", "}")
    val qsFull = adjudicated.map { r => "\"" + r.name + f"""\":${r.min}%.3f""" }
      .mkString("{", ",", "}")
    val allTimes = adjudicated.map { r =>
      "\"" + r.name + "\":" + r.times.map(t => f"$t%.3f").mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val gcs = adjudicated.map { r => "\"" + r.name + s"""\":${r.gcMs}""" }
      .mkString("{", ",", "}")
    val jits = adjudicated.map { r => "\"" + r.name + s"""\":${r.jitMs}""" }
      .mkString("{", ",", "}")
    val ccs = adjudicated.map { r => "\"" + r.name + s"""\":${r.ccUsedMb}""" }
      .mkString("{", ",", "}")
    val bandsExceeded = adjudicated.flatMap { r =>
      r.bandExceeded.map(b => "\"" + r.name + f"""\":$b%.1f""")
    }.mkString("{", ",", "}")
    // band retries EXTEND a flagged query's `times` beyond `passes`:
    // record how many, so an artifact consumer reconciling
    // len(times) == passes sees why exactly the flagged queries differ
    val extras = adjudicated.filter(_.extraPasses > 0).map { r =>
      "\"" + r.name + s"""\":${r.extraPasses}"""
    }.mkString("{", ",", "}")
    // spread re-passes likewise extend `times` past `passes` — recorded
    // separately so a consumer can tell "band-flagged, retried" from
    // "in-band but contention-suspect, converged"
    val spreads = adjudicated.filter(_.spreadPasses > 0).map { r =>
      "\"" + r.name + s"""\":${r.spreadPasses}"""
    }.mkString("{", ",", "}")
    val errs = errors.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }
      .mkString("{", ",", "}")
    // both draws of every floor-adjudicated query: first_min (the
    // in-suite reading that tripped the 1.5x-floor threshold) and the
    // end-of-suite redraw (null = the redraw itself failed) — the
    // headline min is min(all draws)
    val floorRedrawJson = floorRedraws.map { case (n, rr) =>
      val rd = rr.redraw.map(t => f"$t%.3f").getOrElse("null")
      "\"" + n + f"""\":{"floor":${rr.floor}%.3f,"first_min":${rr.firstMin}%.3f,"redraw":$rd,"cal":${rr.cal}%.3f}"""
    }.mkString("{", ",", "}")
    // the calibration record: suite-start (min-of-3 after two untimed
    // warmups), suite-end, and the per-redraw readings above — the
    // box-state evidence that lets a consumer adjudicate drift FROM
    // the artifact
    val calJson =
      f"""{"start":$calStart%.3f,"end":$calEnd%.3f,"clean":${BenchBands.CalCleanSec}%.3f,"norm":${math.max(1.0, calStart / BenchBands.CalCleanSec)}%.3f}"""
    // stdout-line error map: short keys, 40-char messages — a failing
    // build must not push the line back over the capture window
    val errsShort = errors.map { case (k, v) =>
      s"${jstr(if (shortsUnique) shortKey(k) else k)}:${jstr(v.take(40))}"
    }.mkString("{", ",", "}")
    val scaleJson = slopeRows.map { s =>
      val ts = s.times.map { case (l, t) => "\"" + l + f"""\":$t%.3f""" }
        .mkString("{", ",", "}")
      val v = s.verdict.map(v =>
          f""","ratio":${v.ratio}%.2f,"superlinear":${v.superlinear},"exempt":${v.exempt}""")
        .getOrElse(""","err":true""")
      "\"" + s.name + s"""\":{"t":$ts$v}"""
    }.mkString("{", ",", "}")
    val exemptJson = ScaleSlope.Exempt.toSeq.sortBy(_._1)
      .map { case (n, why) => s"${jstr(n)}:${jstr(why)}" }
      .mkString("{", ",", "}")
    val slopeWarnJson = slopeWarnNames.map(jstr).mkString("[", ",", "]")
    // one result's field body — reused for the adjudicated draw and,
    // when a warn triggered the in-run retry, the recorded first draw
    def storeFields(r: StoreSlope.Result): String = {
      val admit = (for (s <- r.tAdmitSmall; b <- r.tAdmitBig;
                        ar <- r.admitRatio) yield
        f""","t_admit_small":$s%.3f,"t_admit_big":$b%.3f,"admit_ratio":$ar%.2f,"admit_warn":${r.admitWarn}""")
        .getOrElse("")
      val erase = (for (s <- r.tEraseSmall; b <- r.tEraseBig;
                        er <- r.eraseRatio) yield
        f""","t_erase_small":$s%.3f,"t_erase_big":$b%.3f,"erase_ratio":$er%.2f,"erase_warn":${r.eraseWarn}""")
        .getOrElse("")
      f""""t_small":${r.tSmall}%.3f,"t_big":${r.tBig}%.3f,"ratio":${r.ratio}%.2f,"warn":${r.warn}$admit$erase"""
    }
    val storeSlopeJson = storeRows.map { r =>
      val retry = r.first.map(f =>
        s""","retried":true,"first_draw":{${storeFields(f)}}""")
        .getOrElse(if (r.retried) ""","retried":true""" else "")
      "\"" + r.name + s"""\":{${storeFields(r)}$retry}"""
    }.mkString("{", ",", "}")
    val total = adjudicated.map(_.min).sum
    val nBand = adjudicated.count(_.bandExceeded.isDefined)
    // ONE stdout line in the driver's documented shape (queries = min of
    // passes); the heavyweight per-pass/gc/JIT detail lives only in the
    // file so the line stays inside any tail-capture window. band_warn
    // rides the line as a single integer: a nonzero value says "this
    // run's environment degraded N queries past their known-good bands —
    // read the file artifact before trusting the total".
    val line = f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"errors":$errsShort,"band_warn":$nBand,"floor_redraw":${floorRedraws.size},"cal":[$calStart%.2f,$calEnd%.2f],"slope_warn":${slopeWarnNames.size},"store_warn":$storeWarn,"passes":$passes,"n_queries":${adjudicated.size},"sf":"$sfDir","artifact":${jstr(outPath)}}"""
    val full = f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qsFull,"times":$allTimes,"gc_ms":$gcs,"jit_ms":$jits,"code_cache_mb":$ccs,"code_cache_max_mb":$codeCacheMaxMb,"band_exceeded":$bandsExceeded,"band_retry_passes":$extras,"spread_retry_passes":$spreads,"floor_redraw":$floorRedrawJson,"calibration":$calJson,"errors":$errs,"scale":$scaleJson,"slope_warn":${slopeWarnNames.size},"slope_warn_queries":$slopeWarnJson,"slope_exempt":$exemptJson,"store_slope":$storeSlopeJson,"store_warn":$storeWarn,"passes":$passes,"n_queries":${adjudicated.size},"sf":"$sfDir"}"""
    // stdout FIRST: a failed file write (read-only target dir) must not
    // destroy both artifacts after a multi-minute run
    println(line)
    try {
      val out = Paths.get(outPath)
      Option(out.getParent).foreach(Files.createDirectories(_))
      Files.write(out, (full + "\n").getBytes(StandardCharsets.UTF_8))
    } catch {
      // NonFatal, not just IOException: an invalid path (InvalidPath-
      // Exception is a RuntimeException) must not skip spark.stop() and
      // turn a completed bench into a failed run
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"bench: could not write $outPath: $e")
    }
    spark.stop()
  }
}
