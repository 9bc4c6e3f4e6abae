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
  * visible from the artifact alone (min ≪ max ⇒ load, not the plan).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "3").toInt.max(2)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "target/bench.json")
    val spark = GraftSession.create()
    val gcBeans = ManagementFactory.getGarbageCollectorMXBeans.asScala
    def gcMillis(): Long = gcBeans.map(_.getCollectionTime.max(0L)).sum
    def force(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
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
    val results = names.flatMap { name =>
      val gc0 = gcMillis()
      val times = (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        try force(name) catch {
          case e: Throwable =>
            errors.getOrElseUpdate(name,
              s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(120)}")
        }
        (System.nanoTime() - t0) / 1e9
      }
      if (errors.contains(name)) None
      else Some((name, times.min, times, gcMillis() - gc0))
    }
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
      results.map(r => shortKey(r._1)).distinct.size == results.size
    val qs = results.map { case (k, v, _, _) =>
      "\"" + (if (shortsUnique) shortKey(k) else k) + f"""\":$v%.2f"""
    }.mkString("{", ",", "}")
    val qsFull = results.map { case (k, v, _, _) => "\"" + k + f"""\":$v%.3f""" }
      .mkString("{", ",", "}")
    val allTimes = results.map { case (k, _, ts, _) =>
      "\"" + k + "\":" + ts.map(t => f"$t%.3f").mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val gcs = results.map { case (k, _, _, g) => "\"" + k + s"""\":$g""" }
      .mkString("{", ",", "}")
    val errs = errors.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }
      .mkString("{", ",", "}")
    // stdout-line error map: short keys, 40-char messages — a failing
    // build must not push the line back over the capture window
    val errsShort = errors.map { case (k, v) =>
      s"${jstr(if (shortsUnique) shortKey(k) else k)}:${jstr(v.take(40))}"
    }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // ONE stdout line in the driver's documented shape (queries = min of
    // passes); the heavyweight per-pass/gc detail lives only in the file
    // so the line stays inside any tail-capture window.
    val line = f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"errors":$errsShort,"passes":$passes,"n_queries":${results.size},"sf":"$sfDir","artifact":${jstr(outPath)}}"""
    val full = f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qsFull,"times":$allTimes,"gc_ms":$gcs,"errors":$errs,"passes":$passes,"n_queries":${results.size},"sf":"$sfDir"}"""
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
