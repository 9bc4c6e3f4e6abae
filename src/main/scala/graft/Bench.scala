package graft

import java.lang.management.ManagementFactory
import scala.jdk.CollectionConverters._

/** Benchmark main: runs every catalog query against
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line with per-query seconds.
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
  * unimpeded. Per-query GC milliseconds (delta across the query's timed
  * passes) are reported alongside so a contaminated or memory-pressured
  * run is self-evident from the artifact itself.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "3").toInt.max(2)
    val spark = GraftSession.create()
    val gcBeans = ManagementFactory.getGarbageCollectorMXBeans.asScala
    def gcMillis(): Long = gcBeans.map(_.getCollectionTime.max(0L)).sum
    def force(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    // SPARK_GRAFT_BENCH_ONLY=q64,q65 restricts the run for iterating on
    // one query's cost — the official artifact never sets it
    // a set-but-empty var means "no filter", not "run nothing" — an
    // empty run would emit a plausible zero-total artifact
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .filter(_.nonEmpty)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.exists(n.startsWith)))
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
      else Some((name, times.min, gcMillis() - gc0))
    }
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    val qs = results.map { case (k, v, _) => "\"" + k + f"""\":$v%.3f""" }
      .mkString("{", ",", "}")
    val gcs = results.map { case (k, _, g) => "\"" + k + s"""\":$g""" }
      .mkString("{", ",", "}")
    val errs = errors.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"gc_ms":$gcs,"errors":$errs,"passes":$passes,"sf":"$sfDir"}""")
    // The full line above (63 queries + gc map) can exceed the driver's
    // tail-capture window, truncating its head and leaving the artifact
    // unparseable. Print a compact, self-contained summary line LAST so
    // the driver always captures at least one valid JSON object.
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","errors":$errs,"passes":$passes,"n_queries":${results.size},"sf":"$sfDir"}""")
    spark.stop()
  }
}
