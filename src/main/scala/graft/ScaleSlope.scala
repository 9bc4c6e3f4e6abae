package graft

/** Scale-slope audit (round-10 verdict #1): convert "would this plan
  * survive 100x" from plan-reading into MEASUREMENT. The bench harness
  * re-times its most expensive queries at the two smaller sibling
  * scale factors (each a 10x data decade) and asserts that no
  * non-exempt query grows faster than ~linear with the data — a query
  * with an accidental superlinear term (a skew-sensitive window, an
  * all-pairs join behind a flag) passes every correctness gate and
  * every single-SF band, but cannot hide from its own growth curve.
  *
  * The evaluation deliberately judges only the TOP decade
  * (mid-SF -> bench-SF): at the smallest SF nearly every query is
  * fixed-overhead-dominated (session, planning, file listing), so
  * low-decade ratios say nothing about the data term. A denominator
  * floor ([[MinDenomSec]]) makes small queries structurally immune to
  * noise-flagging: only a query spending multiple seconds at the bench
  * SF can exceed [[maxRatio]] — exactly the queries whose growth
  * matters.
  */
object ScaleSlope {

  /** How many of the most expensive (by min-of-passes) queries get the
    * slope treatment per bench run. Top-cost is the right selector:
    * cheap queries cannot be superlinear-dangerous yet (see
    * [[MinDenomSec]]), and the expensive ones are where a hidden n^2
    * term lives.
    */
  val TopN = 20

  /** Growth beyond `LinearSlack x` the data growth flags the query. */
  val LinearSlack = 1.3

  /** Sibling test SFs are 10x apart. */
  val DecadeFactor = 10.0

  /** Floor on the mid-SF denominator: below this, the measurement is
    * session overhead, not data work, and a ratio against it would
    * flag noise. Consequence: a query must spend more than
    * maxRatio x MinDenomSec (~2 s) at the bench SF before it CAN be
    * flagged — the cheap tail is structurally exempt.
    */
  val MinDenomSec = 0.15

  def maxRatio: Double = LinearSlack * DecadeFactor

  /** Queries whose superlinear growth is BY DESIGN, with the reason
    * recorded here and surfaced in the artifact (no silent caps).
    */
  val Exempt: Map[String, String] = Map(
    "q33_embed_neardup" ->
      ("deliberate O(n^2) exhaustive all-pairs oracle baseline for " +
        "q41's LSH scale path — kept quadratic so the scale path has " +
        "an exact ground truth to be graded against"))

  /** The smaller sibling SF dirs of `sfDir` (ascending), e.g.
    * .../sf0.1 -> Seq(sf0.001, sf0.01). Only existing dirs return;
    * a non-sf-shaped dir returns none (slope audit silently off).
    */
  def siblingDirs(sfDir: String): Seq[(String, String)] = {
    val p = java.nio.file.Paths.get(sfDir).toAbsolutePath
    val name = p.getFileName.toString
    if (!name.startsWith("sf")) return Nil
    scala.util.Try(BigDecimal(name.stripPrefix("sf"))).toOption.toSeq
      .flatMap { sf =>
        Seq(sf / 100, sf / 10)
          .map(v => "sf" + v.bigDecimal.stripTrailingZeros.toPlainString)
          .map(n => n -> p.resolveSibling(n).toString)
          .filter(d =>
            java.nio.file.Files.isDirectory(java.nio.file.Paths.get(d._2)))
      }
  }

  /** One query's slope verdict over its measured decade times.
    * `times` is (sfLabel -> min seconds) ascending by SF, the LAST
    * entry being the bench SF itself.
    */
  final case class Verdict(ratio: Double, superlinear: Boolean,
                           exempt: Boolean)

  /** The IMMEDIATE (sf/10) sibling of `sfDir`, if it exists on disk —
    * the only denominator [[judge]] is calibrated for. Judging against
    * a 100x-smaller sibling (sf/10 missing, sf/100 present) would
    * compare a two-decade ratio to the one-decade threshold and flag
    * every perfectly linear expensive query.
    */
  def immediateSibling(sfDir: String): Option[(String, String)] = {
    val p = java.nio.file.Paths.get(sfDir).toAbsolutePath
    val name = p.getFileName.toString
    if (!name.startsWith("sf")) return None
    scala.util.Try(BigDecimal(name.stripPrefix("sf"))).toOption
      .map(sf => "sf" + (sf / 10).bigDecimal.stripTrailingZeros.toPlainString)
      .map(n => n -> p.resolveSibling(n).toString)
      .filter(d =>
        java.nio.file.Files.isDirectory(java.nio.file.Paths.get(d._2)))
  }

  /** Judge the TOP decade: benchSec vs the mid-SF time (floored — see
    * [[MinDenomSec]]). The mid time MUST come from the immediate sf/10
    * sibling ([[immediateSibling]]).
    */
  def judge(name: String, midSec: Double, benchSec: Double): Verdict = {
    val ratio = benchSec / math.max(midSec, MinDenomSec)
    Verdict(ratio, ratio > maxRatio, Exempt.contains(name))
  }

  /** Names that fail the audit: superlinear and not exempt. */
  def warnings(verdicts: Map[String, Verdict]): Seq[String] =
    verdicts.collect {
      case (n, v) if v.superlinear && !v.exempt => n
    }.toSeq.sorted
}
