package graft

/** The ONE loader for `bench_bands.properties` — known-good per-query
  * upper bounds (seconds) for a healthy sf0.1 bench pass. Shared by
  * [[Bench]] (the consumer: flags band-exceeding minimums) and
  * CatalogSpec's band-sync guard (bands ↔ catalog must name the same
  * query set), so the parsing convention cannot drift between the
  * guard and the consumer: a format change either works for both or
  * fails the build for both.
  */
object BenchBands {

  val ResourcePath = "/graft/bench_bands.properties"

  /** Rolling per-query ISOLATED floor (seconds) — the best clean
    * minimum each query has demonstrated, consumed by [[Bench]]'s
    * end-of-suite floor adjudication (round-15). Same format, same
    * loud-failure parsing, same CatalogSpec sync guard as the bands.
    */
  val FloorsResourcePath = "/graft/bench_floors.properties"

  def loadFloors(): Map[String, Double] = loadFrom(FloorsResourcePath)

  /** Band derivation (round-16, r15 verdict "What's wrong #3"): ONE
    * maintained number per query. Every query's band — the healthy-JVM
    * upper bound that catches the 5-15x interpreted-codegen pathology —
    * DERIVES from its rolling isolated floor as `max(3 x floor, 2.0)`
    * (the same convention the hand-maintained bands used, seeded from
    * best-known minima — which is what the floors are). The floors file
    * is the single source; `bench_bands.properties` now holds ONLY
    * explicit OVERRIDES, kept when a hand-derived band (1.5x isolated
    * max for the floor-class lifecycle queries, whose in-suite spread
    * is measured, not guessed) is TIGHTER than the derivation —
    * CatalogSpec rejects an override that is not (dead weight would
    * drift, which is the failure mode this unification removes).
    */
  val DerivedBandMult = 3.0
  val DerivedBandMinSec = 2.0
  def derivedBand(floor: Double): Double =
    math.max(DerivedBandMult * floor, DerivedBandMinSec)

  /** The SUITE-START reading of [[Bench]]'s fixed CPU+shuffle
    * calibration probe on a clean box (seconds; min-of-3 after two
    * untimed warmups — the r16 driver artifact, which ran at floor
    * parity, started at 0.40). NOT the mid-suite settled value
    * (~0.31): the normalization divides the START reading, and using
    * the settled value as the denominator would hand even a clean box
    * a ~1.3x loosening. Denominator of the round-17 cal-normalized
    * floor thresholds (r16 verdict "What's wrong #3"): a box whose
    * suite-start calibration reads K x this value gets its
    * floor-redraw thresholds scaled by K, so a UNIFORMLY slow box
    * stops emitting always-environmental WARNs while a single-query
    * regression (which cannot move the catalog-external probe) still
    * flags. Clamped at 1.0 from below — a faster-than-clean box never
    * TIGHTENS thresholds past the floors' own record.
    */
  val CalCleanSec = 0.40

  /** The floor-adjudication threshold for one query, normalized by the
    * box state `calReading` (suite-start for the in-suite flag, the
    * per-redraw reading for the post-redraw verdict). Shared with
    * BenchBandsSpec so the arithmetic is pinned.
    */
  def calNormalizedThreshold(floor: Double, calReading: Double): Double =
    math.max(1.5 * floor, floor + 0.5) *
      math.max(1.0, calReading / CalCleanSec)

  /** The explicit band overrides alone (the resource file's content). */
  def loadOverrides(): Map[String, Double] = loadFrom(ResourcePath)

  /** The effective per-query bands: derived from the floors, explicit
    * overrides applied. name -> seconds; empty when the floors
    * resource is missing. Malformed lines fail LOUDLY (a silently
    * dropped entry would opt that query out of degraded-JVM detection —
    * the exact hole the band-sync spec exists to close).
    */
  def load(): Map[String, Double] = {
    val overrides = loadOverrides()
    loadFloors().map { case (q, f) =>
      q -> overrides.getOrElse(q, derivedBand(f))
    }
  }

  private def loadFrom(path: String): Map[String, Double] = {
    val in = Option(getClass.getResourceAsStream(path))
    in.map { s =>
      try scala.io.Source.fromInputStream(s, "UTF-8").getLines()
        .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
        .map { l =>
          l.split("=", 2) match {
            case Array(k, v) if k.trim.nonEmpty =>
              try k.trim -> v.trim.toDouble
              catch {
                case _: NumberFormatException =>
                  throw new IllegalArgumentException(
                    s"$path: malformed value in line '$l'")
              }
            case _ => throw new IllegalArgumentException(
              s"$path: malformed line '$l' (want name=seconds)")
          }
        }.toMap
      finally s.close()
    }.getOrElse(Map.empty)
  }
}
