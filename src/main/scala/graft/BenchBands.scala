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

  /** name -> seconds; empty map when the resource is missing. Lines
    * are `query_name=seconds`; blank lines and `#` comments skipped; a
    * malformed line fails LOUDLY (a silently dropped entry would opt
    * that query out of degraded-JVM detection — the exact hole the
    * band-sync spec exists to close).
    */
  def load(): Map[String, Double] = loadFrom(ResourcePath)

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
