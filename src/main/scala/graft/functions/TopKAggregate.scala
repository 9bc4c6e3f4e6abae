package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded per-group top-k as a Spark `Aggregator`: keeps the k best
  * (score, id) pairs ordered by (score DESC, id ASC) in a fixed-size
  * sorted buffer, folded map-side per partition — so a group's
  * candidate set crosses the shuffle as AT MOST k pairs per partition,
  * never as its full row set.
  *
  * This replaces the `row_number().over(partitionBy(group))` shortlist
  * pattern wherever only the top k survive: the window formulation
  * shuffles EVERY candidate row to its group's reducer before ranking —
  * for brute-force cosine top-k that is queries × corpus rows; for the
  * ANN probes it is nprobe/nlist of the corpus per query, the dominant
  * exchange of the whole plan — where the aggregate ships k·partitions
  * rows instead. Catalyst plans `Aggregator`s with partial aggregation
  * (the ScalaAggregator machinery, same as the [[FreqSummary]]
  * sketches), the buffer living as a plain JVM object between rows and
  * Kryo-serialized only at the exchange.
  *
  * Determinism: the comparator is total — higher score wins, ties to
  * the LOWER id — so the result is independent of partitioning and
  * merge order, matching `row_number` over
  * `orderBy(score.desc, id.asc)` exactly. An EXACT duplicate (same
  * score AND same id) of a buffered pair is suppressed, so candidate
  * generators that can emit the same (group, id) twice (e.g. multi-
  * table LSH buckets) need no distinct() — a full-width shuffle —
  * ahead of the aggregate.
  *
  * Null scores sort WORST (below every real score, ties to lower id),
  * mirroring desc-nulls-last window ordering; encode them as
  * Double.NegativeInfinity on the way in (cosine lives in [-1, 1], so
  * -Inf is unambiguous) and decode on the way out.
  */
object TopKAggregate {

  /** Sorted best-first parallel arrays, at most k entries. */
  final class Buf(val scores: Array[Double], val ids: Array[Long],
                  var n: Int) extends Serializable

  final class ScoredTopK(k: Int)
      extends Aggregator[(Double, Long), Buf, Seq[(Long, Double)]] {
    require(k > 0, "k must be positive")

    override def zero: Buf =
      new Buf(new Array[Double](k), new Array[Long](k), 0)

    @inline private def better(s1: Double, id1: Long,
                               s2: Double, id2: Long): Boolean =
      s1 > s2 || (s1 == s2 && id1 < id2)

    override def reduce(b: Buf, in: (Double, Long)): Buf = {
      val (s, id) = in
      if (b.n == k && !better(s, id, b.scores(k - 1), b.ids(k - 1))) return b
      // binary search for the insertion point in best-first order
      var lo = 0
      var hi = b.n
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (better(b.scores(mid), b.ids(mid), s, id)) lo = mid + 1
        else hi = mid
      }
      // exact duplicate of the pair already at this rank: suppress
      if (lo < b.n && b.scores(lo) == s && b.ids(lo) == id) return b
      val last = math.min(b.n, k - 1)
      System.arraycopy(b.scores, lo, b.scores, lo + 1, last - lo)
      System.arraycopy(b.ids, lo, b.ids, lo + 1, last - lo)
      b.scores(lo) = s
      b.ids(lo) = id
      if (b.n < k) b.n += 1
      b
    }

    override def merge(a: Buf, b: Buf): Buf = {
      if (b.n == 0) return a
      if (a.n == 0) return b
      val out = zero
      var i = 0; var j = 0
      while (out.n < k && (i < a.n || j < b.n)) {
        // cross-buffer exact duplicates collapse to one entry
        if (i < a.n && j < b.n &&
            a.scores(i) == b.scores(j) && a.ids(i) == b.ids(j)) j += 1
        else {
          val takeA = j >= b.n || (i < a.n &&
            better(a.scores(i), a.ids(i), b.scores(j), b.ids(j)))
          if (takeA) {
            out.scores(out.n) = a.scores(i); out.ids(out.n) = a.ids(i); i += 1
          } else {
            out.scores(out.n) = b.scores(j); out.ids(out.n) = b.ids(j); j += 1
          }
          out.n += 1
        }
      }
      out
    }

    override def finish(b: Buf): Seq[(Long, Double)] =
      (0 until b.n).map(i => (b.ids(i), b.scores(i)))

    override def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
    override def outputEncoder: Encoder[Seq[(Long, Double)]] =
      ExpressionEncoder[Seq[(Long, Double)]]()
  }

  /** The k best (id, score) pairs per group by (score DESC, id ASC), as
    * an `array<struct<_1: bigint, _2: double>>` in rank order (element
    * position + 1 IS the rank).
    *
    * ID CONTRACT: the buffer stores ids as primitive longs (that is
    * what makes the map-side fold allocation-free), so `id` must be an
    * integral column — a string or struct id would fail (or ANSI-throw
    * on the inserted cast) only at runtime, deep inside the exchange.
    * Callers with a known schema should fail fast via
    * [[requireLongCompatibleId]].
    */
  def top(score: Column, id: Column, k: Int): Column = {
    import org.apache.spark.sql.functions.udaf
    udaf(new ScoredTopK(k),
      ExpressionEncoder[(Double, Long)]()).apply(score, id)
  }

  /** Fail-fast guard for [[top]]'s long-id contract: raises a NAMED
    * error at plan-construction time when `idCol` is not an integral
    * type, instead of an opaque runtime cast failure mid-shuffle.
    */
  def requireLongCompatibleId(df: org.apache.spark.sql.DataFrame,
                              idCol: String): Unit = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val dt = df.schema(idCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
      s"top-k id column '$idCol' must be an integral type (the bounded " +
        s"top-k buffer stores ids as primitive longs); got " +
        s"${dt.simpleString}. Map string/struct ids to a dense long " +
        "surrogate (e.g. xxhash64 or monotonically_increasing_id + " +
        "join-back) before the top-k, or use the row_number window " +
        "formulation for type-agnostic ids.")
  }
}
