package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy-hitter candidate summary as a Spark `Aggregator`:
  * a fixed-capacity frequency summary folded map-side per partition, with
  * only the `capacity`-entry buffers crossing the shuffle — never a
  * per-key (item, count) exchange. Catalyst plans Aggregators with
  * partial aggregation (the same ScalaAggregator/TypedImperativeAggregate
  * machinery as built-in sketches), so the buffer lives as a plain JVM
  * object between rows and is Kryo-serialized only at the exchange.
  *
  * Guarantee (Misra-Gries 1982): after summarizing N items with capacity
  * M, every item with true count > N/M is present in the summary, and
  * each stored count undercounts by at most N/M. Merging summaries
  * pointwise and then trimming to capacity by subtracting the (M+1)-th
  * largest count preserves that bound (Agarwal, Cormode, Huang, Phillips,
  * Wei, Yi — "Mergeable Summaries", PODS 2012). The summary CONTENTS may
  * vary with partitioning (merge order); downstream consumers must treat
  * it as a candidate set and re-verify exactly, which makes the final
  * answer partitioning-independent.
  */
object FreqSummary {

  /** Counter map plus an `overflowed` flag: true once ANY partial
    * summary evicted an entry (decrement-all or merge trim). While the
    * flag is false the map is a complete exact dictionary — consumers
    * can treat the summary as the full vocabulary, not a sample.
    */
  final class Buf(val m: mutable.HashMap[String, Long],
                  var overflowed: Boolean) extends Serializable

  final class MisraGries(capacity: Int)
      extends Aggregator[String, Buf, (Seq[String], Boolean)] {
    require(capacity > 0, "capacity must be positive")

    override def zero: Buf = new Buf(mutable.HashMap.empty, false)

    override def reduce(buf: Buf, g: String): Buf = {
      if (g != null) {
        val b = buf.m
        b.get(g) match {
          case Some(c) => b.update(g, c + 1L)
          case None if b.size < capacity => b.update(g, 1L)
          case None =>
            // decrement-all in lieu of inserting: each trigger cancels
            // `capacity` units of total count, so triggers <= N/capacity
            // and the amortized cost per item stays O(1)
            buf.overflowed = true
            val dead = b.iterator.filter(_._2 == 1L).map(_._1).toList
            dead.foreach(b.remove)
            b.mapValuesInPlace((_, c) => c - 1L)
        }
      }
      buf
    }

    override def merge(a: Buf, b: Buf): Buf = {
      val (bigB, smallB) = if (a.m.size >= b.m.size) (a, b) else (b, a)
      val big = bigB.m
      smallB.m.foreach { case (g, c) =>
        big.update(g, big.getOrElse(g, 0L) + c)
      }
      bigB.overflowed ||= smallB.overflowed
      if (big.size > capacity) {
        // subtract the (capacity+1)-th largest count from every entry
        // and drop the non-positive ones — at most `capacity` survive
        bigB.overflowed = true
        val counts = big.values.toArray
        java.util.Arrays.sort(counts)
        val cut = counts(counts.length - capacity - 1)
        val dead = big.iterator.filter(_._2 <= cut).map(_._1).toList
        dead.foreach(big.remove)
        big.mapValuesInPlace((_, c) => c - cut)
      }
      bigB
    }

    override def finish(b: Buf): (Seq[String], Boolean) =
      (b.m.keys.toSeq.sorted, b.overflowed)

    override def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
    override def outputEncoder: Encoder[(Seq[String], Boolean)] =
      ExpressionEncoder[(Seq[String], Boolean)]()
  }

  /** Candidate heavy hitters of a string column, as a struct
    * `(_1: candidates, _2: overflowed)`. Every value whose true count
    * exceeds N/capacity is guaranteed present (plus possibly others);
    * when `overflowed` is false the candidate list IS the complete
    * vocabulary with exact counts retained. Exact-verify downstream.
    */
  def candidates(c: Column, capacity: Int): Column = {
    import org.apache.spark.sql.functions.udaf
    udaf(new MisraGries(capacity), Encoders.STRING).apply(c)
  }
}
