package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / splitting operators for training-data curation.
  *
  * All assignment is a pure function of a row's id via the portable md5
  * bucket ([[TextOps.stableHash64]]), so:
  *  - the split is reproducible across runs, engines, and cluster sizes
  *    (no RNG, no partition-order dependence — `df.sample` gives neither);
  *  - membership is decidable per-row with zero shuffles: the operators
  *    are pure narrow projections/filters that scale embarrassingly;
  *  - an external SQL engine can re-derive the exact same membership,
  *    which makes train/test splits auditable.
  */
object SampleOps {

  /** Stable bucket in [0, buckets) from any id column (cast to its
    * canonical string form first so LONG 42 and STRING "42" agree).
    */
  def bucket(id: Column, buckets: Int): Column =
    TextOps.stableHash64(id.cast("string")) % buckets

  /** Named split assignment from integer percent weights (must sum to 100).
    * E.g. Seq("train" -> 80, "val" -> 10, "test" -> 10). Rows land in a
    * split by md5-bucket range, so the SAME row always lands in the SAME
    * split even as the corpus grows — the property that keeps eval sets
    * stable across dataset versions.
    */
  def splitLabel(id: Column, weights: Seq[(String, Int)]): Column = {
    require(weights.map(_._2).sum == 100, "split weights must sum to 100")
    val b = bucket(id, 100)
    val (cases, _) = weights.foldLeft((lit(null).cast("string"), 0)) {
      case ((acc, cum), (name, w)) =>
        (when(b >= cum && b < cum + w, lit(name)).otherwise(acc), cum + w)
    }
    cases
  }

  /** Sequence packing for training: lay documents out in a deterministic
    * pseudo-random order (md5 hash of the id) and assign each to the
    * fixed-size token window its start offset falls in — the contiguous
    * greedy packing used to build training batches, as a pure relational
    * plan.
    *
    * The global running token sum is the inherently sequential part; a
    * single `Window.orderBy` would funnel the corpus through ONE
    * partition. Instead: the hash is uniform, so its top bits are range
    * buckets that preserve the global order. Cumsum within each bucket in
    * parallel, roll the tiny per-bucket totals into global offsets
    * (`buckets` rows — driver-scale), add back. Identical result to the
    * naive global window, shuffle-parallel at any corpus size.
    *
    * Output: one row per input doc with (idCol, tokCol, bin).
    */
  def packBins(df: DataFrame, idCol: String, tokCol: Column,
               windowTokens: Int, bucketBits: Int = 6): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = TextOps.stableHash64(col(idCol).cast("string"))
    val d = df.select(col(idCol), tokCol.as("__ntok"), h.as("__h"),
      shiftrightunsigned(h, 60 - bucketBits).as("__bkt")) // hash is 60-bit
    val inBkt = Window.partitionBy("__bkt").orderBy("__h", idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    val withLocal = d.withColumn("__pre_local",
      coalesce(sum(col("__ntok")).over(inBkt), lit(0L)))
    val offsets = d.groupBy("__bkt").agg(sum("__ntok").as("__bsum"))
      .withColumn("__offset", coalesce(sum(col("__bsum")).over(
        Window.orderBy("__bkt").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select("__bkt", "__offset")
    withLocal.join(broadcast(offsets), "__bkt")
      .select(col(idCol), col("__ntok").as("ntok"),
        floor((col("__offset") + col("__pre_local")) / windowTokens)
          .cast("long").as("bin"))
  }

  /** Deterministic per-stratum sampling: keep a row iff its per-mille
    * bucket is below the rate configured for its stratum (default 0 —
    * unknown strata are dropped). The decision is row-local: no shuffle,
    * no stratum-size scan, unlike `DataFrameStatFunctions.sampleBy`.
    */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
                       ratesMil: Map[String, Int]): DataFrame = {
    val b = bucket(col(idCol), 1000)
    val rate = ratesMil.foldLeft(lit(0)) { case (acc, (s, r)) =>
      when(col(stratumCol) === s, lit(r)).otherwise(acc)
    }
    df.filter(b < rate)
  }
}
