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
