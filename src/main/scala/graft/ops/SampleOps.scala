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

  /** Target-MIXTURE sampling: where [[stratifiedSample]] takes fixed
    * rates, this derives them — given per-mille target shares (the Pile/
    * Dolma-style source mixture) and a document budget, keep each
    * stratum at `rate_mil = min(1000, floor(budget * share_mil / n))`,
    * so the sampled corpus approximates `budget` docs at the target
    * composition regardless of how skewed the input is. An
    * over-requested stratum (share demands more docs than exist) caps
    * at keep-everything rather than oversampling.
    *
    * Scale shape: the stats pass is a map-side-combinable count per
    * stratum (output rows = #strata — driver-scale), rates broadcast
    * back, and the keep decision is the same row-local md5 bucket as
    * every other sampler here — no corpus shuffle anywhere, and the
    * membership stays reproducible and auditable in external SQL.
    */
  def mixtureSample(df: DataFrame, idCol: String, stratumCol: String,
                    sharesMil: Map[String, Int], budgetDocs: Long): DataFrame = {
    require(sharesMil.values.forall(_ >= 0) && sharesMil.values.sum <= 1000,
      "mixture shares are per-mille and must sum to <= 1000")
    val share = sharesMil.foldLeft(lit(0)) { case (acc, (s, m)) =>
      when(col(stratumCol) === s, lit(m)).otherwise(acc)
    }
    val rates = df.groupBy(stratumCol).agg(count(lit(1)).as("__cnt"))
      .select(col(stratumCol),
        least(lit(1000L),
          floor(lit(budgetDocs) * share / col("__cnt")).cast("long")).as("__rate"))
    df.join(broadcast(rates), Seq(stratumCol))
      .filter(bucket(col(idCol), 1000) < col("__rate"))
      .drop("__rate")
  }

  /** Global curriculum rank: every doc's 1-based position in the
    * (score DESC, hash, id) training order — quality-ordered curriculum
    * with a deterministic shuffle inside each score class.
    *
    * `row_number() OVER (ORDER BY ...)` funnels the corpus through one
    * partition; instead this exploits the score domain being bounded
    * (integer per-mille) the way [[packBins]] exploits hash uniformity:
    * rank within each (score, hash-range bucket) partition in parallel,
    * roll the per-partition counts into global offsets (#scores x
    * #buckets rows — driver-scale, broadcast back), add. The hash
    * bucket is the hash's TOP bits, so (score DESC, bucket, hash)
    * equals the global (score DESC, hash) order and skewed score
    * classes still spread over 2^bucketBits partitions. Identical
    * output to the naive global window by construction.
    */
  def curriculumRank(df: DataFrame, idCol: String, scoreCol: Column,
                     bucketBits: Int = 6): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = TextOps.stableHash64(col(idCol).cast("string"))
    val d = df.select(col(idCol), scoreCol.as("score"), h.as("__h"),
      shiftrightunsigned(h, 60 - bucketBits).as("__bkt")) // hash is 60-bit
    val within = Window.partitionBy("score", "__bkt").orderBy("__h", idCol)
    val local = d.withColumn("__rn", row_number().over(within))
    val offsets = d.groupBy("score", "__bkt").agg(count(lit(1)).as("__c"))
      .withColumn("__offset", coalesce(sum(col("__c")).over(
        Window.orderBy(col("score").desc, col("__bkt"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("score", "__bkt", "__offset")
    local.join(broadcast(offsets), Seq("score", "__bkt"))
      .select(col(idCol), col("score"),
        (col("__offset") + col("__rn")).cast("long").as("rank"))
  }

  /** Sliding token-window chunking — the sequence-prep step that turns
    * variable-length documents into (at most) `size`-token training
    * chunks with `size - stride` tokens of overlap between consecutive
    * chunks (overlap preserves context across chunk boundaries; stride =
    * size means disjoint chunks). The chunk count is
    * `ceil(max(n - size, 0) / stride) + 1`: chunks start at multiples of
    * `stride` until one REACHES the document end, and none after — a
    * naive ceil(n/stride) count would make the final chunk of every
    * multi-chunk document a strict suffix of its predecessor, shipping a
    * 100%-redundant chunk into training.
    *
    * Pure per-row fan-out: the token array is computed once per document
    * and sliced per chunk — no shuffle, no state, embarrassingly
    * parallel; chunk identity (idCol, chunk_idx) is deterministic so
    * re-runs and engines agree. Output: (idCol, chunk_idx, ntok, chunk).
    */
  def chunkTokens(df: DataFrame, idCol: String, textCol: String,
                  size: Int = 32, stride: Int = 16): DataFrame = {
    require(size > 0 && stride > 0 && stride <= size,
      s"need 0 < stride <= size, got size=$size stride=$stride")
    // native ArrayChunks: the former index-lambda form captured the
    // tokenize tree inside the transform, re-running the regex per
    // CHUNK (O(len^2/stride) per document — quadratic in doc length,
    // invisible to corpus-scale slope audits). The token array is now
    // the expression's CHILD, evaluated once per row.
    graft.functions.ChunkFunctions.register(df.sparkSession)
    val chunks = graft.functions.ChunkFunctions.arrayChunks(
      TextOps.tokens(col(textCol)), lit(size), lit(stride))
    df.select(col(idCol), posexplode(chunks).as(Seq("chunk_idx", "__c")))
      .select(col(idCol), col("chunk_idx"),
        org.apache.spark.sql.functions.size(col("__c")).as("ntok"),
        concat_ws(" ", col("__c")).as("chunk"))
  }
}
