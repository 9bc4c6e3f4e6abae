package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{LshFunctions, LshPlanes, PqFunctions, VectorFunctions}

/** Similarity-search operators over an embedding column (`array<float>`):
  * exact cosine top-k (baseline), LSH-bucketed ANN (scale path), and
  * cosine near-duplicate pair detection.
  *
  * Dot products use the codegen'd [[graft.functions.FloatDotProduct]]
  * expression — index order, double precision — which keeps the
  * arithmetic deterministic and bit-matched to a SQL oracle that sums
  * elementwise products. All pair generation is expressed as joins so
  * Spark distributes it; the brute-force variants are O(n^2) by
  * construction and exist as the correctness baseline — the LSH path is
  * what runs at 100 TB.
  */
object SimOps {

  /** Elementwise dot product in double precision, index order. Delegates
    * to the codegen'd [[graft.functions.FloatDotProduct]] — callers must
    * register it on the session first (every public op here does).
    */
  def dot(a: Column, b: Column): Column = VectorFunctions.dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Zero-norm-safe cosine: an all-zero (or empty) vector yields 0, not
    * an error or NaN. Under this engine's always-on ANSI mode a plain
    * `0/0` double division THROWS (DIVIDE_BY_ZERO), crashing the whole
    * query on one degenerate vector; `try_divide` nulls it and the
    * zero-norm guard lands on 0 — which also keeps parity with the
    * oracles' `CASE WHEN isnan(..) THEN 0` (DuckDB's IEEE 0/0 is NaN, and
    * both engines would otherwise rank NaN above every number). Zero
    * norms imply a zero dot (Cauchy-Schwarz), so 0 is the only guarded
    * value: a NULL vector (null dot/norm) propagates null and is dropped
    * by downstream filters/rank predicates, rather than silently scoring
    * cosine 0 as if it were orthogonal. The null check runs FIRST — in a
    * (null norm, zero norm) pair, `null === 0.0` is null but `null || true`
    * is TRUE under three-valued logic, so the zero-guard alone would score
    * a NULL vector 0.
    */
  private[graft] def safeCos(d: Column, na: Column, nb: Column): Column =
    when(na.isNull || nb.isNull, lit(null).cast("double"))
      .when(na === lit(0.0) || nb === lit(0.0), lit(0.0))
      .otherwise(try_divide(d, na * nb))

  def cosine(a: Column, b: Column): Column =
    safeCos(dot(a, b), norm(a), norm(b))

  /** Exact top-k nearest neighbors (cosine) for each query vector.
    *
    * `queries` and `corpus` both carry (idCol, vecCol). Broadcasts the
    * query side — at scale the query set is small relative to the corpus,
    * so the corpus never shuffles; top-k per query uses a window over the
    * (small) candidate set.
    *
    * Norms are precomputed once per vector below the join (a projection on
    * each join child — CollapseProject cannot inline it into the pair
    * expression across the join), so each pair costs one dot product, not
    * three. The division `dot / (qn * cn)` keeps the exact arithmetic
    * shape of the SQL oracle, so results stay bit-identical.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    VectorFunctions.register(corpus.sparkSession)
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("__qv"), norm(col(vecCol)).as("__qn")))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("__cv"), norm(col(vecCol)).as("__cn"))
    val scored = c.join(q, col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        safeCos(dot(col("__qv"), col("__cv")), col("__qn"), col("__cn")))
    // the queries × corpus pair set folds into bounded per-partition
    // top-k buffers map-side (TopKAggregate) — only k pairs per (query,
    // partition) cross the exchange, never the n² pair rows the
    // row_number window shipped. The O(n²) dot products are inherent to
    // brute force; the O(n²) SHUFFLE was not.
    topKFromScored(scored, k)
  }

  /** Shared exact re-rank tail of the top-k family: bounded top-k over
    * ("query_id", "cosine", "neighbor_id") pair rows -> (query_id,
    * neighbor_id, cosine rounded to 6 dp, rank). Null cosines (null
    * input vectors) sort WORST and surface as null, exactly like the
    * desc-nulls-last window ordering this replaces; cosine lives in
    * [-1, 1], so -Inf is an unambiguous null sentinel inside the
    * aggregate. Exact (score, id) duplicates collapse, so multi-bucket
    * candidate generators need no distinct() ahead of this.
    */
  private def topKFromScored(scored: DataFrame, k: Int): DataFrame = {
    // fail fast on TopKAggregate's long-id contract (a string id would
    // otherwise ANSI-throw on the inserted cast mid-shuffle)
    graft.functions.TopKAggregate.requireLongCompatibleId(scored, "neighbor_id")
    scored
      .groupBy("query_id")
      .agg(graft.functions.TopKAggregate.top(
        coalesce(col("cosine"), lit(Double.NegativeInfinity)),
        col("neighbor_id"), k).as("__top"))
      .select(col("query_id"), posexplode(col("__top")).as(Seq("__i", "__e")))
      .select(col("query_id"), col("__e._1").as("neighbor_id"),
        round(when(col("__e._2") === lit(Double.NegativeInfinity), lit(null))
          .otherwise(col("__e._2")), 6).as("cosine"),
        (col("__i") + 1).cast("int").as("rank"))
  }

  /** RECALL AUDIT rider for the approximate top-k family (the q105
    * audit-column pattern, round-10 verdict #2): joins an approximate
    * result against the EXACT top-k on the same probe set and rides
    * per-query `recall_mil` (hits per mille of the exact set) on every
    * output row — so the driver's correctness/bench artifacts see
    * recall every round, not only the spec suite.
    *
    * `exact` is whatever ground truth fits the operator's contract:
    * [[bruteForceTopK]] over the corpus for plain ANN, over the
    * FILTERED corpus for pre-filter search, [[sq8BruteForceTopK]] for
    * the self-contained SQ8 probe (index tables only). Scale shape:
    * the audit deliberately pays one exact pass over the corpus for
    * the BOUNDED probe set (queries broadcast — the q32 cost), and the
    * per-query recall table is probe-set-sized, broadcast back onto
    * the result. Turn the audit off by not calling it — the underlying
    * operators are unchanged.
    *
    * recall_mil is standard recall@k (denominator k), in integer
    * per-mille so the column compares stably across engines. Plan
    * discipline: `approx` and `exact` are each referenced exactly ONCE
    * (a naive hits/truth formulation re-references both subtrees,
    * duplicating the corpus-scale probe and baseline scans in the
    * plan); the exact set broadcasts (probe-bounded: queries x k
    * rows) and the per-query hit count is a window over the equally
    * bounded approx result — no corpus-sized shuffle anywhere in the
    * audit itself.
    */
  def withRecallAudit(approx: DataFrame, exact: DataFrame,
                      k: Int): DataFrame = {
    require(k > 0)
    val hits = exact.select(col("query_id"), col("neighbor_id"),
      lit(1L).as("__hit"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("query_id")
    approx.join(broadcast(hits), Seq("query_id", "neighbor_id"), "left")
      .withColumn("recall_mil",
        (sum(coalesce(col("__hit"), lit(0L))).over(w) * 1000L / k)
          .cast("int"))
      .drop("__hit")
  }

  /** LSH-bucketed approximate top-k: candidates are corpus vectors sharing
    * any of `tables` independent signatures with the query; exact cosine
    * re-rank within candidates. Recall < 1 by design (measured in tests);
    * the shuffle is by bucket key, never all-pairs.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
              vecCol: String, k: Int, planes: Int = 12, tables: Int = 6,
              dim: Int = 64): DataFrame = {
    VectorFunctions.register(corpus.sparkSession)
    LshFunctions.register(corpus.sparkSession)
    // all table signatures come from ONE batched expression (array<long>)
    // + posexplode — not tables x planes separate dot columns, whose fused
    // codegen outgrows the JIT (see LshSignatures scaladoc)
    def sigs(df: DataFrame, id: String): DataFrame =
      df.select(col(idCol).as(id), col(vecCol).as(s"__v_$id"),
          norm(col(vecCol)).as(s"__n_$id"),
          LshFunctions.signatures(col(vecCol), planes, tables, dim).as("__sigs"))
        .select(col(id), col(s"__v_$id"), col(s"__n_$id"),
          posexplode(col("__sigs")).as(Seq("__t", "__s")))
        .select(col(id), col(s"__v_$id"), col(s"__n_$id"),
          struct(col("__t").as("t"), col("__s").as("s")).as("__b"))
    val qe = sigs(queries, "query_id")
    val ce = sigs(corpus, "neighbor_id")
    // no distinct() ahead of the top-k: a pair surfacing from several
    // LSH tables scores the SAME cosine every time, and TopKAggregate
    // collapses exact (score, id) duplicates in its bounded buffer —
    // the full-width pre-aggregation distinct was a second shuffle of
    // every candidate row (vectors included) for nothing
    val scored = qe.join(ce, qe("__b") === ce("__b")
        && col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        safeCos(dot(col("__v_query_id"), col("__v_neighbor_id")),
          col("__n_query_id"), col("__n_neighbor_id")))
    topKFromScored(scored, k)
  }

  /** IVF-FLAT approximate top-k: a coarse quantizer of `nlist` centroids
    * partitions the corpus into inverted lists; each query probes its
    * `nprobe` nearest centroids and exact-reranks only those lists.
    *
    * The quantizer here is a deterministic sample of the corpus itself —
    * `nlist` vectors in xxhash64(id) order (a seeded pseudo-random
    * sample, stable across runs/executors); [[ivfTopKTrained]] refines it
    * with decimal-summed (order-independent, still deterministic) Lloyd
    * rounds. Centroids are collected to the driver (nlist x dim — tiny)
    * and compiled into the plan as literal arrays, so both assignment
    * and probing are codegen'd dot products; the argmax over centroids
    * is relational (array_max over (score, idx) structs — struct
    * ordering compares scores first).
    *
    * Scale shape: the corpus shuffles once on its list id (or is
    * pre-bucketed by it at write time); a query touches nprobe lists —
    * work scales with nprobe/nlist of the corpus, not all of it.
    * Approximate by design: recall vs [[bruteForceTopK]] is asserted in
    * tests, not oracle-checked.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
              vecCol: String, k: Int, nlist: Int = 16,
              nprobe: Int = 4): DataFrame = {
    VectorFunctions.register(corpus.sparkSession)
    ivfTopKWith(sampleCentroids(corpus, idCol, vecCol, nlist),
      queries, corpus, idCol, vecCol, k, nprobe)
  }

  /** IVF-FLAT with a TRAINED coarse quantizer: `iters` Lloyd rounds
    * refine the sampled centroids before probing. Better-balanced lists
    * than the raw sample (tighter per-probe work, higher recall at equal
    * nprobe); training costs `iters` extra passes over the corpus.
    */
  def ivfTopKTrained(queries: DataFrame, corpus: DataFrame, idCol: String,
                     vecCol: String, k: Int, nlist: Int = 16, nprobe: Int = 4,
                     iters: Int = 2): DataFrame = {
    VectorFunctions.register(corpus.sparkSession)
    ivfTopKWith(trainCentroids(corpus, idCol, vecCol, nlist, iters),
      queries, corpus, idCol, vecCol, k, nprobe)
  }

  /** Deterministic pseudo-random quantizer: `nlist` corpus vectors in
    * xxhash64(id) order (stable across runs/executors/partitionings).
    */
  def sampleCentroids(corpus: DataFrame, idCol: String, vecCol: String,
                      nlist: Int): Array[Array[Float]] =
    corpus.select(col(vecCol), col(idCol))
      .orderBy(xxhash64(col(idCol)), col(idCol)).limit(nlist)
      .collect().map(_.getSeq[Float](0).toArray)

  /** Lloyd-refined quantizer, DETERMINISTIC at any parallelism: each
    * round assigns every vector to its nearest centroid (codegen'd dots
    * against plan literals) and recomputes centroids as component means —
    * summed as DECIMALs, which are exact and therefore independent of
    * partial-aggregation order (double sums would make the quantizer
    * drift run-to-run). The per-round shuffle carries compact
    * (list, component, value) triples; the collected result is
    * nlist x dim — tiny. Empty lists keep their previous centroid.
    */
  /** Process-local TRAINING cache (round-10 verdict #4, the q89/q70
    * floor): k-means quantizer training is DETERMINISTIC given (corpus
    * content, params) — decimal sums, seeded samples — so re-training
    * on byte-identical input is pure waste. Keyed on a content
    * fingerprint of the training input (ONE map-only scan + tiny agg:
    * row count + decimal-summed xxhash64 over (id, vector) — order-
    * independent, partitioning-independent), NOT on table paths or
    * mtimes, so a fresh sink dir holding the same corpus still hits.
    * The fingerprint job costs one corpus scan — an order of magnitude
    * under the Lloyd rounds it saves on a hit, and bounded overhead on
    * a miss. Size-capped as a leak guard, like the index metadata
    * caches.
    */
  private val trainCache =
    scala.collection.concurrent.TrieMap.empty[String, AnyRef]

  /** Test hook: determinism specs verify RECOMPUTE equality, which the
    * cache would short-circuit.
    */
  private[graft] def clearTrainCache(): Unit = trainCache.clear()

  private def corpusFingerprint(corpus: DataFrame, idCol: String,
                                vecCol: String): String = {
    val r = corpus.agg(count(lit(1)),
      sum(xxhash64(col(idCol), col(vecCol)).cast("decimal(38,0)")))
      .collect()(0)
    val h = Option(r.getDecimal(1)).map(_.toBigInteger.toString).getOrElse("0")
    s"${r.getLong(0)}:$h"
  }

  private def cached[T <: AnyRef](key: String)(compute: => T): T =
    trainCache.getOrElseUpdate(key, {
      if (trainCache.size >= 64) trainCache.clear()
      compute
    }).asInstanceOf[T]

  def trainCentroids(corpus: DataFrame, idCol: String, vecCol: String,
                     nlist: Int, iters: Int = 2): Array[Array[Float]] = {
    VectorFunctions.register(corpus.sparkSession)
    cachedCentroids(corpusFingerprint(corpus, idCol, vecCol),
      corpus, idCol, vecCol, nlist, iters)
  }

  /** Fingerprint-keyed centroid cache entry — split from
    * [[trainCentroids]] so a caller training BOTH quantizers
    * ([[buildIvfPqIndex]], [[ivfPqTopK]]) fingerprints the corpus
    * once, not once per quantizer.
    */
  private def cachedCentroids(fp: String, corpus: DataFrame, idCol: String,
                              vecCol: String, nlist: Int,
                              iters: Int): Array[Array[Float]] =
    // defensive copy out of the cache: callers receive fresh arrays
    cached(s"cents:$fp:$nlist:$iters")(
      computeCentroids(corpus, idCol, vecCol, nlist, iters)).map(_.clone())

  private def computeCentroids(corpus: DataFrame, idCol: String,
                               vecCol: String, nlist: Int,
                               iters: Int): Array[Array[Float]] = {
    var cents = sampleCentroids(corpus, idCol, vecCol, nlist)
    for (_ <- 1 to iters) {
      val assigned = corpus.select(col(vecCol).as("__v"),
        array_max(centScores(cents, col(vecCol))).getField("c").as("__list"))
      val sums = assigned
        .select(col("__list"), posexplode(col("__v")).as(Seq("__i", "__x")))
        .groupBy("__list", "__i")
        .agg(sum(col("__x").cast("decimal(30,12)")).as("__s"),
          count(lit(1)).as("__n"))
        .collect()
      val next = cents.map(_.clone())
      sums.foreach { r =>
        val (l, i) = (r.getInt(0), r.getInt(1))
        // ragged corpora can carry components past the sampled centroid's
        // width — every codegen vector op defends with min-length; so
        // does this collect-side loop (extra components are ignored
        // rather than crashing the driver)
        if (i < next(l).length)
          next(l)(i) = (r.getDecimal(2).doubleValue() / r.getLong(3)).toFloat
      }
      cents = next
    }
    cents
  }

  /** (cosine-to-centroid, centroid-idx) structs for a vector — struct
    * ordering compares scores first, so `array_max` is the argmax and a
    * descending sort ranks probes. Centroids are plan literals: both
    * assignment and probing stay codegen'd dot products.
    */
  private def centScores(cents: Array[Array[Float]], vec: Column): Column =
    array(cents.toIndexedSeq.zipWithIndex.map { case (c, i) =>
      val cn = math.sqrt(c.map(x => x.toDouble * x).sum)
      struct(safeCos(dot(vec, typedLit(c)), norm(vec), lit(cn)).as("s"),
        lit(i).as("c"))
    }: _*)

  private def ivfTopKWith(cents: Array[Array[Float]], queries: DataFrame,
                          corpus: DataFrame, idCol: String, vecCol: String,
                          k: Int, nprobe: Int): DataFrame = {
    // corpus side: every vector lands in its single nearest list
    val assigned = corpus.select(col(idCol).as("neighbor_id"),
        col(vecCol).as("__cv"), norm(col(vecCol)).as("__cn"),
        array_max(centScores(cents, col(vecCol))).getField("c").as("__list"))
    // query side: probe the nprobe best lists
    val probed = queries.select(col(idCol).as("query_id"),
        col(vecCol).as("__qv"), norm(col(vecCol)).as("__qn"),
        slice(sort_array(centScores(cents, col(vecCol)), asc = false),
          1, nprobe).as("__probes"))
      .select(col("query_id"), col("__qv"), col("__qn"),
        explode(col("__probes")).as("__p"))
      .select(col("query_id"), col("__qv"), col("__qn"),
        col("__p").getField("c").as("__list"))
    val scored = probed.join(assigned, Seq("__list"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        safeCos(dot(col("__qv"), col("__cv")), col("__qn"), col("__cn")))
    topKFromScored(scored, k)
  }

  // -------------------------------------------------------------------
  // IVF-PQ: product-quantized ANN — the memory-compressed scale path
  // -------------------------------------------------------------------

  /** Per-subspace product-quantization codebooks (Jégou et al. 2011,
    * "Product Quantization for Nearest Neighbor Search"): the dim-wide
    * vector splits into `m` subspaces of dim/m components; each subspace
    * gets `ksub` centroids trained by Lloyd rounds on a DETERMINISTIC
    * bounded sample of the corpus (first `sampleSize` vectors in
    * xxhash64(id) order — the same seeded-sample trick as
    * [[sampleCentroids]]), L2-normalized first so PQ's L2 geometry
    * aligns with the engine's cosine ranking.
    *
    * Training runs DRIVER-SIDE on the collected sample — the FAISS
    * shape: codebooks need a representative sample, not the corpus, so
    * the collect is bounded by sampleSize x dim floats at ANY corpus
    * scale (like the nlist x dim coarse-centroid collect) and the Lloyd
    * loop is exact sequential double arithmetic — deterministic at any
    * parallelism, no per-iteration Spark jobs. Empty clusters keep
    * their previous centroid. Returns books(j)(c) = the c-th centroid
    * of subspace j (dim/m floats).
    */
  def trainPqCodebooks(corpus: DataFrame, idCol: String, vecCol: String,
                       dim: Int = 64, m: Int = 8, ksub: Int = 16,
                       sampleSize: Int = 512, iters: Int = 8): Array[Array[Array[Float]]] = {
    require(dim % m == 0, s"dim $dim must split evenly into $m subspaces")
    // the byte cast in pqCodes is where >128 would silently alias codes
    require(ksub <= 128, s"ksub $ksub cannot exceed a signed byte's range")
    cachedBooks(corpusFingerprint(corpus, idCol, vecCol),
      corpus, idCol, vecCol, dim, m, ksub, sampleSize, iters)
  }

  private def cachedBooks(fp: String, corpus: DataFrame, idCol: String,
                          vecCol: String, dim: Int, m: Int, ksub: Int,
                          sampleSize: Int,
                          iters: Int): Array[Array[Array[Float]]] =
    cached(s"books:$fp:$dim:$m:$ksub:$sampleSize:$iters")(
      computePqCodebooks(corpus, idCol, vecCol, dim, m, ksub,
        sampleSize, iters)).map(_.map(_.clone()))

  private def computePqCodebooks(corpus: DataFrame, idCol: String,
                                 vecCol: String, dim: Int, m: Int,
                                 ksub: Int, sampleSize: Int,
                                 iters: Int): Array[Array[Array[Float]]] = {
    require(dim % m == 0, s"dim $dim must split evenly into $m subspaces")
    require(ksub <= 128, s"ksub $ksub cannot exceed a signed byte's range")
    val dsub = dim / m
    val raw = corpus.select(col(vecCol), col(idCol))
      .filter(col(vecCol).isNotNull)
      .orderBy(xxhash64(col(idCol)), col(idCol)).limit(sampleSize)
      .collect().map(_.getSeq[Float](0).toArray)
    require(raw.nonEmpty,
      s"cannot train PQ codebooks: no non-null $vecCol vectors in the corpus")
    val sample = raw.map { v =>
      val n = math.sqrt(v.map(x => x.toDouble * x).sum)
      if (n == 0) v.map(_.toDouble)
      else v.map(_.toDouble / n)
    }
    Array.tabulate(m) { j =>
      val subs = sample.map(v =>
        Array.tabulate(dsub)(i => if (j * dsub + i < v.length) v(j * dsub + i) else 0.0))
      // init: first ksub sample subvectors (deterministic); duplicates
      // are fine — Lloyd separates or leaves them empty-and-frozen
      var cents = Array.tabulate(ksub)(c => subs(c % subs.length).clone())
      for (_ <- 1 to iters) {
        val sums = Array.fill(ksub, dsub)(0.0)
        val counts = new Array[Long](ksub)
        subs.foreach { s =>
          var best = 0; var bestD = Double.MaxValue
          var c = 0
          while (c < ksub) {
            var d = 0.0; var i = 0
            while (i < dsub) { val t = s(i) - cents(c)(i); d += t * t; i += 1 }
            if (d < bestD) { bestD = d; best = c }
            c += 1
          }
          counts(best) += 1
          var i = 0
          while (i < dsub) { sums(best)(i) += s(i); i += 1 }
        }
        cents = Array.tabulate(ksub)(c =>
          if (counts(c) == 0) cents(c)
          else Array.tabulate(dsub)(i => sums(c)(i) / counts(c)))
      }
      cents.map(_.map(_.toFloat))
    }
  }

  /** L2-normalized copy of a float-vector column (zero vectors pass
    * through unscaled — there is no direction to normalize onto).
    */
  private def normalized(vec: Column): Column = {
    val n = norm(vec)
    when(n === lit(0.0) || n.isNull, vec)
      .otherwise(transform(vec, x => (x / n).cast("float")))
  }

  /** Per-subspace argmin code for one vector against the codebooks:
    * argmin_c ||s - cb_c||^2 = argmax_c (2 s·cb_c - ||cb_c||^2) — the
    * ||s||^2 term is constant within a subspace and drops out. Codes are
    * BYTES: the whole point of PQ is that a stored vector is m x 1-byte
    * codes, not dim x 4-byte floats. Delegates to the batched
    * [[graft.functions.PqCodes]] expression — the m x ksub relational
    * struct-argmax formulation expanded to 512 fused dot literals at the
    * defaults (megabytes of task binary, a JIT gamble; see the
    * expression's scaladoc); the batched loop nest is bit-identical and
    * a few hundred bytes of generated code.
    */
  private def pqCodes(vec: Column, books: Array[Array[Array[Float]]]): Column =
    PqFunctions.codes(vec, books)

  /** Encode vectors to PQ codes: (idCol, __codes array<tinyint> of
    * length m). This is the stored representation of the corpus in an
    * IVF-PQ index — m BYTES per vector instead of 4·dim — asserted as
    * the schema contract in SimOpsSpec.
    */
  def pqEncode(vecs: DataFrame, idCol: String, vecCol: String,
               books: Array[Array[Array[Float]]]): DataFrame = {
    PqFunctions.register(vecs.sparkSession)
    vecs.select(col(idCol), pqCodes(col(vecCol), books).as("__codes"))
  }

  /** IVF-PQ approximate top-k (ANN scale path #4): coarse quantizer
    * routes vectors to inverted lists ([[trainCentroids]], decimal-exact
    * Lloyd); within probed lists candidates are re-ranked by ASYMMETRIC
    * DISTANCE — exact query subvectors against the candidate's
    * product-quantized codes — so the probe join carries m-byte code
    * arrays, NEVER corpus vectors. At 100 TB this is the difference
    * between an index that fits executor memory and one that cannot:
    * IVF-FLAT re-ranks full float vectors (4·dim bytes each); here the
    * in-list payload is m bytes/vector (16x smaller at dim=64, m=16)
    * and exact vectors are touched again only for the per-query refine
    * shortlist.
    *
    * Candidates score by asymmetric distance straight from their codes
    * against the query vector ([[graft.functions.PqAdcScore]] — one
    * fixed-size codegen loop; its scaladoc explains why this beats the
    * classic per-query ADC lookup-table column). Ranking by that score
    * descending IS ranking by asymmetric L2 ascending (||q||^2 is
    * constant per query). The ADC ranking then SHORTLISTS `refine`·k
    * candidates per query through a bounded top-k aggregate and exact
    * vectors are fetched for only that shortlist and re-ranked by true
    * cosine — the standard PQ refine stage (FAISS IndexRefineFlat):
    * quantization error only costs recall when a true neighbor misses
    * the shortlist, not whenever codes scramble adjacent ranks. That
    * matters doubly here: the synthetic test embeddings are
    * near-random, the known worst case for both coarse and product
    * quantizers (no cluster structure to exploit; real text/image
    * embeddings cluster and do far better at lower nprobe).
    *
    * This is the SINGLE-SHOT form — training + encode + probe in one
    * invocation. Serving paths should use [[buildIvfPqIndex]] /
    * [[ivfPqProbeIndex]], which persist the training products and pay
    * neither training nor corpus encode per query batch.
    * Approximate by design -> rows-only in the driver gate; recall vs
    * [[bruteForceTopK]] at these defaults and the bytes-per-vector
    * contract are asserted in SimOpsSpec.
    */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
                vecCol: String, k: Int, nlist: Int = 16, nprobe: Int = 10,
                m: Int = 16, ksub: Int = 32, coarseIters: Int = 2,
                refine: Int = 8,
                broadcastQueries: Boolean = true): DataFrame = {
    // fail fast — trainPqCodebooks re-checks, but only AFTER the coarse
    // quantizer's Lloyd rounds have run over the whole corpus
    require(ksub <= 128, s"ksub $ksub cannot exceed a signed byte's range")
    VectorFunctions.register(corpus.sparkSession)
    PqFunctions.register(corpus.sparkSession)
    // ONE fingerprint scan feeds both quantizer cache lookups
    val fp = corpusFingerprint(corpus, idCol, vecCol)
    val cents = cachedCentroids(fp, corpus, idCol, vecCol, nlist, coarseIters)
    val books = cachedBooks(fp, corpus, idCol, vecCol,
      books_dim(corpus, vecCol), m, ksub, 512, 8)
    // inverted lists: id, list, m-byte codes — the full vector is
    // dropped here and only rejoined for the per-query refine shortlist
    val lists = corpus.select(col(idCol).as("neighbor_id"),
      array_max(centScores(cents, col(vecCol))).getField("c").as("__list"),
      pqCodes(col(vecCol), books).as("__codes"))
    ivfPqProbeWith(queries, lists, corpus, idCol, vecCol, cents, books,
      k, nprobe, refine, broadcastQueries)
  }

  /** The probe stage of IVF-PQ against ALREADY-ENCODED inverted lists
    * (`lists`: neighbor_id, __list, __codes array<tinyint>): ADC
    * shortlist from code lookups, then exact-cosine refine against the
    * corpus vectors. Shared verbatim by [[ivfPqTopK]] (in-query build)
    * and [[ivfPqProbeIndex]] (stored index) — the build/probe split is
    * WHERE the lists come from, never what the probe does.
    */
  /** `refineVecs8`: refine from STORED SQ8 codes (neighbor_id, __c8)
    * instead of the exact float corpus — see [[ivfPqProbeIndex]]'s
    * `refineFromSq8` for the scale rationale.
    */
  private def ivfPqProbeWith(queries: DataFrame, lists: DataFrame,
                             corpus: DataFrame, idCol: String, vecCol: String,
                             cents: Array[Array[Float]],
                             books: Array[Array[Array[Float]]],
                             k: Int, nprobe: Int, refine: Int,
                             broadcastQueries: Boolean = true,
                             refineVecs8: Option[DataFrame] = None): DataFrame = {
    // Probe routing as two BROADCAST sides keyed off the query batch —
    // a serving batch is bounded by construction (queries × nprobe
    // (query_id, list) pairs; queries × 4·dim-byte vectors), so the
    // corpus-size code lists NEVER shuffle: candidates stream out of
    // the scan through two broadcast hash joins.
    // `broadcastQueries = false` (the corpus-scale-query escape hatch
    // the public entry points expose) drops BOTH hints and lets
    // AQE/Catalyst pick the strategy from measured sizes: a
    // corpus-sized query set (full kNN self-join) must degrade to
    // shuffled joins, not blow the driver's broadcast limit.
    def hinted(df: DataFrame): DataFrame =
      if (broadcastQueries) broadcast(df) else df
    // the ADC shortlist folds (score, neighbor_id) pairs through
    // TopKAggregate — enforce its long-id contract eagerly
    graft.functions.TopKAggregate.requireLongCompatibleId(lists, "neighbor_id")
    // One broadcast carries both the routing pair AND the query vector
    // (nprobe-fold vector duplication — 4·dim·nprobe bytes per query —
    // traded for one queries-side job and one join fewer than separate
    // pairs/vectors broadcasts).
    val probes = queries.select(col(idCol).as("query_id"),
        col(vecCol).as("__qvec"),
        explode(slice(sort_array(centScores(cents, col(vecCol)), asc = false),
          1, nprobe)).as("__p"))
      .select(col("query_id"), col("__qvec"),
        col("__p").getField("c").as("__list"))
    // ADC shortlist: refine*k best candidates per query, scored straight
    // from the m-byte codes against the query vector (PqAdcScore — one
    // fixed-size codegen loop, no per-query lookup-table column; see its
    // scaladoc for why the table formulation loses). The bounded top-k
    // AGGREGATE replaces a row_number window: partial buffers fold
    // map-side, so the exchange carries k·refine pairs per (query,
    // partition) instead of every candidate row — at 100 TB the
    // candidate set is nprobe/nlist of the corpus per query, and that
    // window shuffle was the dominant exchange of the whole probe.
    val shortK = k * refine.max(1)
    val shortlist = lists.join(hinted(probes), Seq("__list"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("__score",
        PqFunctions.adcScore(col("__qvec"), col("__codes"), books))
      .groupBy("query_id")
      .agg(graft.functions.TopKAggregate.top(
          col("__score"), col("neighbor_id"), shortK).as("__top"),
        // the query vector rides along (identical within the group), so
        // the refine stage needs no second queries-side scan or join
        first(col("__qvec")).as("__qv"))
      .select(col("query_id"), col("__qv"), explode(col("__top")).as("__e"))
      .select(col("query_id"), col("__qv"), col("__e._1").as("neighbor_id"))
    // refine: fetch exact vectors for ONLY the shortlist (refine*k rows
    // per query — the bounded random-access read every PQ refine stage
    // pays) and re-rank by exact cosine. Quantization error then only
    // costs recall when a true neighbor misses the ADC shortlist
    // entirely, not whenever codes scramble adjacent ranks.
    // the shortlist side is queries × refine·k rows — broadcast it so
    // the vector fetch is one scan with a broadcast hash join, not a
    // corpus-wide shuffle
    val refined = refineVecs8 match {
      case Some(v8) =>
        // SQ8 refine: cosine is invariant under the positive per-vector
        // scale, so the 1-byte codes alone carry the angle (fused
        // Int8Cosine — no dequantized array per row)
        hinted(shortlist).join(v8, "neighbor_id")
          .withColumn("cosine",
            VectorFunctions.int8Cos(col("__qv"), col("__c8")))
      case None =>
        val cv = corpus.select(col(idCol).as("neighbor_id"),
          col(vecCol).as("__cv"), norm(col(vecCol)).as("__cn"))
        hinted(shortlist).join(cv, "neighbor_id")
          .withColumn("cosine",
            safeCos(dot(col("__qv"), col("__cv")), norm(col("__qv")), col("__cn")))
    }
    topKFromScored(refined, k)
  }

  /** Vector width for codebook sizing: length of the first non-null
    * vector (the corpus is homogeneous; ragged tails are zero-padded by
    * the min-length-defensive vector ops). Fails with a named error on
    * an empty or all-null corpus instead of an opaque head()/NPE.
    */
  private def books_dim(corpus: DataFrame, vecCol: String): Int = {
    val first = corpus.select(size(col(vecCol)).as("__n"))
      .filter(col("__n").isNotNull).limit(1).collect()
    require(first.nonEmpty,
      s"cannot size PQ codebooks: no non-null $vecCol vectors in the corpus")
    first(0).getInt(0)
  }

  // -------------------------------------------------------------------
  // Persisted IVF-PQ index: build once, probe many (FAISS's split)
  // -------------------------------------------------------------------

  /** Table names of a persisted IVF-PQ index under one sink root. */
  private[graft] val IdxCentroids = "ann_centroids"
  private[graft] val IdxCodebooks = "ann_codebooks"
  private[graft] val IdxCodes = "ann_codes"
  private[graft] val IdxVecs8 = "ann_vecs8"

  /** BUILD an IVF-PQ index and persist it: trains the coarse quantizer
    * and PQ codebooks exactly like [[ivfPqTopK]], encodes the corpus,
    * and stores three tables through the sink —
    *  - `ann_centroids` (list, comp, v): nlist x dim doubles,
    *  - `ann_codebooks` (sub, code, comp, v): m x ksub x dim/m doubles,
    *  - `ann_codes` (id, list, codes array<tinyint>): m BYTES per corpus
    *    vector — the index body, linear in the corpus.
    * A probe then pays NO training and NO encode pass: q70 re-trains
    * and re-encodes inside every query invocation (honest single-shot
    * cost, wrong amortization for a serving path); this split is how
    * the same operator amortizes at 100 TB — rebuild on corpus change,
    * probe per query batch.
    *
    * Returns the per-list occupancy (list, n_codes) — the index
    * statistic an operator actually monitors (empty/overfull lists are
    * the recall/latency smell).
    */
  /** `storeSq8 = true` additionally persists `ann_vecs8` — the corpus
    * under SQ8 scalar quantization ((id, scale, q): 1 byte per
    * component + one scale) — making the index SELF-CONTAINED for
    * probes: `refineFromSq8` probes then re-rank from these codes and
    * never touch the corpus table at all. 4x less refine I/O than
    * exact float vectors, and at 100 TB the bigger win is operational:
    * the serving path ships the index directory alone.
    */
  def buildIvfPqIndex(corpus: DataFrame, idCol: String, vecCol: String,
                      sink: graft.sink.UpsertSink, nlist: Int = 16,
                      m: Int = 16, ksub: Int = 32,
                      coarseIters: Int = 2,
                      attrCols: Seq[String] = Nil,
                      storeSq8: Boolean = false): DataFrame = {
    require(ksub <= 128, s"ksub $ksub cannot exceed a signed byte's range")
    val spark = corpus.sparkSession
    import spark.implicits._
    VectorFunctions.register(spark)
    PqFunctions.register(spark)
    // ONE fingerprint scan feeds both quantizer cache lookups
    val fpB = corpusFingerprint(corpus, idCol, vecCol)
    val cents = cachedCentroids(fpB, corpus, idCol, vecCol, nlist, coarseIters)
    val books = cachedBooks(fpB, corpus, idCol, vecCol,
      books_dim(corpus, vecCol), m, ksub, 512, 8)
    val centRows = for {
      (c, l) <- cents.toIndexedSeq.zipWithIndex
      (v, i) <- c.toIndexedSeq.zipWithIndex
    } yield (l, i, v.toDouble)
    val bookRows = for {
      (book, j) <- books.toIndexedSeq.zipWithIndex
      (c, code) <- book.toIndexedSeq.zipWithIndex
      (v, i) <- c.toIndexedSeq.zipWithIndex
    } yield (j, code, i, v.toDouble)
    // ONE atomic group write for the whole index: centroids, codebooks
    // and code lists (plus the SQ8 refine table, stored or DROPPED per
    // storeSq8) land under a single cross-table swap, so neither a
    // concurrent probe nor a crashed rebuild can ever pair one
    // generation's quantizers with another's codes — the sink's group
    // journal rolls a crash FORWARD to the complete new index.
    // coalesce(1): centroids/codebooks are nlist x dim and
    // m x ksub x dsub rows — default parallelism would write (and every
    // probe's bounded collect would open) 32 near-empty part files per
    // tiny table. attrCols ride ALONGSIDE the codes: a filtered probe
    // then pushes its predicate into the code-list parquet scan itself
    // (predicate pushdown prunes candidates BEFORE any scoring) — the
    // filtered-vector-search shape, instead of a corpus-sized semi-join
    // at probe time.
    val writes = Seq(
      graft.sink.TableWrite(IdxCentroids,
        centRows.toDF("list", "comp", "v").coalesce(1), Seq("list", "comp")),
      graft.sink.TableWrite(IdxCodebooks,
        bookRows.toDF("sub", "code", "comp", "v").coalesce(1),
        Seq("sub", "code", "comp")),
      graft.sink.TableWrite(IdxCodes,
        corpus.select(Seq(col(idCol).as("id"),
          array_max(centScores(cents, col(vecCol))).getField("c").as("list"),
          pqCodes(col(vecCol), books).as("codes"))
          ++ attrCols.map(col): _*),
        Seq("id"))) ++
      (if (storeSq8) Seq(graft.sink.TableWrite(IdxVecs8,
        int8Quantize(corpus, idCol, vecCol).withColumnRenamed(idCol, "id"),
        Seq("id")))
      else Nil)
    sink.overwriteMany(writes,
      drops = if (storeSq8) Nil else Seq(IdxVecs8))
    sink.read(IdxCodes).groupBy("list")
      .agg(count(lit(1)).as("n_codes"))
      .select(col("list"), col("n_codes").cast("int").as("n_codes"))
  }

  /** PROBE a persisted IVF-PQ index: reads the trained centroids and
    * codebooks back (bounded collects — nlist x dim and m x ksub x dim/m
    * doubles, corpus-size-independent) and runs the identical ADC
    * shortlist + exact-cosine refine as [[ivfPqTopK]] over the STORED
    * code lists. The corpus argument supplies exact vectors for the
    * refine shortlist only (refine·k rows per query — the bounded
    * random-access read every PQ refine stage pays).
    */
  /** `candidateFilter` gives PRE-filter semantics (filtered vector
    * search): the predicate — over the attr columns stored by
    * [[buildIvfPqIndex]]'s `attrCols` — restricts the CANDIDATE set
    * before any scoring, so the k results are the best among matching
    * vectors (post-filtering a plain top-k can return fewer than k, or
    * none, under a selective predicate). Applied to the code-list scan
    * directly, it reaches the parquet reader as a pushed filter.
    */
  /** `broadcastQueries = false` is the corpus-scale-query escape hatch:
    * the default plan broadcasts the probe routing and the shortlist
    * (bounded for a serving batch), which a corpus-sized query set
    * would blow past the driver/broadcast limits — unset, both joins
    * fall back to AQE-picked shuffled strategies.
    */
  /** `refineFromSq8 = true` re-ranks the shortlist from the index's own
    * `ann_vecs8` SQ8 codes (stored by the build's `storeSq8`) instead of
    * fetching exact vectors from `corpus` — the probe then reads ONLY
    * index tables, which is the self-contained serving shape (and 4x
    * less refine I/O). Requires the build to have stored them; fails
    * with a named error otherwise. Approximation note: SQ8 re-rank can
    * swap ranks whose exact cosines differ by less than the
    * quantization error (~1e-2 at dim 64) — recall parity vs the exact
    * refine is pinned in SimOpsSpec.
    */
  def ivfPqProbeIndex(queries: DataFrame, corpus: DataFrame, idCol: String,
                      vecCol: String, sink: graft.sink.UpsertSink, k: Int,
                      nprobe: Int = 10, refine: Int = 8,
                      candidateFilter: Option[Column] = None,
                      broadcastQueries: Boolean = true,
                      refineFromSq8: Boolean = false): DataFrame = {
    val spark = corpus.sparkSession
    VectorFunctions.register(spark)
    PqFunctions.register(spark)
    val meta = readIndexMeta(spark, sink)
    val lists = candidateFilter.fold(meta.lists)(meta.lists.filter)
    val v8 =
      if (!refineFromSq8) None
      else {
        require(sink.exists(IdxVecs8),
          s"refineFromSq8: no $IdxVecs8 table under ${sink.rootPath} — " +
            "rebuild the index with storeSq8 = true")
        Some(sink.read(IdxVecs8)
          .select(col("id").as("neighbor_id"), col("q").as("__c8")))
      }
    ivfPqProbeWith(queries, lists, corpus, idCol, vecCol, meta.cents,
      meta.books, k, nprobe, refine, broadcastQueries, v8)
  }

  /** Exhaustive top-k over the index's own SQ8 codes (`ann_vecs8`) —
    * the ground truth for [[withRecallAudit]] on the SELF-CONTAINED
    * probe (q93): the serving box holds only the index directory, so
    * its best available exact baseline is a full scan of the stored
    * 1-byte codes, scored with the same fused [[VectorFunctions.int8Cos]]
    * the refine stage uses (cosine is invariant under the positive
    * per-vector scale). Reads NO corpus table, preserving the probe's
    * index-tables-only plan contract.
    */
  def sq8BruteForceTopK(queries: DataFrame, idCol: String, vecCol: String,
                        sink: graft.sink.UpsertSink, k: Int): DataFrame = {
    val spark = queries.sparkSession
    VectorFunctions.register(spark)
    require(sink.exists(IdxVecs8),
      s"sq8BruteForceTopK: no $IdxVecs8 table under ${sink.rootPath} — " +
        "rebuild the index with storeSq8 = true")
    val v8 = sink.read(IdxVecs8)
      .select(col("id").as("neighbor_id"), col("q").as("__c8"))
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("__qv")))
    val scored = v8.join(q, col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        VectorFunctions.int8Cos(col("__qv"), col("__c8")))
    topKFromScored(scored, k)
  }

  private final case class IdxMeta(cents: Array[Array[Float]],
                                   books: Array[Array[Array[Float]]],
                                   lists: DataFrame)

  /** Decoded index metadata (centroids + codebooks) and the code-list
    * scan plan for a persisted index, cached process-locally keyed on
    * each TABLE's own on-disk content version (one directory walk to
    * probe — no Spark job). A serving process holds its index metadata
    * in memory exactly once (FAISS does the same); a REBUILD through
    * the sink's shadow swap changes the version fingerprints, so the
    * next probe decodes fresh. Per-table keys matter for the
    * add-after-train path: [[ivfPqIndexAdd]] touches only the code
    * lists, so a probe right after an add re-reads the code SCAN but
    * keeps the decoded quantizers — two Spark collects per batch saved
    * in the admission stream. Cached metadata is nlist×dim +
    * m×ksub×dsub floats — corpus-size-independent; the lists entry is
    * a PLAN (the parquet scan DataFrame, session-keyed), cached to
    * skip per-probe file-listing/footer reads, not materialized data.
    * The caches are size-capped as a leak guard against rebuild churn
    * in one JVM.
    */
  private val idxQuantCache = scala.collection.concurrent.TrieMap
    .empty[(String, Long, Long),
      (Array[Array[Float]], Array[Array[Array[Float]]])]
  private val idxListsCache = scala.collection.concurrent.TrieMap
    .empty[(String, String, Long), DataFrame]

  /** Random UUID per live SparkSession instance (classic sessions expose
    * no uuid). Weak keys: the token map never pins a stopped session,
    * and a future session reusing a collected one's identity hash still
    * gets a FRESH token — the uniqueness identityHashCode could not
    * guarantee.
    */
  private val sessionTokens = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[org.apache.spark.sql.SparkSession, String]())
  private def sessionToken(spark: org.apache.spark.sql.SparkSession): String =
    sessionTokens.computeIfAbsent(spark,
      _ => java.util.UUID.randomUUID().toString)

  private def readIndexMeta(spark: org.apache.spark.sql.SparkSession,
                            sink: graft.sink.UpsertSink): IdxMeta = {
    // GENERATION-COHERENT read: builds land all index tables under one
    // atomic group write ([[graft.sink.UpsertSink.overwriteMany]])
    // stamping a shared group id; a probe racing the rebuild's swap
    // window could still capture one table's new generation and
    // another's old, so the id set is checked before AND after the
    // decode — a mismatch (or a transiently absent dir mid-swap) is
    // re-read. Incremental adds PK-merge into member tables and
    // preserve the id: same generation family, coherent by
    // construction. Indexes predating group writes carry no ids
    // (all-None passes — nothing to prove against).
    val members = Seq(IdxCentroids, IdxCodebooks, IdxCodes)
    var attempt = 0
    while (true) {
      attempt += 1
      // an EXISTING but fileless code list is the delete-all end state
      // ([[ivfPqIndexRemove]] erased every vector): a real, stable
      // condition — name it, instead of burning the transient-retry
      // budget and reporting "kept changing". (Bucket-level delete
      // swaps never leave a transiently fileless TABLE: only the
      // delete-all truncation does.)
      if (sink.exists(IdxCodes) && !sink.hasData(IdxCodes))
        throw new IllegalStateException(
          s"index under ${sink.rootPath} has an empty code list — every " +
            "vector was removed; rebuild (buildIvfPqIndex) or drop it")
      val g0 = members.map(sink.groupId)
      try {
        val quantKey = (sink.rootPath,
          sink.version(IdxCentroids), sink.version(IdxCodebooks))
        val (cents, books) = idxQuantCache.getOrElseUpdate(quantKey, {
          if (idxQuantCache.size >= 64) idxQuantCache.clear()
          (readCentroids(sink), readCodebooks(sink))
        })
        // a GUARANTEED-unique session token, not identityHashCode:
        // identity hashes are not unique across live sessions (a
        // collision would hand one session a plan bound to another,
        // possibly stopped, session). Entries whose session has stopped
        // are evicted eagerly so cached plans never pin a dead
        // SparkSession until the size-cap clear.
        idxListsCache.filterInPlace((_, df) =>
          !df.sparkSession.sparkContext.isStopped)
        val listsKey = (sessionToken(spark), sink.rootPath,
          sink.version(IdxCodes))
        val lists = idxListsCache.getOrElseUpdate(listsKey, {
          if (idxListsCache.size >= 64) idxListsCache.clear()
          // renames, not a select: attr columns stored by the build ride
          // along for candidateFilter predicates (Catalyst prunes them
          // from unfiltered probes)
          sink.read(IdxCodes).withColumnRenamed("id", "neighbor_id")
            .withColumnRenamed("list", "__list")
            .withColumnRenamed("codes", "__codes")
        })
        // distinct over the Option values INCLUDING None-ness: a mixed
        // Some/None set is a legacy index mid-migration to a group
        // write — exactly as torn as two different ids
        if (g0.distinct.size <= 1 && members.map(sink.groupId) == g0)
          return IdxMeta(cents, books, lists)
      } catch {
        // a member dir transiently absent inside a swap window — the
        // same event the coherence check exists for; re-read
        case e: org.apache.spark.sql.AnalysisException
            if attempt < 50 => ()
      }
      if (attempt >= 50)
        throw new IllegalStateException(
          s"index under ${sink.rootPath} kept changing across $attempt " +
            "reads — torn generations or a continuously rebuilding owner")
      Thread.sleep(20L)
    }
    throw new IllegalStateException("unreachable")
  }

  private def readCentroids(sink: graft.sink.UpsertSink): Array[Array[Float]] =
    decodeCentroids(sink.read(IdxCentroids))

  private def decodeCentroids(df: DataFrame): Array[Array[Float]] = {
    val rows = df.collect()
    require(rows.nonEmpty, s"$IdxCentroids is empty — build the index first")
    val nlist = rows.iterator.map(_.getInt(0)).max + 1
    val dim = rows.iterator.map(_.getInt(1)).max + 1
    val cents = Array.fill(nlist, dim)(0.0f)
    rows.foreach(r => cents(r.getInt(0))(r.getInt(1)) = r.getDouble(2).toFloat)
    cents
  }

  private def readCodebooks(sink: graft.sink.UpsertSink): Array[Array[Array[Float]]] =
    decodeCodebooks(sink.read(IdxCodebooks))

  private def decodeCodebooks(df: DataFrame): Array[Array[Array[Float]]] = {
    val rows = df.collect()
    require(rows.nonEmpty, s"$IdxCodebooks is empty — build the index first")
    val m = rows.iterator.map(_.getInt(0)).max + 1
    val ksub = rows.iterator.map(_.getInt(1)).max + 1
    val dsub = rows.iterator.map(_.getInt(2)).max + 1
    val books = Array.fill(m, ksub, dsub)(0.0f)
    rows.foreach(r =>
      books(r.getInt(0))(r.getInt(1))(r.getInt(2)) = r.getDouble(3).toFloat)
    books
  }

  /** True iff a complete persisted index exists under the sink root. */
  def ivfPqIndexExists(sink: graft.sink.UpsertSink): Boolean =
    sink.exists(IdxCentroids) && sink.exists(IdxCodebooks) &&
      sink.exists(IdxCodes)

  /** INCREMENTALLY add vectors to a persisted index: encode against the
    * STORED centroids/codebooks (map-only — no retraining) and PK-merge
    * the m-byte codes into the code lists. This is how every IVF system
    * absorbs inserts between rebuilds (FAISS `add` after `train`): new
    * vectors join their nearest existing list, and index quality
    * degrades only as the data DISTRIBUTION drifts from the trained
    * quantizers — at which point the owner re-runs [[buildIvfPqIndex]]
    * (the shadow-swap overwrite makes the rebuild atomic under
    * concurrent probes). The merge is the only action — no trailing
    * count, which would re-execute the encode.
    */
  def ivfPqIndexAdd(vecs: DataFrame, idCol: String, vecCol: String,
                    sink: graft.sink.UpsertSink,
                    attrCols: Seq[String] = Nil): Unit =
    sink.mergeMany(ivfPqIndexAddMerges(vecs, idCol, vecCol, sink, attrCols))

  /** The [[ivfPqIndexAdd]] encode as an unexecuted [[graft.sink.TableMerge]],
    * so a caller updating the index TOGETHER with its own tables (e.g.
    * the semantic-admission stream's corpus) can fuse everything into
    * ONE `mergeMany` round-trip — one Spark job learns every table's
    * touched buckets and the shadow swaps run concurrently.
    * Requires id-unique input (pkUnique — the encode adds no dupes).
    * `attrCols` must match the build's: the code-list schema is the
    * index's contract.
    */
  def ivfPqIndexAddMerge(vecs: DataFrame, idCol: String, vecCol: String,
                         sink: graft.sink.UpsertSink,
                         attrCols: Seq[String] = Nil): graft.sink.TableMerge = {
    // an index that stores SQ8 refine vectors must extend them with
    // every add, or probes refining from SQ8 silently lose the added
    // vectors at re-rank — the plural form carries both merges
    require(!sink.exists(IdxVecs8),
      s"this index stores $IdxVecs8 — use ivfPqIndexAddMerges so SQ8-" +
        "refining probes see the added vectors")
    ivfPqIndexAddMerges(vecs, idCol, vecCol, sink, attrCols).head
  }

  /** Every [[graft.sink.TableMerge]] an incremental add needs for THIS
    * index's stored shape: the m-byte code lists always; the SQ8 refine
    * vectors too when the build stored them. Splice into a caller's own
    * `mergeMany` batch (the admission-stream fusion).
    */
  def ivfPqIndexAddMerges(vecs: DataFrame, idCol: String, vecCol: String,
                          sink: graft.sink.UpsertSink,
                          attrCols: Seq[String] = Nil): Seq[graft.sink.TableMerge] = {
    val spark = vecs.sparkSession
    VectorFunctions.register(spark)
    PqFunctions.register(spark)
    val meta = readIndexMeta(spark, sink)
    val coded = vecs.select(Seq(col(idCol).as("id"),
      array_max(centScores(meta.cents, col(vecCol))).getField("c").as("list"),
      pqCodes(col(vecCol), meta.books).as("codes"))
      ++ attrCols.map(col): _*)
    val base = Seq(graft.sink.TableMerge(IdxCodes, coded, Seq("id"),
      pkUnique = true))
    if (!sink.exists(IdxVecs8)) base
    else base :+ graft.sink.TableMerge(IdxVecs8,
      int8Quantize(vecs, idCol, vecCol).withColumnRenamed(idCol, "id"),
      Seq("id"), pkUnique = true)
  }

  /** ERASE vectors from a persisted index — the right-to-erasure arc
    * for the ANN SERVING layer (FAISS `IndexIVF::remove_ids` is the
    * same move): delete the ids' m-byte PQ codes from the code lists
    * and, when the build stored them, their SQ8 refine codes — both
    * under ONE [[graft.sink.UpsertSink.eraseMany]] group, so a probe
    * can never see a state where an id is gone from the shortlist
    * stage but its quantized vector still serves the re-rank. Without
    * this, a GDPR sweep that erases the embedding near-dup store
    * leaves the subjects' PQ codes (a reconstructible approximation
    * of the embedding) SERVING in the index, and probes keep
    * returning the erased ids as neighbors.
    *
    * Cost: O(ids + touched buckets) — the key frames derive from
    * `ids` alone (no store scan), and only the ids' hash-routed
    * buckets rewrite. Centroids and codebooks are untouched (removal
    * never degrades the trained quantizers — unlike adds, there is no
    * drift to monitor; the lists just thin out). `opId` threads the
    * sink's erasure journal through: a crashed removal replayed under
    * the same id converges exactly-once (PK deletes are naturally
    * idempotent, but the journal keeps a replayed sweep from
    * re-walking buckets and keeps the sweep's ledger semantics
    * uniform across store shapes).
    *
    * Removing EVERY remaining vector truncates the code list; probes
    * then refuse with a named "empty code list" error (an index with
    * no population has nothing to serve) — rebuild or drop it.
    */
  def ivfPqIndexRemove(ids: DataFrame, idCol: String,
                       sink: graft.sink.UpsertSink,
                       opId: Option[String] = None): Unit = {
    require(ivfPqIndexExists(sink),
      s"no persisted index under ${sink.rootPath} — nothing to remove from")
    sink.eraseMany(ivfPqRemoveTables(sink), opId) {
      ivfPqIndexRemovePlan(ids, idCol, sink)
    }
  }

  /** The index tables an erasure touches: always the code lists, plus
    * the SQ8 refine codes when the build stored them.
    */
  private[graft] def ivfPqRemoveTables(
      sink: graft.sink.UpsertSink): Seq[String] =
    Seq(IdxCodes) ++ (if (sink.exists(IdxVecs8)) Seq(IdxVecs8) else Nil)

  /** [[ivfPqIndexRemove]]'s per-table deletes as data, for callers
    * composing the removal into a wider [[graft.sink.UpsertSink
    * .eraseMany]] group (the [[graft.ops.EraseOps]] sweep). Key frames
    * derive from `ids` alone — no store scan, so no checkpoint needed
    * and a fileless (previously fully-erased) member no-ops.
    */
  private[graft] def ivfPqIndexRemovePlan(
      ids: DataFrame, idCol: String,
      sink: graft.sink.UpsertSink): Seq[graft.sink.TableErase] = {
    val keys = ids.select(col(idCol).as("id")).distinct()
    ivfPqRemoveTables(sink).map(t =>
      graft.sink.TableDelete(t, keys, Seq("id")))
  }

  /** DISTRIBUTION-DRIFT statistic for a persisted index — the signal
    * behind "rebuild on drift is the owner's call" (every add-after-
    * train system degrades as data drifts from the trained quantizers;
    * FAISS leaves WHEN to retrain to the operator). Assigns a fresh
    * vector batch to lists under the STORED centroids and compares the
    * batch's list-share distribution against the stored code lists':
    * one row per list with both counts and integer ppm shares (exact
    * arithmetic — deterministic at any parallelism), plus the per-list
    * absolute share gap. Total variation distance = sum(gap_ppm) /
    * 2e6; alert when it exceeds the operator's threshold (0.25 is a
    * reasonable default: a quarter of the batch mass sits in lists the
    * index wasn't trained to balance). Cost: one aggregated column
    * scan of the stored codes + one map-side assignment of the batch —
    * no training, nothing corpus-sized at the driver.
    */
  def ivfIndexDriftStats(batch: DataFrame, idCol: String, vecCol: String,
                         sink: graft.sink.UpsertSink): DataFrame = {
    val spark = batch.sparkSession
    VectorFunctions.register(spark)
    val meta = readIndexMeta(spark, sink)
    val stored = meta.lists.groupBy(col("__list").as("list"))
      .agg(count(lit(1)).as("stored_n"))
    val fresh = batch.filter(col(vecCol).isNotNull)
      .select(array_max(centScores(meta.cents, col(vecCol)))
        .getField("c").as("list"))
      .groupBy("list").agg(count(lit(1)).as("batch_n"))
    // the empty-batch guard lives IN the plan (no extra eager job over
    // the batch lineage): an empty or all-null-vector batch has no
    // distribution to compare, and a silent 0-denominator would NULL
    // out the very gap_ppm the retrain alarm thresholds on — so the
    // share division raises a NAMED error instead. The stored side
    // needs no guard: the index build rejects an empty corpus.
    stored.join(fresh, Seq("list"), "full_outer")
      .select(col("list"),
        coalesce(col("stored_n"), lit(0L)).as("stored_n"),
        coalesce(col("batch_n"), lit(0L)).as("batch_n"))
      .withColumn("stored_ppm", expr(
        "1000000 * stored_n div sum(stored_n) over ()"))
      .withColumn("batch_ppm", expr(
        "1000000 * batch_n div (CASE WHEN sum(batch_n) over () = 0 THEN " +
          "CAST(raise_error('drift stats need at least one non-null " +
          "vector in the batch') AS BIGINT) ELSE sum(batch_n) over () END)"))
      .withColumn("gap_ppm", abs(col("stored_ppm") - col("batch_ppm")))
  }

  /** The drift decision a [[rebuildIfDrifted]] call made: the measured
    * total-variation distance and whether it crossed the threshold.
    */
  final case class DriftDecision(totalVariation: Double, rebuilt: Boolean)

  /** CLOSE the drift loop [[ivfIndexDriftStats]] opens: measure the
    * fresh batch's total-variation distance from the stored index's
    * list distribution and, when it exceeds `threshold`, re-run
    * [[buildIvfPqIndex]] from `corpus` — under the sink's existing
    * shadow swap, so concurrent probes see the old index until the
    * atomic switch and never a half-built one. This is the
    * add-after-train lifecycle's missing arc: add absorbs inserts
    * cheaply, drift stats quantify degradation, and the rebuild fires
    * exactly when the operator's tolerance is crossed instead of on a
    * blind schedule. A rebuilt index keeps its stored SHAPE: if the
    * old build persisted SQ8 refine vectors, the rebuild does too
    * (checked BEFORE the build, which clears the SQ8 table first).
    *
    * `corpus` must be the CURRENT full corpus (stored rows + adds) —
    * the rebuild trains and encodes from it, exactly like a first
    * build (so it must carry the index's attr columns, if any). Cost
    * when stable: the drift stats' one aggregated code scan + one
    * map-side batch assignment; nothing corpus-scale runs unless the
    * rebuild fires.
    *
    * The rebuilt index keeps the stored SHAPE in full: the SQ8 refine
    * table when the old build stored one, AND the stored attr columns
    * when `attrCols` is not given explicitly — both are read off the
    * stored index BEFORE the build clears it, so a maintenance caller
    * that knows nothing about how the index was built (the streaming
    * pipeline's cadence hook) cannot silently strip the attribute
    * pushdown a filtered-probe deployment depends on.
    */
  /** The coarse-quantizer width a corpus of `n` vectors wants — the
    * FAISS sizing rule (nlist ~ 4*sqrt(N)), clamped to the design
    * envelope:
    *  - floor `minNlist` (tiny corpora keep the caller's shape);
    *  - n/39 (k-means needs ~39 training points per centroid — FAISS's
    *    own warning threshold — or empty/degenerate lists appear);
    *  - `maxNlist` cap: centroids ride probe plans as a driver-side
    *    reference object and every scan row scores all nlist of them,
    *    so the single-index design envelope tops out around a few
    *    thousand lists (4096 x 64 floats ~ 1 MB). A corpus past
    *    ~maxNlist²/16 vectors wants SHARDED indexes (one per corpus
    *    partition, probe = union of shard probes), not a wider one.
    *
    * Why this exists (the q89 floor analysis): per-batch probe work is
    * ~ corpus x nprobe/nlist, so a FIXED nlist silently converts the
    * "flat per-batch admission" contract into a linear one as the
    * corpus accumulates. Re-deriving nlist at every drift rebuild
    * keeps per-LIST occupancy ~ sqrt(N): with nprobe fixed, candidate
    * volume per batch grows ~ sqrt(N) instead of N — the standard
    * IVF operating posture.
    */
  def nlistForCorpus(n: Long, minNlist: Int = 16,
                     maxNlist: Int = 4096): Int = {
    require(n > 0, s"nlistForCorpus: corpus size must be positive, got $n")
    val want = 4.0 * math.sqrt(n.toDouble)
    val trainable = math.max(1L, n / 39L)
    math.max(minNlist.toLong,
      math.min(math.min(want.toLong, trainable), maxNlist.toLong)).toInt
  }

  /** `scaleNlist = true` re-derives nlist from the CURRENT corpus size
    * ([[nlistForCorpus]], floored at the passed `nlist`) whenever the
    * drift gate fires — the add-after-train lifecycle's missing knob:
    * without it every rebuild re-trains at the bootstrap-era width and
    * per-batch probe cost grows linearly with the accumulated corpus.
    * Probes adapt automatically (index metadata is decoded from the
    * stored tables); with nprobe fixed, a scaled rebuild RESTORES
    * ~flat candidate volume per batch.
    */
  def rebuildIfDrifted(batch: DataFrame, corpus: DataFrame,
                       idCol: String, vecCol: String,
                       sink: graft.sink.UpsertSink,
                       threshold: Double = 0.25,
                       nlist: Int = 16, m: Int = 16, ksub: Int = 32,
                       coarseIters: Int = 2,
                       attrCols: Seq[String] = Nil,
                       scaleNlist: Boolean = false): DriftDecision = {
    require(threshold > 0 && threshold <= 1,
      s"total-variation threshold must be in (0, 1]: $threshold")
    val gapSum = ivfIndexDriftStats(batch, idCol, vecCol, sink)
      .agg(sum(col("gap_ppm"))).collect()(0).getLong(0)
    val tv = gapSum / 2e6
    val drifted = tv > threshold
    if (drifted) {
      val keepSq8 = sink.exists(IdxVecs8) // build drops it first
      val keepAttrs =
        if (attrCols.nonEmpty) attrCols else storedAttrCols(sink)
      val useNlist =
        if (!scaleNlist) nlist
        else math.max(nlist, nlistForCorpus(corpus.count(), nlist))
      buildIvfPqIndex(corpus, idCol, vecCol, sink, nlist = useNlist, m = m,
        ksub = ksub, coarseIters = coarseIters, attrCols = keepAttrs,
        storeSq8 = keepSq8)
    }
    DriftDecision(tv, drifted)
  }

  /** The attr columns the stored code lists carry beyond the index
    * core (id, list, codes) — the build's `attrCols`, recovered from
    * the table itself so shape-preserving maintenance needs no
    * out-of-band record of how the index was built.
    */
  private def storedAttrCols(sink: graft.sink.UpsertSink): Seq[String] =
    sink.read(IdxCodes).schema.map(_.name)
      .filterNot(Set("id", "list", "codes"))

  // -------------------------------------------------------------------
  // Sharded IVF-PQ: one index per corpus shard (the 100 TB envelope)
  // -------------------------------------------------------------------

  private[graft] val ShardMeta = "ann_shard_meta"

  /** The ONE owner of the shard directory/member naming scheme — the
    * sub-sink layout below and the sweep's ledger receipts
    * ([[graft.ops.EraseOps]]) both derive from it, so a format change
    * cannot silently desynchronize receipts from on-disk paths.
    */
  private[graft] def shardMemberName(s: Int): String = f"ann_shard_$s%04d"

  /** Per-shard sub-sinks under the parent root: each shard is a FULL
    * ordinary index (same tables, same metadata caches keyed on its
    * own root), so build/probe/add/rebuild machinery reuses verbatim.
    */
  private def shardSinks(spark: org.apache.spark.sql.SparkSession,
                         sink: graft.sink.UpsertSink,
                         shards: Int): Seq[graft.sink.UpsertSink] =
    (0 until shards).map(s => new graft.sink.UpsertSink(spark,
      java.nio.file.Paths.get(sink.rootPath, shardMemberName(s)).toString,
      numBuckets = 8))

  /** Deterministic shard route: pmod(xxhash64(id), shards) — the same
    * column expression at build and probe time, so an id's shard never
    * moves. ids partition across shards, so a neighbor exists in
    * EXACTLY ONE shard and the probe union can never duplicate it.
    */
  private[graft] def shardOf(idCol: String, shards: Int): Column =
    pmod(xxhash64(col(idCol)), lit(shards.toLong))

  /** Per-shard content versions of a sharded index — the byte-pin a
    * maintenance lifecycle audits: a stable batch must move NO shard's
    * version, and a drifted-shard-only rebuild must move ONLY the
    * drifted shard's. Folds the three index tables' sink fingerprints
    * per built shard (empty hash ranges don't appear).
    */
  def shardedIndexVersions(spark: org.apache.spark.sql.SparkSession,
                           sink: graft.sink.UpsertSink): Map[Int, Long] = {
    require(sink.exists(ShardMeta),
      s"no sharded index under ${sink.rootPath} — run buildShardedIvfPqIndex")
    val shards = sink.read(ShardMeta).collect()(0).getAs[Int]("shards")
    shardSinks(spark, sink, shards).zipWithIndex
      .filter { case (ss, _) => ivfPqIndexExists(ss) }
      .map { case (ss, s) =>
        s -> Seq(IdxCentroids, IdxCodebooks, IdxCodes)
          .map(ss.version)
          .foldLeft(1125899906842597L)((h, v) => h * 31 + v)
      }.toMap
  }

  /** Build a SHARDED IVF-PQ index: the corpus splits into `shards`
    * hash-routed slices, each trained and encoded as an independent
    * full index under its own sub-root. This is the scale path PAST
    * [[nlistForCorpus]]'s single-index envelope: a wider quantizer
    * stops paying once every scan row scores thousands of centroids,
    * but shards scale HORIZONTALLY — per-shard nlist stays inside the
    * envelope (re-derived per shard when `scaleNlist`), per-shard
    * training samples stay bounded, and shard builds/rebuilds are
    * independent jobs a scheduler can run in parallel or incrementally
    * (rebuild only the drifted shard, not the fleet). The shard count
    * is persisted (`ann_shard_meta`) so probes route identically
    * forever; changing it is a full rebuild by design (hash routes
    * move), exactly like a bucket-modulus change ([[graft.sink
    * .UpsertSink.rebucket]]).
    */
  def buildShardedIvfPqIndex(corpus: DataFrame, idCol: String,
                             vecCol: String, sink: graft.sink.UpsertSink,
                             shards: Int = 4, nlist: Int = 16, m: Int = 16,
                             ksub: Int = 32, coarseIters: Int = 2,
                             scaleNlist: Boolean = false,
                             storeSq8: Boolean = false,
                             attrCols: Seq[String] = Nil): Unit = {
    require(shards >= 1 && shards <= 4096,
      s"shard count must be in [1, 4096]: $shards")
    val spark = corpus.sparkSession
    import spark.implicits._
    // ONE aggregation pass learns every shard's occupancy (the per-
    // shard `slice.count()` loop paid `shards` full corpus scans for
    // the same answer); an EMPTY hash range builds no index (a high
    // shard count over a small corpus leaves gaps) — probe/maintenance
    // skip it, which is the correct semantics: an empty shard holds no
    // neighbors
    val counts: Map[Int, Long] = corpus
      .groupBy(shardOf(idCol, shards).cast("int").as("__s"))
      .agg(count(lit(1)).as("__n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val allSinks = shardSinks(spark, sink, shards)
    val toBuild = (0 until shards).filter(s => counts.getOrElse(s, 0L) > 0)
    // shard builds are INDEPENDENT jobs over independent sub-sinks
    // (the scaladoc's own claim) — overlap them (guide §2.6) instead
    // of serializing their fixed costs; per-shard content is
    // byte-identical to a sequential build (each shard trains and
    // encodes only its own slice)
    Par.run(toBuild.map { s => () =>
      val slice = corpus.filter(shardOf(idCol, shards) === s)
      val useNlist =
        if (!scaleNlist) nlist
        else math.max(nlist, nlistForCorpus(counts(s), nlist))
      buildIvfPqIndex(slice, idCol, vecCol, allSinks(s), nlist = useNlist,
        m = m, ksub = ksub, coarseIters = coarseIters, attrCols = attrCols,
        storeSq8 = storeSq8)
      ()
    })
    val builtCount = toBuild.size
    // the meta row is the COMMIT POINT, written only after every shard
    // built: a crash mid-build leaves no meta and the probe fails
    // loudly with "no sharded index" instead of silently serving a
    // partial corpus (each per-shard build is itself atomic via the
    // sink's group swap, so torn shards cannot exist — only missing
    // ones). `built` pins how many non-empty shards this generation
    // holds; the probe re-counts on every call and refuses to serve if
    // any built shard has vanished (a partially-deleted index tree is
    // the one remaining way to lose a shard silently).
    sink.overwrite(ShardMeta,
      Seq((shards, builtCount)).toDF("shards", "built"), Seq("shards"))
  }

  /** The meta row's committed built-shard count, tolerating the
    * pre-`built` LEGACY layout (a sharded index persisted before the
    * commit-point column existed carries only `shards`): a legacy meta
    * cannot pin its generation's count, so fall back to the old
    * semantics — trust the shards actually built on disk. Rebuilding
    * ([[buildShardedIvfPqIndex]]) upgrades the meta in place.
    */
  private def metaBuiltCount(meta: org.apache.spark.sql.Row,
                             builtOnDisk: => Int): Int =
    if (meta.schema.fieldNames.contains("built")) meta.getAs[Int]("built")
    else builtOnDisk

  /** True iff a sharded index exists: the meta row plus at least one
    * built shard (empty hash ranges legitimately build none).
    */
  def shardedIndexExists(spark: org.apache.spark.sql.SparkSession,
                         sink: graft.sink.UpsertSink): Boolean =
    sink.exists(ShardMeta) && {
      val meta = sink.read(ShardMeta).collect()(0)
      val n = meta.getAs[Int]("shards")
      val builtOnDisk = shardSinks(spark, sink, n).count(ivfPqIndexExists)
      builtOnDisk == metaBuiltCount(meta, builtOnDisk) && builtOnDisk > 0
    }

  /** Probe a SHARDED index: every shard probes independently (each the
    * ordinary [[ivfPqProbeIndex]] — list-bounded ADC shortlist + exact
    * refine), and the per-shard top-k union re-ranks to the GLOBAL
    * top-k per query through one bounded [[graft.functions
    * .TopKAggregate]] pass — the standard distributed-top-k identity:
    * the global best k all live in some shard's local best k, so the
    * union re-rank is exact relative to the per-shard results. Output
    * schema identical to the unsharded probe. Ranking ties at the
    * re-rank see the probe's 6-dp rounded cosine (documented output
    * convention) — an approximate operator's tie-break, same class as
    * the per-shard one.
    *
    * Consistency scope (the r16-verdict contract): this PLAIN probe is
    * safe for readers that do NOT race a live writer — its per-shard
    * reads are generation-coherent at PLAN time, but the code/refine
    * scans execute later, so a probe racing [[maintainShardedIndex]]'s
    * one-shard rebuild can still pair generations (the tear
    * StoreConcurrencySpec demonstrates). Single-writer lifecycles (the
    * catalog's audit fixtures, the store-slope bench legs) qualify;
    * every SERVING composition ships on [[shardedProbeIndexSnapshot]]
    * instead, which pins all four index tables per shard for the whole
    * read (and therefore requires the SQ8 refine tables — the
    * self-contained serving shape).
    */
  def shardedProbeIndex(queries: DataFrame, corpus: DataFrame,
                        idCol: String, vecCol: String,
                        sink: graft.sink.UpsertSink, k: Int,
                        nprobe: Int = 10, refine: Int = 8,
                        candidateFilter: Option[Column] = None,
                        broadcastQueries: Boolean = true,
                        refineFromSq8: Boolean = false): DataFrame = {
    val spark = corpus.sparkSession
    require(sink.exists(ShardMeta),
      s"no sharded index under ${sink.rootPath} — run buildShardedIvfPqIndex")
    val meta = sink.read(ShardMeta).collect()(0)
    val shards = meta.getAs[Int]("shards")
    val built = shardSinks(spark, sink, shards).filter(ivfPqIndexExists)
    // every non-empty shard of the committed generation must be present:
    // serving a subset would be indistinguishable from legitimately
    // empty hash ranges (silent partial-corpus results). A LEGACY meta
    // (no `built` column) cannot make this check — old semantics apply
    val expectedBuilt = metaBuiltCount(meta, built.size)
    require(built.size == expectedBuilt,
      s"sharded index under ${sink.rootPath} has ${built.size} built " +
        s"shards but its meta commit recorded $expectedBuilt " +
        "— torn or partially deleted index; rebuild it")
    require(built.nonEmpty,
      s"sharded index under ${sink.rootPath} has no built shards")
    val perShard = built.map { ss =>
      ivfPqProbeIndex(queries, corpus, idCol, vecCol, ss, k, nprobe,
        refine, candidateFilter = candidateFilter,
        broadcastQueries = broadcastQueries, refineFromSq8 = refineFromSq8)
    }
    globalRerank(unionBalanced(perShard), k)
  }

  /** The distributed-top-k re-rank both sharded probe entry points
    * share: per-shard local top-k unions -> ONE bounded TopKAggregate
    * pass -> the exact global top-k per query (relative to the
    * per-shard results).
    */
  private def globalRerank(union: DataFrame, k: Int): DataFrame =
    union
      .groupBy("query_id")
      .agg(graft.functions.TopKAggregate.top(
        coalesce(col("cosine"), lit(Double.NegativeInfinity)),
        col("neighbor_id"), k).as("__top"))
      .select(col("query_id"), posexplode(col("__top")).as(Seq("__i", "__e")))
      .select(col("query_id"), col("__e._1").as("neighbor_id"),
        when(col("__e._2") === lit(Double.NegativeInfinity), lit(null))
          .otherwise(col("__e._2")).as("cosine"),
        (col("__i") + 1).cast("int").as("rank"))

  /** [[shardedProbeIndex]] over ONE point-in-time capture of every
    * built shard's index tables ([[graft.sink.UpsertSink
    * .snapshotMany]] per shard) — the probe-side sibling of
    * [[graft.ops.SearchOps.invertedIndexSearchSnapshot]] (r15 brief
    * #6): the plain probe's per-shard reads are generation-coherent at
    * PLAN time (readIndexMeta's group-id check), but its code/refine
    * scans execute later, so a probe racing [[maintainShardedIndex]]'s
    * one-shard rebuild could still score one generation's codes
    * against another's quantizers — or die on a swapped-away file.
    * Here every shard's centroids, codebooks, code lists (and SQ8
    * refine codes, when probed) pin as hard-linked snapshots for the
    * whole `use` window: a rebuild landing mid-probe is simply not
    * visible. Requires `refineFromSq8` (a snapshot cannot pin the
    * caller's corpus table; the exact-refine variant reads it) —
    * which is also the self-contained q93/q131 serving shape. The
    * snapshot's lifetime is the `use` body: materialize inside it.
    */
  def shardedProbeIndexSnapshot[T](queries: DataFrame, idCol: String,
                                   vecCol: String,
                                   sink: graft.sink.UpsertSink, k: Int,
                                   nprobe: Int = 10, refine: Int = 8,
                                   candidateFilter: Option[Column] = None,
                                   broadcastQueries: Boolean = true)(
      use: DataFrame => T): T = {
    val spark = queries.sparkSession
    VectorFunctions.register(spark)
    PqFunctions.register(spark)
    require(sink.exists(ShardMeta),
      s"no sharded index under ${sink.rootPath} — run buildShardedIvfPqIndex")
    val meta = sink.read(ShardMeta).collect()(0)
    val shards = meta.getAs[Int]("shards")
    val built = shardSinks(spark, sink, shards).filter(ivfPqIndexExists)
    val expectedBuilt = metaBuiltCount(meta, built.size)
    require(built.size == expectedBuilt,
      s"sharded index under ${sink.rootPath} has ${built.size} built " +
        s"shards but its meta commit recorded $expectedBuilt " +
        "— torn or partially deleted index; rebuild it")
    require(built.nonEmpty,
      s"sharded index under ${sink.rootPath} has no built shards")
    built.foreach { ss =>
      require(ss.exists(IdxVecs8),
        s"snapshot probe refines from SQ8: no $IdxVecs8 under " +
          s"${ss.rootPath} — rebuild the sharded index with storeSq8 = true")
      // the delete-all end state gets its NAMED error (the plain
      // probe's readIndexMeta diagnosis), not snapshotMany's generic
      // empty-table refusal
      if (!ss.hasData(IdxCodes))
        throw new IllegalStateException(
          s"index under ${ss.rootPath} has an empty code list — every " +
            "vector was removed; rebuild (buildIvfPqIndex) or drop it")
    }
    // per-shard captures are independent (each pins its OWN sub-sink's
    // four tables) — overlap their fs walks + link walks (guide §2.6);
    // Par.map preserves input order, so snaps(i) still pairs built(i)
    val snaps = Par.map(built)(ss =>
      ss.snapshotMany(Seq(IdxCentroids, IdxCodebooks, IdxCodes, IdxVecs8)))
    try {
      val perShard = built.zip(snaps).map { case (ss, sn) =>
        // the decoded quantizers are version-keyed content — a snapshot
        // at version v holds byte-identical centroids/codebooks to a
        // live read at v, so both paths share ONE cache (sweeps/admits
        // touch only codes/refine tables, leaving these versions — and
        // so the cache hit — stable across a serving lifecycle's passes)
        val quantKey = (ss.rootPath, sn(0).srcVersion, sn(1).srcVersion)
        val (cents, books) = idxQuantCache.getOrElseUpdate(quantKey, {
          if (idxQuantCache.size >= 64) idxQuantCache.clear()
          (decodeCentroids(sn(0).df), decodeCodebooks(sn(1).df))
        })
        val lists0 = sn(2).df.withColumnRenamed("id", "neighbor_id")
          .withColumnRenamed("list", "__list")
          .withColumnRenamed("codes", "__codes")
        val lists = candidateFilter.fold(lists0)(lists0.filter)
        val v8 = sn(3).df
          .select(col("id").as("neighbor_id"), col("q").as("__c8"))
        ivfPqProbeWith(queries, lists, queries, idCol, vecCol, cents,
          books, k, nprobe, refine, broadcastQueries, Some(v8))
      }
      use(globalRerank(unionBalanced(perShard), k))
    } finally snaps.flatten.foreach(_.close())
  }

  /** Balanced-tree union: a left-fold `reduce(_.unionByName(_))` nests
    * the plan `dfs.size` deep and analyzer passes over a deeply skewed
    * tree degrade super-linearly; pairing halves the depth to
    * O(log n) so a wide sharded probe stays analyzable. (Catalyst
    * flattens adjacent Unions in the optimizer either way — this is
    * about ANALYSIS cost, which runs on the raw tree.)
    *
    * Practical shard-count envelope for [[shardedProbeIndex]]: each
    * built shard still contributes one per-shard probe subplan (a scan
    * + ADC shortlist + refine join), constructed SEQUENTIALLY on the
    * driver, and each shard's index metadata is read serially at plan
    * time — at the 4096-shard bound that is thousands of driver-side
    * metadata reads and a union of thousands of subplans in one job.
    * Sharding earns its keep up to O(tens) of shards per probe; past
    * that, route each QUERY BATCH to its shard subset upstream (the
    * hash route is deterministic) or probe shards as separate jobs and
    * merge top-k downstream.
    */
  private def unionBalanced(dfs: Seq[DataFrame]): DataFrame =
    if (dfs.size == 1) dfs.head
    else unionBalanced(dfs.grouped(2).map(_.reduce(_.unionByName(_))).toSeq)

  /** Per-shard drift decisions for one fresh batch. */
  final case class ShardDrift(shard: Int, decision: DriftDecision)

  /** Maintain a SHARDED index against a fresh batch: the batch routes
    * by the persisted shard modulus, each non-empty slice measures
    * drift against ITS OWN shard, and ONLY the drifted shards rebuild
    * (from their slice of `corpus`, optionally [[nlistForCorpus]]-
    * re-sized) — the operational payoff of sharding: a distribution
    * shift concentrated in one hash range re-trains 1/shards of the
    * fleet while every other shard keeps serving untouched, and the
    * rebuilds are independent atomic swaps. Returns one decision per
    * measured shard (empty slices skip — nothing to measure).
    */
  def maintainShardedIndex(batch: DataFrame, corpus: DataFrame,
                           idCol: String, vecCol: String,
                           sink: graft.sink.UpsertSink,
                           threshold: Double = 0.25,
                           nlist: Int = 16, m: Int = 16, ksub: Int = 32,
                           scaleNlist: Boolean = false): Seq[ShardDrift] = {
    val spark = corpus.sparkSession
    require(sink.exists(ShardMeta),
      s"no sharded index under ${sink.rootPath} — run buildShardedIvfPqIndex")
    val shards = sink.read(ShardMeta).collect()(0).getAs[Int]("shards")
    // per-shard drift measurement (and any rebuild) is independent —
    // each runs against its OWN sub-sink over its OWN slices; overlap
    // them (guide §2.6). Par.map preserves shard order in the output.
    Par.map(shardSinks(spark, sink, shards).zipWithIndex) { case (ss, s) =>
      val slice = batch.filter(shardOf(idCol, shards) === s)
        .dropDuplicates(idCol).filter(col(vecCol).isNotNull)
      // skip empty batch slices (nothing to measure) AND never-built
      // shards (an empty hash range at build time has no index to
      // drift — its first vectors arrive through a rebuild elsewhere)
      if (slice.isEmpty || !ivfPqIndexExists(ss)) None
      else Some(ShardDrift(s, rebuildIfDrifted(slice,
        corpus.filter(shardOf(idCol, shards) === s), idCol, vecCol, ss,
        threshold, nlist = nlist, m = m, ksub = ksub,
        scaleNlist = scaleNlist)))
    }.flatten
  }

  /** INCREMENTALLY add vectors to a SHARDED index — [[ivfPqIndexAdd]]
    * routed by the persisted shard modulus: each slice encodes against
    * ITS OWN shard's trained quantizers and PK-merges into that
    * shard's code lists (and SQ8 refine table when the shard stores
    * one — the plural-merge contract rides through). Only the shards
    * the batch hashes into open; returns (shard → ids added there).
    * Completes the sharded family's lifecycle symmetry with
    * the single index: build / probe / ADD / maintain / remove.
    *
    * Vectors routed to a NEVER-BUILT shard (an empty hash range at
    * build time) have no quantizers to encode against — the call
    * refuses UP FRONT, before touching any shard (silently dropping
    * them would serve a partial corpus; absorbing them into a
    * neighbor shard would break the deterministic route forever). The
    * documented answer is a rebuild, which establishes the shard.
    * Requires id-unique input ([[ivfPqIndexAdd]]'s pkUnique contract).
    *
    * `opId` rides each touched shard's ADMIT journal (per-shard
    * sub-sinks journal independently, like their erasure journals in
    * [[shardedIndexRemove]]). The code/refine merges converge by PK
    * with or without it — re-encoding is deterministic under the
    * unchanged quantizers — so unlike the BM25 admit there is no
    * additive state a replay could corrupt; what the journal buys a
    * crash-replayed or RE-DELIVERED batch is being byte-FREE: fenced
    * buckets never rewrite, so no shard's content-version pin moves
    * (the pin [[shardedIndexVersions]] audits and the maintenance
    * lifecycle relies on). A crash BETWEEN shards replayed under the
    * same id re-applies only the shards the crashed run never
    * committed. The streaming ingest arc ([[graft.streaming
    * .DedupPipeline.annIndexAdmitStream]]) derives the id from its
    * checkpoint-stable batchId.
    */
  def shardedIndexAdd(vecs: DataFrame, idCol: String, vecCol: String,
                      sink: graft.sink.UpsertSink,
                      attrCols: Seq[String] = Nil,
                      opId: Option[String] = None,
                      establishFrom: Option[DataFrame] = None): Map[Int, Long] = {
    val spark = vecs.sparkSession
    require(sink.exists(ShardMeta),
      s"no sharded index under ${sink.rootPath} — run buildShardedIvfPqIndex")
    // ONE meta read per batch (it feeds routing, the repair, AND the
    // establishes — a hot ingest stream must not pay 3-4 collects of
    // the same row per micro-batch)
    val metaRow = sink.read(ShardMeta).collect()(0)
    val shards = metaRow.getAs[Int]("shards")
    val sinks = shardSinks(spark, sink, shards)
    // the establish path reconciles a stale meta commit FIRST (a prior
    // establish crashed between its shard build and its meta bump —
    // the one window that leaves probes refusing "torn" until replay);
    // O(shards) file probes, no Spark jobs. UPWARD only: disk < meta
    // is a partially-DELETED fleet, which must stay a loud refusal
    // (silently re-pointing the commit at the survivors would convert
    // the probe's torn-index error into silent partial-corpus serving).
    // The plain path leaves the meta alone, exactly as before.
    if (establishFrom.isDefined)
      reconcileShardMetaUpward(spark, sink, metaRow, sinks)
    // ONE aggregation pass learns every touched shard (bounded: at most
    // `shards` rows), so the unbuilt-shard decision happens BEFORE any
    // merge — the add is then all-or-nothing at the routing level
    val routed = vecs
      .select(shardOf(idCol, shards).as("__s"))
      .groupBy("__s").agg(count(lit(1)).as("__n"))
      .collect().map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
    val unbuilt = routed.keys.filterNot(s => ivfPqIndexExists(sinks(s)))
    establishFrom match {
      case Some(extra) =>
        // the ESTABLISH escape (r16 verdict "What's wrong #2"): a cohort
        // hashing into an empty-at-build-time shard must not wedge a
        // stream forever — train that shard's quantizers from the batch
        // plus its corpus slice and swap it in; the journaled merge loop
        // below then converges the batch's rows idempotently — ONE
        // redundant touched-bucket rewrite at establish time (the build
        // already holds the rows) buys the journal entry that makes a
        // RE-DELIVERED batch byte-free. attrCols ride through: the
        // established shard's code-list schema must match the batch
        // merges below AND the fleet's filtered-probe contract
        unbuilt.toSeq.sorted.foreach(s =>
          establishShard(vecs, idCol, vecCol, sink, s, Some(extra),
            attrCols = attrCols))
      case None =>
        require(unbuilt.isEmpty,
          s"batch routes ${unbuilt.toSeq.sorted.map(routed).sum} vectors to " +
            s"never-built shard(s) ${unbuilt.toSeq.sorted.mkString(", ")} " +
            "(empty hash ranges at build time) — rebuild the sharded index " +
            "to establish them, or pass establishFrom (the establish-on-" +
            "first-batch escape); absorbing into another shard would " +
            "break the deterministic route")
    }
    routed.toSeq.sortBy(_._1).foreach { case (s, _) =>
      val slice = vecs.filter(shardOf(idCol, shards) === s)
      opId match {
        case None => ivfPqIndexAdd(slice, idCol, vecCol, sinks(s), attrCols)
        case Some(id) =>
          // the journaled form runs per-table merges (the opId overload;
          // mergeMany carries no journal): a fully-committed shard skips
          // at the table fence, a crash between a shard's two merges
          // replays only the uncommitted one
          ivfPqIndexAddMerges(slice, idCol, vecCol, sinks(s), attrCols)
            .foreach(m => sinks(s).merge(m.table, m.updates, m.pk,
              m.versionCol, m.pkUnique, Some(id)))
      }
    }
    routed
  }

  /** ESTABLISH a never-built shard of an existing sharded index (r16
    * verdict "What's wrong #2"): an empty-at-build-time hash range has
    * no quantizers, so the first vectors routing there would otherwise
    * wedge a production ingest stream FOREVER (the micro-batch fails,
    * the replay hits the same refusal). This op is the documented
    * non-wedging escape: train the shard's OWN quantizers from the
    * batch's slice plus the shard's corpus slice (`extraCorpus` — rows
    * that accumulated outside the index; pass None when the batch is
    * all there is), build the full per-shard index in one atomic group
    * swap, then bump the meta commit's built count to the on-disk
    * recount.
    *
    * The quantizer SHAPE derives from the first built sibling (nlist
    * from its centroid rows, m/ksub from its codebook dims, SQ8
    * presence from its refine table) — an established shard must probe
    * like its fleet, and deriving from bytes on disk cannot drift from
    * what the fleet actually serves. Refuses when no sibling is built
    * (nothing to derive from — that fleet needs buildShardedIvfPqIndex).
    * `coarseIters` stays the caller's: training EFFORT is not
    * recoverable from the stored artifact (only its shape is), and the
    * shard re-trains at its first drift rebuild regardless.
    *
    * Idempotent under crash-replay: a call on an ALREADY-built shard
    * only reconciles the meta count (covering the crash window between
    * a prior establish's build and its meta bump — probes refuse
    * "torn" in that window until this replay lands, the same
    * restart-first recovery protocol every journal in the family
    * documents). Reconciliation is UPWARD ONLY — establish builds
    * first and bumps second, so a crash can only leave disk > meta;
    * disk < meta is a partially-DELETED fleet, which stays the probe's
    * loud torn-index refusal (silently re-pointing the commit at the
    * survivors would serve a partial corpus with zero signal).
    *
    * `attrCols` must match the fleet's (the code-list schema is the
    * index's contract — an established shard built without them would
    * fail every subsequent merge's schema check AND lose the
    * filtered-probe pushdown its siblings serve).
    */
  def establishShard(batch: DataFrame, idCol: String, vecCol: String,
                     sink: graft.sink.UpsertSink, shard: Int,
                     extraCorpus: Option[DataFrame] = None,
                     coarseIters: Int = 2,
                     attrCols: Seq[String] = Nil): Unit = {
    val spark = batch.sparkSession
    require(sink.exists(ShardMeta),
      s"no sharded index under ${sink.rootPath} — run buildShardedIvfPqIndex")
    val metaRow = sink.read(ShardMeta).collect()(0)
    val shards = metaRow.getAs[Int]("shards")
    require(shard >= 0 && shard < shards,
      s"shard $shard outside [0, $shards)")
    val sinks = shardSinks(spark, sink, shards)
    val ss = sinks(shard)
    if (!ivfPqIndexExists(ss)) {
      val sibling = sinks.find(ivfPqIndexExists).getOrElse(
        throw new IllegalStateException(
          s"sharded index under ${sink.rootPath} has NO built shard to " +
            "derive the quantizer shape from — run buildShardedIvfPqIndex"))
      val nlist = decodeCentroids(sibling.read(IdxCentroids)).length
      val books = decodeCodebooks(sibling.read(IdxCodebooks))
      val (m, ksub) = (books.length, books(0).length)
      val storeSq8 = sibling.exists(IdxVecs8)
      // attr columns are part of the derived shape too (the
      // storedAttrCols convention shape-preserving maintenance uses):
      // an explicit attrCols wins, an empty one inherits the sibling's
      // — so even a caller that forgot to thread them cannot establish
      // a shard whose code-list schema diverges from its fleet
      val keepAttrs =
        if (attrCols.nonEmpty) attrCols else storedAttrCols(sibling)
      val slice = extraCorpus.fold(batch)(batch.unionByName(_))
        .filter(shardOf(idCol, shards) === shard)
        .dropDuplicates(idCol).filter(col(vecCol).isNotNull)
      require(!slice.isEmpty,
        s"establishShard($shard): no vectors route to this shard — " +
          "nothing to train from")
      // nlist may exceed the founding slice's population (the sibling
      // trained on a full hash range) — the k-means seeder handles
      // short corpora, and the shard re-sizes at its first drift
      // rebuild like any other
      buildIvfPqIndex(slice, idCol, vecCol, ss, nlist = nlist, m = m,
        ksub = ksub, coarseIters = coarseIters, attrCols = keepAttrs,
        storeSq8 = storeSq8)
    }
    reconcileShardMetaUpward(spark, sink, metaRow, sinks)
  }

  /** Re-point the meta commit's built count at the on-disk truth when
    * the disk holds MORE built shards than the commit recorded — the
    * establish path's recovery step (build landed, bump didn't). A
    * no-op when the commit matches, so an untouched fleet's meta
    * version never moves. Disk holding FEWER than the commit is a
    * partially-deleted fleet: refuse loudly with the probe's own
    * diagnosis instead of legitimizing silent partial-corpus serving
    * (rebuild is the only honest repair for lost shards). A legacy
    * meta (no `built` column) has no commit to reconcile — left as is.
    */
  private def reconcileShardMetaUpward(
      spark: org.apache.spark.sql.SparkSession,
      sink: graft.sink.UpsertSink, metaRow: org.apache.spark.sql.Row,
      sinks: Seq[graft.sink.UpsertSink]): Unit = {
    import spark.implicits._
    val shards = metaRow.getAs[Int]("shards")
    val builtOnDisk = sinks.count(ivfPqIndexExists)
    val committed = metaBuiltCount(metaRow, builtOnDisk)
    if (builtOnDisk > committed)
      sink.overwrite(ShardMeta,
        Seq((shards, builtOnDisk)).toDF("shards", "built"), Seq("shards"))
    else if (builtOnDisk < committed)
      throw new IllegalStateException(
        s"sharded index under ${sink.rootPath} has $builtOnDisk built " +
          s"shards but its meta commit recorded $committed — torn or " +
          "partially deleted index; rebuild it (establish only repairs " +
          "the crashed build-then-bump order, never a lost shard)")
  }

  /** Total vectors indexed across every built shard — one
    * column-pruned count per shard, the population a lifecycle owner
    * compares against the corpus to DETECT an incomplete
    * erase/re-admit round trip (a prior crashed pass) before
    * serving from, or re-sweeping, a partial index (r15 advice: the
    * PK merges make a repeated add safe, but a sweep over an
    * already-swept index serves short until the re-admit lands).
    */
  def shardedIndexPopulation(spark: org.apache.spark.sql.SparkSession,
                             sink: graft.sink.UpsertSink): Long = {
    require(sink.exists(ShardMeta),
      s"no sharded index under ${sink.rootPath} — run buildShardedIvfPqIndex")
    val shards = sink.read(ShardMeta).collect()(0).getAs[Int]("shards")
    shardSinks(spark, sink, shards).filter(ivfPqIndexExists)
      .map(ss => if (!ss.hasData(IdxCodes)) 0L
        else ss.read(IdxCodes).select("id").count()).sum
  }

  /** ERASE vectors from a SHARDED index — [[ivfPqIndexRemove]] routed
    * by the persisted shard modulus: each id's codes live in exactly
    * one shard (the deterministic [[shardOf]] route), so the removal
    * opens ONLY the shards the subjects hash into and every other
    * shard's bytes stay pinned (the same 1/shards locality the
    * maintenance arc exploits for rebuilds). Returns (shard →
    * distinct ids routed there) for the touched shards — the sweep's
    * ledger feeds on it.
    *
    * `opId` replays exactly-once PER SHARD (each shard is its own
    * sub-sink with its own erasure journal): a crash between shard
    * removals replayed under the same id re-applies only the shards
    * the crashed run never reached. Shard leases are per-shard — the
    * index is a serving artifact probed shard-independently, not a
    * member of any cross-table snapshot composition, so there is no
    * torn-group state a reader could observe across shards beyond
    * what concurrent per-shard rebuilds already produce.
    */
  def shardedIndexRemove(ids: DataFrame, idCol: String,
                         sink: graft.sink.UpsertSink,
                         opId: Option[String] = None): Map[Int, Long] = {
    val spark = ids.sparkSession
    require(sink.exists(ShardMeta),
      s"no sharded index under ${sink.rootPath} — nothing to remove from")
    val shards = sink.read(ShardMeta).collect()(0).getAs[Int]("shards")
    // ONE routing aggregation learns every touched shard (the
    // shardedIndexAdd discipline — bounded: ≤ `shards` rows), instead
    // of an O(shards) loop of filter+count jobs over the ids frame; an
    // untouched shard is then never opened at all (even a journal
    // commit would move its version pin)
    val routed = ids.select(shardOf(idCol, shards).as("__s"), col(idCol))
      .distinct()
      .groupBy("__s").agg(count(lit(1)).as("__n"))
      .collect().map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
    val sinks = shardSinks(spark, sink, shards)
    routed.toSeq.sortBy(_._1).flatMap { case (s, n) =>
      if (!ivfPqIndexExists(sinks(s))) None
      else {
        ivfPqIndexRemove(ids.filter(shardOf(idCol, shards) === s),
          idCol, sinks(s), opId)
        Some(s -> n)
      }
    }.toMap
  }

  /** Distinct subject ids ACTUALLY present in each touched built
    * shard's code list — the pre-sweep `removed` figure the erasure
    * ledger records ([[graft.ops.EraseOps]]): [[shardedIndexRemove]]'s
    * own return counts ids ROUTED per shard (presented keys), which
    * overstates when a subject was never indexed there. Same key set
    * as the removal's return (routed ∩ built); within each touched
    * shard only the subjects' hash-routed code buckets open
    * ([[graft.sink.UpsertSink.readKeyBuckets]]) — untouched shards
    * and untouched buckets stay closed, the removal's own locality.
    */
  private[graft] def shardedIndexMatchedCounts(
      ids: DataFrame, idCol: String,
      sink: graft.sink.UpsertSink): Map[Int, Long] = {
    val spark = ids.sparkSession
    require(sink.exists(ShardMeta),
      s"no sharded index under ${sink.rootPath} — nothing to count against")
    val shards = sink.read(ShardMeta).collect()(0).getAs[Int]("shards")
    val routed = ids.select(shardOf(idCol, shards).as("__s"))
      .distinct().collect().map(_.getLong(0).toInt).sorted
    val sinks = shardSinks(spark, sink, shards)
    val keys = ids.select(col(idCol).as("id")).distinct()
      .localCheckpoint(true) // one materialization drives every shard's
                             // bucket routing AND membership join
    val frames = routed.filter(s => ivfPqIndexExists(sinks(s))).map { s =>
      sinks(s).readKeyBuckets(IdxCodes, keys, Seq("id"))
        .select("id")
        .join(keys, Seq("id"), "left_semi")
        .agg(count(lit(1)).as("__c"))
        .select(lit(s).as("__s"), col("__c"))
    }
    if (frames.isEmpty) Map.empty
    // one action for every touched shard's count (≤ shards rows), not
    // a serialized per-shard collect loop
    else frames.reduce(_.unionByName(_)).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
  }

  /** Deterministic +/-1 hyperplane for (table, plane) — shared with the
    * batched [[graft.functions.LshSignatures]] expression so buckets are
    * identical however the signature is computed.
    */
  private[ops] def plane(tb: Int, p: Int, dim: Int): Array[Float] =
    LshPlanes.plane(tb, p, dim)

  /** Signature for one LSH table, as a column — the batched
    * [[graft.functions.LshSignatures]] expression sliced AT the table
    * (firstTable offset), so one table costs O(planes) dot products
    * regardless of tb; an earlier version computed every table up to tb
    * and discarded all but the last.
    */
  def lshTableSignature(vec: Column, planes: Int, tb: Int, dim: Int): Column =
    element_at(LshFunctions.signaturesFrom(vec, planes, 1, dim, tb), 1)

  /** DEFAULT embedding near-dup operator: LSH-bucketed candidate
    * generation + exact cosine verification >= threshold.
    *
    * Candidates are id pairs sharing a full signature in ANY of `tables`
    * hyperplane tables — an equi-join on the (table, signature) key, so
    * the shuffle is by bucket and nothing is all-pairs. Because every
    * candidate is then verified with the exact cosine, precision is 1.0;
    * recall is the probability a true pair collides in at least one
    * table, which rises with `tables` and falls with `planes`. The
    * defaults (48 tables x 4 planes) are sized for thresholds as weak as
    * ~0.45 — the hardest regime for hyperplane LSH (bit-agreement
    * probability 1 - arccos(c)/pi ~ 0.65); for the usual >= 0.9 near-dup
    * threshold far fewer tables suffice and pruning is far stronger.
    *
    * Shuffle shape: vectors+norms ride the band explode (2 x tables x n
    * rows keyed by (table, signature)); the exact-cosine verify runs
    * PIPELINED on the equi-join output — a candidate pair never hits a
    * shuffle — and only the rare survivors (>= threshold) pass through
    * the final distinct. Total shuffle volume is O(tables x n x dim),
    * independent of how many candidate collisions the buckets produce —
    * the quantity that explodes when buckets are coarse.
    *
    * Matches [[cosineNearDupPairs]] exactly when recall is 1 (asserted in
    * SimOpsSpec and oracle-checked against the exhaustive SQL in q41).
    */
  def lshNearDupPairs(vecs: DataFrame, idCol: String, vecCol: String,
                      threshold: Double, planes: Int = 4, tables: Int = 48,
                      dim: Int = 64): DataFrame = {
    VectorFunctions.register(vecs.sparkSession)
    LshFunctions.register(vecs.sparkSession)
    // one batched signature expression + posexplode (see LshSignatures)
    val sigs = vecs.select(col(idCol).as("id"), col(vecCol).as("__v"),
        norm(col(vecCol)).as("__norm"),
        LshFunctions.signatures(col(vecCol), planes, tables, dim).as("__sigs"))
      .select(col("id"), col("__v"), col("__norm"),
        posexplode(col("__sigs")).as(Seq("__t", "__s")))
      .select(col("id"), col("__v"), col("__norm"),
        struct(col("__t").as("t"), col("__s").as("s")).as("__b"))
    val a = sigs.select(col("id").as("a_id"), col("__v").as("__av"),
      col("__norm").as("__an"), col("__b").as("__ab"))
    val b = sigs.select(col("id").as("b_id"), col("__v").as("__bv"),
      col("__norm").as("__bn"), col("__b").as("__bb"))
    // SHUFFLE_HASH, not broadcast: both sides are the same exploded
    // corpus (tables x n rows CARRYING vectors) — a broadcast would
    // collect and rebroadcast all of it through the driver; hash-join
    // per bucket partition is the scale shape
    a.join(b.hint("shuffle_hash"),
        col("__ab") === col("__bb") && col("a_id") < col("b_id"))
      .withColumn("cosine", safeCos(dot(col("__av"), col("__bv")), col("__an"), col("__bn")))
      .filter(round(col("cosine"), 6) >= threshold)
      .select(col("a_id"), col("b_id"), round(col("cosine"), 6).as("cosine"))
      .distinct() // duplicate table hits of the same surviving pair
  }

  // ---- incremental embedding near-dup: persisted LSH store -------------

  private[graft] val EmbSigs = "embdup_sigs"
  private[graft] val EmbVecs = "embdup_vecs"

  /** Persist an archive's embedding near-dup state: LSH bucket postings
    * ((t, s, id) per signature table) plus exact vectors + norms for
    * the verify stage — the embedding analog of the text family's
    * MinHash store, landed as ONE atomic group write. Admitting a new
    * embedding batch against a 100 TB archive then touches only these
    * two tables ([[embLshStoreProbe]]), never re-hashing the archive.
    */
  def embLshStoreBuild(vecs: DataFrame, idCol: String, vecCol: String,
                       sink: graft.sink.UpsertSink, planes: Int = 4,
                       tables: Int = 48, dim: Int = 64): Unit = {
    VectorFunctions.register(vecs.sparkSession)
    LshFunctions.register(vecs.sparkSession)
    sink.overwriteMany(Seq(
      graft.sink.TableWrite(EmbSigs,
        vecs.select(col(idCol).as("id"),
            posexplode(LshFunctions.signatures(col(vecCol), planes,
              tables, dim)).as(Seq("t", "s")))
          .select(col("t"), col("s"), col("id")),
        Seq("t", "s", "id")),
      graft.sink.TableWrite(EmbVecs,
        vecs.select(col(idCol).as("id"), col(vecCol).as("v"),
          norm(col(vecCol)).as("n")),
        Seq("id"))))
  }

  /** Probe a NEW batch against the persisted archive state: near-dup
    * pairs (a_id archive, b_id batch) at exact cosine >= `threshold`.
    * Candidate generation broadcasts the batch's (t, s) signatures
    * against the posting scan (map-only — the archive side never
    * shuffles); the batch-bounded candidate set broadcasts against the
    * vector scan for the exact verify. Same signature parameters as
    * the build, same recall argument as q41 (params tuned so candidate
    * recall is 1.0 at the target threshold regime).
    */
  def embLshStoreProbe(batch: DataFrame, idCol: String, vecCol: String,
                       sink: graft.sink.UpsertSink, threshold: Double,
                       planes: Int = 4, tables: Int = 48, dim: Int = 64,
                       broadcastBatch: Boolean = true): DataFrame = {
    VectorFunctions.register(batch.sparkSession)
    LshFunctions.register(batch.sparkSession)
    val bc: DataFrame => DataFrame =
      if (broadcastBatch) broadcast(_) else identity
    val batchSigs = batch.select(col(idCol).as("b_id"),
        posexplode(LshFunctions.signatures(col(vecCol), planes,
          tables, dim)).as(Seq("t", "s")))
    val cands = sink.read(EmbSigs).join(bc(batchSigs), Seq("t", "s"))
      .select(col("id").as("a_id"), col("b_id")).distinct()
    sink.read(EmbVecs)
      .select(col("id").as("a_id"), col("v").as("__av"),
        col("n").as("__an"))
      .join(bc(cands), "a_id")
      .join(bc(batch.select(col(idCol).as("b_id"), col(vecCol).as("__bv"),
        norm(col(vecCol)).as("__bn"))), "b_id")
      .withColumn("cosine",
        safeCos(dot(col("__av"), col("__bv")), col("__an"), col("__bn")))
      .filter(round(col("cosine"), 6) >= threshold)
      .select(col("a_id"), col("b_id"), round(col("cosine"), 6).as("cosine"))
  }

  /** ERASE vectors from the persisted embedding near-dup state —
    * the embedding analog of [[graft.ops.TextOps.minhashStoreRetract]]:
    * one group delete removes the ids' LSH postings AND exact vectors
    * under a single writer lease (no torn group for `snapshotMany`
    * readers; erased vectors can never resurface as candidates). The
    * postings table's merge key is (t, s, id) — full keys derive from
    * one broadcast-filtered posting scan, eagerly checkpointed because
    * that plan reads the files the delete rewrites.
    */
  def embLshStoreRetract(ids: DataFrame, idCol: String,
                         sink: graft.sink.UpsertSink): Unit =
    // keys derive INSIDE the eraseMany lease (thunk overload): a
    // concurrent admit can never slip signature postings in between
    // the key scan and the delete. The broadcast hint scopes to the
    // posting-scan join only — the TableDelete key frames execute
    // join-free in the delete.
    sink.eraseMany(embLshRetractTables) {
      embLshRetractPlan(ids, idCol, sink)
    }

  private[ops] def embLshRetractTables: Seq[String] = Seq(EmbSigs, EmbVecs)

  private[ops] def embLshRetractPlan(
      ids: DataFrame, idCol: String,
      sink: graft.sink.UpsertSink): Seq[graft.sink.TableErase] = {
    val keys = ids.select(col(idCol).cast("long").as("id")).distinct()
    // a previously fully-erased (fileless) postings table has nothing
    // to scan for keys — and nothing to delete; the vector delete's
    // keys derive from `ids` alone, so it survives regardless
    val sigErase =
      if (!sink.hasData(EmbSigs)) Nil
      else {
        val sigKeys = sink.read(EmbSigs).join(broadcast(keys), "id")
          .select(col("t"), col("s"), col("id"))
          .localCheckpoint(true)
        Seq(graft.sink.TableDelete(EmbSigs, sigKeys, Seq("t", "s", "id")))
      }
    sigErase :+
      graft.sink.TableDelete(EmbVecs, keys.select(col("id")), Seq("id"))
  }

  /** Admission: probe, then fold the batch into the store (one
    * mergeMany round-trip over both tables) so later batches dedup
    * against this one too. Returns the pre-admission pairs.
    */
  def embLshStoreAdmit(batch: DataFrame, idCol: String, vecCol: String,
                       sink: graft.sink.UpsertSink, threshold: Double,
                       planes: Int = 4, tables: Int = 48,
                       dim: Int = 64): DataFrame =
    // whole admission under the writer lease (reentrant into mergeMany):
    // the probe reads store files a concurrent eraser could swap away
    sink.writerLocked(Seq(EmbSigs, EmbVecs)) {
    // eager localCheckpoint: the probe plan reads the store files the
    // merge below rewrites
    val out = embLshStoreProbe(batch, idCol, vecCol, sink, threshold,
      planes, tables, dim).localCheckpoint(true)
    sink.mergeMany(Seq(
      graft.sink.TableMerge(EmbSigs,
        batch.select(col(idCol).as("id"),
            posexplode(LshFunctions.signatures(col(vecCol), planes,
              tables, dim)).as(Seq("t", "s")))
          .select(col("t"), col("s"), col("id")),
        Seq("t", "s", "id"), pkUnique = true),
      graft.sink.TableMerge(EmbVecs,
        batch.select(col(idCol).as("id"), col(vecCol).as("v"),
          norm(col(vecCol)).as("n")),
        Seq("id"), pkUnique = true)))
    out
    }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic near-dedup
    * scoped to trained k-means clusters — the scale answer to exhaustive
    * q33-style pairing: pairwise cosine runs only WITHIN a cluster, so
    * pair volume is Σ|cluster|² instead of n², and `nlist` grows with
    * the corpus to hold cluster size (and so per-cluster cost) constant.
    * Assignment reuses the decimal-exact trained quantizer
    * ([[trainCentroids]] — deterministic at any parallelism), the join
    * key is the cluster id (equi-shuffle, never a cartesian), and the
    * kill rule matches q56: the larger id of any pair at
    * `cosine >= threshold` is dropped. Approximate BY DESIGN versus
    * global near-dup — a cross-cluster pair is invisible (the paper
    * accepts exactly this trade; SimOpsSpec pins kills ⊆ global kills).
    *
    * Output: surviving (idCol, cluster) rows.
    */
  def semDedup(vecs: DataFrame, idCol: String, vecCol: String,
               nlist: Int, threshold: Double, iters: Int = 2,
               probes: Int = 1): DataFrame = {
    require(probes >= 1 && probes <= nlist,
      s"probes $probes must be in [1, nlist=$nlist]")
    VectorFunctions.register(vecs.sparkSession)
    val cents = trainCentroids(vecs, idCol, vecCol, nlist, iters)
    // multi-probe mitigation for the paper's cross-cluster blind spot: a
    // vector is candidate-visible in its top-`probes` clusters, so a dup
    // pair straddling one boundary still meets when either member's
    // second-best cluster is the other's best. Pair volume grows ~probes²
    // but every join stays equi-keyed on the cluster id; the REPORTED
    // cluster (and the survivor set's shape) stays the top-1 assignment.
    val scored = vecs.select(col(idCol), col(vecCol).as("__v"),
      norm(col(vecCol)).as("__n"),
      slice(sort_array(centScores(cents, col(vecCol)), asc = false),
        1, probes).as("__ps"))
    val assigned = scored.select(col(idCol), col("__v"), col("__n"),
        col("__ps").getItem(0).getField("c").as("__cl0"),
        explode(col("__ps")).as("__p"))
      .select(col(idCol), col("__v"), col("__n"), col("__cl0"),
        col("__p").getField("c").as("__cl"))
    val a = assigned.select(col("__cl"), col(idCol).as("a_id"),
      col("__v").as("__av"), col("__n").as("__an"))
    val b = assigned.select(col("__cl"), col(idCol).as("b_id"),
      col("__v").as("__bv"), col("__n").as("__bn"))
    // a pair sharing several probed clusters meets once per shared
    // cluster; distinct() collapses the kill set regardless
    val kills = a.join(b, Seq("__cl"))
      .filter(col("a_id") < col("b_id"))
      .filter(round(safeCos(dot(col("__av"), col("__bv")),
        col("__an"), col("__bn")), 6) >= threshold)
      .select(col("b_id").as(idCol)).distinct()
    // narrow projection for the anti-join: the assignment recomputes
    // (column pruning keeps it to id+vec), but the full vectors and
    // norms must not ride the id-keyed shuffle just to be dropped
    scored.select(col(idCol),
        col("__ps").getItem(0).getField("c").as("__cl0"))
      .join(kills, Seq(idCol), "left_anti")
      .select(col(idCol), col("__cl0").as("cluster"))
  }

  /** CORESET / DIVERSITY SELECTION — the selection counterpart of
    * [[semDedup]]'s deletion, and the other standard embedding-space
    * data-pruning move: instead of deleting near-dups, KEEP the k most
    * diverse representatives per trained cluster (farthest-first
    * traversal / k-center greedy — Gonzalez 1985; Sener & Savarese,
    * "Active Learning for CNNs: A Core-Set Approach", ICLR 2018; the
    * cluster-scoped form data-pruning pipelines use at scale).
    *
    * Scale shape: one deterministic quantizer training (the
    * [[trainCentroids]] decimal discipline), one map-side assignment,
    * one cluster-keyed shuffle into `mapGroups` where each cluster's
    * greedy runs in memory — per-cluster cost O(k·|cluster|·dim) and
    * |cluster| is held constant by growing `nlist` with the corpus
    * (the identical posture [[semDedup]] ships with). Determinism at
    * any parallelism: the greedy depends only on pairwise doubles and
    * id tie-breaks (seed = min id; ties toward the smaller id), never
    * on iterator order.
    *
    * Output: (cluster, idCol, rank) — rank 1..min(k, |cluster|) in
    * selection order (rank 1 = seed, rank 2 = farthest from seed, ...).
    */
  def diverseSelect(vecs: DataFrame, idCol: String, vecCol: String,
                    k: Int, nlist: Int, iters: Int = 2): DataFrame =
    diverseSelectAudited(vecs, idCol, vecCol, k, nlist, iters)
      .select(col("cluster"), col(idCol), col("rank"))

  /** [[diverseSelect]] with the diversity claim as DRIVER-CHECKED audit
    * columns (round-12 verdict #7 — the recall_mil pattern for the
    * k-center family): per cluster, `mindist_sel_mil` — the minimum
    * pairwise cosine distance among the SELECTED representatives, in
    * mil — against `mindist_rnd_mil`, the same statistic for a SEEDED
    * pseudo-random subset of the same size from the same cluster
    * (members with the k smallest splitmix64(id) values — deterministic,
    * id-derived, independent of the geometry). Farthest-first greedy
    * maximizes exactly this min-distance objective, so selected >=
    * random on every cluster is the checkable form of
    * "diversity-beats-redundancy"; a cluster with fewer than 2 selected
    * members has no pairs and reports 1000/1000 (vacuous). Computed
    * inside the same per-cluster greedy pass — no extra shuffle, no
    * second clustering.
    */
  def diverseSelectAudited(vecs: DataFrame, idCol: String, vecCol: String,
                           k: Int, nlist: Int, iters: Int = 2): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = vecs.sparkSession
    import spark.implicits._
    VectorFunctions.register(spark)
    locally {
      import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
      val dt = vecs.schema(idCol).dataType
      require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
        s"diverseSelect id column '$idCol' must be integral " +
          s"(greedy state keys on longs); got ${dt.simpleString}")
    }
    val cents = trainCentroids(vecs, idCol, vecCol, nlist, iters)
    val assigned = vecs.filter(col(vecCol).isNotNull)
      .select(array_max(centScores(cents, col(vecCol))).getField("c")
          .as("cluster"),
        col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .as[(Int, Long, Array[Float])]
    assigned.groupByKey(_._1)
      .flatMapGroups { (cl: Int, it: Iterator[(Int, Long, Array[Float])]) =>
        val members = it.map(m => (m._2, m._3)).toArray
        def cosDist(a: Array[Float], b: Array[Float]): Double = {
          val n = math.min(a.length, b.length)
          var d = 0.0; var na = 0.0; var nb = 0.0
          var i = 0
          while (i < n) {
            val x = a(i).toDouble; val y = b(i).toDouble
            d += x * y; na += x * x; nb += y * y; i += 1
          }
          val r =
            if (na == 0.0 || nb == 0.0) 1.0
            else 1.0 - d / (math.sqrt(na) * math.sqrt(nb))
          // a NaN component poisons every comparison (NaN >= 0 and
          // NaN > x are both false): score degenerate vectors as
          // distance 0 — never "diverse", never crash the greedy
          if (java.lang.Double.isNaN(r)) 0.0 else r
        }
        // seed: the smallest id (deterministic however the iterator
        // arrives); then farthest-first on min-distance-to-selected
        var seedIx = 0
        var i = 1
        while (i < members.length) {
          if (members(i)._1 < members(seedIx)._1) seedIx = i
          i += 1
        }
        val selected = scala.collection.mutable.ArrayBuffer(seedIx)
        val minDist = Array.tabulate(members.length)(j =>
          cosDist(members(j)._2, members(seedIx)._2))
        minDist(seedIx) = -1.0 // never re-selected
        var exhausted = false
        while (!exhausted && selected.length < math.min(k, members.length)) {
          var best = -1
          var j = 0
          while (j < members.length) {
            if (minDist(j) >= 0.0 && (best < 0 || minDist(j) > minDist(best) ||
                (minDist(j) == minDist(best) && members(j)._1 < members(best)._1)))
              best = j
            j += 1
          }
          if (best < 0) { exhausted = true } // defensive: no candidate left
          else {
          selected += best
          val bv = members(best)._2
          minDist(best) = -1.0
          j = 0
          while (j < members.length) {
            if (minDist(j) >= 0.0) {
              val d = cosDist(members(j)._2, bv)
              if (d < minDist(j)) minDist(j) = d
            }
            j += 1
          }
          }
        }
        // audit: min pairwise distance of the selected set vs a seeded
        // pseudo-random same-size subset (k smallest splitmix64(id))
        def minPairMil(ixs: Seq[Int]): Long =
          if (ixs.length < 2) 1000L
          else {
            var m = Double.MaxValue
            var x = 0
            while (x < ixs.length) {
              var y = x + 1
              while (y < ixs.length) {
                val d = cosDist(members(ixs(x))._2, members(ixs(y))._2)
                if (d < m) m = d
                y += 1
              }
              x += 1
            }
            math.floor(m * 1000).toLong
          }
        def mix64(v: Long): Long = {
          var z = v + 0x9E3779B97F4A7C15L
          z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
          z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
          z ^ (z >>> 31)
        }
        val rnd = members.indices
          .sortBy(j => (mix64(members(j)._1), members(j)._1))
          .take(selected.length)
        val selMil = minPairMil(selected.toSeq)
        val rndMil = minPairMil(rnd)
        selected.iterator.zipWithIndex.map { case (ix, r) =>
          (cl, members(ix)._1, r + 1, selMil, rndMil)
        }
      }
      .toDF("cluster", idCol, "rank", "mindist_sel_mil", "mindist_rnd_mil")
  }

  /** Chunk -> document embedding pooling: the element-wise mean of every
    * group's vectors (RAG / retrieval pipelines pool chunk embeddings
    * into document embeddings exactly like this). Two equi-shuffles:
    * (group, component) for the fold, (group) for array re-assembly —
    * group size is chunks-per-document, never corpus-scale.
    *
    * Determinism contract: floating-point addition does not commute, so
    * the per-component sum folds in EXPLICIT `idCol` order over a
    * sorted collect (group-size bounded) instead of a partial-aggregate
    * `sum()` whose merge order varies run to run. Same-order folds are
    * bit-identical across engines — which is what lets an external SQL
    * oracle check pooled DOUBLE values exactly (rounded to 6dp only as
    * a display convention, not as a fuzz band).
    *
    * Output: (grpCol, n_vecs, pooled array<double> — each component
    * rounded to 6dp).
    */
  def meanPool(vecs: DataFrame, idCol: String, grpCol: String,
               vecCol: String): DataFrame = {
    val comp = vecs.select(col(grpCol), col(idCol).as("__id"),
        posexplode(col(vecCol)).as(Seq("__i", "__x")))
      .select(col(grpCol), col("__i"), col("__id"),
        col("__x").cast("double").as("__xd"))
    val means = comp.groupBy(grpCol, "__i")
      .agg(count(lit(1)).as("__n"),
        aggregate(
          transform(sort_array(collect_list(struct(col("__id"), col("__xd")))),
            s => s.getField("__xd")),
          lit(0.0), (acc, v) => acc + v).as("__s"))
      .select(col(grpCol), col("__i"), col("__n"),
        round(col("__s") / col("__n"), 6).as("__m"))
    means.groupBy(grpCol)
      .agg(max(col("__n")).as("n_vecs"),
        transform(sort_array(collect_list(struct(col("__i"), col("__m")))),
          s => s.getField("__m")).as("pooled"))
      .select(col(grpCol), col("n_vecs").cast("int").as("n_vecs"), col("pooled"))
  }

  /** INT8 scalar quantization of an embedding column — the standard
    * 4× storage compression for vector corpora (symmetric absmax, the
    * scheme int8 inference kernels and every vector store's SQ8 codec
    * use): per vector, scale = 127 / max|x_i| and q_i =
    * round(x_i·scale) as one signed byte. Map-only — no shuffle, no
    * state; the inverse (q_i / scale) reconstructs to within half a
    * step of the largest component, which preserves cosine ranking to
    * ~3 decimal places at dim 64 (spec-asserted round-trip bound).
    *
    * Zero vectors quantize to scale 0 and all-zero codes (there is no
    * direction to preserve). Arithmetic is float→double promotion,
    * round-half-away-from-zero, byte cast — each step identical in an
    * external SQL engine, so the codes hash-compare exactly.
    *
    * Output: (idCol, scale double rounded 6dp, q array<tinyint>).
    */
  def int8Quantize(vecs: DataFrame, idCol: String, vecCol: String): DataFrame = {
    // native scale + encode (Int8Scale/Int8Codes): the HOF formulation
    // ran interpreted, and CollapseProject inlined the absmax TREE into
    // the encode lambda — O(dim^2) interpreted work per row for a
    // map-only scan (q91 cost seconds; the r10 md5 finding's shape).
    // The scale is evaluated once per row as the codes' ARGUMENT;
    // results are bit-identical (same float-max then 127.0/(double)
    // shape, same shortest-decimal HALF_UP rounding).
    VectorFunctions.register(vecs.sparkSession)
    // a NULL vector scales 0.0 (the oracle's `am IS NULL -> 0.0` arm)
    // while its codes stay NULL — coalesce restores that asymmetry
    // over the null-intolerant native expression
    val scale = coalesce(VectorFunctions.int8Scale(col(vecCol)), lit(0.0))
    vecs.select(col(idCol),
      round(scale, 6).as("scale"),
      VectorFunctions.int8Codes(col(vecCol), scale).as("q"))
  }

  /** All pairs (a < b) with cosine >= threshold — the exhaustive
    * formulation. O(n^2) by construction: kept ONLY as the correctness
    * oracle for [[lshNearDupPairs]] (which is the operator users should
    * reach for); never the default at scale.
    */
  def cosineNearDupPairs(vecs: DataFrame, idCol: String, vecCol: String,
                         threshold: Double): DataFrame = {
    VectorFunctions.register(vecs.sparkSession)
    val a = vecs.select(col(idCol).as("a_id"), col(vecCol).as("__av"),
      norm(col(vecCol)).as("__an"))
    val b = vecs.select(col(idCol).as("b_id"), col(vecCol).as("__bv"),
      norm(col(vecCol)).as("__bn"))
    a.join(b, col("a_id") < col("b_id"))
      .withColumn("cosine", safeCos(dot(col("__av"), col("__bv")), col("__an"), col("__bn")))
      .filter(round(col("cosine"), 6) >= threshold)
      .select(col("a_id"), col("b_id"), round(col("cosine"), 6).as("cosine"))
  }
}
