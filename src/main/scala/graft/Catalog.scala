package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{MinHashFunctions, WinnowFunctions}
import graft.ops.{BpeOps, ChatOps, ClassifierOps, GraphOps, MultimodalOps, RelOps, SampleOps, SelectOps, SimOps, TextOps, WebOps}

/** One named query: the Spark plan plus (when SQL-expressible) the exact
  * DuckDB oracle the driver hash-compares against.
  *
  * Invariants that keep the oracle comparison deterministic:
  *  - every result has a total ordering (ORDER BY a unique key) in BOTH
  *    the Spark plan and the SQL;
  *  - aggregate/computed columns carry identical aliases on both sides;
  *  - floating-point aggregates are computed exactly (decimal-cast before
  *    summing) and only converted to double after rounding, so both
  *    engines produce bit-identical values;
  *  - oracle-compared outputs carry ONLY atomic columns — no raw
  *    array/map/struct (the driver's pandas row-sort cannot hash them).
  *    Serialize nested values on both sides: `array_join(c, ",")` /
  *    `hex(...)` in Spark, `array_to_string(...)` / `hex(...)` in the
  *    SQL. Enforced by CatalogSpec's flat-schema guard.
  */
final case class QueryDef(
    name: String,
    doc: String,
    oracle: Option[String],
    fn: (SparkSession, String) => DataFrame)


/** Plumbing and DuckDB-oracle SQL fragments shared by every catalog
  * family file ([[CatalogRelational]] .. [[CatalogStores]]): table
  * loading, the exact-decimal cast, the process-local temp store for
  * queries that persist intermediate tables, and the SQL replicas of
  * the engine's deterministic kernels. `protected` because only the
  * family traits (mixed into [[Catalog]]) consume them.
  */
private[graft] trait CatalogShared {

  protected def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  /** Exact decimal cast used on both sides before summing doubles. */
  protected def dec(c: Column): Column = c.cast("decimal(18,2)")

  /** Process-local temp roots for queries that persist intermediate
    * tables (q59/q63 cluster sharing, q64 admission replay): one root
    * per (JVM, source dir, purpose), deleted on JVM exit. Only the ROOT
    * PATH is cached — the UpsertSink is rebuilt per call against the
    * CURRENT session, so a cached handle can never outlive a stopped
    * SparkContext. Process-local on purpose: a fresh JVM always starts
    * empty, so a stale table from an earlier run or a different corpus
    * can never leak into results; within one run (bench, verify, a real
    * pipeline) consumers share the materialized tables.
    */
  protected object tempStore {
    private val roots =
      scala.collection.concurrent.TrieMap.empty[(String, String), String]

    private def root(purpose: String, dir: String): java.nio.file.Path = {
      val path = roots.getOrElseUpdate((purpose, dir), {
        val p = java.nio.file.Files.createTempDirectory(s"graft_$purpose")
        sys.addShutdownHook(graft.sink.Fs.deleteRecursively(p))
        p.toString
      })
      java.nio.file.Paths.get(path)
    }

    // 8 buckets, not the 64-bucket production default: these stores hold
    // sf-scale intermediate tables where per-bucket file/move overhead
    // dominates, and the layout records its own modulus so a different
    // reader still merges correctly
    def sink(s: SparkSession, purpose: String, dir: String): graft.sink.UpsertSink =
      new graft.sink.UpsertSink(s, root(purpose, dir).toString, numBuckets = 8)

    /** A sink whose tables start EMPTY for this call — for replay-style
      * queries that must not see a previous invocation's state. Reuses
      * the one root (bounded disk) and clears it.
      */
    def freshSink(s: SparkSession, purpose: String, dir: String): graft.sink.UpsertSink = {
      val r = root(purpose, dir)
      val stream = java.nio.file.Files.list(r)
      try stream.forEach(p => graft.sink.Fs.deleteRecursively(p))
      finally stream.close()
      new graft.sink.UpsertSink(s, r.toString, numBuckets = 8)
    }
  }

  /** Doc -> duplicate-cluster labels from the q31 SimHash pair graph:
    * the shared computation behind q59 (producer) and q63 (consumer).
    */
  protected def dupClusterLabels(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val pairs = TextOps.simhashNearDupPairs(docs, "doc_id", "text", 2)
    val cc = GraphOps.connectedComponents(pairs, "a_id", "b_id")
      .select(col("node").as("doc_id"), col("comp"))
    docs.select("doc_id").join(cc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("comp"), col("doc_id")).as("cluster"))
  }

  /** DuckDB fragment for lowercase word tokens — mirrors TextOps.tokens. */
  protected val sqlToks = "regexp_extract_all(lower(text), '[a-z]+')"

  /** SQL fragments mirroring [[TextOps.punctRatioMil]] /
    * [[TextOps.stopwordRatioMil]] / [[TextOps.qualityScoreMil]], shared by
    * q25 and the q52 curation pipeline.
    */
  protected val sqlPunctMil: String =
    """CAST(floor(1000 * (length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g')))
      |       / greatest(length(text), 1)) AS BIGINT)""".stripMargin

  protected val sqlStopMil: String =
    s"""CAST(floor(1000 * len(list_filter($sqlToks,
       |         w -> w IN ('the','a','and','of','to','in','is')))
       |       / greatest(len($sqlToks), 1)) AS BIGINT)""".stripMargin

  protected val sqlQualityMil: String =
    s"""CAST(greatest(0, least(1000,
       |    least(length(text), 400)
       |    + least($sqlStopMil * 3, 300)
       |    + 300
       |    - least($sqlPunctMil, 300))) AS BIGINT)""".stripMargin

  /** SQL pieces mirroring [[TextOps.langId]]: per-language hit exprs, the
    * max, the winner count, and the deterministic first-winner CASE.
    */
  protected def sqlLangPieces: (String, String, String, String) = {
    val langs = TextOps.langMarkers.keys.toSeq.sorted
    val hitExprs = langs.map { l =>
      val in = TextOps.langMarkers(l).map(w => s"'$w'").mkString(", ")
      s"len(list_filter($sqlToks, w -> w IN ($in))) AS h_$l"
    }.mkString(",\n  ")
    val maxExpr = s"greatest(${langs.map(l => s"h_$l").mkString(", ")})"
    val nWin = langs.map(l => s"CASE WHEN h_$l = mx THEN 1 ELSE 0 END").mkString(" + ")
    val firstWin = langs.reverse.foldLeft("NULL") { (acc, l) =>
      s"CASE WHEN h_$l = mx THEN '$l' ELSE $acc END"
    }
    (hitExprs, maxExpr, nWin, firstWin)
  }


  /** DuckDB fragment: exact double-precision dot product of two float
    * lists in index order — mirrors SimOps.dot.
    */
  protected def sqlDot(a: String, b: String): String =
    s"list_sum(list_transform(range(1, len($a) + 1), " +
      s"i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"

  /** NaN-guarded like [[graft.ops.SimOps.safeCos]]: both engines order
    * NaN above every number, so a zero-norm vector's 0/0 would pass
    * every threshold and win every ranking identically on both sides —
    * consistently wrong. The guard keeps them consistently RIGHT.
    */
  protected def sqlCosine(a: String, b: String): String = {
    val raw = s"${sqlDot(a, b)} / (sqrt(${sqlDot(a, a)}) * sqrt(${sqlDot(b, b)}))"
    s"CASE WHEN isnan($raw) THEN 0.0 ELSE $raw END"
  }


  /** Shared oracle CTE: winnowed fingerprint sets per document (k=8,
    * window=4), the SQL replication of [[graft.functions.WinnowHash]] —
    * same 0-seeded `(h*31 + code) mod 1e9+7` fold per gram, min per
    * window, sorted distinct.
    */
  protected def winnowFpsCte: String =
    """WITH c AS (SELECT doc_id,
      |    array_to_string(regexp_extract_all(lower(text), '[a-z]+'), ' ') AS s
      |  FROM documents),
      |g AS (SELECT doc_id, CASE WHEN len(s) < 8
      |    THEN [list_reduce(list_prepend(CAST(0 AS BIGINT),
      |           [CAST(ascii(s[i]) AS BIGINT) for i in range(1, len(s)+1)]),
      |           (a,b) -> (a*31+b) % 1000000007)]
      |    ELSE [list_reduce(list_prepend(CAST(0 AS BIGINT),
      |           [CAST(ascii(s[i+j]) AS BIGINT) for j in range(0, 8)]),
      |           (a,b) -> (a*31+b) % 1000000007)
      |          for i in range(1, len(s) - 8 + 2)] END AS gr
      |  FROM c),
      |w AS (SELECT doc_id, CASE WHEN len(gr) <= 4 THEN [list_min(gr)]
      |    ELSE [list_min(gr[i:i+3]) for i in range(1, len(gr) - 4 + 2)] END AS wins
      |  FROM g),
      |f AS (SELECT doc_id, list_sort(list_distinct(wins)) AS fps FROM w)""".stripMargin
}

/** The full query inventory (SURVEY.md §2 operators + training-data
  * ops), assembled from one file per family — a pure mechanical split
  * of the former single 4 kLoC file (round-11 verdict #8): the family
  * members, every query entry, and `byName` are byte-identical to the
  * monolith's.
  */
object Catalog extends CatalogRelational with CatalogTextual
    with CatalogSimilarity with CatalogPipelines with CatalogServing
    with CatalogStores {

  /** Training-data analytics: the three analytics files in their
    * original order (q36..q79, q80..q105, q106..q122).
    */
  def analytics: Seq[QueryDef] = pipelines ++ serving ++ stores

  def all: Seq[QueryDef] = relational ++ textual ++ similarity ++ analytics

  def byName: Map[String, QueryDef] = all.map(q => q.name -> q).toMap
}
