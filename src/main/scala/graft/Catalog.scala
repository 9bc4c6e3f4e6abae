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

/** The full query inventory (SURVEY.md §2 operators + training-data ops). */
object Catalog {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  /** Exact decimal cast used on both sides before summing doubles. */
  private def dec(c: Column): Column = c.cast("decimal(18,2)")

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
  private object tempStore {
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
  private def dupClusterLabels(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val pairs = TextOps.simhashNearDupPairs(docs, "doc_id", "text", 2)
    val cc = GraphOps.connectedComponents(pairs, "a_id", "b_id")
      .select(col("node").as("doc_id"), col("comp"))
    docs.select("doc_id").join(cc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("comp"), col("doc_id")).as("cluster"))
  }

  // ---------------------------------------------------------------------
  // Relational core (SURVEY §2.2-§2.7)
  // ---------------------------------------------------------------------

  val relational: Seq[QueryDef] = Seq(

    QueryDef("q01_pruned_scan",
      "P1/P3: projection + predicate pushdown to the parquet scan " +
        "(reference: subgraphQueryBuilder.ts:116-126,131-198).",
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
             |FROM lineitem
             |WHERE l_shipdate < TIMESTAMP '1995-06-01 00:00:00' AND l_quantity < 5
             |ORDER BY l_orderkey, l_linenumber""".stripMargin),
      (s, dir) => t(s, dir, "lineitem")
        .filter(col("l_shipdate") < lit("1995-06-01 00:00:00").cast("timestamp")
          && col("l_quantity") < 5)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber")),

    QueryDef("q02_agg_pricing",
      "A3/A6: grouped aggregation with exact decimal arithmetic " +
        "(TPC-H Q1 shape; reference rollups §2.4).",
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base,
             |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
             |        (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS sum_disc,
             |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_qty,
             |  count(*) AS n
             |FROM lineitem
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin),
      (s, dir) => t(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
          sum(dec(col("l_extendedprice"))).cast("double").as("sum_base"),
          round(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))), 2)
            .cast("double").as("sum_disc"),
          round(sum(dec(col("l_quantity"))).cast("double") / count(lit(1)), 6).as("avg_qty"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag", "l_linestatus")),

    QueryDef("q03_topk",
      "O1/A1: orderBy desc + limit, planned as TakeOrderedAndProject " +
        "(no global sort; reference subgraphQueryBuilder.ts:174-198).",
      Some("""SELECT o_orderkey, o_custkey, o_totalprice
             |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin),
      (s, dir) => RelOps.topK(
        t(s, dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice"),
        10, col("o_totalprice").desc, col("o_orderkey"))),

    QueryDef("q04_keyset_page",
      "P4/O2: keyset pagination (id_gt cursor + page size) — the scale-safe " +
        "alternative to OFFSET (reference subgraphSyncer.ts:88-133).",
      Some("""SELECT o_orderkey, o_orderstatus, o_totalprice
             |FROM orders WHERE o_orderkey > 1000
             |ORDER BY o_orderkey LIMIT 100""".stripMargin),
      (s, dir) => RelOps.keysetPage(
        t(s, dir, "orders").select("o_orderkey", "o_orderstatus", "o_totalprice"),
        "o_orderkey", 1000L, 100)),

    QueryDef("q05_in_filter",
      "P5: IN-list predicate (reference rawState IN (...) — " +
        "blockProposalStateStrategy.ts:20-27).",
      Some("""SELECT o_orderkey, o_orderpriority FROM orders
             |WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
             |ORDER BY o_orderkey""".stripMargin),
      (s, dir) => t(s, dir, "orders")
        .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .select("o_orderkey", "o_orderpriority")
        .orderBy("o_orderkey")),

    QueryDef("q06_semi_join",
      "P6: existence semi-join (reference keeps only entities present in " +
        "the schema map — blockChangeLogStrategy.ts:106-107).",
      Some("""SELECT c_custkey, c_name FROM customer c
             |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
             |ORDER BY c_custkey""".stripMargin),
      (s, dir) => RelOps.semiJoin(
        t(s, dir, "customer"),
        t(s, dir, "orders").select(col("o_custkey").as("c_custkey")),
        Seq("c_custkey"))
        .select("c_custkey", "c_name").orderBy("c_custkey")),

    QueryDef("q07_anti_join",
      "P6: anti-join (reference excludes already-existing tables — " +
        "dbCreator.ts:199-203).",
      Some("""SELECT c_custkey, c_name FROM customer c
             |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
             |ORDER BY c_custkey""".stripMargin),
      (s, dir) => RelOps.antiJoin(
        t(s, dir, "customer"),
        t(s, dir, "orders").select(col("o_custkey").as("c_custkey")),
        Seq("c_custkey"))
        .select("c_custkey", "c_name").orderBy("c_custkey")),

    QueryDef("q08_lookup_join",
      "J1: big-fact x small-dim broadcast lookup join (reference joins DB " +
        "proposals to an RPC multicall map — blockProposalStateStrategy.ts:110-131).",
      Some("""SELECT o.o_orderkey, c.c_custkey, c.c_name, c.c_mktsegment
             |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
             |WHERE o.o_orderstatus = 'O' AND c.c_acctbal < 0
             |ORDER BY o.o_orderkey""".stripMargin),
      (s, dir) => RelOps.lookupJoin(
        t(s, dir, "orders").filter(col("o_orderstatus") === "O")
          .select(col("o_orderkey"), col("o_custkey").as("c_custkey")),
        t(s, dir, "customer").filter(col("c_acctbal") < 0),
        Seq("c_custkey"))
        .select("o_orderkey", "c_custkey", "c_name", "c_mktsegment")
        .orderBy("o_orderkey")),

    QueryDef("q09_fk_graph",
      "§2.3: multi-way equi-join over the FK graph (region-nation-customer-" +
        "orders-lineitem) with exact revenue rollup — the serving-side " +
        "analytics the reference delegates to Postgres.",
      Some("""SELECT r.r_name,
             |  CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
             |        (1 - CAST(l.l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS revenue,
             |  count(*) AS n_items
             |FROM region r
             |JOIN nation n ON n.n_regionkey = r.r_regionkey
             |JOIN customer c ON c.c_nationkey = n.n_nationkey
             |JOIN orders o ON o.o_custkey = c.c_custkey
             |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
             |GROUP BY r.r_name ORDER BY r.r_name""".stripMargin),
      (s, dir) => {
        val r = broadcast(t(s, dir, "region"))
        val n = broadcast(t(s, dir, "nation"))
        val c = broadcast(t(s, dir, "customer"))
        val o = t(s, dir, "orders")
        val l = t(s, dir, "lineitem")
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .join(c, o("o_custkey") === c("c_custkey"))
          .join(n, c("c_nationkey") === n("n_nationkey"))
          .join(r, n("n_regionkey") === r("r_regionkey"))
          .groupBy(col("r_name"))
          .agg(
            round(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))), 2)
              .cast("double").as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy("r_name")
      }),

    QueryDef("q10_distinct",
      "A2: distinct (reference dedups updated-entity names — " +
        "blockChangeLogStrategy.ts:94).",
      Some("SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment"),
      (s, dir) => t(s, dir, "customer").select("c_mktsegment").distinct()
        .orderBy("c_mktsegment")),

    QueryDef("q11_hwm_max",
      "A1/T5: high-water mark (max) read back from the sink before an " +
        "incremental fetch (utils.ts:4-15).",
      Some("SELECT max(event_id) AS hwm, count(*) AS n FROM events"),
      (s, dir) => t(s, dir, "events")
        .agg(max(col("event_id")).as("hwm"), count(lit(1)).as("n"))),

    QueryDef("q12_union_all",
      "O3: union-all of two source slices then re-aggregate (reference " +
        "accumulates page results — subgraphSyncer.ts:124-127).",
      Some("""SELECT event_type, count(*) AS n FROM (
             |  SELECT * FROM events WHERE value < 10
             |  UNION ALL
             |  SELECT * FROM events WHERE value >= 10
             |) GROUP BY event_type ORDER BY event_type""".stripMargin),
      (s, dir) => {
        val e = t(s, dir, "events")
        e.filter(col("value") < 10).unionAll(e.filter(col("value") >= 10))
          .groupBy("event_type").agg(count(lit(1)).as("n"))
          .orderBy("event_type")
      }),

    QueryDef("q13_daily_rollup",
      "A6: time rollup to daily grain (reference DailyAllocation — " +
        "config/default.yml:288-298).",
      Some("""SELECT CAST(ts AS DATE) AS day,
             |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
             |  count(*) AS n
             |FROM events GROUP BY day ORDER BY day""".stripMargin),
      (s, dir) => t(s, dir, "events")
        .groupBy(to_date(col("ts")).as("day"))
        .agg(sum(col("value").cast("decimal(18,6)")).cast("double").as("total_value"),
          count(lit(1)).as("n"))
        .orderBy("day")),

    QueryDef("q14_upsert_latest",
      "K1: last-write-wins upsert semantics in batch form — newest row per " +
        "primary key (reference INSERT..ON CONFLICT DO UPDATE — dbUpsert.ts:66-84).",
      Some("""SELECT user_id, event_id, event_type FROM (
             |  SELECT user_id, event_id, event_type,
             |    row_number() OVER (PARTITION BY user_id
             |                       ORDER BY ts DESC, event_id DESC) AS rn
             |  FROM events
             |) WHERE rn = 1 ORDER BY user_id""".stripMargin),
      (s, dir) => RelOps.latestByKey(t(s, dir, "events"), Seq("user_id"),
          Seq(col("ts").desc, col("event_id").desc))
        .select("user_id", "event_id", "event_type").orderBy("user_id")),

    QueryDef("q15_cdc_changed",
      "T4/A2: CDC-driven selective sync — distinct affected keys since a " +
        "high-water mark (blockChangeLogStrategy.ts:14-116).",
      Some("""SELECT DISTINCT user_id FROM events
             |WHERE event_type = 'error'
             |  AND event_id > (SELECT max(event_id) - 500 FROM events)
             |ORDER BY user_id""".stripMargin),
      (s, dir) => {
        val e = t(s, dir, "events")
        RelOps.aboveHighWaterMark(e, e, "event_id", 500L)
          .filter(col("event_type") === "error")
          .select("user_id").distinct().orderBy("user_id")
      }),

    QueryDef("q16_json_props",
      "F6: JSON decode of a wire-format payload column " +
        "(subgraphProvider.ts:192).",
      Some("""SELECT event_id, CAST(props->>'k' AS INTEGER) AS k
             |FROM events WHERE event_id <= 500 ORDER BY event_id""".stripMargin),
      (s, dir) => t(s, dir, "events")
        .filter(col("event_id") <= 500)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .orderBy("event_id")),

    QueryDef("q17_enum_decode",
      "F7: enum decode via literal mapping (proposal state labels — " +
        "blockProposalStateStrategy.ts:9-18).",
      Some("""SELECT event_id,
             |  CASE event_type WHEN 'signup' THEN 0 WHEN 'click' THEN 1
             |    WHEN 'view' THEN 2 WHEN 'purchase' THEN 3 WHEN 'error' THEN 4
             |    ELSE -1 END AS type_code
             |FROM events WHERE event_id <= 1000 ORDER BY event_id""".stripMargin),
      (s, dir) => t(s, dir, "events")
        .filter(col("event_id") <= 1000)
        .select(col("event_id"),
          coalesce(RelOps.enumDecode(col("event_type"),
            Seq("signup" -> 0, "click" -> 1, "view" -> 2, "purchase" -> 3,
              "error" -> 4)), lit(-1)).as("type_code"))
        .orderBy("event_id")),

    QueryDef("q18_decimal_arith",
      "F8/§1.2: uint256-policy decimal(38,0) arithmetic on key columns " +
        "(the reference's NUMERIC(78,0) block math — types.ts:17-20).",
      // The product/sum is DECIMAL(38,0) in Spark but DECIMAL128/HUGEINT on the
      // DuckDB side, and the driver's hasher is arrow-typed: equal values with
      // extreme-width integer types still mismatch. Carry `wei` as a canonical
      // decimal string on BOTH engines so the wire type is identical and boring.
      Some("""SELECT l_orderkey,
             |  CAST(CAST(l_orderkey AS DECIMAL(38,0)) * 1000000000000000000
             |    + CAST(l_partkey AS DECIMAL(38,0)) AS VARCHAR) AS wei
             |FROM lineitem WHERE l_linenumber = 1 AND l_orderkey <= 2000
             |ORDER BY l_orderkey""".stripMargin),
      (s, dir) => t(s, dir, "lineitem")
        .filter(col("l_linenumber") === 1 && col("l_orderkey") <= 2000)
        .select(col("l_orderkey"),
          (col("l_orderkey").cast("decimal(38,0)") * lit(1000000000000000000L)
            + col("l_partkey").cast("decimal(38,0)")).cast("string").as("wei"))
        .orderBy("l_orderkey")),

    QueryDef("q19_sliding_window",
      "T6: sliding re-fetch window relative to the head (reference re-pulls " +
        "the last 25,000 blocks — blockProposalStrategy.ts:19-20).",
      Some("""SELECT event_type, count(*) AS n FROM events
             |WHERE event_id > (SELECT max(event_id) - 1000 FROM events)
             |GROUP BY event_type ORDER BY event_type""".stripMargin),
      (s, dir) => {
        val e = t(s, dir, "events")
        RelOps.slidingWindow(e, "event_id", 1000L)
          .groupBy("event_type").agg(count(lit(1)).as("n"))
          .orderBy("event_type")
      }),

    QueryDef("q20_rollup",
      "Serving-side grouping-set rollup over the FK dimension hierarchy " +
        "(region > nation), with explicit null ordering on both engines.",
      Some("""SELECT r.r_name, n.n_name, count(*) AS n_cust
             |FROM customer c
             |JOIN nation n ON c.c_nationkey = n.n_nationkey
             |JOIN region r ON n.n_regionkey = r.r_regionkey
             |GROUP BY ROLLUP(r.r_name, n.n_name)
             |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin),
      (s, dir) => {
        val c = t(s, dir, "customer")
        val n = broadcast(t(s, dir, "nation"))
        val r = broadcast(t(s, dir, "region"))
        c.join(n, c("c_nationkey") === n("n_nationkey"))
          .join(r, n("n_regionkey") === r("r_regionkey"))
          .rollup(col("r_name"), col("n_name"))
          .agg(count(lit(1)).as("n_cust"))
          .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
      }),

    QueryDef("q21_window_lag",
      "Window navigation per key ordered by event time — prior-event " +
        "linkage for incremental history tables (§1.5).",
      Some("""SELECT user_id, event_id,
             |  lag(event_id) OVER (PARTITION BY user_id
             |                      ORDER BY ts, event_id) AS prev_event_id,
             |  row_number() OVER (PARTITION BY user_id
             |                     ORDER BY ts, event_id) AS rn
             |FROM events WHERE user_id < 20 ORDER BY user_id, event_id""".stripMargin),
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        t(s, dir, "events").filter(col("user_id") < 20)
          .select(col("user_id"), col("event_id"),
            lag(col("event_id"), 1).over(w).as("prev_event_id"),
            row_number().over(w).as("rn"))
          .orderBy("user_id", "event_id")
      }),

    QueryDef("q22_asof_join",
      "As-of join: each event matched to the user's most recent order at or " +
        "before the event time (composed from join + window; a dedicated " +
        "custom plan is unnecessary at these cardinalities).",
      Some("""SELECT event_id, user_id, o_orderkey FROM (
             |  SELECT e.event_id, e.user_id, o.o_orderkey,
             |    row_number() OVER (PARTITION BY e.event_id
             |      ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
             |  FROM events e
             |  JOIN orders o ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
             |  WHERE e.event_id <= 2000
             |) WHERE rn = 1 ORDER BY event_id""".stripMargin),
      (s, dir) => {
        val e = t(s, dir, "events").filter(col("event_id") <= 2000)
          .select("event_id", "user_id", "ts")
        val o = t(s, dir, "orders")
        val w = Window.partitionBy("event_id")
          .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
        e.join(o, o("o_custkey") === e("user_id") && o("o_orderdate") <= e("ts"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select("event_id", "user_id", "o_orderkey")
          .orderBy("event_id")
      }),

    QueryDef("q23_hex_roundtrip",
      "F4: binary/hex identifier round trip (convertDbIdToHash — " +
        "reorgCleanupStrategy.ts:12-14).",
      Some("""SELECT doc_id, lower(hex(CAST(substr(text, 1, 16) AS BLOB))) AS hx
             |FROM documents ORDER BY doc_id""".stripMargin),
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"),
          lower(hex(encode(substring(col("text"), 1, 16), "UTF-8"))).as("hx"))
        .orderBy("doc_id"))
  )

  // ---------------------------------------------------------------------
  // Training-data pipeline: text analysis (TextOps)
  // ---------------------------------------------------------------------

  /** DuckDB fragment for lowercase word tokens — mirrors TextOps.tokens. */
  private val sqlToks = "regexp_extract_all(lower(text), '[a-z]+')"

  /** SQL fragments mirroring [[TextOps.punctRatioMil]] /
    * [[TextOps.stopwordRatioMil]] / [[TextOps.qualityScoreMil]], shared by
    * q25 and the q52 curation pipeline.
    */
  private val sqlPunctMil: String =
    """CAST(floor(1000 * (length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g')))
      |       / greatest(length(text), 1)) AS BIGINT)""".stripMargin

  private val sqlStopMil: String =
    s"""CAST(floor(1000 * len(list_filter($sqlToks,
       |         w -> w IN ('the','a','and','of','to','in','is')))
       |       / greatest(len($sqlToks), 1)) AS BIGINT)""".stripMargin

  private val sqlQualityMil: String =
    s"""CAST(greatest(0, least(1000,
       |    least(length(text), 400)
       |    + least($sqlStopMil * 3, 300)
       |    + 300
       |    - least($sqlPunctMil, 300))) AS BIGINT)""".stripMargin

  /** SQL pieces mirroring [[TextOps.langId]]: per-language hit exprs, the
    * max, the winner count, and the deterministic first-winner CASE.
    */
  private def sqlLangPieces: (String, String, String, String) = {
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

  val textual: Seq[QueryDef] = Seq(

    QueryDef("q24_token_stats",
      "Token counting: whitespace tokens + a BPE-ish subword count, " +
        "all codegen'd regexp expressions.",
      Some(s"""SELECT doc_id, length(text) AS chars,
             |  len(regexp_extract_all(text, '\\S+')) AS ws_tokens,
             |  len(regexp_extract_all(lower(text),
             |      '[a-z]{1,4}|[0-9]{1,3}|[^a-z0-9\\s]')) AS subwords
             |FROM documents ORDER BY doc_id""".stripMargin),
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"), length(col("text")).as("chars"),
          TextOps.tokenCount(col("text")).as("ws_tokens"),
          TextOps.subwordCount(col("text")).as("subwords"))
        .orderBy("doc_id")),

    QueryDef("q25_quality_score",
      "Quality scoring: length / punctuation / stopword-ratio heuristic in " +
        "pure integer arithmetic (oracle-reproducible).",
      Some(s"""SELECT doc_id,
             |  $sqlPunctMil AS punct_mil,
             |  $sqlStopMil AS stop_mil,
             |  $sqlQualityMil AS quality_mil
             |FROM documents ORDER BY doc_id""".stripMargin),
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"),
          TextOps.punctRatioMil(col("text")).as("punct_mil"),
          TextOps.stopwordRatioMil(col("text")).as("stop_mil"),
          TextOps.qualityScoreMil(col("text")).as("quality_mil"))
        .orderBy("doc_id")),

    QueryDef("q26_langid",
      "Language-ID n-gram/stopword heuristic with deterministic argmax.",
      Some {
        val (hitExprs, maxExpr, nWin, firstWin) = sqlLangPieces
        s"""WITH h AS (SELECT doc_id, lang, $hitExprs FROM documents),
           |m AS (SELECT *, $maxExpr AS mx FROM h)
           |SELECT doc_id, lang, CASE WHEN mx = 0 OR ($nWin) > 1
           |  THEN 'und' ELSE ($firstWin) END AS guess
           |FROM m ORDER BY doc_id""".stripMargin
      },
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          TextOps.langId(col("text")).as("guess"))
        .orderBy("doc_id")),

    QueryDef("q27_fingerprint",
      "Document fingerprinting: md5 of whitespace-normalized text (stable " +
        "across engines).",
      Some("""SELECT doc_id,
             |  md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp
             |FROM documents ORDER BY doc_id""".stripMargin),
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
        .orderBy("doc_id")),

    QueryDef("q28_dedup_exact",
      "Exact dedup: hash-groupBy on the content fingerprint; keeper = " +
        "min doc_id per group (one shuffle on the hash).",
      Some("""SELECT md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp,
             |  min(doc_id) AS keeper, count(*) AS n
             |FROM documents GROUP BY fp ORDER BY fp""".stripMargin),
      (s, dir) => t(s, dir, "documents")
        .groupBy(TextOps.fingerprint(col("text")).as("fp"))
        .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n"))
        .orderBy("fp")),

    QueryDef("q29_dedup_minhash",
      "Near-dup detection: MinHash(128) -> 32 LSH bands -> candidate pairs " +
        "-> exact 3-gram-shingle Jaccard >= 0.5. The oracle computes " +
        "exhaustive Jaccard; the planted near-dups sit at j>=0.9 with the " +
        "organic background at j<=0.07, so band recall is exact here " +
        "(miss probability (1-0.9^4)^32 ~ 1e-15).",
      Some("""WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') w
             |  FROM documents),
             |sh AS (SELECT doc_id, CASE WHEN len(w) < 3
             |    THEN [array_to_string(w, ' ')]
             |    ELSE list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
             |                        for i in range(1, len(w) - 1)]) END AS s
             |  FROM toks),
             |p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
             |    CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
             |      / len(list_distinct(list_concat(a.s, b.s))) AS j
             |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
             |SELECT a_id, b_id, round(j, 4) AS jac FROM p
             |WHERE j >= 0.5 ORDER BY a_id, b_id""".stripMargin),
      (s, dir) => {
        val docs = t(s, dir, "documents")
        // shuffle-free candidate generation: MinHashBandKeys computes all
        // 128 minima + 32 band keys in one codegen pass per document, so
        // the only shuffle in the query is the band equi-join itself
        MinHashFunctions.register(s)
        val banded = docs.select(col("doc_id"),
          explode(MinHashFunctions.bandKeys(
            TextOps.shingles(col("text"), 3), 128, 32)).as("band"))
        val cands = banded.as("x").join(banded.as("y"),
            col("x.band") === col("y.band") && col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
          .distinct()
        val sets = docs.select(col("doc_id"), TextOps.shingles(col("text"), 3).as("sh"))
        val a = sets.select(col("doc_id").as("a_id"), col("sh").as("a_sh"))
        val b = sets.select(col("doc_id").as("b_id"), col("sh").as("b_sh"))
        cands.join(a, "a_id").join(b, "b_id")
          .withColumn("j", TextOps.jaccard(col("a_sh"), col("b_sh")))
          .filter(col("j") >= 0.5)
          .select(col("a_id"), col("b_id"), round(col("j"), 4).as("jac"))
          .orderBy("a_id", "b_id")
      }),

    QueryDef("q30_simhash",
      "SimHash document signatures (16-bit, md5-derived word hashes so the " +
        "SQL oracle reproduces every bit).",
      Some("""WITH w AS (SELECT doc_id,
             |    unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
             |  FROM documents),
             |wc AS (SELECT doc_id, word, count(*) AS cnt FROM w GROUP BY doc_id, word),
             |h AS (SELECT doc_id, cnt,
             |    CAST(concat('0x', substr(md5(word), 1, 15)) AS BIGINT) AS hv
             |  FROM wc),
             |bits AS (SELECT doc_id, t.b,
             |    sum(CASE WHEN (hv >> CAST(t.b AS INTEGER)) & 1 = 1
             |             THEN cnt ELSE -cnt END) AS sgn
             |  FROM h, range(16) t(b) GROUP BY doc_id, t.b)
             |SELECT doc_id,
             |  CAST(sum(CASE WHEN sgn >= 0
             |       THEN CAST(1 AS BIGINT) << CAST(b AS INTEGER) ELSE 0 END) AS BIGINT) AS simhash
             |FROM bits GROUP BY doc_id ORDER BY doc_id""".stripMargin),
      (s, dir) => TextOps.simhash(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),

    QueryDef("q31_simhash_neardup",
      "SimHash near-dup pairs: hamming distance <= 2 over the 16-bit " +
        "signature. Spark prunes candidates by 4-bit bands (pigeonhole: " +
        "hamming<=2 over 4 bands guarantees a shared band, so recall is " +
        "exactly 1); the oracle compares all pairs.",
      Some("""WITH w AS (SELECT doc_id,
             |    unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
             |  FROM documents),
             |wc AS (SELECT doc_id, word, count(*) AS cnt FROM w GROUP BY doc_id, word),
             |h AS (SELECT doc_id, cnt,
             |    CAST(concat('0x', substr(md5(word), 1, 15)) AS BIGINT) AS hv
             |  FROM wc),
             |bits AS (SELECT doc_id, t.b,
             |    sum(CASE WHEN (hv >> CAST(t.b AS INTEGER)) & 1 = 1
             |             THEN cnt ELSE -cnt END) AS sgn
             |  FROM h, range(16) t(b) GROUP BY doc_id, t.b),
             |sig AS (SELECT doc_id,
             |    CAST(sum(CASE WHEN sgn >= 0
             |         THEN CAST(1 AS BIGINT) << CAST(b AS INTEGER) ELSE 0 END) AS BIGINT) AS sh
             |  FROM bits GROUP BY doc_id)
             |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
             |  CAST(bit_count(xor(a.sh, b.sh)) AS INTEGER) AS dist
             |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
             |WHERE bit_count(xor(a.sh, b.sh)) <= 2
             |ORDER BY a_id, b_id""".stripMargin),
      (s, dir) => TextOps.simhashNearDupPairs(
          t(s, dir, "documents"), "doc_id", "text", maxDist = 2)
        .orderBy("a_id", "b_id")),

    QueryDef("q59_dup_clusters",
      "Duplicate CLUSTERS from near-dup pairs: distributed connected " +
        "components (min-label propagation + pointer jumping, O(log D) " +
        "rounds, every shuffle equi-keyed on a node id) over the q31 " +
        "SimHash pair graph; every doc gets its component's min id as " +
        "cluster plus the cluster size. Pairwise kill rules over-delete " +
        "on chains (a~b~c) — clusters are what dedup actually needs. " +
        "Oracle: recursive-CTE transitive closure.",
      Some("""WITH RECURSIVE w AS (SELECT doc_id,
             |    unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
             |  FROM documents),
             |wc AS (SELECT doc_id, word, count(*) AS cnt FROM w GROUP BY doc_id, word),
             |h AS (SELECT doc_id, cnt,
             |    CAST(concat('0x', substr(md5(word), 1, 15)) AS BIGINT) AS hv
             |  FROM wc),
             |bits AS (SELECT doc_id, t.b,
             |    sum(CASE WHEN (hv >> CAST(t.b AS INTEGER)) & 1 = 1
             |             THEN cnt ELSE -cnt END) AS sgn
             |  FROM h, range(16) t(b) GROUP BY doc_id, t.b),
             |sig AS (SELECT doc_id,
             |    CAST(sum(CASE WHEN sgn >= 0
             |         THEN CAST(1 AS BIGINT) << CAST(b AS INTEGER) ELSE 0 END) AS BIGINT) AS sh
             |  FROM bits GROUP BY doc_id),
             |e AS (SELECT a.doc_id AS s, b.doc_id AS d
             |  FROM sig a JOIN sig b
             |  ON a.doc_id <> b.doc_id AND bit_count(xor(a.sh, b.sh)) <= 2),
             |reach(s, d) AS (
             |  SELECT s, d FROM e
             |  UNION
             |  SELECT r.s, e2.d FROM reach r JOIN e e2 ON r.d = e2.s),
             |comp AS (SELECT s AS doc_id, least(s, min(d)) AS cluster
             |  FROM reach GROUP BY s)
             |SELECT d.doc_id, COALESCE(c.cluster, d.doc_id) AS cluster,
             |  CAST(count(*) OVER (PARTITION BY COALESCE(c.cluster, d.doc_id))
             |    AS BIGINT) AS csize
             |FROM documents d LEFT JOIN comp c USING (doc_id)
             |ORDER BY doc_id""".stripMargin),
      (s, dir) => {
        // producer: always recomputes CC, then materializes the cluster
        // table for every later consumer (q63) in this session
        val labeled = GraphOps.materializeClusters(
          dupClusterLabels(s, dir), tempStore.sink(s, "clusters", dir),
          "dup_clusters", Seq("doc_id"))
        labeled
          .withColumn("csize",
            count(lit(1)).over(Window.partitionBy("cluster")))
          .orderBy("doc_id")
      }),

    QueryDef("q63_cluster_best_keep",
      "Quality-aware dedup apply: each q59 duplicate cluster keeps its " +
        "HIGHEST-quality member (ties -> lowest id) — the min-id kill " +
        "rule can keep a worse copy of the same content. One row per " +
        "cluster: keeper id, its quality, cluster size. The per-cluster " +
        "argmax is a map-side-combinable max over (score, -id) structs, " +
        "never a window over the corpus.",
      Some(s"""WITH RECURSIVE w AS (SELECT doc_id,
             |    unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
             |  FROM documents),
             |wc AS (SELECT doc_id, word, count(*) AS cnt FROM w GROUP BY doc_id, word),
             |h AS (SELECT doc_id, cnt,
             |    CAST(concat('0x', substr(md5(word), 1, 15)) AS BIGINT) AS hv
             |  FROM wc),
             |bits AS (SELECT doc_id, t.b,
             |    sum(CASE WHEN (hv >> CAST(t.b AS INTEGER)) & 1 = 1
             |             THEN cnt ELSE -cnt END) AS sgn
             |  FROM h, range(16) t(b) GROUP BY doc_id, t.b),
             |sig AS (SELECT doc_id,
             |    CAST(sum(CASE WHEN sgn >= 0
             |         THEN CAST(1 AS BIGINT) << CAST(b AS INTEGER) ELSE 0 END) AS BIGINT) AS sh
             |  FROM bits GROUP BY doc_id),
             |e AS (SELECT a.doc_id AS s, b.doc_id AS d
             |  FROM sig a JOIN sig b
             |  ON a.doc_id <> b.doc_id AND bit_count(xor(a.sh, b.sh)) <= 2),
             |reach(s, d) AS (
             |  SELECT s, d FROM e
             |  UNION
             |  SELECT r.s, e2.d FROM reach r JOIN e e2 ON r.d = e2.s),
             |comp AS (SELECT s AS doc_id, least(s, min(d)) AS cluster
             |  FROM reach GROUP BY s),
             |lab AS (SELECT d.doc_id, COALESCE(c.cluster, d.doc_id) AS cluster,
             |    $sqlQualityMil AS score
             |  FROM documents d LEFT JOIN comp c USING (doc_id)),
             |ranked AS (SELECT *, row_number() OVER (PARTITION BY cluster
             |    ORDER BY score DESC, doc_id) AS rn FROM lab),
             |agg AS (SELECT cluster, count(*) AS csize FROM lab GROUP BY cluster)
             |SELECT a.cluster, r.doc_id AS keeper,
             |  CAST(r.score AS BIGINT) AS best_score,
             |  CAST(a.csize AS BIGINT) AS csize
             |FROM agg a JOIN ranked r ON a.cluster = r.cluster AND r.rn = 1
             |ORDER BY a.cluster""".stripMargin),
      (s, dir) => {
        // consumer: reads the cluster table q59 materialized (recompute
        // only when running standalone in a fresh session) — CC runs
        // once per pipeline, not once per consumer
        val clusters = GraphOps.readOrMaterialize(
          tempStore.sink(s, "clusters", dir), "dup_clusters", Seq("doc_id"))(
          dupClusterLabels(s, dir))
        val lab = t(s, dir, "documents")
          .select(col("doc_id"), TextOps.qualityScoreMil(col("text")).as("score"))
          .join(clusters, Seq("doc_id"))
        lab.groupBy("cluster")
          .agg(count(lit(1)).as("csize"),
            max(struct(col("score"), (-col("doc_id")).as("nid"))).as("__m"))
          .select(col("cluster"), (-col("__m.nid")).as("keeper"),
            col("__m.score").as("best_score"), col("csize"))
          .orderBy("cluster")
      }),

    QueryDef("q64_stream_admit",
      "Streaming near-dup ADMISSION, batch-replay form: documents arrive " +
        "in 4 ordered micro-batches (batch = doc_id % 4) and each batch " +
        "runs the EXACT foreachBatch core of DedupPipeline." +
        "nearDupDedupStream — MinHash-LSH band keys equi-join the batch " +
        "against the persisted band table of previously ADMITTED docs, " +
        "candidates verify with exact 3-gram Jaccard >= 0.5, smaller " +
        "doc_id survives within a batch; survivors merge into the corpus " +
        "and band tables (UpsertSink). Output: the admitted set. The " +
        "oracle replays the same 4 batches with exhaustive Jaccard — " +
        "parity also proves LSH candidate recall 1 on this corpus.",
      Some("""WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') w
             |  FROM documents),
             |sh AS (SELECT doc_id, CASE WHEN len(w) < 3
             |    THEN [array_to_string(w, ' ')]
             |    ELSE list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
             |                        for i in range(1, len(w) - 1)]) END AS s
             |  FROM toks),
             |d AS (SELECT doc_id, doc_id % 4 AS b, s FROM sh),
             |pair AS (SELECT a.doc_id AS a_id, x.doc_id AS b_id, x.b AS bb
             |  FROM d a JOIN d x ON a.doc_id <> x.doc_id
             |  WHERE CAST(len(list_intersect(a.s, x.s)) AS DOUBLE)
             |        / len(list_distinct(list_concat(a.s, x.s))) >= 0.5),
             |a0 AS (SELECT doc_id FROM d WHERE b = 0 AND NOT EXISTS (
             |    SELECT 1 FROM pair p WHERE p.a_id = d.doc_id
             |      AND p.bb = 0 AND p.b_id < d.doc_id)),
             |a1 AS (SELECT doc_id FROM d WHERE b = 1
             |  AND NOT EXISTS (SELECT 1 FROM pair p WHERE p.a_id = d.doc_id
             |    AND p.bb = 1 AND p.b_id < d.doc_id)
             |  AND NOT EXISTS (SELECT 1 FROM pair p JOIN a0 ON p.b_id = a0.doc_id
             |    WHERE p.a_id = d.doc_id)),
             |adm01 AS (SELECT doc_id FROM a0 UNION ALL SELECT doc_id FROM a1),
             |a2 AS (SELECT doc_id FROM d WHERE b = 2
             |  AND NOT EXISTS (SELECT 1 FROM pair p WHERE p.a_id = d.doc_id
             |    AND p.bb = 2 AND p.b_id < d.doc_id)
             |  AND NOT EXISTS (SELECT 1 FROM pair p JOIN adm01 ON p.b_id = adm01.doc_id
             |    WHERE p.a_id = d.doc_id)),
             |adm012 AS (SELECT doc_id FROM adm01 UNION ALL SELECT doc_id FROM a2),
             |a3 AS (SELECT doc_id FROM d WHERE b = 3
             |  AND NOT EXISTS (SELECT 1 FROM pair p WHERE p.a_id = d.doc_id
             |    AND p.bb = 3 AND p.b_id < d.doc_id)
             |  AND NOT EXISTS (SELECT 1 FROM pair p JOIN adm012 ON p.b_id = adm012.doc_id
             |    WHERE p.a_id = d.doc_id))
             |SELECT doc_id, doc_id % 4 AS batch FROM (
             |  SELECT doc_id FROM adm012 UNION ALL SELECT doc_id FROM a3)
             |ORDER BY doc_id""".stripMargin),
      (s, dir) => {
        val docs = t(s, dir, "documents")
        // fresh (emptied) store per invocation: the replay always starts
        // from an empty corpus, exactly like a new stream with a new
        // checkpoint — but reuses one disk root, deleted on JVM exit
        val sink = tempStore.freshSink(s, "admit", dir)
        (0 until 4).foreach { b =>
          graft.streaming.DedupPipeline.admitNearDups(sink, "corpus",
            "bands", docs.filter(col("doc_id") % 4 === b))
        }
        sink.read("corpus")
          .select(col("doc_id"), (col("doc_id") % 4).as("batch"))
          .orderBy("doc_id")
      }),

    QueryDef("q66_segment_dedup",
      "Segment-level exact dedup (the C4/RefinedWeb move): 25-word " +
        "segments, drop every segment whose exact content occurred " +
        "earlier in the corpus (global (doc_id, seg_idx) order), rebuild " +
        "documents from survivors. Catches boilerplate repeated ACROSS " +
        "distinct documents that doc-level dedup (q28) cannot see. ONE " +
        "tokenize+explode+md5 pass: the keeper is a row_number window " +
        "partitioned by the segment hash (group size = a segment's " +
        "duplication count), and n_segs/n_kept/rebuilt text all derive " +
        "from the same exploded rows.",
      Some("""WITH toks AS (SELECT doc_id,
             |    regexp_extract_all(lower(text), '[a-z]+') w FROM documents),
             |segl AS (SELECT doc_id,
             |    [{'i': i, 's': array_to_string(w[(i*25+1):(i*25+25)], ' ')}
             |     for i in range(0, CAST(ceil(len(w)/25.0) AS INTEGER))] AS ss
             |  FROM toks),
             |seg AS (SELECT doc_id, u.i AS seg_idx, u.s AS s
             |  FROM (SELECT doc_id, unnest(ss) AS u FROM segl)),
             |keep AS (SELECT doc_id, seg_idx, s,
             |    row_number() OVER (PARTITION BY md5(s)
             |      ORDER BY doc_id, seg_idx) AS rn
             |  FROM seg),
             |k AS (SELECT doc_id, CAST(count(*) AS INTEGER) AS n_kept,
             |    string_agg(s, ' ' ORDER BY seg_idx) AS text_kept
             |  FROM keep WHERE rn = 1 GROUP BY doc_id),
             |n AS (SELECT doc_id,
             |    CAST(COALESCE(ceil(len(w)/25.0), 0) AS INTEGER) AS n_segs
             |  FROM toks)
             |SELECT n.doc_id, n.n_segs,
             |  COALESCE(k.n_kept, 0) AS n_kept,
             |  COALESCE(k.text_kept, '') AS text_kept
             |FROM n LEFT JOIN k USING (doc_id) ORDER BY doc_id""".stripMargin),
      (s, dir) => TextOps.segmentDedup(t(s, dir, "documents"),
          "doc_id", "text", segWords = 25)
        .orderBy("doc_id"))
  )

  // ---------------------------------------------------------------------
  // Training-data pipeline: similarity search + multimodal (SimOps)
  // ---------------------------------------------------------------------

  /** DuckDB fragment: exact double-precision dot product of two float
    * lists in index order — mirrors SimOps.dot.
    */
  private def sqlDot(a: String, b: String): String =
    s"list_sum(list_transform(range(1, len($a) + 1), " +
      s"i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"

  /** NaN-guarded like [[graft.ops.SimOps.safeCos]]: both engines order
    * NaN above every number, so a zero-norm vector's 0/0 would pass
    * every threshold and win every ranking identically on both sides —
    * consistently wrong. The guard keeps them consistently RIGHT.
    */
  private def sqlCosine(a: String, b: String): String = {
    val raw = s"${sqlDot(a, b)} / (sqrt(${sqlDot(a, a)}) * sqrt(${sqlDot(b, b)}))"
    s"CASE WHEN isnan($raw) THEN 0.0 ELSE $raw END"
  }

  val similarity: Seq[QueryDef] = Seq(

    QueryDef("q32_cosine_topk",
      "Similarity search baseline: exact cosine top-5 per query vector " +
        "(query side broadcast; corpus never shuffles).",
      Some(s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
             |q AS (SELECT vec_id AS query_id, embedding AS qv FROM e
             |      WHERE vec_id % 100 = 0),
             |p AS (SELECT q.query_id, e.vec_id AS neighbor_id,
             |    ${sqlCosine("q.qv", "e.embedding")} AS c
             |  FROM q JOIN e ON e.vec_id <> q.query_id),
             |r AS (SELECT query_id, neighbor_id, c,
             |    row_number() OVER (PARTITION BY query_id
             |                       ORDER BY c DESC, neighbor_id) AS rank
             |  FROM p)
             |SELECT query_id, neighbor_id, round(c, 6) AS cosine, rank
             |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin),
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        SimOps.bruteForceTopK(
          e.filter(col("vec_id") % 100 === 0), e, "vec_id", "embedding", 5)
          .orderBy("query_id", "rank")
      }),

    QueryDef("q33_embed_neardup",
      "Embedding-cosine near-dup pairs (threshold 0.45), exhaustive " +
        "all-pairs formulation — kept ONLY as the oracle baseline; the " +
        "default operator a user reaches for is q41 (SimOps.lshNearDupPairs, " +
        "bucketed candidate gen + exact verify).",
      Some(s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
             |p AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id,
             |    ${sqlCosine("a.embedding", "b.embedding")} AS c
             |  FROM e a JOIN e b ON a.vec_id < b.vec_id)
             |SELECT a_id, b_id, round(c, 6) AS cosine FROM p
             |WHERE round(c, 6) >= 0.45 ORDER BY a_id, b_id""".stripMargin),
      (s, dir) => SimOps.cosineNearDupPairs(
          t(s, dir, "embeddings"), "vec_id", "embedding", 0.45)
        .orderBy("a_id", "b_id")),

    QueryDef("q34_ann_lsh",
      "ANN scale path: random-hyperplane LSH bucketing + exact re-rank. " +
        "Approximate by design -> no SQL oracle (driver rows-only check); " +
        "recall is a FIRST-CLASS audit column (recall_mil per query vs " +
        "the in-query exact baseline over the bounded probe set — the " +
        "q105 audit pattern), bounds pinned in CatalogSpec/SimOpsSpec.",
      None,
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val q = e.filter(col("vec_id") % 100 === 0)
        // short signatures / many tables: this corpus's neighbors are
        // weakly similar (cos ~0.45) — see SimOpsSpec recall analysis
        SimOps.withRecallAudit(
            SimOps.lshTopK(q, e, "vec_id", "embedding", 5,
              planes = 4, tables = 16),
            SimOps.bruteForceTopK(q, e, "vec_id", "embedding", 5), 5)
          .orderBy("query_id", "rank")
      }),

    QueryDef("q35_multimodal_meta",
      "Multimodal plumbing: opaque binary payload column + typed metadata " +
        "extraction (the decode itself is the deterministic stub in " +
        "MultimodalOps; here the SQL-expressible byte-level metadata).",
      Some("""SELECT doc_id, octet_length(CAST(text AS BLOB)) AS bytes,
             |  octet_length(CAST(text AS BLOB)) % 640 AS fake_width,
             |  (octet_length(CAST(text AS BLOB)) * 31) % 480 AS fake_height
             |FROM documents ORDER BY doc_id""".stripMargin),
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("blob"))
        .select(col("doc_id"), length(col("blob")).as("bytes"),
          (length(col("blob")) % 640).as("fake_width"),
          (length(col("blob")) * 31 % 480).as("fake_height"))
        .orderBy("doc_id"))
  )

  // ---------------------------------------------------------------------
  // Serving-side analytics beyond the reference's own surface
  // ---------------------------------------------------------------------

  val analytics: Seq[QueryDef] = Seq(

    QueryDef("q36_quantiles",
      "Exact percentiles per group (linear interpolation — identical " +
        "definition in Spark `percentile` and DuckDB `quantile_cont`).",
      Some("""SELECT event_type,
             |  round(quantile_cont(CAST(value AS DOUBLE), 0.5), 6) AS p50,
             |  round(quantile_cont(CAST(value AS DOUBLE), 0.9), 6) AS p90,
             |  count(*) AS n
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),
      (s, dir) => t(s, dir, "events")
        .groupBy("event_type")
        .agg(
          round(expr("percentile(CAST(value AS DOUBLE), 0.5)"), 6).as("p50"),
          round(expr("percentile(CAST(value AS DOUBLE), 0.9)"), 6).as("p90"),
          count(lit(1)).as("n"))
        .orderBy("event_type")),

    QueryDef("q37_sessionize",
      "Gap-based sessionization (30-min inactivity) via window functions — " +
        "integer epoch arithmetic so both engines agree exactly.",
      Some("""WITH e AS (SELECT user_id, event_id, ts,
             |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
             |  FROM events),
             |f AS (SELECT user_id, event_id, ts,
             |    CASE WHEN prev_ts IS NULL
             |           OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
             |         THEN 1 ELSE 0 END AS is_new
             |  FROM e),
             |s AS (SELECT user_id, event_id,
             |    CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |                           ROWS UNBOUNDED PRECEDING) AS BIGINT)
             |      AS session_no
             |  FROM f)
             |SELECT user_id, session_no, count(*) AS n_events
             |FROM s GROUP BY user_id, session_no
             |ORDER BY user_id, session_no""".stripMargin),
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        t(s, dir, "events")
          .withColumn("prev_us", lag(RelOps.epochUs(col("ts")), 1).over(w))
          .withColumn("is_new",
            when(col("prev_us").isNull
              || RelOps.epochUs(col("ts")) - col("prev_us") > 1800000000L, 1L)
              .otherwise(0L))
          .withColumn("session_no",
            sum(col("is_new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
          .groupBy("user_id", "session_no")
          .agg(count(lit(1)).as("n_events"))
          .orderBy("user_id", "session_no")
      }),

    QueryDef("q38_ngram_topk",
      "Corpus n-gram statistics: top-20 trigram shingles by document " +
        "frequency (explode -> count -> top-k).",
      Some("""WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS w
             |  FROM documents),
             |g AS (SELECT doc_id,
             |    unnest(list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
             |                          for i in range(1, len(w) - 1)])) AS s
             |  FROM t WHERE len(w) >= 3)
             |SELECT s AS shingle, count(*) AS df FROM g
             |GROUP BY s ORDER BY df DESC, shingle LIMIT 20""".stripMargin),
      (s, dir) => t(s, dir, "documents")
        .filter(size(TextOps.tokens(col("text"))) >= 3)
        .select(explode(TextOps.shingles(col("text"), 3)).as("shingle"))
        .groupBy("shingle").agg(count(lit(1)).as("df"))
        .orderBy(col("df").desc, col("shingle")).limit(20)),

    QueryDef("q39_dedup_apply",
      "End-to-end dedup application: drop every document that near-" +
        "duplicates (3-gram jaccard >= 0.5) a lower-id keeper — the " +
        "cleaned-corpus anti-join a training pipeline actually ships.",
      Some("""WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS w
             |  FROM documents),
             |sh AS (SELECT doc_id, CASE WHEN len(w) < 3
             |    THEN [array_to_string(w, ' ')]
             |    ELSE list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
             |                        for i in range(1, len(w) - 1)]) END AS s
             |  FROM toks),
             |dupes AS (SELECT DISTINCT b.doc_id AS dup_id
             |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
             |  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
             |      / len(list_distinct(list_concat(a.s, b.s))) >= 0.5)
             |SELECT d.doc_id, d.lang, d.n_chars FROM documents d
             |WHERE NOT EXISTS (SELECT 1 FROM dupes WHERE dup_id = d.doc_id)
             |ORDER BY d.doc_id""".stripMargin),
      (s, dir) => {
        val pairs = byName("q29_dedup_minhash").fn(s, dir) // LSH + exact verify
        val dupIds = pairs.select(col("b_id").as("doc_id")).distinct()
        RelOps.antiJoin(t(s, dir, "documents"), dupIds, Seq("doc_id"))
          .select("doc_id", "lang", "n_chars")
          .orderBy("doc_id")
      }),

    QueryDef("q40_quality_gate",
      "Quality gating: per-language doc counts surviving the quality " +
        "threshold with agreeing language-ID — the composed text-pipeline " +
        "filter stage.",
      Some {
        val (hitExprs, maxExpr, nWin, firstWin) = sqlLangPieces
        s"""WITH h AS (SELECT doc_id, lang, length(text) AS chars, $hitExprs
           |  FROM documents),
           |m AS (SELECT *, $maxExpr AS mx FROM h),
           |g AS (SELECT doc_id, lang, chars, CASE WHEN mx = 0 OR ($nWin) > 1
           |    THEN 'und' ELSE ($firstWin) END AS guess
           |  FROM m)
           |SELECT lang, count(*) AS n_docs,
           |  CAST(sum(chars) AS BIGINT) AS total_chars
           |FROM g WHERE chars >= 150 AND guess = 'en'
           |GROUP BY lang ORDER BY lang""".stripMargin
      },
      (s, dir) => t(s, dir, "documents")
        .withColumn("chars", length(col("text")))
        .withColumn("guess", TextOps.langId(col("text")))
        .filter(col("chars") >= 150 && col("guess") === "en")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("chars")).cast("long").as("total_chars"))
        .orderBy("lang")),

    QueryDef("q41_embed_neardup_lsh",
      "DEFAULT embedding near-dup op: LSH candidate generation (equi-join " +
        "on (table, signature) buckets — no all-pairs join anywhere) + " +
        "exact cosine verify. Oracle: the same exhaustive SQL as q33 — " +
        "candidate recall is 1.0 on this data (params tuned for the weak " +
        "0.45-cosine regime), so results match the all-pairs baseline " +
        "bit-for-bit.",
      Some(s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
             |p AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id,
             |    ${sqlCosine("a.embedding", "b.embedding")} AS c
             |  FROM e a JOIN e b ON a.vec_id < b.vec_id)
             |SELECT a_id, b_id, round(c, 6) AS cosine FROM p
             |WHERE round(c, 6) >= 0.45 ORDER BY a_id, b_id""".stripMargin),
      (s, dir) => SimOps.lshNearDupPairs(
          t(s, dir, "embeddings"), "vec_id", "embedding", 0.45)
        .orderBy("a_id", "b_id")),

    QueryDef("q42_ann_ivf",
      "ANN scale path #2: IVF-FLAT — deterministic sampled coarse " +
        "quantizer, inverted-list assignment, nprobe-list exact re-rank. " +
        "Approximate by design -> no SQL oracle (driver rows-only check); " +
        "recall vs the exact baseline is asserted in SimOpsSpec.",
      None,
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val q = e.filter(col("vec_id") % 100 === 0)
        SimOps.withRecallAudit(
            SimOps.ivfTopK(q, e, "vec_id", "embedding", 5,
              nlist = 16, nprobe = 6),
            SimOps.bruteForceTopK(q, e, "vec_id", "embedding", 5), 5)
          .orderBy("query_id", "rank")
      }),

    QueryDef("q43_winnow_fp",
      "Rolling-hash document fingerprints (MOSS winnowing): Rabin-Karp " +
        "8-gram hashes over the canonical char stream, min of each " +
        "4-window, distinct. The mod-prime fold is reproduced exactly by " +
        "the SQL oracle; summarized to scalars per doc.",
      Some(s"""$winnowFpsCte
             |SELECT doc_id, len(fps) AS n_fp, fps[1] AS fp_first,
             |  fps[len(fps)] AS fp_last, CAST(list_sum(fps) AS BIGINT) AS fp_sum
             |FROM f ORDER BY doc_id""".stripMargin),
      (s, dir) => {
        WinnowFunctions.register(s)
        t(s, dir, "documents")
          .select(col("doc_id"), WinnowFunctions.fingerprints(
            TextOps.canonText(col("text")), 8, 4).as("fps"))
          .select(col("doc_id"), size(col("fps")).as("n_fp"),
            element_at(col("fps"), 1).as("fp_first"),
            element_at(col("fps"), -1).as("fp_last"),
            aggregate(col("fps"), lit(0L), (acc, x) => acc + x).as("fp_sum"))
          .orderBy("doc_id")
      }),

    QueryDef("q44_winnow_neardup",
      "Winnowing near-dup pairs: prefix-filtered candidates (each doc's " +
        "rarest |s|-ceil(t|s|)+1 prints probe the full posting lists — " +
        "recall exactly 1 by the prefix theorem, hot keys bounded because " +
        "hot prints enter few prefixes) + exact overlap verify on the " +
        "full sets. Oracle compares ALL pairs exhaustively.",
      Some(s"""$winnowFpsCte
             |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
             |  round(CAST(len(list_intersect(a.fps, b.fps)) AS DOUBLE)
             |    / least(len(a.fps), len(b.fps)), 4) AS overlap
             |FROM f a JOIN f b ON a.doc_id < b.doc_id
             |WHERE CAST(len(list_intersect(a.fps, b.fps)) AS DOUBLE)
             |    / least(len(a.fps), len(b.fps)) >= 0.6
             |ORDER BY a_id, b_id""".stripMargin),
      (s, dir) => TextOps.winnowNearDupPairs(t(s, dir, "documents"),
          "doc_id", "text", k = 8, window = 4, threshold = 0.6)
        .orderBy("a_id", "b_id")),

    QueryDef("q45_frame_sample",
      "Multimodal frame sampling: each binary payload fans out to one row " +
        "per sampled frame through the per-partition codec boundary " +
        "(streaming flatMap — no per-doc frame list on the heap). The " +
        "oracle replicates the stub codec's deterministic arithmetic " +
        "(duration = bytes % 3600 ms, frame = first <=256 bytes) to check " +
        "the fan-out row counts and byte totals end-to-end.",
      Some("""WITH m AS (SELECT doc_id,
             |    octet_length(CAST(text AS BLOB)) AS n FROM documents)
             |SELECT doc_id, CAST((n % 3600) // 500 + 1 AS BIGINT) AS n_frames,
             |  CAST(((n % 3600) // 500 + 1) * least(n, 256) AS BIGINT) AS frame_bytes
             |FROM m ORDER BY doc_id""".stripMargin),
      (s, dir) => {
        val withP = MultimodalOps.withPayload(t(s, dir, "documents"), "text")
        MultimodalOps.sampleFrames(withP, "doc_id", MultimodalOps.FakeCodec,
            everyMs = 500)
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_frames"),
            sum(length(col("frame"))).as("frame_bytes"))
          .orderBy("doc_id")
      }),

    QueryDef("q46_ann_ivf_trained",
      "ANN scale path #3: IVF-FLAT with a TRAINED coarse quantizer — two " +
        "Lloyd rounds over the corpus with decimal-exact (and therefore " +
        "partitioning-independent) centroid sums. Approximate by design " +
        "-> no SQL oracle (driver rows-only check); determinism and " +
        "recall vs the exact baseline are asserted in SimOpsSpec.",
      None,
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val q = e.filter(col("vec_id") % 100 === 0)
        SimOps.withRecallAudit(
            SimOps.ivfTopKTrained(q, e, "vec_id", "embedding", 5,
              nlist = 16, nprobe = 6, iters = 2),
            SimOps.bruteForceTopK(q, e, "vec_id", "embedding", 5), 5)
          .orderBy("query_id", "rank")
      }),

    QueryDef("q47_jaccard_neardup",
      "Exact n-gram-Jaccard near-dup pairs via AllPairs prefix filtering: " +
        "global rarest-first gram order, per-doc prefix of " +
        "|s|-ceil(t|s|)+1 grams, candidate equi-join on prefix grams, " +
        "exact verify. Recall is exactly 1 by the prefix-filter theorem — " +
        "no signatures — so the exhaustive oracle must match bit-for-bit.",
      Some("""WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') w
             |  FROM documents),
             |sh AS (SELECT doc_id, CASE WHEN len(w) < 3
             |    THEN [array_to_string(w, ' ')]
             |    ELSE list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
             |                        for i in range(1, len(w) - 1)]) END AS s
             |  FROM toks),
             |p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
             |    CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
             |      / len(list_distinct(list_concat(a.s, b.s))) AS j
             |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
             |SELECT a_id, b_id, round(j, 4) AS jac FROM p
             |WHERE j >= 0.5 ORDER BY a_id, b_id""".stripMargin),
      (s, dir) => TextOps.jaccardNearDupPairs(t(s, dir, "documents"),
          "doc_id", "text", n = 3, threshold = 0.5)
        .orderBy("a_id", "b_id")),

    QueryDef("q48_hash_split",
      "Deterministic train/val/test split (80/10/10) by portable md5 " +
        "bucket of the id — reproducible across runs, engines, and " +
        "corpus versions; a pure narrow projection, zero shuffles.",
      Some("""WITH b AS (SELECT doc_id,
             |    CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
             |      AS BIGINT) % 100 AS bucket
             |  FROM documents)
             |SELECT doc_id, bucket,
             |  CASE WHEN bucket < 80 THEN 'train'
             |       WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split
             |FROM b ORDER BY doc_id""".stripMargin),
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"),
          SampleOps.bucket(col("doc_id"), 100).as("bucket"),
          SampleOps.splitLabel(col("doc_id"),
            Seq("train" -> 80, "val" -> 10, "test" -> 10)).as("split"))
        .orderBy("doc_id")),

    QueryDef("q49_decontaminate",
      "Benchmark decontamination (GPT-3-style n-gram overlap): docs whose " +
        "id % 17 == 0 act as the held-out eval set; every other doc " +
        "reports how many distinct 5-gram hashes it shares with ANY eval " +
        "doc. Grams travel as 8-byte md5 hashes; the distinct benchmark " +
        "side stays broadcast-small, so the corpus is never shuffled.",
      Some("""WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') w
             |  FROM documents),
             |sh AS (SELECT doc_id, CASE WHEN len(w) < 5
             |    THEN [array_to_string(w, ' ')]
             |    ELSE list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
             |                        || ' ' || w[i+3] || ' ' || w[i+4]
             |                        for i in range(1, len(w) - 3)]) END AS s
             |  FROM toks),
             |h AS (SELECT doc_id,
             |    CAST(concat('0x', substr(md5(g), 1, 15)) AS BIGINT) AS gh
             |  FROM (SELECT doc_id, unnest(s) AS g FROM sh)),
             |bench AS (SELECT DISTINCT gh FROM h WHERE doc_id % 17 = 0)
             |SELECT doc_id, count(DISTINCT gh) AS hits
             |FROM h JOIN bench USING (gh) WHERE doc_id % 17 <> 0
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin),
      (s, dir) => {
        val docs = t(s, dir, "documents")
        TextOps.contaminationHits(
            docs.filter(col("doc_id") % 17 =!= 0),
            docs.filter(col("doc_id") % 17 === 0),
            "doc_id", "text", n = 5)
          .orderBy("doc_id")
      }),

    QueryDef("q60_bloom_decontaminate",
      "q49's decontamination with the scale-path build side: the " +
        "benchmark gram set is compressed into a FIXED-SIZE Bloom filter " +
        "(Spark's own BloomFilterAggregate / BloomFilterMightContain, " +
        "registered as callable functions), probed map-side in codegen; " +
        "only might-contain survivors reach the exact verify join, so " +
        "the result is bit-identical while the build side stays O(bits) " +
        "however many grams the eval suite has. Oracle: q49's exact SQL.",
      Some("""WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') w
             |  FROM documents),
             |sh AS (SELECT doc_id, CASE WHEN len(w) < 5
             |    THEN [array_to_string(w, ' ')]
             |    ELSE list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
             |                        || ' ' || w[i+3] || ' ' || w[i+4]
             |                        for i in range(1, len(w) - 3)]) END AS s
             |  FROM toks),
             |h AS (SELECT doc_id,
             |    CAST(concat('0x', substr(md5(g), 1, 15)) AS BIGINT) AS gh
             |  FROM (SELECT doc_id, unnest(s) AS g FROM sh)),
             |bench AS (SELECT DISTINCT gh FROM h WHERE doc_id % 17 = 0)
             |SELECT doc_id, count(DISTINCT gh) AS hits
             |FROM h JOIN bench USING (gh) WHERE doc_id % 17 <> 0
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin),
      (s, dir) => {
        val docs = t(s, dir, "documents")
        TextOps.bloomContaminationHits(
            docs.filter(col("doc_id") % 17 =!= 0),
            docs.filter(col("doc_id") % 17 === 0),
            "doc_id", "text", n = 5)
          .orderBy("doc_id")
      }),

    QueryDef("q50_stratified_sample",
      "Deterministic per-language stratified sampling: keep a doc iff its " +
        "per-mille md5 bucket is under its language's rate (en down to " +
        "100 per mille, the rest at 400) — the row-local, shuffle-free, " +
        "reproducible counterpart of sampleBy for corpus rebalancing.",
      Some("""WITH b AS (SELECT doc_id, lang,
             |    CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
             |      AS BIGINT) % 1000 AS bk
             |  FROM documents)
             |SELECT doc_id, lang FROM b
             |WHERE bk < CASE lang WHEN 'en' THEN 100 WHEN 'de' THEN 400
             |  WHEN 'es' THEN 400 WHEN 'fr' THEN 400 WHEN 'zh' THEN 400
             |  ELSE 0 END
             |ORDER BY doc_id""".stripMargin),
      (s, dir) => SampleOps.stratifiedSample(t(s, dir, "documents"),
          "doc_id", "lang",
          Map("en" -> 100, "de" -> 400, "es" -> 400, "fr" -> 400, "zh" -> 400))
        .select("doc_id", "lang")
        .orderBy("doc_id")),

    QueryDef("q51_repetition",
      "Gopher-style repetition signals: duplicate-2-gram fraction (with " +
        "multiplicity) and most-frequent-2-gram fraction, per-mille " +
        "integer arithmetic. Relational shape: explode -> (doc,gram) " +
        "count -> per-doc rollup; shuffle key is (doc,gram).",
      Some("""WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') w
             |  FROM documents),
             |g AS (SELECT doc_id, unnest([w[i] || ' ' || w[i+1]
             |                             for i in range(1, len(w))]) AS gr
             |  FROM toks WHERE len(w) >= 2),
             |c AS (SELECT doc_id, gr, count(*) AS cnt FROM g GROUP BY doc_id, gr),
             |st AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS total,
             |    count(*) AS uniq, max(cnt) AS maxc
             |  FROM c GROUP BY doc_id)
             |SELECT t.doc_id,
             |  COALESCE(CAST(floor(1000 * (total - uniq) / total) AS BIGINT), 0) AS dup2_mil,
             |  COALESCE(CAST(floor(1000 * maxc / total) AS BIGINT), 0) AS top2_mil
             |FROM toks t LEFT JOIN st ON t.doc_id = st.doc_id
             |ORDER BY t.doc_id""".stripMargin),
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val toks = docs.select(col("doc_id"), TextOps.tokens(col("text")).as("w"))
        val grams = toks.filter(size(col("w")) >= 2)
          .select(col("doc_id"), explode(zip_with(col("w"),
            slice(col("w"), lit(2), size(col("w"))),
            (a, b) => concat(a, lit(" "), b))).as("gr"))
          .filter(col("gr").isNotNull)
        val st = grams.groupBy("doc_id", "gr").agg(count(lit(1)).as("cnt"))
          .groupBy("doc_id").agg(sum("cnt").as("total"),
            count(lit(1)).as("uniq"), max("cnt").as("maxc"))
        toks.select("doc_id").join(st, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(floor(lit(1000) * (col("total") - col("uniq")) / col("total"))
              .cast("long"), lit(0L)).as("dup2_mil"),
            coalesce(floor(lit(1000) * col("maxc") / col("total"))
              .cast("long"), lit(0L)).as("top2_mil"))
          .orderBy("doc_id")
      }),

    QueryDef("q52_curation_pipeline",
      "Flagship corpus-curation composition in ONE declarative plan: " +
        "exact-dup keepers only -> quality gate (>=500 mil) -> language " +
        "guess -> deterministic 80/10/10 split -> per-(lang,split) doc and " +
        "token rollup. Every stage is an operator the catalog verifies " +
        "individually; this proves they compose without driver-side glue.",
      Some {
        val (hitExprs, maxExpr, nWin, firstWin) = sqlLangPieces
        s"""WITH keep AS (SELECT min(doc_id) AS doc_id FROM documents
           |  GROUP BY md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'))),
           |d AS (SELECT doc_id, text FROM documents
           |  WHERE doc_id IN (SELECT doc_id FROM keep)
           |    AND $sqlQualityMil >= 500),
           |h AS (SELECT doc_id, text, $hitExprs FROM d),
           |m AS (SELECT *, $maxExpr AS mx FROM h),
           |g AS (SELECT doc_id,
           |    CASE WHEN mx = 0 OR ($nWin) > 1 THEN 'und' ELSE ($firstWin) END AS glang,
           |    len(regexp_extract_all(text, '\\S+')) AS ntok,
           |    CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
           |      AS BIGINT) % 100 AS bucket
           |  FROM m)
           |SELECT glang,
           |  CASE WHEN bucket < 80 THEN 'train'
           |       WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
           |  count(*) AS n_docs, CAST(sum(ntok) AS BIGINT) AS tok_sum
           |FROM g GROUP BY glang, split ORDER BY glang, split""".stripMargin
      },
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val keepers = docs
          .groupBy(TextOps.fingerprint(col("text")).as("fp"))
          .agg(min("doc_id").as("doc_id"))
          .select("doc_id")
        docs.join(keepers, "doc_id")
          .filter(TextOps.qualityScoreMil(col("text")) >= 500)
          .select(col("doc_id"),
            TextOps.langId(col("text")).as("glang"),
            TextOps.tokenCount(col("text")).as("ntok"),
            SampleOps.splitLabel(col("doc_id"),
              Seq("train" -> 80, "val" -> 10, "test" -> 10)).as("split"))
          .groupBy("glang", "split")
          .agg(count(lit(1)).as("n_docs"), sum("ntok").as("tok_sum"))
          .orderBy("glang", "split")
      }),

    QueryDef("q53_pack_sequences",
      "Sequence packing: deterministic hash order, global running token " +
        "sum, fixed 2048-token windows; per-bin doc/token rollup. The " +
        "Spark plan computes the prefix sum two-level (parallel cumsum " +
        "inside hash-range buckets + tiny per-bucket offsets) so no " +
        "single-partition window exists; the oracle is the naive global " +
        "window — results are identical by construction.",
      Some("""WITH d AS (SELECT doc_id, len(regexp_extract_all(text, '\S+')) AS ntok,
             |    CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
             |      AS BIGINT) AS h
             |  FROM documents),
             |c AS (SELECT doc_id, ntok,
             |    CAST(COALESCE(sum(ntok) OVER (ORDER BY h, doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS pre
             |  FROM d)
             |SELECT CAST(floor(pre / 2048) AS BIGINT) AS bin, count(*) AS n_docs,
             |  CAST(sum(ntok) AS BIGINT) AS tok_sum
             |FROM c GROUP BY bin ORDER BY bin""".stripMargin),
      (s, dir) => SampleOps.packBins(t(s, dir, "documents"), "doc_id",
          TextOps.tokenCount(col("text")), 2048)
        .groupBy("bin")
        .agg(count(lit(1)).as("n_docs"), sum("ntok").as("tok_sum"))
        .orderBy("bin")),

    QueryDef("q54_quantile_sketch",
      "Mergeable quantile sketch: percentile_approx (Greenwald-Khanna) — " +
        "single-pass, map-side-combinable, fixed memory per group; the " +
        "scale path next to q36's exact sort-based percentile. " +
        "Approximate by design -> no SQL oracle (driver rows-only " +
        "check); error vs the exact quantiles is bounded in SketchSpec. " +
        "Output is scalar doubles only: the driver harness hash-compares " +
        "pandas frames, which cannot sort array-typed cells.",
      None,
      (s, dir) => t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("p50_price"),
          percentile_approx(col("l_extendedprice"), lit(0.9), lit(10000)).as("p90_price"),
          percentile_approx(col("l_extendedprice"), lit(0.99), lit(10000)).as("p99_price"),
          percentile_approx(col("l_quantity"), lit(0.5), lit(10000)).as("med_qty"))
        .orderBy("l_returnflag")),

    QueryDef("q55_distinct_sketch",
      "Cardinality sketch: approx_count_distinct (HyperLogLog++) per " +
        "group — constant memory, one pass, no distinct shuffle; the " +
        "scale path for count-distinct rollups. Approximate by design -> " +
        "no SQL oracle (driver rows-only check); relative error vs exact " +
        "is bounded in SketchSpec.",
      None,
      (s, dir) => t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          approx_count_distinct(col("l_orderkey"), 0.02).as("nd_orders"),
          approx_count_distinct(col("l_partkey"), 0.02).as("nd_parts"))
        .orderBy("l_returnflag")),

    QueryDef("q61_cms_heavy_hitters",
      "Frequency sketch: count-min over 2-gram hashes (Spark's own " +
        "count_min_sketch aggregate — single-pass, mergeable, fixed " +
        "eps x delta memory per partition), decoded on the driver and " +
        "probed for the exact top-20. Completes the mergeable-sketch " +
        "family (q54 quantiles, q55 cardinality, q61 frequency). " +
        "Estimates are engine-hash-specific -> rows-only check; the " +
        "overestimate-only error bound is asserted in SketchSpec.",
      None,
      (s, dir) => TextOps.cmsHeavyHitters(t(s, dir, "documents"), "text", 20)),

    QueryDef("q62_keyword_search",
      "Corpus keyword search, integer-exact TF-IDF: tf = term " +
        "occurrences, idf_mil = (N*1e6) div df (integer division, no " +
        "ln() — bit-identical across engines), top-20 docs by score. " +
        "The term filter runs in the scan projection, df is a " +
        "terms-sized broadcast, top-k is TakeOrdered.",
      Some("""WITH tok AS (SELECT doc_id,
             |    unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
             |  FROM documents),
             |tf AS (SELECT doc_id, w, count(*) AS tf FROM tok
             |  WHERE w IN ('vector', 'merge', 'stream') GROUP BY doc_id, w),
             |dfr AS (SELECT w, count(*) AS df FROM tf GROUP BY w),
             |n AS (SELECT count(*) * 1000000 AS nmil FROM documents)
             |SELECT doc_id,
             |  CAST(sum(tf * (n.nmil // dfr.df)) AS BIGINT) AS score
             |FROM tf JOIN dfr USING (w) CROSS JOIN n
             |GROUP BY doc_id
             |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin),
      (s, dir) => TextOps.keywordSearch(t(s, dir, "documents"),
        "doc_id", "text", Seq("vector", "merge", "stream"), 20)),

    QueryDef("q56_embed_dedup_apply",
      "Embedding dedup APPLIED (the q39 pattern for vectors): the cleaned " +
        "embedding corpus after dropping every vector whose near-dup pair " +
        "has a lower id, with pairs from the DEFAULT LSH operator (q41) — " +
        "candidate gen stays bucketed, the kill set is an anti-join. " +
        "Oracle recomputes the pairs exhaustively.",
      Some(s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
             |p AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id,
             |    ${sqlCosine("a.embedding", "b.embedding")} AS c
             |  FROM e a JOIN e b ON a.vec_id < b.vec_id)
             |SELECT vec_id FROM embeddings
             |WHERE vec_id NOT IN (SELECT DISTINCT b_id FROM p WHERE round(c, 6) >= 0.45)
             |ORDER BY vec_id""".stripMargin),
      (s, dir) => {
        val dups = SimOps.lshNearDupPairs(
            t(s, dir, "embeddings"), "vec_id", "embedding", 0.45)
          .select(col("b_id").as("vec_id")).distinct()
        RelOps.antiJoin(t(s, dir, "embeddings").select("vec_id"), dups,
            Seq("vec_id"))
          .orderBy("vec_id")
      }),

    QueryDef("q57_mixture_sample",
      "Target-mixture sampling: derive each language's keep-rate from " +
        "corpus counts so a 200-doc budget lands at the configured " +
        "mixture (en 30% / de 25% / es 20% / fr 15% / zh 10%) however " +
        "skewed the input is. Stats pass = map-side-combinable count per " +
        "stratum (driver-scale result, broadcast back); keep decision = " +
        "row-local md5 bucket. No corpus shuffle anywhere.",
      Some("""WITH c AS (SELECT lang, count(*) AS cnt FROM documents GROUP BY lang),
             |r AS (SELECT lang, LEAST(1000, CAST(floor(200 * CASE lang
             |      WHEN 'en' THEN 300 WHEN 'de' THEN 250 WHEN 'es' THEN 200
             |      WHEN 'fr' THEN 150 WHEN 'zh' THEN 100 ELSE 0 END / cnt)
             |    AS BIGINT)) AS rate
             |  FROM c),
             |b AS (SELECT doc_id, lang,
             |    CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
             |      AS BIGINT) % 1000 AS bk
             |  FROM documents)
             |SELECT doc_id, lang FROM b JOIN r USING (lang) WHERE bk < rate
             |ORDER BY doc_id""".stripMargin),
      (s, dir) => SampleOps.mixtureSample(t(s, dir, "documents"),
          "doc_id", "lang",
          Map("en" -> 300, "de" -> 250, "es" -> 200, "fr" -> 150, "zh" -> 100),
          budgetDocs = 200L)
        .select("doc_id", "lang")
        .orderBy("doc_id")),

    QueryDef("q58_curriculum",
      "Curriculum ordering: every doc's 1-based position in the " +
        "(quality DESC, hash, id) training order — quality-first " +
        "curriculum with a deterministic shuffle inside each quality " +
        "class. The Spark plan avoids the single-partition global " +
        "row_number: ranks are computed per (score, hash-range bucket) " +
        "partition in parallel and shifted by driver-scale broadcast " +
        "offsets (the q53 two-level trick keyed on the bounded score " +
        "domain); the oracle IS the naive global window — identical " +
        "output by construction.",
      Some(s"""WITH q AS (SELECT doc_id, $sqlQualityMil AS score,
             |    CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
             |      AS BIGINT) AS h
             |  FROM documents)
             |SELECT doc_id, score,
             |  CAST(row_number() OVER (ORDER BY score DESC, h, doc_id) AS BIGINT) AS pos
             |FROM q ORDER BY doc_id""".stripMargin),
      (s, dir) => SampleOps.curriculumRank(t(s, dir, "documents"),
          "doc_id", TextOps.qualityScoreMil(col("text")))
        .select(col("doc_id"), col("score"), col("rank").as("pos"))
        .orderBy("doc_id")),

    QueryDef("q65_salted_skew_join",
      "Skew-salted fact-dim join: a zero-address-style whale key (a " +
        "third of all events collapse onto wallet 1) would put ~33% of " +
        "the fact table in ONE shuffle partition of a plain equi-join. " +
        "RelOps.saltedJoin splits the hot key across 16 salt buckets " +
        "(fact rows salt randomly, the dim replicates 16x) so no " +
        "partition holds more than ~1/16 of the whale. The dim side " +
        "pins SHUFFLE_HASH — at 100 TB a wallet dim outgrows broadcast, " +
        "and a broadcast join would make salting moot. Results equal " +
        "the plain join exactly (the oracle IS the plain join); the " +
        "salt never reaches the output.",
      Some("""WITH ev AS (SELECT CASE WHEN user_id % 3 = 0 THEN 1
             |    ELSE user_id END AS wallet, value
             |  FROM events),
             |j AS (SELECT c.c_mktsegment, ev.value
             |  FROM ev JOIN customer c ON ev.wallet = c.c_custkey)
             |SELECT c_mktsegment, count(*) AS n_events,
             |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
             |FROM j GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin),
      (s, dir) => {
        val ev = t(s, dir, "events")
          .select(when(col("user_id") % 3 === 0, lit(1L))
            .otherwise(col("user_id")).as("wallet"), col("value"))
        val dim = t(s, dir, "customer")
          .select(col("c_custkey").as("wallet"), col("c_mktsegment"))
          .hint("shuffle_hash")
        RelOps.saltedJoin(ev, dim, Seq("wallet"), buckets = 16)
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n_events"),
            sum(dec(col("value"))).cast("double").as("sum_value"))
          .orderBy("c_mktsegment")
      }),

    QueryDef("q67_chunk_tokens",
      "Sliding token-window chunking (sequence prep): size-32 chunks at " +
        "stride 16 (16 tokens of overlap preserves context across chunk " +
        "boundaries), chunk count = ceil(max(n-size,0)/stride)+1 — " +
        "chunks start at stride multiples until one reaches the document " +
        "end and none after, so every token is covered and no chunk is a " +
        "redundant suffix of its predecessor. Pure per-row fan-out — " +
        "tokens computed once per document and sliced per chunk, no " +
        "shuffle beyond the presentation orderBy.",
      Some("""WITH toks AS (SELECT doc_id,
             |    regexp_extract_all(lower(text), '[a-z]+') w FROM documents),
             |cl AS (SELECT doc_id,
             |    [{'i': i, 'c': w[(i*16+1):(i*16+32)]}
             |     for i in range(0, CASE WHEN len(w) > 0
             |       THEN CAST(ceil(greatest(len(w) - 32, 0) / 16.0) AS INTEGER) + 1
             |       ELSE 0 END)] AS cs
             |  FROM toks)
             |SELECT doc_id, u.i AS chunk_idx,
             |  CAST(len(u.c) AS INTEGER) AS ntok,
             |  array_to_string(u.c, ' ') AS chunk
             |FROM (SELECT doc_id, unnest(cs) AS u FROM cl)
             |ORDER BY doc_id, chunk_idx""".stripMargin),
      (s, dir) => SampleOps.chunkTokens(t(s, dir, "documents"),
          "doc_id", "text", size = 32, stride = 16)
        .orderBy("doc_id", "chunk_idx")),

    QueryDef("q68_substring_dedup",
      "Arbitrary-offset repeated-substring dedup (Lee et al. 2022 " +
        "ExactSubstr): every token covered by a 20-token window whose " +
        "exact content occurred earlier in the corpus (global " +
        "(doc_id, position) order) is removed; the first occurrence " +
        "survives whole. Offset-invariant where q66's fixed segments " +
        "are not — shifted boilerplate (a header preceded by one extra " +
        "word) is caught because every window at stride 1 is hashed. " +
        "Window digests are native map-only codegen (GramMd5s: one md5 " +
        "per position off the token bytes, bit-identical to the SQL " +
        "md5-of-joined-window so collisions transfer); keeper = " +
        "row_number partitioned by the 16-byte digest — the ONE " +
        "corpus-scale shuffle; span coverage + rebuild are the native " +
        "CutSpans sorted-merge walk, map-only.",
      Some("""WITH toks AS (SELECT doc_id,
             |    regexp_extract_all(lower(text), '[a-z]+') w FROM documents),
             |ex AS (SELECT doc_id, u.i AS pos, u.t AS tok, u.h AS h FROM (
             |  SELECT doc_id, unnest([{'i': i, 't': w[i+1],
             |      'h': CASE WHEN i <= len(w) - 20
             |        THEN md5(array_to_string(w[(i+1):(i+20)], ' ')) END}
             |    for i in range(0, len(w))]) u FROM toks)),
             |mk AS (SELECT doc_id, pos, tok,
             |    CASE WHEN h IS NOT NULL AND row_number()
             |        OVER (PARTITION BY h ORDER BY doc_id, pos) > 1
             |      THEN 1 ELSE 0 END AS ds
             |  FROM ex),
             |cov AS (SELECT doc_id, pos, tok,
             |    sum(ds) OVER (PARTITION BY doc_id ORDER BY pos
             |      ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) > 0 AS covered
             |  FROM mk),
             |k AS (SELECT doc_id, CAST(count(*) AS INTEGER) AS n_tokens,
             |    CAST(count(*) FILTER (WHERE covered) AS INTEGER) AS n_removed,
             |    string_agg(tok, ' ' ORDER BY pos)
             |      FILTER (WHERE NOT covered) AS text_kept
             |  FROM cov GROUP BY doc_id)
             |SELECT d.doc_id, COALESCE(k.n_tokens, 0) AS n_tokens,
             |  COALESCE(k.n_removed, 0) AS n_removed,
             |  COALESCE(k.text_kept, '') AS text_kept
             |FROM documents d LEFT JOIN k USING (doc_id)
             |ORDER BY doc_id""".stripMargin),
      (s, dir) => TextOps.substringDedup(t(s, dir, "documents"),
          "doc_id", "text", minTokens = 20)
        .orderBy("doc_id")),

    QueryDef("q69_image_decode",
      "REAL image decode through the in-JDK codec: per document, a " +
        "deterministic RGB raster (width 16 + id mod 17, height " +
        "16 + id mod 13) is PNG-encoded in-engine, decoded back via " +
        "javax.imageio (JdkImageCodec.decode), resized to 8x8 through " +
        "java.awt and re-decoded — so every output dimension comes from " +
        "an actual PNG decode, while an arithmetic oracle knows the " +
        "expected values in advance. The per-partition mapPartitions " +
        "codec boundary is the same one a real multimodal pipeline " +
        "amortizes decoder init over.",
      Some("""SELECT doc_id,
             |  CAST(16 + doc_id % 17 AS INTEGER) AS width,
             |  CAST(16 + doc_id % 13 AS INTEGER) AS height,
             |  CAST(3 AS INTEGER) AS channels,
             |  CAST(8 AS INTEGER) AS r_width,
             |  CAST(8 AS INTEGER) AS r_height
             |FROM documents ORDER BY doc_id""".stripMargin),
      (s, dir) => {
        val codec = MultimodalOps.JdkImageCodec
        val docs = t(s, dir, "documents").select("doc_id")
        // materialized once: both the meta branch and the resize branch
        // consume the generated payloads — without the checkpoint every
        // document's raster fill + PNG encode would run once per branch.
        // The checkpointed blocks are GC-scoped (ContextCleaner frees
        // them once the DataFrame is unreachable) — accepted over
        // cache(), whose plan-keyed reuse would let a later benchmark
        // pass read the previous pass's blocks and under-measure.
        val payloads = MultimodalOps.syntheticImagePayloads(docs, "doc_id")
          .localCheckpoint()
        val meta = MultimodalOps.decodeMeta(payloads, "doc_id", codec)
          .toDF().select(col("doc_id"), col("width"), col("height"),
            col("channels"))
        val rmeta = MultimodalOps.decodeMeta(
            MultimodalOps.resizePayloads(payloads, "doc_id", codec, 8, 8),
            "doc_id", codec)
          .toDF().select(col("doc_id"), col("width").as("r_width"),
            col("height").as("r_height"))
        meta.join(rmeta, "doc_id").orderBy("doc_id")
      }),

    QueryDef("q70_ann_ivfpq",
      "ANN scale path #4: IVF-PQ, SINGLE-SHOT form — trains the coarse " +
        "quantizer and PQ codebooks, encodes the corpus, and probes all " +
        "inside one query. This is the calibration/one-off shape (and " +
        "deliberately the worst-case cost point): any serving path " +
        "should use the q81 build / q82 probe split, which persists the " +
        "training products and pays neither training nor corpus encode " +
        "per query batch. Probe internals are shared with q82: m=16 " +
        "one-byte codes per in-list vector (16x smaller than floats), " +
        "asymmetric-distance scoring straight from the codes " +
        "(PqAdcScore), bounded top-k shortlist aggregate, exact-cosine " +
        "refine on refine*k rows per query (the FAISS refine stage). " +
        "Approximate by design -> no SQL oracle (driver rows-only " +
        "check); recall >= 0.8 vs the exact baseline at these defaults " +
        "and the bytes-per-vector contract are asserted in SimOpsSpec.",
      None,
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val q = e.filter(col("vec_id") % 100 === 0)
        SimOps.withRecallAudit(
            SimOps.ivfPqTopK(q, e, "vec_id", "embedding", 5),
            SimOps.bruteForceTopK(q, e, "vec_id", "embedding", 5), 5)
          .orderBy("query_id", "rank")
      }),

    QueryDef("q71_pii_redact",
      "PII detection + redaction (the pre-training scrub every public " +
        "corpus needs): per-type match counts (email, E.164-ish phone, " +
        "IPv4) and a typed-placeholder masked text, all pure codegen'd " +
        "regex column expressions — a map-only scan at 100 TB, no " +
        "shuffle, no UDF. The corpus is words-only, so deterministic " +
        "PII is synthesized into each document from doc_id IDENTICALLY " +
        "on both sides (emails everywhere, phones on id%3=0, IPs on " +
        "id%5=0) — the oracle then proves the patterns match " +
        "byte-identically under RE2 and java.util.regex (the patterns " +
        "are confined to the engines' common subset; see TextOps).",
      Some("""WITH p AS (SELECT doc_id,
             |  text || ' contact user' || doc_id || '@example.com'
             |    || CASE WHEN doc_id % 3 = 0 THEN ' call +1415555' ||
             |         lpad(CAST(doc_id % 1000 AS VARCHAR), 4, '0') ELSE '' END
             |    || CASE WHEN doc_id % 5 = 0 THEN ' from 10.' ||
             |         CAST(doc_id % 256 AS VARCHAR) || '.0.' ||
             |         CAST(doc_id % 200 + 1 AS VARCHAR) ELSE '' END AS t
             |  FROM documents)
             |SELECT doc_id,
             |  CAST(len(regexp_extract_all(t,
             |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INTEGER) AS n_email,
             |  CAST(len(regexp_extract_all(t,
             |    '\+[0-9]{1,3}[0-9 -]{6,12}[0-9]')) AS INTEGER) AS n_phone,
             |  CAST(len(regexp_extract_all(t,
             |    '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS INTEGER) AS n_ip,
             |  regexp_replace(regexp_replace(regexp_replace(t,
             |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             |    '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g'),
             |    '\+[0-9]{1,3}[0-9 -]{6,12}[0-9]', '<PHONE>', 'g') AS redacted
             |FROM p ORDER BY doc_id""".stripMargin),
      (s, dir) => {
        val withPii = concat(
          col("text"),
          lit(" contact user"), col("doc_id").cast("string"), lit("@example.com"),
          when(col("doc_id") % 3 === 0,
            concat(lit(" call +1415555"),
              lpad((col("doc_id") % 1000).cast("string"), 4, "0")))
            .otherwise(lit("")),
          when(col("doc_id") % 5 === 0,
            concat(lit(" from 10."), (col("doc_id") % 256).cast("string"),
              lit(".0."), (col("doc_id") % 200 + 1).cast("string")))
            .otherwise(lit("")))
        t(s, dir, "documents")
          .select(col("doc_id"), withPii.as("__t"))
          .select(col("doc_id") +: TextOps.piiCounts(col("__t")) :+
            TextOps.redactPii(col("__t")).as("redacted"): _*)
          .orderBy("doc_id")
      }),

    QueryDef("q72_line_filter",
      "Boilerplate line filtering (jusText/trafilatura-style): drop the " +
        "short navigation/footer lines of a document, keep content " +
        "lines, rebuild. Row-local higher-order functions only — no " +
        "explode, no shuffle: a map-only scan at 100 TB. The corpus is " +
        "single-line, so line structure is synthesized IDENTICALLY on " +
        "both sides (6-word lines, a 3-word 'home login menu' " +
        "boilerplate line injected before every even line); the filter " +
        "then keeps lines with >= 4 word tokens, which also drops a " +
        "short trailing remainder line — the oracle agrees exactly. " +
        "Both sides are TOTAL on NULL text: Spark's when(size>0) sends " +
        "NULL down the empty-array branch (n_lines=1, n_kept=0, " +
        "cleaned=''), so the oracle COALESCEs its token list to [] to " +
        "land on the identical row rather than propagating NULL.",
      Some("""WITH toks AS (SELECT doc_id,
             |    COALESCE(regexp_extract_all(lower(text), '[a-z]+'),
             |             CAST([] AS VARCHAR[])) AS w FROM documents),
             |ln AS (SELECT doc_id, CASE WHEN len(w) = 0 THEN CAST([] AS VARCHAR[])
             |    ELSE [array_to_string(w[(i*6+1):(i*6+6)], ' ')
             |          for i in range(0, CAST(ceil(len(w)/6.0) AS INTEGER))] END AS lines
             |  FROM toks),
             |tx AS (SELECT doc_id, array_to_string(flatten(
             |    [CASE WHEN i % 2 = 1 THEN ['home login menu', lines[i]]
             |          ELSE [lines[i]] END
             |     for i in range(1, len(lines)+1)]), chr(10)) AS t FROM ln),
             |sp AS (SELECT doc_id, string_split(t, chr(10)) AS ls FROM tx)
             |SELECT doc_id, CAST(len(ls) AS INTEGER) AS n_lines,
             |  CAST(len([l for l in ls
             |    if len(regexp_extract_all(lower(l), '[a-z]+')) >= 4]) AS INTEGER) AS n_kept,
             |  array_to_string([l for l in ls
             |    if len(regexp_extract_all(lower(l), '[a-z]+')) >= 4], chr(10)) AS cleaned
             |FROM sp ORDER BY doc_id""".stripMargin),
      (s, dir) => {
        val toks = TextOps.tokens(col("text"))
        val lines = when(size(toks) > 0,
          transform(sequence(lit(0),
              ceil(size(toks) / lit(6.0)).cast("int") - 1),
            i => array_join(slice(toks, i * 6 + 1, lit(6)), " ")))
          .otherwise(array().cast("array<string>"))
        val lined = array_join(flatten(transform(lines, (l, i) =>
          when(i % 2 === 0, array(lit("home login menu"), l))
            .otherwise(array(l)))), "\n")
        t(s, dir, "documents")
          .select(col("doc_id"), lined.as("__t"))
          .select(col("doc_id"),
            size(TextOps.docLines(col("__t"))).as("n_lines"),
            size(filter(TextOps.docLines(col("__t")),
              TextOps.contentLine(4))).as("n_kept"),
            TextOps.filterLines(col("__t"), TextOps.contentLine(4))
              .as("cleaned"))
          .orderBy("doc_id")
      }),

    QueryDef("q73_image_neardup",
      "Image near-duplicate detection through the REAL codec: per doc a " +
        "deterministic PNG (plus, for id%10=0, a planted variant row — " +
        "same raster, new id, one perturbed pixel), decoded via " +
        "javax.imageio and perceptually hashed (56-bit dHash on an " +
        "integer-sampled 8x8 gray grid — sampling chosen so an " +
        "arithmetic oracle reproduces every bit; see MultimodalOps." +
        "dHash56), then paired within hamming<=3 by 4x14-bit band " +
        "pigeonhole equi-join + exact verify — the LSH shape of the " +
        "text near-dup paths, applied to images. The oracle recomputes " +
        "each hash from the raster formula and joins exhaustively.",
      Some("""WITH imgs AS (
             |  SELECT doc_id AS id, doc_id AS seed, FALSE AS tweak FROM documents
             |  UNION ALL
             |  SELECT doc_id + (SELECT MAX(doc_id) + 1 FROM documents) AS id,
             |    doc_id AS seed, TRUE AS tweak
             |  FROM documents WHERE doc_id % 10 = 0),
             |gr AS (SELECT id,
             |  [ (299 * v + 587 * (255 - v) + 114 * ((3 * v) % 256)) // 1000
             |    for v in
             |    [ CASE WHEN tweak AND ((i % 8) * (16 + seed % 17)) // 8 = 0
             |                AND ((i // 8) * (16 + seed % 13)) // 8 = 0
             |      THEN xor((seed * 31 + (((i % 8) * (16 + seed % 17)) // 8) * 7
             |                + (((i // 8) * (16 + seed % 13)) // 8) * 13) % 256, 128)
             |      ELSE (seed * 31 + (((i % 8) * (16 + seed % 17)) // 8) * 7
             |            + (((i // 8) * (16 + seed % 13)) // 8) * 13) % 256 END
             |      for i in range(0, 64) ] ] AS g
             |  FROM imgs),
             |hs AS (SELECT id, CAST(list_sum(
             |    [ CASE WHEN g[(j // 7) * 8 + (j % 7) + 1] > g[(j // 7) * 8 + (j % 7) + 2]
             |      THEN CAST(1 AS BIGINT) << j ELSE CAST(0 AS BIGINT) END
             |      for j in range(0, 56) ]) AS BIGINT) AS dhash FROM gr)
             |SELECT a.id AS a_id, b.id AS b_id,
             |  CAST(bit_count(xor(a.dhash, b.dhash)) AS INTEGER) AS hamming
             |FROM hs a JOIN hs b ON a.id > b.id
             |WHERE bit_count(xor(a.dhash, b.dhash)) <= 3
             |ORDER BY a_id, b_id""".stripMargin),
      (s, dir) => {
        val docs = t(s, dir, "documents").select("doc_id")
        val base = docs.select(col("doc_id").as("id"),
          col("doc_id").as("seed"), lit(false).as("tweak"))
        // variant ids offset past max(doc_id), not a fixed constant — a
        // constant collides with real ids once the table outgrows it,
        // and duplicate ids would make the pair output nondeterministic
        val vars = docs.filter(col("doc_id") % 10 === 0)
          .crossJoin(docs.agg(max(col("doc_id")).as("__mx")))
          .select((col("doc_id") + col("__mx") + 1).as("id"),
            col("doc_id").as("seed"), lit(true).as("tweak"))
        val payloads = MultimodalOps.syntheticImagePayloads(
          base.unionByName(vars), "id", "seed", "tweak")
        MultimodalOps.dhashNearDupPairs(
            MultimodalOps.dHashes(payloads, "id"), "id")
          .orderBy("a_id", "b_id")
      }),

    QueryDef("q74_bigram_lm",
      "Corpus-trained bigram language-model quality scoring (the CCNet/" +
        "KenLM perplexity-filter shape, self-trained): unigram + bigram " +
        "counts over the whole corpus, Laplace-smoothed conditional " +
        "probability per document bigram, integer mean per document — " +
        "fluent (common-bigram) documents score high, disfluent ones " +
        "low. Exact integer arithmetic end to end (probabilities in " +
        "parts-per-million, floor division) so the oracle matches " +
        "bit-for-bit; see TextOps.bigramLmScores for the ln-space " +
        "drop-in. Two vocab-keyed count shuffles + two co-keyed joins " +
        "+ one per-doc aggregate — nothing corpus-sized on the driver.",
      Some("""WITH toks AS (SELECT doc_id,
             |    regexp_extract_all(lower(text), '[a-z]+') AS w FROM documents),
             |uni AS (SELECT w1, COUNT(*) AS c1 FROM (
             |    SELECT unnest(w) AS w1 FROM toks) GROUP BY w1),
             |v AS (SELECT COUNT(*) AS vs FROM uni),
             |bg AS (SELECT doc_id, u.w1 AS w1, u.w2 AS w2 FROM (
             |    SELECT doc_id, unnest([{'w1': w[i], 'w2': w[i+1]}
             |      for i in range(1, len(w))]) AS u FROM toks)),
             |big AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY w1, w2),
             |per AS (SELECT doc_id,
             |    (1000000 * (c12 + 1)) // (c1 + vs) AS ppm
             |  FROM bg JOIN big USING (w1, w2) JOIN uni USING (w1) CROSS JOIN v),
             |sc AS (SELECT doc_id, COUNT(*) AS nb, SUM(ppm) AS sp
             |  FROM per GROUP BY doc_id)
             |SELECT t.doc_id, CAST(COALESCE(sc.nb, 0) AS INTEGER) AS n_bigrams,
             |  CAST(sc.sp // sc.nb AS BIGINT) AS score_ppm
             |FROM toks t LEFT JOIN sc ON t.doc_id = sc.doc_id
             |ORDER BY t.doc_id""".stripMargin),
      (s, dir) =>
        TextOps.bigramLmScores(t(s, dir, "documents"), "doc_id", "text")
          .orderBy("doc_id")),

    QueryDef("q75_semdedup",
      "SemDeDup (Abbas et al. 2023): semantic dedup scoped to trained " +
        "k-means clusters — pairwise cosine runs only WITHIN a cluster " +
        "(equi-join on the cluster id, never n² — the scale path q33's " +
        "exhaustive baseline exists to calibrate), larger id of any " +
        "pair at cosine >= 0.45 is dropped, survivors keep their " +
        "cluster label. probes=2 multi-probe assignment mitigates the " +
        "paper's cross-cluster blind spot: each vector is candidate-" +
        "visible in its top-2 clusters, so a dup pair straddling one " +
        "boundary still meets (~2x pair volume, still equi-keyed). " +
        "Clustering is k-means -> no SQL oracle (driver " +
        "rows-only check); SimOpsSpec pins the semantics: planted dups " +
        "die (including a boundary-straddling pair), kills are a subset " +
        "of the exhaustive q33 kill set, partition-invariant.",
      None,
      (s, dir) =>
        SimOps.semDedup(t(s, dir, "embeddings"), "vec_id", "embedding",
            nlist = 16, threshold = 0.45, probes = 2)
          .orderBy("vec_id")),

    QueryDef("q76_url_screen",
      "Web-crawl URL admission screen (the stage before any text is " +
        "read): canonicalize URLs (lowercase, strip fragment/query/" +
        "trailing slash), collapse crawl duplicates to the smallest " +
        "doc_id per canonical URL, drop blocklisted domains by 2-label " +
        "suffix via a broadcast anti-join. URLs are synthesized " +
        "deterministically on both sides (case-variant hosts, tracking " +
        "params, fragments, trailing slashes, and id%4=0 docs on a " +
        "blocked domain) so every canonicalization rule is actually " +
        "exercised. One canonical-key shuffle + a broadcast anti-join.",
      Some("""WITH u AS (SELECT doc_id,
             |  'https://Site' || CAST(doc_id % 10 AS VARCHAR)
             |   || CASE WHEN doc_id % 4 = 0 THEN '.spam.example'
             |           ELSE '.example.org' END
             |   || '/p/' || CAST(doc_id % 50 AS VARCHAR)
             |   || CASE WHEN doc_id % 7 = 0 THEN '/' ELSE '' END
             |   || CASE WHEN doc_id % 3 = 0 THEN '?utm=x' ELSE '' END
             |   || CASE WHEN doc_id % 5 = 0 THEN '#frag' ELSE '' END AS raw
             |  FROM documents),
             |s AS (SELECT doc_id, regexp_replace(regexp_replace(
             |    raw, '#.*$', ''), '\?.*$', '') AS st FROM u),
             |c AS (SELECT doc_id, regexp_replace(
             |    lower(regexp_extract(st, '^([A-Za-z][A-Za-z0-9+.-]*://[^/]*)', 1))
             |      || substr(st, len(regexp_extract(st,
             |           '^([A-Za-z][A-Za-z0-9+.-]*://[^/]*)', 1)) + 1),
             |    '/$', '') AS url FROM s),
             |h AS (SELECT doc_id, url,
             |    regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1) AS host
             |  FROM c),
             |k AS (SELECT url, host, MIN(doc_id) AS doc_id FROM h GROUP BY url, host)
             |SELECT doc_id, host, url FROM k
             |WHERE NOT (host = 'spam.example' OR ends_with(host, '.spam.example'))
             |ORDER BY doc_id""".stripMargin),
      (s, dir) => {
        val raw = concat(lit("https://Site"),
          (col("doc_id") % 10).cast("string"),
          when(col("doc_id") % 4 === 0, lit(".spam.example"))
            .otherwise(lit(".example.org")),
          lit("/p/"), (col("doc_id") % 50).cast("string"),
          when(col("doc_id") % 7 === 0, lit("/")).otherwise(lit("")),
          when(col("doc_id") % 3 === 0, lit("?utm=x")).otherwise(lit("")),
          when(col("doc_id") % 5 === 0, lit("#frag")).otherwise(lit("")))
        WebOps.screenUrls(
            t(s, dir, "documents").select(col("doc_id"), raw.as("raw_url")),
            "doc_id", "raw_url", Seq("spam.example"))
          .orderBy("doc_id")
      }),

    QueryDef("q77_pool_embeddings",
      "Chunk -> document embedding pooling (the RAG/retrieval move): " +
        "element-wise mean of each group's vectors (group = vec_id % " +
        "50, a chunks-of-one-doc proxy). Floating-point addition does " +
        "not commute, so the per-component sum folds in EXPLICIT vec_id " +
        "order (group-size-bounded sorted collect) rather than a " +
        "merge-order-dependent sum() — same-order folds are " +
        "bit-identical across engines, so the oracle checks pooled " +
        "doubles exactly. The catalog entry emits one SCALAR row per " +
        "(group, component) — array-valued result columns break " +
        "external comparison harnesses that sort/hash scalar cells " +
        "(the q54 lesson), so the pooled vector is exploded here and " +
        "reassembled by callers that want the array shape " +
        "(SimOps.meanPool itself still returns it). " +
        "Two equi-shuffles, both keyed by group.",
      Some("""WITH c AS (SELECT vec_id % 50 AS grp, vec_id,
             |    unnest([{'i': i, 'x': CAST(embedding[i+1] AS DOUBLE)}
             |            for i in range(0, len(embedding))]) AS u
             |  FROM embeddings),
             |f AS (SELECT grp, u.i AS i, COUNT(*) AS n,
             |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |      list(u.x ORDER BY vec_id)), (a, b) -> a + b) AS s
             |  FROM c GROUP BY grp, u.i)
             |SELECT grp, CAST(i AS INTEGER) AS i,
             |  CAST(n AS INTEGER) AS n_vecs, round(s / n, 6) AS mean
             |FROM f ORDER BY grp, i""".stripMargin),
      (s, dir) =>
        SimOps.meanPool(
            t(s, dir, "embeddings").select((col("vec_id") % 50).as("grp"),
              col("vec_id"), col("embedding")),
            "vec_id", "grp", "embedding")
          .select(col("grp"), col("n_vecs"),
            posexplode(col("pooled")).as(Seq("i", "mean")))
          .select(col("grp"), col("i"), col("n_vecs"), col("mean"))
          .orderBy("grp", "i")),

    QueryDef("q78_chat_flatten",
      "SFT conversation formatting: instruction data arrives as JSON " +
        "conversations and leaves as flat training text — parse the " +
        "turn array (from_json), count turns, gate on ends-with-" +
        "assistant (a trailing user turn has no target tokens), and " +
        "flatten to <|role|>content sentinel format. Row-local " +
        "from_json + HOFs: no explode, no shuffle, no UDF. " +
        "Conversations are synthesized from each document's tokens " +
        "IDENTICALLY on both sides (2 turns, +1 trailing user turn for " +
        "id%3=0 making those invalid); the oracle re-parses with " +
        "DuckDB's JSON functions.",
      Some("""WITH toks AS (SELECT doc_id,
             |    regexp_extract_all(lower(text), '[a-z]+') AS w FROM documents),
             |j AS (SELECT doc_id,
             |  '[{"role":"user","content":"' || array_to_string(w[1:4], ' ')
             |   || '"},{"role":"assistant","content":"' || array_to_string(w[5:8], ' ')
             |   || '"}' || CASE WHEN doc_id % 3 = 0
             |        THEN ',{"role":"user","content":"' || array_to_string(w[9:12], ' ') || '"}'
             |        ELSE '' END || ']' AS conv
             |  FROM toks)
             |SELECT doc_id,
             |  CAST(json_array_length(conv) AS INTEGER) AS n_turns,
             |  json_extract_string(conv,
             |    '$[' || (json_array_length(conv) - 1) || '].role') = 'assistant' AS valid,
             |  array_to_string(['<|' || json_extract_string(conv, '$[' || i || '].role')
             |      || '|>' || json_extract_string(conv, '$[' || i || '].content')
             |    for i in range(0, CAST(json_array_length(conv) AS INTEGER))], '') AS flat
             |FROM j ORDER BY doc_id""".stripMargin),
      (s, dir) => {
        val toks = TextOps.tokens(col("text"))
        val conv = concat(
          lit("""[{"role":"user","content":""""),
          array_join(slice(toks, 1, 4), " "),
          lit(""""},{"role":"assistant","content":""""),
          array_join(slice(toks, 5, 4), " "),
          lit(""""}"""),
          when(col("doc_id") % 3 === 0,
            concat(lit(""",{"role":"user","content":""""),
              array_join(slice(toks, 9, 4), " "), lit(""""}""")))
            .otherwise(lit("")),
          lit("]"))
        t(s, dir, "documents")
          .select(col("doc_id"), conv.as("__conv"))
          .select(col("doc_id"),
            ChatOps.turnCount(col("__conv")).as("n_turns"),
            ChatOps.endsWithAssistant(col("__conv")).as("valid"),
            ChatOps.flattenChat(col("__conv")).as("flat"))
          .orderBy("doc_id")
      }),

    QueryDef("q79_classifier_score",
      "Quality-classifier application at corpus scale (the fastText/" +
        "CCNet shape): every document scored by a linear model over " +
        "hashed bag-of-words features — token -> md5-stable bucket -> " +
        "integer weight, margin = sum, keep = margin > 0. One aggregate " +
        "HOF over the token array: no explode, no shuffle, no UDF — a " +
        "map-only scan at 100 TB. Weights are a deterministic stand-in " +
        "table (documented; a trained model's coefficients swap in with " +
        "the identical plan), which is what lets the oracle recompute " +
        "every margin exactly.",
      Some("""WITH toks AS (SELECT doc_id,
             |    regexp_extract_all(lower(text), '[a-z]+') AS w FROM documents)
             |SELECT doc_id, CAST(len(w) AS INTEGER) AS n_tokens,
             |  CAST(COALESCE(list_sum(
             |    [ ((CAST(concat('0x', substr(md5(t), 1, 15)) AS BIGINT) % 4096)
             |        * 2654435761) % 1001 - 500 for t in w ]), 0) AS BIGINT) AS margin,
             |  COALESCE(list_sum(
             |    [ ((CAST(concat('0x', substr(md5(t), 1, 15)) AS BIGINT) % 4096)
             |        * 2654435761) % 1001 - 500 for t in w ]), 0) > 0 AS keep
             |FROM toks ORDER BY doc_id""".stripMargin),
      (s, dir) => {
        val margin = TextOps.hashedLinearMargin(col("text"),
          TextOps.pseudoWeight(_))
        t(s, dir, "documents")
          .select(col("doc_id"),
            size(TextOps.tokens(col("text"))).as("n_tokens"),
            margin.as("margin"), (margin > 0).as("keep"))
          .orderBy("doc_id")
      }),

    QueryDef("q80_unicode_tokens",
      "Unicode-aware tokenization mode ([\\p{L}\\p{N}]+ — the RE2 ∩ " +
        "java.util.regex common subset, like the PII patterns): digits, " +
        "accented Latin, Greek and CJK all survive, where the default " +
        "letters mode's [a-z]+ silently drops them. The letters contract " +
        "is KEPT by every fingerprint/shingle/MinHash/winnow query " +
        "(their oracles hash ASCII code points) — this query documents " +
        "the delta and oracle-proves the unicode mode exactly. " +
        "Mixed-script text is synthesized IDENTICALLY on both sides " +
        "(the corpus is ASCII; the suffix is lowercase-stable so both " +
        "engines' case folds agree) and the oracle compares both modes' " +
        "counts plus the full unicode token stream byte-for-byte. " +
        "Map-only column expressions — no shuffle at any scale.",
      Some("""WITH p AS (SELECT doc_id,
             |  text || ' café' || CAST(doc_id % 100 AS VARCHAR)
             |       || ' δύο λέξεις 模型7 données 2024' AS t FROM documents)
             |SELECT doc_id,
             |  CAST(len(regexp_extract_all(lower(t), '[a-z]+')) AS INTEGER)
             |    AS n_letters,
             |  CAST(len(regexp_extract_all(lower(t), '[\p{L}\p{N}]+')) AS INTEGER)
             |    AS n_unicode,
             |  array_to_string(regexp_extract_all(lower(t), '[\p{L}\p{N}]+'), ' ')
             |    AS uni_text
             |FROM p ORDER BY doc_id""".stripMargin),
      (s, dir) => {
        val tt = concat(col("text"), lit(" café"),
          (col("doc_id") % 100).cast("string"),
          lit(" δύο λέξεις 模型7 données 2024"))
        t(s, dir, "documents")
          .select(col("doc_id"), tt.as("__t"))
          .select(col("doc_id"),
            size(TextOps.tokens(col("__t"))).as("n_letters"),
            size(TextOps.tokens(col("__t"), "unicode")).as("n_unicode"),
            concat_ws(" ", TextOps.tokens(col("__t"), "unicode")).as("uni_text"))
          .orderBy("doc_id")
      }),

    QueryDef("q81_ann_index_build",
      "IVF-PQ index BUILD, persisted (the FAISS build/probe split q70 " +
        "deliberately folds into one query): trains the coarse " +
        "quantizer + PQ codebooks, encodes the corpus to m-byte codes, " +
        "and stores centroids/codebooks/codes through UpsertSink (the " +
        "q59->q63 materialization pattern). Output: per-list occupancy " +
        "— the index statistic an operator monitors (empty/overfull " +
        "lists are the recall/latency smell). k-means internals -> no " +
        "SQL oracle (driver rows-only); SimOpsSpec asserts the stored " +
        "probe's parity with the in-query build.",
      None,
      (s, dir) =>
        SimOps.buildIvfPqIndex(t(s, dir, "embeddings"),
            "vec_id", "embedding", tempStore.sink(s, "annidx", dir))
          .orderBy("list")),

    QueryDef("q82_ann_index_probe",
      "IVF-PQ PROBE against the q81 persisted index: identical ADC " +
        "code-lookup shortlist + exact-cosine refine math to q70, but " +
        "NO training and no corpus encode inside the query — centroids " +
        "and codebooks load as two bounded collects and candidates " +
        "stream from the stored m-byte code lists. This is the serving " +
        "amortization at 100 TB: rebuild on corpus change, probe per " +
        "query batch. Builds the index first only if q81 has not run " +
        "in this JVM. Approximate by design -> rows-only check.",
      None,
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val sink = tempStore.sink(s, "annidx", dir)
        if (!SimOps.ivfPqIndexExists(sink))
          SimOps.buildIvfPqIndex(e, "vec_id", "embedding", sink)
        val q = e.filter(col("vec_id") % 100 === 0)
        SimOps.withRecallAudit(
            SimOps.ivfPqProbeIndex(q, e, "vec_id", "embedding", sink, 5),
            SimOps.bruteForceTopK(q, e, "vec_id", "embedding", 5), 5)
          .orderBy("query_id", "rank")
      }),

    QueryDef("q83_curation_stream",
      "The COMPOSED curation stream, batch-replay form (q76 -> q72 -> " +
        "q71 -> q64 as ONE foreachBatch chain, the CurationPipeline " +
        "core): documents arrive in 4 ordered micro-batches; each batch " +
        "is URL-screened (canonicalize, in-batch crawl-dup collapse, " +
        "domain blocklist — batch 0 dies entirely on the blocklist), " +
        "line-filtered (>= 4-word lines survive), PII-redacted, and the " +
        "survivors run the EXACT near-dup admission core against the " +
        "accumulated corpus. The stateless screens are O(batch) " +
        "regardless of corpus size; admission bounds corpus reads to " +
        "band collisions. URL/line/PII synthesis reuses the q76/q72/q71 " +
        "formulas verbatim on both sides; the oracle replays the same 4 " +
        "batches with exhaustive Jaccard over the CURATED text and " +
        "compares the admitted corpus — ids, batches, and final " +
        "redacted text byte-for-byte.",
      Some("""WITH u AS (SELECT doc_id, doc_id % 4 AS b,
             |  'https://Site' || CAST(doc_id % 10 AS VARCHAR)
             |   || CASE WHEN doc_id % 4 = 0 THEN '.spam.example'
             |           ELSE '.example.org' END
             |   || '/p/' || CAST(doc_id % 50 AS VARCHAR)
             |   || CASE WHEN doc_id % 7 = 0 THEN '/' ELSE '' END
             |   || CASE WHEN doc_id % 3 = 0 THEN '?utm=x' ELSE '' END
             |   || CASE WHEN doc_id % 5 = 0 THEN '#frag' ELSE '' END AS raw
             |  FROM documents),
             |s AS (SELECT doc_id, b, regexp_replace(regexp_replace(
             |    raw, '#.*$', ''), '\?.*$', '') AS st FROM u),
             |c AS (SELECT doc_id, b, regexp_replace(
             |    lower(regexp_extract(st, '^([A-Za-z][A-Za-z0-9+.-]*://[^/]*)', 1))
             |      || substr(st, len(regexp_extract(st,
             |           '^([A-Za-z][A-Za-z0-9+.-]*://[^/]*)', 1)) + 1),
             |    '/$', '') AS url FROM s),
             |h AS (SELECT doc_id, b, url,
             |    regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1) AS host
             |  FROM c),
             |k AS (SELECT b, url, host, MIN(doc_id) AS doc_id
             |  FROM h GROUP BY b, url, host),
             |scr AS (SELECT doc_id FROM k
             |  WHERE NOT (host = 'spam.example' OR ends_with(host, '.spam.example'))),
             |toks AS (SELECT doc_id,
             |    COALESCE(regexp_extract_all(lower(text), '[a-z]+'),
             |             CAST([] AS VARCHAR[])) AS w FROM documents),
             |ln AS (SELECT doc_id, CASE WHEN len(w) = 0 THEN CAST([] AS VARCHAR[])
             |    ELSE [array_to_string(w[(i*6+1):(i*6+6)], ' ')
             |          for i in range(0, CAST(ceil(len(w)/6.0) AS INTEGER))] END AS lines
             |  FROM toks),
             |tx AS (SELECT doc_id, array_to_string(flatten(
             |    [CASE WHEN i % 2 = 1 THEN ['home login menu', lines[i]]
             |          ELSE [lines[i]] END
             |     for i in range(1, len(lines)+1)]), chr(10))
             |  || ' contact user' || doc_id || '@example.com'
             |  || CASE WHEN doc_id % 3 = 0 THEN ' call +1415555' ||
             |       lpad(CAST(doc_id % 1000 AS VARCHAR), 4, '0') ELSE '' END
             |  || CASE WHEN doc_id % 5 = 0 THEN ' from 10.' ||
             |       CAST(doc_id % 256 AS VARCHAR) || '.0.' ||
             |       CAST(doc_id % 200 + 1 AS VARCHAR) ELSE '' END AS t
             |  FROM ln),
             |sp AS (SELECT doc_id, string_split(t, chr(10)) AS ls FROM tx),
             |cl AS (SELECT doc_id, array_to_string([l for l in ls
             |    if len(regexp_extract_all(lower(l), '[a-z]+')) >= 4], chr(10)) AS ct
             |  FROM sp),
             |rd AS (SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(ct,
             |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             |    '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g'),
             |    '\+[0-9]{1,3}[0-9 -]{6,12}[0-9]', '<PHONE>', 'g') AS rt FROM cl),
             |f AS (SELECT rd.doc_id, rd.doc_id % 4 AS b, rt
             |  FROM rd JOIN scr ON rd.doc_id = scr.doc_id),
             |tk2 AS (SELECT doc_id, b, regexp_extract_all(lower(rt), '[a-z]+') w2
             |  FROM f),
             |d AS (SELECT doc_id, b, CASE WHEN len(w2) < 3
             |    THEN [array_to_string(w2, ' ')]
             |    ELSE list_distinct([w2[i] || ' ' || w2[i+1] || ' ' || w2[i+2]
             |                        for i in range(1, len(w2) - 1)]) END AS s
             |  FROM tk2),
             |pair AS (SELECT a.doc_id AS a_id, x.doc_id AS b_id, x.b AS bb
             |  FROM d a JOIN d x ON a.doc_id <> x.doc_id
             |  WHERE CAST(len(list_intersect(a.s, x.s)) AS DOUBLE)
             |        / len(list_distinct(list_concat(a.s, x.s))) >= 0.5),
             |a0 AS (SELECT doc_id FROM d WHERE b = 0 AND NOT EXISTS (
             |    SELECT 1 FROM pair p WHERE p.a_id = d.doc_id
             |      AND p.bb = 0 AND p.b_id < d.doc_id)),
             |a1 AS (SELECT doc_id FROM d WHERE b = 1
             |  AND NOT EXISTS (SELECT 1 FROM pair p WHERE p.a_id = d.doc_id
             |    AND p.bb = 1 AND p.b_id < d.doc_id)
             |  AND NOT EXISTS (SELECT 1 FROM pair p JOIN a0 ON p.b_id = a0.doc_id
             |    WHERE p.a_id = d.doc_id)),
             |adm01 AS (SELECT doc_id FROM a0 UNION ALL SELECT doc_id FROM a1),
             |a2 AS (SELECT doc_id FROM d WHERE b = 2
             |  AND NOT EXISTS (SELECT 1 FROM pair p WHERE p.a_id = d.doc_id
             |    AND p.bb = 2 AND p.b_id < d.doc_id)
             |  AND NOT EXISTS (SELECT 1 FROM pair p JOIN adm01 ON p.b_id = adm01.doc_id
             |    WHERE p.a_id = d.doc_id)),
             |adm012 AS (SELECT doc_id FROM adm01 UNION ALL SELECT doc_id FROM a2),
             |a3 AS (SELECT doc_id FROM d WHERE b = 3
             |  AND NOT EXISTS (SELECT 1 FROM pair p WHERE p.a_id = d.doc_id
             |    AND p.bb = 3 AND p.b_id < d.doc_id)
             |  AND NOT EXISTS (SELECT 1 FROM pair p JOIN adm012 ON p.b_id = adm012.doc_id
             |    WHERE p.a_id = d.doc_id)),
             |adm AS (SELECT doc_id FROM adm012 UNION ALL SELECT doc_id FROM a3)
             |SELECT f.doc_id, CAST(f.b AS BIGINT) AS batch, f.rt AS text
             |FROM f JOIN adm ON f.doc_id = adm.doc_id
             |ORDER BY f.doc_id""".stripMargin),
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val raw = concat(lit("https://Site"),
          (col("doc_id") % 10).cast("string"),
          when(col("doc_id") % 4 === 0, lit(".spam.example"))
            .otherwise(lit(".example.org")),
          lit("/p/"), (col("doc_id") % 50).cast("string"),
          when(col("doc_id") % 7 === 0, lit("/")).otherwise(lit("")),
          when(col("doc_id") % 3 === 0, lit("?utm=x")).otherwise(lit("")),
          when(col("doc_id") % 5 === 0, lit("#frag")).otherwise(lit("")))
        val toks = TextOps.tokens(col("text"))
        val lines = when(size(toks) > 0,
          transform(sequence(lit(0),
              ceil(size(toks) / lit(6.0)).cast("int") - 1),
            i => array_join(slice(toks, i * 6 + 1, lit(6)), " ")))
          .otherwise(array().cast("array<string>"))
        val lined = array_join(flatten(transform(lines, (l, i) =>
          when(i % 2 === 0, array(lit("home login menu"), l))
            .otherwise(array(l)))), "\n")
        val withPii = concat(lined,
          lit(" contact user"), col("doc_id").cast("string"), lit("@example.com"),
          when(col("doc_id") % 3 === 0,
            concat(lit(" call +1415555"),
              lpad((col("doc_id") % 1000).cast("string"), 4, "0")))
            .otherwise(lit("")),
          when(col("doc_id") % 5 === 0,
            concat(lit(" from 10."), (col("doc_id") % 256).cast("string"),
              lit(".0."), (col("doc_id") % 200 + 1).cast("string")))
            .otherwise(lit("")))
        val feed = docs.select(col("doc_id"), raw.as("raw_url"),
          withPii.as("text"))
        // fresh store per invocation, same replay contract as q64
        val sink = tempStore.freshSink(s, "curate", dir)
        (0 until 4).foreach { b =>
          graft.streaming.DedupPipeline.admitNearDups(sink, "corpus", "bands",
            graft.streaming.CurationPipeline.curateBatch(
              feed.filter(col("doc_id") % 4 === b),
              "doc_id", "raw_url", "text", Seq("spam.example")))
        }
        sink.read("corpus")
          .select(col("doc_id"), (col("doc_id") % 4).as("batch"), col("text"))
          .orderBy("doc_id")
      }),

    QueryDef("q84_nfc_normalize",
      "Unicode NFC normalization (UAX #15) as a codegen'd expression " +
        "(functions/NormalizeExpressions.scala): composed and decomposed " +
        "renderings of the same text are different BYTE strings, so " +
        "every hash-based operator (exact dedup, MinHash, winnowing) " +
        "must normalize first or miss dups the user cannot see. Input " +
        "is synthesized identically on both sides: ASCII corpus text " +
        "plus a decomposed e+U+0301 (composes to é), the U+212B " +
        "angstrom singleton (maps to Å), the U+FB01 fi-ligature (NFC " +
        "keeps it — proving this is NFC, not NFKC) and a decomposed " +
        "i+U+0308 (composes to ï). Oracle is DuckDB's nfc_normalize — " +
        "two independent UAX #15 implementations must agree " +
        "byte-for-byte. Map-only scan: ASCII rows exit on a byte-scan " +
        "fast path with zero allocation; no shuffle at any scale.",
      Some("""WITH p AS (SELECT doc_id,
             |  text || ' cafe' || chr(769) || ' ' || chr(8491) || ' '
             |       || chr(64257) || 'n nai' || chr(776) || 've '
             |       || CAST(doc_id % 100 AS VARCHAR) AS t FROM documents)
             |SELECT doc_id, nfc_normalize(t) AS nfc_text,
             |  (nfc_normalize(t) <> t) AS changed,
             |  CAST(len(t) AS INTEGER) AS n_raw,
             |  CAST(len(nfc_normalize(t)) AS INTEGER) AS n_nfc
             |FROM p ORDER BY doc_id""".stripMargin),
      (s, dir) => {
        graft.functions.NormalizeFunctions.register(s)
        // explicit escapes: a raw decomposed literal in source could be
        // silently NFC'd by tooling and the fixture would test nothing
        val raw = concat(col("text"),
          lit(" cafe\u0301 \u212B \uFB01n nai\u0308ve "),
          (col("doc_id") % 100).cast("string"))
        val nfc = graft.functions.NormalizeFunctions.normalize(col("__t"), "NFC")
        t(s, dir, "documents")
          .select(col("doc_id"), raw.as("__t"))
          .select(col("doc_id"), nfc.as("nfc_text"),
            (nfc =!= col("__t")).as("changed"),
            length(col("__t")).as("n_raw"),
            length(nfc).as("n_nfc"))
          .orderBy("doc_id")
      }),

    QueryDef("q85_nfc_dedup",
      "Normalization-aware exact dedup (q84 composed with the q28 " +
        "hash-groupBy): every document is doubled into a composed " +
        "(U+00E9) and a decomposed (e+U+0301) rendering of the SAME " +
        "visible text. Raw md5 keys see 2 distinct documents per pair " +
        "— the silent dup leak every un-normalized corpus carries — " +
        "while NFC-first keys collapse them to 1 and the keeper is the " +
        "min id, exactly the q28 keeper rule. The NFC digest itself is " +
        "an output column, so the oracle hash-compares the md5-over-" +
        "UTF-8-bytes of BOTH engines' independently normalized text. " +
        "One md5-keyed aggregation — the q28 scale shape unchanged; " +
        "normalization adds a map-only pass.",
      Some("""WITH u AS (
             |  SELECT doc_id AS id, doc_id AS grp,
             |         text || ' caf' || chr(233) AS t FROM documents
             |  UNION ALL
             |  SELECT doc_id + 100000, doc_id,
             |         text || ' cafe' || chr(769) FROM documents)
             |SELECT grp AS doc_id, MIN(id) AS keeper,
             |  COUNT(DISTINCT md5(t)) AS n_raw_keys,
             |  COUNT(DISTINCT md5(nfc_normalize(t))) AS n_nfc_keys,
             |  MIN(md5(nfc_normalize(t))) AS nfc_key
             |FROM u GROUP BY grp ORDER BY doc_id""".stripMargin),
      (s, dir) => {
        graft.functions.NormalizeFunctions.register(s)
        val base = t(s, dir, "documents").select(col("doc_id"), col("text"))
        val comp = base.select(col("doc_id").as("id"),
          col("doc_id").as("grp"),
          concat(col("text"), lit(" caf\u00E9")).as("t"))
        val deco = base.select((col("doc_id") + 100000).as("id"),
          col("doc_id").as("grp"),
          concat(col("text"), lit(" cafe\u0301")).as("t"))
        val nfcKey = md5(encode(
          graft.functions.NormalizeFunctions.normalize(col("t"), "NFC"),
          "UTF-8"))
        comp.unionByName(deco)
          .groupBy("grp")
          .agg(min(col("id")).as("keeper"),
            countDistinct(md5(encode(col("t"), "UTF-8"))).as("n_raw_keys"),
            countDistinct(nfcKey).as("n_nfc_keys"),
            min(nfcKey).as("nfc_key"))
          .select(col("grp").as("doc_id"), col("keeper"),
            col("n_raw_keys"), col("n_nfc_keys"), col("nfc_key"))
          .orderBy("doc_id")
      }),

    QueryDef("q86_bigram_lm_ln",
      "ln-space bigram LM scoring (the KenLM-shipping form of q74): " +
        "per bigram ln P(w2|w1) = ln(c12+1) - ln(c1+V), per document " +
        "the mean log-probability and its perplexity exp(-mean). Same " +
        "count/join subtree as q74 (two vocab-keyed shuffles, 1-row " +
        "vocab broadcast) — only the per-bigram projection and final " +
        "aggregate differ. Float-valued by construction, so both sides " +
        "round to 6 dp before the hash compare (the q36 convention); " +
        "double-sum association differences vanish at that precision.",
      Some("""WITH toks AS (SELECT doc_id,
             |    regexp_extract_all(lower(text), '[a-z]+') AS w FROM documents),
             |uni AS (SELECT w1, COUNT(*) AS c1 FROM (
             |    SELECT unnest(w) AS w1 FROM toks) GROUP BY w1),
             |v AS (SELECT COUNT(*) AS vs FROM uni),
             |bg AS (SELECT doc_id, u.w1 AS w1, u.w2 AS w2 FROM (
             |    SELECT doc_id, unnest([{'w1': w[i], 'w2': w[i+1]}
             |      for i in range(1, len(w))]) AS u FROM toks)),
             |big AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY w1, w2),
             |per AS (SELECT doc_id, ln(c12 + 1.0) - ln(c1 + vs) AS lnp
             |  FROM bg JOIN big USING (w1, w2) JOIN uni USING (w1) CROSS JOIN v),
             |sc AS (SELECT doc_id, COUNT(*) AS nb, SUM(lnp) AS sl
             |  FROM per GROUP BY doc_id)
             |SELECT t.doc_id, CAST(COALESCE(sc.nb, 0) AS INTEGER) AS n_bigrams,
             |  ROUND(sc.sl / sc.nb, 6) AS avg_ln_p,
             |  ROUND(exp(-(sc.sl / sc.nb)), 6) AS perplexity
             |FROM toks t LEFT JOIN sc ON t.doc_id = sc.doc_id
             |ORDER BY t.doc_id""".stripMargin),
      (s, dir) =>
        TextOps.bigramLmScoresLn(t(s, dir, "documents"), "doc_id", "text")
          .select(col("doc_id"), col("n_bigrams"),
            round(col("avg_ln_p"), 6).as("avg_ln_p"),
            round(col("perplexity"), 6).as("perplexity"))
          .orderBy("doc_id")),

    QueryDef("q87_bm25",
      "BM25 relevance scoring (k1=1.2, b=0.75, the Lucene +1-in-the-ln " +
        "IDF): q62's integer TF-IDF upgraded with term-frequency " +
        "saturation and document-length normalization against the " +
        "corpus mean length — the ranking function retrieval-based " +
        "curation and RAG indexing actually ship. tf touches only " +
        "term-matching rows; df and the (N, avgdl) scalars broadcast; " +
        "the length join is co-keyed on doc_id. Float-valued -> both " +
        "sides round to 6 dp (q36 convention); every matching doc is " +
        "output ordered by id, so no top-k boundary rides on float " +
        "rounding.",
      Some("""WITH lens AS (SELECT doc_id,
             |    len(regexp_extract_all(lower(text), '[a-z]+')) AS dl
             |  FROM documents),
             |stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             |    AVG(dl) AS avgdl FROM lens),
             |tok AS (SELECT doc_id,
             |    unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
             |  FROM documents),
             |tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM tok
             |  WHERE w IN ('vector', 'merge', 'stream') GROUP BY doc_id, w),
             |dfr AS (SELECT w, CAST(COUNT(*) AS DOUBLE) AS df
             |  FROM tf GROUP BY w)
             |SELECT tf.doc_id,
             |  ROUND(SUM(ln((n - df + 0.5) / (df + 0.5) + 1.0)
             |    * (tf * (1.2 + 1.0)
             |       / (tf + 1.2 * ((1.0 - 0.75) + 0.75 * (dl / avgdl))))), 6)
             |    AS score
             |FROM tf JOIN dfr USING (w) CROSS JOIN stats
             |  JOIN lens ON tf.doc_id = lens.doc_id
             |GROUP BY tf.doc_id ORDER BY tf.doc_id""".stripMargin),
      (s, dir) =>
        TextOps.bm25Scores(t(s, dir, "documents"), "doc_id", "text",
            Seq("vector", "merge", "stream"))
          .select(col("doc_id"), round(col("score"), 6).as("score"))
          .orderBy("doc_id")),

    QueryDef("q88_hybrid_rrf",
      "Hybrid ranking by Reciprocal-Rank Fusion (Cormack et al. 2009, " +
        "k0=60): the q87 BM25 lexical ranking fused with the q74 " +
        "integer-ppm LM quality prior — the standard hybrid-retrieval " +
        "composition that needs no calibration between incomparable " +
        "score scales. Each side reduces to its bounded top-100 FIRST " +
        "(TakeOrdered), so rank windows and the full-outer fuse join " +
        "touch <= 100 rows; ranks assign on the 6-dp-ROUNDED BM25 " +
        "score (ties to lower id) so rank selection cannot flip on " +
        "engine float ulps. Output: every doc in either list with its " +
        "ranks and fused score.",
      Some("""WITH lens AS (SELECT doc_id,
             |    len(regexp_extract_all(lower(text), '[a-z]+')) AS dl
             |  FROM documents),
             |stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             |    AVG(dl) AS avgdl FROM lens),
             |tok AS (SELECT doc_id,
             |    unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
             |  FROM documents),
             |tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM tok
             |  WHERE w IN ('vector', 'merge', 'stream') GROUP BY doc_id, w),
             |dfr AS (SELECT w, CAST(COUNT(*) AS DOUBLE) AS df
             |  FROM tf GROUP BY w),
             |bm AS (SELECT tf.doc_id,
             |    ROUND(SUM(ln((n - df + 0.5) / (df + 0.5) + 1.0)
             |      * (tf * (1.2 + 1.0)
             |         / (tf + 1.2 * ((1.0 - 0.75) + 0.75 * (dl / avgdl))))), 6)
             |      AS score
             |  FROM tf JOIN dfr USING (w) CROSS JOIN stats
             |    JOIN lens ON tf.doc_id = lens.doc_id
             |  GROUP BY tf.doc_id),
             |uni AS (SELECT w1, COUNT(*) AS c1 FROM (
             |    SELECT unnest(w) AS w1 FROM (SELECT doc_id,
             |      regexp_extract_all(lower(text), '[a-z]+') AS w
             |      FROM documents)) GROUP BY w1),
             |v AS (SELECT COUNT(*) AS vs FROM uni),
             |bg AS (SELECT doc_id, u.w1 AS w1, u.w2 AS w2 FROM (
             |    SELECT doc_id, unnest([{'w1': w[i], 'w2': w[i+1]}
             |      for i in range(1, len(w))]) AS u FROM (SELECT doc_id,
             |      regexp_extract_all(lower(text), '[a-z]+') AS w
             |      FROM documents))),
             |big AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY w1, w2),
             |per AS (SELECT doc_id,
             |    (1000000 * (c12 + 1)) // (c1 + vs) AS ppm
             |  FROM bg JOIN big USING (w1, w2) JOIN uni USING (w1) CROSS JOIN v),
             |lm AS (SELECT doc_id, CAST(SUM(ppm) // COUNT(*) AS BIGINT)
             |    AS score FROM per GROUP BY doc_id),
             |ra AS (SELECT doc_id, CAST(row_number() OVER (
             |      ORDER BY score DESC, doc_id) AS INTEGER) AS rank_a
             |  FROM (SELECT * FROM bm ORDER BY score DESC, doc_id LIMIT 100)),
             |rb AS (SELECT doc_id, CAST(row_number() OVER (
             |      ORDER BY score DESC, doc_id) AS INTEGER) AS rank_b
             |  FROM (SELECT * FROM lm ORDER BY score DESC, doc_id LIMIT 100))
             |SELECT COALESCE(ra.doc_id, rb.doc_id) AS doc_id,
             |  rank_a, rank_b,
             |  ROUND(COALESCE(1.0 / (60 + rank_a), 0.0)
             |      + COALESCE(1.0 / (60 + rank_b), 0.0), 6) AS rrf
             |FROM ra FULL OUTER JOIN rb ON ra.doc_id = rb.doc_id
             |ORDER BY doc_id""".stripMargin),
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val bm = TextOps.bm25Scores(docs, "doc_id", "text",
            Seq("vector", "merge", "stream"))
          .select(col("doc_id"), round(col("score"), 6).as("score"))
        val lm = TextOps.bigramLmScores(docs, "doc_id", "text")
          .filter(col("score_ppm").isNotNull)
          .select(col("doc_id"), col("score_ppm").as("score"))
        TextOps.rrfFuse(bm, lm, "doc_id")
          .select(col("doc_id"), col("rank_a"), col("rank_b"),
            round(col("rrf"), 6).as("rrf"))
          .orderBy("doc_id")
      }),

    QueryDef("q89_semantic_admit",
      "Streaming SEMANTIC admission, batch-replay form (the q64 " +
        "pattern in embedding space, and the composition the q81/q82 " +
        "persisted-index split exists for): vectors arrive in 4 ordered " +
        "micro-batches (batch = vec_id % 4); batch 1 bootstraps — " +
        "admit after in-batch dedup, train + persist the IVF-PQ index; " +
        "every later batch probes the STORED index (no training, no " +
        "corpus encode, candidates list-bounded) and is admitted only " +
        "where no stored embedding scores cosine >= 0.45 (SemDeDup's " +
        "criterion, online); admissions extend the code lists via " +
        "FAISS-style add-after-train. Per-batch cost is batch-scaled, " +
        "never corpus-scaled. k-means inside -> no SQL oracle (driver " +
        "rows-only); SemanticAdmitPipelineSpec pins the semantics: " +
        "stored dups die via the index, in-batch dups collapse, novel " +
        "vectors land AND become immediately screenable, restart " +
        "replays clean.",
      None,
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val sink = tempStore.freshSink(s, "semadmit", dir)
        (0 until 4).foreach { b =>
          graft.streaming.SemanticAdmitPipeline.admitBatch(sink,
            "sem_corpus", e.filter(col("vec_id") % 4 === b),
            "vec_id", "embedding", threshold = 0.45)
        }
        sink.read("sem_corpus")
          .select(col("vec_id"), (col("vec_id") % 4).as("batch"))
          .orderBy("vec_id")
      }),

    QueryDef("q90_ann_filtered",
      "FILTERED vector search over the persisted index (the serving " +
        "feature every vector store ships): the q81 build stores attr " +
        "columns ALONGSIDE the m-byte codes, and the probe's predicate " +
        "(label = 3 here) applies to the code-list scan itself — " +
        "reaching the parquet reader as a pushed filter, so candidates " +
        "prune BEFORE any scoring. PRE-filter semantics: the k results " +
        "are the best among MATCHING vectors (post-filtering a plain " +
        "top-k returns fewer than k, or none, under a selective " +
        "predicate). Approximate by design -> rows-only check; " +
        "SimOpsSpec pins predicate totality on the results and " +
        "recall >= 0.6 vs exact brute force over the filtered corpus.",
      None,
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val sink = tempStore.sink(s, "annidxf", dir)
        if (!SimOps.ivfPqIndexExists(sink))
          SimOps.buildIvfPqIndex(e, "vec_id", "embedding", sink,
            attrCols = Seq("label"))
        val q = e.filter(col("vec_id") % 100 === 0)
        SimOps.withRecallAudit(
            SimOps.ivfPqProbeIndex(q, e, "vec_id", "embedding", sink, 5,
              candidateFilter = Some(col("label") === 3)),
            // pre-filter ground truth: exact top-k among MATCHING vectors
            SimOps.bruteForceTopK(q, e.filter(col("label") === 3),
              "vec_id", "embedding", 5), 5)
          .orderBy("query_id", "rank")
      }),

    QueryDef("q91_int8_quantize",
      "INT8 scalar quantization of the embedding corpus (symmetric " +
        "absmax — the SQ8 codec vector stores and int8 inference " +
        "kernels use): per vector scale = 127/max|x|, q_i = " +
        "round(x_i*scale) as one signed byte — 4x smaller storage, " +
        "map-only, no shuffle. Zero vectors quantize to scale 0 and " +
        "all-zero codes. float->double promotion, round-half-away-" +
        "from-zero, and byte cast are step-identical across engines, " +
        "so the CODES hash-compare exactly; the scale column rounds " +
        "to 6 dp (display convention). Output convention (QueryDef " +
        "scaladoc): oracle-compared results carry no raw arrays, so " +
        "the codes travel as the comma-joined decimal string of the " +
        "byte sequence — still a byte-exact compare, one string per " +
        "vector.",
      Some("""WITH a AS (SELECT vec_id, embedding,
             |    CAST(list_max(list_transform(embedding, x -> abs(x)))
             |         AS DOUBLE) AS am
             |  FROM embeddings)
             |SELECT vec_id,
             |  ROUND(CASE WHEN am = 0 OR am IS NULL THEN 0.0
             |             ELSE 127.0 / am END, 6) AS scale,
             |  array_to_string(CASE WHEN am = 0 OR am IS NULL
             |       THEN list_transform(embedding, x -> CAST(0 AS TINYINT))
             |       ELSE list_transform(embedding,
             |              x -> CAST(round(x * (127.0 / am)) AS TINYINT)) END,
             |    ',') AS q
             |FROM a ORDER BY vec_id""".stripMargin),
      (s, dir) =>
        SimOps.int8Quantize(t(s, dir, "embeddings"), "vec_id", "embedding")
          .withColumn("q", array_join(col("q"), ","))
          .orderBy("vec_id")),

    QueryDef("q92_bpe_tokenize",
      "BPE subword tokenizer LEARNED from the corpus, then applied " +
        "back over it (Sennrich 2016; greedy lowest-rank apply as in " +
        "GPT-2's encoder). The ONLY corpus-scale job is the word-" +
        "frequency rollup (map-side-combined groupBy over the unicode " +
        "tokenizer); 200 merges then learn from the collected frequency " +
        "dictionary — vocabulary-bounded (Heaps' law), capped at " +
        "maxWords with the dropped tail mass REPORTED, which is how " +
        "subword-nmt/HF-tokenizers/SentencePiece all learn. The encode " +
        "pass back over the corpus is map-only codegen, the merge " +
        "table riding the plan as a reference object. Iterative merge " +
        "selection -> no SQL oracle (driver rows-only); BpeOpsSpec " +
        "pins the merge loop on the hand-computable Sennrich " +
        "dictionary, greedy rank order on the encoder, the lossless " +
        "round-trip (tokens reconcatenate to the tokenized text) over " +
        "the real corpus, and the map-only encode plan.",
      None,
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val model = BpeOps.learnBpe(docs, "text", numMerges = 200)
        BpeOps.encode(docs, "text", model.merges)
          .select(col("doc_id"), col("n_tokens"),
            array_join(slice(col("bpe_tokens"), 1, 12), " ").as("head_tokens"))
          .orderBy("doc_id")
      }),

    QueryDef("q93_ann_sq8_probe",
      "SELF-CONTAINED index probe: the q81 build additionally stores " +
        "the corpus under SQ8 scalar quantization (ann_vecs8 — the q91 " +
        "codec, 1 byte per component), and the probe re-ranks its ADC " +
        "shortlist from those stored codes instead of fetching exact " +
        "float vectors from the corpus table. Cosine is scale-" +
        "invariant, so the codes alone carry the angle (fused " +
        "Int8Cosine, no dequantized array per row). The probe then " +
        "reads ONLY index tables — the serving path ships the index " +
        "directory alone, and refine I/O is 4x smaller. Approximate " +
        "by design -> rows-only check; SimOpsSpec pins shortlist " +
        "parity vs the exact-refine probe and recall vs brute force; " +
        "PlanShapeSpec pins that no corpus-table scan appears in the " +
        "probe plan.",
      None,
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val sink = tempStore.sink(s, "annidx8", dir)
        if (!SimOps.ivfPqIndexExists(sink))
          SimOps.buildIvfPqIndex(e, "vec_id", "embedding", sink,
            storeSq8 = true)
        val q = e.filter(col("vec_id") % 100 === 0)
        SimOps.withRecallAudit(
            SimOps.ivfPqProbeIndex(q, e, "vec_id", "embedding", sink, 5,
              refineFromSq8 = true),
            // index-tables-only ground truth: exhaustive scan of the
            // stored SQ8 codes — the probe's no-corpus-scan contract
            // holds through the audit
            SimOps.sq8BruteForceTopK(q, "vec_id", "embedding", sink, 5), 5)
          .orderBy("query_id", "rank")
      }),

    QueryDef("q94_lang_token_rollup",
      "Per-LANGUAGE corpus composition — the first statistic any " +
        "multilingual training-data pipeline reports: language-ID " +
        "(the q26 n-gram heuristic) composed with whitespace token " +
        "counting (q24) into a per-guess rollup (docs, total tokens, " +
        "mean tokens/doc, first doc id). One map-only scan derives " +
        "both signals per row, then one shuffle on the guess key with " +
        "map-side partial aggregation — composition costs nothing " +
        "beyond the q26 scan at any corpus scale.",
      Some {
        val (hitExprs, maxExpr, nWin, firstWin) = sqlLangPieces
        s"""WITH h AS (SELECT doc_id, $hitExprs,
           |    len(regexp_extract_all(text, '\\S+')) AS ntok
           |  FROM documents),
           |m AS (SELECT *, $maxExpr AS mx FROM h),
           |g AS (SELECT doc_id, ntok, CASE WHEN mx = 0 OR ($nWin) > 1
           |    THEN 'und' ELSE ($firstWin) END AS guess FROM m)
           |SELECT guess, COUNT(*) AS n_docs,
           |  CAST(SUM(ntok) AS BIGINT) AS total_tokens,
           |  CAST(SUM(ntok) AS BIGINT) // COUNT(*) AS mean_tokens,
           |  MIN(doc_id) AS first_doc
           |FROM g GROUP BY guess ORDER BY guess""".stripMargin
      },
      (s, dir) => t(s, dir, "documents")
        .select(TextOps.langId(col("text")).as("guess"),
          TextOps.tokenCount(col("text")).as("ntok"), col("doc_id"))
        .groupBy("guess")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("ntok")).as("total_tokens"),
          // integer `div`, not `/`: float division + cast could round
          // differently from DuckDB's exact `//` on a large-enough sum
          expr("sum(ntok) div count(1)").as("mean_tokens"),
          min(col("doc_id")).as("first_doc"))
        .orderBy("guess")),

    QueryDef("q95_classifier_train",
      "TRAIN the q79-shape hashed quality classifier on the engine " +
        "itself (the CCNet/fastText practice: the filter a pipeline " +
        "applies map-only at 100 TB is a LEARNED linear model): batch-" +
        "gradient logistic regression over hashed token-count " +
        "features, distilling the integer quality-gate rule " +
        "(label = quality_mil >= 500) into trained weights. Per " +
        "iteration: map-only margins (weights ride the plan as an " +
        "array literal, the exact q79 apply shape), ONE bucket-keyed " +
        "gradient shuffle with DECIMAL sums (deterministic at any " +
        "parallelism), a buckets-row collect. Output: per-doc label, " +
        "learned margin, prediction. Iterative float optimization -> " +
        "no SQL oracle (rows-only); ClassifierOpsSpec pins class " +
        "separation, parallelism-invariant determinism, and the " +
        "map-only apply plan.",
      None,
      (s, dir) => {
        val labeled = t(s, dir, "documents").withColumn("y",
          (TextOps.qualityScoreMil(col("text")) >= 500).cast("int"))
        val m = ClassifierOps.trainHashedClassifier(labeled, "text", "y",
          buckets = 1024, iters = 6)
        // margin computed ONCE: the aggregate HOF is interpreted-eval
        // (no whole-stage subexpression elimination), so repeating the
        // expression would run the full tokenize+hash+fold twice per row
        labeled.select(col("doc_id"), col("y"),
            m.margin(col("text")).as("__m"))
          .select(col("doc_id"), col("y"),
            round(col("__m"), 6).as("margin"),
            (col("__m") > 0).cast("int").as("pred"))
          .orderBy("doc_id")
      }),

    QueryDef("q96_interval_join",
      "INTERVAL (range-containment) join as a bucketed EQUI-join — " +
        "the range-join optimization OSS Spark lacks natively: " +
        "ts-BETWEEN-bounds planned directly is a nested-loop over " +
        "every (row, interval) pair. Here each event carries its one " +
        "time bucket, each interval explodes to the <=2 buckets it " +
        "overlaps, candidates meet in a hash equi-join on the bucket " +
        "id and the exact BETWEEN refines them — every qualifying " +
        "pair meets in exactly one bucket, so no dedup pass. The " +
        "query: +/-30-minute windows around sampled purchase events, " +
        "rolled up to per-window event counts and id bounds (integer-" +
        "exact output; PlanShapeSpec pins the no-nested-loop claim).",
      Some("""SELECT w.event_id AS window_id,
             |  COUNT(*) AS n_events,
             |  MIN(e.event_id) AS first_event,
             |  MAX(e.event_id) AS last_event
             |FROM (SELECT event_id,
             |        ts - INTERVAL 30 MINUTE AS w_start,
             |        ts + INTERVAL 30 MINUTE AS w_end
             |      FROM events
             |      WHERE event_type = 'purchase' AND event_id % 7 = 0) w
             |JOIN events e ON e.ts BETWEEN w.w_start AND w.w_end
             |GROUP BY window_id ORDER BY window_id""".stripMargin),
      (s, dir) => {
        val ev = t(s, dir, "events")
        val win = ev
          .filter(col("event_type") === "purchase" && col("event_id") % 7 === 0)
          .select(col("event_id").as("window_id"),
            (col("ts") - expr("INTERVAL 30 MINUTES")).as("w_start"),
            (col("ts") + expr("INTERVAL 30 MINUTES")).as("w_end"))
        RelOps.intervalJoin(ev, "ts", win, "w_start", "w_end",
            bucketWidthSec = 3600L)
          .groupBy("window_id")
          .agg(count(lit(1)).as("n_events"),
            min(col("event_id")).as("first_event"),
            max(col("event_id")).as("last_event"))
          .orderBy("window_id")
      }),

    QueryDef("q97_ann_drift",
      "Index DRIFT monitoring — the measurable signal behind 'rebuild " +
        "on drift is the owner's call' (q81/q89's add-after-train " +
        "contract): assign a fresh vector batch to inverted lists " +
        "under the STORED centroids and compare its list-share " +
        "distribution to the stored code lists' — per list, both " +
        "counts, exact integer ppm shares, and the absolute gap; " +
        "total variation = sum(gap_ppm)/2e6 drives the retrain alarm. " +
        "One aggregated scan of stored codes + one map-side batch " +
        "assignment; no training. k-means inside -> rows-only; " +
        "SimOpsSpec pins low self-drift vs high shifted-batch drift.",
      None,
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val sink = tempStore.sink(s, "annidx", dir)
        if (!SimOps.ivfPqIndexExists(sink))
          SimOps.buildIvfPqIndex(e, "vec_id", "embedding", sink)
        SimOps.ivfIndexDriftStats(e.filter(col("vec_id") % 3 === 0),
            "vec_id", "embedding", sink)
          .orderBy("list")
      }),

    QueryDef("q98_diverse_select",
      "CORESET / diversity selection — the SELECTION counterpart of " +
        "q75's SemDeDup deletion (k-center greedy / farthest-first per " +
        "trained cluster; Gonzalez 1985, Sener & Savarese ICLR 2018): " +
        "keep the 5 most diverse representatives of each of 8 " +
        "clusters instead of deleting near-dups. One deterministic " +
        "quantizer training, map-side assignment, one cluster-keyed " +
        "shuffle into per-cluster in-memory greedy (O(k*|cluster|*dim) " +
        "per cluster; |cluster| held constant by growing nlist with " +
        "the corpus — the q75 posture). Deterministic at any " +
        "parallelism: seed = min id, ties to the smaller id. k-means " +
        "inside -> rows-only; SimOpsSpec pins diversity-beats-" +
        "redundancy on planted geometry, per-cluster sizes, and " +
        "partition invariance.",
      None,
      (s, dir) =>
        SimOps.diverseSelect(t(s, dir, "embeddings"), "vec_id",
            "embedding", k = 5, nlist = 8)
          .orderBy("cluster", "rank")),

    QueryDef("q99_model_serve",
      "SERVING path for persisted models — the train-once/apply-" +
        "everywhere split a 100 TB deployment actually runs (q92/q95 " +
        "pay training inside the query; a production pipeline trains " +
        "per corpus GENERATION and applies from stored coefficients " +
        "everywhere else): loadModel the stored BPE merges and the " +
        "trained classifier weights and apply BOTH in one map-only " +
        "pass over the corpus — subword tokens + token count from the " +
        "codegen BpeEncode (merge table rides the plan), quality " +
        "margin/keep from the q79-shape hashed-weights HOF. The " +
        "models bootstrap through the sink on first invocation (same " +
        "guard shape as q81-probe's build) and load on every " +
        "subsequent one; the apply stage itself reads NOTHING but the " +
        "corpus — driver-side coefficients, no training job, no " +
        "shuffle before the output sort. Trained coefficients inside " +
        "-> rows-only; BpeOpsSpec/ClassifierOpsSpec pin stored-model " +
        "round-trips, CatalogSpec pins serve ≡ train-in-query parity, " +
        "PlanShapeSpec pins the no-shuffle no-UDF apply plan.",
      None,
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val sink = tempStore.sink(s, "models", dir)
        if (!BpeOps.modelExists(sink))
          BpeOps.saveModel(sink, BpeOps.learnBpe(docs, "text", numMerges = 200))
        if (!ClassifierOps.modelExists(sink))
          ClassifierOps.saveModel(sink, ClassifierOps.trainHashedClassifier(
            docs.withColumn("y",
              (TextOps.qualityScoreMil(col("text")) >= 500).cast("int")),
            "text", "y", buckets = 1024, iters = 6))
        val bpe = BpeOps.loadModel(sink)
        val clf = ClassifierOps.loadModel(sink)
        // margin aliased ONCE then referenced twice: CollapseProject
        // keeps non-cheap multi-referenced aliases, so the tokenize+
        // hash+fold HOF runs once per row, not once per output column
        BpeOps.encode(docs, "text", bpe.merges)
          .select(col("doc_id"), col("n_tokens"),
            array_join(slice(col("bpe_tokens"), 1, 8), " ").as("head_tokens"),
            clf.margin(col("text")).as("__m"))
          .select(col("doc_id"), col("n_tokens"), col("head_tokens"),
            round(col("__m"), 6).as("margin"),
            (col("__m") > 0).cast("int").as("keep"))
          .orderBy("doc_id")
      }),

    QueryDef("q100_retention_sweep",
      "PK DELETE + rebucket as an ORACLE-CHECKED lifecycle — the " +
        "retention/right-to-erasure sweep a 100 TB store actually " +
        "runs, end-to-end through the sink: load the corpus into the " +
        "bucketed store, DELETE every key the q25 quality gate fails " +
        "(rewriting only touched buckets — O(batch), never O(table)), " +
        "compact the now-smaller table to a narrower modulus " +
        "(rebucket under the atomic shadow swap), and read the " +
        "survivors back. Content must equal a pure anti-join over the " +
        "source — which makes the sink's physical delete/rebucket " +
        "machinery answer to a DuckDB oracle instead of only its own " +
        "specs. The store is rebuilt fresh per invocation so replays " +
        "are deterministic.",
      Some(s"""SELECT doc_id, length(text) AS n_chars
             |FROM documents
             |WHERE $sqlQualityMil >= 500
             |ORDER BY doc_id""".stripMargin),
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val sink = tempStore.freshSink(s, "retain", dir)
        sink.merge("corpus", docs.select(col("doc_id"), col("text")),
          Seq("doc_id"), pkUnique = true)
        sink.delete("corpus",
          docs.filter(TextOps.qualityScoreMil(col("text")) < 500)
            .select("doc_id"),
          Seq("doc_id"))
        sink.rebucket("corpus", Seq("doc_id"), newBuckets = 4)
        sink.read("corpus")
          .select(col("doc_id"), length(col("text")).as("n_chars"))
          .orderBy("doc_id")
      }),

    QueryDef("q101_repetition",
      "In-document REPETITION signals — the Gopher/MassiveText " +
        "repetition-filter family (duplicate-line fraction, " +
        "duplicate-word fraction, share of the most frequent word " +
        "bigram): machine-generated and boilerplate text repeats " +
        "itself, and these are the standard cheap screens a curation " +
        "pipeline runs before anything model-based. All three are " +
        "map-only per-mille integers; the dominant-bigram share uses " +
        "the O(n) codegen TopCountShareMil hash pass where builtins " +
        "would cost O(n²) per document (HOF count-by-filter) or two " +
        "corpus-scale shuffles (explode + double aggregate). Exact " +
        "integer oracle.",
      Some("""WITH l AS (SELECT doc_id,
             |    list_filter([trim(x) for x in str_split(text, chr(10))],
             |                x -> x <> '') AS ls,
             |    regexp_extract_all(lower(text), '[a-z]+') AS ws
             |  FROM documents),
             |b AS (SELECT doc_id, ls, ws,
             |    CASE WHEN len(ws) < 2 THEN CAST([] AS VARCHAR[])
             |      ELSE [ws[i] || ' ' || ws[i+1] for i in range(1, len(ws))]
             |    END AS bg
             |  FROM l)
             |SELECT doc_id,
             |  CAST(floor(1000 * (len(ls) - len(list_distinct(ls)))
             |       / greatest(len(ls), 1)) AS BIGINT) AS dup_line_mil,
             |  CAST(floor(1000 * (len(ws) - len(list_distinct(ws)))
             |       / greatest(len(ws), 1)) AS BIGINT) AS dup_word_mil,
             |  CAST(CASE WHEN len(bg) = 0 THEN 0
             |       ELSE 1000 * list_max([len(list_filter(bg, y -> y = x))
             |                             for x in bg]) // len(bg)
             |       END AS BIGINT) AS top_bigram_mil
             |FROM b ORDER BY doc_id""".stripMargin),
      (s, dir) => {
        graft.functions.RepetitionFunctions.register(s)
        t(s, dir, "documents")
          .select(col("doc_id"),
            TextOps.dupLineRatioMil(col("text")).as("dup_line_mil"),
            TextOps.dupWordRatioMil(col("text")).as("dup_word_mil"),
            TextOps.topBigramShareMil(col("text")).as("top_bigram_mil"))
          .orderBy("doc_id")
      }),

    QueryDef("q102_dsir_select",
      "DSIR targeted selection, integer fixed-point form (Xie et al. " +
        "2023): fit hashed-ngram histograms on a small target sample " +
        "(every 11th doc) and on the raw pool (corpus MINUS the target " +
        "rows, by id — the documented in-pool convention), then score " +
        "every document's mean per-mille target affinity. The bucket " +
        "hash is md5-stable and the Laplace posterior is floor-divided " +
        "per-mille, so DuckDB reproduces every score bit-for-bit. " +
        "Plan: two bucket-BOUNDED histograms (<= 512 keys, map-side " +
        "combinable), then ONE map-only scoring scan with the affinity " +
        "table riding the plan as a single array literal — no shuffle " +
        "downstream of the histograms, no UDF.",
      Some("""WITH g AS (SELECT doc_id, doc_id % 11 = 0 AS tgt,
             |    regexp_extract_all(lower(text), '[a-z]+') AS ws
             |  FROM documents),
             |gr AS (SELECT doc_id, tgt, ws || CASE WHEN len(ws) < 2
             |      THEN CAST([] AS VARCHAR[])
             |      ELSE [ws[i] || ' ' || ws[i+1] for i in range(1, len(ws))]
             |    END AS grams
             |  FROM g),
             |occ AS (SELECT doc_id, tgt,
             |    CAST(concat('0x', substr(md5(unnest(grams)), 1, 15))
             |      AS BIGINT) % 512 AS b
             |  FROM gr),
             |ht AS (SELECT b, COUNT(*) AS ct FROM occ WHERE tgt GROUP BY b),
             |hr AS (SELECT b, COUNT(*) AS cr FROM occ WHERE NOT tgt GROUP BY b),
             |aff AS (SELECT doc_id,
             |    (1000 * (COALESCE(ct, 0) + 1))
             |      // (COALESCE(ct, 0) + COALESCE(cr, 0) + 2) AS a
             |  FROM occ LEFT JOIN ht USING (b) LEFT JOIN hr USING (b)),
             |sc AS (SELECT doc_id, COUNT(*) AS n, SUM(a) AS sa
             |  FROM aff GROUP BY doc_id)
             |SELECT d.doc_id, CAST(COALESCE(sc.n, 0) AS INTEGER) AS n_grams,
             |  CAST(sc.sa // sc.n AS BIGINT) AS dsir_mil
             |FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id
             |ORDER BY d.doc_id""".stripMargin),
      (s, dir) => {
        val docs = t(s, dir, "documents")
        SelectOps.dsirAffinityMil(docs,
            docs.filter(col("doc_id") % 11 === 0),
            "doc_id", "text", buckets = 512)
          .orderBy("doc_id")
      }),

    QueryDef("q103_perplexity_tiers",
      "CCNet perplexity bucketing, exact ORACLE form (Wenzek et al. " +
        "2020): language-ID + the q74 corpus-trained integer bigram-LM " +
        "score, then ntile(3) per language over (score desc, id) — " +
        "head = most fluent third, the tier downstream mixing " +
        "oversamples. Tie rule: ntile splits equal scores by id (both " +
        "engines order identically, so the split is deterministic). " +
        "This exact form is single-reducer-per-language by design; the " +
        "100 TB path is perplexityBucketsByThreshold (broadcast " +
        "per-language cutoffs, map-side tiers, no window) — " +
        "plan-pinned in PlanShapeSpec, agreement spec-pinned in " +
        "SelectOpsSpec, and both consume ONE shared LM pass via " +
        "perplexityScored.",
      Some {
        val (hitExprs, maxExpr, nWin, firstWin) = sqlLangPieces
        s"""WITH toks AS (SELECT doc_id,
           |    regexp_extract_all(lower(text), '[a-z]+') AS w FROM documents),
           |uni AS (SELECT w1, COUNT(*) AS c1 FROM (
           |    SELECT unnest(w) AS w1 FROM toks) GROUP BY w1),
           |v AS (SELECT COUNT(*) AS vs FROM uni),
           |bg AS (SELECT doc_id, u.w1 AS w1, u.w2 AS w2 FROM (
           |    SELECT doc_id, unnest([{'w1': w[i], 'w2': w[i+1]}
           |      for i in range(1, len(w))]) AS u FROM toks)),
           |big AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY w1, w2),
           |per AS (SELECT doc_id,
           |    (1000000 * (c12 + 1)) // (c1 + vs) AS ppm
           |  FROM bg JOIN big USING (w1, w2) JOIN uni USING (w1) CROSS JOIN v),
           |sc AS (SELECT doc_id, COUNT(*) AS nb, SUM(ppm) AS sp
           |  FROM per GROUP BY doc_id),
           |h AS (SELECT doc_id, $hitExprs FROM documents),
           |m AS (SELECT *, $maxExpr AS mx FROM h),
           |lg AS (SELECT doc_id, CASE WHEN mx = 0 OR ($nWin) > 1
           |    THEN 'und' ELSE ($firstWin) END AS lang FROM m),
           |s2 AS (SELECT sc.doc_id, lg.lang,
           |    CAST(sc.sp // sc.nb AS BIGINT) AS score_ppm
           |  FROM sc JOIN lg ON sc.doc_id = lg.doc_id WHERE sc.nb >= 1),
           |nt AS (SELECT doc_id, lang, score_ppm,
           |    ntile(3) OVER (PARTITION BY lang
           |      ORDER BY score_ppm DESC, doc_id) AS t FROM s2)
           |SELECT doc_id, lang, score_ppm,
           |  CASE t WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
           |    ELSE 'tail' END AS ppl_bucket
           |FROM nt ORDER BY doc_id""".stripMargin
      },
      (s, dir) =>
        SelectOps.perplexityBuckets(t(s, dir, "documents"), "doc_id", "text")
          .orderBy("doc_id")),

    QueryDef("q104_domain_topk",
      "Embedding domain-centroid selection — the embedding-space " +
        "analogue of q102's DSIR (DsDm-style retrieval curation): rank " +
        "the pool by cosine to the target sample's centroid, keep the " +
        "top 100. The centroid is quantized to exact fixed point " +
        "(floor(v*1000) sums, floor division, /1000 -> float) so both " +
        "engines derive the IDENTICAL vector; cosine then follows the " +
        "q33 round-to-6dp convention. Plan: one dim-BOUNDED centroid " +
        "aggregate (<= 64 keys), then a map-only codegen dot-product " +
        "scan with the centroid as a plan literal, and (cosine desc, " +
        "id) top-k via TakeOrderedAndProject — no global sort, no " +
        "per-row shuffle, driver state corpus-size-independent.",
      Some(s"""WITH tgt AS (SELECT embedding AS e FROM embeddings
             |  WHERE vec_id % 25 = 0),
             |dims AS (SELECT unnest(range(1,
             |    (SELECT max(len(e)) FROM tgt) + 1)) AS d),
             |cs AS (SELECT d,
             |    SUM(CAST(floor(CAST(e[d] AS DOUBLE) * 1000) AS BIGINT)) AS s,
             |    COUNT(*) AS n
             |  FROM tgt, dims WHERE d <= len(e) GROUP BY d),
             |cent AS (SELECT list(CAST(
             |      CAST(CAST(floor(CAST(s AS DOUBLE) / n) AS BIGINT) AS DOUBLE)
             |        / CAST(1000 AS DOUBLE) AS FLOAT) ORDER BY d) AS c
             |  FROM cs),
             |p AS (SELECT vec_id,
             |    round(${sqlCosine("embeddings.embedding", "cent.c")}, 6)
             |      AS cosine
             |  FROM embeddings, cent)
             |SELECT vec_id, cosine FROM p
             |ORDER BY cosine DESC, vec_id LIMIT 100""".stripMargin),
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        SelectOps.domainTopK(e, e.filter(col("vec_id") % 25 === 0),
          "vec_id", "embedding", k = 100)
      }),

    QueryDef("q105_drift_rebuild",
      "The FULL index-maintenance arc as one query — q97's drift " +
        "monitoring closed into the drift->rebuild->probe lifecycle " +
        "(the q100 pattern applied to the ANN index): build the IVF-PQ " +
        "index, measure a self-sample batch (stable: rebuild must NOT " +
        "fire — the stable path costs one aggregated code scan + one " +
        "map-side batch assignment, nothing corpus-scale), then ingest " +
        "a mode-collapsed batch (every vector one direction — the " +
        "unambiguous retrain signal), rebuild from the grown corpus " +
        "under the sink's atomic shadow swap, and serve probes off the " +
        "rebuilt index. Both DriftDecisions ride the output as audit " +
        "columns so the harness sees the arc, not just the probes. " +
        "k-means + approximate probes inside -> rows-only; " +
        "SimOpsSpec pins the stable/drifted/swap semantics, " +
        "PlanShapeSpec pins the no-corpus-scan stable path.",
      None,
      (s, dir) => {
        val e = t(s, dir, "embeddings").select("vec_id", "embedding")
        val sink = tempStore.freshSink(s, "driftrb", dir)
        SimOps.buildIvfPqIndex(e, "vec_id", "embedding", sink)
        val stable = SimOps.rebuildIfDrifted(
          e.filter(col("vec_id") % 3 === 0), e, "vec_id", "embedding", sink)
        val batch = e.filter(col("vec_id") % 3 === 1)
          .select((col("vec_id") + lit(10000000L)).as("vec_id"),
            transform(col("embedding"), x => x * lit(0.0f) + lit(0.37f))
              .as("embedding"))
        val corpus2 = e.unionByName(batch)
        val drifted = SimOps.rebuildIfDrifted(batch, corpus2,
          "vec_id", "embedding", sink)
        SimOps.ivfPqProbeIndex(e.filter(col("vec_id") % 100 === 0), corpus2,
            "vec_id", "embedding", sink, k = 3)
          .withColumn("stable_rebuilt", lit(if (stable.rebuilt) 1 else 0))
          .withColumn("drift_rebuilt", lit(if (drifted.rebuilt) 1 else 0))
          .withColumn("drift_tv_mil",
            lit((drifted.totalVariation * 1000).toLong))
          .orderBy("query_id", "rank")
      }),

    QueryDef("q106_dsir_resample",
      "DSIR's actual SELECTION step (Xie et al. 2023 §2): k draws " +
        "WITHOUT replacement with inclusion odds proportional to the " +
        "importance weights, via the Gumbel-max trick — each doc's key " +
        "is log_w + Gumbel(0,1) with the noise derived " +
        "deterministically from md5(id:seed), so the sample is fully " +
        "reproducible given (seed, corpus) yet statistically correct. " +
        "Float log-weights inside -> rows-only; SelectOpsSpec pins " +
        "seeded determinism and weight-monotone inclusion (in-domain " +
        "docs dominate across seeds). Plan: two bounded histograms " +
        "driver-side, then ONE map-only scoring scan + " +
        "TakeOrderedAndProject — resampling 100 TB never sorts " +
        "globally.",
      None,
      (s, dir) => {
        val docs = t(s, dir, "documents")
        SelectOps.dsirResample(docs, docs.filter(col("doc_id") % 11 === 0),
          "doc_id", "text", k = 50, seed = 42L, buckets = 512)
      }),

    QueryDef("q107_perplexity_scale",
      "The perplexity-bucketing 100 TB PATH as a driver-visible query " +
        "(q103 is the exact ntile oracle form): ONE LM pass " +
        "(perplexityScored, materialized), percentile_approx " +
        "per-language cutoffs (GK sketch — single-pass, mergeable; " +
        "#langs rows), then map-side tier assignment through a " +
        "BROADCAST cutoff join — no per-language window, no global " +
        "sort, the corpus never shuffles. Sketch-derived cutoffs have " +
        "no cross-engine oracle -> rows-only; CatalogSpec pins " +
        ">=80% tier agreement with q103's exact form on the real " +
        "corpus, PlanShapeSpec pins the broadcast/no-window/no-" +
        "recomputed-LM plan.",
      None,
      (s, dir) => {
        val scored = SelectOps
          .perplexityScored(t(s, dir, "documents"), "doc_id", "text")
          .localCheckpoint() // ONE LM pass feeds thresholds AND tiers
        SelectOps.perplexityBucketsByThresholdFromScored(scored, "doc_id",
            SelectOps.perplexityThresholdsFromScored(scored))
          .orderBy("doc_id")
      }),

    QueryDef("q108_curation_select",
      "The pretraining-data pipeline COMPOSED, end to end, under one " +
        "exact oracle: quality gate (q25's integer heuristic >= 500) " +
        "-> exact dedup (q28's fingerprint, min-id keeper via one " +
        "fp-keyed window) -> language filter (q26's deterministic " +
        "argmax = 'en') -> DSIR selection (q102's integer affinity, " +
        "target = every 11th surviving doc, histograms fit on the " +
        "SURVIVORS — selection composes after cleaning, as the papers " +
        "do) -> top-100 by (dsir_mil desc, id). Every stage is " +
        "integer/hash-exact, so the whole composition hash-matches " +
        "DuckDB — the integration check that the stages agree on " +
        "SHARED intermediate data, not just in isolation. Scale " +
        "shape: map-only gates, ONE corpus-scale shuffle (the " +
        "fingerprint window), two bounded histograms, map-only " +
        "scoring, TakeOrderedAndProject.",
      Some {
        val (hitExprs, maxExpr, nWin, firstWin) = sqlLangPieces
        s"""WITH q AS (SELECT doc_id, text FROM documents
           |  WHERE $sqlQualityMil >= 500),
           |fp AS (SELECT doc_id, text, row_number() OVER (
           |    PARTITION BY md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'))
           |    ORDER BY doc_id) AS rn FROM q),
           |d AS (SELECT doc_id, text FROM fp WHERE rn = 1),
           |h AS (SELECT doc_id, $hitExprs FROM d),
           |m AS (SELECT *, $maxExpr AS mx FROM h),
           |lg AS (SELECT doc_id, CASE WHEN mx = 0 OR ($nWin) > 1
           |    THEN 'und' ELSE ($firstWin) END AS lang FROM m),
           |en AS (SELECT d.doc_id, d.text FROM d
           |  JOIN lg ON d.doc_id = lg.doc_id WHERE lg.lang = 'en'),
           |g AS (SELECT doc_id, doc_id % 11 = 0 AS tgt,
           |    regexp_extract_all(lower(text), '[a-z]+') AS ws FROM en),
           |gr AS (SELECT doc_id, tgt, ws || CASE WHEN len(ws) < 2
           |      THEN CAST([] AS VARCHAR[])
           |      ELSE [ws[i] || ' ' || ws[i+1] for i in range(1, len(ws))]
           |    END AS grams
           |  FROM g),
           |occ AS (SELECT doc_id, tgt,
           |    CAST(concat('0x', substr(md5(unnest(grams)), 1, 15))
           |      AS BIGINT) % 512 AS b
           |  FROM gr),
           |ht AS (SELECT b, COUNT(*) AS ct FROM occ WHERE tgt GROUP BY b),
           |hr AS (SELECT b, COUNT(*) AS cr FROM occ WHERE NOT tgt GROUP BY b),
           |aff AS (SELECT doc_id,
           |    (1000 * (COALESCE(ct, 0) + 1))
           |      // (COALESCE(ct, 0) + COALESCE(cr, 0) + 2) AS a
           |  FROM occ LEFT JOIN ht USING (b) LEFT JOIN hr USING (b)),
           |sc AS (SELECT doc_id, COUNT(*) AS n, SUM(a) AS sa
           |  FROM aff GROUP BY doc_id)
           |SELECT doc_id, CAST(sc.n AS INTEGER) AS n_grams,
           |  CAST(sc.sa // sc.n AS BIGINT) AS dsir_mil
           |FROM sc
           |ORDER BY dsir_mil DESC, doc_id LIMIT 100""".stripMargin
      },
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val quality = docs
          .filter(TextOps.qualityScoreMil(col("text")) >= 500)
        val w = Window
          .partitionBy(TextOps.fingerprint(col("text")))
          .orderBy("doc_id")
        val kept = quality
          .withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1)
        val en = kept.filter(TextOps.langId(col("text")) === "en")
          .select("doc_id", "text")
        SelectOps.dsirAffinityMil(en,
            en.filter(col("doc_id") % 11 === 0),
            "doc_id", "text", buckets = 512)
          .filter(col("dsir_mil").isNotNull)
          .orderBy(col("dsir_mil").desc, col("doc_id"))
          .limit(100)
      }),

    QueryDef("q109_incremental_neardup",
      "INCREMENTAL near-dup admission — dedup a new batch against a " +
        "persisted archive WITHOUT re-shingling the archive (the only " +
        "dedup shape that works when the archive is 100 TB and the " +
        "batch is a day's crawl): the archive's MinHash band postings " +
        "+ shingle sets are built once into the store (one atomic " +
        "group write), then the probe broadcasts the batch's band " +
        "keys against the posting scan (map-only — the archive side " +
        "never shuffles), broadcasts the batch-bounded candidate set " +
        "against the shingle-set scan (map-only again), and " +
        "exact-verifies Jaccard >= 0.5 on candidates only. Oracle: " +
        "exhaustive archive x batch Jaccard (q29's recall argument — " +
        "planted dups sit at j >= 0.9, miss probability ~1e-15).",
      Some("""WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') w
             |  FROM documents),
             |sh AS (SELECT doc_id, CASE WHEN len(w) < 3
             |    THEN [array_to_string(w, ' ')]
             |    ELSE list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
             |                        for i in range(1, len(w) - 1)]) END AS s
             |  FROM toks),
             |p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
             |    CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
             |      / len(list_distinct(list_concat(a.s, b.s))) AS j
             |  FROM sh a JOIN sh b
             |    ON a.doc_id % 3 <> 0 AND b.doc_id % 3 = 0)
             |SELECT a_id, b_id, round(j, 4) AS jac FROM p
             |WHERE j >= 0.5 ORDER BY a_id, b_id""".stripMargin),
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val sink = tempStore.freshSink(s, "neardup", dir)
        TextOps.minhashStoreBuild(docs.filter(col("doc_id") % 3 =!= 0),
          "doc_id", "text", sink)
        TextOps.minhashStoreProbe(docs.filter(col("doc_id") % 3 === 0),
            "doc_id", "text", sink, threshold = 0.5)
          .orderBy("a_id", "b_id")
      }),

    QueryDef("q110_incremental_segdedup",
      "INCREMENTAL C4-style segment screen — q66's boilerplate removal " +
        "for a daily batch against a persisted archive inventory, " +
        "without re-tokenizing the archive: the store holds 16 bytes + " +
        "a count per distinct 25-word segment; the probe broadcasts " +
        "the batch's segment hashes against the inventory scan " +
        "(map-only — the store never shuffles, and unlike q66 there " +
        "is NO corpus-wide window: the archive's ordering work was " +
        "paid once at build), drops every batch segment the archive " +
        "has seen, and rebuilds the documents. Exact md5/integer " +
        "semantics end to end -> full DuckDB oracle.",
      Some("""WITH toks AS (SELECT doc_id,
             |    regexp_extract_all(lower(text), '[a-z]+') w FROM documents),
             |segl AS (SELECT doc_id,
             |    [{'i': i, 's': array_to_string(w[(i*25+1):(i*25+25)], ' ')}
             |     for i in range(0, CAST(ceil(len(w)/25.0) AS INTEGER))] AS ss
             |  FROM toks),
             |seg AS (SELECT doc_id, u.i AS seg_idx, u.s AS s
             |  FROM (SELECT doc_id, unnest(ss) AS u FROM segl)),
             |arch AS (SELECT DISTINCT md5(s) AS h FROM seg
             |  WHERE doc_id % 3 <> 0),
             |bat AS (SELECT doc_id, seg_idx, s FROM seg WHERE doc_id % 3 = 0),
             |keep AS (SELECT * FROM bat
             |  WHERE md5(s) NOT IN (SELECT h FROM arch)),
             |k AS (SELECT doc_id, CAST(count(*) AS INTEGER) AS n_kept,
             |    string_agg(s, ' ' ORDER BY seg_idx) AS text_kept
             |  FROM keep GROUP BY doc_id),
             |n AS (SELECT doc_id,
             |    CAST(COALESCE(ceil(len(w)/25.0), 0) AS INTEGER) AS n_segs
             |  FROM toks WHERE doc_id % 3 = 0)
             |SELECT n.doc_id, n.n_segs,
             |  COALESCE(k.n_kept, 0) AS n_kept,
             |  COALESCE(k.text_kept, '') AS text_kept
             |FROM n LEFT JOIN k USING (doc_id) ORDER BY doc_id""".stripMargin),
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val sink = tempStore.freshSink(s, "segdedup", dir)
        TextOps.segmentStoreBuild(docs.filter(col("doc_id") % 3 =!= 0),
          "doc_id", "text", sink)
        TextOps.segmentStoreProbe(docs.filter(col("doc_id") % 3 === 0),
            "doc_id", "text", sink)
          .orderBy("doc_id")
      }),

    QueryDef("q111_incremental_admission",
      "The COMPOSED incremental admission screen — the daily-crawl " +
        "operating mode at 100 TB, under ONE exact oracle: every " +
        "per-document gate (quality heuristic, exact dedup vs the " +
        "archive's fingerprint store, 25-word segment screen vs its " +
        "segment inventory, MinHash near-dup vs its band+shingle " +
        "store, language id) computed independently as audit columns, " +
        "`admitted` their conjunction. The archive is touched ONLY " +
        "through its three compact stores (built once here; amortized " +
        "across batches in production) — no archive text is " +
        "re-tokenized at screen time, every store-side join is a " +
        "map-only broadcast. Integer/hash-exact gates -> the whole " +
        "composition hash-matches DuckDB, including the near-dup " +
        "column (q29's LSH recall argument).",
      Some {
        val (hitExprs, maxExpr, nWin, firstWin) = sqlLangPieces
        s"""WITH b AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0),
           |a AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0),
           |h AS (SELECT doc_id, $sqlQualityMil AS quality_mil,
           |  $hitExprs FROM b),
           |m AS (SELECT *, $maxExpr AS mx FROM h),
           |lg AS (SELECT doc_id, quality_mil, CASE WHEN mx = 0 OR ($nWin) > 1
           |    THEN 'und' ELSE ($firstWin) END AS lang FROM m),
           |afp AS (SELECT DISTINCT
           |    md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp
           |  FROM a),
           |ex AS (SELECT doc_id, CASE WHEN
           |    md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'))
           |      IN (SELECT fp FROM afp) THEN 1 ELSE 0 END AS dup_exact
           |  FROM b),
           |toksall AS (SELECT doc_id,
           |    regexp_extract_all(lower(text), '[a-z]+') w FROM documents),
           |segl AS (SELECT doc_id,
           |    [{'i': i, 's': array_to_string(w[(i*25+1):(i*25+25)], ' ')}
           |     for i in range(0, CAST(ceil(len(w)/25.0) AS INTEGER))] AS ss
           |  FROM toksall),
           |seg AS (SELECT doc_id, u.i AS seg_idx, u.s AS s
           |  FROM (SELECT doc_id, unnest(ss) AS u FROM segl)),
           |archs AS (SELECT DISTINCT md5(s) AS hsh FROM seg
           |  WHERE doc_id % 3 <> 0),
           |batk AS (SELECT doc_id, count(*) FILTER (
           |      WHERE md5(s) NOT IN (SELECT hsh FROM archs)) AS kept
           |  FROM seg WHERE doc_id % 3 = 0 GROUP BY doc_id),
           |segk AS (SELECT t.doc_id,
           |    CAST(COALESCE(ceil(len(w)/25.0), 0) AS INTEGER) AS n_segs,
           |    CAST(COALESCE(batk.kept, 0) AS INTEGER) AS n_kept
           |  FROM toksall t LEFT JOIN batk USING (doc_id)
           |  WHERE t.doc_id % 3 = 0),
           |sh AS (SELECT doc_id, CASE WHEN len(w) < 3
           |    THEN [array_to_string(w, ' ')]
           |    ELSE list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
           |                        for i in range(1, len(w) - 1)]) END AS sss
           |  FROM toksall),
           |ndh AS (SELECT DISTINCT bsh.doc_id FROM sh ash JOIN sh bsh
           |  ON ash.doc_id % 3 <> 0 AND bsh.doc_id % 3 = 0
           |  AND CAST(len(list_intersect(ash.sss, bsh.sss)) AS DOUBLE)
           |      / len(list_distinct(list_concat(ash.sss, bsh.sss))) >= 0.5)
           |SELECT lg.doc_id, lg.quality_mil, lg.lang, ex.dup_exact,
           |  segk.n_segs, segk.n_kept,
           |  CASE WHEN ndh.doc_id IS NOT NULL THEN 1 ELSE 0 END AS neardup_hit,
           |  CASE WHEN lg.quality_mil >= 500 AND lg.lang = 'en'
           |       AND ex.dup_exact = 0 AND ndh.doc_id IS NULL
           |       THEN 1 ELSE 0 END AS admitted
           |FROM lg JOIN ex USING (doc_id) JOIN segk USING (doc_id)
           |  LEFT JOIN ndh USING (doc_id)
           |ORDER BY doc_id""".stripMargin
      },
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val sink = tempStore.freshSink(s, "admit111", dir)
        val archive = docs.filter(col("doc_id") % 3 =!= 0)
        TextOps.fingerprintStoreBuild(archive, "doc_id", "text", sink)
        TextOps.segmentStoreBuild(archive, "doc_id", "text", sink)
        TextOps.minhashStoreBuild(archive, "doc_id", "text", sink)
        TextOps.admissionScreen(docs.filter(col("doc_id") % 3 === 0),
            "doc_id", "text", sink)
          .orderBy("doc_id")
      }),

    QueryDef("q112_store_retention",
      "Inventory RETENTION as a lifecycle query (the q100/q105 pattern " +
        "applied to the segment store): build the archive's segment " +
        "inventory, COMPACT it to cnt >= 2 — at 100 TB the Zipfian " +
        "singleton tail is most of the rows and none of the screening " +
        "signal, and compaction preserves every screen at " +
        "minArchiveCount >= 2 exactly — then screen the batch at " +
        "minArchiveCount = 2 off the compacted store. The compaction " +
        "sizes ride every row as audit columns (inv_kept/inv_dropped) " +
        "so the harness grades the retention arithmetic, not just the " +
        "screen. Exact md5/integer semantics -> full DuckDB oracle.",
      Some("""WITH toks AS (SELECT doc_id,
             |    regexp_extract_all(lower(text), '[a-z]+') w FROM documents),
             |segl AS (SELECT doc_id,
             |    [{'i': i, 's': array_to_string(w[(i*25+1):(i*25+25)], ' ')}
             |     for i in range(0, CAST(ceil(len(w)/25.0) AS INTEGER))] AS ss
             |  FROM toks),
             |seg AS (SELECT doc_id, u.i AS seg_idx, u.s AS s
             |  FROM (SELECT doc_id, unnest(ss) AS u FROM segl)),
             |ac AS (SELECT md5(s) AS hsh, count(*) AS c FROM seg
             |  WHERE doc_id % 3 <> 0 GROUP BY md5(s)),
             |inv AS (SELECT CAST(count(*) FILTER (WHERE c >= 2) AS BIGINT)
             |      AS inv_kept,
             |    CAST(count(*) FILTER (WHERE c < 2) AS BIGINT) AS inv_dropped
             |  FROM ac),
             |archs AS (SELECT hsh FROM ac WHERE c >= 2),
             |batk AS (SELECT doc_id, count(*) FILTER (
             |      WHERE md5(s) NOT IN (SELECT hsh FROM archs)) AS kept
             |  FROM seg WHERE doc_id % 3 = 0 GROUP BY doc_id),
             |segk AS (SELECT t.doc_id,
             |    CAST(COALESCE(ceil(len(w)/25.0), 0) AS INTEGER) AS n_segs,
             |    CAST(COALESCE(batk.kept, 0) AS INTEGER) AS n_kept
             |  FROM toks t LEFT JOIN batk USING (doc_id)
             |  WHERE t.doc_id % 3 = 0)
             |SELECT doc_id, n_segs, n_kept, inv_kept, inv_dropped
             |FROM segk, inv ORDER BY doc_id""".stripMargin),
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val sink = tempStore.freshSink(s, "segretain", dir)
        TextOps.segmentStoreBuild(docs.filter(col("doc_id") % 3 =!= 0),
          "doc_id", "text", sink)
        val (kept, dropped) = TextOps.segmentStoreCompact(sink, minCount = 2)
        TextOps.segmentStoreProbe(docs.filter(col("doc_id") % 3 === 0),
            "doc_id", "text", sink, minArchiveCount = 2)
          .drop("text_kept")
          .withColumn("inv_kept", lit(kept))
          .withColumn("inv_dropped", lit(dropped))
          .orderBy("doc_id")
      }),

    QueryDef("q113_incremental_embdup",
      "INCREMENTAL embedding near-dup — the q109 operating mode for the " +
        "EMBEDDING modality: the archive's LSH bucket postings + exact " +
        "vectors persist as one atomic group write; the probe " +
        "broadcasts the batch's signatures against the posting scan " +
        "and the batch-bounded candidate set against the vector scan " +
        "(both map-only — the archive never re-hashes, never " +
        "shuffles), then exact-cosine-verifies candidates at >= 0.45. " +
        "Oracle: exhaustive archive x batch cosine (q41's recall " +
        "argument — candidate recall 1.0 at these parameters).",
      Some(s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
             |p AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id,
             |    ${sqlCosine("a.embedding", "b.embedding")} AS c
             |  FROM e a JOIN e b
             |    ON a.vec_id % 3 <> 0 AND b.vec_id % 3 = 0)
             |SELECT a_id, b_id, round(c, 6) AS cosine FROM p
             |WHERE round(c, 6) >= 0.45 ORDER BY a_id, b_id""".stripMargin),
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val sink = tempStore.freshSink(s, "embdup", dir)
        SimOps.embLshStoreBuild(e.filter(col("vec_id") % 3 =!= 0),
          "vec_id", "embedding", sink)
        SimOps.embLshStoreProbe(e.filter(col("vec_id") % 3 === 0),
            "vec_id", "embedding", sink, threshold = 0.45)
          .orderBy("a_id", "b_id")
      }),

    QueryDef("q114_multimodal_admission",
      "The MULTIMODAL admission capstone: q111's text gates (quality, " +
        "exact dedup, segment screen, MinHash near-dup, langid) JOINED " +
        "with q113's embedding near-dup gate over the 1:1 " +
        "documents-embeddings pairing — a real pipeline dedups on BOTH " +
        "surface text and semantic similarity, because paraphrases " +
        "evade string dedup and templated text evades embedding " +
        "dedup. Every gate an independent audit column; `admitted` is " +
        "the full conjunction. The archive exists only as its FOUR " +
        "compact stores (fingerprints, segment inventory, MinHash " +
        "bands+shingles, embedding LSH postings+vectors); all probe " +
        "joins broadcast. Exact end to end -> one composed DuckDB " +
        "oracle across both tables.",
      Some {
        val (hitExprs, maxExpr, nWin, firstWin) = sqlLangPieces
        s"""WITH b AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0),
           |a AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0),
           |h AS (SELECT doc_id, $sqlQualityMil AS quality_mil,
           |  $hitExprs FROM b),
           |m AS (SELECT *, $maxExpr AS mx FROM h),
           |lg AS (SELECT doc_id, quality_mil, CASE WHEN mx = 0 OR ($nWin) > 1
           |    THEN 'und' ELSE ($firstWin) END AS lang FROM m),
           |afp AS (SELECT DISTINCT
           |    md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp
           |  FROM a),
           |ex AS (SELECT doc_id, CASE WHEN
           |    md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'))
           |      IN (SELECT fp FROM afp) THEN 1 ELSE 0 END AS dup_exact
           |  FROM b),
           |toksall AS (SELECT doc_id,
           |    regexp_extract_all(lower(text), '[a-z]+') w FROM documents),
           |segl AS (SELECT doc_id,
           |    [{'i': i, 's': array_to_string(w[(i*25+1):(i*25+25)], ' ')}
           |     for i in range(0, CAST(ceil(len(w)/25.0) AS INTEGER))] AS ss
           |  FROM toksall),
           |seg AS (SELECT doc_id, u.i AS seg_idx, u.s AS s
           |  FROM (SELECT doc_id, unnest(ss) AS u FROM segl)),
           |archs AS (SELECT DISTINCT md5(s) AS hsh FROM seg
           |  WHERE doc_id % 3 <> 0),
           |batk AS (SELECT doc_id, count(*) FILTER (
           |      WHERE md5(s) NOT IN (SELECT hsh FROM archs)) AS kept
           |  FROM seg WHERE doc_id % 3 = 0 GROUP BY doc_id),
           |segk AS (SELECT t.doc_id,
           |    CAST(COALESCE(ceil(len(w)/25.0), 0) AS INTEGER) AS n_segs,
           |    CAST(COALESCE(batk.kept, 0) AS INTEGER) AS n_kept
           |  FROM toksall t LEFT JOIN batk USING (doc_id)
           |  WHERE t.doc_id % 3 = 0),
           |sh AS (SELECT doc_id, CASE WHEN len(w) < 3
           |    THEN [array_to_string(w, ' ')]
           |    ELSE list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
           |                        for i in range(1, len(w) - 1)]) END AS sss
           |  FROM toksall),
           |ndh AS (SELECT DISTINCT bsh.doc_id FROM sh ash JOIN sh bsh
           |  ON ash.doc_id % 3 <> 0 AND bsh.doc_id % 3 = 0
           |  AND CAST(len(list_intersect(ash.sss, bsh.sss)) AS DOUBLE)
           |      / len(list_distinct(list_concat(ash.sss, bsh.sss))) >= 0.5),
           |emb AS (SELECT vec_id, embedding FROM embeddings),
           |edh AS (SELECT DISTINCT eb.vec_id AS doc_id
           |  FROM emb ea JOIN emb eb
           |  ON ea.vec_id % 3 <> 0 AND eb.vec_id % 3 = 0
           |  AND round(${sqlCosine("ea.embedding", "eb.embedding")}, 6)
           |      >= 0.45)
           |SELECT lg.doc_id, lg.quality_mil, lg.lang, ex.dup_exact,
           |  segk.n_segs, segk.n_kept,
           |  CASE WHEN ndh.doc_id IS NOT NULL THEN 1 ELSE 0 END AS neardup_hit,
           |  CASE WHEN edh.doc_id IS NOT NULL THEN 1 ELSE 0 END AS embdup_hit,
           |  CASE WHEN lg.quality_mil >= 500 AND lg.lang = 'en'
           |       AND ex.dup_exact = 0 AND ndh.doc_id IS NULL
           |       AND edh.doc_id IS NULL
           |       THEN 1 ELSE 0 END AS admitted
           |FROM lg JOIN ex USING (doc_id) JOIN segk USING (doc_id)
           |  LEFT JOIN ndh USING (doc_id) LEFT JOIN edh USING (doc_id)
           |ORDER BY doc_id""".stripMargin
      },
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val e = t(s, dir, "embeddings")
        val sink = tempStore.freshSink(s, "admit114", dir)
        val archive = docs.filter(col("doc_id") % 3 =!= 0)
        TextOps.fingerprintStoreBuild(archive, "doc_id", "text", sink)
        TextOps.segmentStoreBuild(archive, "doc_id", "text", sink)
        TextOps.minhashStoreBuild(archive, "doc_id", "text", sink)
        SimOps.embLshStoreBuild(e.filter(col("vec_id") % 3 =!= 0),
          "vec_id", "embedding", sink)
        val txt = TextOps.admissionScreen(
          docs.filter(col("doc_id") % 3 === 0), "doc_id", "text", sink)
        val embHits = SimOps.embLshStoreProbe(
            e.filter(col("vec_id") % 3 === 0), "vec_id", "embedding",
            sink, threshold = 0.45)
          .select(col("b_id").as("doc_id")).distinct()
          .withColumn("__ed", lit(1))
        txt.join(broadcast(embHits), Seq("doc_id"), "left")
          .select(col("doc_id"), col("quality_mil"), col("lang"),
            col("dup_exact"), col("n_segs"), col("n_kept"),
            col("neardup_hit"),
            coalesce(col("__ed"), lit(0)).as("embdup_hit"))
          .withColumn("admitted",
            (col("quality_mil") >= 500 && col("lang") === "en" &&
              col("dup_exact") === 0 && col("neardup_hit") === 0 &&
              col("embdup_hit") === 0).cast("int"))
          .orderBy("doc_id")
      }),

    QueryDef("q115_incremental_substrdedup",
      "INCREMENTAL arbitrary-offset substring dedup — q68's ExactSubstr " +
        "semantics against a PERSISTED archive: the archive's 20-token " +
        "window inventory (16-byte digest + count per DISTINCT window — " +
        "the per-position granularity the published suffix-array " +
        "implementation also pays, paid ONCE) is built into the store; " +
        "the probe broadcasts the batch's window digests over the " +
        "inventory scan (map-only — the archive is never re-tokenized " +
        "and never shuffles), the matched batch-bounded set broadcasts " +
        "back, and the span cut is the native map-only CutSpans walk. " +
        "NO window operator anywhere in the probe — the archive's " +
        "ordering work was paid at build. Output = q68's contract on " +
        "the batch. Oracle: exact window-membership replication.",
      Some("""WITH toks AS (SELECT doc_id,
             |    regexp_extract_all(lower(text), '[a-z]+') w FROM documents),
             |aw AS (SELECT DISTINCT u AS h FROM (
             |  SELECT unnest([md5(array_to_string(w[(i+1):(i+20)], ' '))
             |                 for i in range(0, len(w) - 19)]) AS u
             |  FROM toks WHERE doc_id % 3 <> 0)),
             |ex AS (SELECT doc_id, u.i AS pos, u.t AS tok, u.h AS h FROM (
             |  SELECT doc_id, unnest([{'i': i, 't': w[i+1],
             |      'h': CASE WHEN i <= len(w) - 20
             |        THEN md5(array_to_string(w[(i+1):(i+20)], ' ')) END}
             |    for i in range(0, len(w))]) u
             |  FROM toks WHERE doc_id % 3 = 0)),
             |mk AS (SELECT doc_id, pos, tok,
             |    CASE WHEN h IS NOT NULL AND h IN (SELECT h FROM aw)
             |      THEN 1 ELSE 0 END AS ds
             |  FROM ex),
             |cov AS (SELECT doc_id, pos, tok,
             |    sum(ds) OVER (PARTITION BY doc_id ORDER BY pos
             |      ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) > 0 AS covered
             |  FROM mk),
             |k AS (SELECT doc_id, CAST(count(*) AS INTEGER) AS n_tokens,
             |    CAST(count(*) FILTER (WHERE covered) AS INTEGER) AS n_removed,
             |    string_agg(tok, ' ' ORDER BY pos)
             |      FILTER (WHERE NOT covered) AS text_kept
             |  FROM cov GROUP BY doc_id)
             |SELECT d.doc_id, COALESCE(k.n_tokens, 0) AS n_tokens,
             |  COALESCE(k.n_removed, 0) AS n_removed,
             |  COALESCE(k.text_kept, '') AS text_kept
             |FROM (SELECT doc_id FROM documents WHERE doc_id % 3 = 0) d
             |LEFT JOIN k USING (doc_id)
             |ORDER BY doc_id""".stripMargin),
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val sink = tempStore.freshSink(s, "substrstore", dir)
        TextOps.substrStoreBuild(docs.filter(col("doc_id") % 3 =!= 0),
          "doc_id", "text", sink)
        TextOps.substrStoreProbe(docs.filter(col("doc_id") % 3 === 0),
            "doc_id", "text", sink)
          .orderBy("doc_id")
      }),

    QueryDef("q116_incremental_selection",
      "INCREMENTAL targeted selection — a persisted DSIR POLICY store: " +
        "the per-bucket affinity table (q102's integer fixed-point " +
        "form, Xie et al. 2023) is fit ONCE on the archive (target " +
        "sample = archive docs with id % 11 = 0, raw pool = archive " +
        "minus target by id) and persisted as 512 (bucket, aff_mil) " +
        "rows; a new batch is then scored + admission-gated WITHOUT " +
        "touching the archive at all — the store read is bounded (= " +
        "buckets rows, verified dense), and scoring is ONE map-only " +
        "codegen scan with the table riding the plan as a single " +
        "array literal. Completes the incremental-store family: dedup " +
        "stores screen what the archive has SEEN; the policy store " +
        "screens what the target DISTRIBUTION wants. Integer " +
        "arithmetic end to end -> bit-exact DuckDB oracle.",
      Some("""WITH g AS (SELECT doc_id,
             |    CASE WHEN doc_id % 3 <> 0 AND doc_id % 11 = 0 THEN 'tgt'
             |         WHEN doc_id % 3 <> 0 THEN 'raw' ELSE 'bat' END AS part,
             |    regexp_extract_all(lower(text), '[a-z]+') AS ws
             |  FROM documents),
             |gr AS (SELECT doc_id, part, ws || CASE WHEN len(ws) < 2
             |      THEN CAST([] AS VARCHAR[])
             |      ELSE [ws[i] || ' ' || ws[i+1] for i in range(1, len(ws))]
             |    END AS grams
             |  FROM g),
             |occ AS (SELECT doc_id, part,
             |    CAST(concat('0x', substr(md5(unnest(grams)), 1, 15))
             |      AS BIGINT) % 512 AS b
             |  FROM gr),
             |ht AS (SELECT b, COUNT(*) AS ct FROM occ WHERE part = 'tgt'
             |  GROUP BY b),
             |hr AS (SELECT b, COUNT(*) AS cr FROM occ WHERE part = 'raw'
             |  GROUP BY b),
             |aff AS (SELECT doc_id,
             |    (1000 * (COALESCE(ct, 0) + 1))
             |      // (COALESCE(ct, 0) + COALESCE(cr, 0) + 2) AS a
             |  FROM occ LEFT JOIN ht USING (b) LEFT JOIN hr USING (b)
             |  WHERE part = 'bat'),
             |sc AS (SELECT doc_id, COUNT(*) AS n, SUM(a) AS sa
             |  FROM aff GROUP BY doc_id)
             |SELECT d.doc_id, CAST(COALESCE(sc.n, 0) AS INTEGER) AS n_grams,
             |  CAST(sc.sa // sc.n AS BIGINT) AS dsir_mil,
             |  CAST(CASE WHEN sc.sa // sc.n >= 101 THEN 1 ELSE 0 END
             |    AS INTEGER) AS admitted
             |FROM (SELECT doc_id FROM documents WHERE doc_id % 3 = 0) d
             |LEFT JOIN sc USING (doc_id)
             |ORDER BY d.doc_id""".stripMargin),
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val sink = tempStore.freshSink(s, "selstore", dir)
        val archive = docs.filter(col("doc_id") % 3 =!= 0)
        SelectOps.selectionStoreBuild(archive,
          archive.filter(col("doc_id") % 11 === 0),
          "doc_id", "text", sink, buckets = 512)
        SelectOps.selectionStoreScore(
            docs.filter(col("doc_id") % 3 === 0), "doc_id", "text", sink,
            // the synthetic corpus's in-pool median (the target sample
            // is sparse, so absolute scores sit low): the gate must
            // actually SPLIT the batch for the audit column to mean
            // anything — 520 would admit nobody here
            minMil = 101L)
          .orderBy("doc_id")
      }),

    QueryDef("q117_curation_admission",
      "The GRAND admission capstone: every store-backed gate the " +
        "engine ships, composed over one batch under ONE exact " +
        "oracle — q114's gates (quality, langid, exact-dup " +
        "fingerprints, segment screen, MinHash near-dup, embedding " +
        "near-dup) PLUS the round's two new stores: the substring " +
        "WINDOW inventory (gate: >= 80% of tokens survive " +
        "arbitrary-offset span removal — heavy boilerplate overlap " +
        "rejects even when no whole segment matches) and the DSIR " +
        "selection POLICY (gate: target-affinity at or above the " +
        "pool median — dedup says UNSEEN, selection says WANTED; a " +
        "real curation pipeline requires both). The archive exists " +
        "only as its SIX compact stores; every probe join broadcasts; " +
        "the only window is the batch-side span-coverage frame. " +
        "Every gate rides as an independent audit column; `admitted` " +
        "is the full conjunction.",
      Some {
        val (hitExprs, maxExpr, nWin, firstWin) = sqlLangPieces
        s"""WITH b AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0),
           |a AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0),
           |h AS (SELECT doc_id, $sqlQualityMil AS quality_mil,
           |  $hitExprs FROM b),
           |m AS (SELECT *, $maxExpr AS mx FROM h),
           |lg AS (SELECT doc_id, quality_mil, CASE WHEN mx = 0 OR ($nWin) > 1
           |    THEN 'und' ELSE ($firstWin) END AS lang FROM m),
           |afp AS (SELECT DISTINCT
           |    md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp
           |  FROM a),
           |ex AS (SELECT doc_id, CASE WHEN
           |    md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'))
           |      IN (SELECT fp FROM afp) THEN 1 ELSE 0 END AS dup_exact
           |  FROM b),
           |toksall AS (SELECT doc_id,
           |    regexp_extract_all(lower(text), '[a-z]+') w FROM documents),
           |segl AS (SELECT doc_id,
           |    [{'i': i, 's': array_to_string(w[(i*25+1):(i*25+25)], ' ')}
           |     for i in range(0, CAST(ceil(len(w)/25.0) AS INTEGER))] AS ss
           |  FROM toksall),
           |seg AS (SELECT doc_id, u.i AS seg_idx, u.s AS s
           |  FROM (SELECT doc_id, unnest(ss) AS u FROM segl)),
           |archs AS (SELECT DISTINCT md5(s) AS hsh FROM seg
           |  WHERE doc_id % 3 <> 0),
           |batk AS (SELECT doc_id, count(*) FILTER (
           |      WHERE md5(s) NOT IN (SELECT hsh FROM archs)) AS kept
           |  FROM seg WHERE doc_id % 3 = 0 GROUP BY doc_id),
           |segk AS (SELECT t.doc_id,
           |    CAST(COALESCE(ceil(len(w)/25.0), 0) AS INTEGER) AS n_segs,
           |    CAST(COALESCE(batk.kept, 0) AS INTEGER) AS n_kept
           |  FROM toksall t LEFT JOIN batk USING (doc_id)
           |  WHERE t.doc_id % 3 = 0),
           |sh AS (SELECT doc_id, CASE WHEN len(w) < 3
           |    THEN [array_to_string(w, ' ')]
           |    ELSE list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
           |                        for i in range(1, len(w) - 1)]) END AS sss
           |  FROM toksall),
           |ndh AS (SELECT DISTINCT bsh.doc_id FROM sh ash JOIN sh bsh
           |  ON ash.doc_id % 3 <> 0 AND bsh.doc_id % 3 = 0
           |  AND CAST(len(list_intersect(ash.sss, bsh.sss)) AS DOUBLE)
           |      / len(list_distinct(list_concat(ash.sss, bsh.sss))) >= 0.5),
           |emb AS (SELECT vec_id, embedding FROM embeddings),
           |edh AS (SELECT DISTINCT eb.vec_id AS doc_id
           |  FROM emb ea JOIN emb eb
           |  ON ea.vec_id % 3 <> 0 AND eb.vec_id % 3 = 0
           |  AND round(${sqlCosine("ea.embedding", "eb.embedding")}, 6)
           |      >= 0.45),
           |swa AS (SELECT DISTINCT u AS hh FROM (
           |  SELECT unnest([md5(array_to_string(w[(i+1):(i+20)], ' '))
           |                 for i in range(0, len(w) - 19)]) AS u
           |  FROM toksall WHERE doc_id % 3 <> 0)),
           |sex AS (SELECT doc_id, u.i AS pos, u.h AS hh FROM (
           |  SELECT doc_id, unnest([{'i': i,
           |      'h': CASE WHEN i <= len(w) - 20
           |        THEN md5(array_to_string(w[(i+1):(i+20)], ' ')) END}
           |    for i in range(0, len(w))]) u
           |  FROM toksall WHERE doc_id % 3 = 0)),
           |smk AS (SELECT doc_id, pos, CASE WHEN hh IS NOT NULL
           |      AND hh IN (SELECT hh FROM swa) THEN 1 ELSE 0 END AS ds
           |  FROM sex),
           |scov AS (SELECT doc_id,
           |    sum(ds) OVER (PARTITION BY doc_id ORDER BY pos
           |      ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) > 0 AS covered
           |  FROM smk),
           |sk AS (SELECT doc_id, CAST(count(*) AS INTEGER) AS n_tokens,
           |    CAST(count(*) FILTER (WHERE covered) AS INTEGER)
           |      AS n_span_removed
           |  FROM scov GROUP BY doc_id),
           |dgr AS (SELECT doc_id,
           |    CASE WHEN doc_id % 3 <> 0 AND doc_id % 11 = 0 THEN 'tgt'
           |         WHEN doc_id % 3 <> 0 THEN 'raw' ELSE 'bat' END AS part,
           |    w || CASE WHEN len(w) < 2 THEN CAST([] AS VARCHAR[])
           |      ELSE [w[i] || ' ' || w[i+1] for i in range(1, len(w))]
           |    END AS grams
           |  FROM toksall),
           |docc AS (SELECT doc_id, part,
           |    CAST(concat('0x', substr(md5(unnest(grams)), 1, 15))
           |      AS BIGINT) % 512 AS bk
           |  FROM dgr),
           |dht AS (SELECT bk, COUNT(*) AS ct FROM docc WHERE part = 'tgt'
           |  GROUP BY bk),
           |dhr AS (SELECT bk, COUNT(*) AS cr FROM docc WHERE part = 'raw'
           |  GROUP BY bk),
           |daff AS (SELECT doc_id,
           |    (1000 * (COALESCE(ct, 0) + 1))
           |      // (COALESCE(ct, 0) + COALESCE(cr, 0) + 2) AS aa
           |  FROM docc LEFT JOIN dht USING (bk) LEFT JOIN dhr USING (bk)
           |  WHERE part = 'bat'),
           |dsc AS (SELECT doc_id, COUNT(*) AS n, SUM(aa) AS sa
           |  FROM daff GROUP BY doc_id)
           |SELECT lg.doc_id, lg.quality_mil, lg.lang, ex.dup_exact,
           |  segk.n_segs, segk.n_kept,
           |  CASE WHEN ndh.doc_id IS NOT NULL THEN 1 ELSE 0 END AS neardup_hit,
           |  CASE WHEN edh.doc_id IS NOT NULL THEN 1 ELSE 0 END AS embdup_hit,
           |  COALESCE(sk.n_tokens, 0) AS n_tokens,
           |  COALESCE(sk.n_span_removed, 0) AS n_span_removed,
           |  CAST(dsc.sa // dsc.n AS BIGINT) AS dsir_mil,
           |  CAST(CASE WHEN dsc.sa // dsc.n >= 101 THEN 1 ELSE 0 END
           |    AS INTEGER) AS sel_admit,
           |  CASE WHEN lg.quality_mil >= 500 AND lg.lang = 'en'
           |       AND ex.dup_exact = 0 AND ndh.doc_id IS NULL
           |       AND edh.doc_id IS NULL
           |       AND COALESCE(sk.n_span_removed, 0) * 5
           |           <= COALESCE(sk.n_tokens, 0)
           |       AND COALESCE(dsc.sa // dsc.n >= 101, FALSE)
           |       THEN 1 ELSE 0 END AS admitted
           |FROM lg JOIN ex USING (doc_id) JOIN segk USING (doc_id)
           |  LEFT JOIN ndh USING (doc_id) LEFT JOIN edh USING (doc_id)
           |  LEFT JOIN sk USING (doc_id) LEFT JOIN dsc USING (doc_id)
           |ORDER BY doc_id""".stripMargin
      },
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val e = t(s, dir, "embeddings")
        val sink = tempStore.freshSink(s, "admit117", dir)
        val archive = docs.filter(col("doc_id") % 3 =!= 0)
        TextOps.fingerprintStoreBuild(archive, "doc_id", "text", sink)
        TextOps.segmentStoreBuild(archive, "doc_id", "text", sink)
        TextOps.minhashStoreBuild(archive, "doc_id", "text", sink)
        TextOps.substrStoreBuild(archive, "doc_id", "text", sink)
        SelectOps.selectionStoreBuild(archive,
          archive.filter(col("doc_id") % 11 === 0),
          "doc_id", "text", sink, buckets = 512)
        SimOps.embLshStoreBuild(e.filter(col("vec_id") % 3 =!= 0),
          "vec_id", "embedding", sink)
        val batch = docs.filter(col("doc_id") % 3 === 0)
        val txt = TextOps.admissionScreen(batch, "doc_id", "text", sink)
          .drop("admitted")
        val sub = TextOps.substrStoreProbe(batch, "doc_id", "text", sink)
          .select(col("doc_id"), col("n_tokens"),
            col("n_removed").as("n_span_removed"))
        val sel = SelectOps.selectionStoreScore(batch, "doc_id", "text",
            sink, minMil = 101L)
          .select(col("doc_id"), col("dsir_mil"),
            col("admitted").as("sel_admit"))
        val embHits = SimOps.embLshStoreProbe(
            e.filter(col("vec_id") % 3 === 0), "vec_id", "embedding",
            sink, threshold = 0.45)
          .select(col("b_id").as("doc_id")).distinct()
          .withColumn("__ed", lit(1))
        txt.join(broadcast(embHits), Seq("doc_id"), "left")
          .join(broadcast(sub), Seq("doc_id"), "left")
          .join(broadcast(sel), Seq("doc_id"), "left")
          .select(col("doc_id"), col("quality_mil"), col("lang"),
            col("dup_exact"), col("n_segs"), col("n_kept"),
            col("neardup_hit"),
            coalesce(col("__ed"), lit(0)).as("embdup_hit"),
            col("n_tokens"), col("n_span_removed"), col("dsir_mil"),
            col("sel_admit"))
          .withColumn("admitted",
            (col("quality_mil") >= 500 && col("lang") === "en" &&
              col("dup_exact") === 0 && col("neardup_hit") === 0 &&
              col("embdup_hit") === 0 &&
              col("n_span_removed") * 5 <= col("n_tokens") &&
              col("sel_admit") === 1).cast("int"))
          .orderBy("doc_id")
      }),

    QueryDef("q118_table_profile",
      "ONE-PASS table profile — the trust-but-verify step before a " +
        "100 TB input enters a pipeline: per column, row count, null " +
        "count, exact distinct count, and min/max in canonical string " +
        "form (cast AFTER the native-ordered min/max, so numeric and " +
        "timestamp ordering is never lexicographic). Counts/min/max " +
        "ride ONE global aggregate over one pruned scan; exact " +
        "distincts come from a SECOND pruned scan unpivoted to " +
        "(column, canonical value) with a per-column two-phase " +
        "count-distinct — hash aggregation throughout, NO Expand " +
        "(the naive multi-distinct aggregate plans a k-way Expand + " +
        "SortAggregate on an all-columns key: measured 4.7x slower). " +
        "The approx_count_distinct variant profiles in the single " +
        "pass with no shuffle and is the 100 TB default, spec-pinned " +
        "within HLL bounds.",
      Some {
        val cols = Seq("l_orderkey", "l_partkey", "l_suppkey",
          "l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
          "l_tax", "l_returnflag", "l_linestatus", "l_shipdate")
        cols.map { c =>
          s"""SELECT '$c' AS col_name, COUNT(*) AS n_rows,
             |  COUNT(*) FILTER (WHERE $c IS NULL) AS n_null,
             |  COUNT(DISTINCT $c) AS n_distinct,
             |  CAST(MIN($c) AS VARCHAR) AS min_val,
             |  CAST(MAX($c) AS VARCHAR) AS max_val FROM lineitem""".stripMargin
        }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
      },
      (s, dir) => RelOps.profile(t(s, dir, "lineitem"),
        Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
          "l_quantity", "l_extendedprice", "l_discount", "l_tax",
          "l_returnflag", "l_linestatus", "l_shipdate"),
        exact = true)),

    QueryDef("q119_exactly_once_admission",
      "EXACTLY-ONCE incremental admission under re-delivery — the " +
        "crash-replay case every streaming fold must survive: the " +
        "substring-window fold is keyed (win_hash, batch_id), so " +
        "re-admitting the SAME batch (here: admitted twice, the " +
        "simulated foreachBatch replay) merges byte-identical rows " +
        "instead of double-counting. The query screens a second " +
        "batch at minArchiveCount = 2, the threshold built to EXPOSE " +
        "double-counting: the oracle counts the replayed batch ONCE, " +
        "so an at-least-once additive fold (substrStoreAdmit's " +
        "contract) would over-remove every window unique to the " +
        "replayed batch and hash-mismatch. Store scans stay map-only " +
        "(semi-join against broadcast batch digests); only the " +
        "batch-bounded matched subset aggregates.",
      Some("""WITH toks AS (SELECT doc_id,
             |    regexp_extract_all(lower(text), '[a-z]+') w FROM documents),
             |wocc AS (SELECT unnest([md5(array_to_string(w[(i+1):(i+20)], ' '))
             |                 for i in range(0, len(w) - 19)]) AS h
             |  FROM toks WHERE doc_id % 3 <> 0 OR doc_id % 2 = 0),
             |dup AS (SELECT h FROM wocc GROUP BY h HAVING COUNT(*) >= 2),
             |ex AS (SELECT doc_id, u.i AS pos, u.t AS tok, u.h AS h FROM (
             |  SELECT doc_id, unnest([{'i': i, 't': w[i+1],
             |      'h': CASE WHEN i <= len(w) - 20
             |        THEN md5(array_to_string(w[(i+1):(i+20)], ' ')) END}
             |    for i in range(0, len(w))]) u
             |  FROM toks WHERE doc_id % 3 = 0 AND doc_id % 2 = 1)),
             |mk AS (SELECT doc_id, pos, tok,
             |    CASE WHEN h IS NOT NULL AND h IN (SELECT h FROM dup)
             |      THEN 1 ELSE 0 END AS ds
             |  FROM ex),
             |cov AS (SELECT doc_id, pos, tok,
             |    sum(ds) OVER (PARTITION BY doc_id ORDER BY pos
             |      ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) > 0 AS covered
             |  FROM mk),
             |k AS (SELECT doc_id, CAST(count(*) AS INTEGER) AS n_tokens,
             |    CAST(count(*) FILTER (WHERE covered) AS INTEGER) AS n_removed,
             |    string_agg(tok, ' ' ORDER BY pos)
             |      FILTER (WHERE NOT covered) AS text_kept
             |  FROM cov GROUP BY doc_id)
             |SELECT d.doc_id, COALESCE(k.n_tokens, 0) AS n_tokens,
             |  COALESCE(k.n_removed, 0) AS n_removed,
             |  COALESCE(k.text_kept, '') AS text_kept
             |FROM (SELECT doc_id FROM documents
             |      WHERE doc_id % 3 = 0 AND doc_id % 2 = 1) d
             |LEFT JOIN k USING (doc_id)
             |ORDER BY doc_id""".stripMargin),
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val sink = tempStore.freshSink(s, "substrdelta", dir)
        TextOps.substrDeltaBuild(docs.filter(col("doc_id") % 3 =!= 0),
          "doc_id", "text", sink)
        val b1 = docs.filter(col("doc_id") % 3 === 0 &&
          col("doc_id") % 2 === 0)
        // the simulated crash re-delivery: the SAME batch admitted
        // TWICE under the same batch id — the second admit must leave
        // the store byte-identical or the oracle below mismatches
        TextOps.substrDeltaAdmit(b1, "doc_id", "text", sink,
          batchId = 1L, minArchiveCount = 2)
        TextOps.substrDeltaAdmit(b1, "doc_id", "text", sink,
          batchId = 1L, minArchiveCount = 2)
        TextOps.substrDeltaProbe(
            docs.filter(col("doc_id") % 3 === 0 && col("doc_id") % 2 === 1),
            "doc_id", "text", sink, minArchiveCount = 2)
          .orderBy("doc_id")
      })
  )

  /** Shared oracle CTE: winnowed fingerprint sets per document (k=8,
    * window=4), the SQL replication of [[graft.functions.WinnowHash]] —
    * same 0-seeded `(h*31 + code) mod 1e9+7` fold per gram, min per
    * window, sorted distinct.
    */
  private def winnowFpsCte: String =
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

  // ---------------------------------------------------------------------
  // Assembled inventory
  // ---------------------------------------------------------------------

  def all: Seq[QueryDef] = relational ++ textual ++ similarity ++ analytics

  def byName: Map[String, QueryDef] = all.map(q => q.name -> q).toMap
}
