package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{MinHashFunctions, WinnowFunctions}
import graft.ops.{BpeOps, ChatOps, ClassifierOps, GraphOps, MultimodalOps, RelOps, SampleOps, SelectOps, SimOps, TextOps, WebOps}

/** The relational core (q01-q23) — SURVEY §2.2-§2.7. */
private[graft] trait CatalogRelational extends CatalogShared {

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
}
