package graft.sources

import java.util.concurrent.atomic.AtomicLong

import scala.annotation.tailrec
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import graft.model.{EntityDef, ProviderConfig, SchemaMap}
import graft.sink.Retry
import graft.sources.SubgraphQueryBuilder.QuerySpec

/** HTTP transport boundary — pluggable so the connector is fully testable
  * offline (the reference mock-patches global.fetch the same way,
  * batching.test.ts:52-87). Implementations must be thread-safe.
  */
trait Transport {
  /** POST a GraphQL body `{"query": "..."}`; returns the raw response
    * body, or throws on transport failure.
    */
  def post(endpoint: String, body: String): String
}

/** Block coordinates from the `_meta` response block
  * (src/context/subgraphProvider.ts:189-206).
  */
final case class BlockMeta(number: BigInt, hash: String, timestamp: BigInt)

/** Result of one batched request: per-alias record lists + metadata.
  *
  * `failed` distinguishes an errored request (transport failure, GraphQL
  * errors, unparseable body) from a legitimately empty result — callers
  * must not commit a `failed` page as data (a short page that was really
  * an error would otherwise read as a clean end-of-scan). `failedKeys`
  * names the aliases that still failed after per-spec fallback.
  */
final case class BatchResult(
    records: Map[String, Seq[Map[String, Any]]],
    meta: Option[BlockMeta],
    failed: Boolean = false,
    failedKeys: Set[String] = Set.empty)

/** Subgraph scan connector: merged batch documents, alias demux, keyset
  * pagination, graceful degradation (SURVEY §2.1 S1, §2.6 O2, §2.11 R2).
  *
  * The fetch loop runs on the driver (page-sized units, like the
  * reference); rows land in a DataFrame for everything downstream. A
  * DataSource V2 wrapper can layer on top — the pushdown surface
  * (filters/columns/limit) is already explicit in [[QuerySpec]].
  */
final class SubgraphSource(provider: ProviderConfig, transport: Transport,
                           maxRetries: Int = 3, retryDelayMs: Long = 200,
                           sleep: Long => Unit = Thread.sleep) {

  private val mapper = new ObjectMapper()

  /** Request accounting (A5 — the reference's metrics context,
    * subgraphProvider.ts:27-62): logical queries vs HTTP requests; the
    * difference is the batching win (5 -> 1 = 80% reduction). Atomic:
    * one source may serve many threads (Transport is thread-safe).
    */
  final class Metrics {
    val queries = new AtomicLong(0L)
    val httpRequests = new AtomicLong(0L)
    /** 1 - http/queries, the reference's logged "reduction %". */
    def batchingReduction: Double = {
      val q = queries.get
      if (q == 0) 0.0 else 1.0 - httpRequests.get.toDouble / q
    }
  }
  val metrics: Metrics = new Metrics

  def endpoint: String =
    s"${provider.url}/${provider.apiKey}/subgraphs/id/${provider.id}"

  /** Execute one merged GraphQL document and demux per alias. GraphQL-level
    * errors, non-JSON responses, and missing `data` all degrade to an empty
    * result (reference returns `{}` + log, subgraphProvider.ts:240-266).
    */
  def execute(specs: Seq[QuerySpec], withMetadata: Boolean = true): BatchResult =
    executeCounted(specs, withMetadata, countQueries = true)

  /** `countQueries = false` for the individual-fallback pass: those specs
    * were already counted as logical queries by the failed batch attempt —
    * re-counting them would overstate batchingReduction exactly when
    * batching failed (only the extra HTTP requests are real).
    */
  private def executeCounted(specs: Seq[QuerySpec], withMetadata: Boolean,
                             countQueries: Boolean): BatchResult = {
    val doc = SubgraphQueryBuilder.batchQuery(specs, withMetadata)
    val body = mapper.createObjectNode()
    body.put("query", doc)
    if (countQueries) metrics.queries.addAndGet(specs.size.toLong)
    metrics.httpRequests.incrementAndGet()
    val raw =
      try transport.post(endpoint, mapper.writeValueAsString(body))
      catch { case _: Exception => return BatchResult(Map.empty, None, failed = true) }
    parseResponse(raw)
  }

  /** Batched execution with individual fallback (R3 — the reference
    * re-runs queries one by one when the batched request fails,
    * batchExecutor.ts:150-156, 254-264): keyed off the explicit error
    * signal (NOT emptiness — a genuinely empty table must not trigger N
    * individual re-requests). Each spec then runs alone so one poisoned
    * query can't starve the others; individual results are re-keyed to
    * their original batch alias positions, and specs that still fail are
    * named in `failedKeys` so callers can retry or abort rather than
    * treat the hole as empty data.
    */
  def executeWithFallback(specs: Seq[QuerySpec],
                          withMetadata: Boolean = true): BatchResult = {
    val batched = execute(specs, withMetadata)
    if (!batched.failed || specs.isEmpty) batched
    else {
      val individual = specs.zipWithIndex.map { case (spec, i) =>
        val res = executeCounted(Seq(spec), withMetadata = false,
          countQueries = false)
        val key0 = s"${SubgraphQueryBuilder.resultKey(spec.entity.name)}_0"
        val keyI = s"${SubgraphQueryBuilder.resultKey(spec.entity.name)}_$i"
        (keyI, res.records.getOrElse(key0, Seq.empty), res.failed)
      }
      BatchResult(
        individual.collect { case (k, recs, false) => k -> recs }.toMap,
        batched.meta,
        failed = individual.forall(_._3),
        failedKeys = individual.collect { case (k, _, true) => k }.toSet)
    }
  }

  private[sources] def parseResponse(raw: String): BatchResult = {
    val root =
      try mapper.readTree(raw)
      catch { case _: Exception => return BatchResult(Map.empty, None, failed = true) }
    if (root == null || root.has("errors") || !root.has("data"))
      return BatchResult(Map.empty, None, failed = true)
    val data = root.get("data")
    val meta = Option(data.get("_meta")).flatMap { m =>
      Option(m.get("block")).map { b =>
        BlockMeta(
          BigInt(Option(b.get("number")).map(_.asText("0")).getOrElse("0")),
          Option(b.get("hash")).map(_.asText).getOrElse(""),
          BigInt(Option(b.get("timestamp")).map(_.asText("0")).getOrElse("0")))
      }
    }
    val records = data.properties().asScala
      .filter(_.getKey != "_meta")
      .map(e => e.getKey -> jsonArrayToMaps(e.getValue))
      .toMap
    BatchResult(records, meta)
  }

  private def jsonArrayToMaps(n: JsonNode): Seq[Map[String, Any]] =
    if (n == null || !n.isArray) Seq.empty
    else n.elements().asScala.map(jsonToMap).toSeq

  private def jsonToMap(n: JsonNode): Map[String, Any] =
    n.properties().asScala.map { e =>
      e.getKey -> (e.getValue match {
        case v if v.isNull => null
        case v if v.isTextual => v.asText
        case v if v.isBoolean => v.asBoolean
        case v if v.isIntegralNumber => BigInt(v.asText)
        case v if v.isNumber => BigDecimal(v.asText)
        case v if v.isArray => v.elements().asScala.map {
          case x if x.isTextual => x.asText
          case x if x.isBoolean => x.asBoolean
          case x if x.isIntegralNumber => BigInt(x.asText)
          case x if x.isNumber => BigDecimal(x.asText)
          case x => x.asText
        }.toSeq
        case v if v.isObject => jsonToMap(v)
      })
    }.toMap

  /** Keyset start cursor from a caller-supplied `id_gt` (e.g. a pushed
    * `id > x` filter). Binary ids encode to the subgraph's canonical
    * lowercase 0x-hex string; any other non-string cursor is a caller bug
    * and fails loudly — silently restarting from zero would return rows
    * the pushed filter promised to exclude. None = no cursor: the first
    * page carries NO id_gt at all (a synthetic "0x00" floor would
    * silently exclude rows whose id sorts at or below it, e.g. the
    * common singleton ids "0" or "").
    */
  private def startCursorOf(where: Map[String, Any]): Option[String] =
    where.get("id_gt") match {
      case Some(s: String) => Some(s)
      case Some(b: Array[Byte]) => Some(SubgraphSource.bytesToHex(b))
      case Some(other) => throw new IllegalArgumentException(
        s"id_gt cursor must be a hex string, got ${other.getClass.getName}: $other")
      case None => None
    }

  /** One page with retry/backoff (R1): a failed request throws after
    * `maxRetries` so an error mid-pagination can never masquerade as a
    * short final page.
    */
  private def fetchPage(spec: QuerySpec, key: String): Seq[Map[String, Any]] =
    Retry.withBackoff(maxRetries, retryDelayMs, sleep) { () =>
      val res = execute(Seq(spec), withMetadata = false)
      if (res.failed) throw new java.io.IOException(
        s"subgraph fetch failed for ${spec.entity.name} after retries")
      res.records.getOrElse(key, Seq.empty)
    }

  /** Single-page fetch with retry: `first: n` pushed (O1); failure throws
    * instead of degrading to empty (used by the DSv2 limit-pushdown path).
    */
  def fetchFirstPage(entity: EntityDef, where: Map[String, Any],
                     n: Int): Seq[Map[String, Any]] = {
    val spec = QuerySpec(entity, where = where, orderBy = Some("id"),
      first = Some(n))
    fetchPage(spec, s"${SubgraphQueryBuilder.resultKey(entity.name)}_0")
  }

  /** One arbitrary-spec page with retry (e.g. a pushed TopN's
    * orderBy/orderDirection/first); failure throws.
    */
  def fetchPageSpec(spec: QuerySpec): Seq[Map[String, Any]] =
    fetchPage(spec, s"${SubgraphQueryBuilder.resultKey(spec.entity.name)}_0")

  @tailrec
  private def pageLoop(spec: QuerySpec, key: String, cursor: Option[String],
                       acc: Vector[Map[String, Any]]): Vector[Map[String, Any]] = {
    val page = fetchPage(spec, key)
    val all = acc ++ page
    if (page.size < provider.maxRowsPerRequest) all
    else page.last.get("id") match {
      case Some(last: String) if cursor.forall(last > _) =>
        pageLoop(SubgraphQueryBuilder.nextPage(spec, last), key, Some(last), all)
      // a non-advancing cursor (server collation disagreeing with the
      // cursor comparison) or a non-string id (keyset needs the string
      // form) must THROW: returning `all` here would silently commit a
      // truncated prefix as a complete scan
      case Some(last: String) => throw new IllegalStateException(
        s"keyset cursor did not advance for ${spec.entity.name}: page " +
          s"ended at '$last' after cursor '${cursor.getOrElse("")}' — " +
          "server ordering disagrees with the cursor comparison")
      case other => throw new IllegalStateException(
        s"keyset pagination needs a string id for ${spec.entity.name}; " +
          s"got $other")
    }
  }

  /** Full keyset-paginated scan of one entity: `first: maxRows` ordered by
    * id; while a page comes back full, re-issue with `id_gt: lastId`
    * (subgraphSyncer.ts:88-133). Accumulates pages (O3 union-all); a
    * persistent transport/GraphQL failure mid-walk throws rather than
    * committing the truncated prefix as a complete scan.
    */
  def fetchAll(entity: EntityDef,
               where: Map[String, Any] = Map.empty): Seq[Map[String, Any]] = {
    val cursor = startCursorOf(where)
    val baseWhere = cursor match {
      case Some(c) => where + ("id_gt" -> c)
      case None => where - "id_gt"
    }
    val base = QuerySpec(entity, where = baseWhere,
      orderBy = Some("id"), first = Some(provider.maxRowsPerRequest))
    pageLoop(base, s"${SubgraphQueryBuilder.resultKey(entity.name)}_0",
      cursor, Vector.empty)
  }

  /** Batched multi-entity scan: the first page of EVERY entity travels in
    * ONE merged document (the reference's cross-entity batching win —
    * subgraphProvider.ts:208-231, 5 queries -> 1 request), with
    * batch-to-individual fallback (R3) keyed on the error signal. Entities
    * whose first page came back full continue with the per-entity keyset
    * walk; entities that still fail after fallback are retried with
    * backoff and throw on persistent failure.
    */
  def fetchAllBatched(entities: Seq[(EntityDef, Map[String, Any])])
      : Map[String, Seq[Map[String, Any]]] = {
    if (entities.isEmpty) return Map.empty
    val pageSize = provider.maxRowsPerRequest
    val withCursors = entities.map { case (e, where) =>
      (e, where, startCursorOf(where))
    }
    val specs = withCursors.map { case (e, where, cursor) =>
      val baseWhere = cursor match {
        case Some(c) => where + ("id_gt" -> c)
        case None => where - "id_gt"
      }
      QuerySpec(e, where = baseWhere,
        orderBy = Some("id"), first = Some(pageSize))
    }
    val first = executeWithFallback(specs, withMetadata = false)
    specs.zip(withCursors).zipWithIndex.map { case ((spec, (e, _, cursor)), i) =>
      val keyI = s"${SubgraphQueryBuilder.resultKey(e.name)}_$i"
      val key0 = s"${SubgraphQueryBuilder.resultKey(e.name)}_0"
      val page: Seq[Map[String, Any]] =
        if (first.failed || first.failedKeys.contains(keyI)) fetchPage(spec, key0)
        else first.records.getOrElse(keyI, Seq.empty)
      val all =
        if (page.size < pageSize) page.toVector
        else page.last.get("id") match {
          case Some(last: String) if cursor.forall(last > _) =>
            pageLoop(SubgraphQueryBuilder.nextPage(spec, last), key0,
              Some(last), page.toVector)
          case other => throw new IllegalStateException(
            s"keyset continuation for ${e.name}: page ended at $other " +
              s"after cursor '${cursor.getOrElse("")}' — refusing to " +
              "commit a truncated scan")
        }
      e.name -> (all: Seq[Map[String, Any]])
    }.toMap
  }
}

object SubgraphSource {

  /** FK flatten + projection: nested `{id}` objects reduce to their scalar
    * id, fields not in the entity's column map are dropped
    * (dbUpsert.ts:13-21). Then rows materialize against the resolved
    * StructType from [[SchemaMap.structTypeOf]].
    */
  def toDataFrame(spark: SparkSession, schema: SchemaMap, entity: EntityDef,
                  records: Seq[Map[String, Any]]): DataFrame = {
    val struct = schema.structTypeOf(entity.name)
    spark.createDataFrame(toRows(records, struct).asJava, struct)
  }

  /** Row materialization against an arbitrary target struct (used by both
    * the driver-side fetch and the DSv2 partition reader): fields are
    * matched by name, FK objects flatten to their id, wire values coerce
    * to the field's Spark type.
    */
  def toRows(records: Seq[Map[String, Any]], struct: StructType): Seq[Row] =
    records.map { rec =>
      Row.fromSeq(struct.fields.map { f =>
        val raw = rec.get(f.name) match {
          case Some(m: Map[_, _]) => // FK nested object -> id
            m.asInstanceOf[Map[String, Any]].get("id").orNull
          case Some(v) => v
          case None => null
        }
        coerce(raw, f.dataType)
      }.toSeq)
    }

  /** Wire-value coercion per target Spark type (F6: JSON decode + bigint
    * coercion, subgraphProvider.ts:192).
    */
  private def coerce(v: Any, t: DataType): Any = (v, t) match {
    case (null, _) => null
    case (s: String, BinaryType) => hexToBytes(s)
    case (s: String, _: DecimalType) => new java.math.BigDecimal(s)
    case (n: BigInt, _: DecimalType) => new java.math.BigDecimal(n.bigInteger)
    case (n: BigDecimal, _: DecimalType) => n.bigDecimal
    case (n: BigInt, IntegerType) => n.toInt
    case (n: BigInt, LongType) => n.toLong
    case (b: Boolean, BooleanType) => b
    case (s: String, StringType) => s
    case (seq: Seq[_], ArrayType(et, _)) => seq.map(coerce(_, et))
    case (other, _) => other
  }

  /** bytes -> canonical lowercase `0x`-hex (inverse of [[hexToBytes]]) —
    * the subgraph wire form for Bytes-typed ids/addresses.
    */
  def bytesToHex(b: Array[Byte]): String =
    "0x" + b.map(x => f"${x & 0xff}%02x").mkString

  /** `0x`-prefixed hex -> bytes (ids/addresses/hashes as BYTEA). */
  def hexToBytes(s: String): Array[Byte] = {
    val hex = if (s.startsWith("0x")) s.substring(2) else s
    val padded = if (hex.length % 2 == 1) "0" + hex else hex
    padded.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
  }
}
