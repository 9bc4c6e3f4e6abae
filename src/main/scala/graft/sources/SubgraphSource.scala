package graft.sources

import scala.annotation.tailrec
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import graft.model.{EntityDef, ProviderConfig, SchemaMap}
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

/** Result of one batched request: per-alias record lists + metadata. */
final case class BatchResult(
    records: Map[String, Seq[Map[String, Any]]],
    meta: Option[BlockMeta])

/** Subgraph scan connector: merged batch documents, alias demux, keyset
  * pagination, graceful degradation (SURVEY §2.1 S1, §2.6 O2, §2.11 R2).
  *
  * The fetch loop runs on the driver (page-sized units, like the
  * reference); rows land in a DataFrame for everything downstream. A
  * DataSource V2 wrapper can layer on top — the pushdown surface
  * (filters/columns/limit) is already explicit in [[QuerySpec]].
  */
final class SubgraphSource(provider: ProviderConfig, transport: Transport) {

  private val mapper = new ObjectMapper()

  /** Request accounting (A5 — the reference's metrics context,
    * subgraphProvider.ts:27-62): logical queries vs HTTP requests; the
    * difference is the batching win (5 -> 1 = 80% reduction).
    */
  final class Metrics {
    @volatile var queries: Long = 0L
    @volatile var httpRequests: Long = 0L
    /** 1 - http/queries, the reference's logged "reduction %". */
    def batchingReduction: Double =
      if (queries == 0) 0.0 else 1.0 - httpRequests.toDouble / queries
  }
  val metrics: Metrics = new Metrics

  def endpoint: String =
    s"${provider.url}/${provider.apiKey}/subgraphs/id/${provider.id}"

  /** Execute one merged GraphQL document and demux per alias. GraphQL-level
    * errors, non-JSON responses, and missing `data` all degrade to an empty
    * result (reference returns `{}` + log, subgraphProvider.ts:240-266).
    */
  def execute(specs: Seq[QuerySpec], withMetadata: Boolean = true): BatchResult = {
    val doc = SubgraphQueryBuilder.batchQuery(specs, withMetadata)
    val body = mapper.createObjectNode()
    body.put("query", doc)
    metrics.queries += specs.size
    metrics.httpRequests += 1
    val raw =
      try transport.post(endpoint, mapper.writeValueAsString(body))
      catch { case _: Exception => return BatchResult(Map.empty, None) }
    parseResponse(raw)
  }

  /** Batched execution with individual fallback (R3 — the reference
    * re-runs queries one by one when the batched request fails,
    * batchExecutor.ts:150-156, 254-264): if the merged document comes
    * back empty, each spec retries alone so one poisoned query can't
    * starve the others. Individual results are re-keyed to their
    * original batch alias positions.
    */
  def executeWithFallback(specs: Seq[QuerySpec],
                          withMetadata: Boolean = true): BatchResult = {
    val batched = execute(specs, withMetadata)
    if (batched.records.nonEmpty || specs.isEmpty) batched
    else {
      val individual = specs.zipWithIndex.map { case (spec, i) =>
        val res = execute(Seq(spec), withMetadata = false)
        val key0 = s"${SubgraphQueryBuilder.resultKey(spec.entity.name)}_0"
        val keyI = s"${SubgraphQueryBuilder.resultKey(spec.entity.name)}_$i"
        keyI -> res.records.getOrElse(key0, Seq.empty)
      }.toMap
      BatchResult(individual.filter(_._2.nonEmpty), batched.meta)
    }
  }

  private[sources] def parseResponse(raw: String): BatchResult = {
    val root =
      try mapper.readTree(raw)
      catch { case _: Exception => return BatchResult(Map.empty, None) }
    if (root == null || root.has("errors") || !root.has("data"))
      return BatchResult(Map.empty, None)
    val data = root.get("data")
    val meta = Option(data.get("_meta")).flatMap { m =>
      Option(m.get("block")).map { b =>
        BlockMeta(
          BigInt(b.get("number").asText("0")),
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
          case x if x.isIntegralNumber => BigInt(x.asText)
          case x => x.asText
        }.toSeq
        case v if v.isObject => jsonToMap(v)
      })
    }.toMap

  /** Full keyset-paginated scan of one entity: `first: maxRows` ordered by
    * id; while a page comes back full, re-issue with `id_gt: lastId`
    * (subgraphSyncer.ts:88-133). Accumulates pages (O3 union-all).
    */
  def fetchAll(entity: EntityDef,
               where: Map[String, Any] = Map.empty): Seq[Map[String, Any]] = {
    val pageSize = provider.maxRowsPerRequest
    // don't clobber a caller-supplied id_gt (e.g. a pushed-down id > x
    // filter): the keyset walk starts from it instead of from zero
    val startCursor = where.get("id_gt") match {
      case Some(s: String) => s
      case _ => "0x00"
    }
    val base = QuerySpec(entity, where = where + ("id_gt" -> startCursor),
      orderBy = Some("id"), first = Some(pageSize))

    @tailrec
    def loop(spec: QuerySpec, cursor: String,
             acc: Vector[Map[String, Any]]): Vector[Map[String, Any]] = {
      val res = execute(Seq(spec), withMetadata = false)
      val key = s"${SubgraphQueryBuilder.resultKey(entity.name)}_0"
      val page = res.records.getOrElse(key, Seq.empty)
      val all = acc ++ page
      if (page.size < pageSize) all
      else page.last.get("id") match {
        // a non-advancing cursor means the server is misbehaving — stop
        // rather than loop forever on the same page
        case Some(last: String) if last > cursor =>
          loop(SubgraphQueryBuilder.nextPage(spec, last), last, all)
        case _ => all
      }
    }
    loop(base, startCursor, Vector.empty)
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

  /** `0x`-prefixed hex -> bytes (ids/addresses/hashes as BYTEA). */
  def hexToBytes(s: String): Array[Byte] = {
    val hex = if (s.startsWith("0x")) s.substring(2) else s
    val padded = if (hex.length % 2 == 1) "0" + hex else hex
    padded.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
  }
}
