package graft.sink

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.sources.InsertableRelation
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 write face of the state-store sink: the standard writer
  * API routed into [[UpsertSink.merge]], so a pipeline can land an
  * idempotent PK upsert with nothing but
  *
  * {{{
  * df.write.format("graft.sink.StateStoreWriter")
  *   .option("sink", registeredKey)      // registry, like the connectors
  *   .option("table", "Builder")
  *   .option("pk", "id")                 // comma-separated for composite
  *   .mode("append")                     // append = MERGE by pk
  *   .save()
  * }}}
  *
  * `append` performs the PK merge (the reference's ON CONFLICT DO
  * UPDATE); `overwrite` truncates and rewrites the table in the bucketed
  * layout. The physical write delegates to the V1 InsertableRelation
  * bridge ([[V1Write]]): Spark hands the full DataFrame to the driver
  * side, and the merge reuses the sink's bucketed incremental path —
  * which already distributes its shuffle/join work as Spark jobs, so the
  * executor-side behavior is identical to calling `merge` directly; the
  * V2 surface adds the standard API, option validation, and mode
  * semantics.
  */
object StateStoreWriter {
  /** Sinks keyed by the `sink` option (live objects are never serialized
    * into plans — same pattern as the connectors' registries).
    */
  val registry: TrieMap[String, UpsertSink] = TrieMap.empty
}

final class StateStoreWriter extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true

  // write-only source: there is nothing to infer, but the API requires it
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType()

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table = {
    val options = new CaseInsensitiveStringMap(properties)
    val key = options.get("sink")
    val table = options.get("table")
    require(key != null && table != null,
      "graft.sink.StateStoreWriter needs options sink=<registryKey>, table=<name>")
    // no silent Seq("id") default: a composite-keyed table that happens
    // to carry an id-named column would dedupe and bucket by the wrong
    // key with no diagnostic — the merge key must be stated
    val pk = Option(options.get("pk")).map(_.split(',').map(_.trim).toSeq)
      .getOrElse(throw new IllegalArgumentException(
        "graft.sink.StateStoreWriter needs option pk=<col[,col...]> " +
          "(the merge key)"))
    new StateStoreTable(key, table, pk, schema)
  }
}

final class StateStoreTable(sinkKey: String, table: String, pk: Seq[String],
                            writeSchema: StructType)
    extends Table with SupportsWrite {

  override def name(): String = s"statestore:$table"
  override def schema(): StructType = writeSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_WRITE,
      TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new StateStoreWriteBuilder(sinkKey, table, pk, truncate = false)
}

final class StateStoreWriteBuilder(sinkKey: String, table: String,
                                   pk: Seq[String], truncate: Boolean)
    extends WriteBuilder with SupportsTruncate {

  override def truncate(): WriteBuilder =
    new StateStoreWriteBuilder(sinkKey, table, pk, truncate = true)

  override def build(): Write = new V1Write {
    override def toInsertableRelation: InsertableRelation = (df, overwrite) => {
      val sink = StateStoreWriter.registry.getOrElse(sinkKey,
        throw new IllegalArgumentException(s"no sink registered under '$sinkKey'"))
      if (truncate || overwrite) sink.overwrite(table, df, pk)
      else sink.merge(table, df, pk)
    }
  }
}
