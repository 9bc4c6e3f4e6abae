package graft.model

import org.apache.spark.sql.types._

/** The configured relational entity model — the reference's fundamental
  * abstraction (SURVEY §1.1): a named, flat, row-oriented table with typed
  * columns, a (possibly composite) primary key, and a source provider,
  * declared entirely in config.
  *
  * Reference shapes: `Entity` (src/config/types.ts:52-57), `Column`
  * (src/config/types.ts:46-50), with five scalar types + single-level
  * arrays (src/handlers/types.ts:4-33).
  */
sealed trait ColumnType {
  /** Spark type under the engine's mapping (SURVEY §1.2). */
  def sparkType: DataType
}

object ColumnType {
  /** flags — BOOLEAN */
  case object BooleanCol extends ColumnType { val sparkType: DataType = BooleanType }

  /** EVM uint256. The reference stores NUMERIC(78,0)
    * (src/handlers/types.ts:17-20); Spark decimals cap at precision 38.
    * Policy (SURVEY §1.2): canonical DecimalType(38,0) — covers every
    * realistic token/vote amount; values wider than 38 digits must be
    * carried in a string shadow column by the caller.
    */
  case object BigIntCol extends ColumnType { val sparkType: DataType = DecimalType(38, 0) }

  /** addresses, hashes, calldata — BYTEA */
  case object BytesCol extends ColumnType { val sparkType: DataType = BinaryType }

  case object StringCol extends ColumnType { val sparkType: DataType = StringType }

  /** small enums (rawState, support, day) */
  case object IntegerCol extends ColumnType { val sparkType: DataType = IntegerType }

  /** single-level array of a scalar type (src/handlers/dbCreator.ts:132-144).
    * `sparkType` is lazy: an array-of-reference element would otherwise
    * throw inside the CONSTRUCTOR during config parsing, before
    * validate() can report the unsupported shape readably.
    */
  final case class ArrayCol(element: ColumnType) extends ColumnType {
    lazy val sparkType: DataType = ArrayType(element.sparkType, containsNull = false)
  }

  /** a column typed as another entity = foreign key
    * (src/handlers/dbCreator.ts:160-162); resolves to the referenced
    * entity's PK column type(s) at schema-build time.
    */
  final case class Reference(entityName: String) extends ColumnType {
    def sparkType: DataType =
      throw new IllegalStateException(
        s"unresolved reference to $entityName — resolve via SchemaMap.structTypeOf")
  }

  private val scalars: Map[String, ColumnType] = Map(
    "Boolean" -> BooleanCol, "BigInt" -> BigIntCol, "Bytes" -> BytesCol,
    "String" -> StringCol, "Integer" -> IntegerCol)

  /** Parse a config type string: scalar, `[T]` array, else entity ref. */
  def parse(s: String): ColumnType = s.trim match {
    case arr if arr.startsWith("[") && arr.endsWith("]") =>
      ArrayCol(parse(arr.substring(1, arr.length - 1)))
    case t => scalars.getOrElse(t, Reference(t))
  }
}

/** One column: name, type, opt-in nullability (default NOT NULL —
  * src/handlers/dbCreator.ts:43-52).
  */
final case class ColumnDef(name: String, tpe: ColumnType, nullable: Boolean = false)

/** One entity (src/config/types.ts:52-57). */
final case class EntityDef(
    name: String,
    columns: Seq[ColumnDef],
    primaryKey: Seq[String],
    subgraphProvider: String) {

  def column(name: String): Option[ColumnDef] = columns.find(_.name == name)

  /** Columns whose type references another entity (FKs, SURVEY §1.3). */
  def referenceColumns: Seq[ColumnDef] =
    columns.filter(_.tpe.isInstanceOf[ColumnType.Reference])
}

/** Entity map with reference resolution — the "schema context"
  * (src/context/schema.ts:3-13; duplicate names: last wins, per the
  * reference's Map semantics).
  */
final case class SchemaMap(entities: Map[String, EntityDef]) {

  def apply(name: String): EntityDef = entities(name)
  def get(name: String): Option[EntityDef] = entities.get(name)

  /** Validate the reference's invariants: PK columns exist and are not
    * nullable (src/handlers/dbCreator.ts:75-83); FK targets exist.
    */
  def validate(): Seq[String] = entities.values.flatMap { e =>
    val pkMissing = e.primaryKey.filterNot(pk => e.column(pk).isDefined)
      .map(pk => s"${e.name}: primary key column $pk not defined")
    val pkNullable = e.primaryKey.flatMap(e.column)
      .filter(_.nullable).map(c => s"${e.name}: primary key column ${c.name} must not be nullable")
    val badRefs = e.referenceColumns.collect {
      case ColumnDef(n, ColumnType.Reference(target), _) if !entities.contains(target) =>
        s"${e.name}.$n: unknown referenced entity $target"
    }
    val badArrays = e.columns.collect {
      case ColumnDef(n, ColumnType.ArrayCol(_: ColumnType.Reference), _) =>
        s"${e.name}.$n: arrays of entity references are not supported " +
          "(model FK lists as a child entity instead)"
    }
    pkMissing ++ pkNullable ++ badRefs ++ badArrays
  }.toSeq

  /** Spark StructType for an entity, with FK columns expanded to the
    * referenced entity's PK type: single-column PK -> one column of the
    * PK's type (dbCreator.ts:98-106); composite PK -> `col_<pkCol>`
    * columns (dbCreator.ts:107-126).
    */
  def structTypeOf(entityName: String): StructType = {
    val e = apply(entityName)
    val fields = e.columns.flatMap { c =>
      c.tpe match {
        case ColumnType.Reference(target) =>
          val ref = apply(target)
          if (ref.primaryKey.size == 1) {
            val pkType = resolvedScalar(ref, ref.primaryKey.head)
            Seq(StructField(c.name, pkType, c.nullable))
          } else ref.primaryKey.map { pk =>
            StructField(s"${c.name}_$pk", resolvedScalar(ref, pk), c.nullable)
          }
        case t => Seq(StructField(c.name, t.sparkType, c.nullable))
      }
    }
    StructType(fields)
  }

  private def resolvedScalar(e: EntityDef, colName: String,
                             visited: Set[String] = Set.empty): DataType =
    e.column(colName).map(_.tpe) match {
      case Some(ColumnType.Reference(target)) =>
        // chained FK: follow to the target's PK type — with a visited set
        // (a reference CYCLE would otherwise StackOverflow here, past
        // validate()) and a loud error on composite chained targets
        // (silently taking primaryKey.head would type the column wrong)
        if (visited.contains(e.name))
          throw new IllegalArgumentException(
            s"reference cycle while resolving ${e.name}.$colName " +
              s"(via ${visited.mkString(" -> ")})")
        val t = apply(target)
        if (t.primaryKey.size != 1)
          throw new IllegalArgumentException(
            s"${e.name}.$colName: chained reference to composite-PK " +
              s"entity $target cannot resolve to one scalar type")
        resolvedScalar(t, t.primaryKey.head, visited + e.name)
      case Some(t) => t.sparkType
      case None => throw new IllegalArgumentException(
        s"${e.name}: unknown column $colName")
    }

  /** Columns that cannot round-trip the GraphQL WIRE protocol for
    * `entityName`: the source projects FK columns as `{ id }` (the
    * subgraph convention — The Graph requires an `id` field on every
    * entity), so a reference to an entity whose PK is not exactly
    * `[id]` would come back null-flattened with no error. Callers that
    * FETCH (Syncer, the DSv2 scan) fail loudly on these instead.
    */
  def wireIssues(entityName: String): Seq[String] =
    apply(entityName).referenceColumns.collect {
      case ColumnDef(n, ColumnType.Reference(target), _)
          if entities.contains(target) && apply(target).primaryKey != Seq("id") =>
        s"$entityName.$n: references $target whose primary key " +
          s"(${apply(target).primaryKey.mkString(",")}) is not [id] — " +
          "the GraphQL source can only sub-select { id }"
    }
}

object SchemaMap {
  /** Last-wins on duplicate entity names (reference Map behavior,
    * src/context/schema.test.ts "duplicate entity names").
    */
  def apply(defs: Seq[EntityDef]): SchemaMap =
    SchemaMap(defs.map(e => e.name -> e).toMap)
}
