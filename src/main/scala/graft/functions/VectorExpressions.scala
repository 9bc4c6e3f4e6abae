package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DoubleType, FloatType}

/** Native dot product over two `array<float>` embedding columns.
  *
  * A custom Catalyst expression with `doGenCode` (preference order (b) in
  * SURVEY §7.3): the generated code is a tight primitive loop inside
  * whole-stage codegen. The interpreted alternative —
  * `aggregate(zip_with(a, b, _*_), 0d, _+_)` — allocates a lambda frame
  * per element and runs ~30-50x slower on the all-pairs similarity joins.
  *
  * Determinism: accumulates `acc + (double)a[i] * (double)b[i]` in index
  * order in double precision — the exact arithmetic shape of the SQL
  * oracle's `list_sum(list_transform(...))`, so results stay
  * bit-identical to DuckDB's.
  */
case class FloatDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }

  override def dataType: DataType = DoubleType

  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Fused cosine between an `array<float>` query and an `array<tinyint>`
  * SQ8-quantized vector (symmetric absmax codes — [[graft.ops.SimOps
  * .int8Quantize]]'s layout). Cosine is invariant under the positive
  * per-vector scale, so the codes alone carry the angle: one loop
  * accumulates dot, |q|² and |c|² and divides once — no dequantized
  * float array is ever materialized per row, which is the point of
  * refining from 1-byte components. Zero-norm inputs score 0.0
  * (the [[graft.ops.SimOps.safeCos]] convention).
  */
case class Int8Cosine(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(ByteType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float>, array<tinyint>), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: DataType = DoubleType

  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    Int8Cosine.cosine(x, y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.Int8Cosine.cosine($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object Int8Cosine {
  /** Shared by both eval paths — identical results by construction. */
  def cosine(x: ArrayData, y: ArrayData): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var d = 0.0
    var nx = 0.0
    var ny = 0.0
    var i = 0
    while (i < n) {
      val a = x.getFloat(i).toDouble
      val b = y.getByte(i).toDouble
      d += a * b
      nx += a * a
      ny += b * b
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) 0.0
    else d / (math.sqrt(nx) * math.sqrt(ny))
  }
}

/** The SQ8 symmetric-absmax scale of an `array<float>` vector:
  * 127 / max|x_i| (0.0 for a zero/empty/all-null vector — nothing to
  * scale). Native because the relational formulation
  * (`array_max(transform(vec, abs))`) is an interpreted higher-order
  * function, and worse: referenced from inside the encode lambda,
  * CollapseProject inlined the whole absmax TREE per element — the
  * O(dim^2)-per-row pathology that made q91's map-only scan cost
  * seconds. One tight loop; arithmetic shape identical to the HOF
  * form (float max, then 127.0 / (double)absmax) so results stay
  * bit-identical to the DuckDB oracle.
  */
case class Int8Scale(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${t.catalogString}")
  }

  override def dataType: DataType = DoubleType

  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any): Any =
    Int8Scale.scale(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.Int8Scale.scale($a)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Int8Scale {
  /** Shared by both eval paths — identical results by construction.
    * Float max first (the `array_max(transform(vec, abs))` type), the
    * float->double promotion only at the division, matching the HOF
    * form's `127.0 / absmax` exactly.
    */
  def scale(x: ArrayData): Double = {
    val n = x.numElements()
    var m = Float.NegativeInfinity
    var seen = false
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i)) {
        val a = math.abs(x.getFloat(i))
        if (!seen || a > m) { m = a; seen = true }
      }
      i += 1
    }
    if (!seen || m == 0.0f) 0.0 else 127.0 / m.toDouble
  }
}

/** SQ8 encode of an `array<float>` vector under a precomputed scale:
  * q_i = round-half-away-from-zero(x_i * scale) as one signed byte.
  * The scale is an ARGUMENT (evaluated once per row), which is the
  * point — the relational `transform(vec, x -> round(x * scale))`
  * re-evaluated the inlined scale tree per element. Rounding uses the
  * same shortest-decimal BigDecimal HALF_UP as Spark's `round`, so
  * codes stay bit-identical to the previous formulation and the
  * DuckDB oracle. Null elements encode as null (the transform
  * convention); |x_i| <= absmax by construction bounds every code
  * inside the byte range.
  */
case class Int8Codes(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float>, double), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: DataType = ArrayType(ByteType, containsNull = true)

  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    Int8Codes.codes(a.asInstanceOf[ArrayData], b.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.Int8Codes.codes($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object Int8Codes {
  /** Shared by both eval paths — identical results by construction.
    * Non-finite products (a NaN/Inf component, or scale = NaN from an
    * all-non-finite vector) quantize to 0 rather than crashing the job:
    * BigDecimal.valueOf throws on NaN/Inf, and one malformed embedding
    * in a 100 TB corpus must degrade that VECTOR, not kill the build.
    * (Spark's own `round` passes NaN/Inf through unchanged; a byte has
    * no such value to pass to, and 0 is the code whose dequantized
    * contribution is nothing.)
    */
  def codes(x: ArrayData, scale: Double): ArrayData = {
    val n = x.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i)) {
        val v = x.getFloat(i).toDouble * scale
        out(i) =
          if (java.lang.Double.isFinite(v))
            java.math.BigDecimal.valueOf(v)
              .setScale(0, java.math.RoundingMode.HALF_UP)
              .doubleValue().toByte
          else 0.toByte
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

object VectorFunctions {

  val DotName = "graft_dot"
  val Int8CosName = "graft_int8_cos"
  val Int8ScaleName = "graft_int8_scale"
  val Int8CodesName = "graft_int8_codes"

  private[functions] def builders
      : Seq[(String, Seq[Expression] => Expression)] = Seq(
    DotName -> ((exprs: Seq[Expression]) =>
      FloatDotProduct(exprs(0), exprs(1))),
    Int8CosName -> ((exprs: Seq[Expression]) =>
      Int8Cosine(exprs(0), exprs(1))),
    Int8ScaleName -> ((exprs: Seq[Expression]) =>
      Int8Scale(exprs(0))),
    Int8CodesName -> ((exprs: Seq[Expression]) =>
      Int8Codes(exprs(0), exprs(1))))

  /** Idempotent per-session registration; the expression is then usable
    * from both the Column API (via [[dot]]) and SQL text. Cluster-wide
    * alternative: `spark.sql.extensions=graft.functions.GraftExtensions`.
    */
  def register(spark: SparkSession): Unit =
    GraftFunctions.registerAll(spark, builders)

  /** Codegen'd dot product column. Caller must have [[register]]ed. */
  def dot(a: Column, b: Column): Column = call_function(DotName, a, b)

  def norm(a: Column): Column = org.apache.spark.sql.functions.sqrt(dot(a, a))

  /** Fused cosine(float query, SQ8 codes). Caller must have
    * [[register]]ed.
    */
  def int8Cos(q: Column, codes: Column): Column =
    call_function(Int8CosName, q, codes)

  /** SQ8 absmax scale of a float vector. Caller must have
    * [[register]]ed.
    */
  def int8Scale(vec: Column): Column = call_function(Int8ScaleName, vec)

  /** SQ8 codes of a float vector under a precomputed scale. Caller
    * must have [[register]]ed.
    */
  def int8Codes(vec: Column, scale: Column): Column =
    call_function(Int8CodesName, vec, scale)
}
