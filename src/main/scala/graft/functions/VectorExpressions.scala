package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

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

object VectorFunctions {

  val DotName = "graft_dot"

  private[functions] def builders
      : Seq[(String, Seq[Expression] => Expression)] = Seq(
    DotName -> ((exprs: Seq[Expression]) =>
      FloatDotProduct(exprs(0), exprs(1))))

  /** Idempotent per-session registration; the expression is then usable
    * from both the Column API (via [[dot]]) and SQL text. Cluster-wide
    * alternative: `spark.sql.extensions=graft.functions.GraftExtensions`.
    */
  def register(spark: SparkSession): Unit =
    GraftFunctions.registerAll(spark, builders)

  /** Codegen'd dot product column. Caller must have [[register]]ed. */
  def dot(a: Column, b: Column): Column = call_function(DotName, a, b)

  def norm(a: Column): Column = org.apache.spark.sql.functions.sqrt(dot(a, a))
}
