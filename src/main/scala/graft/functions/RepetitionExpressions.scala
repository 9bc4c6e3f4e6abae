package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** In-document REPETITION statistics — the dominant-n-gram half of the
  * Gopher/MassiveText repetition filters (Rae et al. 2021, "Scaling
  * Language Models: ...Gopher", table A1: fraction of characters/tokens
  * in the most frequent n-gram; duplicate line/paragraph fractions).
  * Machine-generated and boilerplate text repeats itself; these are the
  * standard cheap signals every large-scale curation pipeline screens
  * on before anything model-based runs.
  *
  * The share of the MOST FREQUENT element needs a per-document mode
  * count. Relationally that is an explode + two aggregations — two
  * corpus-scale shuffles for a per-row statistic; with built-in HOFs it
  * is O(n²) per document (count each element by filtering the array).
  * This expression does the obvious O(n) thing — one hash-count pass
  * per document, map-only, codegen — which is how the published
  * pipelines compute it.
  */
object RepetitionOps {

  /** floor(1000 * max-element-count / n) of a string array; 0 when
    * empty. One O(n) hash-count pass, no per-element array scans.
    */
  def topShareMil(arr: ArrayData): Int = {
    val n = arr.numElements()
    if (n == 0) return 0
    val counts = new java.util.HashMap[UTF8String, Integer](n * 2)
    var best = 1
    var i = 0
    while (i < n) {
      val c = counts.merge(arr.getUTF8String(i), Integer.valueOf(1),
        (a: Integer, b: Integer) => Integer.valueOf(a.intValue + b.intValue))
      if (c.intValue > best) best = c.intValue
      i += 1
    }
    ((1000L * best) / n).toInt
  }
}

/** Per-mille share of the most frequent element of an `array<string>`
  * (0 for empty). Both eval paths call the same [[RepetitionOps]]
  * static, so interpreted and codegen agree by construction and the
  * generated call site stays a few bytes regardless of array size.
  */
case class TopCountShareMil(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<string> column, got ${other.catalogString}")
  }

  override def nullIntolerant: Boolean = true

  override def dataType: DataType = IntegerType

  override def nullSafeEval(v: Any): Any =
    RepetitionOps.topShareMil(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.RepetitionOps.topShareMil($v);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RepetitionFunctions {

  val TopShareName = "graft_top_share_mil"

  private[functions] def builders
      : Seq[(String, Seq[Expression] => Expression)] = Seq(
    TopShareName -> ((exprs: Seq[Expression]) => TopCountShareMil(exprs(0))))

  def register(spark: SparkSession): Unit =
    GraftFunctions.registerAll(spark, builders)

  /** Per-mille share of the most frequent element of `arr`. Caller must
    * have [[register]]ed on the session.
    */
  def topShareMil(arr: Column): Column = call_function(TopShareName, arr)
}
