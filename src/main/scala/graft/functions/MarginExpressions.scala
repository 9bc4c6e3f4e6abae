package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{call_function, lit, typedlit}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, StringType}

/** Hashed-feature linear-classifier margins as ONE codegen pass — the
  * fastText/CCNet apply shape ([[graft.ops.TextOps.hashedLinearMargin]],
  * [[graft.ops.ClassifierOps]]): `bias + Σ w[md5bucket(token)]` per
  * document. The `aggregate` HOF formulation runs every per-token md5
  * interpreted (CodegenFallback — the [[DsirSumAffMil]] finding); at
  * 100 TB the classifier-apply scan pays that on every token. Both
  * eval paths call the same static, the weight table rides the
  * generated class as one double[] reference object, and the fold
  * order (bias first, then tokens left to right) matches the HOF form
  * exactly, so margins are bit-identical — the q99 serve ≡ train
  * parity pin holds across the swap.
  */
object MarginOps {

  /** bias + Σ w[bucket(token)], left to right — [[DsirOps]] hash. */
  def marginFromTokens(arr: ArrayData, w: Array[Double],
                       bias: Double): Double = {
    val n = arr.numElements()
    val md = DsirOps.mdLocal.get()
    val buckets = w.length
    var sum = bias
    var i = 0
    while (i < n) {
      md.reset()
      md.update(arr.getUTF8String(i).getBytes)
      sum += w(DsirOps.bucketOf(md.digest(), buckets))
      i += 1
    }
    sum
  }

  /** bias + Σ w[b] over a PRE-HASHED bucket array — the training inner
    * loop's shape (buckets computed once, cached across iterations).
    */
  def marginFromBuckets(arr: ArrayData, w: Array[Double],
                        bias: Double): Double = {
    val n = arr.numElements()
    var sum = bias
    var i = 0
    while (i < n) {
      sum += w(arr.getInt(i))
      i += 1
    }
    sum
  }
}

private[functions] trait MarginExpression extends TernaryExpression {
  def input: Expression
  def weightsLit: Expression
  def biasLit: Expression
  def inputElem: DataType

  override def first: Expression = input
  override def second: Expression = weightsLit
  override def third: Expression = biasLit

  override def checkInputDataTypes(): TypeCheckResult =
    (input.dataType, weightsLit.dataType, biasLit.dataType) match {
      case (ArrayType(e, _), ArrayType(DoubleType, _), DoubleType)
          if e == inputElem && weightsLit.foldable && biasLit.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<${inputElem.catalogString}>, foldable " +
          s"array<double>, foldable double); got (${input.dataType.catalogString}, " +
          s"${weightsLit.dataType.catalogString}, ${biasLit.dataType.catalogString})")
    }

  @transient protected lazy val w: Array[Double] = {
    val a = weightsLit.eval().asInstanceOf[ArrayData]
    require(a != null && a.numElements() > 0,
      s"$prettyName: weight table literal must be non-empty")
    a.toDoubleArray()
  }

  @transient protected lazy val bias: Double =
    biasLit.eval().asInstanceOf[Double]

  override def nullIntolerant: Boolean = true

  override def dataType: DataType = DoubleType
}

/** `bias + Σ w[md5bucket(token)]` over an `array<string>` token column. */
case class HashedTokenMargin(input: Expression, weightsLit: Expression,
                             biasLit: Expression) extends MarginExpression {
  override def inputElem: DataType = StringType

  override def nullSafeEval(toks: Any, wIgn: Any, bIgn: Any): Any =
    MarginOps.marginFromTokens(toks.asInstanceOf[ArrayData], w, bias)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (toks, _, _) => {
      val wRef = ctx.addReferenceObj("marginW", w, "double[]")
      s"${ev.value} = graft.functions.MarginOps.marginFromTokens($toks, $wRef, " +
        s"java.lang.Double.longBitsToDouble(${java.lang.Double.doubleToRawLongBits(bias)}L));"
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(input = f, weightsLit = s, biasLit = t)
}

/** `bias + Σ w[b]` over a pre-hashed `array<int>` bucket column. */
case class BucketMargin(input: Expression, weightsLit: Expression,
                        biasLit: Expression) extends MarginExpression {
  override def inputElem: DataType = IntegerType

  override def nullSafeEval(bs: Any, wIgn: Any, bIgn: Any): Any =
    MarginOps.marginFromBuckets(bs.asInstanceOf[ArrayData], w, bias)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (bs, _, _) => {
      val wRef = ctx.addReferenceObj("marginW", w, "double[]")
      s"${ev.value} = graft.functions.MarginOps.marginFromBuckets($bs, $wRef, " +
        s"java.lang.Double.longBitsToDouble(${java.lang.Double.doubleToRawLongBits(bias)}L));"
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(input = f, weightsLit = s, biasLit = t)
}

object MarginFunctions {

  val TokenMarginName = "graft_hashed_token_margin"
  val BucketMarginName = "graft_bucket_margin"

  private[functions] def builders
      : Seq[(String, Seq[Expression] => Expression)] = Seq(
    TokenMarginName -> ((exprs: Seq[Expression]) =>
      HashedTokenMargin(exprs(0), exprs(1), exprs(2))),
    BucketMarginName -> ((exprs: Seq[Expression]) =>
      BucketMargin(exprs(0), exprs(1), exprs(2))))

  def register(spark: SparkSession): Unit =
    GraftFunctions.registerAll(spark, builders)

  def tokenMargin(tokens: Column, w: Array[Double], bias: Double): Column =
    call_function(TokenMarginName, tokens, typedlit(w.toSeq), lit(bias))

  def bucketMargin(buckets: Column, w: Array[Double], bias: Double): Column =
    call_function(BucketMarginName, buckets, typedlit(w.toSeq), lit(bias))
}
