package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{call_function, typedlit}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StringType}

/** DSIR hashed-ngram affinity scoring as ONE codegen pass over the
  * token array (Xie et al. 2023 — see [[graft.ops.SelectOps]] for the
  * operator and the histogram fit).
  *
  * The relational formulation builds the gram array with HOFs (zip_with
  * bigrams, transform with an md5 hash per gram, an aggregate fold over
  * a 512-long lookup literal). Higher-order-function lambdas are
  * CodegenFallback — every per-gram md5 runs INTERPRETED through the
  * expression tree, with a concat allocation per bigram and a boxed
  * fold step per gram. At 100 TB the scoring scan pays that on every
  * gram of every document.
  *
  * This expression computes the identical sum in one tight loop:
  * unigram hashes digest the token bytes directly, bigram hashes
  * digest (left, ' ', right) without materializing the joined string,
  * and the 60-bit bucket comes straight off the digest's first 8 bytes
  * — bit-identical to `conv(substring(md5(g), 1, 15), 16, 10) %
  * buckets` (15 hex chars = the first 7.5 bytes; dropping the 16th
  * char of the 16-char prefix is an unsigned shift by 4). Both eval
  * paths call the same [[DsirOps]] static, so interpreted and codegen
  * agree by construction and the generated call site stays a few bytes
  * regardless of document size; the affinity table rides the generated
  * class as ONE long[] reference object, never unrolled (the
  * LshSignatures lesson).
  */
object DsirOps {

  private[functions] val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Bucket of a finished md5 digest: first 60 bits (non-negative) mod
    * `buckets` — exactly `pmod(conv(substring(md5(g),1,15),16,10), B)`.
    */
  private[functions] def bucketOf(digest: Array[Byte], buckets: Int): Int = {
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (digest(i) & 0xffL); i += 1 }
    ((h >>> 4) % buckets).toInt
  }

  /** Σ aff(bucket(gram)) over the unigrams and adjacent-pair bigrams of
    * a token array — the numerator of the DSIR mean-affinity score.
    * Null tokens cannot occur under the `[a-z]+` token contract
    * (regexp_extract_all never yields null elements); a null would NPE
    * loudly rather than silently skew the sum.
    */
  def sumAffMil(arr: ArrayData, aff: Array[Long]): Long = {
    val n = arr.numElements()
    val md = mdLocal.get()
    val buckets = aff.length
    var sum = 0L
    var i = 0
    while (i < n) {
      md.reset()
      md.update(arr.getUTF8String(i).getBytes)
      sum += aff(bucketOf(md.digest(), buckets))
      i += 1
    }
    i = 0
    while (i < n - 1) {
      md.reset()
      md.update(arr.getUTF8String(i).getBytes)
      md.update(' '.toByte)
      md.update(arr.getUTF8String(i + 1).getBytes)
      sum += aff(bucketOf(md.digest(), buckets))
      i += 1
    }
    sum
  }

  /** Double-table twin of [[sumAffMil]] for the float log-weight form
    * (`Σ λ(bucket(gram))` — the paper's log importance weight). Same
    * loop, same hash, double accumulation in gram order (deterministic:
    * row-local, no partition-order dependence).
    */
  def sumAffLn(arr: ArrayData, lam: Array[Double]): Double = {
    val n = arr.numElements()
    val md = mdLocal.get()
    val buckets = lam.length
    var sum = 0.0d
    var i = 0
    while (i < n) {
      md.reset()
      md.update(arr.getUTF8String(i).getBytes)
      sum += lam(bucketOf(md.digest(), buckets))
      i += 1
    }
    i = 0
    while (i < n - 1) {
      md.reset()
      md.update(arr.getUTF8String(i).getBytes)
      md.update(' '.toByte)
      md.update(arr.getUTF8String(i + 1).getBytes)
      sum += lam(bucketOf(md.digest(), buckets))
      i += 1
    }
    sum
  }
}

/** `sum(aff[md5bucket(gram)])` over a token array's unigrams+bigrams.
  * Second child must be a foldable `array<long>` literal (the per-mille
  * affinity table, length = bucket count) — extracted once at plan
  * time, shipped to executors as a reference object.
  */
case class DsirSumAffMil(tokens: Expression, affTable: Expression)
    extends BinaryExpression {

  override def left: Expression = tokens
  override def right: Expression = affTable

  override def checkInputDataTypes(): TypeCheckResult =
    (tokens.dataType, affTable.dataType) match {
      case (ArrayType(StringType, _), ArrayType(LongType, _))
          if affTable.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<string>, foldable array<long>); got " +
          s"(${tokens.dataType.catalogString}, ${affTable.dataType.catalogString})")
    }

  @transient private lazy val aff: Array[Long] = {
    val a = affTable.eval().asInstanceOf[ArrayData]
    require(a != null && a.numElements() > 0,
      s"$prettyName: affinity table literal must be non-empty")
    a.toLongArray()
  }

  override def nullIntolerant: Boolean = true

  override def dataType: DataType = LongType

  override def nullSafeEval(toks: Any, affIgnored: Any): Any =
    DsirOps.sumAffMil(toks.asInstanceOf[ArrayData], aff)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (toks, _) => {
      val affRef = ctx.addReferenceObj("dsirAff", aff, "long[]")
      s"${ev.value} = graft.functions.DsirOps.sumAffMil($toks, $affRef);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(tokens = newLeft, affTable = newRight)
}

/** `sum(λ[md5bucket(gram)])` — the double-table twin of
  * [[DsirSumAffMil]] for the log-weight form.
  */
case class DsirSumAffLn(tokens: Expression, lamTable: Expression)
    extends BinaryExpression {

  override def left: Expression = tokens
  override def right: Expression = lamTable

  override def checkInputDataTypes(): TypeCheckResult =
    (tokens.dataType, lamTable.dataType) match {
      case (ArrayType(StringType, _), ArrayType(DoubleType, _))
          if lamTable.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<string>, foldable array<double>); got " +
          s"(${tokens.dataType.catalogString}, ${lamTable.dataType.catalogString})")
    }

  @transient private lazy val lam: Array[Double] = {
    val a = lamTable.eval().asInstanceOf[ArrayData]
    require(a != null && a.numElements() > 0,
      s"$prettyName: weight table literal must be non-empty")
    a.toDoubleArray()
  }

  override def nullIntolerant: Boolean = true

  override def dataType: DataType = DoubleType

  override def nullSafeEval(toks: Any, lamIgnored: Any): Any =
    DsirOps.sumAffLn(toks.asInstanceOf[ArrayData], lam)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (toks, _) => {
      val lamRef = ctx.addReferenceObj("dsirLam", lam, "double[]")
      s"${ev.value} = graft.functions.DsirOps.sumAffLn($toks, $lamRef);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(tokens = newLeft, lamTable = newRight)
}

object DsirFunctions {

  val SumAffName = "graft_dsir_sum_aff_mil"
  val SumLnName = "graft_dsir_sum_aff_ln"

  private[functions] def builders
      : Seq[(String, Seq[Expression] => Expression)] = Seq(
    SumAffName -> ((exprs: Seq[Expression]) =>
      DsirSumAffMil(exprs(0), exprs(1))),
    SumLnName -> ((exprs: Seq[Expression]) =>
      DsirSumAffLn(exprs(0), exprs(1))))

  def register(spark: SparkSession): Unit =
    GraftFunctions.registerAll(spark, builders)

  /** Affinity sum over `tokens`' grams against the per-mille table.
    * Caller must have [[register]]ed on the session.
    */
  def sumAffMil(tokens: Column, aff: Array[Long]): Column =
    call_function(SumAffName, tokens, typedlit(aff.toSeq))

  /** Log-weight sum over `tokens`' grams against the λ table. Caller
    * must have [[register]]ed on the session.
    */
  def sumAffLn(tokens: Column, lam: Array[Double]): Column =
    call_function(SumLnName, tokens, typedlit(lam.toSeq))
}
