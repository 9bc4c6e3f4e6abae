package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (UAX #15) as a codegen'd column expression.
  *
  * Training-data pipelines normalize BEFORE any hash-based operator:
  * "café" composed (U+00E9) and decomposed (e + U+0301) are different
  * byte strings, so without NFC they carry different fingerprints,
  * different MinHash signatures, and different exact-dup hashes for
  * text every renderer displays identically. NFKC additionally folds
  * compatibility forms (ﬁ -> fi, fullwidth ４２ -> 42) — the usual
  * choice ahead of tokenization.
  *
  * Engine shape: a unary [[UnaryExpression]] whose both eval paths call
  * the same static ([[UnicodeNorm.normalize]]), so interpreted and
  * whole-stage-codegen results are identical by construction. Map-only
  * at any scale — no shuffle, no UDF. The static fast-paths pure-ASCII
  * input (one byte scan, no decode, returns the input buffer untouched)
  * and already-normalized text (`Normalizer.isNormalized`, no
  * allocation) — on a mostly-ASCII corpus the expensive path runs only
  * on the rows that need it.
  */
object UnicodeNorm {

  /** Indexed forms so generated code passes a primitive int, not an
    * enum lookup per row. Order is the java.text contract's.
    */
  private val Forms: Array[Normalizer.Form] = Normalizer.Form.values()

  def formId(name: String): Int = {
    val i = Forms.indexWhere(_.name == name)
    require(i >= 0, s"unknown normalization form '$name' " +
      s"(expected one of ${Forms.map(_.name).mkString(", ")})")
    i
  }

  def normalize(s: UTF8String, formId: Int): UTF8String = {
    // pure-ASCII bytes are normalized under every form: one vectorizable
    // scan, zero decode, zero allocation
    val bytes = s.getBytes
    var i = 0
    var ascii = true
    while (ascii && i < bytes.length) { ascii = bytes(i) >= 0; i += 1 }
    if (ascii) return s
    val str = s.toString
    val form = Forms(formId)
    if (Normalizer.isNormalized(str, form)) s
    else UTF8String.fromString(Normalizer.normalize(str, form))
  }
}

/** `unicode_normalize(text)` for one compile-time-fixed form. The form
  * is part of the EXPRESSION, not a per-row argument: the generated
  * call site carries it as an int literal, and an illegal form name
  * fails at plan construction, never mid-job.
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  private val formId = UnicodeNorm.formId(form) // validates eagerly

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${other.catalogString}")
  }

  override def nullIntolerant: Boolean = true

  override def dataType: DataType = StringType

  override def nullSafeEval(v: Any): Any =
    UnicodeNorm.normalize(v.asInstanceOf[UTF8String], formId)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.UnicodeNorm.normalize($v, $formId);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NormalizeFunctions {

  private val Name = "graft_unicode_normalize"

  /** Idempotent per-session registration (pattern of
    * [[MinHashFunctions.register]]).
    */
  private[functions] def builders
      : Seq[(String, Seq[Expression] => Expression)] = Seq(
    Name -> ((exprs: Seq[Expression]) => UnicodeNormalize(exprs(0),
      ExprArgs.litString(exprs(1), s"$Name: form"))))

  def register(spark: SparkSession): Unit =
    GraftFunctions.registerAll(spark, builders)

  /** `text` normalized to `form` ("NFC", "NFD", "NFKC", "NFKD").
    * Caller must have [[register]]ed on the session.
    */
  def normalize(text: Column, form: String): Column =
    call_function(Name, text, org.apache.spark.sql.functions.lit(form))
}
