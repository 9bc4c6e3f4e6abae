package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Token-span primitives for exact substring-level deduplication (the
  * Lee et al. 2022 "Deduplicating Training Data Makes Language Models
  * Better" move, at token granularity): per-position n-token window
  * digests, and span removal with interval union.
  *
  * Native for the same reason as [[ArrayChunks]]: the relational form
  * (`transform(arrayChunks(toks, n, 1), c -> md5(concat_ws(' ', c)))`)
  * materializes every overlapping window as an array AND a joined
  * string before hashing — ~n copies of each token through interpreted
  * lambda eval. [[SpanOps.gramMd5s]] digests each window straight off
  * the token bytes with a single-space separator byte between tokens
  * (the [[DsirOps]] digest-without-concat trick), bit-identical to
  * `md5(array_to_string(ws[i:i+n-1], ' '))` in an external SQL engine,
  * so a duplicated-window decision transfers across engines exactly
  * (same hash ⇒ same collisions ⇒ same output).
  *
  * Both eval paths of each expression call the same [[SpanOps]] static,
  * so interpreted and codegen agree by construction.
  */
object SpanOps {

  /** md5 digest of each FULL n-token window (positions 0..len-n), the
    * digest fed token bytes joined by a single `' '` byte — exactly
    * `md5(tok_i || ' ' || ... || tok_{i+n-1})` without building the
    * string. Empty result for arrays shorter than n. Null token
    * elements NPE loudly rather than silently skewing digests (the
    * [[DsirOps]] contract — the `[a-z]+` tokenizer never yields null
    * elements).
    */
  def gramMd5s(arr: ArrayData, n: Int): ArrayData = {
    val len = arr.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val md = DsirOps.mdLocal.get()
    // byte images fetched once; each token is digested into up to n
    // windows but its bytes are materialized a single time
    val bytes = new Array[Array[Byte]](len)
    var i = 0
    while (i < len) { bytes(i) = arr.getUTF8String(i).getBytes; i += 1 }
    val out = new Array[Any](len - n + 1)
    i = 0
    while (i <= len - n) {
      md.reset()
      var j = i
      while (j < i + n) {
        if (j > i) md.update(' '.toByte)
        md.update(bytes(j))
        j += 1
      }
      out(i) = md.digest()
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Tokens OUTSIDE the union of [s, s+n) over `starts`, joined by a
    * single space. `starts` must be sorted ascending and non-negative
    * (collect via `sort_array`; a negative start would silently
    * truncate its span to [0, s+n)); enforced loudly over the WHOLE
    * array up front —
    * a lazy check while consuming would never inspect starts at or
    * past the token count, and an unsorted tail would silently
    * under-remove. Null token elements NPE loudly (the [[DsirOps]]
    * contract): tokens come from `regexp_extract_all`, which never
    * yields null elements, and skipping would silently change which
    * spans exist.
    */
  def cutSpans(arr: ArrayData, starts: ArrayData, n: Int): UTF8String = {
    val len = arr.numElements()
    val k = starts.numElements()
    if (k > 0 && starts.getInt(0) < 0)
      throw new IllegalArgumentException(
        s"cutSpans: starts must be non-negative, got ${starts.getInt(0)}")
    var i = 1
    while (i < k) {
      if (starts.getInt(i) < starts.getInt(i - 1))
        throw new IllegalArgumentException(
          s"cutSpans: starts must be sorted ascending, got " +
            s"${starts.getInt(i)} after ${starts.getInt(i - 1)}")
      i += 1
    }
    val sb = new java.lang.StringBuilder
    var si = 0
    var removedUntil = -1
    var p = 0
    while (p < len) {
      while (si < k && starts.getInt(si) <= p) {
        val e = starts.getInt(si) + n
        if (e > removedUntil) removedUntil = e
        si += 1
      }
      if (p >= removedUntil) {
        if (sb.length() > 0) sb.append(' ')
        sb.append(arr.getUTF8String(p).toString)
      }
      p += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

/** `array<binary>` of md5 digests, one per full n-token window of the
  * token array — digest i covers tokens [i, i+n). Window width must be
  * a positive literal.
  */
case class GramMd5s(tokens: Expression, width: Expression)
    extends BinaryExpression {

  override def left: Expression = tokens
  override def right: Expression = width

  override def checkInputDataTypes(): TypeCheckResult =
    (tokens.dataType, width.dataType) match {
      case (ArrayType(StringType, _), IntegerType) if width.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<string>, literal int), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  @transient private lazy val n: Int = {
    val v = width.eval().asInstanceOf[Int]
    require(v > 0, s"$prettyName: window width must be positive, got $v")
    v
  }

  override def nullIntolerant: Boolean = true

  override def dataType: DataType =
    ArrayType(BinaryType, containsNull = false)

  override def nullSafeEval(toks: Any, widthIgnored: Any): Any =
    SpanOps.gramMd5s(toks.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (toks, _) =>
      s"${ev.value} = graft.functions.SpanOps.gramMd5s($toks, $n);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(tokens = newLeft, width = newRight)
}

/** Tokens outside `union([s, s+width) for s in starts)` joined by one
  * space — the reconstruction step of substring-span dedup. `starts`
  * must be sorted ascending (use `sort_array`).
  */
case class CutSpans(first: Expression, second: Expression,
                    third: Expression) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(StringType, _), ArrayType(IntegerType, false),
            IntegerType) if third.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<string>, array<int> not null, " +
          s"literal int), got (${a.catalogString}, ${b.catalogString}, " +
          s"${c.catalogString})")
    }

  @transient private lazy val n: Int = {
    val v = third.eval().asInstanceOf[Int]
    require(v > 0, s"$prettyName: span width must be positive, got $v")
    v
  }

  override def nullIntolerant: Boolean = true

  override def dataType: DataType = StringType

  override def nullSafeEval(toks: Any, starts: Any, widthIgnored: Any): Any =
    SpanOps.cutSpans(toks.asInstanceOf[ArrayData],
      starts.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (toks, starts, _) =>
      s"${ev.value} = graft.functions.SpanOps.cutSpans($toks, $starts, $n);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object SpanFunctions {

  val GramMd5sName = "graft_gram_md5s"
  val CutSpansName = "graft_cut_spans"

  private[functions] def builders
      : Seq[(String, Seq[Expression] => Expression)] = Seq(
    GramMd5sName -> ((exprs: Seq[Expression]) =>
      GramMd5s(exprs(0), exprs(1))),
    CutSpansName -> ((exprs: Seq[Expression]) =>
      CutSpans(exprs(0), exprs(1), exprs(2))))

  def register(spark: SparkSession): Unit =
    GraftFunctions.registerAll(spark, builders)

  /** Per-position n-token window digests. Caller must have
    * [[register]]ed.
    */
  def gramMd5s(tokens: Column, n: Int): Column =
    call_function(GramMd5sName, tokens, lit(n))

  /** Kept text after removing the union of [s, s+n) token spans.
    * Caller must have [[register]]ed.
    */
  def cutSpans(tokens: Column, starts: Column, n: Int): Column =
    call_function(CutSpansName, tokens, starts, lit(n))
}
