package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, typedlit}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Marker-list hit counting for the quality / language-ID heuristics:
  * how many tokens of a document fall in each of up to 32 fixed marker
  * lists (stopwords, per-language stopword sets), in ONE pass.
  *
  * Native because the relational form — one `filter(toks, t =>
  * t.isInCollection(markers))` per list — runs every lambda
  * INTERPRETED (higher-order functions are CodegenFallback) and
  * projection collapse inlines the tokenizer regex into each of them:
  * language ID paid five tokenizations plus five interpreted scans per
  * document. Here the token array is a child (evaluated once), the
  * marker lists compile to one token → group-bitmask hash map shipped
  * as a reference object, and the scan is one codegen loop: a hash
  * probe per token, a popcount walk per hit. Counting is
  * oracle-neutral — external SQL reproduces the counts independently
  * (`len(list_filter(...))` / FILTER counts), so decision logic built
  * on these counts hash-matches as before.
  *
  * Both eval paths call the same [[MarkerOps]] static, so interpreted
  * and codegen agree by construction.
  */
object MarkerOps {

  /** The shared counting kernel: counts(g) = |{i : tokens(i) ∈ group
    * g}| — ONE copy, so a fix here (the contract both expressions'
    * consumers depend on) can never diverge between them.
    */
  private def countsOf(arr: ArrayData,
                       lookup: java.util.HashMap[UTF8String, Integer],
                       nGroups: Int): Array[Int] = {
    val counts = new Array[Int](nGroups)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val m = lookup.get(arr.getUTF8String(i))
      if (m != null) {
        var mask = m.intValue()
        while (mask != 0) {
          counts(java.lang.Integer.numberOfTrailingZeros(mask)) += 1
          mask &= mask - 1
        }
      }
      i += 1
    }
    counts
  }

  /** Compile marker groups (an `array<array<string>>` literal's value)
    * to the token → group-bitmask map both expressions ship to
    * executors.
    */
  private[functions] def compileLookup(gd: ArrayData)
      : java.util.HashMap[UTF8String, Integer] = {
    require(gd != null && gd.numElements() > 0 && gd.numElements() <= 32,
      s"marker expressions need 1..32 marker groups, got " +
        s"${if (gd == null) "null" else gd.numElements().toString}")
    val n = gd.numElements()
    val m = new java.util.HashMap[UTF8String, Integer]()
    var g = 0
    while (g < n) {
      val markers = gd.getArray(g)
      var j = 0
      while (j < markers.numElements()) {
        val t = markers.getUTF8String(j).clone()
        val prev = m.get(t)
        m.put(t, Integer.valueOf(
          (if (prev == null) 0 else prev.intValue()) | (1 << g)))
        j += 1
      }
      g += 1
    }
    m
  }

  /** `lookup` maps token → bitmask of the groups containing it (a
    * token may sit in several lists — e.g. "de" is a German AND a
    * pinyin marker).
    */
  def groupHits(arr: ArrayData,
                lookup: java.util.HashMap[UTF8String, Integer],
                nGroups: Int): ArrayData =
    new GenericArrayData(countsOf(arr, lookup, nGroups))

  private val Und = UTF8String.fromString("und")

  /** Argmax language guess off the same lookup: `codes(argmax count)`
    * when exactly one group holds the (non-zero) max, 'und' otherwise —
    * bit-equal to the relational
    * `when(max = 0 or ties > 1, 'und').otherwise(first winner)` chain.
    */
  def langGuess(arr: ArrayData,
                lookup: java.util.HashMap[UTF8String, Integer],
                codes: Array[UTF8String]): UTF8String = {
    val nGroups = codes.length
    val counts = countsOf(arr, lookup, nGroups)
    var best = -1
    var bestCnt = 0
    var ties = 0
    var g = 0
    while (g < nGroups) {
      if (counts(g) > bestCnt) { bestCnt = counts(g); best = g; ties = 1 }
      else if (bestCnt > 0 && counts(g) == bestCnt) ties += 1
      g += 1
    }
    if (bestCnt == 0 || ties > 1) Und else codes(best)
  }
}

/** `array<int>` of per-group marker hit counts over a token array.
  * Second child must be a foldable `array<array<string>>` literal of
  * 1..32 marker lists.
  */
case class MarkerGroupHits(tokens: Expression, groups: Expression)
    extends BinaryExpression {

  override def left: Expression = tokens
  override def right: Expression = groups

  override def checkInputDataTypes(): TypeCheckResult =
    (tokens.dataType, groups.dataType) match {
      case (ArrayType(StringType, _), ArrayType(ArrayType(StringType, _), _))
          if groups.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<string>, foldable " +
          s"array<array<string>>), got (${l.catalogString}, " +
          s"${r.catalogString})")
    }

  @transient private lazy val compiled
      : (java.util.HashMap[UTF8String, Integer], Int) = {
    val gd = groups.eval().asInstanceOf[ArrayData]
    (MarkerOps.compileLookup(gd), gd.numElements())
  }

  override def nullIntolerant: Boolean = true

  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(toks: Any, groupsIgnored: Any): Any =
    MarkerOps.groupHits(toks.asInstanceOf[ArrayData], compiled._1,
      compiled._2)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (toks, _) => {
      val mapRef = ctx.addReferenceObj("markerLookup", compiled._1,
        "java.util.HashMap<org.apache.spark.unsafe.types.UTF8String," +
          "java.lang.Integer>")
      s"${ev.value} = graft.functions.MarkerOps.groupHits($toks, $mapRef, " +
        s"${compiled._2});"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(tokens = newLeft, groups = newRight)
}

/** The WHOLE language-ID decision in one pass: count per-language
  * marker hits over the token array, then argmax with the
  * deterministic tie rule — `codes(argmax)` when one language strictly
  * wins, `'und'` on an all-zero or tied max. One expression node, not
  * a counts column fanned into a when/greatest/coalesce tree: the
  * relational decision logic referenced the counts subtree ~60 times
  * structurally, and while ProjectExec's subexpression elimination
  * dedups that, FILTER predicates get no CSE — `filter(langId(text)
  * === 'en')` re-evaluated the counting scan per reference (observed:
  * q40 0.56 s → 3.58 s with the counts-column formulation). A single
  * node cannot be duplicated by tree expansion.
  */
case class LangGuess(first: Expression, second: Expression,
                     third: Expression) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(StringType, _), ArrayType(ArrayType(StringType, _), _),
            ArrayType(StringType, _))
          if second.foldable && third.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<string>, foldable " +
          s"array<array<string>>, foldable array<string>), got " +
          s"(${a.catalogString}, ${b.catalogString}, ${c.catalogString})")
    }

  @transient private lazy val compiled
      : (java.util.HashMap[UTF8String, Integer], Array[UTF8String]) = {
    val cd = third.eval().asInstanceOf[ArrayData]
    val gd = second.eval().asInstanceOf[ArrayData]
    require(cd != null && gd != null &&
      cd.numElements() == gd.numElements(),
      s"$prettyName: need one code per marker group " +
        s"(${cd.numElements()} codes, ${gd.numElements()} groups)")
    val codes = new Array[UTF8String](cd.numElements())
    var i = 0
    while (i < codes.length) { codes(i) = cd.getUTF8String(i).clone(); i += 1 }
    (MarkerOps.compileLookup(gd), codes)
  }

  override def nullIntolerant: Boolean = true

  override def dataType: DataType = StringType

  override def nullSafeEval(toks: Any, g: Any, c: Any): Any =
    MarkerOps.langGuess(toks.asInstanceOf[ArrayData], compiled._1,
      compiled._2)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (toks, _, _) => {
      val mapRef = ctx.addReferenceObj("markerLookup", compiled._1,
        "java.util.HashMap<org.apache.spark.unsafe.types.UTF8String," +
          "java.lang.Integer>")
      val codesRef = ctx.addReferenceObj("langCodes", compiled._2,
        "org.apache.spark.unsafe.types.UTF8String[]")
      s"${ev.value} = graft.functions.MarkerOps.langGuess($toks, $mapRef, " +
        s"$codesRef);"
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object MarkerFunctions {

  val GroupHitsName = "graft_marker_group_hits"
  val LangGuessName = "graft_lang_guess"

  private[functions] def builders
      : Seq[(String, Seq[Expression] => Expression)] = Seq(
    GroupHitsName -> ((exprs: Seq[Expression]) =>
      MarkerGroupHits(exprs(0), exprs(1))),
    LangGuessName -> ((exprs: Seq[Expression]) =>
      LangGuess(exprs(0), exprs(1), exprs(2))))

  def register(spark: SparkSession): Unit =
    GraftFunctions.registerAll(spark, builders)

  /** Per-group hit counts of `tokens` against fixed marker lists.
    * Registers idempotently on the ACTIVE session (the quality /
    * language-ID helpers are Column-level with no session handle —
    * the ClassifierOps convention).
    */
  def groupHits(tokens: Column, groups: Seq[Seq[String]]): Column = {
    register(SparkSession.active)
    call_function(GroupHitsName, tokens, typedlit(groups))
  }

  /** One-node language guess: argmax marker-hit count over `groups`,
    * `codes(argmax)` on a strict win, 'und' on zero or tie. Registers
    * idempotently on the active session.
    */
  def langGuess(tokens: Column, groups: Seq[Seq[String]],
                codes: Seq[String]): Column = {
    register(SparkSession.active)
    call_function(LangGuessName, tokens, typedlit(groups), typedlit(codes))
  }
}
