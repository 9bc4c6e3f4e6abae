package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{call_function, lit, typedLit}
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, FloatType}

/** ALL product-quantization codes of a vector in ONE expression:
  * returns `array<tinyint>` of length `m`, where element j is the index
  * of subspace j's nearest codebook centroid for the L2-NORMALIZED
  * input (argmin L2 = argmax 2·s·c − ‖c‖², ties to the higher index —
  * the exact semantics of the relational struct-argmax it replaces).
  *
  * Why one expression instead of m `array_max(array(...))` columns over
  * `m x ksub` [[FloatDotProduct]] literals: at the default m=16,
  * ksub=32 that formulation expands to 512 separate dot expressions
  * with their own codebook-row literals, fused into one enormous
  * whole-stage-codegen method — megabytes of task binary per stage and
  * a JIT-threshold gamble, the same failure mode [[LshSignatures]]
  * documents. Here the generated code is a fixed-size loop nest over
  * one flat codebook matrix (a codegen reference object), a few hundred
  * bytes at any (m, ksub, dsub).
  *
  * Arithmetic is bit-identical to the relational formulation: the norm
  * is a double accumulation of float products in index order; each
  * normalized component is rounded THROUGH Float (the relational
  * version materialized `(x / n).cast("float")` subvectors); a
  * zero-norm vector passes through unscaled; components beyond a ragged
  * vector's length contribute nothing (FloatDotProduct's min-length
  * defense). Existing recall/determinism tests therefore see the exact
  * same codes.
  *
  * `mat` is the flat [m x ksub x dsub] codebook matrix (entry (j, c, i)
  * at `(j * ksub + c) * dsub + i`); `csq(j * ksub + c)` = ‖cb_jc‖².
  */
case class PqCodes(child: Expression, mat: Array[Float],
                   m: Int, ksub: Int, dsub: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _)
      if m > 0 && ksub > 0 && ksub <= 128 && dsub > 0 &&
        mat.length == m * ksub * dsub =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> and m > 0, 0 < ksub <= 128, " +
        s"dsub > 0, |mat| = m*ksub*dsub; got ${child.dataType.catalogString}, " +
        s"m=$m, ksub=$ksub, dsub=$dsub, |mat|=${mat.length}")
  }

  override def dataType: DataType = ArrayType(ByteType, containsNull = false)

  override def nullIntolerant: Boolean = true

  @transient private lazy val csq: Array[Double] = {
    val out = new Array[Double](m * ksub)
    var jc = 0
    while (jc < m * ksub) {
      var s = 0.0
      var i = 0
      while (i < dsub) {
        val x = mat(jc * dsub + i).toDouble
        s += x * x
        i += 1
      }
      out(jc) = s
      jc += 1
    }
    out
  }

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val n = x.numElements()
    var normSq = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      normSq += xi * xi
      i += 1
    }
    val norm = math.sqrt(normSq)
    val vn = new Array[Float](n)
    i = 0
    while (i < n) {
      vn(i) = if (norm == 0.0) x.getFloat(i) else (x.getFloat(i) / norm).toFloat
      i += 1
    }
    val out = new Array[Byte](m)
    var j = 0
    while (j < m) {
      var best = 0
      var bestScore = Double.NegativeInfinity
      var c = 0
      while (c < ksub) {
        val base = (j * ksub + c) * dsub
        var acc = 0.0
        var i2 = 0
        while (i2 < dsub && j * dsub + i2 < n) {
          acc += vn(j * dsub + i2).toDouble * mat(base + i2).toDouble
          i2 += 1
        }
        val score = 2.0 * acc - csq(j * ksub + c)
        if (score >= bestScore) { bestScore = score; best = c }
        c += 1
      }
      out(j) = best.toByte
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val matRef = ctx.addReferenceObj("pqMat", mat, "float[]")
      val csqRef = ctx.addReferenceObj("pqCsq", csq, "double[]")
      val n = ctx.freshName("n")
      val normSq = ctx.freshName("normSq")
      val norm = ctx.freshName("norm")
      val vn = ctx.freshName("vn")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val i2 = ctx.freshName("i2")
      val base = ctx.freshName("base")
      val acc = ctx.freshName("acc")
      val score = ctx.freshName("score")
      val best = ctx.freshName("best")
      val bestScore = ctx.freshName("bestScore")
      s"""
         |int $n = $v.numElements();
         |double $normSq = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double __x = (double) $v.getFloat($i);
         |  $normSq += __x * __x;
         |}
         |double $norm = java.lang.Math.sqrt($normSq);
         |float[] $vn = new float[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $vn[$i] = ($norm == 0.0) ? $v.getFloat($i)
         |    : (float) ($v.getFloat($i) / $norm);
         |}
         |byte[] $out = new byte[$m];
         |for (int $j = 0; $j < $m; $j++) {
         |  int $best = 0;
         |  double $bestScore = java.lang.Double.NEGATIVE_INFINITY;
         |  for (int $c = 0; $c < $ksub; $c++) {
         |    int $base = ($j * $ksub + $c) * $dsub;
         |    double $acc = 0.0;
         |    for (int $i2 = 0; $i2 < $dsub && $j * $dsub + $i2 < $n; $i2++) {
         |      $acc += ((double) $vn[$j * $dsub + $i2])
         |        * ((double) $matRef[$base + $i2]);
         |    }
         |    double $score = 2.0 * $acc - $csqRef[$j * $ksub + $c];
         |    if ($score >= $bestScore) { $bestScore = $score; $best = $c; }
         |  }
         |  $out[$j] = (byte) $best;
         |}
         |${ev.value} =
         |  org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Asymmetric-distance score of ONE product-quantized candidate against
  * a query vector, directly from the m-byte codes: score =
  * Σ_j (2·q̂_j·cb[j][codes[j]] − ‖cb[j][codes[j]]‖²), where q̂ is the
  * L2-normalized query and q̂_j its j-th dsub-wide subvector. Ranking
  * by this DESCENDING is ranking by asymmetric L2 ascending (‖q̂‖² is
  * constant per query).
  *
  * Why not the classic per-query ADC lookup TABLE (an m × ksub array
  * column of precomputed subspace scores): composed relationally that
  * table is m·ksub separate dot-product literals — 512 expressions at
  * the defaults, the exact codegen bomb [[PqCodes]] documents — and
  * its column payload is m·ksub·8 bytes (4 KB) carried onto EVERY
  * candidate row of the probe join, 16× the query vector it derives
  * from. Scoring straight from the query vector is m·dsub = dim
  * multiply-adds per candidate (64 at the defaults — indistinguishable
  * from m table lookups at row-overhead scale), keeps the join payload
  * at the 4·dim-byte vector, and generates a fixed-size loop nest.
  *
  * Arithmetic is bit-identical to the table formulation it replaces:
  * normalization rounds through Float per component ([[PqCodes]]'s
  * convention), each subspace dot accumulates doubles in index order,
  * and the per-subspace scores sum in subspace order. Components beyond
  * a ragged query's length contribute nothing.
  */
case class PqAdcScore(left: Expression, right: Expression,
                      mat: Array[Float], m: Int, ksub: Int, dsub: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(ByteType, _))
        if m > 0 && ksub > 0 && ksub <= 128 && dsub > 0 &&
          mat.length == m * ksub * dsub =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float>, array<tinyint>) and m > 0, " +
          s"0 < ksub <= 128, dsub > 0, |mat| = m*ksub*dsub; got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
    }

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType

  override def nullIntolerant: Boolean = true

  @transient private lazy val csq: Array[Double] = {
    val out = new Array[Double](m * ksub)
    var jc = 0
    while (jc < m * ksub) {
      var s = 0.0
      var i = 0
      while (i < dsub) {
        val x = mat(jc * dsub + i).toDouble
        s += x * x
        i += 1
      }
      out(jc) = s
      jc += 1
    }
    out
  }

  override def nullSafeEval(q: Any, cd: Any): Any = {
    val x = q.asInstanceOf[ArrayData]
    val codes = cd.asInstanceOf[ArrayData]
    val n = x.numElements()
    var normSq = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      normSq += xi * xi
      i += 1
    }
    val norm = math.sqrt(normSq)
    val vn = new Array[Float](n)
    i = 0
    while (i < n) {
      vn(i) = if (norm == 0.0) x.getFloat(i) else (x.getFloat(i) / norm).toFloat
      i += 1
    }
    var score = 0.0
    val mm = math.min(m, codes.numElements())
    var j = 0
    while (j < mm) {
      val c = codes.getByte(j).toInt
      val base = (j * ksub + c) * dsub
      var acc = 0.0
      var i2 = 0
      while (i2 < dsub && j * dsub + i2 < n) {
        acc += vn(j * dsub + i2).toDouble * mat(base + i2).toDouble
        i2 += 1
      }
      score += 2.0 * acc - csq(j * ksub + c)
      j += 1
    }
    score
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, cd) => {
      val matRef = ctx.addReferenceObj("pqMat", mat, "float[]")
      val csqRef = ctx.addReferenceObj("pqCsq", csq, "double[]")
      val n = ctx.freshName("n")
      val normSq = ctx.freshName("normSq")
      val norm = ctx.freshName("norm")
      val vn = ctx.freshName("vn")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val mm = ctx.freshName("mm")
      val c = ctx.freshName("c")
      val i2 = ctx.freshName("i2")
      val base = ctx.freshName("base")
      val acc = ctx.freshName("acc")
      val score = ctx.freshName("score")
      s"""
         |int $n = $q.numElements();
         |double $normSq = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double __x = (double) $q.getFloat($i);
         |  $normSq += __x * __x;
         |}
         |double $norm = java.lang.Math.sqrt($normSq);
         |float[] $vn = new float[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $vn[$i] = ($norm == 0.0) ? $q.getFloat($i)
         |    : (float) ($q.getFloat($i) / $norm);
         |}
         |double $score = 0.0;
         |int $mm = java.lang.Math.min($m, $cd.numElements());
         |for (int $j = 0; $j < $mm; $j++) {
         |  int $c = (int) $cd.getByte($j);
         |  int $base = ($j * $ksub + $c) * $dsub;
         |  double $acc = 0.0;
         |  for (int $i2 = 0; $i2 < $dsub && $j * $dsub + $i2 < $n; $i2++) {
         |    $acc += ((double) $vn[$j * $dsub + $i2])
         |      * ((double) $matRef[$base + $i2]);
         |  }
         |  $score += 2.0 * $acc - $csqRef[$j * $ksub + $c];
         |}
         |${ev.value} = $score;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PqFunctions {

  val CodesName = "graft_pq_codes"
  val AdcScoreName = "graft_pq_adc_score"

  /** Idempotent per-session registration (same pattern as
    * [[VectorFunctions.register]]). The codebook matrix arrives as a
    * foldable array<float> literal argument and is extracted at
    * function-resolution time.
    */
  private[functions] def builders
      : Seq[(String, Seq[Expression] => Expression)] = Seq(
    CodesName -> ((exprs: Seq[Expression]) => PqCodes(exprs(0),
      litFloatArray(exprs(1)),
      ExprArgs.litInt(exprs(2), s"$CodesName: m"),
      ExprArgs.litInt(exprs(3), s"$CodesName: ksub"),
      ExprArgs.litInt(exprs(4), s"$CodesName: dsub"))),
    AdcScoreName -> ((exprs: Seq[Expression]) => PqAdcScore(exprs(0),
      exprs(1), litFloatArray(exprs(2)),
      ExprArgs.litInt(exprs(3), s"$AdcScoreName: m"),
      ExprArgs.litInt(exprs(4), s"$AdcScoreName: ksub"),
      ExprArgs.litInt(exprs(5), s"$AdcScoreName: dsub"))))

  def register(spark: SparkSession): Unit =
    GraftFunctions.registerAll(spark, builders)

  private def litFloatArray(e: Expression): Array[Float] = {
    require(e.foldable, s"$CodesName: codebook matrix must be a literal")
    e.eval() match {
      case a: ArrayData => a.toFloatArray()
      case other => throw new IllegalArgumentException(
        s"$CodesName: codebook matrix must be array<float>, got $other")
    }
  }

  /** All m PQ codes of `vec` against `books` as one `array<tinyint>`
    * column. Caller must have [[register]]ed on the session.
    */
  def codes(vec: Column, books: Array[Array[Array[Float]]]): Column = {
    val m = books.length
    val ksub = books.head.length
    val dsub = books.head.head.length
    val flat = books.flatten.flatten
    call_function(CodesName, vec, typedLit(flat), lit(m), lit(ksub), lit(dsub))
  }

  /** Asymmetric-distance score of a PQ-coded candidate against a query
    * vector (see [[PqAdcScore]]). Caller must have [[register]]ed.
    */
  def adcScore(qvec: Column, codes: Column,
               books: Array[Array[Array[Float]]]): Column = {
    val m = books.length
    val ksub = books.head.length
    val dsub = books.head.head.length
    val flat = books.flatten.flatten
    call_function(AdcScoreName, qvec, codes,
      typedLit(flat), lit(m), lit(ksub), lit(dsub))
  }
}
